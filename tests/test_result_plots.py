"""tools/result_plots.py — the notebooks' figure half (reference
``clip_searcher/runs_analysis/{class_distribution,result_tables}.ipynb``)."""

import json

import numpy as np

from tools.result_plots import class_dist_figure, main, searcher_figure


def _fake_class_dist_run(tmp_path):
    run = tmp_path / "run"
    (run / "selected_cache").mkdir(parents=True)
    rng = np.random.default_rng(0)
    np.save(run / "cache_labels.npy", rng.integers(0, 10, 200))
    np.save(run / "test_labels.npy", rng.integers(0, 10, 50))
    for params in (
        {"_target_": "summer_clip_tpu.methods.cache.TopKStrategy", "topk": 4},
        {"_target_": "summer_clip_tpu.methods.cache.AllLogitsStrategy"},
    ):
        np.save(run / "selected_cache" / f"{json.dumps(params)}.npy",
                rng.integers(0, 10, 80))
    return run


def _fake_searcher_run(tmp_path):
    run = tmp_path / "search_run"
    run.mkdir()
    recs = []
    for strat, ks in (("TopKStrategy", (1, 4, 16)), ("AllLogitsStrategy", (None,))):
        for k in ks:
            for beta in (1.0, 5.5):
                for alpha in (0.0, 1.0):
                    cs = {"_target_": f"summer_clip_tpu.methods.cache.{strat}"}
                    if k is not None:
                        cs["topk"] = k
                    recs.append({
                        "type": "searcher_result", "cache_strategy": cs,
                        "cache_weights_strategy": {"beta": beta},
                        "cache_value_strategy": {}, "alpha": alpha,
                        "acc1": 0.5 + 0.01 * (k or 0) + 0.1 * alpha,
                        "acc5": 0.9,
                    })
    (run / "records.jsonl").write_text(
        "\n".join(json.dumps(r) for r in recs) + "\n")
    return run


def test_class_dist_figure(tmp_path):
    run = _fake_class_dist_run(tmp_path)
    out = class_dist_figure(run, tmp_path / "plots")
    assert out.exists() and out.stat().st_size > 1000


def test_searcher_figure(tmp_path):
    run = _fake_searcher_run(tmp_path)
    out = searcher_figure([run], tmp_path / "plots", x_key="topk")
    assert out.exists() and out.stat().st_size > 1000


def test_cli(tmp_path):
    run = _fake_searcher_run(tmp_path)
    assert main(["searcher", str(run), "--out", str(tmp_path / "p")]) == 0
    assert (tmp_path / "p" / "searcher_topk.png").exists()
