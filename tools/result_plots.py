"""Plot-producing run analysis — the notebooks' figure half.

The reference's ``clip_searcher/runs_analysis`` notebooks render two figure
families that ``tools/result_tables.py`` (the table half) does not cover:

- ``class_distribution.ipynb``: per-class label histograms of the selected
  cache under each strategy, next to the gold/test label distributions
  (``plot_labels_hist`` / ``plot_cache_strategies`` cells);
- ``result_tables.ipynb``: acc@1 point plots vs the per-class budget k,
  one line per selection strategy, faceted over the (beta, alpha) grid
  (``plot_diff_params`` cell).

This CLI reproduces both from this framework's run artifacts (matplotlib
only, Agg backend, PNG out):

    # label histograms from an apps/class_distribution.py run dir
    python tools/result_plots.py class-dist outputs/<date>/<time> --out plots/

    # strategy curves from image_attention searcher_result records
    python tools/result_plots.py searcher outputs/ --x topk --out plots/
"""

from __future__ import annotations

import argparse
import json
import sys
from collections import Counter
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.result_tables import load_log_records  # noqa: E402

MARKERS = ["o", "s", "D", "^", "v", "P", "X", "*"]


def _short_name(params: dict) -> str:
    """Human name for a strategy param dict: the _target_ class, plus any
    non-sweep scalars that distinguish variants."""
    tgt = str(params.get("_target_", "strategy")).rsplit(".", 1)[-1]
    return tgt


def plot_labels_hist(ax, labels: np.ndarray, classes_num: int, title: str,
                     x_tick_interval: int = 10) -> None:
    """Per-class count bars (reference ``plot_labels_hist``)."""
    counts = Counter(np.asarray(labels).ravel().tolist())
    xs = np.arange(classes_num)
    ys = np.array([counts.get(int(x), 0) for x in xs])
    ax.bar(xs, ys, width=0.9)
    ax.set_xticks(range(0, classes_num, max(1, x_tick_interval)))
    ax.tick_params(axis="x", rotation=90, labelsize=7)
    ax.set_xlabel("class ID")
    ax.set_ylabel("count")
    ax.set_title(title, fontsize=9)


def class_dist_figure(run_dir: Path, out_dir: Path,
                      max_strategies: int = 8) -> Path:
    """Selected-cache label histograms per strategy vs the gold cache/test
    distributions, from a ``class_distribution`` run dir (reference
    ``plot_cache_strategies`` / ``plot_test_preds``)."""
    run_dir = Path(run_dir)
    cache_labels = np.load(run_dir / "cache_labels.npy")
    test_labels_p = run_dir / "test_labels.npy"
    classes_num = int(cache_labels.max()) + 1

    sel_dir = run_dir / "selected_cache"
    dumps = sorted(sel_dir.glob("*.npy"))[:max_strategies]
    panels = [("gold: cache", cache_labels)]
    if test_labels_p.exists():
        panels.append(("gold: test", np.load(test_labels_p)))
    for p in dumps:
        try:
            params = json.loads(p.stem)
            title = _short_name(params)
            extras = {k: v for k, v in params.items()
                      if k != "_target_" and np.isscalar(v)}
            if extras:
                title += " " + ",".join(f"{k}={v}" for k, v in extras.items())
        except json.JSONDecodeError:
            title = p.stem
        panels.append((f"selected: {title}", np.load(p)))

    ncols = min(4, len(panels))
    nrows = -(-len(panels) // ncols)
    fig, axes = plt.subplots(nrows, ncols, figsize=(4.5 * ncols, 3.2 * nrows),
                             squeeze=False)
    for ax in axes.ravel():
        ax.set_visible(False)
    for ax, (title, labels) in zip(axes.ravel(), panels):
        ax.set_visible(True)
        plot_labels_hist(ax, labels, classes_num, title)
    fig.suptitle(f"class distribution — {run_dir.name}")
    fig.tight_layout()
    out_dir.mkdir(parents=True, exist_ok=True)
    out = out_dir / f"class_dist_{run_dir.name}.png"
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def searcher_figure(roots, out_dir: Path, x_key: str = "topk",
                    acc_key: str = "acc1") -> Path:
    """acc@1 vs the swept selection parameter (default ``topk``), one line
    per strategy, faceted over the (beta, alpha) grid (reference
    ``plot_diff_params``)."""
    records = load_log_records(roots, "searcher_result")
    if not records:
        raise SystemExit("no searcher_result records under " + ", ".join(map(str, roots)))

    rows = []
    for r in records:
        strat = r.get("cache_strategy") or {}
        rows.append({
            "strategy": _short_name(strat),
            "x": strat.get(x_key),
            "beta": (r.get("cache_weights_strategy") or {}).get("beta"),
            "alpha": r.get("alpha"),
            "acc": float(r.get(acc_key, 0.0)),
        })
    betas = sorted({r["beta"] for r in rows if r["beta"] is not None})
    alphas = sorted({r["alpha"] for r in rows if r["alpha"] is not None})
    betas, alphas = betas or [None], alphas or [None]
    strategies = sorted({r["strategy"] for r in rows})

    fig, axes = plt.subplots(len(betas), len(alphas),
                             figsize=(4.2 * len(alphas), 3.4 * len(betas)),
                             squeeze=False, sharey=True)
    for bi, beta in enumerate(betas):
        for ai, alpha in enumerate(alphas):
            ax = axes[bi][ai]
            cell = [r for r in rows
                    if (beta is None or r["beta"] == beta)
                    and (alpha is None or r["alpha"] == alpha)]
            for si, strat in enumerate(strategies):
                pts = sorted(((r["x"], r["acc"]) for r in cell
                              if r["strategy"] == strat and r["x"] is not None))
                if not pts:
                    # strategies without the swept param (e.g. AllLogits)
                    # render as a horizontal reference line
                    flat = [r["acc"] for r in cell if r["strategy"] == strat]
                    if flat:
                        ax.axhline(float(np.mean(flat)), linestyle="--",
                                   color=f"C{si % 10}", label=strat, lw=1.2)
                    continue
                xs, ys = zip(*pts)
                ax.plot(xs, ys, marker=MARKERS[si % len(MARKERS)],
                        color=f"C{si % 10}", label=strat, lw=1.4, ms=4)
            ax.set_title(f"beta={beta}  alpha={alpha}", fontsize=9)
            ax.set_xlabel(f"{x_key} (per-class budget)")
            ax.grid(linestyle="--", alpha=0.5)
            if ai == 0:
                ax.set_ylabel(f"{acc_key}")
    handles, labels = axes[0][0].get_legend_handles_labels()
    if handles:
        fig.legend(handles, labels, loc="lower center",
                   ncol=min(4, len(labels)), fontsize=8)
    fig.tight_layout(rect=(0, 0.08, 1, 1))
    out_dir.mkdir(parents=True, exist_ok=True)
    out = out_dir / f"searcher_{x_key}.png"
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    p1 = sub.add_parser("class-dist")
    p1.add_argument("run_dir")
    p1.add_argument("--out", default="plots")
    p2 = sub.add_parser("searcher")
    p2.add_argument("roots", nargs="+")
    p2.add_argument("--x", default="topk")
    p2.add_argument("--acc", default="acc1")
    p2.add_argument("--out", default="plots")
    args = ap.parse_args(argv)
    if args.cmd == "class-dist":
        out = class_dist_figure(Path(args.run_dir), Path(args.out))
    else:
        out = searcher_figure(args.roots, Path(args.out),
                              x_key=args.x, acc_key=args.acc)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
