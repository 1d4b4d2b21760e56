"""Config engine tests: composition, interpolation, instantiation, sweeps."""

import dataclasses

import pytest

from summer_clip_tpu.core import config as C


@dataclasses.dataclass
class _Widget:
    alpha: float = 1.0
    beta: int = 2
    name: str = "w"


def _write(tmp_path, rel, text):
    p = tmp_path / rel
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(text)
    return p


def test_attribute_access_and_interpolation():
    cfg = C.ConfigNode({
        "meta": {"seed": 42, "root": "/data"},
        "paths": {"features": "${meta.root}/feats.npy"},
        "alias": "${meta.seed}",
    })
    assert cfg.meta.seed == 42
    assert cfg.paths.features == "/data/feats.npy"
    assert cfg.alias == 42  # whole-string interpolation keeps int type
    assert cfg.get("nope", "dflt") == "dflt"


def test_defaults_composition_and_package_redirect(tmp_path):
    _write(tmp_path, "dataset/cifar.yaml", "name: cifar\nnum_classes: 10\n")
    _write(tmp_path, "dataset/mnist.yaml", "name: mnist\nnum_classes: 10\n")
    _write(tmp_path, "app.yaml", (
        "defaults:\n"
        "  - dataset: cifar\n"
        "  - dataset@cache.dataset: mnist\n"
        "  - _self_\n"
        "meta:\n  seed: 1\n"
        "dataset:\n  num_classes: 100\n"
    ))
    cfg = C.compose(tmp_path, "app")
    assert cfg.dataset.name == "cifar"
    assert cfg.dataset.num_classes == 100  # _self_ wins over group default
    assert cfg.cache.dataset.name == "mnist"
    assert cfg.meta.seed == 1


def test_cli_overrides(tmp_path):
    _write(tmp_path, "dataset/cifar.yaml", "name: cifar\n")
    _write(tmp_path, "dataset/mnist.yaml", "name: mnist\n")
    _write(tmp_path, "app.yaml", "defaults:\n  - dataset: cifar\nmeta:\n  seed: 1\n")
    cfg = C.compose(tmp_path, "app", overrides=["meta.seed=7", "dataset=mnist", "+extra.flag=true"])
    assert cfg.meta.seed == 7
    assert cfg.dataset.name == "mnist"
    assert cfg.extra.flag is True


def test_instantiate_nested():
    cfg = {
        "_target_": "tests.test_config._Widget",
        "alpha": 3.5,
        "name": "hello",
    }
    w = C.instantiate(cfg)
    assert isinstance(w, _Widget) and w.alpha == 3.5 and w.beta == 2


def test_instantiate_partial():
    cfg = {"_target_": "tests.test_config._Widget", "_partial_": True, "beta": 9}
    fn = C.instantiate(cfg)
    w = fn(alpha=0.5)
    assert w.beta == 9 and w.alpha == 0.5


def test_instantiate_all_sweeps_lists():
    cfg = {
        "_target_": "tests.test_config._Widget",
        "alpha": [0.1, 0.2],
        "beta": [1, 2, 3],
        "name": "fixed",
    }
    combos = list(C.instantiate_all(cfg))
    assert len(combos) == 6
    alphas = {round(obj.alpha, 3) for obj, _ in combos}
    assert alphas == {0.1, 0.2}
    # every yielded params dict reflects the instance
    for obj, params in combos:
        assert obj.beta == params["beta"]
        assert params["name"] == "fixed"


def test_instantiate_all_scalar_only():
    cfg = {"_target_": "tests.test_config._Widget", "alpha": 5.0}
    combos = list(C.instantiate_all(cfg))
    assert len(combos) == 1
    assert combos[0][0].alpha == 5.0


def test_to_yaml_roundtrip():
    cfg = C.ConfigNode({"a": {"b": [1, 2]}, "c": "x"})
    text = C.to_yaml(cfg)
    import yaml

    assert yaml.safe_load(text) == {"a": {"b": [1, 2]}, "c": "x"}


def test_main_decorator_creates_run_dir(tmp_path, monkeypatch):
    _write(tmp_path / "conf", "app.yaml", "meta:\n  seed: 3\n")
    monkeypatch.chdir(tmp_path)

    import types, sys

    mod = types.ModuleType("fake_app_mod")
    mod.__file__ = str(tmp_path / "fake_app.py")
    sys.modules["fake_app_mod"] = mod

    holder = {}

    def app(cfg):
        holder["seed"] = cfg.meta.seed
        import os
        holder["cwd"] = os.getcwd()

    app.__module__ = "fake_app_mod"
    wrapped = C.main("conf", "app")(app)
    wrapped(argv=["meta.seed=11"])
    assert holder["seed"] == 11
    assert "outputs" in holder["cwd"]
    cfg_files = list((tmp_path / "outputs").rglob(".hydra/config.yaml"))
    assert len(cfg_files) == 1


def test_main_decorator_honors_hydra_setup(tmp_path, monkeypatch):
    """hydra.run.dir / job.chdir / job_logging from the composed config drive
    the launcher (reference conf/hydra_setup.yaml semantics)."""
    _write(tmp_path / "conf", "hydra_setup.yaml",
           "hydra:\n"
           "  job:\n"
           "    chdir: false\n"
           "  run:\n"
           "    dir: runs/${now:%Y}/trial\n"
           "  job_logging:\n"
           "    formatters:\n"
           "      json:\n"
           "        format: '%(message)s'\n")
    _write(tmp_path / "conf", "app.yaml",
           "defaults:\n  - hydra_setup\n  - _self_\nmeta:\n  seed: 3\n")
    monkeypatch.chdir(tmp_path)

    import types, sys, json, datetime

    mod = types.ModuleType("fake_app_mod2")
    mod.__file__ = str(tmp_path / "fake_app.py")
    sys.modules["fake_app_mod2"] = mod

    holder = {}

    def app(cfg):
        import logging, os
        holder["cwd"] = os.getcwd()
        holder["has_hydra"] = "hydra" in cfg
        logging.getLogger("x").info({"type": "probe", "v": 1})

    app.__module__ = "fake_app_mod2"
    C.main("conf", "app")(app)(argv=[])

    assert holder["cwd"] == str(tmp_path), "job.chdir=false must keep launch cwd"
    assert not holder["has_hydra"], "hydra node must be stripped from the app cfg"
    year = datetime.datetime.now().strftime("%Y")
    run_dir = tmp_path / "runs" / year / "trial"
    assert (run_dir / ".hydra" / "config.yaml").exists(), "run.dir pattern must be used"
    log_file = run_dir / "app.log"
    assert log_file.exists(), "job_logging json formatter must create <app>.log"
    records = [json.loads(line) for line in log_file.read_text().splitlines()]
    assert any(r.get("type") == "probe" for r in records)
    # a second run must not collide with the existing run dir
    C.main("conf", "app")(app)(argv=[])
    assert (tmp_path / "runs" / year / "trial-1" / ".hydra" / "config.yaml").exists()


def test_missing_raises():
    cfg = C.ConfigNode({"a": "???"})
    with pytest.raises((KeyError, AttributeError)):
        _ = cfg.a
    with pytest.raises(KeyError):
        _ = cfg["a"]


def test_profiling_timed_sink():
    from summer_clip_tpu.core.profiling import timed

    calls = []
    fn = timed(lambda x: x + 1, name="inc", sink=lambda n, dt: calls.append((n, dt)))
    assert fn(1) == 2
    assert calls and calls[0][0] == "inc" and calls[0][1] >= 0


class TestConfTree:
    """Every shipped app config must compose without errors."""

    def test_all_app_configs_compose(self):
        from pathlib import Path

        conf = Path(__file__).resolve().parent.parent / "summer_clip_tpu" / "conf"
        apps = [p.stem for p in conf.glob("*.yaml")
                if p.stem not in ("meta_setup", "adapter_setup", "hydra_setup")]
        assert len(apps) >= 18
        for name in apps:
            cfg = C.compose(conf, name)
            assert cfg.meta.random_state == 42, name
            assert "exp" in cfg, name

    def test_group_options_compose(self):
        from pathlib import Path

        conf = Path(__file__).resolve().parent.parent / "summer_clip_tpu" / "conf"
        for group in ("cache_strategy", "cache_value_strategy", "cache_weights_strategy",
                      "prompt_model", "vocab_filter", "lm_loss", "temp_scheduler",
                      "clip", "adapter", "text_batcher"):
            options = list((conf / group).glob("*.yaml"))
            assert options, group
            for opt in options:
                sub = C._compose_file(conf, f"{group}/{opt.stem}")
                assert isinstance(sub, dict), f"{group}/{opt.stem}"
