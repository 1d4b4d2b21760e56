"""Core logging/metrics/saver tests."""

import json

import numpy as np

from summer_clip_tpu.core import log_utils as L
from summer_clip_tpu.apps.savers import TensorsNumpySaver


class TestStreamingMeans:
    def test_weighted_means(self):
        sm = L.StreamingMeans()
        sm.update_value("train/loss", 2.0, weight=1)
        sm.update_value("train/loss", 4.0, weight=3)
        assert abs(sm.to_dict()["train/loss"] - 3.5) < 1e-9

    def test_update_values_and_prefix(self):
        sm = L.StreamingMeans()
        sm.update_values({"a": 1.0, "b": 2.0})
        out = sm.to_dict(prefix="ep/")
        assert out == {"ep/a": 1.0, "ep/b": 2.0}

    def test_accepts_jax_scalars(self):
        import jax.numpy as jnp

        sm = L.StreamingMeans()
        sm.update_value("x", jnp.asarray(5.0))
        assert sm.to_dict()["x"] == 5.0


class TestConsoleFormat:
    def test_groups_by_prefix(self):
        text = L.ConsoleLogger.format_info({
            "train/loss": 0.5, "train/acc": 90.0, "val/acc": 80.0, "lr": 0.1,
        })
        lines = text.split("\n")
        assert any(l.startswith("train | ") and "loss" in l and "acc" in l for l in lines)
        assert any(l.startswith("val | ") for l in lines)
        assert any("lr: 0.1" in l for l in lines)


class TestJsonlLogger:
    def test_records_and_config(self, tmp_path):
        lg = L.JsonlLogger(tmp_path / "records.jsonl", config={"seed": 1})
        lg.log({"type": "result", "acc1": np.float32(1.5)})
        lg.log_table("prompts", ["a"], [[1]])
        recs = [json.loads(l) for l in (tmp_path / "records.jsonl").read_text().splitlines()]
        assert recs[0]["type"] == "config" and recs[0]["config"]["seed"] == 1
        assert recs[1]["acc1"] == 1.5
        assert recs[2]["type"] == "table" and recs[2]["name"] == "prompts"

    def test_log_code_manifest(self, tmp_path):
        """Code-artifact snapshot (reference WandbLogger uploads **/*.py,
        log_utils.py:56-65) — JSONL sink records path -> sha256 manifest."""
        (tmp_path / "pkg").mkdir()
        (tmp_path / "pkg" / "a.py").write_text("x = 1\n")
        (tmp_path / "top.py").write_text("y = 2\n")
        (tmp_path / "outputs" / "run").mkdir(parents=True)
        (tmp_path / "outputs" / "run" / "skip.py").write_text("z = 3\n")
        lg = L.JsonlLogger(tmp_path / "records.jsonl")
        files = lg.log_code(tmp_path)
        assert files == ["pkg/a.py", "top.py"]  # outputs/ excluded
        recs = [json.loads(l) for l in (tmp_path / "records.jsonl").read_text().splitlines()]
        art = [r for r in recs if r.get("type") == "code_artifact"][0]
        assert set(art["files"]) == {"pkg/a.py", "top.py"}
        assert all(len(h) == 16 for h in art["files"].values())

    def test_manager_fanout(self, tmp_path):
        mgr = L.LoggingManager(L.JsonlLogger(tmp_path / "r.jsonl"), L.ConsoleLogger("t"))
        mgr.log_info({"type": "x", "v": 1})
        mgr.log_info_wandb({"type": "y", "v": 2})
        sm = L.StreamingMeans()
        sm.update_value("m", 3.0)
        mgr.log_epoch(1, sm)
        recs = [json.loads(l) for l in (tmp_path / "r.jsonl").read_text().splitlines()]
        types = [r.get("type") for r in recs]
        assert "x" in types and "y" in types
        assert any(r.get("epoch") == 1 and r.get("m") == 3.0 for r in recs)


class TestSavers:
    def test_auto_numbering_and_named(self, tmp_path):
        s = TensorsNumpySaver(tmp_path / "dumps")
        p0 = s.save_tensor(np.arange(3))
        p1 = s.save_tensor(np.arange(4))
        pn = s.save_named_tensor(np.arange(5), "labels")
        assert p0.name == "tensor_00000.npy" and p1.name == "tensor_00001.npy"
        assert pn.name == "labels.npy"
        assert np.load(p1).shape == (4,)
