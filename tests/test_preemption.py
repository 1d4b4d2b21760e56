"""Graceful preemption (engine/preemption.py): SIGTERM mid-train must end
in a resumable optimizer checkpoint and a clean stop, not a dead process."""

import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.full  # heavy tier: excluded from smoke (pytest -m "not full")

import json
import os
import signal
import threading

import pytest

from summer_clip_tpu.engine.preemption import PreemptionGuard


@pytest.fixture()
def rundir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _records(run_root):
    recs = []
    for p in run_root.rglob("records.jsonl"):
        recs.extend(json.loads(l) for l in p.read_text().splitlines())
    return recs


class TestPreemptionGuard:
    def test_signal_latches_flag_and_escalates(self):
        guard = PreemptionGuard(signals=(signal.SIGTERM,))
        prev = signal.getsignal(signal.SIGTERM)
        guard.install()
        assert not guard.triggered
        os.kill(os.getpid(), signal.SIGTERM)
        # the handler runs in the main thread at the next bytecode boundary
        for _ in range(1000):
            if guard.triggered:
                break
        assert guard.triggered
        # first signal consumed gracefully; the handler re-arms the ORIGINAL
        # handler so a second signal escalates past the guard
        assert signal.getsignal(signal.SIGTERM) is prev
        guard.restore()
        assert signal.getsignal(signal.SIGTERM) is prev

    def test_context_manager_restores(self):
        prev = signal.getsignal(signal.SIGINT)
        with PreemptionGuard(signals=(signal.SIGINT,)) as guard:
            assert signal.getsignal(signal.SIGINT) == guard._on_signal
            guard.trigger()
            assert guard.triggered
        assert signal.getsignal(signal.SIGINT) is prev

    def test_non_main_thread_install_raises(self):
        errs = []

        def worker():
            try:
                PreemptionGuard(signals=(signal.SIGTERM,)).install()
            except ValueError as e:
                errs.append(e)

        t = threading.Thread(target=worker)
        t.start()
        t.join()
        assert errs, "install off the main thread must raise, not silently no-op"


class TestTrainGptPreemption:
    def test_sigterm_checkpoints_and_stops_then_resumes(self, rundir):
        """SIGTERM during a long train run: the loop must finish its step,
        write a ``step_*_preempt`` checkpoint WITH optimizer state, log a
        ``preempted`` record, stop well short of the configured epochs —
        and the checkpoint must resume via pretrained.model/optimizer."""
        from summer_clip_tpu.apps import tokenize_dataset, train_gpt

        tokenize_dataset.run(argv=[
            "max_length=12", "source.n_docs=16", f"output_path={rundir}/c.npy"])
        common = [
            "clip_gpt.gpt_config=test-gpt", "clip_gpt.clip_emb_dim=16",
            "clip_gpt.adapters.emb_hid_dim=16", "clip_gpt.adapters.head_hid_dim=16",
            f"dataset.train.tokens_path={rundir}/c.npy",
            f"dataset.val.tokens_path={rundir}/c.npy",
            "data_loader.train.batch_size=4", "data_loader.val.batch_size=4",
            "training.grad_accum_steps=1", "training.evals_per_epoch=1",
            "training.info_steps=1000",
        ]
        # 500 epochs would run for minutes; the timer fires long before that
        # (even if it lands during compile, the first completed step sees the
        # flag — every landing spot is a valid preemption point)
        timer = threading.Timer(3.0, os.kill, (os.getpid(), signal.SIGTERM))
        timer.start()
        try:
            train_gpt.run(argv=common + ["training.epochs_num=500"])
        finally:
            timer.cancel()

        recs = _records(rundir)
        pre = [r for r in recs if r.get("type") == "preempted"]
        assert pre, "no preempted record — did the run finish before SIGTERM?"
        epoch_nums = [r["epoch"] for r in recs if isinstance(r.get("epoch"), int)]
        assert epoch_nums and max(epoch_nums) < 500
        ckpts = sorted(rundir.rglob("checkpoints/epoch_*/step_*_preempt"))
        assert ckpts, "preemption must leave a resumable step checkpoint"
        assert (ckpts[-1] / "optimizer.ckpt").exists(), \
            "preempt checkpoint must carry optimizer state for exact resume"

        # resume from the eviction point (params + optimizer state)
        train_gpt.run(argv=common + [
            "training.epochs_num=1",
            f"pretrained.model={ckpts[-1]}", "pretrained.optimizer=true",
        ])
        assert any(r.get("type") == "gpt_eval" for r in _records(rundir))
