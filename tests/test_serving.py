"""Continuous-batching serving engine tests (test-gpt, CPU).

The engine's contract: iteration-level batching with mid-stream admission
and slot reuse must not change any request's output — greedy engine output
== the one-shot device-scan sampler (`gen_gpt.generate_device`, top_k=1)
per prompt, regardless of what shares the batch.
"""

import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.full  # heavy tier: excluded from smoke (pytest -m "not full")

import jax
import jax.numpy as jnp
import numpy as np

from summer_clip_tpu.apps.gen_gpt import generate_device
from summer_clip_tpu.engine.serving import ContinuousBatcher
from summer_clip_tpu.models import gpt2 as G


def _model():
    model, cfg = G.build_gpt2("test-gpt")
    variables = {"params": model.init(jax.random.PRNGKey(0),
                                      jnp.zeros((1, 4), jnp.int32))["params"]}
    return model, cfg, variables


def _oracle(model, variables, prompt, max_new):
    out = generate_device(model, variables, prompt, max_new_tokens=max_new,
                          temperature=1.0, top_k=1, rng=jax.random.PRNGKey(7))
    return out[len(prompt):]


class TestContinuousBatcher:
    def test_batched_greedy_matches_single_stream(self):
        model, cfg, variables = _model()
        rng = np.random.RandomState(0)
        prompts = [list(rng.randint(1, cfg.vocab_size, n)) for n in (3, 7, 5, 4)]
        eng = ContinuousBatcher(model, variables, batch_slots=4, max_len=48,
                                greedy=True)
        reqs = [eng.submit(p, max_new_tokens=6) for p in prompts]
        done = eng.run()
        assert len(done) == 4 and all(r.done for r in reqs)
        for p, r in zip(prompts, reqs):
            assert r.out_ids == _oracle(model, variables, p, 6), p

    def test_mid_stream_admission_and_slot_reuse(self):
        """More requests than slots, admitted while others are mid-decode:
        every output still matches the solo oracle (slot-ring reuse without
        cache zeroing is exact)."""
        model, cfg, variables = _model()
        rng = np.random.RandomState(1)
        prompts = [list(rng.randint(1, cfg.vocab_size, 2 + i % 5)) for i in range(7)]
        eng = ContinuousBatcher(model, variables, batch_slots=2, max_len=64,
                                greedy=True)
        reqs = [eng.submit(prompts[0], 5), eng.submit(prompts[1], 9)]
        # let the first two make progress, then trickle in the rest
        done = []
        for _ in range(4):
            done += eng.step()
        reqs += [eng.submit(p, 4 + i % 3) for i, p in enumerate(prompts[2:])]
        done += eng.run()
        assert len(done) == 7
        for r, p in zip(reqs, prompts):
            assert r.out_ids == _oracle(model, variables, p, r.max_new_tokens), p

    def test_eot_termination(self):
        model, cfg, variables = _model()
        prompt = [5, 9, 2]
        # find the greedy first token, then declare it the eot: request must
        # finish after exactly one emitted token
        first = _oracle(model, variables, prompt, 1)[0]
        eng = ContinuousBatcher(model, variables, batch_slots=2, max_len=32,
                                greedy=True, eot_id=first)
        r = eng.submit(prompt, max_new_tokens=10)
        eng.run()
        assert r.done and r.out_ids == [first]

    def test_sampling_mode_runs(self):
        model, cfg, variables = _model()
        eng = ContinuousBatcher(model, variables, batch_slots=2, max_len=32,
                                temperature=0.8, top_k=5,
                                rng=jax.random.PRNGKey(3))
        r1 = eng.submit([1, 2, 3], 5)
        r2 = eng.submit([4, 5], 5)
        eng.run()
        assert len(r1.out_ids) == 5 and len(r2.out_ids) == 5
        assert all(0 <= t < cfg.vocab_size for t in r1.out_ids + r2.out_ids)

    def test_capacity_assertion(self):
        model, cfg, variables = _model()
        eng = ContinuousBatcher(model, variables, batch_slots=1, max_len=16)
        import pytest

        with pytest.raises(AssertionError):
            eng.submit(list(range(1, 14)), max_new_tokens=8)

    def test_chunked_vs_tokenwise_prefill_identical(self):
        """prefill_chunk=True (one left-padded bucketed forward per
        admission) and prefill_chunk=False (token-per-step) produce the
        same greedy outputs — and both match the solo oracle."""
        model, cfg, variables = _model()
        rng = np.random.RandomState(5)
        prompts = [list(rng.randint(1, cfg.vocab_size, n)) for n in (3, 17, 9)]
        outs = {}
        for chunk in (True, False):
            eng = ContinuousBatcher(model, variables, batch_slots=2, max_len=48,
                                    greedy=True, prefill_chunk=chunk)
            reqs = [eng.submit(p, 6) for p in prompts]
            eng.run()
            outs[chunk] = [r.out_ids for r in reqs]
        assert outs[True] == outs[False]
        for p, got in zip(prompts, outs[True]):
            assert got == _oracle(model, variables, p, 6)

    def test_burst_matches_per_step_engine(self):
        """burst=N emits exactly what per-step dispatch emits. Greedy: with
        a backlog (3 requests / 2 slots — rows retire mid-burst, admission
        timing shifts, outputs must not). Sampled: without a backlog (the
        host pre-splits the identical rng stream; under a backlog admission
        timing legitimately realigns the stream)."""
        model, cfg, variables = _model()
        rng = np.random.RandomState(9)
        prompts = [list(rng.randint(1, cfg.vocab_size, n)) for n in (3, 11, 6)]
        budgets = [7, 3, 5]
        for greedy, nreq in ((True, 3), (False, 2)):
            outs = {}
            # (burst, pipeline): pipeline>1 chains bursts with the feed
            # token on device — emitted ids must stay bitwise per-step
            for burst, pipe in ((1, 1), (4, 1), (2, 3)):
                # wave=False: this pins the LEGACY burst discipline (wave
                # admission legitimately realigns the sampled rng stream —
                # its own guarantees are pinned in the wave tests below)
                eng = ContinuousBatcher(model, variables, batch_slots=2,
                                        max_len=48, greedy=greedy, burst=burst,
                                        pipeline=pipe, wave=False,
                                        rng=jax.random.PRNGKey(3))
                reqs = [eng.submit(p, m)
                        for p, m in zip(prompts[:nreq], budgets[:nreq])]
                eng.run()
                outs[(burst, pipe)] = [r.out_ids for r in reqs]
            assert outs[(1, 1)] == outs[(4, 1)], f"greedy={greedy}"
            assert outs[(1, 1)] == outs[(2, 3)], f"greedy={greedy}"

    def test_wave_staggered_budgets_match_oracle(self):
        """Wave dispatch (batched admission prefill + per-row budget masks
        inside the chain + one sync per window, VERDICT r3 #3): greedy
        per-request ids stay pinned to the solo sampler under STAGGERED
        budgets — rows retire mid-chain ON DEVICE (the chain runs to the
        max remaining budget) and freed slots backfill through the batched
        prefill."""
        model, cfg, variables = _model()
        rng = np.random.RandomState(3)
        prompts = [list(rng.randint(1, cfg.vocab_size, 2 + i % 6))
                   for i in range(9)]
        budgets = [1, 5, 17, 3, 9, 2, 12, 7, 4]
        eng = ContinuousBatcher(model, variables, batch_slots=3, max_len=64,
                                greedy=True, burst=4, pipeline=3, wave=True)
        reqs = [eng.submit(p, mb) for p, mb in zip(prompts, budgets)]
        done = eng.run()
        assert len(done) == 9 and all(r.done for r in reqs)
        for r, p, mb in zip(reqs, prompts, budgets):
            assert r.out_ids == _oracle(model, variables, p, mb), (p, mb)

    def test_wave_matches_legacy_greedy_with_eot(self):
        """wave=True and wave=False emit identical greedy ids when streams
        retire early via eot_id (post-EOT chain tokens are junk both paths
        discard)."""
        model, cfg, variables = _model()
        rng = np.random.RandomState(11)
        prompts = [list(rng.randint(1, cfg.vocab_size, n))
                   for n in (3, 11, 6, 2, 9)]
        # pick the modal greedy token as EOT so retirements actually happen
        probe = ContinuousBatcher(model, variables, batch_slots=2, max_len=48,
                                  greedy=True, wave=False)
        pr = [probe.submit(p, 8) for p in prompts]
        probe.run()
        hist: dict = {}
        for r in pr:
            for t in r.out_ids:
                hist[t] = hist.get(t, 0) + 1
        eot = int(max(hist, key=hist.get))
        outs = {}
        for wave in (False, True):
            eng = ContinuousBatcher(model, variables, batch_slots=2,
                                    max_len=48, greedy=True, burst=4,
                                    pipeline=2, wave=wave, eot_id=eot)
            reqs = [eng.submit(p, 8) for p in prompts]
            eng.run()
            outs[wave] = [r.out_ids for r in reqs]
        assert outs[True] == outs[False]
        assert any(r and r[-1] == eot and len(r) < 8 for r in outs[True])

    def test_quant_int8_engine_runs(self):
        """quant_int8 engine: int8 weight tree, requests complete, first
        greedy token agrees with full precision (margin-dominated)."""
        model, cfg, variables = _model()
        prompt = [3, 7, 11]
        full = ContinuousBatcher(model, variables, batch_slots=2, max_len=32,
                                 greedy=True)
        rf = full.submit(prompt, 4)
        full.run()
        q = ContinuousBatcher(model, variables, batch_slots=2, max_len=32,
                              greedy=True, quant_int8=True)
        rq = q.submit(prompt, 4)
        q.run()
        assert len(rq.out_ids) == 4
        assert rq.out_ids[0] == rf.out_ids[0]

    def test_per_row_cache_index_matches_scalar(self):
        """The (B,)-indexed cache path (models/gpt2.py) is numerically the
        scalar-index path when all rows share the same index."""
        model, cfg, variables = _model()
        ids = jax.random.randint(jax.random.PRNGKey(2), (2, 6), 1, cfg.vocab_size)
        full = model.apply(variables, ids)["logits"]

        cache = model.apply(variables, method=model.init_cache, batch=2, max_len=6)
        for layer in cache:
            layer["index"] = jnp.zeros((2,), jnp.int32)
        logits_steps = []
        for t in range(6):
            out = model.apply(variables, ids[:, t:t + 1],
                              position_offset=jnp.full((2, 1), t), cache=cache)
            cache = out["cache"]
            logits_steps.append(out["logits"][:, 0])
        step_logits = jnp.stack(logits_steps, axis=1)
        np.testing.assert_allclose(np.asarray(step_logits), np.asarray(full),
                                   atol=2e-4, rtol=2e-4)

    def test_top_p_vanishing_nucleus_is_greedy(self):
        """top_p=1e-6 leaves only the argmax in the nucleus — engine outputs
        (sampled path, NOT greedy flag) must equal the greedy oracle, so the
        nucleus mask provably reaches the engine's step + prefill programs."""
        model, cfg, variables = _model()
        rng = np.random.RandomState(5)
        prompts = [list(rng.randint(1, cfg.vocab_size, n)) for n in (4, 2, 6)]
        eng = ContinuousBatcher(model, variables, batch_slots=2, max_len=48,
                                top_k=8, top_p=1e-6)
        reqs = [eng.submit(p, max_new_tokens=5) for p in prompts]
        eng.run()
        for p, r in zip(prompts, reqs):
            assert r.out_ids == _oracle(model, variables, p, 5), p

    def test_tp_engine_matches_single_device(self):
        """Megatron-TP serving (mesh kwarg): greedy engine outputs over a
        model=2 mesh == the unsharded solo oracle, mid-stream admission
        included."""
        from summer_clip_tpu.parallel import create_mesh

        model, cfg, variables = _model()
        mesh = create_mesh(data=1, model=2, devices=jax.devices()[:2])
        rng = np.random.RandomState(3)
        prompts = [list(rng.randint(1, cfg.vocab_size, n)) for n in (3, 6, 2, 5)]
        eng = ContinuousBatcher(model, variables, batch_slots=2, max_len=48,
                                greedy=True, mesh=mesh)
        reqs = [eng.submit(p, max_new_tokens=5) for p in prompts]
        done = eng.run()
        assert len(done) == 4
        for p, r in zip(prompts, reqs):
            assert r.out_ids == _oracle(model, variables, p, 5), p


class TestMegakernelServing:
    """Round-5 megakernel wave serving: every chain iteration runs the whole
    block stack for all slots in ONE pallas launch (batched streams). The
    contract is unchanged: greedy per-request ids == the solo megakernel
    sampler on the same int8 tree, regardless of batch-mates/admissions."""

    def _mega_model(self):
        from summer_clip_tpu.engine.quant import quantize_tree

        model, cfg = G.build_gpt2("test-gpt-mega")
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 4), jnp.int32))["params"]
        variables = {"params": quantize_tree(params)}
        return model, cfg, variables

    def _mega_oracle(self, model, variables, prompt, max_new):
        out = generate_device(model, variables, prompt,
                              max_new_tokens=max_new, temperature=1.0,
                              top_k=1, quant_int8=True, megakernel=True,
                              rng=jax.random.PRNGKey(7))
        return out[len(prompt):]

    def test_mega_engine_matches_solo_mega_sampler(self):
        model, cfg, variables = self._mega_model()
        rng = np.random.RandomState(0)
        prompts = [list(rng.randint(1, cfg.vocab_size, n)) for n in (3, 7, 5)]
        eng = ContinuousBatcher(model, variables, batch_slots=3, max_len=96,
                                greedy=True, quant_int8=True, megakernel=True,
                                burst=4, pipeline=2)
        reqs = [eng.submit(p, max_new_tokens=m)
                for p, m in zip(prompts, (6, 3, 8))]   # staggered budgets
        done = eng.run()
        assert len(done) == 3 and all(r.done for r in reqs)
        for r, p in zip(reqs, prompts):
            assert r.out_ids == self._mega_oracle(
                model, variables, p, r.max_new_tokens), p

    def test_mega_engine_mid_stream_admission(self):
        """Slot reuse with per-stream mega rings: stale K/V beyond a reused
        ring's index must be invisible (the masked-merge prefill + index
        mask), so late admissions still match the solo oracle."""
        model, cfg, variables = self._mega_model()
        rng = np.random.RandomState(1)
        prompts = [list(rng.randint(1, cfg.vocab_size, 2 + i % 4))
                   for i in range(5)]
        eng = ContinuousBatcher(model, variables, batch_slots=2, max_len=96,
                                greedy=True, quant_int8=True, megakernel=True,
                                burst=4, pipeline=2)
        reqs = [eng.submit(prompts[0], 5), eng.submit(prompts[1], 7)]
        done = []
        for _ in range(2):
            done += eng.step()
        reqs += [eng.submit(p, 4 + i % 2) for i, p in enumerate(prompts[2:])]
        done += eng.run()
        assert len(done) == 5
        for r, p in zip(reqs, prompts):
            assert r.out_ids == self._mega_oracle(
                model, variables, p, r.max_new_tokens), p

    def test_mega_engine_eot_termination(self):
        model, cfg, variables = self._mega_model()
        prompt = [5, 9, 2]
        first = self._mega_oracle(model, variables, prompt, 1)[0]
        eng = ContinuousBatcher(model, variables, batch_slots=2, max_len=96,
                                greedy=True, quant_int8=True, megakernel=True,
                                eot_id=first, burst=4, pipeline=2)
        r = eng.submit(prompt, max_new_tokens=10)
        eng.run()
        assert r.done and r.out_ids == [first]

    def test_mega_engine_requires_int8(self):
        import pytest

        model, cfg, _ = self._mega_model()
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 4), jnp.int32))["params"]
        with pytest.raises(AssertionError, match="int8"):
            ContinuousBatcher(model, {"params": params}, batch_slots=2,
                              max_len=96, megakernel=True)

    def test_mega_engine_sampling_runs(self):
        model, cfg, variables = self._mega_model()
        eng = ContinuousBatcher(model, variables, batch_slots=2, max_len=96,
                                temperature=0.8, top_k=5, quant_int8=True,
                                megakernel=True, burst=4, pipeline=2,
                                rng=jax.random.PRNGKey(3))
        r1 = eng.submit([1, 2, 3], 5)
        r2 = eng.submit([4, 5], 5)
        eng.run()
        assert len(r1.out_ids) == 5 and len(r2.out_ids) == 5
        assert all(0 <= t < cfg.vocab_size for t in r1.out_ids + r2.out_ids)
