"""Speculative decoding (engine/speculative.py): draft proposes, target
verifies — output must be bit-identical to the target-only greedy decode."""

import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.full  # heavy tier: excluded from smoke (pytest -m "not full")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summer_clip_tpu.engine.speculative import generate_device_speculative
from summer_clip_tpu.models import gpt2 as G


def _build(seed, cfg_name="test-gpt", **overrides):
    cfg = G.GPT2_CONFIGS[cfg_name]
    if overrides:
        import dataclasses

        cfg = dataclasses.replace(cfg, **overrides)
        model = G.GPT2(cfg)
    else:
        model, cfg = G.build_gpt2(cfg_name)
    variables = {"params": model.init(jax.random.PRNGKey(seed),
                                      jnp.zeros((1, 8), jnp.int32))["params"]}
    return model, variables


class TestSpeculative:
    def setup_method(self):
        self.target, self.tvars = _build(0)
        from summer_clip_tpu.apps.gen_gpt import generate_device

        self.generate_device = generate_device
        self.prompt = [3, 17, 101, 9]

    def _solo(self, max_new=16):
        return self.generate_device(self.target, self.tvars, self.prompt,
                                    max_new_tokens=max_new, top_k=1,
                                    rng=jax.random.PRNGKey(0))

    @pytest.mark.parametrize("k", [1, 3, 5])
    def test_weak_draft_exact_output(self, k):
        """A draft with different weights (and a smaller tower) never changes
        the output — acceptance only keeps tokens the target agrees with."""
        draft, dvars = _build(7, n_embd=16, n_layer=1)
        out = generate_device_speculative(
            self.target, self.tvars, draft, dvars, self.prompt,
            max_new_tokens=16, k=k)
        assert out == self._solo(16)

    def test_perfect_draft_exact_output(self):
        """Draft == target: every window fully accepted, same output."""
        out = generate_device_speculative(
            self.target, self.tvars, self.target, self.tvars, self.prompt,
            max_new_tokens=16, k=4)
        assert out == self._solo(16)

    def test_verify_iterations_amortize(self):
        """THE point of speculation: with draft == target every k-window is
        fully accepted, so 16 tokens need ceil(16/(k+1)) = 4 verify forwards,
        not 16. Regression: the draft's prefilled KV cache was discarded
        (proposals conditioned on an empty cache), silently driving
        acceptance to zero — bit-identical output, 16 verify forwards."""
        out, stats = generate_device_speculative(
            self.target, self.tvars, self.target, self.tvars, self.prompt,
            max_new_tokens=16, k=3, return_stats=True)
        assert out == self._solo(16)
        assert stats["verify_iters"] == 4, stats

    def test_eot_truncates_like_solo(self):
        solo = self._solo(16)
        eot = solo[len(self.prompt) + 3]  # 4th generated token as fake eot
        solo_eot = self.generate_device(
            self.target, self.tvars, self.prompt, max_new_tokens=16,
            top_k=1, rng=jax.random.PRNGKey(0), eot_id=eot)
        draft, dvars = _build(7, n_embd=16, n_layer=1)
        spec = generate_device_speculative(
            self.target, self.tvars, draft, dvars, self.prompt,
            max_new_tokens=16, k=4, eot_id=eot)
        assert spec == solo_eot

    def test_quant_int8_matches_solo_quant_decode(self):
        """int8 target + int8 draft (stored trees through QDense/qdot) emit
        exactly what the solo int8 decode emits — the draft still never
        changes tokens, only speed."""
        from summer_clip_tpu.engine.quant import quantize_tree

        qt = {"params": quantize_tree(self.tvars["params"])}
        solo = self.generate_device(self.target, qt, self.prompt,
                                    max_new_tokens=12, top_k=1,
                                    rng=jax.random.PRNGKey(0), quant_int8=True)
        draft, dvars = _build(7, n_embd=16, n_layer=1)
        qd = {"params": quantize_tree(dvars["params"])}
        out = generate_device_speculative(
            self.target, qt, draft, qd, self.prompt,
            max_new_tokens=12, k=3, quant_int8=True, draft_quant_int8=True)
        assert out == solo

    def test_position_budget_asserted(self):
        draft, dvars = _build(7, n_embd=16, n_layer=1)
        with pytest.raises(AssertionError, match="positions"):
            generate_device_speculative(
                self.target, self.tvars, draft, dvars,
                list(range(90)), max_new_tokens=16, k=4)
