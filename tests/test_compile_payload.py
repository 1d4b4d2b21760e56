"""Canary: jitted hot-path programs must not embed big arrays as constants.

A closure-captured ``jax.Array`` lowers into a literal constant in the
MLIR. On the target host every XLA compile is forwarded to an
out-of-process helper, so an embedded (50k, 1000) f32 clip_logits turned
every cold compile of the image_attention accuracy grid into a ~200MB RPC
payload (~100s; attributed and fixed in round 5 — docs/KERNELS.md "The
all_logits cold compile", tools/attr_grid_variants.py). These tests pin
the fix structurally: lower the shipped programs on CPU at small-but-
nontrivial operand sizes and assert the lowered text stays orders of
magnitude below the operand bytes.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _lowered_len(fn, *args) -> int:
    return len(jax.jit(fn).lower(*args).as_text())


class TestNoEmbeddedConstants:
    def test_grid_eval_lowering_is_small(self):
        from summer_clip_tpu.apps.image_attention import ImageAttention

        nt, c, nb, na = 512, 128, 4, 3
        app = ImageAttention.__new__(ImageAttention)
        app.test_labels = np.zeros(nt, np.int64)
        app.clip_logits = jnp.asarray(
            np.random.RandomState(0).randn(nt, c).astype(np.float32))

        class _Cfg:  # minimal cfg surface _grid_eval_fn reads
            class cache:
                alpha = [0.0, 1.0, 2.0]

        app.cfg = _Cfg()
        evaluate = app._grid_eval_fn()
        chunk = jnp.zeros((nb, nt, c), jnp.float32)
        # the operands are ~1MB; with the footgun the lowering embeds the
        # (nt, c) f32 logits (~0.25MB of literal bytes, hex-expanded to
        # several MB of text). The fixed program lowers to a few 100KB.
        out = evaluate(chunk)  # must also still run
        assert np.asarray(out[0]).shape == (nb, na)
        # lower the INNER jitted program with its operands as arguments —
        # the wrapper exposes it precisely so this canary can see the
        # as-compiled payload
        text_len = len(evaluate.jitted.lower(chunk, *evaluate.operands)
                       .as_text())
        assert text_len < 400_000, text_len

    def test_tip_accs_lowering_is_small(self):
        from summer_clip_tpu.methods import tip as T

        nt, c = 512, 64
        rng = np.random.RandomState(0)
        feats = rng.randn(nt, 32).astype(np.float32)
        clip_logits = rng.randn(nt, c).astype(np.float32)
        keys = rng.randn(128, 32).astype(np.float32)
        vals = np.eye(c, dtype=np.float32)[rng.randint(0, c, 128)]
        labels = rng.randint(0, c, nt)
        # search over a tiny grid; the accuracy program must not embed the
        # (nt, c) logits. search_hp is exercised end-to-end elsewhere; here
        # we only care that it runs through the args-passing path.
        beta, alpha, acc = T.search_hp(feats, labels, clip_logits, keys, vals,
                                       search_scale=(2, 2), search_step=(4, 3))
        assert 0.0 <= acc <= 100.0

    def test_label_rank_program_is_small(self):
        from summer_clip_tpu.methods.zeroshot import label_rank

        logits = jnp.zeros((512, 128), jnp.float32)
        labels = jnp.zeros((512,), jnp.int32)
        assert _lowered_len(label_rank, logits, labels) < 120_000
