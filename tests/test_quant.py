"""Weight-only compression for the decode path (engine/quant.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from summer_clip_tpu.apps.gen_gpt import generate_device
from summer_clip_tpu.engine import quant as Q
from summer_clip_tpu.models import gpt2 as G


def _model():
    model, cfg = G.build_gpt2("test-gpt")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))["params"]
    return model, cfg, params


class TestQuantTree:
    def test_int8_roundtrip_error_bound(self):
        _, _, params = _model()
        q = Q.quantize_tree(params)
        deq = Q.dequantize_tree(q, dtype=jnp.float32)
        for (path, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(params)[0],
                jax.tree_util.tree_flatten_with_path(deq)[0]):
            a, b = np.asarray(a), np.asarray(b)
            name = str(getattr(path[-1], "key", ""))
            if a.ndim >= 2:
                if name in Q._EMBED_NAMES:  # gather tables: per-row scales
                    amax = np.abs(a).max(axis=-1, keepdims=True)
                else:                        # kernels: per-column scales
                    amax = np.abs(a).max(axis=tuple(range(a.ndim - 1)), keepdims=True)
                # symmetric int8: error <= half a quantization step
                assert np.all(np.abs(a - b) <= amax / 127.0 * 0.5001), path
            else:
                np.testing.assert_array_equal(a, b)  # sensitive leaves untouched

    def test_embedding_outlier_row_does_not_poison_table(self):
        """wte/wpe quantize per-ROW: one anomalous 100x token must not widen
        every other row's quantization step (real GPT-2 has such tokens —
        that is what sandbox/anomalous_tokens.py studies)."""
        rng = np.random.RandomState(0)
        table = rng.randn(1000, 64).astype(np.float32)
        table[7] *= 100.0
        tree = {"wte": {"embedding": jnp.asarray(table)}}
        deq = np.asarray(Q.dequantize_tree(Q.quantize_tree(tree),
                                           dtype=jnp.float32)["wte"]["embedding"])
        normal = np.arange(1000) != 7
        rel = np.abs(deq[normal] - table[normal]).max() / np.abs(table[normal]).max()
        assert rel < 0.01, rel  # per-column scaling put this at ~0.2

    def test_bf16_cast_leaves_small_leaves(self):
        _, _, params = _model()
        c = Q.cast_params(params)
        flat = jax.tree_util.tree_flatten_with_path(c)[0]
        assert any(x.dtype == jnp.bfloat16 for _, x in flat if x.ndim >= 2)
        for path, x in flat:
            name = str(getattr(path[-1], "key", ""))
            if x.ndim < 2 or name in ("bias", "scale"):
                assert x.dtype == jnp.float32, path

    def test_footprint_shrinks_4x(self):
        _, _, params = _model()
        q = Q.quantize_tree(params)

        def nbytes(tree):
            return sum(x.size * x.dtype.itemsize
                       for x in jax.tree_util.tree_leaves(tree))
        assert nbytes(q) < nbytes(params) / 3  # int8 + f32 scales + f32 smalls


class TestQuantDecode:
    def test_int8_decode_runs_and_tracks_full_precision(self):
        """quant_int8 decode: valid ids, and the greedy trajectory matches
        full precision for the first steps (before quantization error can
        compound through sampling divergence on a random tiny model)."""
        model, cfg, params = _model()
        prompt = [3, 7, 11, 2]
        full = generate_device(model, {"params": params}, prompt,
                               max_new_tokens=8, top_k=1,
                               rng=jax.random.PRNGKey(1))
        qtree = Q.quantize_tree(params)
        quant = generate_device(model, {"params": qtree}, prompt,
                                max_new_tokens=8, top_k=1,
                                rng=jax.random.PRNGKey(1), quant_int8=True)
        assert len(quant) == len(full)
        assert all(0 <= t < cfg.vocab_size for t in quant)
        # logit margins on random tiny nets are small; require only that
        # the first greedy pick agrees (deterministic, margin-dominated)
        assert quant[len(prompt)] == full[len(prompt)]

    def test_int8_batched_decode_runs(self):
        from summer_clip_tpu.apps.gen_gpt import generate_device_batched

        model, cfg, params = _model()
        qtree = Q.quantize_tree(params)
        prompts = [[3, 7, 11], [2, 5]]
        outs = generate_device_batched(model, {"params": qtree}, prompts,
                                       max_new_tokens=4, top_k=1,
                                       rng=jax.random.PRNGKey(2), quant_int8=True)
        assert len(outs) == 2
        assert all(len(o) == len(p) + 4 for o, p in zip(outs, prompts))
