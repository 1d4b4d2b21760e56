"""Weight-streaming GEMV (ops/gemv.py): kernel vs oracle, dispatch, and the
quantized-tree decode path through QDense."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summer_clip_tpu.ops import gemv as G


def _xw(key, r, k, n):
    rng = np.random.RandomState(key)
    x = jnp.asarray(rng.randn(r, k).astype(np.float32))
    q = jnp.asarray(rng.randint(-127, 128, (k, n)), jnp.int8)
    scale = jnp.asarray(np.abs(rng.randn(1, n)).astype(np.float32) * 0.01)
    return x, q, scale


class TestStreamedQmatmul:
    @pytest.mark.parametrize("r,k,n", [(1, 256, 384), (8, 128, 512), (3, 160, 1280)])
    def test_int8_matches_reference_exactly(self, r, k, n):
        x, q, scale = _xw(0, r, k, n)
        ref = G.matmul_reference(x, q, scale)
        out = G.streamed_qmatmul(x, q, scale, interpret=True)
        # same math; only f32 accumulation order differs between backends
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_bf16_weights_no_scale(self):
        x, q, _ = _xw(1, 4, 128, 256)
        w = (q.astype(jnp.float32) * 0.01).astype(jnp.bfloat16)
        ref = G.matmul_reference(x, w)
        out = G.streamed_qmatmul(x, w, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_row_padding_contributes_nothing(self):
        """r < 8: padded rows must not leak into the real rows."""
        x, q, scale = _xw(2, 2, 128, 256)
        solo = G.streamed_qmatmul(x[:1], q, scale, interpret=True)
        both = G.streamed_qmatmul(x, q, scale, interpret=True)
        np.testing.assert_allclose(np.asarray(both[:1]), np.asarray(solo),
                                   rtol=1e-6)


class TestQdot:
    def test_routes_decode_shapes_to_kernel(self, monkeypatch):
        calls = []
        real = G.streamed_qmatmul
        monkeypatch.setattr(G, "streamed_qmatmul",
                            lambda *a, **kw: calls.append("kern") or real(*a, **kw))
        x, q, scale = _xw(3, 2, 128, 256)
        leaf = {"q": q, "scale": scale}
        out = G.qdot(x, leaf, jnp.float32)
        assert calls == ["kern"] and out.shape == (2, 256)
        # 3D leading dims flatten into rows
        out3 = G.qdot(x.reshape(2, 1, 128), leaf, jnp.float32)
        assert calls == ["kern", "kern"] and out3.shape == (2, 1, 256)

    def test_wide_and_illegal_shapes_fall_back(self, monkeypatch):
        monkeypatch.setattr(G, "streamed_qmatmul",
                            lambda *a, **kw: pytest.fail("kernel on fallback shape"))
        x, q, scale = _xw(4, 16, 128, 256)
        leaf = {"q": q, "scale": scale}
        out = G.qdot(x, leaf, jnp.float32)  # 16 rows > 8
        ref = G.matmul_reference(x, q, scale)  # fallback shares kernel math
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
        xb, qb, sb = _xw(5, 2, 120, 256)  # K % 32 != 0: sublane tile illegal
        G.qdot(xb, {"q": qb, "scale": sb}, jnp.float32)
        xc, qc, sc = _xw(6, 2, 128, 96)  # N < 128: below one lane tile
        G.qdot(xc, {"q": qc, "scale": sc}, jnp.float32)

    def test_unaligned_n_routes_to_kernel_and_matches(self):
        # bn need not divide n (masked tail) and n need not be 128-aligned
        x, q, scale = _xw(7, 2, 128, 192)
        out = G.qdot(x, {"q": q, "scale": scale}, jnp.float32)
        ref = G.matmul_reference(x, q, scale)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_plain_kernel_leaf(self):
        x, q, _ = _xw(6, 2, 64, 96)
        w = q.astype(jnp.float32) * 0.01
        out = G.qdot(x, w, jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(jnp.dot(x, w)),
                                   rtol=1e-6)


class TestGatherRows:
    def test_int8_rows_match_dequant_gather(self):
        rng = np.random.RandomState(7)
        table = jnp.asarray(rng.randn(50, 16).astype(np.float32))
        from summer_clip_tpu.engine.quant import quantize_array

        leaf = quantize_array(table, per_row=True)
        ids = jnp.asarray([3, 0, 49, 3])
        rows = G.gather_rows(leaf, ids)
        full = leaf["q"].astype(jnp.float32) * leaf["scale"]
        np.testing.assert_allclose(np.asarray(rows),
                                   np.asarray(jnp.take(full, ids, axis=0)),
                                   rtol=1e-6)

    def test_plain_rows_are_jnp_take(self):
        table = jnp.arange(12.0).reshape(4, 3)
        np.testing.assert_array_equal(
            np.asarray(G.gather_rows(table, jnp.asarray([2, 0]))),
            np.asarray(table[jnp.asarray([2, 0])]))


class TestQuantizedModelApply:
    """A tile-legal GPT runs end-to-end off the stored int8 tree (QDense
    kernel path on every block GEMV) and tracks the dequantized oracle."""

    def _model(self):
        from summer_clip_tpu.models import gpt2 as gpt2_mod

        cfg = gpt2_mod.GPT2Config("gemv-gpt", vocab_size=512, n_positions=64,
                                  n_embd=128, n_layer=2, n_head=2)
        model = gpt2_mod.GPT2(cfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 4), jnp.int32))["params"]
        return model, cfg, params

    def test_qtree_apply_tracks_dequantized(self):
        from summer_clip_tpu.engine.quant import dequantize_tree, quantize_tree

        model, cfg, params = self._model()
        ids = jnp.asarray([[3, 7, 11, 2]])
        qtree = quantize_tree(params)
        out_q = model.apply({"params": qtree}, ids)["logits"]
        deq = dequantize_tree(qtree, dtype=jnp.float32)
        out_d = model.apply({"params": deq}, ids)["logits"]
        # same int8 values; only scale-after-dot vs scale-into-weights rounding
        np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_d),
                                   atol=2e-2, rtol=2e-2)

    def test_qtree_decode_matches_full_precision_first_pick(self):
        from summer_clip_tpu.apps.gen_gpt import generate_device
        from summer_clip_tpu.engine.quant import quantize_tree

        model, cfg, params = self._model()
        prompt = [3, 7, 11, 2]
        full = generate_device(model, {"params": params}, prompt,
                               max_new_tokens=6, top_k=1,
                               rng=jax.random.PRNGKey(1))
        quant = generate_device(model, {"params": quantize_tree(params)},
                                prompt, max_new_tokens=6, top_k=1,
                                rng=jax.random.PRNGKey(1), quant_int8=True)
        assert len(quant) == len(full)
        assert all(0 <= t < cfg.vocab_size for t in quant)
        assert quant[len(prompt)] == full[len(prompt)]

    def test_clipgpt_qtree_decode_runs(self):
        from summer_clip_tpu.apps.gen_gpt import generate_device
        from summer_clip_tpu.engine.quant import quantize_tree
        from summer_clip_tpu.models import gpt2 as gpt2_mod

        cfg = gpt2_mod.GPT2Config("gemv-clip", vocab_size=0, n_positions=64,
                                  n_embd=128, n_layer=2, n_head=2)
        model = gpt2_mod.ClipGPT(cfg, clip_vocab_size=512, clip_emb_dim=64,
                                 emb_hid_dim=64, head_hid_dim=64)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 4), jnp.int32))["params"]
        out = generate_device(model, {"params": quantize_tree(params)},
                              [3, 7, 11], max_new_tokens=5, top_k=1,
                              rng=jax.random.PRNGKey(2), quant_int8=True)
        assert len(out) == 8 and all(0 <= t < 512 for t in out)
