"""Weight-streaming GEMV (ops/gemv.py): kernel vs oracle, dispatch, and the
quantized-tree decode path through QDense."""

import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.full  # heavy tier: excluded from smoke (pytest -m "not full")

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


class TestFusedQmlp:
    def _mlp(self, key, r, d, h):
        rng = np.random.RandomState(key)
        x = jnp.asarray(rng.randn(r, d).astype(np.float32))
        w1 = jnp.asarray(rng.randint(-127, 128, (d, h)), jnp.int8)
        s1 = jnp.asarray(np.abs(rng.randn(1, h)).astype(np.float32) * 0.01)
        b1 = jnp.asarray(rng.randn(h).astype(np.float32) * 0.1)
        w2 = jnp.asarray(rng.randint(-127, 128, (h, d)), jnp.int8)
        s2 = jnp.asarray(np.abs(rng.randn(1, d)).astype(np.float32) * 0.01)
        b2 = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)
        return x, w1, s1, b1, w2, s2, b2

    @pytest.mark.parametrize("r,d,h", [(1, 128, 512), (8, 128, 384),
                                       (2, 256, 1024)])
    def test_matches_reference(self, r, d, h):
        args = self._mlp(0, r, d, h)
        out = G.fused_qmlp(*args, interpret=True)
        ref = G.fused_qmlp_reference(*args)
        # chunked f32 accumulation vs one dot: tiny ordering drift only
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_multi_chunk_accumulation(self):
        """h forces > 1 grid step (accumulator init/accumulate split)."""
        x, w1, s1, b1, w2, s2, b2 = self._mlp(1, 3, 512, 8192)
        assert G._pick_bh(512, 8192, 1) < 8192  # really multi-step
        out = G.fused_qmlp(x, w1, s1, b1, w2, s2, b2, interpret=True)
        ref = G.fused_qmlp_reference(x, w1, s1, b1, w2, s2, b2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_qmlp_dispatch_gates(self, monkeypatch):
        x, w1, s1, b1, w2, s2, b2 = self._mlp(2, 2, 128, 512)
        l1, l2 = {"q": w1, "scale": s1}, {"q": w2, "scale": s2}
        # opt-in: off by default (measured net-negative on-chip)
        assert G.qmlp(x, l1, b1, l2, b2, jnp.float32) is None
        monkeypatch.setenv("SUMMER_CLIP_FUSED_MLP", "1")
        assert G.qmlp(x, l1, b1, l2, b2, jnp.float32) is not None
        # plain arrays, wide rows, and illegal D all decline
        assert G.qmlp(x, w1.astype(jnp.float32), b1, l2, b2, jnp.float32) is None
        wide = jnp.tile(x, (8, 1))[:16]
        assert G.qmlp(wide, l1, b1, l2, b2, jnp.float32) is None
        xs, w1s, s1s, b1s, w2s, s2s, b2s = self._mlp(3, 2, 96, 384)
        assert G.qmlp(xs, {"q": w1s, "scale": s1s}, b1s,
                      {"q": w2s, "scale": s2s}, b2s, jnp.float32) is None

    def test_block_fused_matches_unfused(self, monkeypatch):
        """A quantized GPT2 block (D=128) takes the fused path and tracks
        the unfused int8 pair; greedy decode first pick is preserved."""
        from summer_clip_tpu.engine.quant import quantize_tree
        from summer_clip_tpu.models import gpt2 as gpt2_mod

        cfg = gpt2_mod.GPT2Config("fused-gpt", vocab_size=512, n_positions=64,
                                  n_embd=128, n_layer=2, n_head=2)
        model = gpt2_mod.GPT2(cfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 4), jnp.int32))["params"]
        qtree = {"params": quantize_tree(params)}
        ids = jnp.asarray([[3, 7, 11, 2]])

        monkeypatch.setenv("SUMMER_CLIP_FUSED_MLP", "1")
        fused_calls = []
        real = G.fused_qmlp
        monkeypatch.setattr(G, "fused_qmlp",
                            lambda *a, **kw: fused_calls.append(1) or real(*a, **kw))
        cache = model.apply(qtree, method=model.init_cache, batch=1, max_len=8)
        out_f = model.apply(qtree, ids[:, :1], position_offset=0,
                            cache=cache)["logits"]
        assert fused_calls, "decode-shaped quant block did not fuse"
        monkeypatch.setenv("SUMMER_CLIP_GEMV", "0")
        out_u = model.apply(qtree, ids[:, :1], position_offset=0,
                            cache=cache)["logits"]
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                                   rtol=5e-2, atol=5e-2)
        assert int(jnp.argmax(out_f[0, -1])) == int(jnp.argmax(out_u[0, -1]))


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
