"""Kernel tests vs dense oracles (Pallas runs in interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summer_clip_tpu.ops import attention as att
from summer_clip_tpu.ops import cache_kernels as ca


def _rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.full
class TestFlashAttention:
    @pytest.mark.parametrize("tq,tk,d", [(77, 77, 64), (128, 256, 64), (100, 60, 96)])
    def test_matches_reference(self, tq, tk, d):
        q, k, v = _rand(0, 2, tq, d), _rand(1, 2, tk, d), _rand(2, 2, tk, d)
        ref = att.mha_reference(q, k, v)
        out = att.flash_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)

    def test_causal_matches_reference(self):
        tq = tk = 80
        q, k, v = _rand(3, 2, tq, 64), _rand(4, 2, tk, 64), _rand(5, 2, tk, 64)
        mask = jnp.where(jnp.tril(jnp.ones((tq, tk), bool)), 0.0, -1e30)
        ref = att.mha_reference(q, k, v, mask=mask)
        out = att.flash_attention(q, k, v, causal=True, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)

    @pytest.mark.parametrize("tq,tk,off", [(16, 48, 32), (7, 30, 23), (128, 300, 100)])
    def test_q_offset_chunked_prefill_matches_reference(self, tq, tk, off):
        """Causal attention with the query block at an absolute offset into
        the KV history — the serving engine's chunked-prefill shape (row i
        attends keys <= off + i); fused kernel == dense oracle."""
        q, k, v = _rand(9, 2, tq, 64), _rand(10, 2, tk, 64), _rand(11, 2, tk, 64)
        mask = jnp.where(off + jnp.arange(tq)[:, None] >= jnp.arange(tk)[None, :],
                         0.0, -1e30)
        ref = att.mha_reference(q, k, v, mask=mask)
        out = att.flash_attention(q, k, v, causal=True, q_offset=off,
                                  interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
        # the multi-head wrapper's XLA path must apply the same offset mask
        b, dm, h = 2, 128, 2
        qm, km, vm = _rand(12, b, tq, dm), _rand(13, b, tk, dm), _rand(14, b, tk, dm)
        o_ref = att.multi_head_attention(qm, km, vm, num_heads=h, mask=mask,
                                         use_flash=False)
        o_off = att.multi_head_attention(qm, km, vm, num_heads=h, causal=True,
                                         q_offset=off, use_flash=False)
        np.testing.assert_allclose(np.asarray(o_off), np.asarray(o_ref),
                                   atol=2e-5, rtol=2e-5)

    def test_q_offset_grads_match_reference(self):
        """flash_attention_ad's recompute backward must honor q_offset."""
        tq, tk, off = 8, 24, 16
        q, k, v = _rand(15, 1, tq, 64), _rand(16, 1, tk, 64), _rand(17, 1, tk, 64)
        mask = jnp.where(off + jnp.arange(tq)[:, None] >= jnp.arange(tk)[None, :],
                         0.0, -1e30)

        def loss_ref(q, k, v):
            return jnp.sum(att.mha_reference(q, k, v, mask=mask) ** 2)

        def loss_flash(q, k, v):
            return jnp.sum(att.flash_attention_ad(q, k, v, True, off) ** 2)

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        for gf, gr in zip(g_flash, g_ref):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                       atol=2e-4, rtol=2e-4)

    def test_mha_wrapper_heads(self):
        b, t, dm, h = 2, 64, 128, 4
        q, k, v = _rand(6, b, t, dm), _rand(7, b, t, dm), _rand(8, b, t, dm)
        out = att.multi_head_attention(q, k, v, num_heads=h, use_flash=False)
        assert out.shape == (b, t, dm)
        # head split must equal single-head attention on each slice
        hd = dm // h
        o0 = att.mha_reference(
            q[:, :, :hd], k[:, :, :hd], v[:, :, :hd]
        )
        np.testing.assert_allclose(np.asarray(out[:, :, :hd]), np.asarray(o0), atol=2e-5, rtol=2e-5)


@pytest.mark.full
class TestShortAttention:
    """VMEM-resident fused kernel for tower sequences (T <= 640)."""

    @pytest.mark.parametrize("bh,t,hd", [(24, 197, 64), (6, 77, 64),
                                         (3, 577, 64), (8, 128, 96),
                                         (7, 50, 64)])
    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_reference(self, bh, t, hd, causal):
        q, k, v = _rand(0, bh, t, hd), _rand(1, bh, t, hd), _rand(2, bh, t, hd)
        mask = att._causal_bias(t, t) if causal else None
        ref = att.mha_reference(q, k, v, mask=mask)
        out = att.short_attention(q, k, v, causal=causal, interpret=True)
        # rounding order differs from XLA's chain (lane-padded dots); both
        # are ~4e-3 from an f64 oracle, 5e-4 apart from each other at most
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-4, rtol=5e-4)

    @pytest.mark.parametrize("b,t,h,hd", [(4, 197, 12, 64), (3, 77, 8, 64),
                                          (5, 197, 12, 64)])
    @pytest.mark.parametrize("causal", [False, True])
    def test_packed_matches_mha(self, b, t, h, hd, causal):
        q, k, v = (_rand(i, b, t, h * hd) for i in range(3))
        ref = att.multi_head_attention(q, k, v, num_heads=h, causal=causal,
                                       use_flash=False)
        out = att.short_attention_packed(q, k, v, num_heads=h, causal=causal,
                                         interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-3, rtol=1e-3)

    def test_packed_grads_match_reference(self):
        b, t, h, hd = 2, 50, 4, 32
        q, k, v = (_rand(i, b, t, h * hd) for i in range(3))

        def fused(q, k, v):
            return jnp.sum(att.short_attention_packed_ad(q, k, v, h, True) ** 2)

        def ref(q, k, v):
            return jnp.sum(att.multi_head_attention(
                q, k, v, num_heads=h, causal=True, use_flash=False) ** 2)

        gf = jax.grad(fused, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=5e-4, rtol=5e-4)


@pytest.mark.full
class TestFusedBlockKernels:
    """Whole-block-half kernels (ops/block_kernels) vs their dense oracles.

    Small dims: interpret mode executes element-wise and the real geometry
    (768x3072 GEMMs) takes minutes on CPU; the TPU path is exercised by the
    benches and the same code path modulo pallas interpret."""

    def _mlp_args(self, key, b, t, d):
        r = np.random.RandomState(key)
        j = lambda a: jnp.asarray(a, jnp.float32)
        return (j(r.randn(b, t, d)), j(r.rand(d)), j(r.randn(d) * .1),
                j(r.randn(d, 4 * d) * .05), j(r.randn(4 * d) * .1),
                j(r.randn(4 * d, d) * .05), j(r.randn(d) * .1))

    @pytest.mark.parametrize("b,t,d", [(3, 50, 64), (2, 77, 128)])
    def test_fused_ln_mlp_matches_reference(self, b, t, d):
        from summer_clip_tpu.ops import block_kernels as bk
        args = self._mlp_args(0, b, t, d)
        ref = bk.ln_mlp_reference(*args)
        out = bk.fused_ln_mlp(*args, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-5, rtol=5e-5)

    @pytest.mark.parametrize("hc", [64, 128])
    def test_fused_ln_mlp_chunked_matches_reference(self, hc):
        """Hidden-chunked variant (the ViT-L/14 route): forced multi-chunk
        grids accumulate exactly (f32 scratch) vs the dense oracle."""
        from summer_clip_tpu.ops import block_kernels as bk
        args = self._mlp_args(4, 2, 50, 64)  # h_dim = 256 -> 4 or 2 chunks
        ref = bk.ln_mlp_reference(*args)
        out = bk.fused_ln_mlp_chunked(*args, interpret=True, hidden_chunk=hc)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-5, rtol=5e-5)

    def test_mlp_dispatch_routes_oversized_weights_to_chunked(self, monkeypatch):
        from summer_clip_tpu.ops import block_kernels as bk
        calls = []
        monkeypatch.setattr(bk, "fused_ln_mlp",
                            lambda *a, **k: calls.append("plain") or bk.ln_mlp_reference(*a))
        monkeypatch.setattr(bk, "fused_ln_mlp_chunked",
                            lambda *a, **k: calls.append("chunked") or bk.ln_mlp_reference(*a))
        args = self._mlp_args(5, 1, 8, 64)
        bk._mlp_dispatch(*args)
        assert calls == ["plain"]  # 64x256 f32 weights: 256KB, resident
        monkeypatch.setattr(bk, "FUSED_MLP_MAX_WEIGHT_BYTES", 1024)
        bk._mlp_dispatch(*args)
        assert calls == ["plain", "chunked"]

    def _attn_args(self, key, b, t, d):
        r = np.random.RandomState(key)
        j = lambda a: jnp.asarray(a, jnp.float32)
        ws = [j(r.randn(d, d) * .08) for _ in range(4)]
        bs = [j(r.randn(d) * .05) for _ in range(4)]
        return [j(r.randn(b, t, d)), j(r.rand(d)), j(r.randn(d) * .1),
                ws[0], bs[0], ws[1], bs[1], ws[2], bs[2], ws[3], bs[3]]

    @pytest.mark.parametrize("b,t,d,h", [(3, 50, 64, 4), (2, 77, 128, 8)])
    @pytest.mark.parametrize("causal", [False, True])
    def test_fused_ln_attn_matches_reference(self, b, t, d, h, causal):
        from summer_clip_tpu.ops import block_kernels as bk
        args = self._attn_args(1, b, t, d)
        ref = bk.ln_attn_reference(*args, num_heads=h, causal=causal)
        out = bk.fused_ln_attn(*args, num_heads=h, causal=causal,
                               interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-5, rtol=5e-5)

    def test_fused_grads_match_reference(self):
        from summer_clip_tpu.ops import block_kernels as bk
        args = self._mlp_args(2, 2, 40, 64)
        gf = jax.grad(lambda x: jnp.sum(bk.fused_ln_mlp_ad(x, *args[1:]) ** 2))(args[0])
        gr = jax.grad(lambda x: jnp.sum(bk.ln_mlp_reference(x, *args[1:]) ** 2))(args[0])
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=5e-4, rtol=5e-4)
        aargs = self._attn_args(3, 2, 40, 64)
        gf = jax.grad(lambda x: jnp.sum(
            bk.fused_ln_attn_ad(x, *aargs[1:], 4, True) ** 2))(aargs[0])
        gr = jax.grad(lambda x: jnp.sum(
            bk.ln_attn_reference(x, *aargs[1:], num_heads=4, causal=True) ** 2))(aargs[0])
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=5e-4, rtol=5e-4)

    def test_fuse_gates_production_geometries(self):
        """Pin which tower geometries take each fused half (bf16): a gate
        regression silently changes what runs on the chip."""
        import summer_clip_tpu.models.clip.modeling as M

        old_force, old_mode = M.FUSED_BLOCK_FORCE, M.FUSED_BLOCK_MODE
        M.FUSED_BLOCK_FORCE, M.FUSED_BLOCK_MODE = True, "block"
        try:
            cases = [
                ("ViT-B/16 vision", 768, 197, 12, True, True),
                # round-3 on-chip A/B: both fused halves LOSE at ViT-L/14
                # image geometry (marginal VMEM fit / weight re-streaming);
                # the packed-attention module path is the measured winner
                ("ViT-L/14 vision", 1024, 257, 16, False, False),
                ("ViT-L/14@336 vision", 1024, 577, 16, False, False),
                ("text 512", 512, 77, 8, True, True),
                ("text 768 (ViT-L)", 768, 77, 12, True, True),
            ]
            for name, d, t, h, want_attn, want_mlp in cases:
                assert M._fuse_attn_ok(d, t, h, 2) == want_attn, name
                assert M._fuse_mlp_ok(d, t, h, 2) == want_mlp, name
            # the hidden-chunked MLP kernel is explicit opt-in only
            M.FUSED_BLOCK_MODE = "mlp"
            assert M._fuse_mlp_ok(1024, 257, 16, 2)
            assert not M._fuse_mlp_ok(1024, 577, 16, 2)  # long-seq: no room
            assert not M._fuse_attn_ok(768, 197, 12, 2)  # mlp mode: no attn half
        finally:
            M.FUSED_BLOCK_FORCE, M.FUSED_BLOCK_MODE = old_force, old_mode

    def test_fused_block_path_matches_module_path(self):
        """ResidualAttentionBlock fused path: identical param tree, identical
        init values, bit-identical f32 outputs vs the module path."""
        import jax.tree_util as jtu

        import summer_clip_tpu.models.clip.modeling as M

        blk = M.ResidualAttentionBlock(num_heads=4)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 50, 64), jnp.float32)
        v_plain = jax.jit(blk.init)(jax.random.PRNGKey(0), x)
        out_plain = blk.apply(v_plain, x, True)
        old = M.FUSED_BLOCK_FORCE
        M.FUSED_BLOCK_FORCE = True
        try:
            # guard against vacuous passes: the fused branch must actually
            # be taken (round-3 review found FORCE ignored by the gate once)
            jaxpr = str(jax.make_jaxpr(lambda v, z: blk.apply(v, z, True))(v_plain, x))
            assert jaxpr.count("pallas_call") == 2, "fused branch not taken"
            v_fused = jax.jit(blk.init)(jax.random.PRNGKey(0), x)
            assert (jtu.tree_structure(v_plain) == jtu.tree_structure(v_fused))
            for a, b in zip(jtu.tree_leaves(v_plain), jtu.tree_leaves(v_fused)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            out_fused = blk.apply(v_plain, x, True)
        finally:
            M.FUSED_BLOCK_FORCE = old
        np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_plain),
                                   atol=5e-5, rtol=5e-5)


class TestCacheAttention:
    @pytest.mark.parametrize(
        "nt,nc,d,c,b",
        [(64, 200, 32, 10, 3), (130, 513, 64, 47, 1), (50, 128, 128, 128, 12)],
    )
    def test_matches_reference(self, nt, nc, d, c, b):
        f = _rand(0, nt, d)
        f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
        cf = _rand(1, nc, d)
        cf = cf / jnp.linalg.norm(cf, axis=-1, keepdims=True)
        v = jax.nn.one_hot(jax.random.randint(jax.random.PRNGKey(2), (nc,), 0, c), c)
        betas = jnp.linspace(0.5, 5.5, b)
        ref = ca.cache_attention_reference(f, cf, v, betas)
        out = ca.cache_attention(f, cf, v, betas, interpret=True, block_n=128, block_b=4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)

    def test_auto_dispatch_cpu(self):
        f = _rand(0, 8, 16)
        cf = _rand(1, 32, 16)
        v = _rand(2, 32, 5)
        out = ca.cache_attention_auto(f, cf, v, 5.5)
        assert out.shape == (1, 8, 5)

    def test_tip_adapter_semantics(self):
        """exp(-(beta - beta*affinity)) @ values == kernel output (tip_adapter.py:66-67)."""
        f = _rand(0, 16, 24)
        f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
        keys = _rand(1, 40, 24)
        keys = keys / jnp.linalg.norm(keys, axis=-1, keepdims=True)
        vals = _rand(2, 40, 7)
        beta = 5.5
        affinity = f @ keys.T
        expected = jnp.exp(-(beta - beta * affinity)) @ vals
        got = ca.cache_attention_reference(f, keys, vals, jnp.array([beta]))[0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5, rtol=1e-5)


class TestCacheAttentionOnehot:
    """cache_attention_onehot == cache_attention with one_hot(labels) values
    (the value matrix is implicit; segment-sum + column-scatter decomposition)."""

    @pytest.mark.parametrize("sorted_labels", [True, False])
    @pytest.mark.parametrize("nt,nc,d,c,b", [(64, 300, 32, 17, 3), (50, 513, 96, 111, 8)])
    def test_matches_reference(self, nt, nc, d, c, b, sorted_labels):
        rng = np.random.RandomState(0)
        f = _rand(0, nt, d)
        f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
        cf = _rand(1, nc, d)
        cf = cf / jnp.linalg.norm(cf, axis=-1, keepdims=True)
        labels = rng.randint(0, c, nc)
        if sorted_labels:
            labels = np.sort(labels)
        betas = jnp.linspace(0.5, 11.5, b)
        ref = ca.cache_attention_reference(
            f, cf, jax.nn.one_hot(jnp.asarray(labels), c), betas)
        out = ca.cache_attention_onehot(f, cf, labels, betas, c, interpret=True,
                                        block_q=32, block_n=128, block_b=4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)

    def test_pad_labels_contribute_nothing(self):
        """-1 labels behave exactly like cache_attention's zero value rows."""
        f = _rand(0, 16, 32)
        f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
        cf = _rand(1, 96, 32)
        cf = cf / jnp.linalg.norm(cf, axis=-1, keepdims=True)
        labels = np.concatenate([np.arange(64) % 9, np.full(32, -1)]).astype(np.int32)
        betas = jnp.asarray([1.0, 5.5])
        ref = ca.cache_attention_reference(
            f[:, :], cf[:64], jax.nn.one_hot(jnp.asarray(labels[:64]), 9), betas)
        out = ca.cache_attention_onehot(f, cf, labels, betas, 9, interpret=True,
                                        block_q=16, block_n=32, block_b=2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)

    def test_k_limit_raises_for_scattered_labels(self):
        f = _rand(0, 8, 16)
        cf = _rand(1, 256, 16)
        labels = np.arange(256) % 200  # every block spans ~128+ classes
        with pytest.raises(ValueError, match="spans"):
            ca.cache_attention_onehot(f, cf, labels, jnp.asarray([1.0]), 200,
                                      interpret=True, block_n=128, k_limit=64)

    def test_block_class_table(self):
        labels = np.asarray([3, 3, 5, -1, 7, 7, 7, 7], np.int32)
        table, k_max = ca.onehot_block_classes(labels, block_n=4)
        assert k_max == 8 and table.shape == (2, 8)
        assert list(table[0][:2]) == [3, 5] and table[0][2] == -2
        assert list(table[1][:1]) == [7] and table[1][1] == -2

    def test_block_chooser_respects_vmem_budget(self):
        """Large C shrinks the (bb, bq) out block instead of blowing VMEM
        (the dense kernel adapts the same way; the one-hot kernel must too)."""
        from summer_clip_tpu.ops.cache_kernels import _pick_blocks_onehot

        assert _pick_blocks_onehot(1024, 1024) == (128, 1024, 8)
        for c_p in (2048, 4096, 16384):
            bq, bn, bb = _pick_blocks_onehot(1024, c_p)
            need = (2 * bn * 1024 * 2 + bq * 1024 * 2
                    + 2 * bb * bq * c_p * 4 + bq * bn * 4)
            assert need <= 14 * 1024 * 1024, (c_p, bq, bn, bb)

    def test_auto_routes_labels_and_falls_back(self, monkeypatch):
        """cache_attention_auto(cache_labels=...) uses the one-hot kernel
        when forced, equals the dense result, and silently falls back for
        class-scattered labels."""
        monkeypatch.setattr(ca, "ONEHOT_FORCE", True)
        f = _rand(0, 16, 32)
        f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
        cf = _rand(1, 128, 32)
        cf = cf / jnp.linalg.norm(cf, axis=-1, keepdims=True)
        labels = np.sort(np.arange(128) % 6)
        v = jax.nn.one_hot(jnp.asarray(labels), 6)
        betas = jnp.asarray([1.0, 5.5])
        want = ca.cache_attention_reference(f, cf, v, betas)
        got = ca.cache_attention_auto(f, cf, v, betas, cache_labels=labels)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)
        # scattered labels exceed k_limit -> the label-built dense kernel
        # takes over (no warning, no value matrix), same result
        scattered = np.arange(512) % 400
        cf2 = _rand(2, 512, 32)
        cf2 = cf2 / jnp.linalg.norm(cf2, axis=-1, keepdims=True)
        v2 = jax.nn.one_hot(jnp.asarray(scattered), 400)
        got2 = ca.cache_attention_auto(f, cf2, v2, betas, cache_labels=scattered)
        want2 = ca.cache_attention_reference(f, cf2, v2, betas)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                                   atol=1e-4, rtol=1e-4)


class TestCacheAttentionLabels:
    """cache_attention_labels: one-hot values rebuilt in-kernel from labels —
    dense MXU math, zero value materialization, any row order."""

    @pytest.mark.parametrize("nt,nc,d,c,b", [(64, 300, 32, 17, 3), (50, 513, 96, 111, 8)])
    def test_matches_reference_scattered(self, nt, nc, d, c, b):
        rng = np.random.RandomState(1)
        f = _rand(0, nt, d)
        f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
        cf = _rand(1, nc, d)
        cf = cf / jnp.linalg.norm(cf, axis=-1, keepdims=True)
        labels = rng.randint(0, c, nc)  # deliberately unsorted
        betas = jnp.linspace(0.5, 11.5, b)
        ref = ca.cache_attention_reference(
            f, cf, jax.nn.one_hot(jnp.asarray(labels), c), betas)
        out = ca.cache_attention_labels(f, cf, labels, betas, c, interpret=True,
                                        block_q=32, block_n=128, block_b=4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)

    def test_pad_labels_contribute_nothing(self):
        f = _rand(0, 16, 32)
        f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
        cf = _rand(1, 96, 32)
        cf = cf / jnp.linalg.norm(cf, axis=-1, keepdims=True)
        labels = np.concatenate([np.arange(64) % 9, np.full(32, -1)]).astype(np.int32)
        betas = jnp.asarray([1.0, 5.5])
        ref = ca.cache_attention_reference(
            f, cf[:64], jax.nn.one_hot(jnp.asarray(labels[:64]), 9), betas)
        out = ca.cache_attention_labels(f, cf, labels, betas, 9, interpret=True,
                                        block_q=16, block_n=32, block_b=2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)

    def test_from_labels_dispatch(self):
        """Grouped labels take the skinny kernel; scattered ones fall through
        to the label-dense kernel (no ValueError escapes)."""
        f = _rand(0, 8, 16)
        f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
        cf = _rand(1, 256, 16)
        cf = cf / jnp.linalg.norm(cf, axis=-1, keepdims=True)
        scattered = (np.arange(256) * 7) % 200  # every 128-block spans > 64 classes
        betas = jnp.asarray([1.0, 5.5])
        ref = ca.cache_attention_reference(
            f, cf, jax.nn.one_hot(jnp.asarray(scattered), 200), betas)
        out = ca.cache_attention_from_labels(f, cf, scattered, betas, 200,
                                             interpret=True, k_limit=64)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)

    def test_table_operands_tile_legal_layouts(self):
        labels = np.asarray([3, 3, 5, -1, 7, 7, 7, 7], np.int32)
        crow8, ccol128, k_max = ca.onehot_table_operands(labels, block_n=4)
        assert k_max == 8
        assert crow8.shape == (2 * 8, k_max)
        assert ccol128.shape == (k_max, 2 * 128)
        # rows [8n, 8n+8) all carry table row n; cols [128n, 128n+128) its column
        assert (crow8[:8] == crow8[0]).all() and (crow8[8:] == crow8[8]).all()
        assert list(crow8[0][:2]) == [3, 5] and crow8[0][2] == -2
        assert (ccol128[:, :128] == ccol128[:, :1]).all()
        assert list(ccol128[:2, 128]) == [7, -2]
        # k_pad pins the static width
        crow8p, ccol128p, kp = ca.onehot_table_operands(labels, 4, k_pad=16)
        assert kp == 16 and crow8p.shape == (16, 16) and ccol128p.shape == (16, 256)
        with pytest.raises(ValueError, match="k_pad"):
            ca.onehot_table_operands(np.arange(64, dtype=np.int32), 64, k_pad=8)


@pytest.mark.full
class TestFlashAttentionGrad:
    def test_custom_vjp_matches_reference_grads(self):
        """Pallas forward + XLA backward must agree with pure-XLA grads."""
        q, k, v = _rand(0, 2, 32, 64), _rand(1, 2, 32, 64), _rand(2, 2, 32, 64)

        def loss_flash(q, k, v):
            # interpret=True inside the custom-vjp path isn't reachable; on
            # CPU the forward pallas kernel runs in interpret automatically
            # through flash_attention's jit? No — call the reference forward
            # shape through the AD wrapper's backward only.
            return jnp.sum(att.flash_attention_ad(q, k, v, True) ** 2)

        def loss_ref(q, k, v):
            tq = q.shape[1]
            mask = jnp.where(jnp.tril(jnp.ones((tq, tq), bool)), 0.0, -1e30)
            return jnp.sum(att.mha_reference(q, k, v, mask=mask) ** 2)

        import jax
        # forward on CPU: run the pallas kernel in interpret mode by calling
        # flash_attention directly inside the wrapper via interpret fallback
        try:
            g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        except Exception:
            import pytest
            pytest.skip("pallas flash forward not executable on this backend")
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for gf, gr in zip(g_flash, g_ref):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=5e-4, rtol=5e-4)


class TestBlockChooser:
    def test_traffic_aware_blocks(self):
        """(128, 512, 8) is the round-2 measured-best choice at CLIP scales
        with bf16 features + int8 one-hot values (block_b=8 = one affinity
        pass for the whole reference beta grid) — guard it."""
        from summer_clip_tpu.ops.cache_kernels import _pick_blocks

        bq, bn, bb = _pick_blocks(1024, 1024, v_bytes=1, f_bytes=2)
        assert (bq, bn, bb) == (128, 512, 8), (bq, bn, bb)
        # footprint must respect the budget
        need = (2 * bn * 1024 * 2 + 2 * bn * 1024 * 1
                + bq * 1024 * 2 + 2 * bb * bq * 1024 * 4 + bq * bn * 4)
        assert need <= 14 * 1024 * 1024

    def test_small_shapes_still_fit(self):
        from summer_clip_tpu.ops.cache_kernels import _pick_blocks

        for d_p, c_p, vb in [(128, 128, 4), (1024, 128, 2), (128, 1024, 4)]:
            bq, bn, bb = _pick_blocks(d_p, c_p, vb)
            assert bq >= 128 and bn >= 128 and bb >= 1
