"""Method-layer tests: strategies vs oracles, tip search, adapters, zeroshot."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summer_clip_tpu.methods import cache as C
from summer_clip_tpu.methods import tip as T
from summer_clip_tpu.methods import adapters as A
from summer_clip_tpu.methods.zeroshot import accuracy, compute_accuracy, clip_logits, zeroshot_classifier


def _feats(seed, n, d, normed=True):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    if normed:
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
    return x


class TestSelectionStrategies:
    def setup_method(self):
        rng = np.random.default_rng(0)
        self.n, self.c, self.d = 60, 5, 16
        self.feats = _feats(1, self.n, self.d)
        self.outs = rng.standard_normal((self.n, self.c)).astype(np.float32)
        self.labels = rng.integers(0, self.c, self.n)

    def test_all_logits_identity(self):
        s = C.AllLogitsStrategy()
        f, o = s.transform(self.feats, self.outs)
        np.testing.assert_array_equal(f, self.feats)
        np.testing.assert_array_equal(o, self.outs)

    def test_threshold(self):
        s = C.ThresholdStrategy(0.5, use_softmax=True)
        inds = s.select(self.feats, self.outs)
        probs = np.exp(self.outs) / np.exp(self.outs).sum(1, keepdims=True)
        expected = np.flatnonzero(probs.max(1) >= 0.5)
        np.testing.assert_array_equal(np.sort(inds), np.sort(expected))

    def test_topk_per_pred_class(self):
        s = C.TopKStrategy(topk=3)
        inds = s.select(self.feats, self.outs)
        preds = self.outs.argmax(1)
        # per predicted class, at most 3 rows; selected rows are the top-conf ones
        for cls in np.unique(preds[inds]):
            sel = inds[preds[inds] == cls]
            assert len(sel) <= 3
            cls_rows = np.flatnonzero(preds == cls)
            top_conf = cls_rows[np.argsort(-self.outs.max(1)[cls_rows])[:3]]
            assert set(sel) == set(top_conf)

    def test_topk_per_gold(self):
        s = C.TopKPerGoldStrategy(topk=2, cache_labels=self.labels)
        inds = s.select(self.feats, self.outs)
        gold_scores = self.outs[np.arange(self.n), self.labels]
        for cls in np.unique(self.labels):
            rows = np.flatnonzero(self.labels == cls)
            expect = rows[np.argsort(-gold_scores[rows])[:2]]
            got = inds[self.labels[inds] == cls]
            assert set(got) == set(expect)

    def test_random_strategies_sizes(self):
        s = C.GlobalRandomSampleStrategy(topk=4, seed=0)
        inds = s.select(self.feats, self.outs)
        assert len(inds) == min(4 * self.c, self.n)
        assert len(np.unique(inds)) == len(inds)

        s2 = C.PerGoldClassRandomSampleStrategy(topk=2, cache_labels=self.labels, seed=0)
        inds2 = s2.select(self.feats, self.outs)
        for cls in np.unique(self.labels):
            assert (self.labels[inds2] == cls).sum() <= 2

    def test_per_pred_random(self):
        s = C.PerPredClassRandomSampleStrategy(topk=2, seed=1)
        inds = s.select(self.feats, self.outs)
        preds = self.outs.argmax(1)
        for cls in np.unique(preds):
            assert (preds[inds] == cls).sum() <= 2


class TestValueStrategies:
    def test_hard_one_hot(self):
        outs = np.array([[0.1, 0.9], [2.0, -1.0]], np.float32)
        v = C.HardCacheStrategy().transform(outs)
        np.testing.assert_array_equal(v, [[0, 1], [1, 0]])

    def test_softmax_scaled(self):
        outs = np.random.default_rng(0).standard_normal((4, 3)).astype(np.float32)
        v = C.SoftmaxCacheStrategy(clip_scale=100.0, scale=0.01).transform(outs)
        e = np.exp(outs - outs.max(1, keepdims=True))
        np.testing.assert_allclose(v, e / e.sum(1, keepdims=True), atol=1e-5)


class TestWeightsAndFusion:
    def test_tip_weights_oracle(self):
        f, c = _feats(0, 8, 16, normed=False), _feats(1, 12, 16, normed=False)
        w = C.TipAdapterWeightsStrategy(beta=5.5).transform(f, c)
        fn = f / np.linalg.norm(f, axis=-1, keepdims=True)
        cn = c / np.linalg.norm(c, axis=-1, keepdims=True)
        np.testing.assert_allclose(w, np.exp(-5.5 * (1 - fn @ cn.T)), atol=1e-5)

    def test_fused_equals_weights_times_values(self):
        f, c = _feats(0, 10, 8, normed=False), _feats(1, 20, 8, normed=False)
        vals = _feats(2, 20, 4, normed=False)
        betas = [1.0, 5.5]
        fused = np.asarray(C.cache_logits_for_betas(f, c, vals, betas))
        for i, b in enumerate(betas):
            w = C.TipAdapterWeightsStrategy(b).transform(f, c)
            np.testing.assert_allclose(fused[i], w @ vals, atol=1e-4, rtol=1e-4)


class TestTipAdapter:
    def test_cache_build(self):
        passes = [_feats(i, 10, 8, normed=False) for i in range(3)]
        labels = np.arange(10) % 4
        keys, values = T.build_cache_from_features(passes, labels)
        assert keys.shape == (10, 8) and values.shape == (10, 4)
        np.testing.assert_allclose(np.linalg.norm(keys, axis=1), 1.0, atol=1e-5)
        np.testing.assert_array_equal(values.argmax(1), labels)

    def test_search_hp_finds_good_point(self):
        # construct a problem where the cache fixes zero-shot mistakes
        rng = np.random.default_rng(0)
        n, c, d = 64, 4, 32
        protos = _feats(1, c, d)
        labels = rng.integers(0, c, n)
        feats = protos[labels] + 0.05 * rng.standard_normal((n, d)).astype(np.float32)
        feats /= np.linalg.norm(feats, axis=1, keepdims=True)
        keys, values = T.build_cache_from_features([feats], labels)
        bad_clip_logits = np.zeros((n, c), np.float32)  # zero-shot knows nothing
        beta, alpha, acc = T.search_hp(
            feats, labels, bad_clip_logits, keys, values,
            search_scale=(7, 3), search_step=(10, 5), beta_chunk=4)
        assert acc == 100.0
        assert beta > 0 and alpha > 0

    def test_tip_logits_matches_reference_formula(self):
        f = _feats(0, 6, 8)
        keys = _feats(1, 12, 8)
        vals = np.eye(12, 3, dtype=np.float32)[:, :3]
        cl = _feats(2, 6, 3, normed=False)
        beta, alpha = 5.5, 1.0
        got = np.asarray(T.tip_logits(cl, f, keys, vals, beta, alpha))
        affinity = f @ keys.T
        expected = cl + np.exp(-(beta - beta * affinity)) @ vals * alpha
        np.testing.assert_allclose(got, expected, atol=1e-4, rtol=1e-4)

    def test_onehot_kernel_path_matches_dense(self, monkeypatch):
        """tip_logits/search_hp with cache_labels (one-hot kernel, forced on
        via ONEHOT_FORCE/interpret) == the dense value-matrix path."""
        from summer_clip_tpu.ops import cache_kernels as ck
        monkeypatch.setattr(ck, "ONEHOT_FORCE", True)
        rng = np.random.default_rng(1)
        n, nk, c, d = 24, 40, 7, 16
        f = _feats(0, n, d)
        labels = np.sort(rng.integers(0, c, nk)).astype(np.int32)
        keys, values = T.build_cache_from_features([_feats(1, nk, d, normed=False)],
                                                   labels, c)
        cl = _feats(2, n, c, normed=False)
        dense = np.asarray(T.tip_logits(cl, f, keys, values, 5.5, 1.0))
        fused = np.asarray(T.tip_logits(cl, f, keys, values, 5.5, 1.0,
                                        cache_labels=labels))
        np.testing.assert_allclose(fused, dense, atol=1e-4, rtol=1e-4)

        y = rng.integers(0, c, n)
        b1, a1, acc1 = T.search_hp(f, y, cl, keys, values,
                                   search_scale=(7, 3), search_step=(8, 4),
                                   beta_chunk=4)
        b2, a2, acc2 = T.search_hp(f, y, cl, keys, values,
                                   search_scale=(7, 3), search_step=(8, 4),
                                   beta_chunk=4, cache_labels=labels)
        assert (b1, a1, acc1) == (b2, a2, acc2)


class TestAccuracy:
    def test_topk(self):
        logits = np.array([[0.9, 0.1, 0.0], [0.1, 0.2, 0.7], [0.4, 0.5, 0.1]])
        labels = np.array([0, 2, 0])
        a1, a5 = compute_accuracy(logits, labels)
        assert a1 == pytest.approx(100 * 2 / 3)
        assert a5 == 100.0

    def test_clip_logits_scale(self):
        f = _feats(0, 4, 8, normed=False)
        w = _feats(1, 3, 8)
        lg = np.asarray(clip_logits(f, w))
        fn = f / np.linalg.norm(f, axis=1, keepdims=True)
        np.testing.assert_allclose(lg, 100 * fn @ w.T, atol=1e-4)

    @pytest.mark.parametrize("k", [1, 5])
    def test_label_rank_matches_topk_with_ties(self, k):
        # rank < k must be EXACTLY membership in lax.top_k(logits, k)[1],
        # including top_k's lowest-index tiebreak (label_rank replaces the
        # sort in the image_attention accuracy grid — ~10x on-chip win,
        # tools/attr_grid_variants.py)
        from summer_clip_tpu.methods.zeroshot import label_rank

        rng = np.random.default_rng(0)
        c = 11
        logits = rng.standard_normal((64, c)).astype(np.float32)
        # craft heavy ties: quantize to few distinct values so equal scores
        # straddle the label index in both directions
        logits = np.round(logits * 2) / 2
        labels = rng.integers(0, c, 64)
        rank = np.asarray(label_rank(jnp.asarray(logits), jnp.asarray(labels)))
        top = np.asarray(jax.lax.top_k(jnp.asarray(logits), k)[1])
        member = (top == labels[:, None]).any(1)
        np.testing.assert_array_equal(rank < k, member)
        if k == 1:
            np.testing.assert_array_equal(
                rank == 0, np.asarray(top[:, 0]) == labels)


class TestZeroshotClassifier:
    def test_ensemble_shapes_and_norm(self):
        d = 16

        def fake_encode(tokens):
            # deterministic "text encoder": hash token ids into features
            t = jnp.asarray(tokens, jnp.float32)
            w = jnp.arange(t.shape[1] * d, dtype=jnp.float32).reshape(t.shape[1], d)
            return jnp.tanh(t @ w * 1e-4)

        w = zeroshot_classifier(fake_encode, ["cat", "dog", "bird"],
                                ["a photo of a {}.", "an image of a {}."], chunk_size=4)
        assert w.shape == (3, d)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(w), axis=1), 1.0, atol=1e-5)


class TestAdapters:
    def test_linear_fabric_contrastive(self):
        fabric = A.LinearClipAdapterFabric(output_dim=8)
        adapter = fabric.create_adapter(emb_dim=16)
        img = jnp.asarray(_feats(0, 4, 16))
        txt = jnp.asarray(_feats(1, 4, 16))
        variables = adapter.init(jax.random.PRNGKey(0), img, txt)
        li, lt = adapter.apply(variables, img, txt)
        assert li.shape == (4, 4)
        np.testing.assert_allclose(np.asarray(li), np.asarray(lt).T, atol=1e-5)

    def test_residual_adapter_blend(self):
        fabric = A.OriginalImageClipAdapterFabric(reduction=4, ratio=0.2)
        adapter = fabric.create_adapter(emb_dim=16)
        img = jnp.asarray(_feats(0, 4, 16))
        txt = jnp.asarray(_feats(1, 4, 16))
        variables = adapter.init(jax.random.PRNGKey(0), img, txt)
        li, _ = adapter.apply(variables, img, txt)
        assert li.shape == (4, 4)

    def test_adapter_trains(self):
        """A linear adapter should fit a tiny classification problem."""
        import optax

        fabric = A.LinearClipAdapterFabric(output_dim=8)
        adapter = fabric.create_adapter(16)
        rng = np.random.default_rng(0)
        protos = _feats(1, 4, 16)
        labels = rng.integers(0, 4, 32)
        feats = jnp.asarray(protos[labels] + 0.01 * rng.standard_normal((32, 16)).astype(np.float32))
        text_feats = jnp.asarray(protos)  # 4 classes

        variables = adapter.init(jax.random.PRNGKey(0), feats, text_feats)
        tx = optax.adam(1e-2)
        opt_state = tx.init(variables["params"])

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                li, _ = adapter.apply({"params": p}, feats, text_feats)
                return optax.softmax_cross_entropy_with_integer_labels(li, jnp.asarray(labels)).mean()
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        params = variables["params"]
        losses = []
        for _ in range(60):
            params, opt_state, loss = step(params, opt_state)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.5


class TestCheckpointBackends:
    def test_msgpack_trainable_only_roundtrip(self, tmp_path):
        import jax.numpy as jnp
        from summer_clip_tpu.engine import checkpoint as ck

        params = {"adapter": {"w": jnp.ones((2, 2))}, "frozen": {"w": jnp.zeros((3,))}}
        ck.save_checkpoint(tmp_path / "c", params=params,
                           keep=lambda names: names[0] == "adapter",
                           meta={"x": 1})
        loaded = ck.load_checkpoint(tmp_path / "c", params_target=params)
        assert loaded["meta"]["x"] == 1
        assert "frozen" in loaded["params"]  # merged back from target
        np.testing.assert_array_equal(np.asarray(loaded["params"]["adapter"]["w"]), np.ones((2, 2)))

    def test_orbax_roundtrip(self, tmp_path):
        import jax.numpy as jnp
        from summer_clip_tpu.engine import checkpoint as ck

        tree = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 3))}}
        ck.save_orbax(tmp_path / "orbax_ckpt", tree)
        restored = ck.load_orbax(tmp_path / "orbax_ckpt", target=tree)
        np.testing.assert_array_equal(np.asarray(restored["a"]), np.arange(4.0))


class TestOptimUtilities:
    def test_trainable_only_freezes(self):
        import jax
        import jax.numpy as jnp
        import optax
        from summer_clip_tpu.engine.optim import trainable_only

        params = {"adapter": {"w": jnp.ones(3)}, "tower": {"w": jnp.ones(3)}}

        def is_trainable(path, leaf):
            names = [str(getattr(p, "key", p)) for p in path]
            return names[0] == "adapter"

        tx = trainable_only(optax.sgd(0.5), is_trainable, params)
        state = tx.init(params)
        grads = {"adapter": {"w": jnp.ones(3)}, "tower": {"w": jnp.ones(3)}}
        updates, _ = tx.update(grads, state, params)
        new = optax.apply_updates(params, updates)
        np.testing.assert_allclose(np.asarray(new["adapter"]["w"]), 0.5)
        np.testing.assert_allclose(np.asarray(new["tower"]["w"]), 1.0)

    def test_grad_accum_multisteps(self):
        import jax.numpy as jnp
        import optax
        from summer_clip_tpu.engine.optim import with_grad_accum

        tx = with_grad_accum(optax.sgd(1.0), every=2)
        params = {"w": jnp.zeros(1)}
        state = tx.init(params)
        g = {"w": jnp.ones(1)}
        u1, state = tx.update(g, state, params)
        p1 = optax.apply_updates(params, u1)
        np.testing.assert_allclose(np.asarray(p1["w"]), 0.0)  # not yet applied
        u2, state = tx.update(g, state, p1)
        p2 = optax.apply_updates(p1, u2)
        np.testing.assert_allclose(np.asarray(p2["w"]), -1.0)  # mean of grads

    def test_decay_mask_excludes_bias_scale(self):
        import jax.numpy as jnp
        from summer_clip_tpu.engine.optim import decay_mask

        params = {"layer": {"kernel": jnp.ones(1), "bias": jnp.ones(1), "scale": jnp.ones(1)}}
        mask = decay_mask(params)
        assert mask["layer"]["kernel"] is True
        assert mask["layer"]["bias"] is False
        assert mask["layer"]["scale"] is False


class TestRandomStrategyDeterminism:
    def test_global_seed_makes_random_strategies_reproducible(self):
        from summer_clip_tpu.core.rng import set_random_state

        feats = _feats(0, 40, 8)
        outs = np.random.default_rng(1).standard_normal((40, 5)).astype(np.float32)
        set_random_state(123)
        a = C.GlobalRandomSampleStrategy(topk=2).select(feats, outs)
        set_random_state(123)
        b = C.GlobalRandomSampleStrategy(topk=2).select(feats, outs)
        np.testing.assert_array_equal(a, b)
