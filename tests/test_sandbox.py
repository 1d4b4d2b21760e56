"""Sandbox tests: kmeans, input optimization, trigger search, GPT heads."""

import jax
import jax.numpy as jnp
import numpy as np

from summer_clip_tpu.sandbox import anomalous_tokens as AT
from summer_clip_tpu.sandbox import mlm_trigger as MT
from summer_clip_tpu.methods import gpt_heads as GH
from summer_clip_tpu.models import gpt2 as G


class TestKMeans:
    def test_clusters_separate_obvious_groups(self):
        rng = np.random.RandomState(0)
        a = rng.randn(20, 8) * 0.01 + np.array([1.0] + [0.0] * 7)
        b = rng.randn(20, 8) * 0.01 + np.array([0.0, 1.0] + [0.0] * 6)
        emb = np.concatenate([a, b]).astype(np.float32)
        assign, centroids = AT.kmeans(emb, 2, seed=0)
        assign = np.asarray(assign)
        assert len(set(assign[:20])) == 1 and len(set(assign[20:])) == 1
        assert assign[0] != assign[20]
        assert centroids.shape == (2, 8)

    def test_closest_tokens(self):
        emb = np.eye(6, dtype=np.float32)
        d, ids = AT.closest_tokens(emb[3], emb, n=2)
        assert int(np.asarray(ids)[0]) == 3
        assert float(np.asarray(d)[0]) < 1e-5


class TestOptimiseInput:
    def test_drives_target_logits_up(self):
        model, cfg = G.build_gpt2("test-gpt")
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
        table = np.asarray(variables["params"]["wte"]["embedding"])

        def gpt_apply(inputs_embeds):
            return model.apply(variables, inputs_embeds=inputs_embeds)["logits"]

        out = AT.optimise_input(gpt_apply, table, target_ids=[7], input_len=3,
                                batch_size=2, epochs=10, lr=0.05, init="random")
        assert out["inputs"].shape == (2, 3, cfg.n_embd)
        assert out["nearest_token_ids"].shape == (2, 3)
        assert np.isfinite(out["losses"]).all()


class TestTriggerSearch:
    def test_template_fill(self):
        t = MT.TriggerTemplate([5, -1, -1, 9, -2], mask_id=1)
        ids = np.asarray(t.fill(jnp.asarray([100, 101])))
        assert ids.tolist() == [[5, 100, 101, 9, 1]]
        assert t.predict_pos == 4 and t.trigger_len == 2

    def test_search_improves_score(self):
        """Score = embedding-similarity of slot token to token 7."""
        rng = np.random.RandomState(0)
        table = rng.randn(16, 4).astype(np.float32)
        target = jnp.asarray(table[7])

        def score_of_embs(embs):
            return float(jnp.sum(jnp.asarray(embs) @ target))

        def grad_fn(trigger_ids):
            embs = jnp.asarray(table[np.asarray(trigger_ids)])
            return jax.grad(lambda e: jnp.sum(e @ target))(embs)

        def score_fn(trigger_ids):
            return score_of_embs(table[np.asarray(trigger_ids)])

        trigger = [1, 2]
        s0 = score_fn(np.asarray(trigger))
        step_rng = np.random.default_rng(0)
        for _ in range(6):
            MT.trigger_search_step(trigger, grad_fn, score_fn, jnp.asarray(table),
                                   num_cands=16, rng=step_rng)
        assert score_fn(np.asarray(trigger)) >= s0
        assert trigger == [7, 7]


class TestGptHeads:
    def test_adapter_gpt_starts_near_frozen(self):
        model = G.ClipGPT(G.GPT2_CONFIGS["test-gpt"], clip_vocab_size=64, clip_emb_dim=8,
                          emb_hid_dim=16, head_hid_dim=16)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
        head = GH.AdapterGPT(model, variables, hidden_dim=8)
        params = head.init(jax.random.PRNGKey(1))
        x = model.apply(variables, method=model.embed,
                        input_ids=jnp.zeros((1, 4), jnp.int32))
        logits, _ = head(params, x)
        base = model.apply(variables, inputs_embeds=x)["logits"][:, -1:, :]
        np.testing.assert_allclose(np.asarray(logits), np.asarray(base), atol=1e-2)

    def test_lora_zero_init_is_identity(self):
        model = G.ClipGPT(G.GPT2_CONFIGS["test-gpt"], clip_vocab_size=64, clip_emb_dim=8,
                          emb_hid_dim=16, head_hid_dim=16)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
        lora = GH.LoRAGPT(model, variables, rank=2)
        lp = lora.init(jax.random.PRNGKey(1))
        # b factors start at zero -> merged == base
        x = model.apply(variables, method=model.embed,
                        input_ids=jnp.zeros((1, 4), jnp.int32))
        logits, _ = lora(lp, x)
        base = model.apply(variables, inputs_embeds=x)["logits"][:, -1:, :]
        np.testing.assert_allclose(np.asarray(logits), np.asarray(base), atol=1e-5)
        # and the factors exist for attention kernels
        flat = jax.tree_util.tree_flatten(lp)[0]
        assert flat
