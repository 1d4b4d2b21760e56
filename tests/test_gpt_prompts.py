"""GPT-2 / ClipGPT / prompt-model / collator tests (tiny configs, CPU)."""

import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.full  # heavy tier: excluded from smoke (pytest -m "not full")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summer_clip_tpu.models import gpt2 as G
from summer_clip_tpu.methods import prompt_models as PM
from summer_clip_tpu.methods import prompt_learner as PL
from summer_clip_tpu.methods import temp_schedulers as TS
from summer_clip_tpu.methods import vocab_filters as VF
from summer_clip_tpu.methods.autoprompt import TopPrompter, hotflip_attack, AutoPromptState, hotflip_step
from summer_clip_tpu.methods.fluentprompt import FluentPromptState, geometric_beta_schedule
from summer_clip_tpu.models.tokenizer import get_tokenizer


@pytest.fixture(scope="module")
def tiny_gpt():
    model, cfg = G.build_gpt2("test-gpt")
    ids = jnp.zeros((2, 8), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ids)
    return model, cfg, variables


class TestGPT2:
    def test_forward_shapes(self, tiny_gpt):
        model, cfg, variables = tiny_gpt
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, cfg.vocab_size)
        out = model.apply(variables, ids)
        assert out["logits"].shape == (2, 10, cfg.vocab_size)

    def test_kv_cache_matches_full_forward(self, tiny_gpt):
        model, cfg, variables = tiny_gpt
        ids = jax.random.randint(jax.random.PRNGKey(2), (1, 6), 0, cfg.vocab_size)
        full = model.apply(variables, ids)["logits"]

        cache = model.apply(variables, method=model.init_cache, batch=1, max_len=6)
        logits_steps = []
        for t in range(6):
            out = model.apply(variables, ids[:, t:t + 1], position_offset=t, cache=cache)
            cache = out["cache"]
            logits_steps.append(out["logits"][:, 0])
        step_logits = jnp.stack(logits_steps, axis=1)
        np.testing.assert_allclose(np.asarray(step_logits), np.asarray(full),
                                   atol=2e-4, rtol=2e-4)

    def test_remat_matches_plain_forward_and_grads(self):
        """GPT2Core(remat=True) is numerically the plain model (same params
        pytree) — forward and gradients — just cheaper in activation HBM.
        This is the single-chip gpt2-large enabler (tools/bench_gpt_large.py)."""
        cfg = G.GPT2_CONFIGS["test-gpt"]
        plain = G.GPT2(cfg)
        remat = G.GPT2(cfg, remat=True)
        ids = jax.random.randint(jax.random.PRNGKey(4), (2, 12), 1, cfg.vocab_size)
        variables = plain.init(jax.random.PRNGKey(0), ids)
        out_p = plain.apply(variables, ids)["logits"]
        out_r = remat.apply(variables, ids)["logits"]
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r), atol=1e-5)

        def loss(m):
            def f(p):
                lg = m.apply({"params": p}, ids)["logits"].astype(jnp.float32)
                return jnp.mean(jax.nn.logsumexp(lg, -1))
            return f
        g_p = jax.grad(loss(plain))(variables["params"])
        g_r = jax.grad(loss(remat))(variables["params"])
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                    atol=1e-5, rtol=1e-4),
            g_p, g_r)

        # remat_policy="dots" (keep matmul outputs, recompute the rest) is
        # the same math again — only the backward's HBM/FLOP trade moves
        dots = G.GPT2(cfg, remat=True, remat_policy="dots")
        np.testing.assert_allclose(np.asarray(dots.apply(variables, ids)["logits"]),
                                   np.asarray(out_p), atol=1e-5)
        g_d = jax.grad(loss(dots))(variables["params"])
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                    atol=1e-5, rtol=1e-4),
            g_p, g_d)

    def test_causality(self, tiny_gpt):
        model, cfg, variables = tiny_gpt
        ids = jax.random.randint(jax.random.PRNGKey(3), (1, 8), 0, cfg.vocab_size)
        out1 = model.apply(variables, ids)["logits"][:, :4]
        ids2 = ids.at[:, 6].set((ids[:, 6] + 1) % cfg.vocab_size)
        out2 = model.apply(variables, ids2)["logits"][:, :4]
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


class TestClipGPT:
    def test_adapters_bridge_vocab(self):
        cfg = G.GPT2_CONFIGS["test-gpt"]
        model = G.ClipGPT(cfg, clip_vocab_size=128, clip_emb_dim=16,
                          emb_hid_dim=24, head_hid_dim=24)
        ids = jnp.zeros((2, 5), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), ids)
        out = model.apply(variables, ids)
        assert out["logits"].shape == (2, 5, 128)  # CLIP vocab, not GPT vocab

    def test_trainable_masks(self):
        cfg = G.GPT2_CONFIGS["test-gpt"]
        model = G.ClipGPT(cfg, clip_vocab_size=64, clip_emb_dim=8)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3), jnp.int32))
        flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
        trainable = [p for p, _ in flat if G.clip_gpt_trainable_mask(p)]
        frozen = [p for p, _ in flat if not G.clip_gpt_trainable_mask(p)]
        assert trainable and frozen
        names = {str(q[0].key) for q in trainable}
        assert names == {"adapter_emb", "adapter_head"}
        # full mask: everything except embedding tables
        full_frozen = [p for p, _ in flat if not G.clip_gpt_full_trainable_mask(p)]
        assert {str(q[0].key) for q in full_frozen} == {"clip_emb"}

    def test_hf_conversion_shapes(self):
        """Round-trip: flax params -> fake HF layout -> convert back."""
        model, cfg = G.build_gpt2("test-gpt")
        ids = jnp.zeros((1, 4), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), ids)
        p = variables["params"]
        sd = {"transformer.wte.weight": np.asarray(p["wte"]["embedding"]),
              "transformer.wpe.weight": np.asarray(p["core"]["wpe"]),
              "transformer.ln_f.weight": np.asarray(p["core"]["ln_f"]["scale"]),
              "transformer.ln_f.bias": np.asarray(p["core"]["ln_f"]["bias"])}
        for i in range(cfg.n_layer):
            blk = p["core"][f"h_{i}"]
            bp = f"transformer.h.{i}"
            for ln in ("ln_1", "ln_2"):
                sd[f"{bp}.{ln}.weight"] = np.asarray(blk[ln]["scale"])
                sd[f"{bp}.{ln}.bias"] = np.asarray(blk[ln]["bias"])
            sd[f"{bp}.attn.c_attn.weight"] = np.asarray(blk["attn"]["c_attn"]["kernel"])
            sd[f"{bp}.attn.c_attn.bias"] = np.asarray(blk["attn"]["c_attn"]["bias"])
            sd[f"{bp}.attn.c_proj.weight"] = np.asarray(blk["attn"]["c_proj"]["kernel"])
            sd[f"{bp}.attn.c_proj.bias"] = np.asarray(blk["attn"]["c_proj"]["bias"])
            sd[f"{bp}.mlp.c_fc.weight"] = np.asarray(blk["mlp_c_fc"]["kernel"])
            sd[f"{bp}.mlp.c_fc.bias"] = np.asarray(blk["mlp_c_fc"]["bias"])
            sd[f"{bp}.mlp.c_proj.weight"] = np.asarray(blk["mlp_c_proj"]["kernel"])
            sd[f"{bp}.mlp.c_proj.bias"] = np.asarray(blk["mlp_c_proj"]["bias"])
        converted = G.convert_hf_gpt2(sd, cfg.n_layer)
        ids = jax.random.randint(jax.random.PRNGKey(4), (1, 6), 0, cfg.vocab_size)
        ref = model.apply(variables, ids)["logits"]
        got = model.apply(converted, ids)["logits"]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


class TestPromptModels:
    V, D, P = 32, 8, 4

    def _table(self):
        return np.random.RandomState(0).randn(self.V, self.D).astype(np.float32)

    def test_coop(self):
        m = PM.CoOp(clip_embs=self._table(), prompt_len=self.P)
        params = m.init(jax.random.PRNGKey(0))
        out = m.apply(params, training=True)
        assert out["clip_embs"].shape == (self.P, self.D)
        ids = m.decode_ids(params)
        assert ids.shape == (self.P,)

    def test_vqvae_straight_through_grads(self):
        m = PM.VQVAE1(clip_embs=self._table(), prompt_len=self.P)
        params = m.init(jax.random.PRNGKey(0))

        def loss(p):
            return jnp.sum(m.apply(p)["clip_embs"] ** 2)

        g = jax.grad(loss)(params)
        assert float(jnp.abs(g["prompt_embs"]).max()) > 0

    def test_vqvae_outputs_vocab_rows(self):
        table = self._table()
        m = PM.VQVAE1(clip_embs=table, prompt_len=self.P)
        params = m.init(jax.random.PRNGKey(0))
        out = m.apply(params)
        ids = np.asarray(out["ids"])
        np.testing.assert_allclose(np.asarray(out["clip_embs"]), table[ids], atol=1e-6)

    def test_gumbel_v0_v1(self):
        for cls in (PM.Gumbelv0a1, PM.Gumbelv1a1):
            m = cls(clip_embs=self._table(), prompt_len=self.P)
            params = m.init(jax.random.PRNGKey(0))
            out = m.apply(params, temperature=0.5)
            assert out["clip_embs"].shape == (self.P, self.D)
            assert "weights/mean" in out

            def loss(p):
                return jnp.sum(m.apply(p)["clip_embs"] ** 2)

            g = jax.grad(loss)(params)
            leaf = list(g.values())[0]
            assert float(jnp.abs(leaf).max()) > 0

    def test_allowed_tokens_remap(self):
        table = self._table()
        allowed = [3, 7, 11, 20]
        m = PM.VQVAE1(clip_embs=table, prompt_len=self.P, allowed_tokens=allowed)
        params = m.init(jax.random.PRNGKey(0))
        ids = m.decode_ids(params)
        assert set(int(i) for i in ids).issubset(set(allowed))

    def test_find_nearest_l2(self):
        table = self._table()
        embs = jnp.asarray(table[[5, 9]])
        ids = PM.find_nearest(embs, jnp.asarray(table), 2.0)
        np.testing.assert_array_equal(np.asarray(ids), [5, 9])


class TestCollator:
    def test_clip_input_layout(self):
        tok = get_tokenizer()
        col = PL.LeftPromptCollator(tok, prompt_len=3, clip_seq_len=20)
        token_classes = col.tokenize_classes(["cat", "big dog"])
        table = col.build_class_table(token_classes)
        ids, lens = col.get_clip_input(table, np.asarray([0, 1]))
        ids = np.asarray(ids)
        assert ids[0, 0] == tok.sot_token
        assert (ids[:, 1:4] == 0).all()  # prompt slots
        l0 = int(np.asarray(lens)[0])
        assert ids[0, l0 - 1] == tok.eot_token

    def test_splice_prompt_embeds(self):
        base = jnp.zeros((2, 10, 4))
        prompt = jnp.ones((3, 4))
        out = PL.splice_prompt_embeds(base, prompt)
        assert float(out[:, 1:4].min()) == 1.0
        assert float(out[:, 0].max()) == 0.0
        assert float(out[:, 4:].max()) == 0.0

    def test_suffix_lm_loss_masks_prompt(self):
        b, t, v = 2, 8, 16
        ids = jnp.asarray(np.random.RandomState(0).randint(1, v, (b, t)), jnp.int32)
        mask = jnp.ones((b, t), jnp.float32)
        logits = jnp.asarray(np.random.RandomState(1).randn(b, t, v), jnp.float32)
        full = PL.FullLMLoss().transform(ids, mask, logits)
        suffix = PL.SuffixLMLoss(prompt_len=3).transform(ids, mask, logits)
        none = PL.NoLMLoss().transform(ids, mask, logits)
        assert float(none) == 0.0
        assert full.shape == () and suffix.shape == ()
        assert not np.isclose(float(full), float(suffix))

    def test_gpt_input_prompt_ids_filled(self):
        tok = get_tokenizer()
        col = PL.LeftPromptCollator(tok, prompt_len=2, clip_seq_len=16)
        table = col.build_class_table(col.tokenize_classes(["cat"]))
        ids, lens, mask = col.get_gpt_input(table, np.asarray([0]), prompt_ids=jnp.asarray([42, 43]))
        ids = np.asarray(ids)
        assert ids[0, 1] == 42 and ids[0, 2] == 43
        # EOT removed -> len shrinks by one
        assert int(np.asarray(lens)[0]) == int(np.asarray(mask)[0].sum())


class TestSchedulersFilters:
    def test_schedulers(self):
        c = TS.ConstantScheduler(2.0)
        assert c.get_val() == 2.0
        l = TS.LinearScheduler(1.0, 0.0, 4)
        vals = []
        for _ in range(5):
            vals.append(l.get_val())
            l.step()
        assert vals[0] == 1.0 and vals[-1] == 0.0

    def test_vocab_filters(self):
        tok = get_tokenizer()
        assert VF.NoFilter(tok).get_allowed_tokens() is None
        allowed = VF.AllowedTokensFilter(tok, ["cat", "dog"]).get_allowed_tokens()
        assert allowed and all(isinstance(i, int) for i in allowed)
        union = VF.PromptsUnionFilter(tok, prompts=["a photo of"], classes=["cat"]).get_allowed_tokens()
        assert set(VF.AllowedTokensFilter(tok, ["cat"]).get_allowed_tokens()).issubset(union)
        not_allowed = VF.NotAllowedTokensFilter(tok, ["cat"]).get_allowed_tokens()
        assert tok.sot_token not in not_allowed
        basic = VF.FilterNonBasicStrong(tok).get_allowed_tokens()
        assert len(basic) > 0


class TestAutoFluent:
    def test_top_prompter_keeps_best(self):
        tp_ = TopPrompter(2)
        tp_.push([1], 5.0)
        tp_.push([2], 1.0)
        tp_.push([3], 3.0)
        items = tp_.items()
        assert len(items) == 2
        assert items[0][1] == 1.0 and items[1][1] == 3.0

    def test_hotflip_attack_prefers_negative_grad_direction(self):
        table = np.eye(4, dtype=np.float32)
        grad = jnp.asarray([-1.0, 0.0, 0.5, 0.0])
        cands = hotflip_attack(grad, jnp.asarray(table), 2)
        assert cands[0] == 0  # -(e0 . grad) = 1 is the largest

    def test_hotflip_step_improves_toy_loss(self):
        """Loss = distance of prompt embedding to vocab row 7 -> flips to 7."""
        rng = np.random.default_rng(0)
        table = rng.standard_normal((16, 4)).astype(np.float32)
        target = jnp.asarray(table[7])
        state = AutoPromptState(table, [1, 2])

        def loss_of(embs):
            return jnp.sum((jnp.asarray(embs) - target[None]) ** 2)

        def grad_fn(embs, batch):
            del batch
            val, g = jax.value_and_grad(lambda e: loss_of(e))(jnp.asarray(embs))
            return float(val), g

        def loss_fn(embs, ids, batch):
            del ids, batch
            return float(loss_of(embs))

        step_rng = np.random.default_rng(1)
        for _ in range(8):
            hotflip_step(state, grad_fn, loss_fn, batches=[None], num_cands=16,
                         rng=step_rng)
        assert state.prompt_ids == [7, 7]

    def test_fluent_state_projection(self):
        table = np.random.RandomState(0).randn(8, 4).astype(np.float32)
        st = FluentPromptState(table, [2, 5])
        # nudging embeddings toward row 3 projects onto 3
        st.params = {"prompt_embs": jnp.asarray(np.stack([table[3] * 1.01, table[5]]))}
        ids = st.project()
        assert ids == [3, 5]

    def test_geometric_beta(self):
        sched = geometric_beta_schedule(1.0, 0.01, 10)
        b0 = float(sched(jnp.asarray(0)))
        b10 = float(sched(jnp.asarray(10)))
        assert abs(b0 - 1.0) < 1e-5 and abs(b10 - 0.01) < 1e-4
