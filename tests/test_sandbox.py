"""Sandbox tests: kmeans, input optimization, trigger search, GPT heads."""

import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.full  # heavy tier: excluded from smoke (pytest -m "not full")

import json

import jax
import jax.numpy as jnp
import numpy as np

from summer_clip_tpu.sandbox import anomalous_tokens as AT
from summer_clip_tpu.sandbox import create_trigger as CT
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


class TestGenerateCli:
    def test_generate_cli(self, capsys):
        """Reference anomalous_tokens/generate.py equivalent."""
        text = AT.main(["-m", "test-gpt", "-i", "hello", "-o", "4"])
        assert isinstance(text, str) and len(text) > 0
        out = capsys.readouterr().out
        assert "input tokens" in out and "Output" in out


class TestGreedyRollout:
    def test_matches_naive_autoregressive_loop(self):
        """The fixed-shape scan rollout == a python loop that regrows the
        sequence each step (the reference model_emb, helpers.py:166-190)."""
        model, cfg = G.build_gpt2("test-gpt")
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
        table = jnp.asarray(variables["params"]["wte"]["embedding"])

        def gpt_apply(e):
            return model.apply(variables, inputs_embeds=e)["logits"]

        rng = jax.random.PRNGKey(1)
        x = jax.random.normal(rng, (2, 3, cfg.n_embd))
        out_len = 4
        logits, out_ids, seq = AT.greedy_rollout(gpt_apply, x, table, out_len)
        assert logits.shape == (2, 3 + out_len, cfg.vocab_size)
        assert out_ids.shape == (2, out_len)
        # naive loop: grow the sequence one greedy token at a time
        e = x
        naive_ids = []
        for _ in range(out_len):
            last = gpt_apply(e)[:, -1]
            ix = jnp.argmax(last, axis=-1)
            naive_ids.append(np.asarray(ix))
            e = jnp.concatenate([e, table[ix][:, None, :]], axis=1)
        np.testing.assert_array_equal(np.asarray(out_ids), np.stack(naive_ids, 1))
        # the final full forward reproduces the per-step logits
        np.testing.assert_allclose(np.asarray(logits), np.asarray(gpt_apply(seq)),
                                   rtol=1e-5, atol=1e-5)

    def test_confidence_perplexity_formula(self):
        logits = jnp.asarray(np.random.RandomState(0).randn(2, 5, 7).astype(np.float32))
        p = np.asarray(jax.nn.softmax(logits, axis=-1)).max(axis=-1)  # (2, 5)
        expect = 1.0 / np.prod(p, axis=-1) ** (1.0 / p.shape[-1]) - 1.0
        got = np.asarray(AT.confidence_perplexity(logits))
        np.testing.assert_allclose(got, expect, rtol=1e-5)


class TestKMeansEqual:
    def test_equal_clusters_have_capacity_sizes(self):
        rng = np.random.RandomState(0)
        emb = rng.randn(24, 6).astype(np.float32)
        assign, centroids = AT.kmeans(emb, 4, seed=0, equal_clusters=True)
        counts = np.bincount(np.asarray(assign), minlength=4)
        assert counts.tolist() == [6, 6, 6, 6]
        assert centroids.shape == (4, 6)


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

    def test_sliding_window_and_rep_penalty_run(self):
        """output_len > len(target) engages the per-token window max
        (backwards.py:98-104); rep penalty engages the logit sum."""
        model, cfg = G.build_gpt2("test-gpt")
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
        table = np.asarray(variables["params"]["wte"]["embedding"])

        def gpt_apply(e):
            return model.apply(variables, inputs_embeds=e)["logits"]

        out = AT.optimise_input(gpt_apply, table, target_ids=[3, 5], input_len=2,
                                batch_size=2, epochs=4, lr=0.05, init="random",
                                output_len=4, penalise_repetition=True,
                                check_freq=2)
        assert np.isfinite(out["losses"]).all()
        assert out["perplexities"].shape == (2,)

    def test_ce_rejects_multi_token_targets(self):
        import pytest

        with pytest.raises(ValueError):
            AT.optimise_input(lambda e: e, np.eye(4, dtype=np.float32),
                              target_ids=[1, 2], loss_type="ce")

    def test_success_detection_reinit_and_early_return(self):
        """A linear 'LM' (logits = cosine to the table) emits the nearest
        token; 'local' init starts at the target's embedding, so the very
        first check finds it, records it, and return_early stops the run."""
        rng = np.random.RandomState(0)
        table = rng.randn(16, 8).astype(np.float32)
        table /= np.linalg.norm(table, axis=1, keepdims=True)
        tbl = jnp.asarray(table)

        def gpt_apply(e):
            return 10.0 * jnp.einsum("bld,vd->blv", e, tbl)

        logs = []
        out = AT.optimise_input(gpt_apply, table, target_ids=[7], input_len=2,
                                batch_size=3, epochs=50, lr=0.01, init="local",
                                check_freq=5, return_early=True,
                                log_fn=logs.append)
        assert out["found"], "local init at the target must be detected"
        assert out["epochs_run"] < 50  # return_early fired
        f = out["found"][0]
        assert 7 in f["output_ids"] and {"loss", "perplexity", "distance"} <= set(f)
        assert logs and logs[-1]["num_found"] >= 1

    def test_lr_decay_halves_on_plateau(self):
        """Constant logits => constant loss => plateau => lr halves."""
        table = np.eye(8, dtype=np.float32)
        const = jnp.zeros((1, 1, 8))

        def gpt_apply(e):
            b, t, _ = e.shape
            return jnp.broadcast_to(const, (b, t, 8))

        out = AT.optimise_input(gpt_apply, table, target_ids=[2], input_len=2,
                                batch_size=2, epochs=60, lr=0.1, dist_reg=0.0,
                                init="random", lr_decay=True, check_freq=10,
                                no_reinit=True)
        assert out["final_lr"] < 0.1

    def test_backwards_cli_smoke(self, tmp_path, capsys):
        log = tmp_path / "m.jsonl"
        res = AT.backwards_main([
            "--model_name", "test-gpt", "--epochs", "4", "--w_freq", "2",
            "--batch_size", "2", "--input_len", "2", "--init", "random",
            "--run_test_set", "3", "5", "--log", str(log)])
        assert len(res["runs"]) == 2
        assert log.exists()
        recs = [json.loads(l) for l in log.read_text().splitlines()]
        assert any(r.get("type") == "optimise_input" for r in recs)
        assert any(r.get("type") == "table" for r in recs)
        out = capsys.readouterr().out
        assert "target=" in out


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


def _char_encode(text):
    """Toy tokenizer: one id per char, ids 1..127 (0 reserved for pad/mask)."""
    return [max(1, ord(c) % 128) for c in text if not c.isspace()] or [1]


class TestCreateTrigger:
    """The vendored-autoprompt surface (reference create_trigger.py:57-134,
    autoprompt/utils.py:57+): templatizer over label-map datasets, multi-token
    label accuracy, dev-eval loop, full search app."""

    def test_templatizer_fixed_shapes_and_masks(self):
        t = CT.Templatizer("[T] [T] xy {sentence} [P]", _char_encode, mask_id=0,
                           label_map={"0": "a", "1": "b"}, max_len=16)
        assert t.num_trigger_tokens == 2
        ex = t({"sentence": "qr", "label": "1"})
        assert ex.input_ids.shape == (16,)
        assert ex.trigger_mask[:2].all() and ex.trigger_mask.sum() == 2
        assert ex.predict_mask.sum() == 1
        # predict slot follows [T][T] + 'xy' + 'qr'
        assert np.flatnonzero(ex.predict_mask)[0] == 6
        assert ex.label_ids[0] == ord("b") % 128
        np.testing.assert_array_equal(ex.input_ids[7:], 0)  # padded

    def test_load_trigger_dataset_tsv_jsonl(self, tmp_path):
        t = CT.Templatizer("[T] {text} [P]", _char_encode, mask_id=0, max_len=12,
                           label_field="label")
        tsv = tmp_path / "d.tsv"
        tsv.write_text("text\tlabel\nab\tx\ncd\ty\n")
        rows = CT.load_trigger_dataset(tsv, t)
        assert len(rows) == 2
        jl = tmp_path / "d.jsonl"
        jl.write_text('{"text": "ab", "label": "x"}\n{"text": "' + "z" * 40 + '", "label": "y"}\n')
        rows = CT.load_trigger_dataset(jl, t)
        assert len(rows) == 1  # overlong example skipped

    def test_load_trigger_dataset_use_ctx(self, tmp_path):
        """Relation-extraction mode: evidence sampling + [MASK] -> surface
        replacement exposed as {context} (reference utils.py use_ctx)."""
        t = CT.Templatizer("[T] {context} [P]", _char_encode, mask_id=0,
                           max_len=32, label_field="label")
        jl = tmp_path / "re.jsonl"
        jl.write_text(json.dumps({
            "label": "x",
            "evidences": [{"obj_surface": "cat",
                           "masked_sentence": "a [MASK] sat"}],
        }) + "\n" + json.dumps({"label": "y"}) + "\n")
        rows = CT.load_trigger_dataset(jl, t, use_ctx=True)
        assert len(rows) == 1  # the no-evidence row is skipped
        ids = rows[0].input_ids
        expect = _char_encode("a cat sat")
        got = [i for i in ids[1:1 + len(expect)]]
        assert got == expect

    def test_label_loss_and_accuracy_multi_token(self):
        # vocab 8; label A = tokens [2,3], label B = [5]
        logits = jnp.asarray(np.full((2, 8), -10.0, np.float32))
        logits = logits.at[0, 2].set(5.0).at[0, 3].set(5.0)  # row0 favors A
        logits = logits.at[1, 5].set(5.0)                    # row1 favors B
        acc = CT.AccuracyFn([CT.encode_label(None, [2, 3]),
                             CT.encode_label(None, [5])], ["A", "B"])
        gold = jnp.asarray(np.stack([CT.encode_label(None, [2, 3]),
                                     CT.encode_label(None, [5])]))
        correct = np.asarray(acc(logits, gold))
        assert correct.tolist() == [1.0, 1.0]
        swapped = jnp.asarray(np.stack([CT.encode_label(None, [5]),
                                        CT.encode_label(None, [2, 3])]))
        assert np.asarray(acc(logits, swapped)).tolist() == [0.0, 0.0]
        assert acc.predict(logits) == ["A", "B"]

    def test_token_filter(self):
        decode = {1: " Cap", 2: " low", 3: "x"}.get
        filt = CT.build_token_filter(5, label_ids=[np.asarray([3])],
                                     special_ids=[0],
                                     decode_fn=lambda ids: decode(ids[0], ""))
        assert filt[0] < -1e30 and filt[3] < -1e30  # special + label
        assert filt[1] < -1e30                       # capitalized
        assert filt[2] == 0.0 and filt[4] == 0.0

    def test_search_e2e_on_test_gpt(self, tmp_path):
        """Full loop on test-gpt: runs, logs, returns a best trigger whose dev
        metric is >= the initial trigger's."""
        model, cfg = G.build_gpt2("test-gpt")
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))["params"]
        table = params["wte"]["embedding"]

        def model_fn(inputs_embeds):
            return model.apply({"params": params}, inputs_embeds=inputs_embeds)["logits"]

        def enc(text):
            return [max(1, ord(c) % cfg.vocab_size) for c in text if not c.isspace()] or [1]

        label_map = {"0": [7], "1": [9]}
        t = CT.Templatizer("[T] [T] {text} [P]", enc, mask_id=0,
                           label_map=label_map, max_len=12)
        rng = np.random.RandomState(0)
        rows = [{"text": "".join(chr(97 + rng.randint(0, 4)) for _ in range(3)),
                 "label": str(rng.randint(0, 2))} for _ in range(32)]
        train = [t(r) for r in rows[:24]]
        dev = [t(r) for r in rows[24:]]
        acc = CT.AccuracyFn.from_label_map(enc, label_map)
        searcher = CT.TriggerSearch(model_fn, table, t.num_trigger_tokens,
                                    causal=True, evaluation_fn=acc)
        logs = []
        out = searcher.search(train, dev, iters=3, bsz=4, accumulation_steps=2,
                              num_cand=6, eval_size=8, seed=0,
                              log_fn=logs.append)
        assert len(out["history"]) >= 2
        assert out["best"]["dev_metric"] >= out["history"][0]["dev_metric"]
        assert len(out["final_trigger_ids"]) == 2
        assert logs and all("iter" in r for r in logs)

    def test_main_cli_smoke(self, tmp_path, capsys):
        rng = np.random.RandomState(1)
        rows = [{"text": "ab" * (1 + i % 2), "label": str(i % 2)} for i in range(12)]
        train = tmp_path / "train.jsonl"
        dev = tmp_path / "dev.jsonl"
        train.write_text("\n".join(json.dumps(r) for r in rows[:8]))
        dev.write_text("\n".join(json.dumps(r) for r in rows[8:]))
        out_p = tmp_path / "res.json"
        res = CT.main([
            "--train", str(train), "--dev", str(dev),
            "--template", "[T] {text} [P]",
            "--label-map", '{"0": "a", "1": "b"}',
            "--model", "test-gpt", "--iters", "1", "--bsz", "2",
            "--accumulation-steps", "1", "--num-cand", "3",
            "--max-len", "12", "--out", str(out_p),
        ])
        assert "best" in res and out_p.exists()
        assert "trigger_text" in res["best"]


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
