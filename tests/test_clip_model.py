"""CLIP model tests: shapes, EOT pooling, embeds-gradient path, converter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summer_clip_tpu.models.clip import build_clip, init_clip, CLIP_CONFIGS
from summer_clip_tpu.models import tokenizer as tok


@pytest.fixture(scope="module")
def tiny_vit():
    model, cfg, variables = init_clip("test-vit")
    return model, cfg, variables


@pytest.fixture(scope="module")
def tiny_rn():
    model, cfg, variables = init_clip("test-rn")
    return model, cfg, variables


class TestShapes:
    def test_vit_image_features(self, tiny_vit):
        model, cfg, variables = tiny_vit
        imgs = jax.random.normal(jax.random.PRNGKey(0), (3, cfg.image_resolution, cfg.image_resolution, 3))
        feats = model.apply(variables, imgs, method=model.encode_image)
        assert feats.shape == (3, cfg.embed_dim)
        assert bool(jnp.all(jnp.isfinite(feats)))

    def test_rn_image_features(self, tiny_rn):
        model, cfg, variables = tiny_rn
        imgs = jax.random.normal(jax.random.PRNGKey(0), (2, cfg.image_resolution, cfg.image_resolution, 3))
        feats = model.apply(variables, imgs, method=model.encode_image)
        assert feats.shape == (2, cfg.embed_dim)
        assert bool(jnp.all(jnp.isfinite(feats)))

    def test_text_features(self, tiny_vit):
        model, cfg, variables = tiny_vit
        ids = np.zeros((4, cfg.context_length), np.int32)
        ids[:, 0] = 5
        ids[:, 1] = 9
        ids[:, 2] = cfg.vocab_size - 1  # pretend EOT = max id
        feats = model.apply(variables, jnp.asarray(ids), method=model.encode_text)
        assert feats.shape == (4, cfg.embed_dim)

    def test_contrastive_forward(self, tiny_vit):
        model, cfg, variables = tiny_vit
        imgs = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.image_resolution, cfg.image_resolution, 3))
        ids = jnp.zeros((2, cfg.context_length), jnp.int32).at[:, 1].set(cfg.vocab_size - 1)
        li, lt = model.apply(variables, imgs, ids)
        assert li.shape == (2, 2)
        np.testing.assert_allclose(np.asarray(li), np.asarray(lt).T, rtol=1e-5)


@pytest.mark.full
class TestEOTPooling:
    def test_embeds_path_matches_token_path(self, tiny_vit):
        """encode_text(ids) == encode_text_embeds(embed(ids), argmax+1)."""
        model, cfg, variables = tiny_vit
        rng = np.random.RandomState(0)
        ids = np.zeros((3, cfg.context_length), np.int32)
        lens = [5, 9, 12]
        for row, ln in enumerate(lens):
            ids[row, :ln - 1] = rng.randint(1, cfg.vocab_size - 2, ln - 1)
            ids[row, ln - 1] = cfg.vocab_size - 1  # EOT (max id)
        ids = jnp.asarray(ids)

        ref = model.apply(variables, ids, method=model.encode_text)

        def embed_then_encode(variables, ids, lens):
            embeds = model.apply(variables, ids, method=lambda m, i: m.text.embed(i))
            return model.apply(variables, embeds, jnp.asarray(lens), method=model.encode_text_embeds)

        got = embed_then_encode(variables, ids, np.asarray(lens, np.int32))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)

    def test_grad_flows_to_spliced_embeds(self, tiny_vit):
        """Prompt-learning contract: d(loss)/d(prompt embeddings) is nonzero."""
        model, cfg, variables = tiny_vit
        b, t, w = 2, cfg.context_length, CLIP_CONFIGS["test-vit"].text_width
        base = jnp.zeros((b, t, w), jnp.float32)
        prompt = jnp.ones((4, w), jnp.float32) * 0.01
        lens = jnp.asarray([10, 10], jnp.int32)

        def loss_fn(prompt):
            embeds = base.at[:, 1:5, :].set(prompt[None])
            feats = model.apply(variables, embeds, lens, method=model.encode_text_embeds)
            return jnp.sum(feats ** 2)

        g = jax.grad(loss_fn)(prompt)
        assert float(jnp.abs(g).max()) > 0.0


class TestTokenizer:
    def test_tokenize_shape_and_specials(self):
        out = tok.tokenize(["a photo of a cat", "dog"], context_length=77)
        assert out.shape == (2, 77)
        t = tok.get_tokenizer()
        assert out[0, 0] == t.sot_token
        eots = (out == t.eot_token).sum(axis=1)
        assert (eots == 1).all()
        assert t.vocab_size == tok.VOCAB_SIZE

    def test_roundtrip_decode(self):
        t = tok.get_tokenizer()
        ids = t.encode("hello world")
        assert t.decode(ids) == "hello world"

    def test_deterministic(self):
        a = tok.tokenize("the same text")
        b = tok.tokenize("the same text")
        np.testing.assert_array_equal(a, b)


class TestConverter:
    def test_roundtrip_tiny_vit_state_dict(self, tiny_vit):
        """Build a fake torch-layout state dict from flax params, convert back,
        and check the tree structure + a forward pass agree."""
        from summer_clip_tpu.models.clip import convert as cv

        model, cfg, variables = tiny_vit
        p = variables["params"]

        sd = {}
        sd["logit_scale"] = np.asarray(p["logit_scale"])
        sd["text_projection"] = np.asarray(p["text"]["text_projection"])
        sd["positional_embedding"] = np.asarray(p["text"]["positional_embedding"])
        sd["token_embedding.weight"] = np.asarray(p["text"]["token_embedding"]["embedding"])
        sd["ln_final.weight"] = np.asarray(p["text"]["ln_final"]["scale"])
        sd["ln_final.bias"] = np.asarray(p["text"]["ln_final"]["bias"])

        v = p["visual"]
        sd["visual.conv1.weight"] = np.asarray(v["conv1"]["kernel"]).transpose(3, 2, 0, 1)
        sd["visual.class_embedding"] = np.asarray(v["class_embedding"])
        sd["visual.positional_embedding"] = np.asarray(v["positional_embedding"])
        sd["visual.proj"] = np.asarray(v["proj"])
        for ln in ("ln_pre", "ln_post"):
            sd[f"visual.{ln}.weight"] = np.asarray(v[ln]["scale"])
            sd[f"visual.{ln}.bias"] = np.asarray(v[ln]["bias"])

        def dump_tf(prefix, tree, n_layers):
            for i in range(n_layers):
                blk = tree[f"resblocks_{i}"]
                bp = f"{prefix}.resblocks.{i}"
                for ln in ("ln_1", "ln_2"):
                    sd[f"{bp}.{ln}.weight"] = np.asarray(blk[ln]["scale"])
                    sd[f"{bp}.{ln}.bias"] = np.asarray(blk[ln]["bias"])
                a = blk["attn"]
                w = np.concatenate([np.asarray(a[k]["kernel"]).T for k in ("q_proj", "k_proj", "v_proj")], 0)
                b = np.concatenate([np.asarray(a[k]["bias"]) for k in ("q_proj", "k_proj", "v_proj")], 0)
                sd[f"{bp}.attn.in_proj_weight"] = w
                sd[f"{bp}.attn.in_proj_bias"] = b
                sd[f"{bp}.attn.out_proj.weight"] = np.asarray(a["out_proj"]["kernel"]).T
                sd[f"{bp}.attn.out_proj.bias"] = np.asarray(a["out_proj"]["bias"])
                for mm in ("c_fc", "c_proj"):
                    sd[f"{bp}.mlp.{mm}.weight"] = np.asarray(blk["mlp"][mm]["kernel"]).T
                    sd[f"{bp}.mlp.{mm}.bias"] = np.asarray(blk["mlp"][mm]["bias"])

        dump_tf("visual.transformer", v["transformer"], int(cfg.vision_layers))
        dump_tf("transformer", p["text"]["transformer"], cfg.text_layers)

        assert cv.detect_model_name(sd) == "test-vit"
        converted = cv.convert_state_dict(sd)

        imgs = jax.random.normal(jax.random.PRNGKey(3), (2, cfg.image_resolution, cfg.image_resolution, 3))
        ref = model.apply(variables, imgs, method=model.encode_image)
        got = model.apply(converted, imgs, method=model.encode_image)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


class TestBPEMerges:
    def test_merge_table_applied(self, tmp_path):
        """A tiny merge file must change segmentation the BPE way."""
        import gzip
        from summer_clip_tpu.models.tokenizer import SimpleTokenizer

        merges = "#version\n" + "\n".join([
            "h e", "he l", "hel l", "hell o</w>",
        ])
        p = tmp_path / "bpe.txt.gz"
        with gzip.open(p, "wt") as f:
            f.write(merges)
        tok = SimpleTokenizer(p)
        assert tok.has_merges
        ids = tok.encode("hello")
        # all four merges collapse "hello" to a single token
        assert len(ids) == 1
        assert tok.decoder[ids[0]] == "hello</w>"
        assert tok.decode(ids) == "hello"
        # unknown word falls back to finer pieces
        ids2 = tok.encode("help")
        assert len(ids2) > 1

    def test_fallback_has_canonical_specials(self):
        from summer_clip_tpu.models import tokenizer as T

        tok = T.get_tokenizer()
        assert tok.vocab_size == 49408
        assert tok.sot_token == 49406 and tok.eot_token == 49407


class TestGoldenRegression:
    """Numerics must stay put across refactors/rounds (fixed seeds)."""

    def test_tiny_vit_matches_golden(self):
        from pathlib import Path

        golden_dir = Path(__file__).parent / "golden"
        model, cfg, variables = init_clip("test-vit", rng=jax.random.PRNGKey(1234))
        imgs = jax.random.normal(jax.random.PRNGKey(99),
                                 (2, cfg.image_resolution, cfg.image_resolution, 3))
        feats = np.asarray(model.apply(variables, imgs, method=model.encode_image))
        ref = np.load(golden_dir / "test_vit_feats.npy")
        np.testing.assert_allclose(feats, ref, atol=2e-4, rtol=2e-4)

        ids = jnp.zeros((2, cfg.context_length), jnp.int32).at[:, 1].set(cfg.vocab_size - 1)
        txt = np.asarray(model.apply(variables, ids, method=model.encode_text))
        ref_t = np.load(golden_dir / "test_vit_text.npy")
        np.testing.assert_allclose(txt, ref_t, atol=2e-4, rtol=2e-4)

    def test_tiny_rn_matches_golden(self):
        """Per-stage anchors for the drift-risk tower (VERDICT r3 #5): the
        ModifiedResNet (blur-pool bottlenecks, BN running stats, attention
        pool — reference default, eval_clip.py:33-61) pinned stage-by-stage
        against activations generated from the INDEPENDENT torch oracle
        (tools/make_rn_golden.py). Catches drift in the flax tower, the
        state-dict converter, or the oracle — at the stage it starts."""
        from pathlib import Path

        torch = pytest.importorskip("torch")

        from summer_clip_tpu.models.clip.convert import convert_state_dict
        from tools.make_rn_golden import SEED
        from tools.torch_clip_oracle import build_torch_clip, randomize_

        golden = np.load(Path(__file__).parent / "golden" / "test_rn_stages.npz")
        tm = build_torch_clip("test-rn").eval()
        randomize_(tm, seed=SEED)
        sd = {k: t.float().numpy() for k, t in tm.state_dict().items()}
        variables = convert_state_dict(sd)
        model, cfg = build_clip("test-rn", dtype=jnp.float32)

        def keep(mdl, _method):
            return mdl.name in {"bn3", "layer1_0", "layer2_0", "layer3_0",
                                "layer4_0"}

        img = jnp.asarray(golden["img"])
        j_img, inter = model.apply(variables, img, method=model.encode_image,
                                   capture_intermediates=keep,
                                   mutable=["intermediates"])
        vis = inter["intermediates"]["visual"]
        got = {
            "stem_bn3": np.asarray(vis["bn3"]["__call__"][0]),
            **{f"layer{k}": np.asarray(vis[f"layer{k}_0"]["__call__"][0])
               for k in (1, 2, 3, 4)},
            "image": np.asarray(j_img),
            "text": np.asarray(model.apply(
                variables, jnp.asarray(golden["toks"]),
                method=model.encode_text)),
        }
        for name, arr in got.items():
            ref = golden[name]
            assert arr.shape == ref.shape, name
            rel = np.abs(arr - ref).max() / max(np.abs(ref).max(), 1e-9)
            assert rel < 1e-5, f"{name}: rel drift {rel:.2e}"


@pytest.mark.full
class TestRemat:
    def test_vit_remat_matches(self):
        from summer_clip_tpu.models.clip import build_clip

        m1, cfg = build_clip("test-vit")
        m2, _ = build_clip("test-vit", remat=True)
        imgs = jax.random.normal(jax.random.PRNGKey(0),
                                 (2, cfg.image_resolution, cfg.image_resolution, 3))
        ids = jnp.zeros((1, cfg.context_length), jnp.int32)
        v = m1.init(jax.random.PRNGKey(7), imgs[:1], ids)
        f1 = m1.apply(v, imgs, method=m1.encode_image)
        f2 = m2.apply(v, imgs, method=m2.encode_image)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-5)


class TestPatchEmbedModes:
    def test_matmul_equals_conv(self):
        """patch_embed='matmul' (explicit extract + GEMM, the SURVEY §7 ViT
        experiment) is numerically the strided conv on the same params."""
        from summer_clip_tpu.models.clip import build_clip

        m1, cfg = build_clip("test-vit")
        m2, _ = build_clip("test-vit", patch_embed="matmul")
        imgs = jax.random.normal(jax.random.PRNGKey(5),
                                 (3, cfg.image_resolution, cfg.image_resolution, 3))
        ids = jnp.zeros((1, cfg.context_length), jnp.int32)
        v = m1.init(jax.random.PRNGKey(7), imgs[:1], ids)
        f1 = m1.apply(v, imgs, method=m1.encode_image)
        f2 = m2.apply(v, imgs, method=m2.encode_image)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f2),
                                   atol=2e-5, rtol=2e-5)
        # identical variable trees: a converted checkpoint drops into either
        assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
            m2.init(jax.random.PRNGKey(7), imgs[:1], ids))


class TestTokenizerUnicode:
    def test_unicode_roundtrip(self):
        t = tok.get_tokenizer()
        for s in ["héllo wörld", "naïve café", "日本語 テスト"]:
            assert t.decode(t.encode(s)) == s
