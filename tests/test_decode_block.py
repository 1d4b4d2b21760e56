"""Decode megakernel (ops/decode_block.py): kernel vs oracle (interpret),
oracle vs the standard model forward, and the cache round-trip."""

import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.full  # heavy tier: excluded from smoke (pytest -m "not full")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summer_clip_tpu.models import gpt2 as gpt2_mod
from summer_clip_tpu.ops import decode_block as DB

CFG = gpt2_mod.GPT2Config("mega-test", vocab_size=512, n_positions=256,
                          n_embd=128, n_layer=2, n_head=2)


@pytest.fixture(scope="module")
def model_and_params():
    model = gpt2_mod.GPT2(CFG)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 4), jnp.int32))["params"]
    return model, params


def _packed(params, store):
    return DB.pack_core_params(params["core"], CFG.n_layer, store=store)


def _prefill(model, params, ids, max_len):
    cache = model.init_cache(1, max_len)
    out = model.apply({"params": params}, ids, cache=cache)
    return out


class TestPlan:
    def test_legality(self):
        assert DB.mega_legal(1280, 5120, 20)   # gpt2-large
        assert DB.mega_legal(768, 3072, 12)    # gpt2
        assert not DB.mega_legal(1600, 6400, 25)  # gpt2-xl: D % 128 != 0

    def test_chunks_divide_and_fit(self):
        plan = DB.plan_for(36, 1280, 5120, 20, 1024, 1)
        for ck, k in ((plan.ckq, 1280), (plan.ckp, 1280),
                      (plan.ck1, 1280), (plan.ck2, 5120)):
            assert k % ck == 0 and ck % 128 == 0
        # stored slabs stay under the VMEM chunk cap
        assert plan.ckq * 3840 <= DB._CHUNK_CAP
        assert plan.ck2 * 1280 <= DB._CHUNK_CAP
        assert plan.stages == plan.nq + plan.nat + plan.npj + plan.n1 + plan.n2


class TestKernelVsOracle:
    @pytest.mark.parametrize("store,kv_dtype", [
        ("bf16", jnp.bfloat16), ("int8", jnp.int8)])
    def test_matches_reference(self, model_and_params, store, kv_dtype):
        model, params = model_and_params
        packed = _packed(params, store)
        rng = np.random.RandomState(0)
        kv = DB.init_mega_kv(CFG.n_layer, CFG.n_embd, 256, kv_dtype)
        # fill a prefix of the cache with plausible rows
        pre = jnp.asarray(rng.randn(CFG.n_layer, 7, CFG.n_embd), jnp.float32)
        kq, ks = DB._quant_rows(pre, kv_dtype)
        vq, vs = DB._quant_rows(pre[:, ::-1] * 0.5, kv_dtype)
        kv = {"k": kv["k"].at[:, :7].set(kq), "v": kv["v"].at[:, :7].set(vq),
              "ks": kv["ks"].at[:, :7].set(ks), "vs": kv["vs"].at[:, :7].set(vs)}
        x = jnp.asarray(rng.randn(1, CFG.n_embd), jnp.float32)
        idx = jnp.asarray(7, jnp.int32)

        ref = DB.decode_block_reference(x, packed, kv, idx, nh=CFG.n_head)
        out = DB.decode_block(x, packed, kv, idx, nh=CFG.n_head,
                              interpret=True)
        y_r, y_k = np.asarray(ref[0]), np.asarray(out[0])
        # oracle mirrors the kernel's exact rounding points; interpret-mode
        # differences are accumulation order only
        np.testing.assert_allclose(y_k, y_r, rtol=1e-4,
                                   atol=1e-4 * np.abs(y_r).max())
        for r, k in zip(ref[1:3], out[1:3]):  # fresh KV rows
            np.testing.assert_allclose(np.asarray(k).astype(np.float32),
                                       np.asarray(r).astype(np.float32),
                                       atol=1.0)
        for r, k in zip(ref[3:], out[3:]):    # fresh scales
            np.testing.assert_allclose(np.asarray(k), np.asarray(r),
                                       rtol=1e-5)

    def test_empty_cache_first_token(self, model_and_params):
        """index=0: only the fresh token attends to itself."""
        model, params = model_and_params
        packed = _packed(params, "bf16")
        kv = DB.init_mega_kv(CFG.n_layer, CFG.n_embd, 256, jnp.bfloat16)
        x = jnp.asarray(np.random.RandomState(1).randn(1, CFG.n_embd),
                        jnp.float32)
        ref = DB.decode_block_reference(x, packed, kv, jnp.asarray(0),
                                        nh=CFG.n_head)
        out = DB.decode_block(x, packed, kv, jnp.asarray(0), nh=CFG.n_head,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                                   rtol=2e-3,
                                   atol=2e-3 * np.abs(ref[0]).max())


class TestOracleVsModel:
    def test_bf16_pack_tracks_model_forward(self, model_and_params):
        """Reference decode step vs model.apply single-token decode: same
        function up to bf16 dot rounding (weights identical via bf16
        packing of the f32 params; bf16 KV, scales 1)."""
        model, params = model_and_params
        ids = jnp.asarray(np.random.RandomState(2).randint(
            1, 512, (1, 9)), jnp.int32)
        out = _prefill(model, params, ids[:, :8], 16)
        cache = out["cache"]

        # standard path: one decode step
        std = model.apply({"params": params}, ids[:, 8:9],
                          position_offset=8, cache=cache)
        h_std = np.asarray(std["hidden"][0, -1])  # post ln_f

        # mega path: embed -> block stack -> ln_f
        packed = _packed(params, "bf16")
        kv = DB.cache_to_mega(cache, 16, jnp.bfloat16)
        x = (params["wte"]["embedding"][ids[0, 8]]
             + params["core"]["wpe"][8])[None]
        y, *_ = DB.decode_block_reference(x, packed, kv, jnp.asarray(8),
                                          nh=CFG.n_head)
        lnf = params["core"]["ln_f"]
        h_mega = np.asarray(DB._ln_rows(y, lnf["scale"][None],
                                        lnf["bias"][None])[0])

        cos = float(np.dot(h_std, h_mega)
                    / (np.linalg.norm(h_std) * np.linalg.norm(h_mega)))
        assert cos > 0.999, cos
        np.testing.assert_allclose(h_mega, h_std, rtol=0.05,
                                   atol=0.05 * np.abs(h_std).max())

    def test_int8_kv_stays_close(self, model_and_params):
        """int8 weights + int8 KV: quantization noise stays small."""
        model, params = model_and_params
        ids = jnp.asarray(np.random.RandomState(3).randint(
            1, 512, (1, 9)), jnp.int32)
        out = _prefill(model, params, ids[:, :8], 16)
        std = model.apply({"params": params}, ids[:, 8:9],
                          position_offset=8, cache=out["cache"])
        h_std = np.asarray(std["hidden"][0, -1])

        packed = _packed(params, "int8")
        kv = DB.cache_to_mega(out["cache"], 16, jnp.int8)
        x = (params["wte"]["embedding"][ids[0, 8]]
             + params["core"]["wpe"][8])[None]
        y, *_ = DB.decode_block_reference(x, packed, kv, jnp.asarray(8),
                                          nh=CFG.n_head)
        lnf = params["core"]["ln_f"]
        h_mega = np.asarray(DB._ln_rows(y, lnf["scale"][None],
                                        lnf["bias"][None])[0])
        cos = float(np.dot(h_std, h_mega)
                    / (np.linalg.norm(h_std) * np.linalg.norm(h_mega)))
        assert cos > 0.99, cos


class TestSequentialDecode:
    def test_cache_roundtrip_matches_model(self, model_and_params):
        """3 sequential kernel steps updating the mega cache track 3
        standard-path decode steps (greedy hidden-state agreement)."""
        model, params = model_and_params
        rng = np.random.RandomState(4)
        ids = jnp.asarray(rng.randint(1, 512, (1, 4)), jnp.int32)
        nxt = [int(t) for t in rng.randint(1, 512, 3)]

        out = _prefill(model, params, ids, 16)
        cache = out["cache"]
        packed = _packed(params, "bf16")
        kv = DB.cache_to_mega(cache, 16, jnp.bfloat16)

        pos = 4
        for tok in nxt:
            std = model.apply({"params": params},
                              jnp.asarray([[tok]], jnp.int32),
                              position_offset=pos, cache=cache)
            cache = std["cache"]
            h_std = np.asarray(std["hidden"][0, -1])

            x = (params["wte"]["embedding"][tok]
                 + params["core"]["wpe"][pos])[None]
            y, kq, vq, ksn, vsn = DB.decode_block_reference(
                x, packed, kv, jnp.asarray(pos), nh=CFG.n_head)
            kv = {"k": jax.lax.dynamic_update_slice(kv["k"], kq, (0, pos, 0)),
                  "v": jax.lax.dynamic_update_slice(kv["v"], vq, (0, pos, 0)),
                  "ks": jax.lax.dynamic_update_slice(kv["ks"], ksn, (0, pos, 0)),
                  "vs": jax.lax.dynamic_update_slice(kv["vs"], vsn, (0, pos, 0))}
            lnf = params["core"]["ln_f"]
            h_mega = np.asarray(DB._ln_rows(y, lnf["scale"][None],
                                            lnf["bias"][None])[0])
            cos = float(np.dot(h_std, h_mega)
                        / (np.linalg.norm(h_std) * np.linalg.norm(h_mega)))
            assert cos > 0.999, (pos, cos)
            pos += 1


class TestMegaGenerate:
    def test_mega_program_matches_standard_sampler(self, model_and_params):
        """generate_device(megakernel=True) greedy ids vs the standard scan
        sampler on the same f32 tree (bf16-packing noise must not flip the
        greedy argmax at this scale; seeds fixed, CPU interpret path)."""
        from summer_clip_tpu.apps.gen_gpt import generate_device

        model, params = model_and_params
        variables = {"params": params}
        prompt = [5, 9, 2, 17]
        kw = dict(max_new_tokens=6, temperature=1.0, top_k=1,
                  rng=jax.random.PRNGKey(3))
        std = generate_device(model, variables, prompt, **kw)
        mega = generate_device(model, variables, prompt, megakernel=True, **kw)
        assert mega == std

    def test_mega_program_int8_runs_and_freezes_on_eot(self, model_and_params):
        from summer_clip_tpu.apps.gen_gpt import generate_device
        from summer_clip_tpu.engine.quant import quantize_tree

        model, params = model_and_params
        variables = {"params": quantize_tree(params)}
        prompt = [5, 9, 2, 17]
        out = generate_device(model, variables, prompt, max_new_tokens=5,
                              top_k=1, quant_int8=True, megakernel=True,
                              rng=jax.random.PRNGKey(0))
        assert len(out) <= len(prompt) + 5
        # determinism: the same call reproduces bit-identically
        out2 = generate_device(model, variables, prompt, max_new_tokens=5,
                               top_k=1, quant_int8=True, megakernel=True,
                               rng=jax.random.PRNGKey(0))
        assert out == out2


class TestBatchedStreams:
    """Round-5 batched megakernel: up to 8 independent streams per launch
    (per-stream KV rings, indices, and left-pad masks). Per-stream math is
    the single-stream kernel's exactly, so the batched oracle is the
    single-stream oracle applied per row."""

    B = 3

    def _batched_setup(self, params, store, kv_dtype, seed=10):
        rng = np.random.RandomState(seed)
        packed = _packed(params, store)
        kv = DB.init_mega_kv(CFG.n_layer, CFG.n_embd, 256, kv_dtype,
                             batch=self.B)
        pre = jnp.asarray(rng.randn(CFG.n_layer, self.B, 9, CFG.n_embd),
                          jnp.float32)
        kq, ks = DB._quant_rows(pre, kv_dtype)
        vq, vs = DB._quant_rows(pre[:, :, ::-1] * 0.5, kv_dtype)
        kv = {"k": kv["k"].at[:, :, :9].set(kq),
              "v": kv["v"].at[:, :, :9].set(vq),
              "ks": kv["ks"].at[:, :, :9].set(ks),
              "vs": kv["vs"].at[:, :, :9].set(vs)}
        x = jnp.asarray(rng.randn(self.B, CFG.n_embd), jnp.float32)
        idx = jnp.asarray([9, 4, 0], jnp.int32)   # per-stream fill levels
        return packed, kv, x, idx

    @pytest.mark.parametrize("store,kv_dtype", [
        ("bf16", jnp.bfloat16), ("int8", jnp.int8)])
    def test_matches_per_stream_oracle(self, model_and_params, store, kv_dtype):
        model, params = model_and_params
        packed, kv, x, idx = self._batched_setup(params, store, kv_dtype)
        ref = DB.decode_block_reference(x, packed, kv, idx, nh=CFG.n_head)
        out = DB.decode_block(x, packed, kv, idx, nh=CFG.n_head,
                              interpret=True)
        y_r, y_k = np.asarray(ref[0]), np.asarray(out[0])
        assert y_k.shape == (self.B, CFG.n_embd)
        np.testing.assert_allclose(y_k, y_r, rtol=1e-4,
                                   atol=1e-4 * np.abs(y_r).max())
        for r, k in zip(ref[1:3], out[1:3]):  # fresh KV rows, (L, B, D)
            np.testing.assert_allclose(np.asarray(k).astype(np.float32),
                                       np.asarray(r).astype(np.float32),
                                       atol=1.0)
        for r, k in zip(ref[3:], out[3:]):    # fresh scales (L, B, 1)
            np.testing.assert_allclose(np.asarray(k), np.asarray(r),
                                       rtol=1e-5)

    def test_streams_are_independent(self, model_and_params):
        """Each batched row equals the SAME stream decoded alone through the
        legacy single-stream layout (bitwise on the interpret path)."""
        model, params = model_and_params
        packed, kv, x, idx = self._batched_setup(params, "int8", jnp.int8)
        out = DB.decode_block(x, packed, kv, idx, nh=CFG.n_head,
                              interpret=True)
        for b in range(self.B):
            kvb = {k: v[:, b] for k, v in kv.items()}
            solo = DB.decode_block(x[b:b + 1], packed, kvb, idx[b],
                                   nh=CFG.n_head, interpret=True)
            np.testing.assert_array_equal(np.asarray(out[0][b]),
                                          np.asarray(solo[0][0]))
            np.testing.assert_array_equal(np.asarray(out[1][:, b]),
                                          np.asarray(solo[1][:, 0]))
            np.testing.assert_array_equal(np.asarray(out[3][:, b]),
                                          np.asarray(solo[3][:, 0]))

    def test_pad_masks_prefix(self, model_and_params):
        """Left-pad masking: junk rows below pad[b] must not change the
        output — same result as a cache that never contained them."""
        model, params = model_and_params
        packed, kv, x, idx = self._batched_setup(params, "int8", jnp.int8)
        pad = jnp.asarray([3, 1, 0], jnp.int32)
        out = DB.decode_block(x, packed, kv, idx, nh=CFG.n_head, pad=pad,
                              interpret=True)
        ref = DB.decode_block_reference(x, packed, kv, idx, nh=CFG.n_head,
                                        pad=pad)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                                   rtol=1e-4,
                                   atol=1e-4 * np.abs(ref[0]).max())
        # poisoning the masked rows changes nothing
        poison = jnp.full((CFG.n_layer, self.B, 3, CFG.n_embd), 99,
                          kv["k"].dtype)
        kv2 = {"k": kv["k"].at[:, :, :3].set(
                   jnp.where(jnp.arange(3)[None, None, :, None]
                             < pad[None, :, None, None], poison, kv["k"][:, :, :3])),
               "v": kv["v"], "ks": kv["ks"], "vs": kv["vs"]}
        out2 = DB.decode_block(x, packed, kv2, idx, nh=CFG.n_head, pad=pad,
                               interpret=True)
        np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(out2[0]))

    def test_mega_update_kv_batched(self, model_and_params):
        model, params = model_and_params
        packed, kv, x, idx = self._batched_setup(params, "int8", jnp.int8)
        out = DB.decode_block(x, packed, kv, idx, nh=CFG.n_head,
                              interpret=True)
        _, kq, vq, ksn, vsn = out
        kv2 = DB.mega_update_kv(kv, kq, vq, ksn, vsn, idx)
        for b in range(self.B):
            i = int(idx[b])
            np.testing.assert_array_equal(np.asarray(kv2["k"][:, b, i]),
                                          np.asarray(kq[:, b]))
            np.testing.assert_array_equal(np.asarray(kv2["ks"][:, b, i]),
                                          np.asarray(ksn[:, b]))
            # rows away from i are untouched
            j = (i + 5) % 256
            np.testing.assert_array_equal(np.asarray(kv2["v"][:, b, j]),
                                          np.asarray(kv["v"][:, b, j]))

    def test_sequential_batched_tracks_solo_decode(self, model_and_params):
        """3 batched kernel steps with per-stream rings == each stream
        decoded alone (bitwise, interpret path)."""
        model, params = model_and_params
        packed, kv, x, idx0 = self._batched_setup(params, "int8", jnp.int8)
        rng = np.random.RandomState(11)
        solo_kv = [{k: v[:, b] for k, v in kv.items()} for b in range(self.B)]
        idx = np.asarray(idx0)
        xs = np.asarray(x)
        for step in range(3):
            y, kq, vq, ksn, vsn = DB.decode_block(
                jnp.asarray(xs), packed, kv, jnp.asarray(idx),
                nh=CFG.n_head, interpret=True)
            kv = DB.mega_update_kv(kv, kq, vq, ksn, vsn,
                                   jnp.asarray(idx))
            for b in range(self.B):
                ys, kqs, vqs, ksns, vsns = DB.decode_block(
                    jnp.asarray(xs[b:b + 1]), packed, solo_kv[b],
                    jnp.asarray(idx[b]), nh=CFG.n_head, interpret=True)
                np.testing.assert_array_equal(np.asarray(y[b]),
                                              np.asarray(ys[0]))
                solo_kv[b] = DB.mega_update_kv(
                    solo_kv[b], kqs, vqs, ksns, vsns, jnp.asarray(idx[b]))
            idx = idx + 1
            xs = np.asarray(y) * 0.1  # feed something derived, stay bounded


class TestMegaGenerateBatched:
    def test_batched_mega_matches_batched_sampler(self, model_and_params):
        """generate_device_batched(megakernel=True) greedy ids vs the
        standard batched scan sampler on the same f32 tree (variable-length
        prompts exercise the kernel's per-stream pad mask)."""
        from summer_clip_tpu.apps.gen_gpt import generate_device_batched

        model, params = model_and_params
        variables = {"params": params}
        prompts = [[5, 9, 2, 17], [7, 3], [11, 4, 6, 8, 13, 2, 9]]
        kw = dict(max_new_tokens=6, temperature=1.0, top_k=1,
                  rng=jax.random.PRNGKey(3))
        std = generate_device_batched(model, variables, prompts, **kw)
        mega = generate_device_batched(model, variables, prompts,
                                       megakernel=True, **kw)
        assert mega == std

    def test_batched_mega_int8_eot_freeze(self, model_and_params):
        from summer_clip_tpu.apps.gen_gpt import generate_device_batched
        from summer_clip_tpu.engine.quant import quantize_tree

        model, params = model_and_params
        variables = {"params": quantize_tree(params)}
        prompts = [[5, 9, 2, 17], [7, 3]]
        kw = dict(max_new_tokens=5, top_k=1, quant_int8=True,
                  megakernel=True, eot_id=3, rng=jax.random.PRNGKey(0))
        out = generate_device_batched(model, variables, prompts, **kw)
        out2 = generate_device_batched(model, variables, prompts, **kw)
        assert out == out2
        for p, o in zip(prompts, out):
            assert len(o) <= len(p) + 5
