"""Flax GPT-2 + ClipGPT (GPT-2 re-based onto CLIP's vocabulary).

TPU-native rebuild of the reference's LM stack (``summer_clip/clip_prompt/gpt.py``):

- :class:`GPT2` — standard GPT-2 decoder (tanh-GELU, fused qkv, tied head),
  accepting token ids **or** ``inputs_embeds``, with a functional KV cache
  for incremental decoding (``lax.scan``-friendly fixed-size cache),
- :class:`ClipGPT` — input/output embeddings replaced by the **frozen CLIP
  token table** bridged through trainable ReLU MLP adapters
  (reference ``Adapter``/``AdapterEmb``/``AdapterLMHead``, gpt.py:13-49).
  Only the adapters train (``clip_gpt_trainable_mask``); ``ClipGPTFull``
  semantics = train everything but the embedding tables,
- :func:`convert_hf_gpt2` — HF ``GPT2LMHeadModel`` state dict -> Flax params.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from summer_clip_tpu.ops.attention import multi_head_attention
from summer_clip_tpu.ops.gemv import gather_rows, is_qleaf, qdot, qmlp
from summer_clip_tpu.models.clip.modeling import LayerNormF32

Dtype = tp.Any

__all__ = [
    "GPT2Config", "GPT2", "GPT2_CONFIGS", "build_gpt2", "convert_hf_gpt2",
    "ClipGPT", "clip_gpt_trainable_mask", "clip_gpt_full_trainable_mask",
    "Adapter", "QDense",
]


class QDense(nn.Dense):
    """``nn.Dense`` that also accepts an int8 ``{"q", "scale"}`` kernel leaf
    (``engine/quant.quantize_tree`` rewrites matrix leaves in place — the
    param tree keeps its paths, so checkpoints/TP specs are unchanged).

    Plain-array kernels reproduce ``nn.Dense``'s math bit-for-bit (the HF
    parity, TP-equality, and remat-equality tests all ride this class).
    int8 kernels route through :func:`ops.gemv.qdot`: decode-shaped calls
    stream the stored int8 through the Pallas GEMV (per-token HBM read =
    stored bytes), wide calls (prefill/offline) run the same math on the
    XLA path (``gemv.matmul_reference``: bf16 dot, f32 scale-after).
    """

    @nn.compact
    def __call__(self, inputs: jax.Array) -> jax.Array:
        kernel = self.param("kernel", self.kernel_init,
                            (jnp.shape(inputs)[-1], self.features),
                            self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        return _dense_apply(inputs, kernel, bias, self.dtype)


def _dense_apply(inputs: jax.Array, kernel, bias, dtype) -> jax.Array:
    """The QDense math on raw leaves (shared with GPT2Block's MLP pair)."""
    if is_qleaf(kernel):
        y = qdot(inputs, kernel, dtype or jnp.float32)
        return y if bias is None else y + bias.astype(y.dtype)
    inputs, kernel, bias = nn.dtypes.promote_dtype(
        inputs, kernel, bias, dtype=dtype)
    y = jax.lax.dot_general(
        inputs, kernel, (((inputs.ndim - 1,), (0,)), ((), ())))
    if bias is not None:
        y += jnp.reshape(bias, (1,) * (y.ndim - 1) + (-1,))
    return y


class _QParams(nn.Module):
    """Kernel+bias holder with ``nn.Dense``'s exact param names, shapes,
    inits, and dtypes — GPT2Block's MLP declares its params through these
    (scope names ``mlp_c_fc``/``mlp_c_proj`` keep every checkpoint/TP-spec
    path identical to the QDense modules they replace) but computes on the
    raw leaves so the decode-shaped int8 pair can take ONE fused kernel."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        return kernel, bias


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    name: str = "gpt2"
    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12


GPT2_CONFIGS = {c.name: c for c in [
    GPT2Config("gpt2"),
    GPT2Config("gpt2-medium", n_embd=1024, n_layer=24, n_head=16),
    GPT2Config("gpt2-large", n_embd=1280, n_layer=36, n_head=20),
    GPT2Config("gpt2-xl", n_embd=1600, n_layer=48, n_head=25),
    GPT2Config("test-gpt", vocab_size=512, n_positions=96, n_embd=32, n_layer=2, n_head=2),
    # mega-legal tiny config (decode megakernel needs 128-multiple widths):
    # exercises the one-launch-per-token path on CPU interpret
    GPT2Config("test-gpt-mega", vocab_size=512, n_positions=512, n_embd=256,
               n_layer=2, n_head=4),
]}


def _gelu_tanh(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=True)


class GPT2Attention(nn.Module):
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, cache: tp.Optional[dict] = None,
                 key_pad: tp.Optional[jax.Array] = None
                 ) -> tp.Tuple[jax.Array, tp.Optional[dict]]:
        d = x.shape[-1]
        qkv = QDense(3 * d, dtype=self.dtype, name="c_attn")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        if cache is None:
            o = multi_head_attention(q, k, v, num_heads=self.num_heads, causal=True)
            new_cache = None
        else:
            # incremental decode: x is (B, S_new, D); cache holds (B, T, D).
            # ``index`` is a scalar (all rows append at the same slot — the
            # generate/batched-generate paths) or a (B,) array (per-row
            # rings — the continuous-batching serving engine, where each
            # slot admits/finishes requests independently and slot reuse
            # needs no cache zeroing: stale K/V beyond a row's index are
            # causally masked).
            idx = cache["index"]
            t = cache["k"].shape[1]
            s_new = q.shape[1]
            kc = k.astype(cache["k"].dtype)
            vc = v.astype(cache["v"].dtype)
            if getattr(idx, "ndim", 0) == 1:
                upd = jax.vmap(
                    lambda buf, new, i: jax.lax.dynamic_update_slice(buf, new, (i, 0)))
                k_all = upd(cache["k"], kc, idx)
                v_all = upd(cache["v"], vc, idx)
                q_pos = (idx[:, None, None]
                         + jax.lax.broadcasted_iota(jnp.int32, (s_new, t), 0)[None])
                k_pos = jax.lax.broadcasted_iota(jnp.int32, (s_new, t), 1)[None]
                mask = jnp.where(k_pos <= q_pos, 0.0, -1e30).astype(jnp.float32)
                mask = mask[:, None]  # (B, 1, S_new, T) — broadcast over heads
            else:
                k_all = jax.lax.dynamic_update_slice(cache["k"], kc, (0, idx, 0))
                v_all = jax.lax.dynamic_update_slice(cache["v"], vc, (0, idx, 0))
                q_pos = idx + jax.lax.broadcasted_iota(jnp.int32, (s_new, t), 0)
                k_pos = jax.lax.broadcasted_iota(jnp.int32, (s_new, t), 1)
                mask = jnp.where(k_pos <= q_pos, 0.0, -1e30).astype(jnp.float32)
            if key_pad is not None:
                # batched left-padded prompts: the first key_pad[b] cache
                # slots of row b are padding and must never be attended
                pad_mask = jnp.where(jnp.arange(t)[None, :] < key_pad[:, None],
                                     -1e30, 0.0).astype(jnp.float32)
                if mask.ndim == 2:
                    mask = mask[None, None]
                mask = mask + pad_mask[:, None, None, :]
            o = multi_head_attention(q, k_all, v_all, num_heads=self.num_heads,
                                     mask=mask, use_flash=False)
            new_cache = {"k": k_all, "v": v_all, "index": idx + s_new}
        return QDense(d, dtype=self.dtype, name="c_proj")(o), new_cache


class GPT2Block(nn.Module):
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cache=None, key_pad=None):
        h, new_cache = GPT2Attention(self.num_heads, dtype=self.dtype, name="attn")(
            LayerNormF32(name="ln_1")(x), cache, key_pad)
        x = x + h
        d = x.shape[-1]
        k1, b1 = _QParams(4 * d, name="mlp_c_fc")(d)
        k2, b2 = _QParams(d, name="mlp_c_proj")(4 * d)
        u = LayerNormF32(name="ln_2")(x)
        # decode-shaped int8 pair: fc+gelu+proj in ONE kernel launch, the
        # hidden never leaves VMEM (ops/gemv.qmlp; None -> unfused pair)
        m = qmlp(u, k1, b1, k2, b2, self.dtype)
        if m is None:
            m = _dense_apply(_gelu_tanh(_dense_apply(u, k1, b1, self.dtype)),
                             k2, b2, self.dtype)
        return x + m, new_cache


class GPT2Core(nn.Module):
    """Positional embedding + blocks + final LN (no token embedding).

    ``remat=True`` rematerializes each block on the backward pass
    (``jax.checkpoint`` per layer) — trades ~1/3 extra forward FLOPs for
    O(layers) less activation HBM, which is what lets gpt2-large (36 x 1280)
    train at ctx 1024 on one 16GB chip. Only applies to the training path
    (``cache=None``); incremental decode never differentiates.
    """

    config: GPT2Config
    dtype: Dtype = jnp.float32
    remat: bool = False
    # jax.checkpoint policy name for the per-block remat (None = recompute
    # everything). "dots": keep matmul outputs resident and recompute only
    # the cheap elementwise/LN chain — spends more HBM to cut the backward's
    # recompute FLOPs, worthwhile when activation memory isn't the binding
    # constraint (e.g. adapter-only gpt2-large at b=8).
    remat_policy: tp.Optional[str] = None

    @nn.compact
    def __call__(self, inputs_embeds: jax.Array, position_offset: tp.Union[int, jax.Array] = 0,
                 cache: tp.Optional[tp.List[dict]] = None,
                 key_pad: tp.Optional[jax.Array] = None
                 ) -> tp.Tuple[jax.Array, tp.Optional[tp.List[dict]]]:
        cfg = self.config
        b, t, _ = inputs_embeds.shape
        wpe = self.param("wpe", nn.initializers.normal(0.01),
                         (cfg.n_positions, cfg.n_embd), jnp.float32)
        # position_offset may be a (B, 1) array (batched left-padded decode:
        # per-row offsets). Clamp explicitly: jnp.take's default mode WRAPS
        # negative indices and NaN-fills out-of-range ones — pad slots get
        # position 0 (their K/V are key_pad-masked anyway) and over-length
        # decodes saturate at the last position instead of going NaN.
        positions = jnp.clip(position_offset + jnp.arange(t), 0, cfg.n_positions - 1)
        # gather_rows: wpe may be an int8 {"q","scale"} leaf on the quantized
        # decode path — read the gathered rows, never the widened table
        x = inputs_embeds.astype(self.dtype) + gather_rows(wpe, positions).astype(self.dtype)
        new_caches = [] if cache is not None else None
        policy = (jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                  if self.remat_policy == "dots" else None)
        block_cls = (nn.remat(GPT2Block, prevent_cse=False, policy=policy)
                     if (self.remat and cache is None) else GPT2Block)
        for i in range(cfg.n_layer):
            layer_cache = cache[i] if cache is not None else None
            x, nc = block_cls(cfg.n_head, dtype=self.dtype, name=f"h_{i}")(x, layer_cache, key_pad)
            if new_caches is not None:
                new_caches.append(nc)
        x = LayerNormF32(name="ln_f")(x)
        return x, new_caches


class GPT2(nn.Module):
    """GPT-2 LM with tied input/output embeddings."""

    config: GPT2Config
    dtype: Dtype = jnp.float32
    remat: bool = False
    remat_policy: tp.Optional[str] = None

    def setup(self):
        self.wte = nn.Embed(self.config.vocab_size, self.config.n_embd,
                            embedding_init=nn.initializers.normal(0.02),
                            param_dtype=jnp.float32, name="wte")
        self.core = GPT2Core(self.config, dtype=self.dtype, remat=self.remat,
                             remat_policy=self.remat_policy, name="core")

    def init_cache(self, batch: int, max_len: int) -> tp.List[dict]:
        cfg = self.config
        return [{"k": jnp.zeros((batch, max_len, cfg.n_embd), self.dtype),
                 "v": jnp.zeros((batch, max_len, cfg.n_embd), self.dtype),
                 "index": jnp.asarray(0, jnp.int32)} for _ in range(cfg.n_layer)]

    def __call__(self, input_ids: tp.Optional[jax.Array] = None,
                 inputs_embeds: tp.Optional[jax.Array] = None,
                 position_offset: tp.Union[int, jax.Array] = 0,
                 cache: tp.Optional[tp.List[dict]] = None,
                 key_pad: tp.Optional[jax.Array] = None):
        if inputs_embeds is None:
            inputs_embeds = gather_rows(self.wte.embedding, input_ids)
        h, new_cache = self.core(inputs_embeds, position_offset, cache, key_pad)
        table = self.wte.embedding
        if is_qleaf(table):  # tied head off a quantized wte: scale per vocab row
            logits = qdot(h, {"q": table["q"].T, "scale": table["scale"].T},
                          jnp.float32)
        else:
            logits = jnp.dot(h, table.T.astype(h.dtype),
                             preferred_element_type=jnp.float32)
        return {"logits": logits, "hidden": h, "cache": new_cache}


def build_gpt2(name: str, dtype=jnp.float32) -> tp.Tuple[GPT2, GPT2Config]:
    cfg = GPT2_CONFIGS[name]
    return GPT2(cfg, dtype=dtype), cfg


# ---------------------------------------------------------------------------
# ClipGPT
# ---------------------------------------------------------------------------

class Adapter(nn.Module):
    """ReLU bottleneck bridge (reference gpt.py:13-26): Dense-ReLU-Dense-ReLU."""

    hid_dim: int
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.relu(QDense(self.hid_dim, use_bias=False, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(QDense(self.out_dim, use_bias=False, dtype=self.dtype, name="fc2")(x))
        return x


class ClipGPT(nn.Module):
    """GPT-2 whose token space is CLIP's 49,408-token vocabulary.

    input path:  clip_emb[ids] -> emb adapter -> gpt core
    output path: hidden @ (head adapter(clip_emb)).T
    ``share_head_adapter`` mirrors the reference's ``head_hid_dim: null``
    (head adapter == emb adapter).
    """

    config: GPT2Config
    clip_vocab_size: int = 49408
    clip_emb_dim: int = 512
    emb_hid_dim: int = 1024
    head_hid_dim: tp.Optional[int] = 1024
    dtype: Dtype = jnp.float32
    remat: bool = False
    remat_policy: tp.Optional[str] = None

    def setup(self):
        self.clip_emb = self.param("clip_emb", nn.initializers.normal(0.02),
                                   (self.clip_vocab_size, self.clip_emb_dim), jnp.float32)
        self.adapter_emb = Adapter(self.emb_hid_dim, self.config.n_embd,
                                   dtype=self.dtype, name="adapter_emb")
        if self.head_hid_dim is not None:
            self.adapter_head = Adapter(self.head_hid_dim, self.config.n_embd,
                                        dtype=self.dtype, name="adapter_head")
        else:
            self.adapter_head = self.adapter_emb
        self.core = GPT2Core(self.config, dtype=self.dtype, remat=self.remat,
                             remat_policy=self.remat_policy, name="core")

    def embed(self, input_ids: jax.Array) -> jax.Array:
        """CLIP-space token embeddings (pre-adapter). ``clip_emb`` may be an
        int8 {"q","scale"} leaf (per-row scales) on the quantized decode
        path — gather rows as stored."""
        return gather_rows(self.clip_emb, input_ids)

    def adapt_embeds(self, clip_space_embeds: jax.Array) -> jax.Array:
        """CLIP-space -> GPT-space (the GPTEmbed path, prompt_learner.py:10-17)."""
        return self.adapter_emb(clip_space_embeds.astype(self.dtype))

    def lm_head_table(self) -> jax.Array:
        emb = self.clip_emb
        if is_qleaf(emb):
            emb = emb["q"].astype(jnp.float32) * emb["scale"]
        return self.adapter_head(emb.astype(self.dtype))

    def __call__(self, input_ids: tp.Optional[jax.Array] = None,
                 inputs_embeds: tp.Optional[jax.Array] = None,
                 position_offset: tp.Union[int, jax.Array] = 0,
                 cache: tp.Optional[tp.List[dict]] = None,
                 key_pad: tp.Optional[jax.Array] = None):
        """``inputs_embeds`` are CLIP-space embeddings (adapter applied here)."""
        if inputs_embeds is None:
            inputs_embeds = self.embed(input_ids)
        x = self.adapt_embeds(inputs_embeds)
        h, new_cache = self.core(x, position_offset, cache, key_pad)
        logits = jnp.dot(h, self.lm_head_table().T, preferred_element_type=jnp.float32)
        return {"logits": logits, "hidden": h, "cache": new_cache}

    def init_cache(self, batch: int, max_len: int) -> tp.List[dict]:
        cfg = self.config
        return [{"k": jnp.zeros((batch, max_len, cfg.n_embd), self.dtype),
                 "v": jnp.zeros((batch, max_len, cfg.n_embd), self.dtype),
                 "index": jnp.asarray(0, jnp.int32)} for _ in range(cfg.n_layer)]


def clip_gpt_trainable_mask(path: tp.Tuple, leaf=None) -> bool:
    """Adapters-only training (reference ClipGPT._is_train_param, gpt.py:94-96)."""
    names = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
    return any(n.startswith("adapter_") for n in names)


def clip_gpt_full_trainable_mask(path: tp.Tuple, leaf=None) -> bool:
    """Everything except the token-embedding tables (reference ClipGPTFull,
    gpt.py:124-127 — positional embeddings DO train)."""
    names = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
    return not any(n in ("clip_emb", "wte") for n in names)


# ---------------------------------------------------------------------------
# HF conversion
# ---------------------------------------------------------------------------

def convert_hf_gpt2(sd: tp.Mapping[str, tp.Any], n_layer: int) -> dict:
    """HF transformers GPT2LMHeadModel state dict -> {'params': ...}.

    HF Conv1D stores weights as (in, out) — no transpose needed for Flax
    Dense kernels; LayerNorm weight/bias map to scale/bias.
    """
    def A(key):
        t = sd[key]
        if hasattr(t, "detach"):
            t = t.detach().cpu().float().numpy()
        # copy: torch's .numpy() SHARES storage — without it, later mutation
        # of the torch model would silently alias the converted params
        return np.array(t, np.float32, copy=True)

    def pfx(key):  # both `transformer.*` and bare layouts appear in the wild
        return key if key in sd else f"transformer.{key}"

    core: dict = {
        "wpe": A(pfx("wpe.weight")),
        "ln_f": {"scale": A(pfx("ln_f.weight")), "bias": A(pfx("ln_f.bias"))},
    }
    for i in range(n_layer):
        p = pfx(f"h.{i}.ln_1.weight").rsplit(".ln_1", 1)[0]
        core[f"h_{i}"] = {
            "ln_1": {"scale": A(f"{p}.ln_1.weight"), "bias": A(f"{p}.ln_1.bias")},
            "ln_2": {"scale": A(f"{p}.ln_2.weight"), "bias": A(f"{p}.ln_2.bias")},
            "attn": {
                "c_attn": {"kernel": A(f"{p}.attn.c_attn.weight"), "bias": A(f"{p}.attn.c_attn.bias")},
                "c_proj": {"kernel": A(f"{p}.attn.c_proj.weight"), "bias": A(f"{p}.attn.c_proj.bias")},
            },
            "mlp_c_fc": {"kernel": A(f"{p}.mlp.c_fc.weight"), "bias": A(f"{p}.mlp.c_fc.bias")},
            "mlp_c_proj": {"kernel": A(f"{p}.mlp.c_proj.weight"), "bias": A(f"{p}.mlp.c_proj.bias")},
        }
    return {"params": {"wte": {"embedding": A(pfx("wte.weight"))}, "core": core}}
