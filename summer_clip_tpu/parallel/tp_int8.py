"""Megatron-TP composition for the stored-int8 decode path (round 5).

The bf16 TP decode rides GSPMD (committed placements, ``parallel/tp.py``):
the jitted program is placement-agnostic and XLA inserts the collectives.
The int8 tree cannot: its decode-shaped matmuls stream through a Pallas
GEMV (``ops/gemv.qdot``), which GSPMD will not partition — so round 4's
engine refused the combination outright (``engine/serving.py`` assert).

Here the composition is EXPLICIT SPMD:

- the int8 weight slabs and their per-output-column scales shard
  Megatron-style over the ``model`` axis — column-parallel
  ``c_attn``/``mlp_c_fc`` (with the fused qkv columns PERMUTED so each
  shard's contiguous slice is ``[q_s | k_s | v_s]`` — a contiguous split
  of the raw ``[q | k | v]`` concat would hand shard 0 all of q), and
  row-parallel ``c_proj``/``mlp_c_proj`` (scales replicated: they index
  OUTPUT columns, which row-parallel keeps whole),
- a pure-function decode forward runs inside ``shard_map``: each chip
  streams ITS OWN int8 shard through the Pallas GEMV (per-chip HBM read
  per token = stored bytes / tp), attention runs on the chip's local
  heads against its local KV-cache shard, and the row-parallel partial
  outputs ``psum`` over ICI (biases added once, after the reduce),
- :class:`TPInt8Decoder` duck-types the Flax model's decode ``apply()``
  — token ids or CLIP-space embeds in, ``{"logits", "hidden", "cache"}``
  out, scalar or per-row cache indices, ``key_pad`` masking — so the
  samplers (``gen_gpt``) and the serving engine compose unchanged.

Cache semantics mirror ``models/gpt2.py:GPT2Attention`` exactly (same
masks, same update slices); the non-sharded math is ``qdot``'s, so at
``tp=1`` the forward is the standard int8 decode bit-for-bit.

Reference seam: the reference's distributed-ready accelerate config
(``conf/accelerate/cfg_v1.yaml``; SURVEY §2.9 TP row).
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from summer_clip_tpu.ops.attention import multi_head_attention
from summer_clip_tpu.ops.gemv import gather_rows, is_qleaf, qdot

__all__ = ["permute_qkv_columns", "shard_decode_tp_int8", "TPInt8Decoder",
           "tp_int8_decoder"]


def _qkv_perm(d: int, tp_size: int) -> np.ndarray:
    """Column permutation of a fused (.., 3D) qkv matrix so that the
    contiguous per-shard slice s holds ``[q_s | k_s | v_s]``."""
    dl = d // tp_size
    perm = []
    for s in range(tp_size):
        for part in range(3):                   # q, k, v blocks
            base = part * d + s * dl
            perm.extend(range(base, base + dl))
    return np.asarray(perm, np.int64)


def permute_qkv_columns(leaf, d: int, tp_size: int):
    """Apply the qkv shard permutation to a kernel leaf (int8 dict or
    plain array) or a 1-D bias."""
    perm = _qkv_perm(d, tp_size)
    if is_qleaf(leaf):
        return {"q": leaf["q"][..., perm], "scale": leaf["scale"][..., perm]}
    return leaf[..., perm]


def _tp_int8_spec(path, leaf) -> P:
    """PartitionSpec for one decode-tree leaf (int8 dicts appear as their
    ``q``/``scale`` sub-leaves). Megatron layout, gemv-aware scales."""
    names = []
    for part in path:
        names.append(str(getattr(part, "key", getattr(part, "name", part))))
    col = any(n in ("c_attn", "mlp_c_fc") for n in names)
    row = any(n in ("c_proj", "mlp_c_proj") for n in names)
    leafname = names[-1] if names else ""
    nd = getattr(leaf, "ndim", 0)
    if col:
        if leafname in ("q", "kernel") and nd == 2:
            return P(None, "model")
        if leafname == "scale" and nd == 2:
            return P(None, "model")
        if leafname == "bias":
            return P("model")
    if row:
        if leafname in ("q", "kernel") and nd == 2:
            return P("model", None)
        # row-parallel scales index OUTPUT columns -> replicated; biases
        # are added ONCE after the psum -> replicated
    return P()


def shard_decode_tp_int8(variables: tp.Mapping, cache: tp.List[dict],
                         mesh: Mesh):
    """Commit the int8 decode tree + KV cache to Megatron placements.

    Returns ``(variables, cache)`` with c_attn/mlp_c_fc column-sharded
    (qkv columns pre-permuted per shard), c_proj/mlp_c_proj row-sharded,
    everything else replicated, and cache ``k``/``v`` sharded on the
    embedding dim. The specs double as :class:`TPInt8Decoder`'s shard_map
    in_specs — keep them in sync via :func:`_tp_int8_spec`.
    """
    tp_size = mesh.shape["model"]
    params = variables["params"]

    def prep(path, leaf):
        names = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        if any(n == "c_attn" for n in names) and names[-1] in ("kernel", "bias"):
            arr = leaf["q"] if is_qleaf(leaf) else leaf
            return permute_qkv_columns(leaf, arr.shape[-1] // 3, tp_size)
        return leaf

    # permute at the DICT level (kernel leaves may be {"q","scale"})
    params = jax.tree_util.tree_map_with_path(prep, params,
                                              is_leaf=is_qleaf)
    shardings = jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _tp_int8_spec(path, leaf)),
        params)
    vars_sh = dict(variables, params=jax.device_put(params, shardings))
    kvs = NamedSharding(mesh, P(None, None, "model"))
    repl = NamedSharding(mesh, P())
    cache_sh = [{"k": jax.device_put(c["k"], kvs),
                 "v": jax.device_put(c["v"], kvs),
                 "index": jax.device_put(c["index"], repl)} for c in cache]
    return vars_sh, cache_sh


def _ln(x: jax.Array, p: tp.Mapping) -> jax.Array:
    """LayerNormF32 math (models/clip/modeling.py) on raw leaves."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    return (y * p["scale"] + p["bias"]).astype(dtype)


def _bias(y: jax.Array, b: tp.Optional[jax.Array]) -> jax.Array:
    return y if b is None else y + jnp.reshape(b, (1,) * (y.ndim - 1) + (-1,))


def _attn_cached(q, k, v, cache, key_pad, nh_local):
    """GPT2Attention's incremental-decode math (models/gpt2.py) on the
    LOCAL head shard: same masks, same update slices, per-row or scalar
    ring indices."""
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
        mask = mask[:, None]
    else:
        k_all = jax.lax.dynamic_update_slice(cache["k"], kc, (0, idx, 0))
        v_all = jax.lax.dynamic_update_slice(cache["v"], vc, (0, idx, 0))
        q_pos = idx + jax.lax.broadcasted_iota(jnp.int32, (s_new, t), 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (s_new, t), 1)
        mask = jnp.where(k_pos <= q_pos, 0.0, -1e30).astype(jnp.float32)
    if key_pad is not None:
        pad_mask = jnp.where(jnp.arange(t)[None, :] < key_pad[:, None],
                             -1e30, 0.0).astype(jnp.float32)
        if mask.ndim == 2:
            mask = mask[None, None]
        mask = mask + pad_mask[:, None, None, :]
    o = multi_head_attention(q, k_all, v_all, num_heads=nh_local,
                             mask=mask, use_flash=False)
    return o, {"k": k_all, "v": v_all, "index": idx + s_new}


def _core_forward_local(cfg, nh_local: int, core, x, positions, cache,
                        key_pad):
    """One decode forward on THIS chip's shard (runs inside shard_map):
    replicated residual stream, local qkv/attention/fc, psum after each
    row-parallel matmul."""
    x = x + gather_rows(core["wpe"], positions).astype(x.dtype)
    new_cache = []
    for i in range(cfg.n_layer):
        blk = core[f"h_{i}"]
        u = _ln(x, blk["ln_1"])
        qkv = _bias(qdot(u, blk["attn"]["c_attn"]["kernel"], jnp.float32),
                    blk["attn"]["c_attn"]["bias"])       # (B, S, 3*Dl)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        o, nc = _attn_cached(q, k, v, cache[i], key_pad, nh_local)
        new_cache.append(nc)
        proj = qdot(o, blk["attn"]["c_proj"]["kernel"], jnp.float32)
        proj = jax.lax.psum(proj, "model")               # row-parallel reduce
        x = x + _bias(proj, blk["attn"]["c_proj"]["bias"])
        u2 = _ln(x, blk["ln_2"])
        h = jax.nn.gelu(_bias(qdot(u2, blk["mlp_c_fc"]["kernel"], jnp.float32),
                              blk["mlp_c_fc"]["bias"]), approximate=True)
        m = jax.lax.psum(qdot(h, blk["mlp_c_proj"]["kernel"], jnp.float32),
                         "model")
        x = x + _bias(m, blk["mlp_c_proj"]["bias"])
    return _ln(x, core["ln_f"]), new_cache


class TPInt8Decoder:
    """Drop-in decode ``apply`` for an int8 GPT tree sharded over a TP mesh.

    Wraps a GPT2/ClipGPT instance: embeddings/adapters/logits run on
    replicated leaves outside shard_map; the block stack runs per-shard
    (local int8 GEMV streams + psum). Duck-types the surfaces the
    samplers and the serving engine touch: ``config``, ``init_cache``,
    ``apply(variables, ids|inputs_embeds, position_offset=, cache=,
    key_pad=, method=)``.
    """

    def __init__(self, model, mesh: Mesh):
        from summer_clip_tpu.parallel.tp import check_tp_divisibility

        self.model = model
        self.config = model.config
        self.mesh = mesh
        tp_size = mesh.shape["model"]
        check_tp_divisibility(self.config.n_embd, self.config.n_head, tp_size)
        self.nh_local = self.config.n_head // tp_size

    # -- duck-typed Flax surfaces ---------------------------------------------

    def init_cache(self, batch: int, max_len: int):
        cfg = self.config
        return [{"k": jnp.zeros((batch, max_len, cfg.n_embd), jnp.float32),
                 "v": jnp.zeros((batch, max_len, cfg.n_embd), jnp.float32),
                 "index": jnp.asarray(0, jnp.int32)} for _ in range(cfg.n_layer)]

    def apply(self, variables, *args, method=None, **kwargs):
        if method is not None:
            if getattr(method, "__self__", None) is self:
                return method(*args, **kwargs)  # e.g. self.init_cache
            # model-level helpers touch only replicated leaves (embed,
            # adapt_embeds, lm_head_table)
            return self.model.apply(variables, *args, method=method, **kwargs)
        return self._forward(variables, *args, **kwargs)

    # -- forward ---------------------------------------------------------------

    def _forward(self, variables, input_ids=None, inputs_embeds=None,
                 position_offset: tp.Union[int, jax.Array] = 0,
                 cache=None, key_pad=None):
        from summer_clip_tpu.models import gpt2 as gpt2_mod

        assert cache is not None, "TPInt8Decoder is a decode path (cache required)"
        cfg = self.config
        params = variables["params"]
        is_clip = isinstance(self.model, gpt2_mod.ClipGPT)
        if is_clip:
            if inputs_embeds is None:
                inputs_embeds = self.model.apply(variables, input_ids,
                                                 method=self.model.embed)
            x = self.model.apply(variables, inputs_embeds,
                                 method=self.model.adapt_embeds)
        else:
            x = (inputs_embeds if inputs_embeds is not None
                 else gather_rows(params["wte"]["embedding"], input_ids))
        x = x.astype(jnp.float32)
        t_new = x.shape[1]
        positions = jnp.clip(position_offset + jnp.arange(t_new), 0,
                             cfg.n_positions - 1)

        core_specs = jax.tree_util.tree_map_with_path(
            lambda path, leaf: _tp_int8_spec(("core",) + tuple(path), leaf),
            params["core"])
        cache_spec = [{"k": P(None, None, "model"), "v": P(None, None, "model"),
                       "index": P()} for _ in range(cfg.n_layer)]
        has_pad = key_pad is not None

        def local(core, xv, pos, cachev, *pad):
            return _core_forward_local(cfg, self.nh_local, core, xv, pos,
                                       cachev, pad[0] if pad else None)

        in_specs = (core_specs, P(), P(), cache_spec) + ((P(),) if has_pad else ())
        fn = shard_map(local, mesh=self.mesh, in_specs=in_specs,
                       out_specs=(P(), cache_spec), check_vma=False)
        args = (params["core"], x, positions, cache) + (
            (jnp.asarray(key_pad, jnp.int32),) if has_pad else ())
        h, new_cache = fn(*args)

        # logits on the replicated hidden (same math as the Flax models)
        if is_clip:
            table = self.model.apply(variables, method=self.model.lm_head_table)
            logits = jnp.dot(h, table.T, preferred_element_type=jnp.float32)
        else:
            table = params["wte"]["embedding"]
            if is_qleaf(table):
                logits = qdot(h, {"q": table["q"].T, "scale": table["scale"].T},
                              jnp.float32)
            else:
                logits = jnp.dot(h, table.T.astype(h.dtype),
                                 preferred_element_type=jnp.float32)
        return {"logits": logits, "hidden": h, "cache": new_cache}


@functools.lru_cache(maxsize=8)
def tp_int8_decoder(model, mesh: Mesh) -> TPInt8Decoder:
    """Memoized wrapper: the samplers/engine lru_cache their jitted
    programs on the model object, so the decoder must be stable per
    (model, mesh) or every call would retrace."""
    return TPInt8Decoder(model, mesh)
