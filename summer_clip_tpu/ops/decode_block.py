"""Single-launch GPT-2 decode megakernel (Pallas, TPU) — batched streams.

The unfused int8 decode path runs 4 streamed-GEMV launches per layer plus
XLA attention — 144 sequential Pallas calls at gpt2-large, whose ~6 us
fixed per-call cost is the single largest residual over the int8
weight-read floor (measured attribution: docs/KERNELS.md round-3 GEMV
section; the chain ran 1.714 ms against a 0.86 ms floor). This module runs
the ENTIRE 36-layer block stack for one token of up to EIGHT independent
decode streams in ONE ``pallas_call``:

- the grid is ``(layer, stage)``; weight stages walk contraction-dim
  chunks of each matrix, so every DMA is a contiguous row-slab of the
  weight in its ORIGINAL (K, N) orientation — no transposed storage, no
  strided reads (the failure mode that sank the fused-MLP attempt),
- activations live in VMEM scratch across the whole grid (residual
  stream, LN outputs, qkv, MLP hidden): nothing round-trips HBM between
  layers. The activation tile is one (8, 128) f32 sublane tile — so up
  to 8 DECODE STREAMS ride the same weight DMA and the same MXU ops that
  one stream pays for alone (round-4 measured the single-stream wall as
  weight ingest; batching is the amortization lever, VERDICT r4 #1),
- attention is per-stream: each stream owns a KV cache ring
  (``kv`` axis 1) and walks its T-chunks flash-style with an online
  softmax, against int8 K/V with per-row (per-token) scales. Chunks at
  or beyond a stream's fill index are neither fetched (the index map
  clamps to the last live chunk — Pallas skips the DMA when the block
  index repeats) nor computed (``pl.when`` on the same bound),
- per-stream left-pad masking (``pad``): rows below ``pad[b]`` of stream
  b's cache are bucket padding and are never attended — the same
  ``key_pad`` contract as the batched XLA decode path,
- per-layer weight chunks stagger their first fetch to the stage right
  before use (index maps hold the previous layer's last chunk), so layer
  boundaries don't pile six DMAs into one pipeline step.

Per-step HBM traffic = stored weight bytes (ONCE, amortized over all
streams) + each stream's live KV rows + scales.

Head-count trick: per-head score/value routing uses two MXU-friendly
matmuls instead of head reshapes — scores ``(T, 128) = K @ q_bd`` where
``q_bd[d, h] = q[d] * [d // hd == h] / sqrt(hd)``, and the probs expand
back to model width via ``E (128, D)``, ``E[h, d] = [d // hd == h]``.

Reference hot loop this serves: the decode phase of
``summer_clip/clip_prompt/gen_gpt.py`` (HF ``generate`` on gpt2-large) at
production batch sizes. Every public entry has an XLA oracle
(:func:`decode_block_reference`) with the kernel's exact math; tests run
the kernel in interpret mode on CPU against it, per stream.
"""

from __future__ import annotations

import dataclasses
import functools
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from summer_clip_tpu.ops.gemv import is_qleaf

__all__ = ["MegaPlan", "plan_for", "mega_legal", "pack_core_params",
           "init_mega_kv", "cache_to_mega", "mega_update_kv",
           "decode_block", "decode_block_reference"]

_ROWS = 8           # padded activation rows (one f32 sublane tile)
_TC = 256           # KV pad granule (plan_for picks the largest chunk <= t)
_CHUNK_CAP = 4 * 1024 * 1024  # per-weight-slab stored-byte cap (VMEM budget)
_NEG = -1e30


def _chunk(k_dim: int, n_dim: int, itemsize: int) -> int:
    """Largest contraction-chunk c: c | k_dim, 128 | c (the matching
    activation lane-slice must land on lane tiles), stored slab <= cap."""
    best = 0
    for c in range(128, k_dim + 1, 128):
        if k_dim % c == 0 and c * n_dim * itemsize <= _CHUNK_CAP:
            best = c
    return best if best else (128 if k_dim % 128 == 0 else 0)


def mega_legal(d: int, h: int, nh: int) -> bool:
    """Geometry the kernel supports: tile-legal widths, <=128 heads, and an
    integer head dim (gpt2/medium/large all pass; xl's D=1600 does not)."""
    return (d % 128 == 0 and h % 128 == 0 and d % nh == 0 and nh <= 128
            and _chunk(d, 3 * d, 1) > 0 and _chunk(h, d, 1) > 0)


@dataclasses.dataclass(frozen=True)
class MegaPlan:
    """Static stage schedule for one (geometry, cache length, batch)."""

    n_layer: int
    d: int
    h: int
    nh: int
    t: int
    ckq: int    # qkv contraction chunk (rows of (D, 3D))
    ckp: int    # proj chunk
    ck1: int    # mlp fc chunk (rows of (D, H))
    ck2: int    # mlp proj chunk (rows of (H, D))
    tc: int     # KV T-chunk
    nb: int = 1  # live decode streams (<= _ROWS; attention is per-stream)
    batt: bool = False  # batched attention: ONE stage per KV chunk loads
    #                   ALL streams' (nb, tc, d) blocks in one DMA and
    #                   loops streams in-stage (same math, same order —
    #                   bitwise equal); kills the per-stream stage DMAs
    #                   that dominate short-ring serving (~127us/stream,
    #                   docs/KERNELS.md round-5 attribution)

    @property
    def nq(self) -> int: return self.d // self.ckq

    @property
    def nat(self) -> int: return self.t // self.tc

    @property
    def n_att(self) -> int:
        return self.nat if self.batt else self.nb * self.nat

    @property
    def npj(self) -> int: return self.d // self.ckp

    @property
    def n1(self) -> int: return self.d // self.ck1

    @property
    def n2(self) -> int: return self.h // self.ck2

    # stage offsets: [qkv][attention stages][proj][mlp fc][mlp proj]
    @property
    def s_att(self) -> int: return self.nq

    @property
    def s_proj(self) -> int: return self.nq + self.n_att

    @property
    def s_fc(self) -> int: return self.s_proj + self.npj

    @property
    def s_out(self) -> int: return self.s_fc + self.n1

    @property
    def stages(self) -> int: return self.s_out + self.n2


def plan_for(n_layer: int, d: int, h: int, nh: int, t: int,
             itemsize: int, nb: int = 1) -> MegaPlan:
    import os

    assert mega_legal(d, h, nh), (d, h, nh)
    assert t % _TC == 0, f"cache length {t} must be a multiple of {_TC}"
    assert 1 <= nb <= _ROWS, nb
    # tuning knobs (tools/bench_megadecode.py sweeps them; defaults are the
    # measured-best on v5e at gpt2-large geometry — docs/KERNELS.md)
    global _CHUNK_CAP
    cap = int(os.environ.get("MEGA_CHUNK_CAP", _CHUNK_CAP))
    old, _CHUNK_CAP = _CHUNK_CAP, cap
    try:
        # largest KV T-chunk that divides t (512 measured best at t=1024;
        # shorter caches fall back so padding never grows past _TC)
        tc = int(os.environ.get("MEGA_TC", 0)) or \
            next(c for c in (512, 256, 128) if t % c == 0)
        if t % tc != 0:
            tc = next(c for c in (512, 256, 128) if t % c == 0)
        batt = nb > 1 and os.environ.get("MEGA_BATT", "1") == "1"
        return MegaPlan(n_layer, d, h, nh, t,
                        ckq=_chunk(d, 3 * d, itemsize),
                        ckp=_chunk(d, d, itemsize),
                        ck1=_chunk(d, h, itemsize),
                        ck2=_chunk(h, d, itemsize),
                        tc=tc, nb=nb, batt=batt)
    finally:
        _CHUNK_CAP = old


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------

def _stored(leaf, store: str):
    """(values, scale_row) in the requested storage for one (K, N) kernel
    leaf; int8 leaves pass through as quantized (engine/quant layout)."""
    if is_qleaf(leaf):
        if store == "int8":
            return leaf["q"], leaf["scale"].reshape(1, -1)
        wide = leaf["q"].astype(jnp.float32) * leaf["scale"]
        return wide.astype(jnp.bfloat16), jnp.ones((1, wide.shape[-1]), jnp.float32)
    if store == "int8":
        amax = jnp.max(jnp.abs(leaf), axis=tuple(range(leaf.ndim - 1)),
                       keepdims=True)
        scale = jnp.maximum(amax, 1e-12) / 127.0
        q = jnp.clip(jnp.round(leaf / scale), -127, 127).astype(jnp.int8)
        return q, scale.astype(jnp.float32).reshape(1, -1)
    return (leaf.astype(jnp.bfloat16),
            jnp.ones((1, leaf.shape[-1]), jnp.float32))


def pack_core_params(core: tp.Mapping, n_layer: int, *,
                     store: str = "int8") -> tp.Dict[str, jax.Array]:
    """Stack GPT2Core block params into the megakernel layout.

    ``core`` is ``params["core"]`` (GPT2/ClipGPT); weight leaves may be
    plain f32/bf16 or int8 ``{"q","scale"}`` (``engine.quant``). All
    matrices keep their original (K, N) orientation — the kernel chunks
    the CONTRACTION dim, so row slabs stream contiguously as stored.
    ``store``: "int8" (quantize dense leaves per output column) or "bf16".
    """
    rows = {k: [] for k in ("wqkv", "sqkv", "bqkv", "wproj", "sproj", "bproj",
                            "w1", "s1", "b1", "w2", "s2", "b2", "ln")}
    for i in range(n_layer):
        blk = core[f"h_{i}"]
        for name, wkey, bkey in (("qkv", "wqkv", "bqkv"),
                                 ("proj", "wproj", "bproj")):
            leaf = blk["attn"][f"c_{'attn' if name == 'qkv' else 'proj'}"]
            w, s = _stored(leaf["kernel"], store)
            rows[wkey].append(w)
            rows["s" + name].append(s)
            rows[bkey].append(leaf["bias"].astype(jnp.float32).reshape(1, -1))
        for mkey, widx in (("mlp_c_fc", "1"), ("mlp_c_proj", "2")):
            w, s = _stored(blk[mkey]["kernel"], store)
            rows["w" + widx].append(w)
            rows["s" + widx].append(s)
            rows["b" + widx].append(
                blk[mkey]["bias"].astype(jnp.float32).reshape(1, -1))
        rows["ln"].append(jnp.stack([
            blk["ln_1"]["scale"], blk["ln_1"]["bias"],
            blk["ln_2"]["scale"], blk["ln_2"]["bias"]]).astype(jnp.float32))
    return {k: jnp.stack(v) for k, v in rows.items()}


def init_mega_kv(n_layer: int, d: int, max_len: int, kv_dtype=jnp.int8,
                 batch: tp.Optional[int] = None) -> tp.Dict[str, jax.Array]:
    """Empty megakernel KV cache; T padded up to the kernel's chunk size.
    ``batch=None`` keeps the legacy single-stream (L, T, D) layout;
    ``batch=B`` allocates per-stream rings (L, B, T, D)."""
    t = ((max_len + _TC - 1) // _TC) * _TC
    shp = (n_layer, t, d) if batch is None else (n_layer, batch, t, d)
    sshp = shp[:-1] + (1,)
    return {"k": jnp.zeros(shp, kv_dtype), "v": jnp.zeros(shp, kv_dtype),
            "ks": jnp.ones(sshp, jnp.float32),
            "vs": jnp.ones(sshp, jnp.float32)}


def _quant_rows(x: jax.Array, kv_dtype):
    """Per-row (per-token) KV quantization: (..., T, D) -> values+scales."""
    if kv_dtype == jnp.int8:
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        scale = jnp.maximum(amax, 1e-12) / 127.0
        q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
        return q, scale.astype(jnp.float32)
    return (x.astype(kv_dtype),
            jnp.ones(x.shape[:-1] + (1,), jnp.float32))


def cache_to_mega(cache: tp.Sequence[tp.Mapping], max_len: int,
                  kv_dtype=jnp.int8,
                  batched: bool = False) -> tp.Dict[str, jax.Array]:
    """Convert a standard per-layer decode cache (``GPT2.init_cache``
    layout) after prefill into the stacked megakernel layout. With
    ``batched=False`` only row 0 converts (legacy (L, T, D) layout);
    ``batched=True`` keeps every batch row as its own stream ring
    ((L, B, T, D))."""
    t = ((max_len + _TC - 1) // _TC) * _TC
    if batched:
        ks = jnp.stack([c["k"] for c in cache]).astype(jnp.float32)  # (L,B,Tp,D)
        vs = jnp.stack([c["v"] for c in cache]).astype(jnp.float32)
        pad = [(0, 0), (0, 0), (0, t - ks.shape[2]), (0, 0)]
    else:
        ks = jnp.stack([c["k"][0] for c in cache]).astype(jnp.float32)  # (L,Tp,D)
        vs = jnp.stack([c["v"][0] for c in cache]).astype(jnp.float32)
        pad = [(0, 0), (0, t - ks.shape[1]), (0, 0)]
    kq, ksc = _quant_rows(jnp.pad(ks, pad), kv_dtype)
    vq, vsc = _quant_rows(jnp.pad(vs, pad), kv_dtype)
    return {"k": kq, "v": vq, "ks": ksc, "vs": vsc}


def mega_update_kv(kv: tp.Mapping, kq, vq, ksn, vsn,
                   index) -> tp.Dict[str, jax.Array]:
    """Write the kernel's fresh K/V rows into the cache at each stream's
    position (``jax.lax.dynamic_update_slice`` — in-place inside a jitted
    scan). ``index``: scalar (legacy (L, T, D) cache) or (B,) per-stream
    positions ((L, B, T, D) cache); out-of-range rows clamp, matching the
    serving engine's junk-write discipline for retired slots."""
    if kv["k"].ndim == 3:
        i = jnp.asarray(index, jnp.int32)
        return {"k": jax.lax.dynamic_update_slice(kv["k"], kq, (0, i, 0)),
                "v": jax.lax.dynamic_update_slice(kv["v"], vq, (0, i, 0)),
                "ks": jax.lax.dynamic_update_slice(kv["ks"], ksn, (0, i, 0)),
                "vs": jax.lax.dynamic_update_slice(kv["vs"], vsn, (0, i, 0))}
    B = kv["k"].shape[1]
    idx = jnp.broadcast_to(jnp.asarray(index, jnp.int32), (B,))

    def upd(buf, new, i):  # buf (L, T, C), new (L, C) for this stream
        return jax.lax.dynamic_update_slice(buf, new[:, None, :], (0, i, 0))

    updv = jax.vmap(upd, in_axes=(1, 1, 0), out_axes=1)
    return {"k": updv(kv["k"], kq, idx), "v": updv(kv["v"], vq, idx),
            "ks": updv(kv["ks"], ksn, idx), "vs": updv(kv["vs"], vsn, idx)}


# ---------------------------------------------------------------------------
# oracle
# ---------------------------------------------------------------------------

def _ln_rows(x: jax.Array, scale_row: jax.Array, bias_row: jax.Array,
             eps: float = 1e-5) -> jax.Array:
    """LayerNormF32 math on (R, D) f32 rows (modeling.LayerNormF32)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale_row + bias_row


def _bdot(a: jax.Array, b: jax.Array) -> jax.Array:
    """The kernel's dot: bf16 operands, f32 accumulation."""
    return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def _reference_single(x: jax.Array, packed: tp.Mapping, kv: tp.Mapping,
                      index: jax.Array, nh: int, pad):
    """Single-stream oracle body: ``x`` (1, D), ``kv`` (L, T, D) layout."""
    L, d, _ = packed["wproj"].shape
    hd = d // nh
    t = kv["k"].shape[1]
    kv_dtype = kv["k"].dtype
    dd = jnp.arange(d)[:, None] // hd
    hh = jnp.arange(128)[None, :]
    head_mask = (dd == hh).astype(jnp.float32)              # (D, 128)
    e_mat = head_mask.T                                     # (128, D)
    positions = jnp.arange(t)[:, None]
    pos_valid = positions < index                           # (T, 1)
    if pad is not None:
        pos_valid = pos_valid & (positions >= pad)

    kqs, vqs, ksns, vsns = [], [], [], []
    for i in range(L):
        u = _ln_rows(x, packed["ln"][i, 0:1], packed["ln"][i, 1:2])
        qkv = (_bdot(u, packed["wqkv"][i]) * packed["sqkv"][i]
               + packed["bqkv"][i])                          # (1, 3D)
        q, kn, vn = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]
        kq, ksn = _quant_rows(kn, kv_dtype)
        vq, vsn = _quant_rows(vn, kv_dtype)
        kqs.append(kq); vqs.append(vq); ksns.append(ksn); vsns.append(vsn)

        # Online softmax over T-chunks, EXACTLY the kernel's recurrence and
        # rounding points (bf16 unnormalized probs, divide-by-l at the end,
        # fresh token first) — the looser math anchor vs the real model
        # lives in the OracleVsModel tests.
        qbd = q.T * head_mask / np.sqrt(hd)                  # (D, 128) f32
        k_self = (kq.astype(jnp.float32) * ksn)              # (1, D)
        m = _bdot(k_self, qbd)                               # (1, 128)
        lsum = jnp.ones_like(m)
        pd0 = jnp.dot(jnp.ones_like(m), e_mat,
                      preferred_element_type=jnp.float32)    # (1, D)
        # f32 on purpose: a bf16 round-trip is elidable under XLA's
        # excess-precision rule, making the rounding point jit-dependent
        att0 = pd0 * vsn * vq.astype(jnp.float32)
        acc = att0
        eb = e_mat.astype(jnp.bfloat16)
        for a in range(t // _TC):
            sl = slice(a * _TC, (a + 1) * _TC)
            kc = (kv["k"][i, sl].astype(jnp.bfloat16)
                  * kv["ks"][i, sl].astype(jnp.bfloat16))    # (Tc, D)
            sc = _bdot(kc, qbd)                              # (Tc, 128)
            valid = pos_valid[sl]
            sc = jnp.where(valid, sc, _NEG)
            mc = jnp.max(sc, axis=0, keepdims=True)
            mnew = jnp.maximum(m, mc)
            alpha = jnp.exp(m - mnew)
            p = jnp.where(valid, jnp.exp(sc - mnew), 0.0)
            lsum = lsum * alpha + jnp.sum(p, axis=0, keepdims=True)
            alpha_d = jnp.dot(alpha, e_mat,
                              preferred_element_type=jnp.float32)
            pfull = jnp.dot((p * kv["vs"][i, sl]).astype(jnp.bfloat16), eb,
                            preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)               # (Tc, D)
            su = pfull * kv["v"][i, sl].astype(jnp.bfloat16)
            acc = acc * alpha_d + _bdot(jnp.ones((1, _TC)), su)
            m = mnew
        att = acc / jnp.dot(lsum, e_mat,
                            preferred_element_type=jnp.float32)
        x = x + _bdot(att, packed["wproj"][i]) * packed["sproj"][i] + packed["bproj"][i]

        u2 = _ln_rows(x, packed["ln"][i, 2:3], packed["ln"][i, 3:4])
        hid = jax.nn.gelu(_bdot(u2, packed["w1"][i]) * packed["s1"][i]
                          + packed["b1"][i], approximate=True)
        x = x + _bdot(hid, packed["w2"][i]) * packed["s2"][i] + packed["b2"][i]
    return (x, jnp.stack(kqs), jnp.stack(vqs),
            jnp.stack(ksns), jnp.stack(vsns))


def decode_block_reference(x: jax.Array, packed: tp.Mapping,
                           kv: tp.Mapping, index: jax.Array, *, nh: int,
                           pad: tp.Optional[jax.Array] = None):
    """XLA oracle for :func:`decode_block` — same math, plain softmax.

    Legacy layout (``kv`` (L, T, D), ``x`` (1, D), scalar ``index``)
    returns ``(y (1, D), kq (L, 1, D), vq, ksn (L, 1, 1), vsn)``. Batched
    layout (``kv`` (L, B, T, D), ``x`` (B, D), ``index`` (B,)) runs the
    SAME single-stream math per stream (each row's matmul lanes are
    independent in the kernel, so per-row equality is the right anchor)
    and returns ``(y (B, D), kq (L, B, D), vq, ksn (L, B, 1), vsn)``.
    """
    if kv["k"].ndim == 3:
        return _reference_single(x, packed, kv, index, nh, pad)
    B = x.shape[0]
    idx = jnp.broadcast_to(jnp.asarray(index, jnp.int32), (B,))
    padv = (None if pad is None
            else jnp.broadcast_to(jnp.asarray(pad, jnp.int32), (B,)))
    ys, kqs, vqs, ksns, vsns = [], [], [], [], []
    for b in range(B):
        kvb = {k: v[:, b] for k, v in kv.items()}
        y, kq, vq, ksn, vsn = _reference_single(
            x[b:b + 1], packed, kvb, idx[b],
            nh, None if padv is None else padv[b])
        ys.append(y); kqs.append(kq); vqs.append(vq)
        ksns.append(ksn); vsns.append(vsn)
    return (jnp.concatenate(ys, axis=0),
            jnp.concatenate(kqs, axis=1), jnp.concatenate(vqs, axis=1),
            jnp.concatenate(ksns, axis=1), jnp.concatenate(vsns, axis=1))


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _kernel(plan: MegaPlan, kv_int8: bool, store_dtype):
    d, h3, hp = plan.d, 3 * plan.d, plan.h
    hd = d // plan.nh
    nb = plan.nb
    inv_sqrt_hd = float(1.0 / np.sqrt(hd))

    def kernel(idx_ref, x_ref, wqkv_ref, sqkv_ref, bqkv_ref, ln_ref,
               k_ref, v_ref, ks_ref, vs_ref,
               wproj_ref, sproj_ref, bproj_ref,
               w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
               y_ref, kq_ref, vq_ref, ksn_ref, vsn_ref,
               xs, us, qkvs, pacc, hs, macc, atts, qbd, es, ms, ls,
               selfk, selfv):
        l = pl.program_id(0)
        s = pl.program_id(1)

        @pl.when((l == 0) & (s == 0))
        def _init():
            xs[...] = x_ref[...]
            hhm = jax.lax.broadcasted_iota(jnp.int32, (128, d), 0)
            ddm = jax.lax.broadcasted_iota(jnp.int32, (128, d), 1) // hd
            es[...] = jnp.where(ddm == hhm, 1.0, 0.0)
            # dead rows (>= nb) are never attended: their ls stays 1 so the
            # proj-stage normalize divides them by exactly 1.0 forever
            ls[...] = jnp.ones((_ROWS, 128), jnp.float32)
            atts[...] = jnp.zeros((_ROWS, d), jnp.float32)

        # ---- qkv: accumulate over contraction chunks (all streams at once)
        for j in range(plan.nq):
            @pl.when(s == j)
            def _qkv(j=j):
                if j == 0:
                    us[...] = _ln_rows(xs[...], ln_ref[0, 0:1], ln_ref[0, 1:2])
                part = _bdot(us[:, j * plan.ckq:(j + 1) * plan.ckq],
                             wqkv_ref[0])
                qkvs[...] = part if j == 0 else qkvs[...] + part
                if j == plan.nq - 1:
                    qkv = qkvs[...] * sqkv_ref[0] + bqkv_ref[0]
                    qkvs[...] = qkv
                    kn, vn = qkv[:, d:2 * d], qkv[:, 2 * d:h3]   # (8, D)
                    if kv_int8:
                        ksc = jnp.maximum(jnp.max(jnp.abs(kn), axis=-1,
                                                  keepdims=True), 1e-12) / 127.0
                        vsc = jnp.maximum(jnp.max(jnp.abs(vn), axis=-1,
                                                  keepdims=True), 1e-12) / 127.0
                        kqr = jnp.clip(jnp.round(kn / ksc), -127, 127)
                        vqr = jnp.clip(jnp.round(vn / vsc), -127, 127)
                        kq_ref[0] = kqr[:nb].astype(jnp.int8)
                        vq_ref[0] = vqr[:nb].astype(jnp.int8)
                        # attend to the STORED values (dequantized rows)
                        selfk[...] = kqr * ksc
                        selfv[...] = vqr * vsc
                        ksn_ref[0] = ksc[:nb]
                        vsn_ref[0] = vsc[:nb]
                    else:
                        kst = kn.astype(store_dtype)
                        vst = vn.astype(store_dtype)
                        kq_ref[0] = kst[:nb]
                        vq_ref[0] = vst[:nb]
                        selfk[...] = kst.astype(jnp.float32)
                        selfv[...] = vst.astype(jnp.float32)
                        ksn_ref[...] = jnp.ones((1, nb, 1), jnp.float32)
                        vsn_ref[...] = jnp.ones((1, nb, 1), jnp.float32)

        # ---- attention: per-stream online softmax over that stream's KV.
        # Stage layout depends on plan.batt:
        #   batt=False: one stage per (stream, chunk) — each loads that
        #     stream's (tc, d) block (4 small latency-bound DMAs/stage).
        #   batt=True: ONE stage per chunk — loads ALL streams' (nb, tc, d)
        #     blocks in one DMA and loops streams in-stage. Same per-stream
        #     math in the same order -> bitwise-equal outputs; kills the
        #     per-stream stage DMAs (~127us/stream at serving rings,
        #     docs/KERNELS.md round-5 attribution).
        def _att_pair(b, a, bi):
            # bi: stream index into the kv block's stream dim (0 when the
            # block carries a single stream, b when it carries all nb)
            idx = idx_ref[0, b]
            padv = idx_ref[1, b]
            if a == 0 or plan.batt:
                # per-stream q -> (D, 128) head-block layout (batt rebuilds
                # it per (chunk, stream) — qbd is shared scratch; the build
                # is deterministic VPU work from the resident qkvs)
                qcol = jnp.transpose(qkvs[b:b + 1, 0:d], (1, 0))
                ddm = jax.lax.broadcasted_iota(
                    jnp.int32, (d, 128), 0) // hd
                hhm = jax.lax.broadcasted_iota(jnp.int32, (d, 128), 1)
                qbd[...] = qcol * jnp.where(ddm == hhm,
                                            inv_sqrt_hd, 0.0)
            if a == 0:
                kd = selfk[b:b + 1].astype(jnp.bfloat16)
                sc0 = _bdot(kd, qbd[...])                 # (1, 128)
                ms[b:b + 1] = sc0
                ls[b:b + 1] = jnp.ones_like(sc0)
                pd = jnp.dot(jnp.ones_like(sc0), es[...],
                             preferred_element_type=jnp.float32)
                # pd is exactly 1.0 per dim (one-hot column sums), so
                # pd * selfv == the oracle's pd0 * vsn * vq bitwise
                atts[b:b + 1] = pd * selfv[b:b + 1]

            # chunk-skip: chunks at/beyond the fill index are a
            # no-op (all-masked) — skip their MXU work ("1"/"c");
            # the index map clamp ("1") also skips their DMA
            # (MEGA_SKIP knob: see _kvmap / tools/bench_megadecode)
            import os as _os
            _sk = _os.environ.get("MEGA_SKIP", "1") in ("1", "c")

            @pl.when((a == 0) | (a * plan.tc < idx) if _sk
                     else (s >= 0))
            def _chunk():
                kc = (k_ref[0, bi].astype(jnp.bfloat16)
                      * ks_ref[0, bi].astype(jnp.bfloat16))   # (Tc, D)
                sc = _bdot(kc, qbd[...])                     # (Tc, 128)
                posm = a * plan.tc + jax.lax.broadcasted_iota(
                    jnp.int32, (plan.tc, 128), 0)
                valid = (posm < idx) & (posm >= padv)
                sc = jnp.where(valid, sc, _NEG)
                mc = jnp.max(sc, axis=0, keepdims=True)
                mnew = jnp.maximum(ms[b:b + 1], mc)
                alpha = jnp.exp(ms[b:b + 1] - mnew)          # (1, 128)
                p = jnp.where(valid, jnp.exp(sc - mnew), 0.0)
                ls[b:b + 1] = (ls[b:b + 1] * alpha
                               + jnp.sum(p, axis=0, keepdims=True))
                alpha_d = jnp.dot(alpha, es[...],
                                  preferred_element_type=jnp.float32)
                # f32 accumulator (Mosaic requires 32-bit acc); E is
                # one-hot so the bf16 cast after is bit-identical to
                # a bf16-accumulated dot
                pfull = jnp.dot((p * vs_ref[0, bi]).astype(jnp.bfloat16),
                                es[...].astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32
                                ).astype(jnp.bfloat16)
                su = pfull * v_ref[0, bi].astype(jnp.bfloat16)  # (Tc, D)
                # full-tile ones dot (free on the MXU: one sublane
                # tile either way) keeps the summation order of the
                # single-stream kernel/oracle bit-for-bit
                attc = _bdot(jnp.ones((_ROWS, plan.tc), jnp.bfloat16),
                             su)
                atts[b:b + 1] = (atts[b:b + 1] * alpha_d
                                 + attc[0:1])
                ms[b:b + 1] = mnew

        if plan.batt:
            for a in range(plan.nat):
                @pl.when(s == plan.s_att + a)
                def _att(a=a):
                    for b in range(nb):
                        _att_pair(b, a, b)
        else:
            for b in range(nb):
                for a in range(plan.nat):
                    @pl.when(s == plan.s_att + b * plan.nat + a)
                    def _att(b=b, a=a):
                        _att_pair(b, a, 0)

        # ---- attn out projection + residual + ln2 ---------------------------
        for j in range(plan.npj):
            @pl.when(s == plan.s_proj + j)
            def _proj(j=j):
                if j == 0:
                    # normalize each stream (divide-by-l) with the SAME
                    # (1, 128) dot the oracle uses — a full (8, 128) dot
                    # sums in a different order on the interpret path
                    for b in range(nb):
                        ld = jnp.dot(ls[b:b + 1], es[...],
                                     preferred_element_type=jnp.float32)
                        atts[b:b + 1] = atts[b:b + 1] / ld
                part = _bdot(atts[:, j * plan.ckp:(j + 1) * plan.ckp],
                             wproj_ref[0])
                pacc[...] = part if j == 0 else pacc[...] + part
                if j == plan.npj - 1:
                    xs[...] += pacc[...] * sproj_ref[0] + bproj_ref[0]
                    us[...] = _ln_rows(xs[...], ln_ref[0, 2:3], ln_ref[0, 3:4])

        # ---- mlp fc (+ gelu at the last chunk) ------------------------------
        for j in range(plan.n1):
            @pl.when(s == plan.s_fc + j)
            def _fc(j=j):
                part = _bdot(us[:, j * plan.ck1:(j + 1) * plan.ck1],
                             w1_ref[0])
                hs[...] = part if j == 0 else hs[...] + part
                if j == plan.n1 - 1:
                    hs[...] = jax.nn.gelu(hs[...] * s1_ref[0] + b1_ref[0],
                                          approximate=True)

        # ---- mlp out projection + residual ----------------------------------
        for j in range(plan.n2):
            @pl.when(s == plan.s_out + j)
            def _out(j=j):
                part = _bdot(hs[:, j * plan.ck2:(j + 1) * plan.ck2],
                             w2_ref[0])
                macc[...] = part if j == 0 else macc[...] + part
                if j == plan.n2 - 1:
                    xs[...] += macc[...] * s2_ref[0] + b2_ref[0]

        @pl.when((l == plan.n_layer - 1) & (s == plan.stages - 1))
        def _emit():
            y_ref[...] = xs[...]

    return kernel


def _vmem_limit() -> int:
    """Scoped-VMEM ceiling for the megakernel. The Mosaic default (16MB)
    is far below the chip's physical VMEM; bigger chunks (fewer grid
    steps, less per-step overhead) need more headroom. Swept on-chip via
    MEGA_VMEM_MB (tools/bench_megadecode.py); 64MB carries the 4MB
    chunk-cap default (double-buffered slabs + scratch)."""
    import os

    return int(os.environ.get("MEGA_VMEM_MB", "64")) * 1024 * 1024


def _wmap(s0: int, n: int):
    """Index map for a chunked per-layer input: hold the previous layer's
    last chunk until this matrix's active range so first-chunk DMAs
    stagger across stages instead of piling up at the layer boundary."""
    def m(l, s, idx_ref):
        c = jnp.clip(s - s0, 0, n - 1)
        if s0 == 0:
            return (l, c, 0)
        early = s < s0
        return (jnp.where(early, jnp.maximum(l - 1, 0), l),
                jnp.where(early, n - 1, c), 0)
    return m


def _kvmap(plan: MegaPlan):
    """Per-(stream, chunk) KV index map. Chunks at/beyond a stream's fill
    index CLAMP to its last live chunk: the block index repeats across
    those stages, so the pipeline skips their DMA entirely (early-decode
    steps read only the live prefix of each ring, not the padded T).
    Stages outside the attention range hold the last-used block (no
    refetch); qkv stages hold the PREVIOUS layer's last block so layer
    boundaries stagger their first fetch."""
    import os

    s0, nat, nb, tc = plan.s_att, plan.nat, plan.nb, plan.tc
    # only "1" makes the map data-dependent ("c" keeps the compute-skip
    # predicate but static maps — the A/B for map-dependence cost)
    skip = os.environ.get("MEGA_SKIP", "1") == "1"

    def m(l, s, idx_ref):
        ab = jnp.clip(s - s0, 0, nb * nat - 1)
        b = ab // nat
        a = ab % nat
        if skip:
            amax = jnp.clip((idx_ref[0, b] - 1) // tc, 0, nat - 1)
            a = jnp.minimum(a, amax)
        early = s < s0
        b_last = nb - 1
        if skip:
            a_last = jnp.clip((idx_ref[0, b_last] - 1) // tc, 0, nat - 1)
        else:
            a_last = nat - 1
        return (jnp.where(early, jnp.maximum(l - 1, 0), l),
                jnp.where(early, b_last, b),
                jnp.where(early, a_last, a), 0)
    return m


def _kvmap_batt(plan: MegaPlan):
    """Chunk index map for batched attention: ONE (nb, tc, d) block per
    chunk stage carries every stream's rows. Chunk-skip clamps to the
    LAST chunk any stream still needs (per-stream dead chunks are handled
    by the in-stage compute predicate); early stages hold the previous
    layer's last block so layer boundaries stagger the fetch."""
    import os

    s0, nat, nb, tc = plan.s_att, plan.nat, plan.nb, plan.tc
    skip = os.environ.get("MEGA_SKIP", "1") == "1"

    def m(l, s, idx_ref):
        a = jnp.clip(s - s0, 0, nat - 1)
        if skip:
            mx = idx_ref[0, 0]
            for b in range(1, nb):
                mx = jnp.maximum(mx, idx_ref[0, b])
            amax = jnp.clip((mx - 1) // tc, 0, nat - 1)
            a = jnp.minimum(a, amax)
            a_last = amax
        else:
            a_last = nat - 1
        early = s < s0
        return (jnp.where(early, jnp.maximum(l - 1, 0), l),
                0,
                jnp.where(early, a_last, a), 0)
    return m


def _lmap(l, s, idx_ref):   # per-layer resident rows (scales/biases/ln)
    return (l, 0, 0)


@functools.partial(jax.jit, static_argnames=("nh", "interpret"))
def decode_block(x: jax.Array, packed: tp.Mapping, kv: tp.Mapping,
                 index: jax.Array, *, nh: int,
                 pad: tp.Optional[jax.Array] = None,
                 interpret: bool = False):
    """One decode step for B (<= 8) independent streams in ONE launch.

    ``x`` (B, D) f32 post-embedding activations (one row per stream);
    ``packed`` from :func:`pack_core_params`; ``kv`` from
    :func:`init_mega_kv`/:func:`cache_to_mega` — legacy (L, T, D) for a
    single stream or (L, B, T, D) per-stream rings; ``index`` scalar or
    (B,) int32 — each stream's token position (its cache rows < index are
    attended); ``pad`` optionally masks each stream's first ``pad[b]``
    cache rows (left-padded bucket prompts, the batched-decode contract).

    Returns ``(y (B, D) f32, kq (L, B, D), vq (L, B, D), ksn (L, B, 1),
    vsn (L, B, 1))``; the caller writes the fresh rows into the cache
    (:func:`mega_update_kv` keeps it in-place in the decode scan). With a
    legacy 3D ``kv`` the outputs carry B=1 — the round-4 single-stream
    contract unchanged.
    """
    legacy = kv["k"].ndim == 3
    B = x.shape[0]
    if legacy:
        assert B == 1, "legacy (L, T, D) kv carries exactly one stream"
        kv = {k: v[:, None] for k, v in kv.items()}
    L, _, t, d = kv["k"].shape
    assert B == kv["k"].shape[1], (B, kv["k"].shape)
    hp = packed["w1"].shape[2]
    plan = plan_for(L, d, hp, nh, t, packed["wqkv"].dtype.itemsize, nb=B)
    kv_dtype = kv["k"].dtype
    xp = jnp.zeros((_ROWS, d), jnp.float32)
    xp = jax.lax.dynamic_update_slice(xp, x.astype(jnp.float32), (0, 0))
    idx = jnp.broadcast_to(jnp.asarray(index, jnp.int32), (B,))
    padv = (jnp.zeros((B,), jnp.int32) if pad is None
            else jnp.broadcast_to(jnp.asarray(pad, jnp.int32), (B,)))
    scal = jnp.zeros((2, _ROWS), jnp.int32)
    scal = scal.at[0, :B].set(idx).at[1, :B].set(padv)

    def cmap(l, s, idx_ref):
        return (0, 0)

    if plan.batt:
        kvm = _kvmap_batt(plan)
        nbb = B  # one block carries every stream's chunk rows
    else:
        kvm = _kvmap(plan)
        nbb = 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, plan.stages),
        in_specs=[
            pl.BlockSpec((_ROWS, d), cmap),                            # x
            pl.BlockSpec((1, plan.ckq, 3 * d), _wmap(0, plan.nq)),     # wqkv
            pl.BlockSpec((1, 1, 3 * d), _lmap),                        # sqkv
            pl.BlockSpec((1, 1, 3 * d), _lmap),                        # bqkv
            pl.BlockSpec((1, 4, d), _lmap),                            # ln
            pl.BlockSpec((1, nbb, plan.tc, d), kvm),                   # k
            pl.BlockSpec((1, nbb, plan.tc, d), kvm),                   # v
            pl.BlockSpec((1, nbb, plan.tc, 1), kvm),                   # ks
            pl.BlockSpec((1, nbb, plan.tc, 1), kvm),                   # vs
            pl.BlockSpec((1, plan.ckp, d), _wmap(plan.s_proj, plan.npj)),  # wproj
            pl.BlockSpec((1, 1, d), _lmap),                            # sproj
            pl.BlockSpec((1, 1, d), _lmap),                            # bproj
            pl.BlockSpec((1, plan.ck1, hp), _wmap(plan.s_fc, plan.n1)),   # w1
            pl.BlockSpec((1, 1, hp), _lmap),                           # s1
            pl.BlockSpec((1, 1, hp), _lmap),                           # b1
            pl.BlockSpec((1, plan.ck2, d), _wmap(plan.s_out, plan.n2)),   # w2
            pl.BlockSpec((1, 1, d), _lmap),                            # s2
            pl.BlockSpec((1, 1, d), _lmap),                            # b2
        ],
        out_specs=[
            pl.BlockSpec((_ROWS, d), cmap),                            # y
            pl.BlockSpec((1, B, d), lambda l, s, r: (l, 0, 0)),        # kq
            pl.BlockSpec((1, B, d), lambda l, s, r: (l, 0, 0)),        # vq
            pl.BlockSpec((1, B, 1), lambda l, s, r: (l, 0, 0)),        # ksn
            pl.BlockSpec((1, B, 1), lambda l, s, r: (l, 0, 0)),        # vsn
        ],
        scratch_shapes=[
            pltpu.VMEM((_ROWS, d), jnp.float32),        # xs residual
            pltpu.VMEM((_ROWS, d), jnp.float32),        # us (ln out)
            pltpu.VMEM((_ROWS, 3 * d), jnp.float32),    # qkvs
            pltpu.VMEM((_ROWS, d), jnp.float32),        # pacc
            pltpu.VMEM((_ROWS, hp), jnp.float32),       # hs
            pltpu.VMEM((_ROWS, d), jnp.float32),        # macc
            pltpu.VMEM((_ROWS, d), jnp.float32),        # atts
            pltpu.VMEM((d, 128), jnp.float32),          # qbd (active stream)
            pltpu.VMEM((128, d), jnp.float32),          # es
            pltpu.VMEM((_ROWS, 128), jnp.float32),      # ms (row per stream)
            pltpu.VMEM((_ROWS, 128), jnp.float32),      # ls (row per stream)
            pltpu.VMEM((_ROWS, d), jnp.float32),        # selfk (deq fresh K)
            pltpu.VMEM((_ROWS, d), jnp.float32),        # selfv (deq fresh V)
        ],
    )
    y, kq, vq, ksn, vsn = pl.pallas_call(
        _kernel(plan, kv_dtype == jnp.int8, kv_dtype),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((_ROWS, d), jnp.float32),
            jax.ShapeDtypeStruct((L, B, d), kv_dtype),
            jax.ShapeDtypeStruct((L, B, d), kv_dtype),
            jax.ShapeDtypeStruct((L, B, 1), jnp.float32),
            jax.ShapeDtypeStruct((L, B, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_vmem_limit()),
        interpret=interpret or jax.default_backend() != "tpu",
    )(scal,
      xp, packed["wqkv"], packed["sqkv"], packed["bqkv"], packed["ln"],
      kv["k"], kv["v"], kv["ks"], kv["vs"],
      packed["wproj"], packed["sproj"], packed["bproj"],
      packed["w1"], packed["s1"], packed["b1"],
      packed["w2"], packed["s2"], packed["b2"])
    return y[:B], kq, vq, ksn, vsn
