"""Weight-streaming GEMV for KV-cached decode (Pallas, TPU).

Single-stream decode multiplies a handful of activation rows (B·1 tokens)
against every weight matrix per token — the program is a pure HBM
weight-read, so the weights' stored bytes are the speed of light. XLA's
``dequantize -> dot`` on an int8 tree cannot reach that floor: the widened
bf16 copy round-trips HBM (measured 1.76x over the int8 read floor at
gpt2-large geometry, tools/profile_decode_large.py; the 49k-row lm-head
read runs 7.7x over). This kernel reads the int8 (or bf16) weights
directly into VMEM, widens in-register, and runs the MXU dot per
N-block — per-token traffic IS the stored bytes.

Math (bit-pinned by :func:`matmul_reference` + tests):
``out = dot(x.bf16, w.bf16, f32 accum) * scale`` — scale applied AFTER the
dot in f32, per output column. int8 values widen to bf16 exactly
(|q| <= 127), so the only rounding is bf16 x-rounding and f32 accumulation.

Consumers: ``models/gpt2.QDense`` (the four block GEMVs), the decode
programs' lm-head read (``apps/gen_gpt._head_logits``), and the int8
embedding-row gather (:func:`gather_rows`).

Reference hot loop this serves: the decode phase of
``summer_clip/clip_prompt/gen_gpt.py`` (HF ``generate`` on gpt2-large).
"""

from __future__ import annotations

import collections.abc
import functools
import typing as tp

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["matmul_reference", "streamed_qmatmul", "qdot", "gather_rows",
           "is_qleaf", "fused_qmlp", "fused_qmlp_reference", "qmlp",
           "fused_mlp_legal"]

_ROWS = 8  # padded activation rows per kernel: one f32 sublane tile


def is_qleaf(x) -> bool:
    """An ``engine/quant``-style int8 leaf: ``{"q": int8, "scale": f32}``.
    Mapping, not dict — flax hands modules FrozenDict-wrapped params."""
    return isinstance(x, collections.abc.Mapping) and set(x) == {"q", "scale"}


def matmul_reference(x: jax.Array, w: jax.Array,
                     scale: tp.Optional[jax.Array] = None) -> jax.Array:
    """XLA oracle with the kernel's exact semantics (bf16 dot, f32 accum,
    f32 scale-after). ``w`` (K, N) int8/bf16/f32; ``scale`` (1, N) or (N,)."""
    y = jnp.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    if scale is not None:
        y = y * scale.reshape(1, -1)
    return y


_BUDGET = 8 * 1024 * 1024  # weight-slab VMEM budget (x/out blocks are tiny)


def _pick_bn(n: int, k: int, itemsize: int) -> int:
    # The whole matrix in ONE block when it fits: the GEMV's time IS the
    # weight DMA, so one big transfer beats a pipeline of chunks + per-
    # grid-step overhead (measured: divisibility-forced 256-col chunks put
    # qkv at 15 steps and the 49k-vocab head at 193 — the overhead erased
    # the int8 win). Oversized matrices stream power-of-two column blocks;
    # bn need NOT divide n — Pallas masks the uneven tail block (padded
    # weight/scale columns only ever reach padded, discarded outputs).
    if k * n * itemsize <= _BUDGET:
        return n
    bn = 4096
    while bn > 128 and 2 * k * bn * itemsize > _BUDGET:
        bn //= 2
    return bn if 2 * k * bn * itemsize <= _BUDGET else 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def streamed_qmatmul(x: jax.Array, w: jax.Array,
                     scale: tp.Optional[jax.Array] = None, *,
                     interpret: bool = False) -> jax.Array:
    """``x (R<=8, K) @ w (K, N) -> (R, N) f32``, streaming ``w`` as stored.

    ``w`` may be int8 (with ``scale`` (1, N)/(N,) f32 applied after the
    dot) or bf16/f32 (scale optional). The N axis is blocked; each grid
    step widens one (K, bn) weight slab in VMEM and runs one MXU dot —
    the slab never exists in HBM in wide form.
    """
    r, k = x.shape
    n = w.shape[1]
    bn = _pick_bn(n, k, w.dtype.itemsize)
    assert bn, f"({k}, {n}) weight block does not fit the VMEM budget"
    xp = jnp.zeros((_ROWS, k), jnp.float32).at[:r].set(x.astype(jnp.float32))
    s = (jnp.ones((1, n), jnp.float32) if scale is None
         else scale.reshape(1, n).astype(jnp.float32))

    def kernel(x_ref, w_ref, s_ref, o_ref):
        wb = w_ref[...].astype(jnp.bfloat16)
        y = jnp.dot(x_ref[...].astype(jnp.bfloat16), wb,
                    preferred_element_type=jnp.float32)
        o_ref[...] = y * s_ref[...]

    out = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(n, bn),),
        in_specs=[
            pl.BlockSpec((_ROWS, k), lambda j: (0, 0)),
            pl.BlockSpec((k, bn), lambda j: (0, j)),
            pl.BlockSpec((1, bn), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((_ROWS, bn), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((_ROWS, n), jnp.float32),
        interpret=interpret or jax.default_backend() != "tpu",
    )(xp, w, s)
    return out[:r]


def _tile_legal(k: int, n: int, itemsize: int) -> bool:
    # K (contraction) must land on exact sublane tiles — it is never
    # masked; N tails are masked by the grid, any n >= 128 works
    sub = {1: 32, 2: 16, 4: 8}[itemsize]  # int8 / bf16 / f32 sublane tiles
    return k % sub == 0 and n >= 128 and _pick_bn(n, k, itemsize) > 0


def qdot(x: jax.Array, leaf, dtype) -> jax.Array:
    """Dense contraction against a possibly-quantized kernel leaf.

    ``x (..., K)``; ``leaf`` either a plain (K, N) array or an int8
    ``{"q", "scale"}`` dict (per-output-column scales,
    ``engine/quant.quantize_tree``). Decode-shaped calls (<= 8 total rows,
    tile-legal) stream through the Pallas kernel; everything else takes
    the XLA path with the SAME math (:func:`matmul_reference`).
    ``SUMMER_CLIP_GEMV=0`` forces the XLA path everywhere (A/B + escape
    hatch).
    """
    import os

    q, scale = (leaf["q"], leaf["scale"]) if is_qleaf(leaf) else (leaf, None)
    k, n = q.shape
    lead = x.shape[:-1]
    rows = 1
    for d in lead:
        rows *= d
    if (rows <= _ROWS and _tile_legal(k, n, q.dtype.itemsize)
            and os.environ.get("SUMMER_CLIP_GEMV", "1") != "0"):
        y = streamed_qmatmul(x.reshape(rows, k), q, scale)
        return y.reshape(*lead, n).astype(dtype)
    if scale is not None:
        # same math as the kernel (matmul_reference): bf16 dot, f32 accum,
        # f32 scale-after — wide and decode-shaped calls agree bit-for-bit
        # per row, and XLA fuses the int8->bf16 convert into the dot read
        # instead of materializing a dequantized copy
        return matmul_reference(x.reshape(rows, k), q,
                                scale).reshape(*lead, n).astype(dtype)
    return jnp.dot(x.astype(dtype), q.astype(dtype))


def _pick_bh(d: int, h: int, itemsize: int) -> int:
    # largest hidden chunk that (a) DIVIDES h — masked tail chunks would
    # CONTRIBUTE garbage to the accumulated second dot, unlike the pure
    # N-blocking above where padded columns only reach discarded outputs —
    # (b) is lane-tile legal, (c) fits two double-buffered weight slabs
    best = 0
    for bh in range(128, h + 1, 128):
        if h % bh == 0 and 4 * d * bh * itemsize <= _BUDGET:
            best = bh
    return best


def fused_mlp_legal(d: int, h: int, itemsize: int) -> bool:
    """Both dots tile-legal for :func:`fused_qmlp` (D on lane tiles for the
    x/out blocks and the W2 columns; a dividing hidden chunk exists)."""
    return d % 128 == 0 and _pick_bh(d, h, itemsize) > 0


def fused_qmlp_reference(x, w1, s1, b1, w2, s2, b2) -> jax.Array:
    """XLA oracle with the fused kernel's exact semantics: bf16 dots, f32
    accumulation, f32 scale-after per dot, gelu(tanh) on the f32 hidden."""
    t = matmul_reference(x, w1, s1) + b1.reshape(1, -1).astype(jnp.float32)
    hact = jax.nn.gelu(t, approximate=True)
    return matmul_reference(hact, w2, s2) + b2.reshape(1, -1).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_qmlp(x: jax.Array, w1: jax.Array, s1: jax.Array, b1: jax.Array,
               w2: jax.Array, s2: jax.Array, b2: jax.Array, *,
               interpret: bool = False) -> jax.Array:
    """``gelu(x @ w1 * s1 + b1) @ w2 * s2 + b2`` in ONE kernel launch.

    The transformer-MLP pair for decode-shaped activations (R <= 8 rows):
    the grid walks hidden chunks, each step streams one (D, bh) w1 slab +
    one (bh, D) w2 slab into VMEM, widens in-register, and accumulates the
    second dot's partial product into a VMEM-resident (8, D) f32 output —
    the hidden activation never exists outside VMEM and the pair costs one
    launch instead of two (~6 us/launch at gpt2-large geometry,
    tools/profile_decode_large.py `gemv` section). w2's per-output-column
    scale distributes over the chunk sum, so it applies once at the end.

    Math per chunk matches :func:`qdot` on the unfused pair except that
    the hidden stays f32 until the second dot's bf16 cast (the unfused
    pair rounds it to the model dtype between the launches).
    """
    r, d = x.shape
    h = w1.shape[1]
    bh = _pick_bh(d, h, w1.dtype.itemsize)
    assert bh and d % 128 == 0, (d, h)
    xp = jnp.zeros((_ROWS, d), jnp.float32).at[:r].set(x.astype(jnp.float32))
    s1r = s1.reshape(1, h).astype(jnp.float32)
    b1r = b1.reshape(1, h).astype(jnp.float32)

    def kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, o_ref):
        t = jnp.dot(x_ref[...].astype(jnp.bfloat16),
                    w1_ref[...].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        hact = jax.nn.gelu(t * s1_ref[...] + b1_ref[...], approximate=True)
        part = jnp.dot(hact.astype(jnp.bfloat16),
                       w2_ref[...].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

        @pl.when(pl.program_id(0) == 0)
        def _init():
            o_ref[...] = part

        @pl.when(pl.program_id(0) > 0)
        def _acc():
            o_ref[...] += part

    out = pl.pallas_call(
        kernel,
        grid=(h // bh,),
        in_specs=[
            pl.BlockSpec((_ROWS, d), lambda j: (0, 0)),
            pl.BlockSpec((d, bh), lambda j: (0, j)),
            pl.BlockSpec((1, bh), lambda j: (0, j)),
            pl.BlockSpec((1, bh), lambda j: (0, j)),
            pl.BlockSpec((bh, d), lambda j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((_ROWS, d), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((_ROWS, d), jnp.float32),
        interpret=interpret or jax.default_backend() != "tpu",
    )(xp, w1, s1r, b1r, w2)
    return out[:r] * s2.reshape(1, d) + b2.reshape(1, d).astype(jnp.float32)


def qmlp(x: jax.Array, leaf1, bias1, leaf2, bias2, dtype) -> tp.Optional[jax.Array]:
    """Fused-MLP dispatch: the kernel when both leaves are int8 qleaves,
    the shapes are decode-shaped + tile-legal, and ``SUMMER_CLIP_FUSED_MLP=1``
    opts in; ``None`` otherwise (caller runs the unfused pair).

    OPT-IN, measured NET NEGATIVE on-chip at both production geometries
    (gpt2-large 230 vs 416 tok/s, 124M 606 vs 1,278): the (D, bh) w1
    column blocks are strided reads of the row-major weight (~1KB
    contiguous segments), and the lost DMA efficiency dwarfs the one
    saved kernel launch (~6 us). The unfused pair reads each matrix as
    one contiguous whole-matrix block. Kept as the oracle-tested
    reference for revisiting with a transposed-w1 storage layout."""
    import os

    if not (is_qleaf(leaf1) and is_qleaf(leaf2)):
        return None
    if os.environ.get("SUMMER_CLIP_FUSED_MLP", "0") != "1":
        return None
    if os.environ.get("SUMMER_CLIP_GEMV", "1") == "0":
        return None
    d, h = leaf1["q"].shape
    if leaf2["q"].shape != (h, d) or not fused_mlp_legal(d, h, leaf1["q"].dtype.itemsize):
        return None
    lead = x.shape[:-1]
    rows = 1
    for n in lead:
        rows *= n
    if rows > _ROWS:
        return None
    y = fused_qmlp(x.reshape(rows, d), leaf1["q"], leaf1["scale"], bias1,
                   leaf2["q"], leaf2["scale"], bias2)
    return y.reshape(*lead, d).astype(dtype)


def gather_rows(leaf, ids: jax.Array) -> jax.Array:
    """Embedding-row gather straight off the stored leaf: int8 leaves read
    one int8 row + its scale per id instead of dequantizing the table."""
    if is_qleaf(leaf):
        rows = jnp.take(leaf["q"], ids, axis=0).astype(jnp.float32)
        return rows * jnp.take(leaf["scale"], ids, axis=0)
    return jnp.take(leaf, ids, axis=0)
