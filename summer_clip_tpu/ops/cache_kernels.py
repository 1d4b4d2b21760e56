"""Fused cache-attention kernel: ``out[b] = exp(-beta_b * (1 - F @ C^T)) @ V``.

This is THE hot op of the framework. It serves both:

- **Tip-Adapter** (reference ``summer_clip/tip_adapter/utils.py:109-118``):
  ``cache_logits = exp(-beta(1-affinity)) @ values`` recomputed inside a
  200x20 beta/alpha grid search, and
- **CLIP-search image-attention** (reference
  ``summer_clip/clip_searcher/cache_weights_strategy.py:28-36`` +
  ``image_attention.py:106-110``): the same contraction swept over beta.

TPU-first design (not a port): instead of materializing the (Nt, Nc)
weight matrix in HBM once per beta like the reference, we run a
flash-attention-style Pallas kernel blocked over the cache length Nc with
f32 accumulation in VMEM, and batch the whole beta sweep into the kernel so
the expensive ``F @ C^T`` affinity block is computed once per beta-chunk and
reused for every beta in the chunk. The (Nt, Nc) intermediate never leaves
VMEM. Since the affinity is a cosine similarity in [-1, 1], the exponent is
bounded (<= 1) and no online-max rescaling is needed.

The beta sweep collapses from O(B) full passes to O(B / BETA_BLOCK) affinity
passes; the ``@ V`` contraction (the part that genuinely scales with B) stays.

No softmax: the cache "attention" is an unnormalized exponential affinity.
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

__all__ = [
    "cache_attention_reference", "cache_attention", "cache_attention_auto",
    "cache_attention_onehot", "cache_attention_labels",
    "cache_attention_from_labels", "onehot_block_classes",
    "onehot_table_operands",
]


def cache_attention_reference(test_features: jax.Array, cache_features: jax.Array,
                              cache_values: jax.Array, betas: jax.Array) -> jax.Array:
    """Dense oracle. test (Nt, D), cache (Nc, D), values (Nc, C), betas (B,).

    Returns (B, Nt, C) in float32. Inputs are assumed L2-normalized along D
    (the caller normalizes, matching ``cache_weights_strategy.py:19-21``).
    """
    affinity = jnp.dot(test_features.astype(jnp.float32), cache_features.T.astype(jnp.float32))
    betas = betas.astype(jnp.float32).reshape(-1, 1, 1)
    weights = jnp.exp(-betas * (1.0 - affinity[None]))
    return jnp.einsum("bqn,nc->bqc", weights, cache_values.astype(jnp.float32))


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad_axis(x: jax.Array, axis: int, target: int) -> jax.Array:
    if x.shape[axis] == target:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - x.shape[axis])
    return jnp.pad(x, pad)


def _pick_blocks(d_p: int, c_p: int, v_bytes: int = 2, f_bytes: int = 2,
                 budget_bytes: int = 14 * 1024 * 1024) -> tp.Tuple[int, int, int]:
    """Choose (block_q, block_n, block_b) fitting the VMEM budget.

    The kernel's HBM traffic is dominated by re-reading the cache features +
    values once per (beta-chunk, query-block): traffic ∝ (B/bb) * (Nt/bq).
    Candidates below are ordered by MEASURED v5e time at CLIP scales
    (Nt=8k, Nc=131k, D=1024, C=1000, 8 betas — see docs/KERNELS.md):
    round-2 sweep with bf16 features + int8 one-hot values: (128,512,8)
    59.2k q/s > (128,256,8) 57.2k > (256,512,4) 55.0k > round-1's
    (256,256,4) 53-54k. block_b=8 runs ONE affinity pass for the whole
    reference beta grid; the freed FLOPs beat the larger out-block cost.
    Footprint (Mosaic double-buffers in/out blocks; f/out blocks are
    index-invariant along the inner cache axis so they stay resident):
      2*(bn*dp*f + bn*cp*v) + bq*dp*f + 2*bb*bq*cp*4 + bq*bn*4 (aff).
    """
    candidates = [
        (128, 512, 8), (128, 256, 8), (256, 512, 4), (256, 256, 4),
        (256, 512, 2), (512, 128, 2), (256, 256, 2), (128, 512, 2),
        (128, 256, 2), (128, 256, 1), (128, 128, 1),
    ]
    for bq, bn, bb in candidates:
        need = (2 * bn * d_p * f_bytes + 2 * bn * c_p * v_bytes
                + bq * d_p * f_bytes + 2 * bb * bq * c_p * 4 + bq * bn * 4)
        if need <= budget_bytes:
            return bq, bn, bb
    return 128, 128, 1


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_n", "block_b", "interpret", "compute_dtype"),
)
def cache_attention(test_features: jax.Array, cache_features: jax.Array,
                    cache_values: jax.Array, betas: jax.Array, *,
                    block_q: tp.Optional[int] = None,
                    block_n: tp.Optional[int] = None,
                    block_b: tp.Optional[int] = None,
                    interpret: bool = False,
                    compute_dtype: tp.Any = None) -> jax.Array:
    """Pallas fused kernel. Shapes as in :func:`cache_attention_reference`.

    Padding strategy: D and C pad with zeros (exact — zero features add 0 to
    the dot product, zero value-columns are sliced away); Nc pads with zero
    *value rows* so padded cache entries contribute exp(-b(1-0)) * 0 = 0;
    Nt pad rows are sliced from the output; the beta axis pads by repeating
    the last beta and slicing.
    """
    nt, d = test_features.shape
    nc, _ = cache_features.shape
    _, c = cache_values.shape
    b = betas.shape[0]
    # MXU inputs in bf16 with f32 accumulation by default on TPU — the
    # reference computes this contraction in fp16 outright
    # (half caches/weights, tip_adapter/utils.py:62); exp stays f32 on VPU.
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    # Pre-cast float operands to the compute dtype IN HBM: the kernel casts
    # before the matmuls anyway, so this is numerically identical but halves
    # the dominant HBM traffic (cache features + values re-read once per
    # (beta-chunk, query-block)). Integer values (int8 one-hots) pass through
    # and convert on the VPU per block.
    def _to_compute(x: jax.Array) -> jax.Array:
        if jnp.issubdtype(x.dtype, jnp.floating) and x.dtype != compute_dtype:
            return x.astype(compute_dtype)
        return x

    test_features = _to_compute(test_features)
    cache_features = _to_compute(cache_features)
    cache_values = _to_compute(cache_values)

    d_p = _ceil_to(d, 128)
    c_p = _ceil_to(max(c, 128), 128)
    v_bytes = jnp.dtype(cache_values.dtype).itemsize
    f_bytes = jnp.dtype(cache_features.dtype).itemsize
    auto_bq, auto_bn, auto_bb = _pick_blocks(d_p, c_p, v_bytes, f_bytes)
    block_q = block_q or auto_bq
    block_n = block_n or auto_bn
    block_b = block_b or auto_bb
    nt_p = _ceil_to(nt, block_q)
    nc_p = _ceil_to(nc, block_n)
    b_p = _ceil_to(b, block_b)

    f = _pad_axis(_pad_axis(test_features, 1, d_p), 0, nt_p)
    cf = _pad_axis(_pad_axis(cache_features, 1, d_p), 0, nc_p)
    v = _pad_axis(_pad_axis(cache_values, 1, c_p), 0, nc_p)
    bet = jnp.concatenate([
        betas.astype(jnp.float32),
        jnp.full((b_p - b,), betas[-1], jnp.float32),
    ]) if b_p != b else betas.astype(jnp.float32)
    bet2d = bet.reshape(b_p // block_b, block_b)

    num_n = nc_p // block_n

    num_bb = b_p // block_b

    def kernel(beta_ref, f_ref, c_ref, v_ref, o_ref):
        bb_idx = pl.program_id(0)
        n_idx = pl.program_id(2)

        @pl.when(n_idx == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        fq = f_ref[:].astype(compute_dtype)          # (block_q, d_p)
        cn = c_ref[:].astype(compute_dtype)          # (block_n, d_p)
        vn = v_ref[:].astype(compute_dtype)          # (block_n, c_p)
        aff = jax.lax.dot_general(
            fq, cn, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # (block_q, block_n) f32
        # one (bq, bn) @ (bn, cp) matmul per beta. (A packed variant fusing
        # all betas into one (bb*bq, bn) matmul was tried in round 2 and
        # fails Mosaic compilation at every viable block shape.)
        for bi in range(block_b):
            beta = beta_ref[bb_idx, bi]
            w = jnp.exp(-beta * (1.0 - aff)).astype(compute_dtype)
            o_ref[bi] += jnp.dot(w, vn, preferred_element_type=jnp.float32)

    grid = (num_bb, nt_p // block_q, num_n)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # betas are tiny: keep the whole (num_bb, block_b) table resident
            pl.BlockSpec((num_bb, block_b), lambda bb, q, n: (0, 0)),
            pl.BlockSpec((block_q, d_p), lambda bb, q, n: (q, 0)),
            pl.BlockSpec((block_n, d_p), lambda bb, q, n: (n, 0)),
            pl.BlockSpec((block_n, c_p), lambda bb, q, n: (n, 0)),
        ],
        out_specs=pl.BlockSpec(
            (block_b, block_q, c_p), lambda bb, q, n: (bb, q, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b_p, nt_p, c_p), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nt_p * nc_p * d_p * (b_p // block_b)
            + b_p * (2 * nt_p * nc_p * c_p + 2 * nt_p * nc_p),
            bytes_accessed=(nt_p * d_p * f_bytes + nc_p * d_p * f_bytes
                            + nc_p * c_p * v_bytes + b_p * nt_p * c_p * 4),
            transcendentals=b_p * nt_p * nc_p,
        ),
    )(bet2d, f, cf, v)
    return out[:b, :nt, :c]


# test hook: route label-carrying auto dispatches through the one-hot
# kernel off-TPU (interpret mode) so CPU tests exercise the real path
ONEHOT_FORCE = False

# (labels fingerprint, block_n) -> (table, k_max): the table is pure host
# work repeated identically per beta chunk of a sweep — memoize the last few
_TABLE_CACHE: "tp.Dict[tp.Tuple[int, int, int], tp.Tuple[np.ndarray, int]]" = {}


def onehot_block_classes(labels_padded: np.ndarray, block_n: int
                         ) -> tp.Tuple[np.ndarray, int]:
    """Per-cache-block distinct-class table for the one-hot kernel.

    ``labels_padded``: (Nc_p,) int32, pad rows carry -1. Returns
    ``(table (num_n, k_max) int32 padded with -2, k_max)`` where ``k_max``
    is the max distinct real labels in any block, rounded up to 8.
    Host-side numpy by design (selection/index math stays on host);
    memoized on a content fingerprint (the same labels sweep through many
    beta chunks).
    """
    key = (labels_padded.shape[0], block_n, hash(labels_padded.tobytes()))
    hit = _TABLE_CACHE.get(key)
    if hit is not None:
        return hit
    num_n = labels_padded.shape[0] // block_n
    rows = labels_padded.reshape(num_n, block_n)
    uniques = [np.unique(r[r >= 0]) for r in rows]
    need = max((u.shape[0] for u in uniques), default=1)
    k_max = max(8, -(-need // 8) * 8)
    table = np.full((num_n, k_max), -2, np.int32)
    for i, u in enumerate(uniques):
        table[i, : u.shape[0]] = u
    if len(_TABLE_CACHE) >= 8:
        _TABLE_CACHE.pop(next(iter(_TABLE_CACHE)))
    _TABLE_CACHE[key] = (table, k_max)
    return table, k_max


def onehot_table_operands(labels_padded: np.ndarray, block_n: int,
                          k_pad: tp.Optional[int] = None
                          ) -> tp.Tuple[np.ndarray, np.ndarray, int]:
    """Mosaic-tile-legal forms of the per-block class table.

    The natural table shapes — (num_n, k_max) blocked (1, k_max) and its
    transpose blocked (k_max, 1) — violate Mosaic's block-tiling rule (a
    block's last two dims must be multiples of (8, 128) or span the array;
    a 1-wide partial dim is neither), which the interpret-mode tests cannot
    see: the first real-TPU run failed to lower. Legal layouts instead:

    - ``crow8``  (num_n * 8, k_max): rows [8n, 8n+8) all carry table row n;
      blocked (8, k_max) — 8 divides the sublane tile, k_max spans the lane
      axis. The kernel reads row 0.
    - ``ccol128`` (k_max, num_n * 128): columns [128n, 128n+128) all carry
      table row n as a column; blocked (k_max, 128). The kernel reads
      column 0. (A column form is required to build the (k_max, C) expand
      matrix — Mosaic has no cheap in-kernel transpose for int vectors.)

    ``k_pad`` pins k_max to a caller-chosen static width (sharded residence
    keeps one width across selections so programs never recompile).
    """
    table, k_max = onehot_block_classes(labels_padded, block_n)
    if k_pad is not None:
        if k_pad < k_max:
            raise ValueError(f"k_pad={k_pad} < required k_max={k_max}")
        if k_pad % 8:
            raise ValueError(f"k_pad must be a multiple of 8, got {k_pad}")
        if k_pad != k_max:
            table = np.concatenate(
                [table, np.full((table.shape[0], k_pad - k_max), -2, np.int32)], 1)
            k_max = k_pad
    crow8 = np.repeat(table, 8, axis=0)
    ccol128 = np.repeat(table.T, 128, axis=1)
    return crow8, ccol128, k_max


def _pick_blocks_onehot(d_p: int, c_p: int, f_bytes: int = 2,
                        budget_bytes: int = 14 * 1024 * 1024
                        ) -> tp.Tuple[int, int, int]:
    """(block_q, block_n, block_b) for the one-hot kernel's VMEM budget.

    No value block to stream, so the cache block widens; the out block
    (2 * bb * bq * c_p * 4, double-buffered f32) dominates at large C and
    forces bb/bq down exactly like the dense kernel's chooser."""
    candidates = [
        (128, 1024, 8), (128, 512, 8), (128, 512, 4), (128, 256, 4),
        (128, 256, 2), (128, 128, 2), (128, 128, 1),
        # extreme class counts (C >= ~8k): shrink the query block so the
        # f32 out block still double-buffers inside the budget
        (64, 128, 1), (32, 128, 1), (16, 128, 1),
    ]
    for bq, bn, bb in candidates:
        need = (2 * bn * d_p * f_bytes + bq * d_p * f_bytes
                + 2 * bb * bq * c_p * 4 + bq * bn * 4)
        if need <= budget_bytes:
            return bq, bn, bb
    return 16, 128, 1


def cache_attention_onehot(test_features: jax.Array, cache_features: jax.Array,
                           cache_labels: tp.Any, betas: jax.Array,
                           num_classes: int, *,
                           block_q: tp.Optional[int] = None,
                           block_n: tp.Optional[int] = None,
                           block_b: tp.Optional[int] = None,
                           interpret: bool = False,
                           compute_dtype: tp.Any = None,
                           k_limit: int = 128) -> jax.Array:
    """Fused sweep for ONE-HOT values, exploiting class-grouped caches.

    Mathematically identical to :func:`cache_attention` with
    ``values = one_hot(cache_labels, num_classes)``, but the values matrix is
    never materialized or streamed. When cache rows are grouped by class
    (``select_topk_per_label`` output order, or a sorted full cache), each
    Nc-block touches only k ≪ C classes, so the dominant ``w @ V``
    contraction collapses into two skinny dots per beta:

        small  = w @ local          (bq, bn) @ (bn, k_max)   — segment sums
        out   += small @ expand     (bq, k_max) @ (k_max, C) — column scatter

    with ``local[r, j] = [label_r == class_j]`` and
    ``expand[j, c] = [class_j == c]`` built on the VPU from the block's
    label slice + a per-block distinct-class table. At ImageNet geometry
    (bn=512..1024, C=1000, k≈2) this is ~6x less MXU work and removes the
    (Nc, C) value streaming entirely (reference dense form:
    ``tip_adapter/utils.py:109-118``, ``image_attention.py:106-110``).

    Correct for ANY row order (the table adapts); efficient for grouped
    rows. Raises if a block needs more than ``k_limit`` distinct classes —
    callers fall back to :func:`cache_attention` (see
    ``methods/cache.py:cache_logits_for_betas``).

    ``cache_labels`` must be host-available (numpy or fetchable): the class
    table is static kernel input.
    """
    nt, d = test_features.shape
    nc, _ = cache_features.shape
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    # -1 marks pad/disabled rows (zero value vector — contributes nothing),
    # mirroring cache_attention's zero-value-row padding invariant
    labels = np.asarray(cache_labels, np.int32).reshape(-1)
    assert labels.shape[0] == nc, (labels.shape, nc)
    if labels.size and (labels.min() < -1 or labels.max() >= num_classes):
        raise ValueError("cache_labels out of range")

    d_p = _ceil_to(d, 128)
    c_p = _ceil_to(max(num_classes, 128), 128)
    f_bytes = jnp.dtype(compute_dtype).itemsize
    auto_bq, auto_bn, auto_bb = _pick_blocks_onehot(d_p, c_p, f_bytes)
    block_q = block_q or auto_bq
    block_n = block_n or auto_bn
    block_b = block_b or min(auto_bb, max(1, betas.shape[0]))
    nc_p = _ceil_to(nc, block_n)

    labels_p = np.full((nc_p,), -1, np.int32)
    labels_p[:nc] = labels
    crow8, ccol128, k_max = onehot_table_operands(labels_p, block_n)
    if k_max > k_limit:
        raise ValueError(
            f"one-hot kernel: a cache block spans {k_max} classes (> {k_limit}); "
            "group rows by class or use cache_attention_labels/cache_attention")

    f = test_features.astype(compute_dtype) if jnp.issubdtype(
        test_features.dtype, jnp.floating) else test_features
    cf = cache_features.astype(compute_dtype) if jnp.issubdtype(
        cache_features.dtype, jnp.floating) else cache_features
    return _cache_attention_onehot_jit(
        f, cf, jnp.asarray(labels_p.reshape(-1, 1)),
        jnp.asarray(crow8), jnp.asarray(ccol128),
        betas.astype(jnp.float32),
        block_q=block_q, block_n=block_n, block_b=block_b,
        c_p=c_p, num_classes=num_classes, interpret=interpret,
        compute_dtype=compute_dtype,
    )


def onehot_pallas(f, cf, labels2d, crow8, ccol128, betas, *,
                  block_q, block_n, block_b, c_p, num_classes,
                  interpret, compute_dtype):
    """Traceable one-hot kernel launch (also usable INSIDE shard_map for the
    N-sharded pod composition — ``parallel/sharded_cache.py``). ``labels2d``
    (nc_p, 1) and the tile-legal class tables ``crow8`` (num_n * 8, k_max) /
    ``ccol128`` (k_max, num_n * 128) — see :func:`onehot_table_operands` —
    must already be block_n-aligned; f/betas pad here."""
    nt, d = f.shape
    b = betas.shape[0]
    d_p = _ceil_to(d, 128)
    nt_p = _ceil_to(nt, block_q)
    nc_p = labels2d.shape[0]
    b_p = _ceil_to(b, block_b)
    num_n = nc_p // block_n
    num_bb = b_p // block_b
    k_max = crow8.shape[1]
    assert crow8.shape[0] == num_n * 8 and ccol128.shape == (k_max, num_n * 128), (
        crow8.shape, ccol128.shape, num_n, k_max)

    f = _pad_axis(_pad_axis(f, 1, d_p), 0, nt_p)
    cf = _pad_axis(_pad_axis(cf, 1, d_p), 0, nc_p)
    bet = jnp.concatenate([
        betas, jnp.full((b_p - b,), betas[-1], jnp.float32),
    ]) if b_p != b else betas
    bet2d = bet.reshape(num_bb, block_b)

    def kernel(beta_ref, lab_ref, crow_ref, ccol_ref, f_ref, c_ref, o_ref):
        bb_idx = pl.program_id(0)
        n_idx = pl.program_id(2)

        @pl.when(n_idx == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        fq = f_ref[:]                                 # (bq, d_p)
        cn = c_ref[:]                                 # (bn, d_p)
        lab = lab_ref[:]                              # (bn, 1) int32
        # local[r, j] = [label_r == class_j]; pad rows (-1) and pad class
        # slots (-2) never match, contributing exactly zero. local rides in
        # the compute dtype (0/1 are exact in bf16) so `w @ local` has the
        # SAME addends as the dense kernel's `w @ V`; the expand scatter
        # stays f32 end-to-end — rounding `small` to bf16 would lose up to
        # ~2^-9 relative on ~1e3-sized class sums and break dense parity.
        crow = crow_ref[0:1, :]                       # (1, k_max) int32
        local = (lab == crow).astype(compute_dtype)   # (bn, k_max)
        col = ccol_ref[:, 0:1]                        # (k_max, 1) int32
        iota = jax.lax.broadcasted_iota(jnp.int32, (k_max, c_p), 1)
        expand = (col == iota).astype(compute_dtype)  # (k_max, c_p), 0/1 exact
        aff = jax.lax.dot_general(
            fq, cn, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                             # (bq, bn) f32
        for bi in range(block_b):
            beta = beta_ref[bb_idx, bi]
            # no explicit bf16 cast of w: the MXU truncates the f32 operand
            # to the compute dtype itself (measured bit-identical on chip),
            # saving a (bq, bn) VPU cast per beta
            w = jnp.exp(-beta * (1.0 - aff))
            small = jnp.dot(w, local, preferred_element_type=jnp.float32)
            # Exact expand scatter in three one-pass dots: the MXU's default
            # dot truncates the f32 `small` to bf16 (2^-9 relative on
            # ~1e3-sized class sums — breaks dense parity; measured 0.24 abs
            # on chip, invisible in interpret mode), and Precision.HIGHEST
            # fixes it but costs ~6 passes (measured 1.14x vs dense at
            # ImageNet geometry, against 1.77x for this split). Splitting
            # small = hi + mid + lo into bf16 terms is EXACT — each residual
            # subtraction is exact in f32 and the last residual fits bf16's
            # 8 mantissa bits — and each product is x1.0, so three default
            # dots reconstruct the f32 scatter bit-for-bit.
            hi = small.astype(compute_dtype)
            r1 = small - hi.astype(jnp.float32)
            mid = r1.astype(compute_dtype)
            lo = (r1 - mid.astype(jnp.float32)).astype(compute_dtype)
            o_ref[bi] += (
                jnp.dot(hi, expand, preferred_element_type=jnp.float32)
                + jnp.dot(mid, expand, preferred_element_type=jnp.float32)
                + jnp.dot(lo, expand, preferred_element_type=jnp.float32))

    grid = (num_bb, nt_p // block_q, num_n)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((num_bb, block_b), lambda bb, q, n: (0, 0)),
            pl.BlockSpec((block_n, 1), lambda bb, q, n: (n, 0)),
            pl.BlockSpec((8, k_max), lambda bb, q, n: (n, 0)),
            pl.BlockSpec((k_max, 128), lambda bb, q, n: (0, n)),
            pl.BlockSpec((block_q, d_p), lambda bb, q, n: (q, 0)),
            pl.BlockSpec((block_n, d_p), lambda bb, q, n: (n, 0)),
        ],
        out_specs=pl.BlockSpec(
            (block_b, block_q, c_p), lambda bb, q, n: (bb, q, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b_p, nt_p, c_p), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nt_p * nc_p * d_p * num_bb
            + b_p * (2 * nt_p * nc_p * k_max + 2 * nt_p * k_max * c_p * num_n
                     + 2 * nt_p * nc_p),
            bytes_accessed=(nt_p * d_p * 2 + nc_p * d_p * 2
                            + b_p * nt_p * c_p * 4),
            transcendentals=b_p * nt_p * nc_p,
        ),
    )(bet2d, labels2d, crow8, ccol128, f, cf)
    return out[:b, :nt, :num_classes]


_cache_attention_onehot_jit = functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_n", "block_b", "c_p", "num_classes",
                     "interpret", "compute_dtype"),
)(onehot_pallas)


def labels_dense_pallas(f, cf, labels2d, betas, *,
                        block_q, block_n, block_b, c_p, num_classes,
                        interpret, compute_dtype):
    """Traceable label-built dense launch (shard_map-compatible): the
    one-hot value BLOCK is rebuilt on the VPU from the (bn, 1) label slice
    each grid step — full dense ``w @ V`` MXU cost, but the (Nc, C) value
    matrix is never materialized in or streamed from HBM, and NO class
    tables exist, so any row order works. ``labels2d`` (nc_p, 1) must be
    block_n-aligned; f/betas pad here."""
    nt, d = f.shape
    b = betas.shape[0]
    d_p = _ceil_to(d, 128)
    nt_p = _ceil_to(nt, block_q)
    nc_p = labels2d.shape[0]
    b_p = _ceil_to(b, block_b)
    num_n = nc_p // block_n
    num_bb = b_p // block_b

    f = _pad_axis(_pad_axis(f, 1, d_p), 0, nt_p)
    cf = _pad_axis(_pad_axis(cf, 1, d_p), 0, nc_p)
    bet = jnp.concatenate([
        betas, jnp.full((b_p - b,), betas[-1], jnp.float32),
    ]) if b_p != b else betas
    bet2d = bet.reshape(num_bb, block_b)

    def kernel(beta_ref, lab_ref, f_ref, c_ref, o_ref):
        bb_idx = pl.program_id(0)
        n_idx = pl.program_id(2)

        @pl.when(n_idx == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        fq = f_ref[:]                                 # (bq, d_p)
        cn = c_ref[:]                                 # (bn, d_p)
        lab = lab_ref[:]                              # (bn, 1) int32
        # vn[r, c] = [label_r == c]: exactly the dense kernel's value block
        # (pad/disabled rows carry -1 -> all-zero rows). 0/1 are exact in
        # bf16, so numerics match the dense kernel bit-for-bit.
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (block_n, c_p), 1)
        vn = (lab == iota_c).astype(compute_dtype)    # (bn, c_p)
        aff = jax.lax.dot_general(
            fq, cn, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                             # (bq, bn) f32
        for bi in range(block_b):
            beta = beta_ref[bb_idx, bi]
            w = jnp.exp(-beta * (1.0 - aff)).astype(compute_dtype)
            o_ref[bi] += jnp.dot(w, vn, preferred_element_type=jnp.float32)

    grid = (num_bb, nt_p // block_q, num_n)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((num_bb, block_b), lambda bb, q, n: (0, 0)),
            pl.BlockSpec((block_n, 1), lambda bb, q, n: (n, 0)),
            pl.BlockSpec((block_q, d_p), lambda bb, q, n: (q, 0)),
            pl.BlockSpec((block_n, d_p), lambda bb, q, n: (n, 0)),
        ],
        out_specs=pl.BlockSpec(
            (block_b, block_q, c_p), lambda bb, q, n: (bb, q, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b_p, nt_p, c_p), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nt_p * nc_p * d_p * num_bb
            + b_p * (2 * nt_p * nc_p * c_p + 2 * nt_p * nc_p),
            bytes_accessed=(nt_p * d_p * 2 + nc_p * d_p * 2
                            + b_p * nt_p * c_p * 4),
            transcendentals=b_p * nt_p * nc_p,
        ),
    )(bet2d, labels2d, f, cf)
    return out[:b, :nt, :num_classes]


_cache_attention_labels_jit = functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_n", "block_b", "c_p", "num_classes",
                     "interpret", "compute_dtype"),
)(labels_dense_pallas)


def _pick_blocks_labels_dense(d_p: int, c_p: int, f_bytes: int = 2,
                              budget_bytes: int = 14 * 1024 * 1024
                              ) -> tp.Tuple[int, int, int]:
    """Blocks for the label-built dense kernel: the dense chooser's budget
    with the streamed value block replaced by the in-VMEM (bn, c_p) rebuild
    (single-buffered temp, not a double-buffered input)."""
    candidates = [
        (128, 1024, 8), (128, 512, 8), (128, 256, 8), (256, 512, 4),
        (128, 256, 4), (128, 256, 2), (128, 128, 2), (128, 128, 1),
        (64, 128, 1), (32, 128, 1), (16, 128, 1),
    ]
    for bq, bn, bb in candidates:
        need = (2 * bn * d_p * f_bytes + bq * d_p * f_bytes
                + 2 * bb * bq * c_p * 4 + bq * bn * 4 + bn * c_p * f_bytes)
        if need <= budget_bytes:
            return bq, bn, bb
    return 16, 128, 1


def cache_attention_labels(test_features: jax.Array, cache_features: jax.Array,
                           cache_labels: tp.Any, betas: jax.Array,
                           num_classes: int, *,
                           block_q: tp.Optional[int] = None,
                           block_n: tp.Optional[int] = None,
                           block_b: tp.Optional[int] = None,
                           interpret: bool = False,
                           compute_dtype: tp.Any = None) -> jax.Array:
    """Fused sweep for one-hot values built IN-KERNEL from labels.

    Mathematically identical to :func:`cache_attention` with
    ``values = one_hot(cache_labels, num_classes)`` for ANY row order: each
    cache block's value sub-matrix is rebuilt on the VPU from its (bn, 1)
    label slice (a compare against a class iota — ~bn*C bool ops, noise next
    to the block's MXU work), so the (Nc, C) value matrix is never
    materialized in HBM or streamed per (beta-chunk, query-block) — at
    ImageNet geometry that removes ~1GB of HBM residency and the dominant
    value re-read traffic while keeping the dense kernel's exact numerics.
    Unlike :func:`cache_attention_onehot` there is no class-grouping
    requirement and no k_limit; MXU cost stays dense.
    """
    nt, d = test_features.shape
    nc, _ = cache_features.shape
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    labels = np.asarray(cache_labels, np.int32).reshape(-1)
    assert labels.shape[0] == nc, (labels.shape, nc)
    if labels.size and (labels.min() < -1 or labels.max() >= num_classes):
        raise ValueError("cache_labels out of range")

    d_p = _ceil_to(d, 128)
    c_p = _ceil_to(max(num_classes, 128), 128)
    f_bytes = jnp.dtype(compute_dtype).itemsize
    auto_bq, auto_bn, auto_bb = _pick_blocks_labels_dense(d_p, c_p, f_bytes)
    block_q = block_q or auto_bq
    block_n = block_n or auto_bn
    block_b = block_b or min(auto_bb, max(1, betas.shape[0]))
    nc_p = _ceil_to(nc, block_n)

    labels_p = np.full((nc_p,), -1, np.int32)
    labels_p[:nc] = labels
    f = test_features.astype(compute_dtype) if jnp.issubdtype(
        test_features.dtype, jnp.floating) else test_features
    cf = cache_features.astype(compute_dtype) if jnp.issubdtype(
        cache_features.dtype, jnp.floating) else cache_features
    return _cache_attention_labels_jit(
        f, cf, jnp.asarray(labels_p.reshape(-1, 1)),
        betas.astype(jnp.float32),
        block_q=block_q, block_n=block_n, block_b=block_b,
        c_p=c_p, num_classes=num_classes, interpret=interpret,
        compute_dtype=compute_dtype,
    )


def cache_attention_from_labels(test_features: jax.Array,
                                cache_features: jax.Array,
                                cache_labels: tp.Any, betas: jax.Array,
                                num_classes: int, *,
                                interpret: bool = False,
                                k_limit: int = 128) -> jax.Array:
    """Best label-driven kernel for one-hot values; never streams a value
    matrix. Class-grouped rows (sorted residence / top-k-per-class
    selections) take the skinny two-dot :func:`cache_attention_onehot`
    (~6x less MXU work per beta at ImageNet geometry); class-scattered rows
    take :func:`cache_attention_labels` (dense MXU, zero value traffic).
    Mosaic/compile errors propagate — callers fall back to dense values."""
    try:
        return cache_attention_onehot(
            test_features, cache_features, cache_labels, betas, num_classes,
            interpret=interpret, k_limit=k_limit)
    except ValueError:
        return cache_attention_labels(
            test_features, cache_features, cache_labels, betas, num_classes,
            interpret=interpret)


def cache_attention_auto(test_features: jax.Array, cache_features: jax.Array,
                         cache_values: jax.Array,
                         betas: tp.Union[jax.Array, tp.Sequence[float], float],
                         cache_labels: tp.Optional[np.ndarray] = None,
                         num_classes: tp.Optional[int] = None,
                         **kwargs) -> jax.Array:
    """Dispatch: Pallas kernel on TPU, dense XLA reference elsewhere.

    Accepts a scalar / python list of betas for convenience; always returns
    (B, Nt, C). When ``cache_labels`` is provided (values known to be
    one-hot(labels)), the label-driven kernels are tried first
    (:func:`cache_attention_from_labels`: skinny two-dot for class-grouped
    rows, label-built dense otherwise); ANY failure there (Mosaic/VMEM
    compile errors for unusual geometries) falls back to the dense kernel,
    so the fast path is never load-bearing for correctness.
    """
    if not isinstance(betas, jax.Array):
        betas = jnp.atleast_1d(jnp.asarray(betas, jnp.float32))
    on_tpu = jax.default_backend() == "tpu"
    if cache_labels is not None and (on_tpu or ONEHOT_FORCE):
        c = int(num_classes if num_classes is not None else cache_values.shape[1])
        try:
            return cache_attention_from_labels(
                test_features, cache_features, cache_labels, betas, c,
                interpret=not on_tpu)
        except Exception as e:  # noqa: BLE001 — dense kernel is always valid
            import warnings

            warnings.warn(f"label-driven cache kernels unavailable for this "
                          f"shape ({type(e).__name__}: {str(e)[:120]}); dense fallback")
    if on_tpu:
        return cache_attention(test_features, cache_features, cache_values, betas, **kwargs)
    return cache_attention_reference(test_features, cache_features, cache_values, betas)
