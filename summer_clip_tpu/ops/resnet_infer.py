"""Fused inference path for the ModifiedResNet image tower.

XLA executes the RN50 tower at ~20% MXU because every conv round-trips its
activations through HBM (plus separate BatchNorm passes). This module
provides a TPU-first inference executor over the *same parameter tree* the
Flax module produces:

- BatchNorm folds into the preceding conv at load time (inference-only:
  ``w' = w * gamma/sqrt(var+eps)``, ``b' = beta - mean * gamma/sqrt(var+eps)``),
- every **stride-1 bottleneck** runs as ONE Pallas kernel: the 1x1 -> 3x3 ->
  1x1 chain (+ residual + ReLUs) stays in VMEM for a tile of rows, cutting
  the block's HBM traffic from 7 activation round-trips to one read + one
  write. The 3x3 conv is computed as 9 shifted (rows, C) @ (C, C) matmuls
  on the MXU over a halo-extended row tile,
- stride-2 / downsample blocks and the stem stay on XLA convs (4 of 16
  blocks in RN50),
- the attention pool runs as plain jnp math.

``fused_resnet_encode(variables, images, cfg)`` matches
``CLIP.encode_image`` numerically (see tests) and is used by ClipSession on
TPU for ResNet towers.
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

__all__ = ["fold_conv_bn", "fuse_resnet_params", "fused_bottleneck", "fused_resnet_encode"]


def fold_conv_bn(kernel: jnp.ndarray, bn_params: dict, bn_stats: dict,
                 eps: float = 1e-5) -> tp.Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold BN(scale,bias,mean,var) into a bias-free conv kernel (HWIO)."""
    gamma = jnp.asarray(bn_params["scale"], jnp.float32)
    beta = jnp.asarray(bn_params["bias"], jnp.float32)
    mean = jnp.asarray(bn_stats["mean"], jnp.float32)
    var = jnp.asarray(bn_stats["var"], jnp.float32)
    mult = gamma / jnp.sqrt(var + eps)
    w = jnp.asarray(kernel, jnp.float32) * mult  # broadcast over O (last axis)
    b = beta - mean * mult
    return w, b


def _conv(x, w, b, stride=1, padding=1):
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (out + b.astype(jnp.float32)).astype(x.dtype)


def _avgpool2(x):
    return jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                                 "VALID") / 4.0


# ---------------------------------------------------------------------------
# Fused stride-1 bottleneck kernel
# ---------------------------------------------------------------------------

def _bottleneck_kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                       o_ref, x_vmem, dma_sems, *, tile_h: int, width: int,
                       ww: int, c_in: int, c_mid: int, c_out: int, dtype):
    """One (image, row-tile) program with double-buffered halo DMA.

    The padded image stays in HBM (``x_hbm``: (B, H+2, ww, c_in)); halo
    windows overlap, which block indexing cannot express, so each program
    DMAs its (tile_h + 2)-row window into one of two VMEM slots — and
    prefetches the NEXT program's window into the other slot, hiding the
    copy behind this program's matmuls (scratch persists across the grid).
    o_ref: (1, tile_h, W, c_out).
    """
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    j = pl.program_id(1)
    num_j = pl.num_programs(1)
    step = i * num_j + j
    total = pl.num_programs(0) * num_j
    slot = jax.lax.rem(step, 2)
    nslot = jax.lax.rem(step + 1, 2)

    def dma_for(img, row, target_slot):
        return pltpu.make_async_copy(
            x_hbm.at[img, pl.ds(row * tile_h, tile_h + 2)],
            x_vmem.at[target_slot], dma_sems.at[target_slot])

    @pl.when(step == 0)
    def _():
        dma_for(i, j, slot).start()

    @pl.when(step + 1 < total)
    def _():
        i2 = jax.lax.div(step + 1, num_j)
        j2 = jax.lax.rem(step + 1, num_j)
        dma_for(i2, j2, nslot).start()

    dma_for(i, j, slot).wait()

    height = tile_h
    x = x_vmem[slot].astype(dtype)                  # (th+2, ww, c_in)
    hh = height + 2

    # conv1: 1x1 over the padded region (so conv2 has its 1-px halo in mid)
    x2d = x.reshape(hh * ww, c_in)
    w1 = w1_ref[:].astype(dtype)
    mid = jnp.dot(x2d, w1, preferred_element_type=jnp.float32)
    mid = jnp.maximum(mid + b1_ref[0].astype(jnp.float32), 0.0)
    # zero conv1 outputs that sit on the zero-padding ring of the FULL
    # image: flax pads conv2's input with zeros, not relu(bias). Tile-halo
    # rows inside the image are genuine conv1 outputs and stay. The mask is
    # built in flattened (hh*ww, 1) form — Mosaic cannot shape-cast bools.
    h_total = num_j * height
    flat = jax.lax.broadcasted_iota(jnp.int32, (hh * ww, 1), 0)
    row_global = j * height + flat // ww   # row in the padded full image
    col = flat % ww
    interior = ((row_global >= 1) & (row_global <= h_total)
                & (col >= 1) & (col <= width))
    mid = jnp.where(interior, mid, 0.0)
    mid = mid.astype(dtype).reshape(hh, ww, c_mid)

    # conv2: 3x3 as ONE (H*W, 9*c_mid) @ (9*c_mid, c_mid) matmul — packing
    # the taps into the contraction dim feeds the MXU a K of 9*c_mid
    # instead of nine skinny K=c_mid passes. w2_ref is pre-packed
    # (9*c_mid, c_mid) in (dy, dx) row-major tap order.
    patches = jnp.concatenate([
        mid[dy:dy + height, dx:dx + width, :].reshape(height * width, c_mid)
        for dy in range(3) for dx in range(3)
    ], axis=1)                                      # (H*W, 9*c_mid)
    w2 = w2_ref[:].astype(dtype)
    acc = jnp.dot(patches, w2, preferred_element_type=jnp.float32)
    mid2 = jnp.maximum(acc + b2_ref[0].astype(jnp.float32), 0.0).astype(dtype)

    # conv3: 1x1 to c_out
    w3 = w3_ref[:].astype(dtype)
    out = jnp.dot(mid2, w3, preferred_element_type=jnp.float32)
    out = out + b3_ref[0].astype(jnp.float32)

    # residual (stride-1, c_in == c_out): interior of the input
    identity = x[1:1 + height, 1:1 + width, :].reshape(height * width, c_in)
    out = jnp.maximum(out + identity.astype(jnp.float32), 0.0)
    o_ref[0] = out.reshape(height, width, c_out).astype(o_ref.dtype)


def _pick_tile_h(h: int, w: int, c_in: int, c_mid: int, c_out: int,
                 budget: int = 6 * 1024 * 1024) -> int:
    """Largest divisor of h whose tile activations fit the VMEM budget."""
    for th in sorted({d for d in range(1, h + 1) if h % d == 0}, reverse=True):
        est = (2 * (th + 2) * (w + 2) * c_in * 2      # x scratch bf16, 2 slots
               + (th + 2) * (w + 2) * c_mid * 4      # conv1 out f32
               + th * w * 9 * c_mid * 2              # packed conv2 patches bf16
               + th * w * c_mid * 4                  # conv2 acc f32
               + th * w * c_out * 4                  # conv3 out f32
               + 2 * th * w * c_out * 2)             # out block x2 buffers
        if est <= budget:
            return th
    return 1


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_bottleneck(x: jax.Array, w1, b1, w2, b2, w3, b3, *,
                     interpret: bool = False) -> jax.Array:
    """Stride-1 bottleneck (c_in == c_out) fused into one Pallas kernel.

    x: (B, H, W, C). Weights pre-folded with their BNs:
    w1 (C, Cmid), w2 (3, 3, Cmid, Cmid), w3 (Cmid, C); biases (C_stage,).
    The padded image stays in HBM; each program DMAs an overlapping
    (tile_h + 2)-row halo window into VMEM scratch.
    """
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c_in = x.shape
    c_mid = w1.shape[-1]
    c_out = w3.shape[-1]
    assert c_in == c_out, "fused path requires identity residual"
    tile_h = _pick_tile_h(h, w, c_in, c_mid, c_out)

    # Mosaic requires HBM slice sublane dims aligned to 8: pad the width
    # (second-to-minor) dimension of the halo array up to a multiple of 8.
    ww = -(-(w + 2) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, ww - (w + 1)), (0, 0)))
    b1r, b2r, b3r = (jnp.reshape(t, (1, -1)) for t in (b1, b2, b3))
    # pack the 3x3 taps into the contraction dim: (dy, dx) row-major
    w2_packed = jnp.reshape(w2, (9 * c_mid, c_mid))

    kernel = functools.partial(
        _bottleneck_kernel, tile_h=tile_h, width=w, ww=ww, c_in=c_in,
        c_mid=c_mid, c_out=c_out, dtype=x.dtype)

    return pl.pallas_call(
        kernel,
        grid=(b, h // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # padded image in HBM
            pl.BlockSpec((c_in, c_mid), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c_mid), lambda i, j: (0, 0)),
            pl.BlockSpec((9 * c_mid, c_mid), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c_mid), lambda i, j: (0, 0)),
            pl.BlockSpec((c_mid, c_out), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c_out), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w, c_out), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2, ww, c_in), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret or jax.default_backend() != "tpu",
    )(xp, w1, b1r, w2_packed, b2r, w3, b3r)


# ---------------------------------------------------------------------------
# Parameter folding + full tower executor
# ---------------------------------------------------------------------------

def fuse_resnet_params(variables: dict, layers: tp.Sequence[int]) -> dict:
    """Fold every conv+BN pair of the visual tower into (w, b) tensors."""
    p = variables["params"]["visual"]
    s = variables["batch_stats"]["visual"]
    fused: dict = {"stem": [], "blocks": [], "attnpool": p["attnpool"]}
    for i in (1, 2, 3):
        w, b = fold_conv_bn(p[f"conv{i}"]["kernel"], p[f"bn{i}"], s[f"bn{i}"])
        fused["stem"].append((w, b))

    for stage, n_blocks in enumerate(layers, start=1):
        for blk in range(n_blocks):
            bp, bs = p[f"layer{stage}_{blk}"], s[f"layer{stage}_{blk}"]
            entry = {
                "stride": 2 if (blk == 0 and stage > 1) else 1,
                "has_downsample": "downsample_conv" in bp,
            }
            for i in (1, 2, 3):
                entry[f"c{i}"] = fold_conv_bn(bp[f"conv{i}"]["kernel"],
                                              bp[f"bn{i}"], bs[f"bn{i}"])
            if entry["has_downsample"]:
                entry["down"] = fold_conv_bn(bp["downsample_conv"]["kernel"],
                                             bp["downsample_bn"], bs["downsample_bn"])
            fused["blocks"].append(entry)
    return fused


def _block_xla(x, entry):
    """Reference XLA execution of one bottleneck (any stride)."""
    stride = entry["stride"]
    (w1, b1), (w2, b2), (w3, b3) = entry["c1"], entry["c2"], entry["c3"]
    y = jnp.maximum(_conv(x, w1.reshape(1, 1, *w1.shape[-2:]) if w1.ndim == 2 else w1,
                          b1, 1, 0), 0)
    y = jnp.maximum(_conv(y, w2, b2, 1, 1), 0)
    if stride > 1:
        y = _avgpool2(y)
    y = _conv(y, w3.reshape(1, 1, *w3.shape[-2:]) if w3.ndim == 2 else w3, b3, 1, 0)
    identity = x
    if entry["has_downsample"]:
        if stride > 1:
            identity = _avgpool2(identity)
        wd, bd = entry["down"]
        identity = _conv(identity, wd, bd, 1, 0)
    return jnp.maximum(y + identity, 0)


def _attnpool(x, ap_params, num_heads: int):
    b, h, w, c = x.shape
    x = x.reshape(b, h * w, c).astype(jnp.float32)
    mean = x.mean(axis=1, keepdims=True)
    x = jnp.concatenate([mean, x], axis=1)
    x = x + jnp.asarray(ap_params["positional_embedding"], jnp.float32)[None]
    att = ap_params["attn"]

    def proj(t, name):
        return t @ jnp.asarray(att[name]["kernel"], jnp.float32) + \
            jnp.asarray(att[name]["bias"], jnp.float32)

    q = proj(x[:, :1], "q_proj")
    k = proj(x, "k_proj")
    v = proj(x, "v_proj")
    hd = c // num_heads

    def split(t):
        return t.reshape(b, -1, num_heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    scores = jnp.einsum("bnqd,bnkd->bnqk", qh, kh) / np.sqrt(hd)
    weights = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum("bnqk,bnkd->bnqd", weights, vh)
    o = o.transpose(0, 2, 1, 3).reshape(b, 1, c)
    return proj(o, "out_proj")[:, 0]


def fused_resnet_encode(variables: dict, images: jax.Array, *,
                        layers: tp.Sequence[int], num_heads: int,
                        dtype=jnp.bfloat16, use_pallas: bool = True,
                        interpret: bool = False) -> jax.Array:
    """encode_image over raw params: fused stride-1 blocks, XLA elsewhere."""
    fused = fuse_resnet_params(variables, layers)
    x = images.astype(dtype)
    (w1, b1), (w2, b2), (w3, b3) = fused["stem"]
    x = jnp.maximum(_conv(x, w1, b1, 2, 1), 0)
    x = jnp.maximum(_conv(x, w2, b2, 1, 1), 0)
    x = jnp.maximum(_conv(x, w3, b3, 1, 1), 0)
    x = _avgpool2(x)

    for entry in fused["blocks"]:
        if use_pallas and entry["stride"] == 1 and not entry["has_downsample"]:
            (cw1, cb1), (cw2, cb2), (cw3, cb3) = entry["c1"], entry["c2"], entry["c3"]
            x = fused_bottleneck(
                x, cw1.reshape(cw1.shape[-2], cw1.shape[-1]) if cw1.ndim == 4 else cw1,
                cb1, cw2, cb2,
                cw3.reshape(cw3.shape[-2], cw3.shape[-1]) if cw3.ndim == 4 else cw3,
                cb3, interpret=interpret)
        else:
            x = _block_xla(x, entry)

    return _attnpool(x, fused["attnpool"], num_heads).astype(dtype)
