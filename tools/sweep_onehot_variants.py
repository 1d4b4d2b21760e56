"""On-chip sweep of skinny one-hot kernel variants (expand-dot precision
strategy x blocking) at the two production geometries. Decides what
`onehot_pallas` ships (see docs/KERNELS.md round-3 one-hot section).

Variants:
  highest : f32 small @ f32 expand, Precision.HIGHEST   (exact, ~6 passes)
  split3  : small split hi/mid/lo bf16 -> 3 default dots (exact, 3 passes)
  default : one-pass dot (truncates small to bf16; ~2^-9 logits error)
Each also drops the explicit `w` bf16 cast when the variant allows the MXU
to truncate for free.

Run: python tools/sweep_onehot_variants.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from summer_clip_tpu.core.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

import summer_clip_tpu.ops.cache_kernels as ca  # noqa: E402

_ceil_to, _pad_axis = ca._ceil_to, ca._pad_axis


def onehot_variant(f, cf, labels2d, crow8, ccol128, betas, *, block_q, block_n,
                   block_b, c_p, num_classes, compute_dtype, expand_mode,
                   cast_w):
    nt, d = f.shape
    b = betas.shape[0]
    d_p = _ceil_to(d, 128)
    nt_p = _ceil_to(nt, block_q)
    nc_p = labels2d.shape[0]
    b_p = _ceil_to(b, block_b)
    num_n = nc_p // block_n
    num_bb = b_p // block_b
    k_max = crow8.shape[1]
    f = _pad_axis(_pad_axis(f, 1, d_p), 0, nt_p)
    cf = _pad_axis(_pad_axis(cf, 1, d_p), 0, nc_p)
    bet = jnp.concatenate([betas, jnp.full((b_p - b,), betas[-1], jnp.float32)]
                          ) if b_p != b else betas
    bet2d = bet.reshape(num_bb, block_b)

    def kernel(beta_ref, lab_ref, crow_ref, ccol_ref, f_ref, c_ref, o_ref):
        bb_idx = pl.program_id(0)
        n_idx = pl.program_id(2)

        @pl.when(n_idx == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        crow = crow_ref[0:1, :]
        local = (lab_ref[:] == crow).astype(compute_dtype)
        col = ccol_ref[:, 0:1]
        iota = jax.lax.broadcasted_iota(jnp.int32, (k_max, c_p), 1)
        exp_f32 = (col == iota).astype(jnp.float32)
        exp_cd = exp_f32.astype(compute_dtype)
        aff = jax.lax.dot_general(f_ref[:], c_ref[:], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        for bi in range(block_b):
            beta = beta_ref[bb_idx, bi]
            w = jnp.exp(-beta * (1.0 - aff))
            if cast_w:
                w = w.astype(compute_dtype)
            small = jnp.dot(w, local, preferred_element_type=jnp.float32)
            if expand_mode == "highest":
                acc = jnp.dot(small, exp_f32, preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
            elif expand_mode == "split3":
                hi = small.astype(compute_dtype)
                r1 = small - hi.astype(jnp.float32)
                mid = r1.astype(compute_dtype)
                lo = (r1 - mid.astype(jnp.float32)).astype(compute_dtype)
                acc = (jnp.dot(hi, exp_cd, preferred_element_type=jnp.float32)
                       + jnp.dot(mid, exp_cd, preferred_element_type=jnp.float32)
                       + jnp.dot(lo, exp_cd, preferred_element_type=jnp.float32))
            else:  # default
                acc = jnp.dot(small, exp_f32, preferred_element_type=jnp.float32)
            o_ref[bi] += acc

    grid = (num_bb, nt_p // block_q, num_n)
    out = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[pl.BlockSpec((num_bb, block_b), lambda bb, q, n: (0, 0)),
                  pl.BlockSpec((block_n, 1), lambda bb, q, n: (n, 0)),
                  pl.BlockSpec((8, k_max), lambda bb, q, n: (n, 0)),
                  pl.BlockSpec((k_max, 128), lambda bb, q, n: (0, n)),
                  pl.BlockSpec((block_q, d_p), lambda bb, q, n: (q, 0)),
                  pl.BlockSpec((block_n, d_p), lambda bb, q, n: (n, 0))],
        out_specs=pl.BlockSpec((block_b, block_q, c_p),
                               lambda bb, q, n: (bb, q, 0)),
        out_shape=jax.ShapeDtypeStruct((b_p, nt_p, c_p), jnp.float32),
    )(bet2d, labels2d, crow8, ccol128, f, cf)
    return out[:b, :nt, :num_classes]


def bench(nt, nc, d, c, rows_per_class):
    if rows_per_class is not None:
        nc = rows_per_class * c
    rng = np.random.RandomState(0)
    kf, kc = jax.random.split(jax.random.PRNGKey(0))

    def rows(k, n):
        x = jax.random.normal(k, (n, d), jnp.bfloat16).astype(jnp.float32)
        return (x / jnp.linalg.norm(x, axis=1, keepdims=True)).astype(jnp.bfloat16)

    f = jax.jit(rows, static_argnums=1)(kf, nt)
    cf = jax.jit(rows, static_argnums=1)(kc, nc)
    labels = np.sort(rng.randint(0, c, nc)).astype(np.int32) if rows_per_class is None \
        else np.repeat(np.arange(c, dtype=np.int32), rows_per_class)[:nc]
    betas = jnp.linspace(0.1, 11.5, 8)

    # dense baseline via the production kernel
    v = jax.nn.one_hot(jnp.asarray(labels), c, dtype=jnp.int8)

    def run_dense():
        return float(jnp.sum(ca.cache_attention(f, cf, v, betas)))

    s_dense = run_dense()
    t0 = time.perf_counter(); s_dense = run_dense()
    t_dense = time.perf_counter() - t0

    d_p = _ceil_to(d, 128)
    c_p = _ceil_to(max(c, 128), 128)
    results = [("dense", t_dense, 0.0)]
    for bq, bn, bb in ((128, 1024, 8), (128, 2048, 4)):
        pad = (-nc) % bn
        labels_p = np.concatenate([labels, np.full(pad, -1, np.int32)])
        crow8, ccol128, k_max = ca.onehot_table_operands(labels_p, bn)
        lab2d = jnp.asarray(labels_p.reshape(-1, 1))
        cr, cc = jnp.asarray(crow8), jnp.asarray(ccol128)
        for mode, cast_w in (("highest", True), ("split3", False),
                             ("default", False)):
            tag = f"{mode}{'(+cast)' if cast_w else ''} ({bq},{bn},{bb}) k={k_max}"
            try:
                fn = jax.jit(lambda f_, cf_, l_, r_, c_, b_, m=mode, w=cast_w,
                             q=bq, n=bn, blk=bb, k=None: jnp.sum(onehot_variant(
                                 f_, cf_, l_, r_, c_, b_, block_q=q, block_n=n,
                                 block_b=blk, c_p=c_p, num_classes=c,
                                 compute_dtype=jnp.bfloat16, expand_mode=m,
                                 cast_w=w)))
                s = float(fn(f, cf, lab2d, cr, cc, betas))
                t0 = time.perf_counter()
                s = float(fn(f, cf, lab2d, cr, cc, betas))
                dt = time.perf_counter() - t0
                rel = abs(s - s_dense) / max(abs(s_dense), 1e-9)
                results.append((tag, dt, rel))
            except Exception as e:  # noqa: BLE001
                results.append((tag, float("nan"), f"{type(e).__name__}: {str(e)[:60]}"))
    print(f"[Nt={nt} Nc={nc} C={c} rows/class={rows_per_class}]")
    for tag, dt, rel in results:
        print(f"  {tag:34s} {dt:8.3f}s  vs_dense={t_dense/dt if dt == dt else float('nan'):5.2f}x  "
              f"checksum_rel={rel}")


def main():
    print("backend:", jax.default_backend())
    bench(50176, 16384, 1024, 1000, rows_per_class=16)    # top16-per-class
    bench(50176, 1281024, 1024, 1000, rows_per_class=None)  # full sorted cache


if __name__ == "__main__":
    main()
