"""A/B: dense fused cache kernel vs the structure-exploiting one-hot kernel.

The thesis workload's dominant cost is ``w @ V`` with V a ONE-HOT value
matrix (Hard values / Tip-Adapter). ``cache_attention_onehot`` never builds
V: with class-grouped rows, each Nc-block touches k << C classes and the
contraction collapses to two skinny dots (segment-sum + column scatter) —
~6x less MXU work at ImageNet geometry plus zero value streaming. This tool
measures both kernels at the two production scales and checks numerics.

Run: python tools/bench_onehot_kernel.py  (full scale needs the chip)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from summer_clip_tpu.core.compile_cache import enable_persistent_cache  # noqa: E402


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def bench(nt: int, nc: int, d: int, c: int, n_betas: int = 8,
          rows_per_class: int | None = None, iters: int = 3) -> None:
    import jax
    import jax.numpy as jnp

    from summer_clip_tpu.ops.cache_kernels import (
        cache_attention, cache_attention_onehot)

    interp = jax.default_backend() != "tpu"
    key = jax.random.PRNGKey(0)
    kf, kc, kl = jax.random.split(key, 3)

    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def make_rows(k, n):
        x = jax.random.normal(k, (n, d), jnp.bfloat16)
        inv = jax.lax.rsqrt(jnp.sum(x.astype(jnp.float32) ** 2, -1, keepdims=True))
        return (x.astype(jnp.float32) * inv).astype(jnp.bfloat16)

    f = make_rows(kf, n=nt)
    cf = make_rows(kc, n=nc)
    # class-GROUPED labels, like the app's prediction-sorted residence
    per = rows_per_class or -(-nc // c)
    labels = np.sort(np.arange(nc) // per % c).astype(np.int32)
    values = jax.nn.one_hot(jnp.asarray(labels), c, dtype=jnp.int8)
    betas = jnp.linspace(0.1, 11.5, n_betas)
    jax.block_until_ready((f, cf, values))

    def run_dense():
        return float(jnp.sum(cache_attention(f, cf, values, betas,
                                             interpret=interp)))

    def run_onehot():
        return float(jnp.sum(cache_attention_onehot(f, cf, labels, betas, c,
                                                    interpret=interp)))

    tag = f"[Nt={nt} Nc={nc} D={d} C={c} B={n_betas} k/blk~{1024 // per + 1}]"
    t0 = time.perf_counter(); s_dense = run_dense()
    log(f"{tag} dense compile+first: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter(); s_onehot = run_onehot()
    log(f"{tag} onehot compile+first: {time.perf_counter() - t0:.1f}s")
    rel = abs(s_dense - s_onehot) / max(abs(s_dense), 1e-9)
    # timed windows (scalar fetch closes each — tunnel rule)
    t_dense = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter(); run_dense()
        t_dense = min(t_dense, time.perf_counter() - t0)
    t_onehot = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter(); run_onehot()
        t_onehot = min(t_onehot, time.perf_counter() - t0)
    log(f"{tag} dense {t_dense:.3f}s  onehot {t_onehot:.3f}s  "
        f"speedup {t_dense / t_onehot:.2f}x  checksum rel diff {rel:.2e}")


def main() -> None:
    import jax

    enable_persistent_cache()
    log(f"backend={jax.default_backend()}")
    if jax.default_backend() != "tpu":
        # CPU smoke at tiny shapes (interpret kernels)
        bench(64, 2048, 128, 37, n_betas=4, iters=1)
        return
    # top16-per-class selection scale (16 rows/class, 16k rows)
    bench(50176, 16384, 1024, 1000, rows_per_class=16)
    # full ImageNet cache (1281 rows/class)
    bench(50176, 1281024, 1024, 1000)


if __name__ == "__main__":
    main()
