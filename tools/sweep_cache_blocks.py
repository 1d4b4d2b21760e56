"""On-chip sweep: cache-kernel block candidates x operand dtypes.

Measures the fused cache-attention kernel at the benchmark shape
(Nt=8192, Nc=131072, D=1024, C=1000, 8 betas) for block (bq, bn, bb)
candidates and operand dtype combos (f32/bf16 features, bf16/int8 values).
Updates to `_pick_blocks` candidate order must cite this sweep
(docs/KERNELS.md records the results).

    python tools/sweep_cache_blocks.py [small]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from summer_clip_tpu.ops.cache_kernels import cache_attention, cache_attention_reference

    small = "small" in sys.argv[1:]
    nt, nc, d, c, nb = (2048, 16384, 1024, 1000, 8) if small else (8192, 131072, 1024, 1000, 8)
    print(f"backend={jax.default_backend()} shape: Nt={nt} Nc={nc} D={d} C={c} B={nb}")

    rng = np.random.RandomState(0)
    f32 = rng.randn(nt, d).astype(np.float32)
    f32 /= np.linalg.norm(f32, axis=1, keepdims=True)
    c32 = rng.randn(nc, d).astype(np.float32)
    c32 /= np.linalg.norm(c32, axis=1, keepdims=True)
    labels = rng.randint(0, c, nc)
    v_onehot = np.eye(c, dtype=np.float32)[labels]
    betas = jnp.linspace(1.0, 11.5, nb)

    operands = {
        "bf16/int8v": (jnp.asarray(f32, jnp.bfloat16), jnp.asarray(c32, jnp.bfloat16),
                       jnp.asarray(v_onehot, jnp.int8)),
    }
    # bb=8 runs ONE affinity pass for all 8 betas (halves affinity FLOPs vs
    # bb=4); needs small bq so the (2*bb*bq*C) f32 out blocks fit VMEM
    blocks = [(128, 512, 8), (128, 256, 8), (64, 512, 8), (64, 1024, 8),
              (256, 512, 4)]

    # correctness anchor once per operand set (small slice)
    ref = np.asarray(cache_attention_reference(
        jnp.asarray(f32[:128]), jnp.asarray(c32[:4096]), jnp.asarray(v_onehot[:4096]), betas))

    results = []
    for oname, (fa, ca, va) in operands.items():
        for bq, bn, bb in blocks:
            try:
                out = cache_attention(fa[:128], ca[:4096], va[:4096], betas,
                                      block_q=bq, block_n=bn, block_b=bb)
                err = np.abs(np.asarray(out) - ref).max()
                if err > 0.05 * np.abs(ref).max():
                    print(f"{oname} ({bq},{bn},{bb}): NUMERIC DRIFT {err:.3f}")
                    continue
                # timed full-shape runs
                float(jnp.sum(cache_attention(fa, ca, va, betas,
                                              block_q=bq, block_n=bn, block_b=bb)))
                dt = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(jnp.sum(cache_attention(fa, ca, va, betas,
                                                  block_q=bq, block_n=bn, block_b=bb)))
                    dt = min(dt, time.perf_counter() - t0)
                qps = nt / dt
                results.append((qps, oname, (bq, bn, bb)))
                print(f"{oname:>11} ({bq:4},{bn:4},{bb}): {qps/1e3:7.1f}k q/s  ({dt*1e3:.0f}ms)",
                      flush=True)
            except Exception as e:
                print(f"{oname:>11} ({bq:4},{bn:4},{bb}): FAIL {type(e).__name__} {str(e)[:120]}",
                      flush=True)
    results.sort(reverse=True)
    print("\nTop 5:")
    for qps, oname, blk in results[:5]:
        print(f"  {qps/1e3:7.1f}k q/s  {oname} {blk}")


if __name__ == "__main__":
    main()
