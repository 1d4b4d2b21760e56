"""Flash attention at its one production-selected shape: GPT-2 ctx 1024.

`ops/attention.py` auto-selects the Pallas flash kernel only when
kv_len >= FLASH_MIN_KV (=1024) — i.e. GPT-2 training/eval at full context.
VERDICT r1 weak #3: that shape had no recorded on-chip measurement. This
script times forward and forward+backward of `multi_head_attention` with
use_flash=True (Pallas fwd + recompute bwd) vs use_flash=False (XLA), at
gpt2-large geometry (width 1280, 20 heads, head_dim 64, T=1024), plus a
full ClipGPT-sized transformer-stack step. Results -> docs/KERNELS.md.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench(fn, *args, iters=20, repeats=3):
    """Steady-state per-call time: a window of back-to-back dispatches with
    ONE closing scalar fetch (the tunnel's ~24ms fetch round-trip would
    otherwise dominate a 30ms kernel)."""
    import jax.numpy as jnp

    def checksum(out):
        out = out[0] if isinstance(out, tuple) else out
        return jnp.sum(out.astype(jnp.float32))

    float(checksum(fn(*args)))  # compile + warm
    dt = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        sums = [checksum(fn(*args)) for _ in range(iters)]
        float(sum(sums))
        dt = min(dt, (time.perf_counter() - t0) / iters)
    return dt


def main() -> None:
    import jax
    import jax.numpy as jnp

    from summer_clip_tpu.ops import attention as A

    print(f"backend={jax.default_backend()}")
    b, heads, hd, t = 8, 20, 64, 1024   # gpt2-large @ full context
    d = heads * hd
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, t, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, t, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, t, d), jnp.bfloat16)

    flops_fwd = 4 * b * heads * t * t * hd  # qk + pv

    for name, use_flash in [("xla", False), ("flash", True)]:
        fwd = jax.jit(lambda q, k, v, uf=use_flash: A.multi_head_attention(
            q, k, v, num_heads=heads, causal=True, use_flash=uf))
        dt = bench(fwd, q, k, v)
        print(f"fwd  {name:5}: {dt * 1e3:7.2f}ms  ({flops_fwd / dt / 1e12:.1f} TFLOP/s)")

    def loss(qkv, uf):
        o = A.multi_head_attention(*qkv, num_heads=heads, causal=True, use_flash=uf)
        return jnp.sum(o.astype(jnp.float32))

    for name, use_flash in [("xla", False), ("flash", True)]:
        g = jax.jit(jax.grad(lambda qkv: loss(qkv, use_flash)))
        dt = bench(lambda qkv: g(qkv)[0], (q, k, v))
        print(f"f+b  {name:5}: {dt * 1e3:7.2f}ms  ({3 * flops_fwd / dt / 1e12:.1f} TFLOP/s)")

    # numeric check at the selected shape
    o_f = A.multi_head_attention(q, k, v, num_heads=heads, causal=True, use_flash=True)
    o_x = A.multi_head_attention(q, k, v, num_heads=heads, causal=True, use_flash=False)
    err = float(jnp.max(jnp.abs(o_f.astype(jnp.float32) - o_x.astype(jnp.float32))))
    print(f"max |flash - xla| = {err:.4f} (bf16 inputs)")

    # --- serving shapes (VERDICT r2 #10: give flash its last plausible
    # targets and record the outcome) -------------------------------------
    # decode step: tq=1 against the full KV history (the last row of the
    # causal mask attends everything -> causal=False is exact)
    for tk_dec in (1024, 4096):
        kd = jnp.asarray(rng.randn(b, tk_dec, d), jnp.bfloat16)
        vd = jnp.asarray(rng.randn(b, tk_dec, d), jnp.bfloat16)
        qd = jnp.asarray(rng.randn(b, 1, d), jnp.bfloat16)
        for name, uf in [("xla", False), ("flash", True)]:
            fn = jax.jit(lambda q, k, v, uf=uf: A.multi_head_attention(
                q, k, v, num_heads=heads, causal=False, use_flash=uf))
            dt = bench(fn, qd, kd, vd)
            gbps = (2 * b * tk_dec * d * 2) / dt / 1e9  # bf16 K+V reads
            print(f"decode tq=1 tk={tk_dec} {name:5}: {dt * 1e6:8.1f}us  "
                  f"(KV read {gbps:.0f} GB/s)")

    # chunked prefill: a late q chunk at q_offset into a long KV history
    # (q_offset causal masking — exactness pinned in tests/test_ops.py)
    for tq_c in (64, 128):
        tk_c, off = 1024 + tq_c, 1024
        kc = jnp.asarray(rng.randn(b, tk_c, d), jnp.bfloat16)
        vc = jnp.asarray(rng.randn(b, tk_c, d), jnp.bfloat16)
        qc = jnp.asarray(rng.randn(b, tq_c, d), jnp.bfloat16)
        for name, uf in [("xla", False), ("flash", True)]:
            fn = jax.jit(lambda q, k, v, uf=uf: A.multi_head_attention(
                q, k, v, num_heads=heads, causal=True, q_offset=off, use_flash=uf))
            dt = bench(fn, qc, kc, vc)
            fl = 4 * b * heads * tq_c * tk_c * hd
            print(f"prefill tq={tq_c} tk={tk_c} {name:5}: {dt * 1e3:7.2f}ms  "
                  f"({fl / dt / 1e12:.2f} TFLOP/s)")


if __name__ == "__main__":
    main()
