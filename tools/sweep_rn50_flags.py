"""RN50 headline sweep over XLA compiler flags and fine-grained batch sizes.

The shipped headline (bench.py) is 10.6k img/s at batch 128 = 61% of v5e bf16
peak by XLA's own cost analysis; the residual is conv-emitter choice, which is
sensitive to both the batch dimension and TPU compiler knobs. XLA flags must be
set before backend init, so each configuration runs in a fresh subprocess
(parent mode); ``--child`` does one measurement and prints one line.

    python tools/sweep_rn50_flags.py           # full sweep (parent)
    python tools/sweep_rn50_flags.py --child 128   # one measurement

Measurement methodology matches bench.py's steady state: back-to-back
dispatches closed by a single checksum value fetch (under the tunneled device,
``block_until_ready`` does not prove execution — only fetches do).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def measure(batch: int) -> None:
    import jax
    import jax.numpy as jnp

    from summer_clip_tpu.models.clip import build_clip

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model, cfg = build_clip("RN50", dtype=dtype)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(
        rng, jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3), jnp.float32),
        jnp.zeros((1, cfg.context_length), jnp.int32))

    @jax.jit
    def encode_checksum(variables, images):
        return jnp.sum(model.apply(variables, images, method=model.encode_image)
                       .astype(jnp.float32))

    images = jax.random.normal(rng, (batch, cfg.image_resolution, cfg.image_resolution, 3), dtype)
    t0 = time.perf_counter()
    float(encode_checksum(variables, images))
    compile_s = time.perf_counter() - t0
    iters = max(4096 // batch, 16)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [encode_checksum(variables, images) for _ in range(iters)]
        float(sum(outs))
        dt = time.perf_counter() - t0
        best = max(best, batch * iters / dt)
    print(f"RESULT batch={batch} img_s={best:.0f} ms_batch={batch / best * 1e3:.2f} "
          f"compile_s={compile_s:.0f}", flush=True)


# (label, extra XLA flags) — each runs in a clean subprocess. Unknown flags in
# a given jaxlib fail that child only; the parent records the failure.
FLAG_CONFIGS = [
    ("baseline", ""),
    ("vmem64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("vmem32m", "--xla_tpu_scoped_vmem_limit_kib=32768"),
    ("no_lhs", "--xla_tpu_enable_latency_hiding_scheduler=false"),
    ("lhs_on", "--xla_tpu_enable_latency_hiding_scheduler=true"),
    ("flm_opt", "--xla_tpu_use_repeated_instance_for_preferred_prefetch_time=true"),
    ("async_fus", "--xla_tpu_enable_async_collective_fusion=true"),
]

BATCHES_FINE = [112, 120, 124, 128, 132, 136, 144, 160, 192]


def run_child(batch: int, flags: str, label: str) -> None:
    env = dict(os.environ)
    if flags:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, __file__, "--child", str(batch)],
        env=env, capture_output=True, text=True, timeout=1200)
    out = [l for l in proc.stdout.splitlines() if l.startswith("RESULT")]
    if proc.returncode == 0 and out:
        print(f"[{label:10}] {out[0]}  (wall {time.perf_counter() - t0:.0f}s)", flush=True)
    else:
        tail = (proc.stderr or proc.stdout).strip().splitlines()[-1:]
        print(f"[{label:10}] FAILED rc={proc.returncode}: {tail}", flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        measure(int(sys.argv[2]))
        return
    print("=== phase 1: flag sweep at batch 128 ===", flush=True)
    for label, flags in FLAG_CONFIGS:
        run_child(128, flags, label)
    print("=== phase 2: fine batch sweep (baseline flags) ===", flush=True)
    for batch in BATCHES_FINE:
        run_child(batch, "", f"b{batch}")


if __name__ == "__main__":
    main()
