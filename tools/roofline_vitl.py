"""ViT-L/14 roofline verdict (VERDICT r3 weak #5 / next #6).

Round 3 recorded 855-873 img/s for the ViT-L/14 image tower with every
fused block-half demoted (both measured slower than packed-attention +
XLA MLP at d=1024, t=257) but never wrote down what that number IS
against the hardware: % of MXU bf16 peak, % of the HBM roofline, and
which wall the tower is actually sitting on. This script produces the
arithmetic from XLA's own cost analysis (`compiled.cost_analysis()` —
the same methodology as the ViT-B/16 72% figure in docs/KERNELS.md) so
the verdict can be recorded with numbers instead of vibes.

Reference hot loop this geometry serves:
/root/reference/summer_clip/clip_adapter/save_features.py:31-35 at
ViT-L/14 (the largest tower the reference ships configs for).

Also takes any other tower (--model RN50 etc.) so the same verdict
arithmetic can be recorded for the headline extraction geometry.

    python tools/roofline_vitl.py [--model ViT-L/14] [batch ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

V5E_BF16_PEAK = 197e12   # FLOP/s (197 TFLOP/s v5e bf16 peak), same constant as bench_gpt_large.py
V5E_HBM = 819e9          # B/s


def main(batches, model_name: str = "ViT-L/14") -> None:
    import jax
    import jax.numpy as jnp

    from summer_clip_tpu.models.clip import build_clip

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model, cfg = build_clip(model_name, dtype=dtype)
    print(f"{model_name} ({jax.default_backend()})", flush=True)
    init_rng, data_rng = jax.random.split(jax.random.PRNGKey(0))
    variables = jax.jit(model.init)(
        init_rng,
        jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3), jnp.float32),
        jnp.zeros((1, cfg.context_length), jnp.int32),
    )

    def encode_checksum(variables, images):
        return jnp.sum(
            model.apply(variables, images, method=model.encode_image).astype(jnp.float32)
        )

    for batch in batches:
        images = jax.random.normal(
            data_rng, (batch, cfg.image_resolution, cfg.image_resolution, 3), dtype
        )
        lowered = jax.jit(encode_checksum).lower(variables, images)
        compiled = lowered.compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):  # old jax returns [dict]
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        bytes_accessed = float(cost.get("bytes accessed", 0.0))

        # steady-state throughput, checksum fetch closes the stream
        float(compiled(variables, images))
        iters = max(1024 // batch, 8)
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [compiled(variables, images) for _ in range(iters)]
            float(sum(outs))
            dt = time.perf_counter() - t0
            best = max(best, batch * iters / dt)

        sec_per_img = 1.0 / best
        tflops = flops / batch / sec_per_img / 1e12
        gbps = bytes_accessed / batch / sec_per_img / 1e9
        # time each wall alone would take (roofline components)
        mxu_ms = flops / V5E_BF16_PEAK * 1e3
        hbm_ms = bytes_accessed / V5E_HBM * 1e3
        batch_ms = batch * sec_per_img * 1e3
        bound = "HBM" if hbm_ms > mxu_ms else "MXU"
        floor_ms = max(mxu_ms, hbm_ms)
        print(
            f"batch {batch:4}: {best:7.0f} img/s | XLA cost: "
            f"{flops / batch / 1e9:.1f} GFLOP/img, {bytes_accessed / batch / 1e6:.1f} MB/img\n"
            f"            achieved {tflops:.1f} TFLOP/s ({tflops * 1e12 / V5E_BF16_PEAK:.0%} of bf16 peak), "
            f"{gbps:.0f} GB/s ({gbps * 1e9 / V5E_HBM:.0%} of HBM)\n"
            f"            roofline: MXU-alone {mxu_ms:.2f} ms, HBM-alone {hbm_ms:.2f} ms "
            f"-> {bound}-bound floor {floor_ms:.2f} ms; measured {batch_ms:.2f} ms "
            f"= {batch_ms / floor_ms:.2f}x of floor",
            flush=True,
        )


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--model", default="ViT-L/14")
    parser.add_argument("batches", nargs="*", type=int, default=[32, 64],
                        help="batch sizes to measure (default: 32 64)")
    ns = parser.parse_args()
    main(ns.batches or [32, 64], ns.model)
