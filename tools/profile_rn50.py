"""Piecewise RN50 timing on the real chip: stem / stages / attnpool.

Finds where the per-batch time goes (VERDICT.md Weak #1: 7,888 img/s vs
>=10k target). Each stage is built standalone with the shapes it sees in
the full tower and timed with a synchronizing scalar fetch.

Run on the tunneled TPU: `python tools/profile_rn50.py [batch]`.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
from flax import linen as nn

from summer_clip_tpu.models.clip import build_clip
from summer_clip_tpu.models.clip.modeling import AttentionPool2d, Bottleneck


def timeit(fn, *args, iters=5, label=""):
    out = fn(*args)
    float(jnp.sum(out).astype(jnp.float32))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out).astype(jnp.float32))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:28s} {best * 1e3:8.2f} ms")
    return best


class Stem(nn.Module):
    width: int
    dtype: object

    @nn.compact
    def __call__(self, x):
        bn = lambda name: nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                                       param_dtype=jnp.float32, name=name)
        x = nn.Conv(self.width // 2, (3, 3), strides=2, padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(bn("bn1")(x))
        x = nn.Conv(self.width // 2, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(x)
        x = nn.relu(bn("bn2")(x))
        x = nn.Conv(self.width, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv3")(x)
        x = nn.relu(bn("bn3")(x))
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class Stage(nn.Module):
    n_blocks: int
    planes: int
    stride: int
    dtype: object

    @nn.compact
    def __call__(self, x):
        for blk in range(self.n_blocks):
            x = Bottleneck(self.planes, stride=self.stride if blk == 0 else 1,
                           dtype=self.dtype, name=f"b{blk}")(x)
        return x


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    rng = jax.random.PRNGKey(0)
    width = 64

    model, cfg = build_clip("RN50", dtype=dtype)
    images = jax.random.normal(rng, (batch, 224, 224, 3), dtype)
    variables = model.init(rng, jnp.zeros((1, 224, 224, 3), jnp.float32),
                           jnp.zeros((1, cfg.context_length), jnp.int32))
    full = jax.jit(lambda v, x: model.apply(v, x, method=model.encode_image))
    t_full = timeit(full, variables, images, label="full encode_image")

    # stage-by-stage with the shapes of the full tower
    stages = [
        ("stem  (224->56, 64ch)", Stem(width, dtype), (batch, 224, 224, 3)),
        ("layer1 (56, 256ch)", Stage(3, width, 1, dtype), (batch, 56, 56, width)),
        ("layer2 (56->28, 512ch)", Stage(4, width * 2, 2, dtype), (batch, 56, 56, width * 4)),
        ("layer3 (28->14, 1024ch)", Stage(6, width * 4, 2, dtype), (batch, 28, 28, width * 8)),
        ("layer4 (14->7, 2048ch)", Stage(3, width * 8, 2, dtype), (batch, 14, 14, width * 16)),
        ("attnpool (7x7 -> 1024)", AttentionPool2d(32, 1024, dtype), (batch, 7, 7, width * 32)),
    ]
    t_sum = 0.0
    for label, mod, shape in stages:
        x = jax.random.normal(rng, shape, dtype)
        v = mod.init(rng, jnp.zeros((1,) + shape[1:], dtype))
        f = jax.jit(lambda v, x, m=mod: m.apply(v, x))
        t_sum += timeit(f, v, x, label=label)
    print(f"{'sum of stages':28s} {t_sum * 1e3:8.2f} ms  (full: {t_full * 1e3:.2f} ms)")
    print(f"full tower: {batch / t_full:.0f} img/s")


if __name__ == "__main__":
    main()
