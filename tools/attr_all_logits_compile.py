"""Attribute the ImageNet all_logits cold compile (VERDICT r4 #5).

The bench tail's "compile+first-combo" for the identity-selection ImageNet
program read 98.9 s (r3) -> 106.4 s (r4) without anyone knowing WHERE the
remote compiler spends it. This splits the combo into its constituent
programs at ImageNet scale (Nt=50k test rows, Nc=1.28M cache rows, C=1000)
and times, for each: trace (jit lower), XLA compile, and first run — plus
a size-matched trivial program as the remote-latency baseline.

Programs:
  a) trivial  — same-sized inputs, one add (pure upload + RPC baseline)
  b) fused    — the 8-beta fused cache-attention sweep (Pallas kernel,
                ops/cache_kernels.fused path used by _fused_cache_logits)
  c) evaluate — the (beta-chunk) x alpha top-5 accuracy grid
                (image_attention._grid_eval_fn: lax.map over betas,
                vmap over alphas, lax.top_k(5) over (50k, 1000))
  d) evaluate_scan — (c) with the alpha vmap replaced by lax.map
                (compile-size lever candidate)

Run on the TPU host: ``python tools/attr_all_logits_compile.py [nt nc]``.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timed_compile(name: str, fn, *args) -> None:
    import jax

    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = compiled(*args)
    first = jax.tree_util.tree_leaves(out)[0]
    _ = float(np.asarray(first).ravel()[0])
    t_first = time.perf_counter() - t0
    try:
        n_instr = sum(1 for line in compiled.as_text().splitlines()
                      if " = " in line)
    except Exception:
        n_instr = -1
    print(f"[attr] {name:14s}: lower {t_lower:6.1f}s  compile {t_compile:6.1f}s"
          f"  first-run {t_first:6.1f}s  (hlo instrs ~{n_instr})", flush=True)


def main(nt: int = 50000, nc: int = 1281024) -> None:
    import jax
    import jax.numpy as jnp

    from summer_clip_tpu.core.compile_cache import enable_persistent_cache
    from summer_clip_tpu.ops.cache_kernels import cache_attention

    enable_persistent_cache()
    print(f"backend={jax.default_backend()} nt={nt} nc={nc}", flush=True)
    d, c, n_betas, n_alphas = 1024, 1000, 8, 7
    rng = np.random.RandomState(0)
    test = jnp.asarray(rng.randn(nt, d).astype(np.float32))
    cache = jnp.asarray(rng.randn(nc, d).astype(np.float32))
    values = jnp.asarray((rng.randn(nc, c) > 2.9).astype(np.float32))
    betas = jnp.asarray(np.linspace(0.5, 11.5, n_betas), jnp.float32)
    alphas = jnp.asarray(np.linspace(0.0, 4.0, n_alphas), jnp.float32)
    labels = jnp.asarray(rng.randint(0, c, nt))
    clip_logits = jnp.asarray(rng.randn(nt, c).astype(np.float32))
    cache_chunk = jnp.asarray(rng.randn(n_betas, nt, c).astype(np.float32))

    # a) trivial: same input sizes, one op — remote RPC/upload baseline
    timed_compile("trivial", lambda a, b: (a[:1, :1] + b[:1, :1]).sum(),
                  cache, cache_chunk)

    # b) the fused kernel sweep (identity selection reads the whole cache)
    interp = jax.default_backend() != "tpu"   # CPU smoke only
    timed_compile("fused_sweep",
                  lambda t, ca, v, b: cache_attention(t, ca, v, b,
                                                      interpret=interp),
                  test, cache, values, betas)

    # c) the accuracy grid exactly as shipped (vmap alphas, map betas)
    def evaluate(chunk):
        def eval_beta(one):
            def eval_alpha(alpha):
                logits = clip_logits + alpha * one
                top = jax.lax.top_k(logits, 5)[1]
                hit1 = (top[:, 0] == labels).astype(jnp.float32).mean() * 100.0
                hit5 = (top == labels[:, None]).any(axis=1).astype(
                    jnp.float32).mean() * 100.0
                return hit1, hit5
            return jax.vmap(eval_alpha)(alphas)
        return jax.lax.map(eval_beta, chunk)

    timed_compile("evaluate", evaluate, cache_chunk)

    # d) alpha vmap -> lax.map (program-size lever)
    def evaluate_scan(chunk):
        def eval_beta(one):
            def eval_alpha(alpha):
                logits = clip_logits + alpha * one
                top = jax.lax.top_k(logits, 5)[1]
                hit1 = (top[:, 0] == labels).astype(jnp.float32).mean() * 100.0
                hit5 = (top == labels[:, None]).any(axis=1).astype(
                    jnp.float32).mean() * 100.0
                return hit1, hit5
            return jax.lax.map(eval_alpha, alphas)
        return jax.lax.map(eval_beta, chunk)

    timed_compile("evaluate_scan", evaluate_scan, cache_chunk)

    # e) top_k isolated (the suspected sort-network lowering)
    timed_compile("topk_only",
                  lambda x: jax.lax.top_k(x, 5)[1].sum(), clip_logits)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
