"""Attribute the ImageNet all_logits cold compile (VERDICT r4 #5).

The bench tail's e2e "all_logits ... compile+first combo" read 98.9 s
(r3) -> 106.4 s (r4) without anyone knowing WHERE the time goes. Two structural
facts about this host shape the measurement:

- **Compiles run out-of-process**: the axon terminal forwards every XLA
  compile to a chipless AOT helper over HTTP (`remote_compile`, see the
  helper banner in any compile error). Per-program compile cost therefore
  includes helper RPC + (first time in a helper process) libtpu dlopen.
- **`block_until_ready` does NOT flush execution on the tunneled chip —
  only value fetches do** (CLAUDE.md). bench.py's `t0` sits after a
  `block_until_ready((f, cf, values))`, so its "compile+first-run" number
  silently includes the deferred on-device DATA GENERATION of the 1.33M
  rows + one-hot, not just the kernel program.

This tool separates the pieces at full ImageNet scale (Nt=50176,
Nc=1281024, C=1000, 8 betas), mirroring bench_imagenet_scale_cache's
exact dtypes (bf16 rows, int8 one-hot values — an earlier f32 draft of
this tool OOMed the chip at 16.26G, which is itself evidence the dense-f32
variant is NOT the shipped program). Rows, each timed with an explicit
scalar fetch as the barrier:

  gen+flush     — compile the generator jits, dispatch, then FETCH one
                  element of every array (this is the hidden cost inside
                  bench.py's first-run number)
  trivial       — one-add program over the big operands: RPC floor
  fused_sweep   — THE kernel program (ops/cache_kernels.cache_attention)
  evaluate      — the (8 beta x 7 alpha) top-5 accuracy grid
                  (lax.map over betas, vmap over alphas — as shipped)
  evaluate_scan — alpha vmap -> lax.map (program-size lever candidate)
  topk_only     — lax.top_k(50k x 1000, 5) isolated

Run on the TPU host: ``python tools/attr_all_logits_compile.py [nt nc]``.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _fetch_scalar(x) -> float:
    """A VALUE fetch — the only operation that provably flushes the
    tunneled device queue (CLAUDE.md rule)."""
    import jax

    idx = (0,) * x.ndim
    return float(np.asarray(jax.device_get(x[idx])))


def timed_compile(name: str, fn, *args, second_run: bool = True) -> None:
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
    _fetch_scalar(first)
    t_first = time.perf_counter() - t0
    t_second = float("nan")
    if second_run:
        t0 = time.perf_counter()
        out = compiled(*args)
        _fetch_scalar(jax.tree_util.tree_leaves(out)[0])
        t_second = time.perf_counter() - t0
    try:
        n_instr = sum(1 for line in compiled.as_text().splitlines()
                      if " = " in line)
    except Exception:
        n_instr = -1
    print(f"[attr] {name:14s}: lower {t_lower:6.1f}s  compile {t_compile:6.1f}s"
          f"  first-run {t_first:6.1f}s  second-run {t_second:6.1f}s"
          f"  (hlo instrs ~{n_instr})", flush=True)


def main(nt: int = 50176, nc: int = 1281024) -> None:
    import functools

    import jax
    import jax.numpy as jnp

    from summer_clip_tpu.core.compile_cache import enable_persistent_cache
    from summer_clip_tpu.ops.cache_kernels import cache_attention

    enable_persistent_cache()
    from summer_clip_tpu.core.profiling import absorb_first_fetch_stall
    absorb_first_fetch_stall(log=lambda m: print(m, flush=True))
    print(f"backend={jax.default_backend()} nt={nt} nc={nc}", flush=True)
    d, c, n_betas, n_alphas = 1024, 1000, 8, 7

    # --- gen+flush: bench.py's exact on-device data recipe ------------------
    t0 = time.perf_counter()

    @functools.partial(jax.jit, static_argnames=("n",))
    def make_rows(k, n):
        x = jax.random.normal(k, (n, d), jnp.bfloat16)
        inv = jax.lax.rsqrt(jnp.sum(x.astype(jnp.float32) ** 2, -1,
                                    keepdims=True))
        return (x.astype(jnp.float32) * inv).astype(jnp.bfloat16)

    kf, kc, kl, kg, kx = jax.random.split(jax.random.PRNGKey(0), 5)
    f = make_rows(kf, n=nt)
    cf = make_rows(kc, n=nc)
    labels = jax.jit(lambda k: jax.random.randint(k, (nc,), 0, c))(kl)
    values = jax.jit(lambda l: jax.nn.one_hot(l, c, dtype=jnp.int8))(labels)
    betas = jnp.linspace(0.1, 11.5, n_betas)
    alphas = jnp.asarray(np.linspace(0.0, 4.0, n_alphas), jnp.float32)
    test_labels = jax.jit(lambda k: jax.random.randint(k, (nt,), 0, c))(kg)
    clip_logits = jax.jit(
        lambda k: jax.random.normal(k, (nt, c), jnp.float32))(kx)
    cache_chunk = jax.jit(
        lambda k: jax.random.normal(k, (n_betas, nt, c), jnp.float32))(kx)
    t_dispatch = time.perf_counter() - t0
    t0 = time.perf_counter()
    for a in (f, cf, labels, values, test_labels, clip_logits, cache_chunk):
        _fetch_scalar(a)
    t_flush = time.perf_counter() - t0
    print(f"[attr] gen+flush     : dispatch+gen-compiles {t_dispatch:6.1f}s  "
          f"value-fetch flush {t_flush:6.1f}s   <-- hidden inside bench.py's "
          f"'compile+first-run'", flush=True)

    # --- trivial: RPC/dispatch floor over the same operands -----------------
    timed_compile("trivial", lambda a, b: (a[:1, :1] + b[:1, :1]).sum()
                  .astype(jnp.float32), cf, values)

    # --- the shipped kernel program (bench_imagenet_scale_cache) ------------
    interp = jax.default_backend() != "tpu"   # CPU smoke only
    timed_compile("fused_sweep",
                  lambda t, ca, v, b: cache_attention(t, ca, v, b,
                                                      interpret=interp),
                  f, cf, values, betas)

    # --- the accuracy grid exactly as shipped (vmap alphas, map betas) ------
    def evaluate(chunk):
        def eval_beta(one):
            def eval_alpha(alpha):
                logits = clip_logits + alpha * one
                top = jax.lax.top_k(logits, 5)[1]
                hit1 = (top[:, 0] == test_labels).astype(
                    jnp.float32).mean() * 100.0
                hit5 = (top == test_labels[:, None]).any(axis=1).astype(
                    jnp.float32).mean() * 100.0
                return hit1, hit5
            return jax.vmap(eval_alpha)(alphas)
        return jax.lax.map(eval_beta, chunk)

    timed_compile("evaluate", evaluate, cache_chunk)

    # --- alpha vmap -> lax.map (program-size lever) -------------------------
    def evaluate_scan(chunk):
        def eval_beta(one):
            def eval_alpha(alpha):
                logits = clip_logits + alpha * one
                top = jax.lax.top_k(logits, 5)[1]
                hit1 = (top[:, 0] == test_labels).astype(
                    jnp.float32).mean() * 100.0
                hit5 = (top == test_labels[:, None]).any(axis=1).astype(
                    jnp.float32).mean() * 100.0
                return hit1, hit5
            return jax.lax.map(eval_alpha, alphas)
        return jax.lax.map(eval_beta, chunk)

    timed_compile("evaluate_scan", evaluate_scan, cache_chunk)

    # --- top_k isolated (suspected sort-network lowering) -------------------
    timed_compile("topk_only",
                  lambda x: jax.lax.top_k(x, 5)[1].sum(), clip_logits)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
