"""Grid-program variants for the all_logits cold-compile fix (VERDICT r4 #5).

`tools/attr_all_logits_compile.py` pinned the ~100 s all_logits cold cost
to ONE program: the (8 beta x 7 alpha) accuracy grid. `lax.top_k` on the
(50176, 1000) logits compiles in 0.6 s standalone but ~100 s when nested
inside `lax.map` over betas (vmap-vs-map over alphas is irrelevant: 102.0
vs 99.6 s). This times the candidate replacements, checks them for EXACT
agreement with the shipped grid on the same inputs, and reports steady-
state runtime so the fix can't quietly tax the hot loop:

  shipped      — lax.map over betas, vmap over alphas, lax.top_k(5),
                 clip_logits/labels CLOSURE-CAPTURED (as the app shipped)
  shipped_args — IDENTICAL program, clip_logits/labels as jit ARGUMENTS.
                 The first run of this tool found the smoking gun in the
                 compile-helper banner: the captured (50176, 1000) f32
                 clip_logits embeds as a literal MLIR constant —
                 code_len=200,910,146 bytes shipped over the remote_compile
                 HTTP hop. The ~100 s was never the sort-in-loop; it was a
                 200 MB constant riding the compile RPC. (An unrolled-betas
                 arm also OOMed outright: 8 concurrently-live (7, Nt, C)
                 slabs = 14.8 G program memory — lax.map's sequential
                 liveness is load-bearing at this scale.)
  rank_args    — no sort: top-5 membership via the label's rank
                 rank = #(l > l_lab) + #(l == l_lab & idx < lab), which is
                 exactly top_k's index-tiebreak membership; hit1 = rank==0

Run on the TPU host: ``python tools/attr_grid_variants.py [nt]``.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _fetch(x) -> float:
    import jax

    return float(np.asarray(jax.device_get(x)).ravel()[0])


def timed(name: str, fn, *args):
    import jax

    t0 = time.perf_counter()
    compiled = jax.jit(fn).lower(*args).compile()
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = compiled(*args)
    _fetch(jax.tree_util.tree_leaves(out)[0])
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = compiled(*args)
    _fetch(jax.tree_util.tree_leaves(out)[0])
    t_second = time.perf_counter() - t0
    print(f"[grid] {name:9s}: compile {t_compile:6.1f}s  first {t_first:5.1f}s"
          f"  second {t_second:5.2f}s", flush=True)
    return out


def main(nt: int = 50176, c: int = 1000, n_betas: int = 8,
         n_alphas: int = 7) -> None:
    import jax
    import jax.numpy as jnp

    from summer_clip_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    from summer_clip_tpu.core.profiling import absorb_first_fetch_stall
    absorb_first_fetch_stall(log=lambda m: print(m, flush=True))
    print(f"backend={jax.default_backend()} nt={nt}", flush=True)
    kx, kc, kl = jax.random.split(jax.random.PRNGKey(7), 3)
    cache_chunk = jax.jit(
        lambda k: jax.random.normal(k, (n_betas, nt, c), jnp.float32))(kx)
    clip_logits = jax.jit(
        lambda k: jax.random.normal(k, (nt, c), jnp.float32))(kc)
    labels = jax.jit(lambda k: jax.random.randint(k, (nt,), 0, c))(kl)
    alphas = jnp.asarray(np.linspace(0.0, 4.0, n_alphas), jnp.float32)
    for a in (cache_chunk, clip_logits, labels):
        _fetch(a)

    def topk_body(logits):
        top = jax.lax.top_k(logits, 5)[1]
        h1 = (top[:, 0] == labels).astype(jnp.float32).mean()
        h5 = (top == labels[:, None]).any(1).astype(jnp.float32).mean()
        return h1, h5

    def nest(body):
        # clip_logits/labels captured from the enclosing scope -> embedded
        # as MLIR constants (the shipped bug)
        def evaluate(chunk):
            def eval_beta(one):
                return jax.vmap(
                    lambda a: body(clip_logits + a * one))(alphas)
            return jax.lax.map(eval_beta, chunk)
        return evaluate

    def nest_args(body_of):
        # identical program, operands as jit arguments (the fix)
        def evaluate(chunk, clip_logits, labels, alphas):
            body = body_of(labels)
            def eval_beta(one):
                return jax.vmap(
                    lambda a: body(clip_logits + a * one))(alphas)
            return jax.lax.map(eval_beta, chunk)
        return evaluate

    def topk_of(labels):
        def body(logits):
            top = jax.lax.top_k(logits, 5)[1]
            h1 = (top[:, 0] == labels).astype(jnp.float32).mean()
            h5 = (top == labels[:, None]).any(1).astype(jnp.float32).mean()
            return h1, h5
        return body

    def rank_of(labels):
        def body(logits):
            lab = jnp.take_along_axis(logits, labels[:, None], axis=1)
            idx = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            rank = ((logits > lab).sum(1)
                    + ((logits == lab) & (idx < labels[:, None])).sum(1))
            h1 = (rank == 0).astype(jnp.float32).mean()
            h5 = (rank < 5).astype(jnp.float32).mean()
            return h1, h5
        return body

    ref = timed("shipped", nest(topk_body), cache_chunk)
    got_a = timed("shipped_args", nest_args(topk_of), cache_chunk,
                  clip_logits, labels, alphas)
    got_r = timed("rank_args", nest_args(rank_of), cache_chunk,
                  clip_logits, labels, alphas)

    ref = jax.tree_util.tree_map(lambda x: np.asarray(x), ref)
    for name, got in (("shipped_args", got_a), ("rank_args", got_r)):
        diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
                 for a, b in zip(jax.tree_util.tree_leaves(ref),
                                 jax.tree_util.tree_leaves(got))]
        print(f"[grid] {name} vs shipped: max|diff| = {max(diffs):.3e}",
              flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
