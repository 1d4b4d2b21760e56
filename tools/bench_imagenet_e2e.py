"""Full-ImageNet thesis workload END-TO-END through the app's resident path.

VERDICT r2 #4: the ImageNet-scale number on record was kernel-only (one
fused-sweep launch); the app path — resident cache fit, host-side
selection, device gather/mask, on-device values, fused 8-beta sweep, jitted
(beta x alpha) accuracy grid — had only been measured at SUN397 scale.
This runs ``apps/image_attention.py``'s own hot-path methods at the real
geometry (Nt=50,176 test rows x Nc=1,281,024 cache rows x D=1024 x C=1000,
reference hot loop ``image_attention.py:100-120``) with bf16 residency:

- 2.6GB features + 2.4GB outs resident (bf16; f32-normalized first),
- synthetic rows are generated ON DEVICE (a host upload of ~5GB through
  the tunneled chip is minutes of wall-clock that says nothing about the
  workload); only the selection inputs (argmax/max over outs — two 1.28M
  vectors, ~10MB) are fetched, exactly what the app's host-side TopK
  selection consumes,
- combos measured: AllLogits (identity selection) and top-16-per-class,
  each with device-computed Hard values, 8 betas x 7 alphas.

Run: ``python tools/bench_imagenet_e2e.py [nt] [nc]``.
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_app(nt: int, nc: int, d: int, c: int):
    """An ImageAttention shell with DEVICE-GENERATED resident state (bf16)."""
    import jax
    import jax.numpy as jnp

    from summer_clip_tpu.apps.image_attention import ImageAttention

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    @functools.partial(jax.jit, static_argnames=("n", "dim"))
    def make_rows(k, n, dim):
        x = jax.random.normal(k, (n, dim), jnp.bfloat16)
        inv = jax.lax.rsqrt(jnp.sum(x.astype(jnp.float32) ** 2, -1, keepdims=True))
        return (x.astype(jnp.float32) * inv).astype(dtype)

    kf, kc, ko, kl, kg, kt = jax.random.split(jax.random.PRNGKey(0), 6)
    pad = (-nc) % 1024
    app = ImageAttention.__new__(ImageAttention)
    app.mesh = None
    app._resident_shards = None
    app._cache_rows = nc
    app._outs_replaced = False
    app._test_norm = make_rows(kf, n=nt, dim=d)
    cache_dev = make_rows(kc, n=nc + pad, dim=d)  # pad rows: unit-norm noise,
    #                                # masked by zero VALUE rows (kernel invariant)
    # outs = noise + a clear winner at a uniformly-drawn class per row. Pure
    # noise is NOT representative: argmax over bf16 noise tie-breaks to the
    # first index, which skews predictions so hard (measured min=1 /
    # median=194 / max=10026 rows per class) that sorted 1024-row blocks span
    # 144 distinct classes and the skinny one-hot kernel correctly refuses
    # (k_limit) in favor of the label-dense variant. Real CLIP logits follow
    # the image's class; uniform-ish predictions are the representative case.
    target = jax.random.randint(kt, (nc + pad, 1), 0, c)

    @jax.jit
    def make_outs(k, target):
        noise = jax.random.normal(k, (nc + pad, c), dtype)
        iota = jax.lax.broadcasted_iota(jnp.int32, (nc + pad, c), 1)
        return noise + jnp.asarray(6.0, dtype) * (iota == target).astype(dtype)

    outs_dev = make_outs(ko, target)
    # PREDICTION-SORTED residence, like the app's setup_model: one device
    # permute of the resident matrices; the tool then treats sorted order as
    # the original order (identity rank), exactly what the app's
    # rank-mapping produces for its selections
    t0 = time.perf_counter()
    preds = np.asarray(jnp.argmax(outs_dev[:nc], axis=1)).astype(np.int32)
    order = np.argsort(preds, kind="stable")
    order_j = jnp.asarray(np.concatenate([order, np.arange(nc, nc + pad)]))
    app._cache_dev = jnp.take(cache_dev, order_j, axis=0)
    app._outs_dev = jnp.take(outs_dev, order_j, axis=0)
    jax.block_until_ready((app._cache_dev, app._outs_dev))
    del cache_dev, outs_dev
    app._resident_order = np.arange(nc)
    app._resident_rank = np.arange(nc)
    app._resident_preds = preds[order]
    app.test_labels = np.asarray(jax.random.randint(kl, (nt,), 0, c))
    app.clip_logits = jax.jit(
        lambda k: jax.random.normal(k, (nt, c), jnp.float32))(kg)
    jax.block_until_ready((app._test_norm, app.clip_logits))
    app._sort_seconds = time.perf_counter() - t0
    return app


def main(nt: int = 50176, nc: int = 1281024, d: int = 1024, c: int = 1000,
         quiet: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from summer_clip_tpu.methods.cache import HardCacheStrategy, select_topk_per_label
    from summer_clip_tpu.methods.zeroshot import label_rank

    def log(msg):
        # stderr: bench.py embeds this tool and must keep stdout to one JSON line
        if not quiet:
            print(msg, file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    app = build_app(nt, nc, d, c)
    hbm = sum(x.dtype.itemsize * x.size for x in
              (app._test_norm, app._cache_dev, app._outs_dev, app.clip_logits))
    log(f"[e2e] resident state built on device in {time.perf_counter() - t0:.1f}s "
        f"(incl. {app._sort_seconds:.1f}s one-time pred-sort): "
        f"{hbm / 1e9:.1f} GB HBM (Nt={nt}, Nc={nc}, D={d}, C={c}, "
        f"{app._cache_dev.dtype})")

    # the selection inputs the app's host-side TopK strategies consume
    t0 = time.perf_counter()
    preds = np.asarray(jnp.argmax(app._outs_dev[:nc], axis=1))
    conf = np.asarray(jnp.max(app._outs_dev[:nc].astype(jnp.float32), axis=1))
    log(f"[e2e] selection inputs fetched (argmax/max over outs): "
        f"{time.perf_counter() - t0:.1f}s")

    betas = [0.1, 1.0, 1.5, 3.5, 5.5, 7.5, 9.5, 11.5]
    alphas = jnp.asarray([0.0, 0.1, 0.5, 1.0, 2.0, 3.0, 4.0])
    labels = jnp.asarray(app.test_labels)
    clip_logits = app.clip_logits
    hard = HardCacheStrategy()

    @jax.jit
    def grid_acc_args(cache_b, clip_logits, labels, alphas):
        # lax.map over betas keeps one (alphas, Nt, C) sort input live at a
        # time (~1.4GB at ImageNet scale); a beta-vmap would materialize the
        # full (8, 7, 50176, 1000) f32 grid (~11GB) and OOM the chip.
        # clip_logits/labels are ARGS, not captures: a captured array embeds
        # as a 200MB MLIR constant and costs ~100s in the remote compile
        # helper (tools/attr_grid_variants.py).
        def eval_beta(one):
            def eval_alpha(a):
                logits = clip_logits + a * one
                # sort-free top-k membership (the app's shipped form)
                rank = label_rank(logits, labels)
                h1 = (rank == 0).astype(jnp.float32).mean()
                h5 = (rank < 5).astype(jnp.float32).mean()
                return h1, h5
            return jax.vmap(eval_alpha)(alphas)
        return jax.lax.map(eval_beta, cache_b)

    def grid_acc(cache_b):
        return grid_acc_args(cache_b, clip_logits, labels, alphas)

    def combo(inds):
        app._last_inds = inds
        app._sel_cache = None
        values = app._device_values(hard)
        assert values is not None
        cache_b = app._fused_cache_logits(None, values, betas)
        a1, _ = grid_acc(cache_b)
        return float(jnp.max(a1))  # scalar fetch closes the window

    results = {}
    for name, inds in (("all_logits (identity, 1.28M rows)", np.arange(nc)),
                       ("top16_per_pred_class (16k rows)",
                        select_topk_per_label(preds, conf, 16))):
        t0 = time.perf_counter()
        combo(inds)
        log(f"[e2e] {name}: compile+first combo {time.perf_counter() - t0:.1f}s")
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            combo(inds)
            best = min(best, time.perf_counter() - t0)
        results[name] = best
        log(f"[e2e] {name}: {best:.2f}s per full combo "
            f"(8 betas x 7 alphas = 56 grid points, end-to-end)")
    return {"hbm_gb": hbm / 1e9, "combos": results}


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    from summer_clip_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    from summer_clip_tpu.core.profiling import absorb_first_fetch_stall
    absorb_first_fetch_stall(log=lambda m: print(m, flush=True))
    main(*args)
