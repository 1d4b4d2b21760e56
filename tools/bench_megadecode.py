"""On-chip probe + bench for the decode megakernel (ops/decode_block.py).

1. Mosaic-compiles the kernel at a small geometry and cross-checks the
   outputs against the XLA oracle (catches compile-only issues: the q
   transpose, (1, Tc, 1) scale blocks, scalar stores).
2. Times the kernel standalone at gpt2-large geometry (36 x 1280, H=5120)
   with int8 weights + int8 KV against the unfused GEMV-chain decode's
   measured numbers (docs/KERNELS.md).

Run on the TPU host: ``python tools/bench_megadecode.py [small|large]``.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _setup(n_layer, d, h, nh, t, store, kv_dtype, seed=0, batch=None,
           fill=None):
    import jax
    import jax.numpy as jnp

    from summer_clip_tpu.models import gpt2 as gpt2_mod
    from summer_clip_tpu.ops import decode_block as DB

    cfg = gpt2_mod.GPT2Config("probe", vocab_size=512, n_positions=t,
                              n_embd=d, n_layer=n_layer, n_head=nh)
    # build params without instantiating the full model compute graph
    model = gpt2_mod.GPT2(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(seed),
                                 jnp.zeros((1, 4), jnp.int32))["params"]
    assert params["core"][f"h_0"]["mlp_c_fc"]["kernel"].shape == (d, h)
    packed = DB.pack_core_params(params["core"], n_layer, store=store)
    rng = np.random.RandomState(seed)
    kv = DB.init_mega_kv(n_layer, d, t, kv_dtype, batch=batch)
    n_pre = min(13, t - 2) if fill is None else fill
    shape = ((n_layer, n_pre, d) if batch is None
             else (n_layer, batch, n_pre, d))
    pre = jnp.asarray(rng.randn(*shape).astype(np.float32))
    kq, ks = DB._quant_rows(pre, kv_dtype)
    vq, vs = DB._quant_rows(pre * 0.3, kv_dtype)
    sl = (slice(None), slice(None, n_pre)) if batch is None else \
        (slice(None), slice(None), slice(None, n_pre))
    kv = {"k": kv["k"].at[sl].set(kq), "v": kv["v"].at[sl].set(vq),
          "ks": kv["ks"].at[sl].set(ks), "vs": kv["vs"].at[sl].set(vs)}
    x = jnp.asarray(rng.randn(batch or 1, d).astype(np.float32))
    idx = (jnp.asarray(n_pre, jnp.int32) if batch is None
           else jnp.full((batch,), n_pre, jnp.int32))
    return DB, packed, kv, x, idx


def small() -> None:
    import jax

    DB, packed, kv, x, idx = _setup(2, 256, 1024, 4, 256, "int8",
                                    __import__("jax.numpy", fromlist=["int8"]).int8)
    ref = DB.decode_block_reference(x, packed, kv, idx, nh=4)
    out = DB.decode_block(x, packed, kv, idx, nh=4)   # compiled on-chip
    y_r = np.asarray(ref[0])
    y_k = np.asarray(out[0])
    err = np.abs(y_k - y_r).max() / max(np.abs(y_r).max(), 1e-6)
    print(f"[small] on-chip vs oracle rel err: {err:.2e} "
          f"(MXU accumulation differs from interpret; expect <= ~1e-2)",
          flush=True)
    kd = np.abs(np.asarray(out[1]).astype(np.float32)
                - np.asarray(ref[1]).astype(np.float32)).max()
    print(f"[small] fresh-K row max int diff: {kd}", flush=True)
    assert err < 2e-2, err


def large(iters: int = 50, store: str = "int8") -> None:
    import jax
    import jax.numpy as jnp

    DB, packed, kv, x, idx = _setup(36, 1280, 5120, 20, 1024, store,
                                    jnp.int8 if store == "int8" else jnp.bfloat16)
    wbytes = sum(int(np.prod(packed[k].shape)) for k in
                 ("wqkv", "wproj", "w1", "w2"))
    kvbytes = 2 * 36 * 1024 * 1280
    floor_ms = (wbytes + kvbytes) / 819e9 * 1e3
    plan = DB.plan_for(36, 1280, 5120, 20, 1024, 1)
    print(f"[large] weights {wbytes/1e6:.0f}MB + KV-read {kvbytes/1e6:.0f}MB "
          f"-> {floor_ms:.2f} ms HBM floor; grid {36}x{plan.stages} "
          f"= {36*plan.stages} steps", flush=True)

    t0 = time.perf_counter()
    out = DB.decode_block(x, packed, kv, idx, nh=20)
    s = float(np.asarray(out[0]).sum())
    print(f"[large] compile+first: {time.perf_counter()-t0:.1f}s "
          f"(checksum {s:.3f})", flush=True)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = DB.decode_block(x, packed, kv, idx, nh=20)
        _ = float(np.asarray(out[0]).sum())  # value fetch = execution proof
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"[large] megakernel block stack: {best*1e3:.3f} ms/token "
          f"({best*1e3/floor_ms:.2f}x of its HBM floor) — vs 2.40 ms/tok "
          f"best-of-3 for the unfused int8 GEMV chain (whole decode step, "
          f"docs/KERNELS.md)", flush=True)


def small_batched() -> None:
    """Mosaic-compile + oracle cross-check for the BATCHED kernel (per-
    stream stages, 4D KV blocks, pad masks — compile-only risks)."""
    import jax
    import jax.numpy as jnp

    DB, packed, kv, x, idx = _setup(2, 256, 1024, 4, 256, "int8", jnp.int8,
                                    batch=3)
    idx = jnp.asarray([13, 5, 0], jnp.int32)
    pad = jnp.asarray([2, 0, 0], jnp.int32)
    ref = DB.decode_block_reference(x, packed, kv, idx, nh=4, pad=pad)
    out = DB.decode_block(x, packed, kv, idx, nh=4, pad=pad)  # on-chip
    y_r, y_k = np.asarray(ref[0]), np.asarray(out[0])
    err = np.abs(y_k - y_r).max() / max(np.abs(y_r).max(), 1e-6)
    print(f"[small_b] on-chip batched vs oracle rel err: {err:.2e} "
          f"(expect <= ~1e-2: MXU accumulation differs from interpret)",
          flush=True)
    kd = np.abs(np.asarray(out[1]).astype(np.float32)
                - np.asarray(ref[1]).astype(np.float32)).max()
    print(f"[small_b] fresh-K row max int diff: {kd}", flush=True)
    assert err < 2e-2, err


def large_batched(iters: int = 50, batch: int = 8, fill: int = 1022) -> None:
    """The VERDICT r4 #1 headline: 774M int8 decode at B=8 streams. The
    weight read amortizes over the batch; per-stream KV reads scale with
    each ring's fill level (``fill`` rows live per stream)."""
    import jax
    import jax.numpy as jnp

    DB, packed, kv, x, idx = _setup(36, 1280, 5120, 20, 1024, "int8",
                                    jnp.int8, batch=batch, fill=fill)
    wbytes = sum(int(np.prod(packed[k].shape)) for k in
                 ("wqkv", "wproj", "w1", "w2"))
    # live KV reads per step: fill rows (+scales) per stream, k+v
    kvbytes = 2 * batch * 36 * fill * 1280
    floor_ms = (wbytes + kvbytes) / 819e9 * 1e3
    plan = DB.plan_for(36, 1280, 5120, 20, 1024, 1, nb=batch)
    print(f"[large_b{batch}] weights {wbytes/1e6:.0f}MB (read ONCE for all "
          f"{batch} streams) + live KV {kvbytes/1e6:.0f}MB at fill={fill} "
          f"-> {floor_ms:.2f} ms/step HBM floor; grid 36x{plan.stages}",
          flush=True)

    t0 = time.perf_counter()
    out = DB.decode_block(x, packed, kv, idx, nh=20)
    s = float(np.asarray(out[0]).sum())
    print(f"[large_b{batch}] compile+first: {time.perf_counter()-t0:.1f}s "
          f"(checksum {s:.3f})", flush=True)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = DB.decode_block(x, packed, kv, idx, nh=20)
        _ = float(np.asarray(out[0]).sum())  # value fetch = execution proof
        best = min(best, (time.perf_counter() - t0) / iters)
    agg = batch / best
    print(f"[large_b{batch}] batched megakernel: {best*1e3:.3f} ms/step = "
          f"{best*1e3/batch:.3f} ms/token, {agg:.0f} tok/s aggregate "
          f"({best*1e3/floor_ms:.2f}x of its HBM floor) — vs 565 tok/s "
          f"single-stream megakernel and 2,346 tok/s B=8 XLA batched scan "
          f"(docs/KERNELS.md)", flush=True)


def main() -> None:
    import jax

    from summer_clip_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    from summer_clip_tpu.core.profiling import absorb_first_fetch_stall
    absorb_first_fetch_stall(log=lambda m: print(m, flush=True))
    print(f"backend={jax.default_backend()}", flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("small", "all"):
        small()
    if which in ("small_b", "all"):
        small_batched()
    if which in ("large", "all"):
        large()
    if which in ("large_b8", "all"):
        large_batched()
    if which == "large_bf16":
        large(store="bf16")
    if which.startswith("large_b") and which not in ("large_b8", "large_bf16"):
        large_batched(batch=int(which[7:]))
    if which.startswith("fill_"):   # e.g. fill_256: mid-decode chunk-skip
        large_batched(fill=int(which[5:]))


if __name__ == "__main__":
    main()
