"""ClipGPT at the reference's ACTUAL scale: gpt2-large (774M) on one chip.

VERDICT r2 #2: every measured GPT number so far was gpt2-124M; the
reference trains gpt2-large ClipGPT (``clip_prompt/gpt.py:112-121``,
``conf/train_gpt.yaml``) and decodes it (``gen_gpt.py``). This measures, at
that geometry:

1. the ADAPTER-ONLY train step (the reference's training mode: only the
   CLIP-embedding bridges train, ``gpt.py:94-96``) — bf16 tower, f32
   params/adapter-optimizer, per-block remat (``GPT2Core(remat=True)``),
   ctx 1024, with an XLA cost-analysis roofline,
2. the device-scan KV-cached decode (apps/gen_gpt.py): single-stream and
   batched B=8.

Run on the TPU host: ``python tools/bench_gpt_large.py [batch] [ctx]``.
Results -> docs/KERNELS.md + README measured table.
"""

from __future__ import annotations

import sys
import time
import typing as tp
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench_train(name: str = "gpt2-large", batch: int = 8, ctx: int = 1024,
                remat: bool = True,
                remat_policy: tp.Optional[str] = None) -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from summer_clip_tpu.apps.train_gpt import lm_loss_fn
    from summer_clip_tpu.models import gpt2 as gpt2_mod

    cfg = gpt2_mod.GPT2_CONFIGS[name]
    model = gpt2_mod.ClipGPT(cfg, clip_vocab_size=49408, clip_emb_dim=512,
                             emb_hid_dim=1024, head_hid_dim=1024,
                             dtype=jnp.bfloat16, remat=remat,
                             remat_policy=remat_policy)
    ids = jnp.asarray(np.random.RandomState(0).randint(
        1, 49408, (batch, ctx)), jnp.int32)
    t0 = time.perf_counter()
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 8), jnp.int32))["params"]
    jax.block_until_ready(params)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"[train] init: {time.perf_counter() - t0:.1f}s, "
          f"{n_params / 1e6:.0f}M params", flush=True)

    def label_of(p):
        return ("train" if gpt2_mod.clip_gpt_trainable_mask(p) else "freeze")

    def labels(tree):
        flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
        return jax.tree_util.tree_unflatten(
            treedef, [label_of(path) for path, _ in flat])

    tx = optax.multi_transform(
        {"train": optax.adamw(5e-4, weight_decay=0.1),
         "freeze": optax.set_to_zero()},
        labels)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, ids):
        def loss_of(p):
            return lm_loss_fn(model.apply({"params": p}, ids)["logits"], ids)
        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.perf_counter()
    params, opt_state, loss = train_step(params, opt_state, ids)
    assert np.isfinite(float(loss))
    print(f"[train] compile+first step: {time.perf_counter() - t0:.1f}s "
          f"(loss={float(loss):.3f})", flush=True)

    flops = hbm = None
    try:
        ca = train_step.lower(params, opt_state, ids).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops = float(ca.get("flops", 0.0)) or None
        hbm = float(ca.get("bytes accessed", 0.0)) or None
    except Exception:
        pass

    iters, best = 10, float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        losses = []
        for _ in range(iters):
            params, opt_state, loss = train_step(params, opt_state, ids)
            losses.append(loss)
        assert np.isfinite(float(sum(np.float32(l) for l in losses)))
        best = min(best, (time.perf_counter() - t0) / iters)
    toks = batch * ctx / best
    msg = (f"[train] {name} ClipGPT adapter-only (b={batch}, ctx={ctx}, "
           f"remat={remat}, policy={remat_policy}): "
           f"{best * 1e3:.1f} ms/step = {toks:,.0f} tokens/s")
    if flops:
        msg += f" | {flops / best / 1e12:.1f} TFLOP/s ({flops / best / 197e12:.0%} of bf16 peak)"
    if hbm:
        msg += f" | {hbm / best / 1e9:.0f} GB/s HBM ({hbm / best / 819e9:.0%} of 819GB/s)"
    print(msg, flush=True)


def bench_decode(name: str = "gpt2-large", max_new: int = 128) -> None:
    import jax

    from summer_clip_tpu.apps.gen_gpt import generate_device, generate_device_batched
    from summer_clip_tpu.models import gpt2 as gpt2_mod

    cfg = gpt2_mod.GPT2_CONFIGS[name]
    model = gpt2_mod.ClipGPT(cfg, clip_vocab_size=49408, clip_emb_dim=512,
                             emb_hid_dim=1024, head_hid_dim=1024)
    variables = {"params": jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((1, 4), np.int32))["params"]}
    prompt = list(np.random.RandomState(0).randint(1, 49408, 16))

    t0 = time.perf_counter()
    generate_device(model, variables, prompt, max_new_tokens=max_new,
                    rng=jax.random.PRNGKey(1))
    print(f"[decode] compile+first run: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    generate_device(model, variables, prompt, max_new_tokens=max_new,
                    rng=jax.random.PRNGKey(1))
    single = max_new / (time.perf_counter() - t0)

    generate_device_batched(model, variables, [prompt] * 8,
                            max_new_tokens=max_new, rng=jax.random.PRNGKey(1))
    t0 = time.perf_counter()
    generate_device_batched(model, variables, [prompt] * 8,
                            max_new_tokens=max_new, rng=jax.random.PRNGKey(1))
    agg = 8 * max_new / (time.perf_counter() - t0)
    # f32 parameter-read roofline for one token: all params once from HBM
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables))
    floor_ms = n_params * 4 / 819e9 * 1e3
    print(f"[decode] {name} ClipGPT KV-cached ({max_new} new): "
          f"{single:,.1f} tok/s single ({1e3 / single:.1f} ms/tok vs "
          f"{floor_ms:.1f} ms param-read floor), {agg:,.0f} tok/s at B=8",
          flush=True)

    # weight-only compression: decode is parameter-read-bound, so bf16
    # params halve and int8 quarters the per-token HBM floor (engine/quant)
    import jax.numpy as jnp

    from summer_clip_tpu.engine import quant as Q

    model_bf16 = gpt2_mod.ClipGPT(cfg, clip_vocab_size=49408, clip_emb_dim=512,
                                  emb_hid_dim=1024, head_hid_dim=1024,
                                  dtype=jnp.bfloat16)
    for vname, vvars, kw in (
            ("bf16 params", {"params": Q.cast_params(variables["params"])}, {}),
            ("int8 weights", {"params": Q.quantize_tree(variables["params"])},
             {"quant_int8": True})):
        generate_device(model_bf16, vvars, prompt, max_new_tokens=max_new,
                        rng=jax.random.PRNGKey(1), **kw)
        t0 = time.perf_counter()
        generate_device(model_bf16, vvars, prompt, max_new_tokens=max_new,
                        rng=jax.random.PRNGKey(1), **kw)
        tps = max_new / (time.perf_counter() - t0)
        print(f"[decode] {name} {vname}: {tps:,.1f} tok/s single "
              f"({1e3 / tps:.2f} ms/tok)", flush=True)


def main() -> None:
    import jax

    from summer_clip_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    from summer_clip_tpu.core.profiling import absorb_first_fetch_stall
    absorb_first_fetch_stall(log=lambda m: print(m, flush=True))
    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
    args = sys.argv[1:]
    sections = {"train", "dots", "decode"}
    if args and args[0] in sections:
        sections = {args[0]}
        args = args[1:]
    batch = int(args[0]) if args else 8
    ctx = int(args[1]) if len(args) > 1 else 1024
    # sections are independent: the "dots" remat policy OOMs at 774M B=8
    # ctx=1024 (it saves every (B, H, T, T) f32 score dot = 640MB/layer x 36
    # layers — measured on-chip) and must not take decode down with it
    for label, fn in (
            ("train", lambda: bench_train(batch=batch, ctx=ctx)),
            ("dots", lambda: bench_train(batch=batch, ctx=ctx, remat_policy="dots")),
            ("decode", bench_decode)):
        if label not in sections:
            continue
        try:
            fn()
        except Exception as e:
            print(f"[{label}] FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
