"""Real-text speculative-decoding acceptance + net-throughput measurement.

VERDICT r3 #4: speculative decoding had machinery costs measured (int8
break-even E[accept] = 1.11) but no acceptance number on any real text —
"prove or demote". This tool takes a draft + target ClipGPT trained on the
in-image prose corpus (tools/make_spec_corpus.py -> apps/train_gpt.py) and
measures, on held-out val prompts:

1. teacher-forced per-token agreement alpha (draft argmax == target argmax
   along the target-greedy trajectory),
2. the ACTUAL speculative amortization: emitted tokens per target verify
   iteration (engine/speculative.py return_stats), minus 1 = E[accept],
3. wall tok/s: solo int8 target vs speculative int8 at k in {2, 4, 8}
   (value-fetch timed, tunnel-safe),

and prints the ship/demote verdict speculative decoding must earn.

Run on the TPU host:
  python tools/spec_acceptance.py <draft_ckpt_dir> <target_ckpt_dir> \
      [val_npy] [n_prompts]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(draft_dir: str, target_dir: str,
         val_npy: str = "outputs/spec_corpus/spec_val.npy",
         n_prompts: int = 8, max_new: int = 64) -> int:
    import jax
    import jax.numpy as jnp

    from summer_clip_tpu.apps.gen_gpt import generate_device, load_pretrained_clip_gpt
    from summer_clip_tpu.core.compile_cache import enable_persistent_cache
    from summer_clip_tpu.engine.quant import quantize_tree
    from summer_clip_tpu.engine.speculative import generate_device_speculative
    from summer_clip_tpu.models.tokenizer import get_tokenizer

    enable_persistent_cache()
    tok = get_tokenizer()
    target, tvars = load_pretrained_clip_gpt(target_dir, tok)
    draft, dvars = load_pretrained_clip_gpt(draft_dir, tok)
    print(f"target={target.config.name} draft={draft.config.name} "
          f"backend={jax.default_backend()}", flush=True)

    val = np.load(val_npy)
    prompts = [list(val[i, :16]) for i in range(int(n_prompts))]

    qt = {"params": quantize_tree(tvars["params"])}
    qd = {"params": quantize_tree(dvars["params"])}

    # -- 1. teacher-forced agreement along the target-greedy trajectory ------
    t_arg = jax.jit(lambda v, i: jnp.argmax(target.apply(v, i)["logits"], -1))
    d_arg = jax.jit(lambda v, i: jnp.argmax(draft.apply(v, i)["logits"], -1))

    agree_n = agree_d = 0
    trajs = []
    for p in prompts:
        traj = generate_device(target, qt, p, max_new_tokens=max_new,
                               top_k=1, rng=jax.random.PRNGKey(0),
                               quant_int8=True)
        trajs.append(traj)
        ids = jnp.asarray(np.asarray(traj, np.int32))[None]
        ta = np.asarray(t_arg(qt, ids))[0]
        da = np.asarray(d_arg(qd, ids))[0]
        # positions len(p)-1 .. end-2 predict the decode region
        s, e = len(p) - 1, len(traj) - 1
        agree_n += int((ta[s:e] == da[s:e]).sum())
        agree_d += e - s
    alpha = agree_n / max(agree_d, 1)
    print(f"teacher-forced draft/target agreement alpha = {alpha:.3f} "
          f"({agree_n}/{agree_d} positions, {len(prompts)} val prompts)",
          flush=True)

    # -- 2+3. actual speculative stats + wall throughput ----------------------
    def timed(fn, reps=3):
        fn()
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            _ = int(out[0][-1]) if isinstance(out, tuple) else int(out[-1])
            best = min(best, time.perf_counter() - t0)
        return best

    p0 = prompts[0]
    t_solo = timed(lambda: generate_device(
        target, qt, p0, max_new_tokens=max_new, top_k=1,
        rng=jax.random.PRNGKey(0), quant_int8=True)) / max_new
    print(f"solo target int8: {t_solo * 1e3:.2f} ms/token "
          f"({1 / t_solo:.1f} tok/s)", flush=True)

    best = None
    for k in (2, 4, 8):
        # stats pass (drop the fetch-heavy stats from the timed reps)
        accs, exact = [], True
        for p, traj in zip(prompts, trajs):
            out, st = generate_device_speculative(
                target, qt, draft, qd, p, max_new_tokens=max_new, k=k,
                quant_int8=True, draft_quant_int8=True, return_stats=True)
            exact = exact and out == traj
            accs.append(st["emitted"] / max(st["verify_iters"], 1))
        tpi = float(np.mean(accs))   # tokens per verify iteration
        t_spec = timed(lambda k=k: generate_device_speculative(
            target, qt, draft, qd, p0, max_new_tokens=max_new, k=k,
            quant_int8=True, draft_quant_int8=True)) / max_new
        speed = t_solo / t_spec
        print(f"k={k}: {tpi:.2f} tok/verify-iter (E[accept]={tpi - 1:.2f}), "
              f"{t_spec * 1e3:.2f} ms/token wall = {speed:.2f}x vs solo int8, "
              f"exact={'yes' if exact else 'NO'}", flush=True)
        if best is None or speed > best[1]:
            best = (k, speed, tpi)

    k, speed, tpi = best
    verdict = "SHIP (default-on for trained draft/target pairs)" \
        if speed > 1.02 else "DEMOTE (tested reference, off by default)"
    print(f"verdict: best k={k} at {speed:.2f}x, E[accept]={tpi - 1:.2f} -> "
          f"{verdict}", flush=True)
    return 0


if __name__ == "__main__":
    a = sys.argv[1:]
    raise SystemExit(main(a[0], a[1], *(a[2:] and [a[2]] or []),
                          **({"n_prompts": int(a[3])} if len(a) > 3 else {})))
