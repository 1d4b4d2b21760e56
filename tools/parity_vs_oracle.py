"""Cross-framework parity sweep: Flax towers vs the independent torch oracle.

Runs every requested CLIP architecture at full size: random weights + random
BatchNorm stats are exported from ``tools/torch_clip_oracle.py`` in the exact
``clip.load`` state-dict layout, converted by ``models/clip/convert.py``, and
executed by the Flax towers; reports max|Δ| on image features, text features,
and end-to-end zero-shot argmax agreement. Writes the markdown rows consumed
by ``PARITY_r02.md``.

    python tools/parity_vs_oracle.py [RN50 ViT-B/16 ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def run_one(name: str, batch: int = 8, n_classes: int = 32, seed: int = 1,
            f64: bool = False):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from summer_clip_tpu.models.clip.configs import build_clip
    from summer_clip_tpu.models.clip.convert import convert_state_dict, detect_model_name
    from tools.torch_clip_oracle import build_torch_clip, randomize_

    t0 = time.perf_counter()
    torch.manual_seed(seed)
    tm = build_torch_clip(name).eval()
    randomize_(tm, seed=seed)
    sd = {k: v.float().numpy() for k, v in tm.state_dict().items()}
    detected = detect_model_name(sd)
    assert detected == name, f"detect_model_name: {detected} != {name}"
    variables = convert_state_dict(sd)
    if f64:
        # float64 on both sides separates architecture mismatch (would stay)
        # from f32 rounding amplified through depth (collapses to ~1e-9)
        jax.config.update("jax_enable_x64", True)
        tm = tm.double()
        variables = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), variables)
    model, cfg = build_clip(name, dtype=jnp.float64 if f64 else jnp.float32)

    rng = np.random.RandomState(seed)
    fdtype = np.float64 if f64 else np.float32
    img = rng.randn(batch, cfg.image_resolution, cfg.image_resolution, 3).astype(fdtype)
    # random "class prompts": random token rows whose max id is the EOT position probe
    toks = rng.randint(1, cfg.vocab_size - 1, (n_classes, cfg.context_length))
    eot = rng.randint(2, cfg.context_length, n_classes)
    toks_arr = np.asarray(toks)
    for i, e in enumerate(eot):
        toks_arr[i, e] = cfg.vocab_size - 1   # EOT = highest id, at a random position
        toks_arr[i, e + 1:] = 0

    with torch.no_grad():
        t_img = tm.encode_image(torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
        t_txt = tm.encode_text(torch.from_numpy(toks_arr)).numpy()
    j_img = np.asarray(jax.jit(lambda v, x: model.apply(v, x, method=model.encode_image))(variables, jnp.asarray(img)))
    j_txt = np.asarray(jax.jit(lambda v, t: model.apply(v, t, method=model.encode_text))(variables, jnp.asarray(toks_arr)))

    img_d = np.abs(j_img - t_img).max()
    txt_d = np.abs(j_txt - t_txt).max()
    img_rel = img_d / max(np.abs(t_img).max(), 1e-9)
    txt_rel = txt_d / max(np.abs(t_txt).max(), 1e-9)

    def zs_logits(fi, ft):
        fi = fi / np.linalg.norm(fi, axis=1, keepdims=True)
        ft = ft / np.linalg.norm(ft, axis=1, keepdims=True)
        return 100.0 * fi @ ft.T

    agree = float(np.mean(zs_logits(j_img, j_txt).argmax(1) == zs_logits(t_img, t_txt).argmax(1)))

    def cos(a, b):
        a = a / np.linalg.norm(a, axis=1, keepdims=True)
        b = b / np.linalg.norm(b, axis=1, keepdims=True)
        return float(np.sum(a * b, axis=1).min())

    dt = time.perf_counter() - t0
    return dict(name=name, img_d=float(img_d), txt_d=float(txt_d),
                img_rel=float(img_rel), txt_rel=float(txt_rel),
                cos_img=cos(j_img, t_img), cos_txt=cos(j_txt, t_txt),
                agree=agree, secs=dt)


def main() -> int:
    f64 = "--f64" in sys.argv[1:]
    models = [a for a in sys.argv[1:] if not a.startswith("--")] or [
        "RN50", "RN101", "ViT-B/32", "ViT-B/16", "ViT-L/14"]
    print("| model | max abs dI | rel dI | max abs dT | rel dT | min cos(img) | min cos(txt) | zs argmax agreement | secs |")
    print("|---|---|---|---|---|---|---|---|---|")
    worst = 0.0
    for name in models:
        r = run_one(name, f64=f64)
        worst = max(worst, r["img_rel"], r["txt_rel"])
        print(f"| {r['name']} | {r['img_d']:.2e} | {r['img_rel']:.2e} | {r['txt_d']:.2e} "
              f"| {r['txt_rel']:.2e} | {r['cos_img']:.6f} | {r['cos_txt']:.6f} "
              f"| {r['agree'] * 100:.1f}% | {r['secs']:.0f} |",
              flush=True)
    print(f"\nworst relative drift: {worst:.2e}")
    return 0 if worst < 1e-3 else 1


if __name__ == "__main__":
    raise SystemExit(main())
