"""Golden-activation parity check vs an OpenAI CLIP checkpoint.

Usage (needs the OpenAI `.pt` file and torch; network-free):

    python tools/parity_check.py /path/to/RN50.pt [--image /path/img.jpg]

Loads the checkpoint twice — through this framework's converter into the
Flax towers, and directly executing the torchscript module on CPU — then
compares image/text features and reports max/mean drift. This is the
SURVEY.md §7 "hard part 1" harness: CI can't run it (no checkpoints in the
offline image), but any user with the reference's weights can verify
numerical parity end-to-end.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", help="OpenAI CLIP .pt (torchscript archive)")
    ap.add_argument("--image", default=None, help="optional image file to encode")
    ap.add_argument("--text", default="a photo of a cat")
    ap.add_argument("--tolerance", type=float, default=5e-3)
    args = ap.parse_args()

    import jax.numpy as jnp
    import torch

    from summer_clip_tpu.models.clip.convert import load_clip
    from summer_clip_tpu.models.tokenizer import tokenize
    from summer_clip_tpu.data.transforms import EvalTransform, load_image

    model, cfg, variables = load_clip(args.checkpoint, dtype=jnp.float32)
    print(f"converted checkpoint as {cfg.name}")

    tmodel = torch.jit.load(args.checkpoint, map_location="cpu").float().eval()

    # ---- image tower ----
    if args.image:
        img = EvalTransform(cfg.image_resolution)(load_image(args.image))
    else:
        rng = np.random.RandomState(0)
        img = rng.randn(cfg.image_resolution, cfg.image_resolution, 3).astype(np.float32)
    ours_img = np.asarray(model.apply(variables, jnp.asarray(img[None]),
                                      method=model.encode_image))
    with torch.no_grad():
        theirs_img = tmodel.encode_image(
            torch.from_numpy(img.transpose(2, 0, 1)[None])).numpy()
    img_err = np.abs(ours_img - theirs_img)
    print(f"image features: max |diff| = {img_err.max():.5f}, "
          f"mean = {img_err.mean():.6f}")

    # ---- text tower ----
    tokens = tokenize([args.text], context_length=cfg.context_length)
    ours_txt = np.asarray(model.apply(variables, jnp.asarray(tokens),
                                      method=model.encode_text))
    with torch.no_grad():
        theirs_txt = tmodel.encode_text(torch.from_numpy(tokens.astype(np.int64))).numpy()
    txt_err = np.abs(ours_txt - theirs_txt)
    print(f"text features:  max |diff| = {txt_err.max():.5f}, "
          f"mean = {txt_err.mean():.6f}")

    ok = img_err.max() < args.tolerance and txt_err.max() < args.tolerance
    print("PARITY OK" if ok else "PARITY DRIFT — investigate layer by layer")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
