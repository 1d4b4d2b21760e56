"""The 11-dataset accuracy-parity table vs the torch reference (one command).

BASELINE.json target 2: "top-1 within 0.1% across the 11 CoOp datasets".
This is the activation kit — pointed at a user-supplied assets directory it
produces the whole table; in this offline image (no weights, no datasets)
its code path is proven by ``--dry-run`` against the independent torch
oracle's fake checkpoint + the synthetic dataset (tests/test_parity_oracle.py).

Usage (real assets)::

    python tools/parity_table.py --assets /path/to/assets --model ViT-B/16

with an assets layout::

    assets/
      ViT-B-16.pt                     # OpenAI checkpoint (torchscript or sd)
      bpe_simple_vocab_16e6.txt.gz    # CLIP BPE merges (or merges.txt/tokenizer.json)
      datasets/
        caltech-101/ oxford_pets/ ... # the public CoOp dataset layouts

Both frameworks run the SAME preprocessing + tokenization: images through
``EvalTransform`` (bicubic resize, center crop, CLIP normalize), text
through this repo's BPE. For every dataset the test split is encoded by the
Flax towers (jitted) and by the torch checkpoint (CPU), zero-shot
classifiers are built per-framework from the dataset's own prompt template
set, and top-1 accuracies + their delta are reported. Reference flow being
reproduced: ``clip_model/eval_clip.py:18-61`` per dataset.

Dry run (no assets; CI-tested)::

    python tools/parity_table.py --dry-run
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import typing as tp
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

COOP_11 = ["imagenet", "caltech101", "oxford_pets", "stanford_cars",
           "oxford_flowers", "food101", "fgvc", "sun397", "dtd",
           "eurosat", "ucf101"]

CKPT_ALIASES = {  # model name -> checkpoint file stems to search for
    "RN50": ["RN50"], "RN101": ["RN101"],
    "ViT-B/32": ["ViT-B-32"], "ViT-B/16": ["ViT-B-16"],
    "ViT-L/14": ["ViT-L-14"],
}


def find_checkpoint(assets: Path, model: str) -> Path:
    stems = CKPT_ALIASES.get(model, [model.replace("/", "-")])
    for stem in stems:
        for p in sorted(assets.rglob(f"{stem}.pt")):
            return p
    raise FileNotFoundError(f"no {model} checkpoint (*.pt) under {assets}")


def find_merges(assets: Path) -> tp.Optional[Path]:
    for name in ("bpe_simple_vocab_16e6.txt.gz", "merges.txt", "tokenizer.json"):
        for p in sorted(assets.rglob(name)):
            return p
    return None


def load_torch_model(path: Path):
    """torchscript archive or plain state dict -> eval'd torch module."""
    import torch

    try:
        return torch.jit.load(str(path), map_location="cpu").float().eval()
    except Exception:
        from summer_clip_tpu.models.clip.convert import load_torch_state_dict, detect_model_name
        from tools.torch_clip_oracle import build_torch_clip

        sd = load_torch_state_dict(path)
        name = detect_model_name(sd)
        tm = build_torch_clip(name)
        tm.load_state_dict({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()})
        return tm.float().eval()


def _classifier(encode, tokenizer, classnames, templates, context_length):
    """(C, D) L2-normalized template-ensemble classifier (eval_clip.py:18-30)."""
    from summer_clip_tpu.models.tokenizer import tokenize

    rows = []
    for cname in classnames:
        texts = [t.format(cname) for t in templates]
        toks = tokenize(texts, context_length=context_length, tokenizer=tokenizer)
        emb = np.asarray(encode(toks)).astype(np.float64)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        mean = emb.mean(axis=0)
        rows.append(mean / np.linalg.norm(mean))
    return np.stack(rows).astype(np.float32)


def eval_dataset(dataset: str, root: str, model, cfg, variables, tmodel,
                 tokenizer, batch: int, limit: tp.Optional[int],
                 dataset_kwargs: tp.Optional[dict] = None) -> dict:
    import jax
    import jax.numpy as jnp
    import torch

    from summer_clip_tpu.data.views import DatasetView

    view = DatasetView(dataset, "test", root, shots=-1,
                       input_size=cfg.image_resolution,
                       **(dataset_kwargs or {}))
    data = view.data[:limit] if limit else view.data

    ours_cls = _classifier(
        lambda toks: model.apply(variables, jnp.asarray(toks), method=model.encode_text),
        tokenizer, view.classes, view.template, cfg.context_length)
    with torch.no_grad():
        theirs_cls = _classifier(
            lambda toks: tmodel.encode_text(torch.from_numpy(toks.astype(np.int64))).numpy(),
            tokenizer, view.classes, view.template, cfg.context_length)

    encode_image = jax.jit(
        lambda imgs: model.apply(variables, imgs, method=model.encode_image))

    from summer_clip_tpu.data.loader import ImageBatcher

    batcher = ImageBatcher(data, batch_size=batch, transform=view.transform,
                           use_native=False)
    n = ours_top1 = theirs_top1 = 0
    for b in batcher:
        imgs = b.images[b.mask]
        labels = b.labels[b.mask]
        ours_f = np.asarray(encode_image(jnp.asarray(b.images)))[b.mask]
        with torch.no_grad():
            theirs_f = tmodel.encode_image(
                torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
        for feats, cls, acc_key in ((ours_f, ours_cls, "ours"),
                                    (theirs_f, theirs_cls, "theirs")):
            fn = feats / np.linalg.norm(feats, axis=1, keepdims=True)
            pred = (fn @ cls.T).argmax(axis=1)
            if acc_key == "ours":
                ours_top1 += int((pred == labels).sum())
            else:
                theirs_top1 += int((pred == labels).sum())
        n += len(labels)
    return {"dataset": dataset, "n": n,
            "acc_ours": 100.0 * ours_top1 / max(n, 1),
            "acc_torch": 100.0 * theirs_top1 / max(n, 1)}


def run_table(assets: tp.Optional[Path], model_name: str,
              datasets: tp.Sequence[str], batch: int,
              limit: tp.Optional[int], tolerance: float,
              dry_run: bool, out: tp.Optional[Path],
              dataset_kwargs: tp.Optional[dict] = None) -> dict:
    import jax.numpy as jnp

    from summer_clip_tpu.models.tokenizer import SimpleTokenizer

    if dry_run:
        import torch

        from summer_clip_tpu.models.clip.configs import build_clip
        from summer_clip_tpu.models.clip.convert import convert_state_dict
        from tools.torch_clip_oracle import build_torch_clip, randomize_

        model_name = model_name if model_name.startswith("test-") else "test-vit"
        tmodel = build_torch_clip(model_name).eval()
        randomize_(tmodel, seed=0)
        # round-trip through a saved fake checkpoint so the loader path runs
        with tempfile.TemporaryDirectory() as td:
            ckpt = Path(td) / f"{model_name}.pt"
            torch.save(tmodel.state_dict(), ckpt)
            tmodel = load_torch_model(ckpt)
            from summer_clip_tpu.models.clip.convert import load_torch_state_dict

            sd = load_torch_state_dict(ckpt)
        variables = convert_state_dict(sd)
        model, cfg = build_clip(model_name, dtype=jnp.float32)
        tokenizer = SimpleTokenizer()
        datasets = ["synthetic"]
        root = ""
        dataset_kwargs = dict(dataset_kwargs or {},
                              image_size=cfg.image_resolution)
    else:
        assert assets is not None
        from summer_clip_tpu.models.clip.convert import load_clip

        merges = find_merges(assets)
        if merges is None:
            raise FileNotFoundError(
                f"no BPE merges asset under {assets} "
                "(bpe_simple_vocab_16e6.txt.gz / merges.txt / tokenizer.json)")
        os.environ["CLIP_BPE_PATH"] = str(merges)
        tokenizer = SimpleTokenizer(merges)
        if not tokenizer.has_merges:
            raise RuntimeError(f"failed to load merges from {merges}")
        ckpt = find_checkpoint(assets, model_name)
        model, cfg, variables = load_clip(ckpt, dtype=jnp.float32)
        tmodel = load_torch_model(ckpt)
        root = str(assets / "datasets") if (assets / "datasets").exists() else str(assets)

    rows = []
    for ds in datasets:
        try:
            row = eval_dataset(ds, root, model, cfg, variables, tmodel,
                               tokenizer, batch, limit, dataset_kwargs)
        except FileNotFoundError as e:
            rows.append({"dataset": ds, "error": str(e)})
            continue
        row["delta"] = row["acc_ours"] - row["acc_torch"]
        row["pass"] = abs(row["delta"]) <= tolerance
        rows.append(row)
        print(json.dumps({"type": "parity_row", **row}), flush=True)

    ok_rows = [r for r in rows if "error" not in r]
    result = {
        "model": model_name, "tolerance": tolerance, "rows": rows,
        "all_pass": bool(ok_rows) and all(r["pass"] for r in ok_rows),
    }
    lines = [f"| dataset | n | acc@1 (tpu) | acc@1 (torch) | delta | <= {tolerance} |",
             "|---|---|---|---|---|---|"]
    for r in rows:
        if "error" in r:
            lines.append(f"| {r['dataset']} | - | - | - | - | SKIPPED ({r['error']}) |")
        else:
            lines.append(f"| {r['dataset']} | {r['n']} | {r['acc_ours']:.2f} | "
                         f"{r['acc_torch']:.2f} | {r['delta']:+.3f} | "
                         f"{'yes' if r['pass'] else 'NO'} |")
    table = "\n".join(lines)
    print(table)
    if out:
        out.write_text(table + "\n\n" + json.dumps(result, indent=2) + "\n")
    return result


def main(argv: tp.Optional[tp.Sequence[str]] = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--assets", type=Path, default=None,
                    help="dir with checkpoint + merges + datasets/")
    ap.add_argument("--model", default="ViT-B/16")
    ap.add_argument("--datasets", nargs="*", default=COOP_11)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--limit", type=int, default=None,
                    help="cap test examples per dataset (smoke runs)")
    ap.add_argument("--tolerance", type=float, default=0.1)
    ap.add_argument("--dry-run", action="store_true",
                    help="fake oracle checkpoint + synthetic dataset (no assets)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (for hosts whose TPU plugin "
                         "would otherwise grab the platform)")
    ap.add_argument("--out", type=Path, default=None)
    args = ap.parse_args(argv)

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    if not args.dry_run and args.assets is None:
        ap.error("--assets is required unless --dry-run")
    result = run_table(args.assets, args.model, args.datasets, args.batch,
                       args.limit, args.tolerance, args.dry_run, args.out)
    return 0 if result["all_pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
