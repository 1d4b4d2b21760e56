"""Generate per-stage golden activations for the tiny ResNet tower.

VERDICT r3 #5: ``tests/golden/`` pinned the ViT tower only, while the
highest-drift-risk tower is the ModifiedResNet (antialias blur-pool
bottlenecks, BatchNorm running stats, attention pool — the reference loads
RN50 by default, ``/root/reference/summer_clip/clip_model/eval_clip.py:33-61``).

This script taps the INDEPENDENT torch oracle (tools/torch_clip_oracle.py)
per stage on deterministic random weights + BatchNorm stats:

- ``stem_bn3``  — stem output after conv3+bn3 (pre-relu: relu/avg-pool are
  parameterless, and the flax side captures the same bn3 module output)
- ``layer1..4`` — each bottleneck stage's output (NHWC)
- ``image``     — attention-pooled, projected embeddings
- ``text``      — text-tower embeddings on fixed random token ids

and writes ``tests/golden/test_rn_stages.npz``. The companion test
(``tests/test_clip_model.py::TestGoldenRegression::test_tiny_rn_matches_golden``)
rebuilds the same weights, converts them with ``convert_state_dict``, and pins
the flax ModifiedResNet per-stage against this file — so drift in the flax
tower, the converter, OR the oracle architecture is caught at the stage that
introduced it, not just at the final embedding.

Run: ``python tools/make_rn_golden.py`` (CPU, deterministic).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SEED = 1234
BATCH = 2


def main() -> int:
    import torch

    from tools.torch_clip_oracle import build_torch_clip, randomize_

    from summer_clip_tpu.models.clip.configs import CLIP_CONFIGS

    cfg = CLIP_CONFIGS["test-rn"]
    tm = build_torch_clip("test-rn").eval()
    randomize_(tm, seed=SEED)

    rng = np.random.RandomState(SEED)
    res = cfg.image_resolution
    img = rng.randn(BATCH, res, res, 3).astype(np.float32)  # NHWC, flax layout
    toks = rng.randint(1, cfg.vocab_size, (BATCH, cfg.context_length))

    taps: dict[str, np.ndarray] = {}

    def hook(name):
        def fn(_mod, _inp, out):
            # .clone(): the stem's ReLU(inplace=True) would otherwise mutate
            # the hooked storage after the fact (.numpy() shares memory)
            taps[name] = out.detach().clone().numpy()
        return fn

    v = tm.visual
    v.bn3.register_forward_hook(hook("stem_bn3"))
    for k in (1, 2, 3, 4):
        getattr(v, f"layer{k}").register_forward_hook(hook(f"layer{k}"))

    with torch.no_grad():
        taps["image"] = tm.encode_image(
            torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
        taps["text"] = tm.encode_text(torch.from_numpy(toks)).numpy()

    # NCHW -> NHWC for the conv taps so the test compares flax-native layout
    for k in list(taps):
        if taps[k].ndim == 4:
            taps[k] = taps[k].transpose(0, 2, 3, 1)

    out = Path(__file__).resolve().parent.parent / "tests" / "golden"
    np.savez_compressed(out / "test_rn_stages.npz",
                        img=img, toks=toks.astype(np.int32), **taps)
    for k, a in sorted(taps.items()):
        print(f"{k:10s} {a.shape}  |max|={np.abs(a).max():.4f}")

    # cross-check: the flax tower must reproduce every tap before we trust
    # the file as an anchor. CPU f32: the axon plugin's sitecustomize
    # overrides JAX_PLATFORMS programmatically, so force it back via the
    # config API (same dance as tests/conftest.py)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from summer_clip_tpu.models.clip.configs import build_clip
    from summer_clip_tpu.models.clip.convert import convert_state_dict

    sd = {k: t.float().numpy() for k, t in tm.state_dict().items()}
    variables = convert_state_dict(sd)
    model, _ = build_clip("test-rn", dtype=jnp.float32)

    def keep(mdl, _method):
        return mdl.name in {"bn3", "layer1_0", "layer2_0", "layer3_0",
                            "layer4_0"}

    j_img, inter = model.apply(variables, jnp.asarray(img),
                               method=model.encode_image,
                               capture_intermediates=keep,
                               mutable=["intermediates"])
    vis = inter["intermediates"]["visual"]
    got = {
        "stem_bn3": np.asarray(vis["bn3"]["__call__"][0]),
        **{f"layer{k}": np.asarray(vis[f"layer{k}_0"]["__call__"][0])
           for k in (1, 2, 3, 4)},
        "image": np.asarray(j_img),
        "text": np.asarray(model.apply(variables, jnp.asarray(toks),
                                       method=model.encode_text)),
    }
    worst = 0.0
    for k in got:
        rel = np.abs(got[k] - taps[k]).max() / max(np.abs(taps[k]).max(), 1e-9)
        worst = max(worst, rel)
        print(f"flax vs oracle {k:10s} rel={rel:.2e}")
    print(f"worst rel: {worst:.2e}")
    return 0 if worst < 1e-5 else 1


if __name__ == "__main__":
    raise SystemExit(main())
