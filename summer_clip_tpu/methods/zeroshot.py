"""Zero-shot classifier building + accuracy metrics.

TPU-first version of the reference's per-class python loop
(``summer_clip/clip_model/eval_clip.py:18-30``): instead of C separate
``encode_text`` calls, ALL class x template prompts are tokenized into one
(C*T, 77) batch and pushed through the jitted text tower in fixed-size
chunks — one compilation, MXU-sized batches.

Conventions: features row-major (N, D); classifier (C, D); logits
``100 * f_norm @ w.T`` matching the reference's scale
(``eval_clip`` / ``train_adapter.py:162-186``).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from summer_clip_tpu.models import tokenizer as tokenizer_mod

__all__ = ["zeroshot_classifier", "accuracy", "compute_accuracy", "clip_logits",
           "label_rank"]


def label_rank(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Rank of ``labels[i]`` in ``logits[i]`` under ``lax.top_k``'s index
    tiebreak — WITHOUT the sort.

    ``rank = #(strictly greater) + #(equal at an earlier index)``, so
    ``rank < k`` is exactly membership in ``lax.top_k(logits, k)[1]``
    (pinned incl. crafted ties in tests/test_methods.py), and ``rank == 0``
    is the argmax hit. Replaces the sort-network lowering in accuracy
    grids: ~10x faster per (8 beta x 7 alpha) grid at ImageNet scale
    on-chip (0.09s vs 0.94s, tools/attr_grid_variants.py).
    """
    lab = jnp.take_along_axis(logits, labels[:, None], axis=1)
    idx = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    return ((logits > lab).sum(1)
            + ((logits == lab) & (idx < labels[:, None])).sum(1))


def zeroshot_classifier(encode_text: tp.Callable[[jax.Array], jax.Array],
                        classnames: tp.Sequence[str],
                        templates: tp.Sequence[str],
                        tokenizer: tp.Optional[tp.Any] = None,
                        chunk_size: int = 256,
                        context_length: int = 77) -> jax.Array:
    """Build a (C, D) L2-normalized prompt-ensemble classifier.

    ``encode_text`` maps (B, 77) int32 token ids -> (B, D) features (a jitted
    closure over frozen CLIP params). Per class: encode every template,
    normalize, average, re-normalize.
    """
    prompts = []
    for name in classnames:
        clean = str(name).replace("_", " ")
        prompts.extend(t.format(clean) for t in templates)
    tokens = tokenizer_mod.tokenize(prompts, context_length=context_length,
                                    tokenizer=tokenizer)

    n_total = tokens.shape[0]
    feats_chunks = []
    pad_total = -(-n_total // chunk_size) * chunk_size
    tokens_padded = np.zeros((pad_total, tokens.shape[1]), tokens.dtype)
    tokens_padded[:n_total] = tokens
    tokens_padded[n_total:, 0] = tokens[0, 0] if n_total else 0
    for s in range(0, pad_total, chunk_size):
        feats_chunks.append(encode_text(jnp.asarray(tokens_padded[s:s + chunk_size])))
    feats = jnp.concatenate(feats_chunks)[:n_total].astype(jnp.float32)

    c, t = len(classnames), len(templates)
    feats = feats.reshape(c, t, -1)
    feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    mean = feats.mean(axis=1)
    return mean / jnp.linalg.norm(mean, axis=-1, keepdims=True)


def clip_logits(image_features: jax.Array, classifier: jax.Array,
                scale: float = 100.0) -> jax.Array:
    """``scale * normalize(f) @ w.T`` — the zero-shot logits (Nt, C)."""
    f = image_features.astype(jnp.float32)
    f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
    return scale * f @ classifier.T.astype(jnp.float32)


def accuracy(logits: tp.Union[jax.Array, np.ndarray],
             labels: tp.Union[jax.Array, np.ndarray],
             topk: tp.Sequence[int] = (1,)) -> tp.List[float]:
    """Top-k accuracies in percent."""
    logits = np.asarray(logits)
    labels = np.asarray(labels)
    max_k = max(topk)
    top = np.argpartition(-logits, kth=min(max_k, logits.shape[1] - 1) , axis=1)[:, :max_k]
    # order the top-k slice so that top[:, :k] are the k best
    row_scores = np.take_along_axis(logits, top, axis=1)
    order = np.argsort(-row_scores, axis=1)
    top = np.take_along_axis(top, order, axis=1)
    out = []
    for k in topk:
        hit = (top[:, :k] == labels[:, None]).any(axis=1)
        out.append(float(hit.mean() * 100.0))
    return out


def compute_accuracy(logits, labels) -> tp.Tuple[float, float]:
    """(acc@1, acc@5) pair, reference ``clip_searcher/utils.py:15-21``."""
    k5 = min(5, np.asarray(logits).shape[1])
    a1, a5 = accuracy(logits, labels, topk=(1, k5))
    return a1, a5
