"""Universal-trigger search over masked/causal LMs (JAX).

Equivalent of the reference's vendored ucinlp/autoprompt
(``summer_clip/clip_prompt/autoprompt/``): find a universal trigger-token
sequence that steers an LM's predictions toward label tokens.

JAX reshape of the machinery:

- ``GradientStorage``'s backward hook disappears — gradients w.r.t. the
  trigger embeddings are an explicit ``jax.grad``,
- :class:`TriggerTemplate` (the ``PredictWrapper``/templatizer) splices
  trigger ids into templated inputs at fixed slots and tracks the predict
  position,
- :func:`label_logprob` scores (multi-token) label ids at the predict
  position (``AccuracyFn`` semantics),
- :func:`hotflip_candidates` + :func:`trigger_search_step` implement the
  averaged-gradient HotFlip update over a candidate set.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["TriggerTemplate", "label_logprob", "hotflip_candidates", "trigger_search_step"]


class TriggerTemplate:
    """Fixed-shape template with trigger slots.

    ``template_ids``: (T,) int32 with -1 marking trigger slots and -2 the
    predict slot (filled with ``mask_id``).
    """

    def __init__(self, template_ids: tp.Sequence[int], mask_id: int = 0):
        t = np.asarray(template_ids, np.int64)
        self.trigger_slots = np.flatnonzero(t == -1)
        predict = np.flatnonzero(t == -2)
        assert len(predict) == 1, "exactly one predict slot (-2) required"
        self.predict_pos = int(predict[0])
        base = t.copy()
        base[self.trigger_slots] = 0
        base[self.predict_pos] = mask_id
        self.base_ids = base.astype(np.int32)

    @property
    def trigger_len(self) -> int:
        return len(self.trigger_slots)

    def fill(self, trigger_ids: jax.Array, batch_ids: tp.Optional[jax.Array] = None) -> jax.Array:
        """Insert trigger ids; optionally broadcast over a batch of contexts."""
        ids = jnp.asarray(self.base_ids)
        ids = ids.at[jnp.asarray(self.trigger_slots)].set(jnp.asarray(trigger_ids, ids.dtype))
        if batch_ids is None:
            return ids[None]
        b = batch_ids.shape[0]
        return jnp.broadcast_to(ids[None], (b, ids.shape[0]))


def label_logprob(logits_at_predict: jax.Array, label_ids: tp.Sequence[int]) -> jax.Array:
    """Mean log-prob over the label's (possibly multiple) token ids, per row."""
    logp = jax.nn.log_softmax(logits_at_predict.astype(jnp.float32), axis=-1)
    lab = jnp.asarray(np.asarray(label_ids, np.int64))
    return jnp.mean(logp[:, lab], axis=-1)


def hotflip_candidates(avg_grad: jax.Array, embedding_table: jax.Array,
                       num_cands: int) -> np.ndarray:
    """Top replacement candidates for one slot from the averaged gradient."""
    scores = -(jnp.asarray(embedding_table) @ jnp.asarray(avg_grad))
    return np.asarray(jax.lax.top_k(scores, num_cands)[1])


def trigger_search_step(trigger_ids: tp.List[int],
                        grad_fn: tp.Callable[[np.ndarray], jax.Array],
                        score_fn: tp.Callable[[np.ndarray], float],
                        embedding_table: jax.Array, *,
                        num_cands: int = 10,
                        rng: tp.Optional[np.random.Generator] = None) -> tp.Dict[str, tp.Any]:
    """One HotFlip move on the trigger (maximize ``score_fn``).

    ``grad_fn(trigger_ids) -> (L, D)`` gradient of the score w.r.t. trigger
    embeddings; ``score_fn(trigger_ids) -> float`` evaluation score.
    """
    rng = rng or np.random.default_rng()
    slot = int(rng.integers(0, len(trigger_ids)))
    grads = grad_fn(np.asarray(trigger_ids))
    # maximize: flip sign vs the loss-minimizing formulation
    cands = hotflip_candidates(-jnp.asarray(grads)[slot], embedding_table, num_cands)
    base_score = score_fn(np.asarray(trigger_ids))
    best = (base_score, trigger_ids[slot])
    for cand in cands:
        trial = list(trigger_ids)
        trial[slot] = int(cand)
        s = score_fn(np.asarray(trial))
        if s > best[0]:
            best = (s, int(cand))
    accepted = best[1] != trigger_ids[slot]
    if accepted:
        trigger_ids[slot] = best[1]
    return {"slot": slot, "accepted": accepted, "score": best[0],
            "base_score": base_score}
