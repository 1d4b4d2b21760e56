"""Optimizers & schedules: optax builders for the framework's trainers.

Functional replacements for the reference's torch optimizer plumbing:

- :func:`decay_mask` + :func:`adamw_grouped`: the weight-decay / no-decay
  parameter split (reference ``utils/train_utils.py:8-19`` puts biases and
  LayerNorm weights in the no-decay group),
- :func:`warmup_cosine` / :func:`warmup_linear`: HF ``get_scheduler``
  equivalents used by CoOp/ClipGPT training,
- :func:`langevin`: SGLD — SGD whose step adds ``sqrt(2 * lr * beta_t)``
  Gaussian noise, the FluentPrompt optimizer
  (reference ``clip_prompt/fluentprompt_learner.py:14-41``),
- :func:`with_grad_accum`: optax MultiSteps wrapper (HF Accelerate's
  ``gradient_accumulation_steps`` semantics in ``train_gpt.py``),
- :func:`trainable_only`: optax ``multi_transform`` masking that freezes
  everything outside a predicate — the functional version of
  ``requires_grad_`` surgery (reference ``PartlyTrainedModule``).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import optax

__all__ = [
    "decay_mask", "adamw_grouped", "warmup_cosine", "warmup_linear",
    "langevin", "LangevinScheduleState", "with_grad_accum", "trainable_only",
    "sgd", "adam",
]


def decay_mask(params, no_decay_keywords: tp.Sequence[str] = ("bias", "scale")) -> tp.Any:
    """True = apply weight decay. Biases & norm scales are excluded."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def decide(path) -> bool:
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        leaf = str(names[-1]) if names else ""
        return not any(kw in leaf for kw in no_decay_keywords)

    mask_flat = [decide(path) for path, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, mask_flat)


def adamw_grouped(learning_rate, weight_decay: float = 0.01,
                  b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                  no_decay_keywords: tp.Sequence[str] = ("bias", "scale"),
                  grad_clip_norm: tp.Optional[float] = None) -> optax.GradientTransformation:
    """AdamW with decay masking (grouped-params semantics)."""
    tx = optax.adamw(
        learning_rate, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay,
        mask=lambda p: decay_mask(p, no_decay_keywords),
    )
    if grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
    return tx


def adam(learning_rate, **kwargs) -> optax.GradientTransformation:
    return optax.adam(learning_rate, **kwargs)


def sgd(learning_rate, momentum: tp.Optional[float] = None) -> optax.GradientTransformation:
    return optax.sgd(learning_rate, momentum=momentum)


def warmup_cosine(base_lr: float, warmup_steps: int, total_steps: int,
                  end_value: float = 0.0) -> optax.Schedule:
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=base_lr, warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, warmup_steps + 1), end_value=end_value,
    )


def warmup_linear(base_lr: float, warmup_steps: int, total_steps: int) -> optax.Schedule:
    return optax.join_schedules([
        optax.linear_schedule(0.0, base_lr, max(warmup_steps, 1)),
        optax.linear_schedule(base_lr, 0.0, max(total_steps - warmup_steps, 1)),
    ], [max(warmup_steps, 1)])


class LangevinScheduleState(tp.NamedTuple):
    count: jnp.ndarray
    rng: jnp.ndarray


def langevin(learning_rate: tp.Union[float, optax.Schedule],
             beta_schedule: tp.Callable[[jnp.ndarray], jnp.ndarray],
             seed: int = 0) -> optax.GradientTransformation:
    """SGLD: sgd step + sqrt(2 * lr * beta_t) * N(0, 1) noise.

    ``beta_schedule(step)`` returns the annealed noise temperature
    (FluentPrompt uses a geometric decay, fluentprompt_learner.py:44-66).
    """

    def init_fn(params):
        del params
        return LangevinScheduleState(jnp.zeros([], jnp.int32), jax.random.PRNGKey(seed))

    def update_fn(updates, state, params=None):
        del params
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate
        beta = beta_schedule(state.count)
        noise_scale = jnp.sqrt(2.0 * lr * beta)
        rng, sub = jax.random.split(state.rng)
        leaves, treedef = jax.tree_util.tree_flatten(updates)
        keys = jax.random.split(sub, len(leaves))
        noised = [
            -lr * g + noise_scale * jax.random.normal(k, g.shape, g.dtype)
            for g, k in zip(leaves, keys)
        ]
        new_updates = jax.tree_util.tree_unflatten(treedef, noised)
        return new_updates, LangevinScheduleState(state.count + 1, rng)

    return optax.GradientTransformation(init_fn, update_fn)


def with_grad_accum(tx: optax.GradientTransformation, every: int) -> optax.GradientTransformation:
    if every <= 1:
        return tx
    return optax.MultiSteps(tx, every_k_schedule=every)


def trainable_only(tx: optax.GradientTransformation,
                   is_trainable: tp.Callable[[tp.Tuple, tp.Any], bool],
                   params) -> optax.GradientTransformation:
    """Freeze params where the predicate is False (path, leaf) -> bool."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    labels_flat = ["train" if is_trainable(path, leaf) else "freeze" for path, leaf in flat]
    treedef = jax.tree_util.tree_structure(params)
    labels = jax.tree_util.tree_unflatten(treedef, labels_flat)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels
    )
