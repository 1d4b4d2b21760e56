"""FluentPrompt: Langevin-dynamics discrete prompt tuning.

Rebuild of ``summer_clip/clip_prompt/fluentprompt_learner.py``: SGD steps
with ``sqrt(2 * lr * beta_t)`` Gaussian noise (SGLD — provided by
``engine.optim.langevin``), a geometric beta annealing schedule, and a
projection of the continuous prompt onto the nearest vocabulary embedding
after every step.
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp
import numpy as np

from summer_clip_tpu.engine.optim import langevin
from summer_clip_tpu.methods.prompt_models import find_nearest

__all__ = ["geometric_beta_schedule", "make_langevin_optimizer", "FluentPromptState"]


def geometric_beta_schedule(beta_start: float, beta_end: float, num_steps: int):
    """beta_t = beta_start * (beta_end / beta_start)^(t / T) (fluentprompt_learner.py:44-66)."""
    ratio = (beta_end / beta_start) ** (1.0 / max(num_steps, 1))

    def schedule(step):
        return jnp.asarray(beta_start, jnp.float32) * jnp.power(
            jnp.asarray(ratio, jnp.float32), step.astype(jnp.float32))

    return schedule


def make_langevin_optimizer(lr: tp.Union[float, tp.Callable], beta_start: float,
                            beta_end: float, num_steps: int, seed: int = 0):
    return langevin(lr, geometric_beta_schedule(beta_start, beta_end, num_steps), seed=seed)


class FluentPromptState:
    """Continuous prompt + its current discrete projection."""

    def __init__(self, clip_embs: np.ndarray, init_ids: tp.Sequence[int],
                 dist_p: float = 2.0):
        self.clip_embs = jnp.asarray(np.asarray(clip_embs, np.float32))
        self.prompt_ids = [int(i) for i in init_ids]
        self.dist_p = dist_p
        self.params = {"prompt_embs": jnp.take(self.clip_embs, jnp.asarray(self.prompt_ids), axis=0)}

    def project(self) -> tp.List[int]:
        """Snap embeddings to the nearest vocab entries; update ids.

        Mirrors the reference's post-step projection
        (fluentprompt_learner.py:82-89): ids come from the *current*
        embeddings; embeddings reset to the ids' vocab vectors.
        """
        ids = find_nearest(self.params["prompt_embs"], self.clip_embs, self.dist_p)
        self.params = {"prompt_embs": jnp.take(self.clip_embs, ids, axis=0)}
        self.prompt_ids = [int(i) for i in np.asarray(ids)]
        return self.prompt_ids
