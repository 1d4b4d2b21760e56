"""Prompt models: CoOp (continuous), VQ (straight-through), Gumbel family.

Functional rebuild of ``summer_clip/clip_prompt/prompt_models.py``. Each
model is a small object holding static config + the (frozen) CLIP embedding
table; parameters live in an explicit pytree so optax/jit handle them like
any other JAX state:

- ``init(rng) -> params``
- ``apply(params, temperature, training) -> {"clip_embs", "gpt_embs", "ids", ...}``
  fully traceable (ids are argmax/zeros tensors, not python lists),
- ``decode_ids(params)`` host-side nearest-token decode for eval logging,
- ``allowed_tokens`` restricts the searchable vocab with global-id remapping
  (reference BasePromptModel.wrap_forward).

The straight-through estimator is ``stop_gradient(hard - soft) + soft``;
Gumbel models feed the *soft* mixture to CLIP and the hard ST embedding to
the GPT fluency branch, exactly the reference's split.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "find_nearest", "straight_through", "BasePromptModel", "CoOp",
    "VQVAE1", "VQVAE2", "Gumbelv0a1", "Gumbelv1a1", "Gumbelv3a1",
    "prompt_grads_info",
]


def find_nearest(prompt_embs: jax.Array, clip_embs: jax.Array, p: float = 2.0) -> jax.Array:
    """ids of the nearest vocab embedding under the Minkowski-p metric."""
    if p == 2.0:
        # ||a-b||^2 = |a|^2 - 2ab + |b|^2 — avoids the (P, V, D) blowup
        d = (jnp.sum(prompt_embs ** 2, -1, keepdims=True)
             - 2.0 * prompt_embs @ clip_embs.T
             + jnp.sum(clip_embs ** 2, -1)[None, :])
        return jnp.argmin(d, axis=1)
    diffs = jnp.abs(prompt_embs[:, None, :] - clip_embs[None, :, :]) ** p
    return jnp.argmin(jnp.sum(diffs, -1), axis=1)


def straight_through(hard: jax.Array, soft: jax.Array) -> jax.Array:
    return jax.lax.stop_gradient(hard - soft) + soft


def prompt_grads_info(grads: tp.Any, name: str = "prompt_embs",
                      log_dir_name: str = "prompt_grad_norm") -> tp.Dict[str, float]:
    g = grads.get(name) if isinstance(grads, dict) else None
    if g is None:
        return {}
    norms = np.asarray(jnp.linalg.norm(g, axis=-1))
    return {f"{log_dir_name}/{i + 1}": float(norms[i]) for i in range(len(norms))}


class BasePromptModel:
    def __init__(self, clip_embs: np.ndarray, prompt_len: int,
                 allowed_tokens: tp.Optional[tp.Sequence[int]] = None, **kwargs):
        del kwargs
        self.prompt_len = prompt_len
        self.allowed_tokens = (np.asarray(allowed_tokens, np.int32)
                               if allowed_tokens is not None else None)
        table = np.asarray(clip_embs, np.float32)
        if self.allowed_tokens is not None:
            table = table[self.allowed_tokens]
        self.clip_embs = jnp.asarray(table)
        self.vocab_size, self.emb_dim = table.shape

    # -- public API ------------------------------------------------------------
    def init(self, rng: jax.Array) -> dict:
        raise NotImplementedError

    def apply(self, params: dict, temperature: float = 1.0, training: bool = True) -> dict:
        raise NotImplementedError

    def to_global_ids(self, ids: tp.Union[jax.Array, np.ndarray]) -> jax.Array:
        if self.allowed_tokens is None:
            return jnp.asarray(ids)
        return jnp.take(jnp.asarray(self.allowed_tokens), jnp.asarray(ids))

    def decode_ids(self, params: dict) -> np.ndarray:
        out = self.apply(params, training=False)
        return np.asarray(self.to_global_ids(out["ids"]))

    def step_info(self, grads: dict) -> tp.Dict[str, float]:
        return prompt_grads_info(grads)


class CoOp(BasePromptModel):
    """Free continuous prompt embeddings; nearest-token decode at eval."""

    def __init__(self, dist_p: float = 2.0, **kwargs):
        super().__init__(**kwargs)
        self.dist_p = dist_p

    def init(self, rng: jax.Array) -> dict:
        return {"prompt_embs": 0.02 * jax.random.normal(rng, (self.prompt_len, self.emb_dim))}

    def apply(self, params, temperature: float = 1.0, training: bool = True) -> dict:
        embs = params["prompt_embs"]
        if training:
            ids = jnp.zeros((self.prompt_len,), jnp.int32)
        else:
            ids = find_nearest(embs, self.clip_embs, self.dist_p)
        return {"clip_embs": embs, "gpt_embs": embs, "ids": ids}


class VQVAE1(BasePromptModel):
    """Nearest-vocab quantization with straight-through; hard embs both ways."""

    def __init__(self, dist_p: float = 2.0, **kwargs):
        super().__init__(**kwargs)
        self.dist_p = dist_p

    def init(self, rng: jax.Array) -> dict:
        return {"prompt_embs": 0.02 * jax.random.normal(rng, (self.prompt_len, self.emb_dim))}

    def apply(self, params, temperature: float = 1.0, training: bool = True) -> dict:
        embs = params["prompt_embs"]
        ids = find_nearest(embs, self.clip_embs, self.dist_p)
        vocab_embs = jnp.take(self.clip_embs, ids, axis=0)
        st = straight_through(vocab_embs, embs)
        return {"clip_embs": st, "gpt_embs": st, "ids": ids}


class VQVAE2(VQVAE1):
    """Like VQVAE1, but CLIP sees the continuous embeddings."""

    def apply(self, params, temperature: float = 1.0, training: bool = True) -> dict:
        out = super().apply(params, temperature, training)
        out["clip_embs"] = params["prompt_embs"]
        return out


def _weights_stats(weights: jax.Array, suffix: str) -> tp.Dict[str, jax.Array]:
    w = weights.astype(jnp.float32)
    return {
        f"weights{suffix}/min": jnp.min(w), f"weights{suffix}/max": jnp.max(w),
        f"weights{suffix}/mean": jnp.mean(w), f"weights{suffix}/median": jnp.median(w),
        f"weights{suffix}/quant_75": jnp.quantile(w, 0.75),
        f"weights{suffix}/quant_25": jnp.quantile(w, 0.25),
    }


class GumbelBase(BasePromptModel):
    """Softmax relaxation over the vocab: soft mixture to CLIP, hard ST to GPT."""

    logits_temperature: float = 1.0 / 100.0

    def get_prompt_logits(self, params: dict) -> jax.Array:
        raise NotImplementedError

    def apply(self, params, temperature: float = 1.0, training: bool = True) -> dict:
        y_soft = jax.nn.softmax(self.get_prompt_logits(params) / self.logits_temperature, axis=-1)
        y_inds = jnp.argmax(y_soft, axis=-1)
        prompts_soft = y_soft @ self.clip_embs
        prompts_hard = jnp.take(self.clip_embs, y_inds, axis=0)
        prompts_hard = straight_through(prompts_hard, prompts_soft)
        info = _weights_stats(y_soft, "")
        for ind in (0, -1):
            info.update(_weights_stats(y_soft[ind], f"_{ind}"))
        return {"clip_embs": prompts_soft, "gpt_embs": prompts_hard, "ids": y_inds,
                "temperature": temperature,
                "logits_temperature": self.logits_temperature, **info}


class Gumbelv0a1(GumbelBase):
    """Raw per-position vocab logits as parameters."""

    def init(self, rng: jax.Array) -> dict:
        del rng
        return {"prompt_logits": jnp.ones((self.prompt_len, self.vocab_size))}

    def get_prompt_logits(self, params):
        return params["prompt_logits"]

    def step_info(self, grads):
        return prompt_grads_info(grads, "prompt_logits")


class Gumbelv1a1(GumbelBase):
    """Logits = prompt embeddings @ vocab table^T."""

    def init(self, rng: jax.Array) -> dict:
        return {"prompt_embs": 0.02 * jax.random.normal(rng, (self.prompt_len, self.emb_dim))}

    def get_prompt_logits(self, params):
        return params["prompt_embs"] @ self.clip_embs.T


class Gumbelv3a1(GumbelBase):
    """Autoregressive proposal: a ClipGPT head rolls out the next-token
    distribution position by position through a KV cache.

    ``proposer`` supplies the (possibly trainable) LM head — e.g.
    :class:`summer_clip_tpu.methods.gpt_heads.AdapterGPT` or ``LoRAGPT`` —
    with ``init(rng) -> params``, ``init_cache(batch, max_len)`` and
    ``__call__(params, clip_space_embeds, cache) -> (logits over the GLOBAL
    clip vocab, new_cache)``. The proposal chain stays in the differentiable
    graph exactly as in the reference (prompt_models.py:210-243); the
    trainable parameters are the proposer's (adapter / LoRA factors).
    """

    def __init__(self, proposer: tp.Any, bos_token_id: int,
                 clip_embs: np.ndarray, **kwargs):
        super().__init__(clip_embs=clip_embs, **kwargs)
        self.proposer = proposer
        self.bos_emb = jnp.asarray(np.asarray(clip_embs, np.float32)[bos_token_id])

    def init(self, rng: jax.Array) -> dict:
        return {"proposer": self.proposer.init(rng)}

    def get_prompt_logits(self, params):
        cache = self.proposer.init_cache(1, self.prompt_len + 1)
        x = self.bos_emb[None, None, :]  # (1, 1, D)

        probs_list = []
        for _ in range(self.prompt_len):
            logits, cache = self.proposer(params["proposer"], x, cache)
            logits = logits[:, -1, :]  # (1, V_global)
            if self.allowed_tokens is not None:
                logits = logits[:, self.allowed_tokens]
            probs = jax.nn.softmax(logits, axis=-1)
            pred_emb = probs @ self.clip_embs
            x = pred_emb[:, None, :]
            probs_list.append(probs[0])
        return jnp.stack(probs_list, axis=0)

    def apply(self, params, temperature: float = 1.0, training: bool = True) -> dict:
        # the proposal already produces probabilities; skip the extra softmax
        y_soft = self.get_prompt_logits(params)
        y_inds = jnp.argmax(y_soft, axis=-1)
        prompts_soft = y_soft @ self.clip_embs
        prompts_hard = straight_through(jnp.take(self.clip_embs, y_inds, axis=0), prompts_soft)
        return {"clip_embs": prompts_soft, "gpt_embs": prompts_hard, "ids": y_inds,
                "temperature": temperature}
