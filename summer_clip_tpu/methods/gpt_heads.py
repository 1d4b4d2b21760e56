"""GPT head variants for the autoregressive prompt proposer (Gumbelv3a1).

Rebuild of ``summer_clip/clip_prompt/gpt_logits.py``:

- :class:`EmbsAdapter` — residual MLP on the last hidden state with
  RL-Prompt-style near-zero init (xavier gain 1e-4, bias -1e-4) so the
  adapted model starts as the frozen LM,
- :class:`AdapterGPT` — frozen ClipGPT + trainable EmbsAdapter before the
  LM head (training-state = adapter params only),
- :class:`LoRAGPT` — LoRA (low-rank A@B deltas) on the attention qkv/proj
  Dense kernels of the GPT core, implemented natively on the Flax param
  tree (no peft): ``apply_lora`` merges deltas functionally each call, so
  base weights stay frozen and only the A/B factors train.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["EmbsAdapter", "AdapterGPT", "init_lora_params", "apply_lora", "LoRAGPT"]


def _rlprompt_init(key, shape, dtype=jnp.float32):
    # xavier_uniform with tiny gain: near-zero start (gpt_logits.py:20-26)
    fan_in, fan_out = shape[0], shape[1]
    limit = 1e-4 * float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


class EmbsAdapter(nn.Module):
    hidden_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        h = nn.Dense(self.hidden_dim, kernel_init=_rlprompt_init,
                     bias_init=nn.initializers.constant(-1e-4), name="fc1")(x)
        h = nn.relu(h)
        h = nn.Dense(d, kernel_init=_rlprompt_init,
                     bias_init=nn.initializers.constant(-1e-4), name="fc2")(h)
        return h + x


class AdapterGPT:
    """Frozen ClipGPT + residual adapter on the final hidden state.

    ``__call__(adapter_params, clip_space_embeds, cache)`` returns
    (last-position logits over the clip vocab, new_cache). Only
    ``adapter_params`` train.
    """

    def __init__(self, gpt_model, gpt_variables, hidden_dim: int):
        self.gpt = gpt_model
        self.gpt_variables = gpt_variables
        self.adapter = EmbsAdapter(hidden_dim)

    def init(self, rng: jax.Array) -> dict:
        d = self.gpt.config.n_embd
        return self.adapter.init(rng, jnp.zeros((1, d)))["params"]

    def init_cache(self, batch: int, max_len: int):
        return self.gpt.apply(self.gpt_variables, method=self.gpt.init_cache,
                              batch=batch, max_len=max_len)

    def __call__(self, adapter_params: dict, inputs_embeds: jax.Array,
                 cache: tp.Optional[list] = None):
        out = self.gpt.apply(self.gpt_variables, inputs_embeds=inputs_embeds, cache=cache)
        hidden = out["hidden"][:, -1, :]
        hidden = self.adapter.apply({"params": adapter_params}, hidden)
        table = self.gpt.apply(self.gpt_variables, method=self.gpt.lm_head_table)
        logits = jnp.dot(hidden, table.T, preferred_element_type=jnp.float32)
        return logits[:, None, :], out["cache"]


def init_lora_params(params: dict, rng: jax.Array, rank: int = 8,
                     target_suffixes: tp.Sequence[str] = ("c_attn", "c_proj")) -> dict:
    """LoRA factors for every Dense kernel whose parent module matches."""
    lora: dict = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    keys = jax.random.split(rng, max(len(flat), 1))
    for (path, leaf), key in zip(flat, keys):
        names = [str(getattr(p, "key", p)) for p in path]
        if names[-1] != "kernel" or len(names) < 2:
            continue
        if not any(names[-2] == t for t in target_suffixes):
            continue
        d_in, d_out = leaf.shape
        entry = {
            "a": jax.random.normal(key, (d_in, rank)) * (1.0 / rank),
            "b": jnp.zeros((rank, d_out)),
        }
        cur = lora
        for n in names[:-1]:
            cur = cur.setdefault(n, {})
        cur[names[-1]] = entry
    return lora


def apply_lora(params: dict, lora: dict, scale: float = 1.0) -> dict:
    """Functionally merge LoRA deltas: kernel + scale * (A @ B)."""
    def rec(p, l):
        if isinstance(l, dict) and "a" in l and "b" in l and not isinstance(p, dict):
            return p + scale * (l["a"] @ l["b"])
        if isinstance(p, dict):
            return {k: rec(v, l.get(k)) if isinstance(l, dict) and k in l else v
                    for k, v in p.items()}
        return p
    return rec(params, lora)


class LoRAGPT:
    """ClipGPT with LoRA on attention projections; only factors train."""

    def __init__(self, gpt_model, gpt_variables, rank: int = 8, scale: float = 1.0,
                 target_suffixes: tp.Sequence[str] = ("c_attn", "c_proj")):
        self.gpt = gpt_model
        self.base_params = gpt_variables["params"]
        self.rank = rank
        self.scale = scale
        self.target_suffixes = tuple(target_suffixes)

    def init(self, rng: jax.Array) -> dict:
        return init_lora_params(self.base_params, rng, self.rank, self.target_suffixes)

    def init_cache(self, batch: int, max_len: int):
        return self.gpt.apply({"params": self.base_params}, method=self.gpt.init_cache,
                              batch=batch, max_len=max_len)

    def __call__(self, lora_params: dict, inputs_embeds: jax.Array,
                 cache: tp.Optional[list] = None):
        merged = apply_lora(self.base_params, lora_params, self.scale)
        out = self.gpt.apply({"params": merged}, inputs_embeds=inputs_embeds, cache=cache)
        return out["logits"][:, -1:, :], out["cache"]
