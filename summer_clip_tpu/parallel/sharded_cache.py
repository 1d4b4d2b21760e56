"""Cache attention sharded over the cache length N (the workload's long axis).

SURVEY.md §2.9/§5: the scale axis of this framework is not sequence length
but the cache length N (ImageNet train = 1.28M rows). The TPU-native analog
of sequence parallelism here: shard the cache rows (and their values) across
the mesh's ``model`` axis, run the fused exp-affinity kernel on each shard's
rows, and ``psum`` the per-shard partial (B, Nt, C) logits over ICI. Test
features replicate; the (Nt, Nc) weight matrix never exists anywhere.

Padding rows carry zero value-vectors, so they contribute exactly nothing.
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from summer_clip_tpu.ops.cache_kernels import cache_attention_auto, cache_attention_reference

__all__ = ["sharded_cache_logits", "pad_cache_for_mesh"]


def pad_cache_for_mesh(cache_features: jnp.ndarray, cache_values: jnp.ndarray,
                       n_shards: int) -> tp.Tuple[jnp.ndarray, jnp.ndarray]:
    n = cache_features.shape[0]
    target = -(-n // n_shards) * n_shards
    if target != n:
        cache_features = jnp.pad(cache_features, ((0, target - n), (0, 0)))
        cache_values = jnp.pad(cache_values, ((0, target - n), (0, 0)))
    return cache_features, cache_values


def sharded_cache_logits(test_features: jnp.ndarray, cache_features: jnp.ndarray,
                         cache_values: jnp.ndarray, betas: jnp.ndarray,
                         mesh: Mesh, axis: str = "model") -> jnp.ndarray:
    """(B, Nt, C) logits with the cache sharded over ``axis`` of ``mesh``."""
    n_shards = mesh.shape[axis]
    cache_features, cache_values = pad_cache_for_mesh(cache_features, cache_values, n_shards)
    betas = jnp.atleast_1d(jnp.asarray(betas, jnp.float32))

    other_axes = [a for a in mesh.axis_names if a != axis]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis, None), P()),
        out_specs=P(),
        check_vma=False,
    )
    def compute(f, c_shard, v_shard, b):
        if jax.default_backend() == "tpu":
            part = cache_attention_auto(f, c_shard, v_shard, b)
        else:
            part = cache_attention_reference(f, c_shard, v_shard, b)
        part = jax.lax.psum(part, axis)
        # replicate across unused axes so out_specs=P() is valid
        for a in other_axes:
            part = jax.lax.pmean(part, a)
        return part

    return compute(jnp.asarray(test_features, jnp.float32),
                   jnp.asarray(cache_features, jnp.float32),
                   jnp.asarray(cache_values, jnp.float32), betas)
