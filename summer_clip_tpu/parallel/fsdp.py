"""ZeRO-3 / fully-sharded parameter placement over the ``data`` axis.

The reference's only distributed story is HF Accelerate pinned to
single-process (``conf/accelerate/cfg_v1.yaml``: ``distributed_type: 'NO'``,
SURVEY.md §2.9); its largest trainable state — the full ClipGPT finetune at
gpt2-large (774M params, reference ``clip_prompt/gpt.py:124-127``) — fits
only because fp16 weights alone were held. Replicated f32 AdamW state for
the same model (params + mu + nu ≈ 9.3 GB) crowds a 16 GB chip once
activations join; the JAX-native fix is the ZeRO-3 placement strategy:
leave module code untouched and *place* every large parameter (and, via
``optax.init`` on the placed tree, its optimizer state) sharded over the
mesh's ``data`` axis. XLA's SPMD partitioner then all-gathers each weight
just-in-time for its matmul and reduce-scatters its gradient — the classic
weight-gather/grad-scatter schedule — while the train step stays the exact
jitted function the DP path runs.

Composes with Megatron TP (``tp.py``): the TP spec claims its axis first and
FSDP shards the largest remaining free axis over ``data``, giving 2-D
(``data`` × ``model``) sharded kernels.
"""

from __future__ import annotations

import typing as tp

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from summer_clip_tpu.parallel.tp import gpt2_tp_spec

__all__ = ["fsdp_spec", "shard_params_fsdp", "FSDP_MIN_ELEMS"]

# Tensors smaller than this stay replicated: biases, LayerNorm params and
# tiny adapters cost more in per-layer collectives than they save in HBM.
FSDP_MIN_ELEMS = 2 ** 14


def fsdp_spec(leaf, data_size: int, base: tp.Optional[P] = None,
              axis: str = "data", min_elems: int = FSDP_MIN_ELEMS) -> P:
    """PartitionSpec sharding ``leaf``'s largest free axis over ``axis``.

    ``base`` is an existing spec (e.g. a Megatron TP spec) whose claimed
    dims are left alone; FSDP picks the largest *unclaimed* dim divisible
    by ``data_size``. Falls back to ``base`` (replication on that dim) when
    the tensor is small or nothing divides.
    """
    shape = getattr(leaf, "shape", ())
    ndim = len(shape)
    entries = list(base) if base is not None else []
    entries += [None] * (ndim - len(entries))
    size = 1
    for d in shape:
        size *= int(d)
    if ndim == 0 or size < min_elems:
        return P(*entries) if any(e is not None for e in entries) else P()
    best = -1
    for i, (dim, taken) in enumerate(zip(shape, entries)):
        if taken is None and dim % data_size == 0:
            if best < 0 or dim > shape[best]:
                best = i
    if best >= 0:
        entries[best] = axis
    if not any(e is not None for e in entries):
        return P()
    return P(*entries)


def shard_params_fsdp(params: tp.Any, mesh: Mesh, with_tp: bool = False,
                      min_elems: int = FSDP_MIN_ELEMS) -> tp.Any:
    """device_put the param tree fully sharded over ``mesh``'s data axis.

    With ``with_tp=True`` the Megatron spec (``gpt2_tp_spec``) claims the
    ``model`` axis first; FSDP adds ``data`` on the largest remaining dim.
    Optimizer state initialized from the returned tree inherits the same
    shardings (``zeros_like`` preserves placement).
    """
    data_size = mesh.shape["data"]

    def spec_of(path, leaf) -> P:
        base = gpt2_tp_spec(path, leaf) if with_tp else None
        return fsdp_spec(leaf, data_size, base=base, min_elems=min_elems)

    shardings = jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_of(path, leaf)), params)
    return jax.device_put(params, shardings)
