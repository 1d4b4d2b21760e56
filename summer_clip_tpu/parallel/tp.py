"""Tensor-parallel param sharding for the GPT family (Megatron layout).

The reference has no TP at all (largest model GPT-2-large fits one GPU —
SURVEY.md §2.9 marks the axis optional). Here the ``('data', 'model')``
mesh's ``model`` axis shards transformer matrices the Megatron way, with
GSPMD inserting the collectives:

- ``c_attn`` / ``mlp_c_fc`` kernels: column-parallel ``P(None, 'model')``
  (heads / hidden split across chips),
- attention ``c_proj`` / ``mlp_c_proj`` kernels: row-parallel
  ``P('model', None)`` (the following matmul's contraction psums over ICI),
- embeddings, LayerNorms, biases, adapters: replicated.

``shard_params_tp`` works on any ClipGPT/GPT-2 param tree (rules match by
module-path names) and degenerates to full replication when the mesh's
``model`` axis is 1 — so the data-parallel path is the tp=1 special case.
"""

from __future__ import annotations

import typing as tp

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["gpt2_tp_spec", "shard_params_tp", "check_tp_divisibility",
           "shard_decode_tp"]


def _path_names(path) -> tp.List[str]:
    names = []
    for part in path:
        if hasattr(part, "key"):
            names.append(str(part.key))
        elif hasattr(part, "idx"):
            names.append(str(part.idx))
        else:
            names.append(str(part))
    return names


def gpt2_tp_spec(path, leaf) -> P:
    """PartitionSpec for one GPT-2 param, by its tree path."""
    names = _path_names(path)
    is_kernel = bool(names) and names[-1] == "kernel"
    if not is_kernel or getattr(leaf, "ndim", 0) != 2:
        return P()
    if any(n == "c_attn" for n in names) or any(n == "mlp_c_fc" for n in names):
        return P(None, "model")   # column parallel
    if any(n == "c_proj" for n in names) or any(n == "mlp_c_proj" for n in names):
        return P("model", None)   # row parallel
    return P()


def check_tp_divisibility(n_embd: int, n_head: int, tp_size: int) -> None:
    if tp_size <= 1:
        return
    assert n_head % tp_size == 0, f"n_head {n_head} % tp {tp_size} != 0"
    assert n_embd % tp_size == 0, f"n_embd {n_embd} % tp {tp_size} != 0"


def shard_params_tp(params: tp.Any, mesh: Mesh) -> tp.Any:
    """device_put the param tree with Megatron TP specs over ``mesh``.

    Optimizer state initialized from the returned tree inherits the same
    shardings (``zeros_like`` preserves sharding), so ``optax.init`` needs
    no extra placement.
    """
    shardings = jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, gpt2_tp_spec(path, leaf)), params)
    return jax.device_put(params, shardings)


def shard_decode_tp(variables: tp.Mapping, cache: tp.List[dict], mesh: Mesh):
    """Megatron-TP placement for the KV-cached decode path.

    Params get the train-time specs (:func:`shard_params_tp`); each layer's
    cache ``k``/``v`` buffers (``(B, T, n_embd)``, pre-head-split embedding
    dim last — ``models/gpt2.py:init_cache``) shard that last dim over
    ``model``, matching the column-parallel ``c_attn`` outputs that write
    them, so the per-step attention runs entirely shard-local and only the
    row-parallel projections psum over ICI. ``index`` stays replicated.

    The jitted decode programs (``apps/gen_gpt.py``) are placement-agnostic:
    hand them these committed inputs and GSPMD compiles the TP program.
    """
    vars_sh = dict(variables)
    vars_sh["params"] = shard_params_tp(variables["params"], mesh)
    kv = NamedSharding(mesh, P(None, None, "model"))
    repl = NamedSharding(mesh, P())
    cache_sh = [{"k": jax.device_put(c["k"], kv),
                 "v": jax.device_put(c["v"], kv),
                 "index": jax.device_put(c["index"], repl)} for c in cache]
    return vars_sh, cache_sh
