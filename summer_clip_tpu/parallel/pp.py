"""Pipeline parallelism for the GPT block stack (GPipe over a 'stage' axis).

The reference never pipelines (its largest model fits one GPU —
SURVEY.md §2.9), but at gpt2-xl+ scales a single chip's HBM runs out even
with remat; this is the TPU-native third axis next to DP
(``parallel/mesh.py``) and Megatron TP (``parallel/tp.py``):

- GPT-2 blocks are homogeneous, so per-layer params stack into one
  leading-axis pytree and shard ``P('stage')`` — each device holds
  ``n_layer / n_stages`` layers and nothing else,
- the pipeline is a ``shard_map`` + ``lax.scan`` over ``M + S - 1`` ticks:
  stage 0 feeds a fresh microbatch each tick, every stage applies its
  local layer chunk (an inner ``lax.scan`` over layers), activations move
  one hop per tick via ``lax.ppermute`` over ICI,
- bubbles are the usual GPipe ``(S-1)/(M+S-1)``; raise ``n_microbatches``
  to amortize,
- everything is differentiable (``ppermute``'s VJP is the reverse
  permute), so ``jax.grad`` through :func:`pipeline_blocks` yields exact
  gradients — pinned against the dense single-device stack in tests and
  in ``dryrun_multichip`` stage 4.

Embedding, positional add, final LN and the LM head stay replicated
outside the pipeline (they are a tiny fraction of FLOPs/params); only the
block stack — where the memory and compute live — is staged.
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from summer_clip_tpu.models import gpt2 as gpt2_mod

__all__ = ["stack_block_params", "unstack_block_params", "pipeline_blocks",
           "pp_gpt2_forward", "check_pp_divisibility",
           "scan_gpt2_forward", "scan_clip_gpt_forward"]


def check_pp_divisibility(n_layer: int, n_stages: int) -> None:
    if n_layer % n_stages != 0:
        raise ValueError(f"n_layer {n_layer} not divisible by {n_stages} stages")


def stack_block_params(params: tp.Mapping, n_stages: int) -> tp.Tuple[dict, dict]:
    """Split GPT2 params into (non-block, stage-stacked block) trees.

    Block params ``core/h_{i}`` stack to leading shape
    ``(n_stages, layers_per_stage, ...)`` ready for ``P('stage')`` sharding.
    """
    core = dict(params["core"])
    layer_keys = sorted((k for k in core if k.startswith("h_")),
                        key=lambda k: int(k.split("_")[1]))
    n_layer = len(layer_keys)
    check_pp_divisibility(n_layer, n_stages)
    blocks = [core.pop(k) for k in layer_keys]
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs).reshape((n_stages, n_layer // n_stages)
                                          + xs[0].shape), *blocks)
    rest = dict(params)
    rest["core"] = core
    return rest, stacked


def unstack_block_params(rest: tp.Mapping, stacked: tp.Any) -> dict:
    """Inverse of :func:`stack_block_params` (checkpoint interchange)."""
    leaves = jax.tree_util.tree_leaves(stacked)
    s, lps = leaves[0].shape[:2]
    core = dict(rest["core"])
    for i in range(s * lps):
        core[f"h_{i}"] = jax.tree_util.tree_map(
            lambda x: x.reshape((s * lps,) + x.shape[2:])[i], stacked)
    out = dict(rest)
    out["core"] = core
    return out


@functools.partial(jax.jit, static_argnames=("num_heads", "dtype", "remat"))
def _block_chunk(chunk_params, x, num_heads: int, dtype, remat: bool = False):
    """Apply this stage's ``layers_per_stage`` blocks (scan over layers).
    ``remat`` rematerializes each layer on the backward pass — combined
    with staging this is what fits gpt2-xl-class training."""
    block = gpt2_mod.GPT2Block(num_heads, dtype=dtype)

    def body(h, layer_params):
        def apply_one(hh, lp):
            return block.apply({"params": lp}, hh)[0]
        if remat:
            h = jax.checkpoint(apply_one)(h, layer_params)
        else:
            h = apply_one(h, layer_params)
        return h, None

    x, _ = jax.lax.scan(body, x, chunk_params)
    return x


def pipeline_blocks(stacked_params, x: jax.Array, mesh: Mesh, *,
                    num_heads: int, n_microbatches: int,
                    axis: str = "stage", dtype=jnp.float32,
                    remat: bool = False,
                    data_axis: tp.Optional[str] = None) -> jax.Array:
    """(B, T, D) -> (B, T, D) through the staged block stack.

    ``stacked_params`` leaves are (S, L/S, ...), sharded ``P(axis)``.
    ``data_axis=None``: ``x`` is replicated. ``data_axis='data'`` composes
    PP with DP on a ('data', 'stage') mesh: the batch shards over 'data'
    and each data row runs its own independent pipeline over its stage
    column (the microbatch split happens on the LOCAL batch).
    """
    s = mesh.shape[axis]
    b = x.shape[0]
    m = n_microbatches
    dp = mesh.shape[data_axis] if data_axis else 1
    assert b % (m * dp) == 0, (
        f"batch {b} not divisible by microbatches {m} x data shards {dp}")
    perm = [(i, (i + 1) % s) for i in range(s)]
    other_axes = [a for a in mesh.axis_names if a not in (axis, data_axis)]
    x_spec = P(data_axis) if data_axis else P()

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), x_spec),
        out_specs=x_spec,
        check_vma=False,
    )
    def run(params_shard, x_local):
        # params_shard: (1, L/S, ...) — this stage's chunk
        chunk = jax.tree_util.tree_map(lambda p: p[0], params_shard)
        stage = jax.lax.axis_index(axis)
        ticks = m + s - 1
        mb = x_local.shape[0] // m
        x_all = x_local.reshape(m, mb, *x_local.shape[1:])

        def tick(carry, t):
            recv = carry
            # stage 0 ingests microbatch t (clamped; extra ticks feed a
            # repeat whose output is never collected)
            feed = jax.lax.dynamic_index_in_dim(
                x_all, jnp.clip(t, 0, m - 1), axis=0, keepdims=False)
            inp = jnp.where(stage == 0, feed, recv)
            out = _block_chunk(chunk, inp, num_heads=num_heads, dtype=dtype,
                               remat=remat)
            send = jax.lax.ppermute(out, axis, perm)
            return send, out

        _, outs = jax.lax.scan(tick, jnp.zeros_like(x_all[0]), jnp.arange(ticks))
        # collect the LAST stage's outputs for ticks [s-1, s-1+m)
        result = jax.lax.dynamic_slice_in_dim(outs, s - 1, m, axis=0)
        # every stage returns a full-shaped array; only the last stage's is
        # real — zero the others and psum so the stage axis replicates
        result = jnp.where(stage == s - 1, result, jnp.zeros_like(result))
        result = jax.lax.psum(result, axis)
        for a in other_axes:
            result = jax.lax.pmean(result, a)
        return result.reshape(x_local.shape)

    return run(stacked_params, x)


def _final_ln(rest_params, x):
    from summer_clip_tpu.models.clip.modeling import LayerNormF32

    return LayerNormF32().apply({"params": rest_params["core"]["ln_f"]}, x)


def _gpt2_stem(model, rest_params, input_ids):
    """Token + position embedding (``models/gpt2.py:GPT2.__call__`` front)."""
    wte = rest_params["wte"]["embedding"]
    t = input_ids.shape[1]
    x = jnp.take(wte, input_ids, axis=0).astype(model.dtype)
    return x + rest_params["core"]["wpe"][:t].astype(model.dtype)


def _gpt2_head(model, rest_params, x):
    """Final LN + tied-embedding logits (``GPT2.__call__`` tail)."""
    x = _final_ln(rest_params, x)
    wte = rest_params["wte"]["embedding"]
    return jnp.dot(x, wte.T.astype(x.dtype), preferred_element_type=jnp.float32)


def _clip_adapter_apply(model, rest_params, name: str, x):
    p = rest_params.get(name) or rest_params["adapter_emb"]  # shared head
    hid = p["fc1"]["kernel"].shape[1]
    out = p["fc2"]["kernel"].shape[1]
    return gpt2_mod.Adapter(hid, out, dtype=model.dtype).apply({"params": p}, x)


def _clip_gpt_stem(model, rest_params, input_ids):
    """CLIP table -> emb adapter -> +positions (``ClipGPT.__call__`` front).

    Shared by the scan and pipeline forwards so ClipGPT adapter/head
    semantics live in exactly one place next to ``models/gpt2.py``."""
    t = input_ids.shape[1]
    x = jnp.take(rest_params["clip_emb"], input_ids, axis=0).astype(model.dtype)
    x = _clip_adapter_apply(model, rest_params, "adapter_emb", x)
    return x + rest_params["core"]["wpe"][:t].astype(model.dtype)


def _clip_gpt_head(model, rest_params, x):
    """Final LN + adapter LM head (``ClipGPT.__call__`` tail)."""
    x = _final_ln(rest_params, x)
    head = _clip_adapter_apply(model, rest_params, "adapter_head",
                               rest_params["clip_emb"].astype(model.dtype))
    return jnp.dot(x, head.T, preferred_element_type=jnp.float32)


def pp_gpt2_forward(model: gpt2_mod.GPT2, rest_params, stacked_params,
                    input_ids: jax.Array, mesh: Mesh, *,
                    n_microbatches: int, axis: str = "stage",
                    data_axis: tp.Optional[str] = None) -> jax.Array:
    """Full GPT-2 LM forward with the block stack pipelined: embedding +
    positions and final LN + logits replicated (reference model semantics,
    ``models/gpt2.py:GPT2.__call__``), blocks staged over ``axis``."""
    x = _gpt2_stem(model, rest_params, input_ids)
    x = pipeline_blocks(stacked_params, x, mesh, num_heads=model.config.n_head,
                        n_microbatches=n_microbatches, axis=axis,
                        dtype=model.dtype, data_axis=data_axis)
    return _gpt2_head(model, rest_params, x)


def scan_gpt2_forward(model: gpt2_mod.GPT2, rest_params, stacked_params,
                      input_ids: jax.Array, *, remat: bool = False) -> jax.Array:
    """GPT-2 LM forward with the block stack as ONE ``lax.scan`` over layers.

    Same math as ``models/gpt2.py:GPT2.__call__`` (pinned by tests), but the
    XLA program contains a single block body instead of ``n_layer`` unrolled
    copies — a ~n_layer× smaller HLO, which is the lever against the
    10-570s remote-TPU compiles measured for gpt2-large (docs/KERNELS.md).
    ``stacked_params`` leaves are ``(1, n_layer, ...)`` from
    ``stack_block_params(params, 1)`` (the PP checkpoint layout, so save /
    resume code is shared with the pipeline path).
    """
    x = _gpt2_stem(model, rest_params, input_ids)
    chunk = jax.tree_util.tree_map(lambda p: p[0], stacked_params)
    x = _block_chunk(chunk, x, num_heads=model.config.n_head,
                     dtype=model.dtype, remat=remat)
    return _gpt2_head(model, rest_params, x)


def scan_clip_gpt_forward(model, rest_params, stacked_params,
                          input_ids: jax.Array, *,
                          remat: bool = False) -> jax.Array:
    """ClipGPT LM forward with the block stack scanned over layers —
    the single-device compile-time analog of :func:`pp_clip_gpt_forward`
    (embedding adapters / positions / final LN / head identical to
    ``models/gpt2.py:ClipGPT.__call__``)."""
    x = _clip_gpt_stem(model, rest_params, input_ids)
    chunk = jax.tree_util.tree_map(lambda p: p[0], stacked_params)
    x = _block_chunk(chunk, x, num_heads=model.config.n_head,
                     dtype=model.dtype, remat=remat)
    return _clip_gpt_head(model, rest_params, x)


def shard_stacked_pp(stacked_params, mesh: Mesh, axis: str = "stage"):
    """Place the stacked block tree with its stage axis on the mesh."""
    spec = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, spec), stacked_params)


def pp_clip_gpt_forward(model, rest_params, stacked_params,
                        input_ids: jax.Array, mesh: Mesh, *,
                        n_microbatches: int, axis: str = "stage",
                        remat: bool = False,
                        data_axis: tp.Optional[str] = None) -> jax.Array:
    """ClipGPT LM forward with the block stack pipelined.

    Embedding path (clip table -> emb adapter), positions, final LN and the
    adapter LM head stay replicated (``models/gpt2.py:ClipGPT.__call__``
    semantics); only the GPT core blocks are staged.
    """
    x = _clip_gpt_stem(model, rest_params, input_ids)
    x = pipeline_blocks(stacked_params, x, mesh, num_heads=model.config.n_head,
                        n_microbatches=n_microbatches, axis=axis,
                        dtype=model.dtype, remat=remat, data_axis=data_axis)
    return _clip_gpt_head(model, rest_params, x)
