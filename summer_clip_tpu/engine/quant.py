"""Weight compression for the decode path (param-read-bound serving).

Single-stream KV-cached decode reads every parameter once per token — the
measured 124M decode sits at ~2x the f32 parameter-read roofline
(docs/KERNELS.md), so the params' HBM footprint IS the speed of light.
Two levers, both weight-only (activations stay bf16/f32, KV cache
untouched, no calibration data needed):

- :func:`cast_params` — store params in bf16 (2x less traffic, ~1e-3
  relative rounding; the matmuls already run bf16 on TPU),
- :func:`quantize_tree` — symmetric int8 with a per-output-column f32
  scale for matrix leaves (4x less traffic, ~0.4% relative error). The
  quantized tree is consumed AS STORED: ``models/gpt2.QDense`` streams
  int8 weight slabs through the Pallas GEMV (``ops/gemv.py``), embedding
  gathers read int8 rows (:func:`~summer_clip_tpu.ops.gemv.gather_rows`),
  and decode programs read logits off a hoisted int8 head table
  (:func:`quant_head_table`) — nothing dequantizes wide weights into HBM
  on the hot path (the earlier in-loop-dequant-behind-a-barrier design
  measured 1.26-1.45x slower; docs/KERNELS.md round-3 GEMV section).

Embedding-sized tables (wte/wpe) are quantized per-ROW (axis of gather),
biases/LayerNorm scales stay f32 (negligible bytes, high sensitivity).
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp

__all__ = ["cast_params", "quantize_tree", "quantize_array",
           "dequantize_tree", "quant_head_table"]

_SENSITIVE = ("bias", "scale")  # LayerNorm/bias leaves: keep f32
# gather-axis tables: scale per ROW (a handful of anomalous tokens with
# ~100x norms would otherwise poison every column's scale — exactly the
# tokens sandbox/anomalous_tokens.py studies)
_EMBED_NAMES = ("embedding", "wpe", "clip_emb")


def cast_params(params, dtype=jnp.bfloat16):
    """Cast float matrix params to ``dtype``; tiny/sensitive leaves stay."""
    def cast(path, x):
        name = str(getattr(path[-1], "key", "")) if path else ""
        if (jnp.issubdtype(x.dtype, jnp.floating) and x.ndim >= 2
                and name not in _SENSITIVE):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map_with_path(cast, params)


def _quant_leaf(x: jax.Array, per_row: bool) -> tp.Dict[str, jax.Array]:
    # matmul kernels: per-output-column scale (last axis); gather tables
    # (``per_row``): per-row scale so one outlier token only widens its own
    # quantization step
    if per_row:
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    else:
        amax = jnp.max(jnp.abs(x), axis=tuple(range(x.ndim - 1)), keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale.astype(jnp.float32)}


def quantize_array(x: jax.Array, *, per_row: bool = False):
    """int8-quantize ONE array into a ``{"q", "scale"}`` leaf. Used by the
    decode programs to quantize a lm-head table computed at trace time
    (``apps/gen_gpt._head_table``), not just stored params."""
    return _quant_leaf(x, per_row=per_row)


def quant_head_table(model, variables):
    """The int8 lm-head table in kernel layout: (n_embd, V) q, (1, V) scale.

    ClipGPT's head is ``adapter_head(clip_emb)`` — a 49k-row MLP (~181
    GFLOP + ~126MB at gpt2-large). Decode programs compute it ONCE
    (before the scan / at engine construction), then quantize per vocab
    column; leaving it to ``model.apply`` inside the hot path re-runs it
    per token on the quantized tree (measured 1.49 ms/step vs 0.60 for a
    hoisted int8 read — tools/profile_decode_large.py, gpt2-large)."""
    from summer_clip_tpu.models import gpt2 as gpt2_mod
    from summer_clip_tpu.ops.gemv import is_qleaf

    model = getattr(model, "model", model)  # unwrap TPInt8Decoder-style ducks
    if isinstance(model, gpt2_mod.ClipGPT):
        # one jitted program (eager apply dispatches the 49k-row adapter
        # MLP op-by-op through the tunnel at engine construction)
        return _clip_head_table_jit(model)(variables)
    wte = variables["params"]["wte"]["embedding"]
    if is_qleaf(wte):  # already per-row int8: transpose in place
        return {"q": wte["q"].T, "scale": wte["scale"].T}
    return quantize_array(wte.T, per_row=False)


@functools.lru_cache(maxsize=8)
def _clip_head_table_jit(model):
    @jax.jit
    def build(variables):
        table = model.apply(variables, method=model.lm_head_table)
        return quantize_array(table.T, per_row=False)
    return build


def _quantize_tree_impl(params):
    def quant(path, x):
        name = str(getattr(path[-1], "key", "")) if path else ""
        if (hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                and x.ndim >= 2 and name not in _SENSITIVE):
            return _quant_leaf(x, per_row=name in _EMBED_NAMES)
        return x
    return jax.tree_util.tree_map_with_path(quant, params)


_quantize_tree_jit = jax.jit(_quantize_tree_impl)


def quantize_tree(params):
    """int8-quantize float matrix leaves; everything else passes through.

    Returns a pytree where quantized leaves become ``{"q": int8,
    "scale": f32}`` dicts (marked by key structure, reversed by
    :func:`dequantize_tree`).

    Runs as ONE jitted program: the eager tree_map dispatched ~6 tiny ops
    per leaf (~900 dispatches at gpt2-large), which on the tunneled chip
    costs ~100s of milliseconds of engine-construction latency per
    ``ContinuousBatcher(quant_int8=True)`` (round-5 serving session).
    """
    return _quantize_tree_jit(params)


def _is_qleaf(x) -> bool:
    import collections.abc

    # Mapping, not dict: trees that round-tripped through flax scopes carry
    # FrozenDict-wrapped leaves
    return isinstance(x, collections.abc.Mapping) and set(x) == {"q", "scale"}


def dequantize_tree(qparams, dtype=jnp.bfloat16):
    """Reconstruct a dense tree (host-side / outside-loop use)."""
    def deq(x):
        if _is_qleaf(x):
            return (x["q"].astype(jnp.float32) * x["scale"]).astype(dtype)
        return x
    return jax.tree_util.tree_map(deq, qparams, is_leaf=_is_qleaf)


