"""Expert parallelism: a switch-routed MoE MLP sharded over an 'expert' axis.

The reference has no mixture-of-experts anywhere (SURVEY.md §2.9: EP
absent); this exists so the framework's parallelism surface (dp / tp / pp /
sp-analog / ep) is complete and validated — a GPT block's MLP can be
swapped for :class:`MoEMLP` and its experts laid out one-per-device.

Design (TPU-first, static shapes):

- **top-1 switch routing** (Switch-Transformer style): a linear router
  picks one expert per token; the expert outputs are combined with the
  router probability as a scale (straight-through-friendly, differentiable
  through the prob factor),
- **dense oracle**: :meth:`MoEMLP.__call__` computes every expert on every
  token and masks — exact, O(E·tokens) FLOPs, the single-device reference,
- **EP execution** (:func:`moe_apply_ep`): experts shard ``P('expert')``
  via shard_map; each device computes only its local experts' outputs for
  the tokens routed to them (masked), one ``psum`` combines. No
  all-to-all and no capacity dropping: every token is served exactly by
  its expert at static shape. (A capacity-bucketed ``all_to_all`` variant
  is the bandwidth-optimal next step at pod scale; the masked-psum layout
  is exact and keeps each expert's FLOPs on its own chip.)

Equality of the two paths — forward and gradients — is pinned in
``tests/test_parallel.py`` and exercised by ``dryrun_multichip`` stage 5.
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["MoEMLP", "moe_apply_ep", "shard_experts_ep", "check_ep_divisibility"]


def check_ep_divisibility(num_experts: int, n_shards: int) -> None:
    if num_experts % n_shards != 0:
        raise ValueError(f"num_experts {num_experts} not divisible by "
                         f"{n_shards} expert shards")


def _expert_ffn(w1, b1, w2, b2, x):
    """One expert's GELU MLP on (N, D) tokens."""
    h = jax.nn.gelu(x @ w1 + b1, approximate=True)
    return h @ w2 + b2


class MoEMLP(nn.Module):
    """Top-1 switch MoE feed-forward. Input (..., D) -> (..., D).

    Params: ``router`` (D, E) and stacked expert weights with a leading
    (E, ...) axis — the axis :func:`shard_experts_ep` places on the mesh.
    """

    num_experts: int
    hidden_mult: int = 4
    dtype: tp.Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        e = self.num_experts
        h = self.hidden_mult * d
        router = self.param("router", nn.initializers.lecun_normal(), (d, e),
                            jnp.float32)
        w1 = self.param("w1", nn.initializers.lecun_normal(), (e, d, h), jnp.float32)
        b1 = self.param("b1", nn.initializers.zeros, (e, h), jnp.float32)
        w2 = self.param("w2", nn.initializers.lecun_normal(), (e, h, d), jnp.float32)
        b2 = self.param("b2", nn.initializers.zeros, (e, d), jnp.float32)
        return moe_forward_dense(
            {"router": router, "w1": w1, "b1": b1, "w2": w2, "b2": b2},
            x, dtype=self.dtype)


def _route(params, x2, dtype):
    """(N, D) tokens -> (one-hot (N, E), gate prob (N, 1)) for top-1 routing."""
    logits = (x2.astype(jnp.float32) @ params["router"]).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    idx = jnp.argmax(logits, axis=-1)
    onehot = jax.nn.one_hot(idx, logits.shape[-1], dtype=jnp.float32)
    gate = jnp.sum(probs * onehot, axis=-1, keepdims=True)
    return onehot, gate.astype(dtype)


def moe_forward_dense(params, x: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Dense oracle: every expert runs on every token, outputs masked."""
    shape = x.shape
    x2 = x.reshape(-1, shape[-1]).astype(dtype)
    onehot, gate = _route(params, x2, dtype)
    outs = jax.vmap(
        lambda w1, b1, w2, b2: _expert_ffn(w1.astype(dtype), b1.astype(dtype),
                                           w2.astype(dtype), b2.astype(dtype), x2)
    )(params["w1"], params["b1"], params["w2"], params["b2"])   # (E, N, D)
    combined = jnp.einsum("end,ne->nd", outs.astype(jnp.float32),
                          onehot).astype(dtype)
    return (combined * gate).reshape(shape)


def moe_apply_ep(params, x: jax.Array, mesh: Mesh, axis: str = "expert",
                 dtype=jnp.float32) -> jax.Array:
    """EP execution: expert weights sharded over ``axis``; each device
    computes its local experts on the tokens routed to them, one psum."""
    e = params["w1"].shape[0]
    n_shards = mesh.shape[axis]
    check_ep_divisibility(e, n_shards)
    e_local = e // n_shards
    shape = x.shape
    other_axes = [a for a in mesh.axis_names if a != axis]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    def run(router, w1, b1, w2, b2, x2):
        shard = jax.lax.axis_index(axis)
        onehot, gate = _route({"router": router}, x2, dtype)  # (N, E) global
        local = jax.lax.dynamic_slice_in_dim(onehot, shard * e_local, e_local,
                                             axis=1)          # (N, e_local)
        outs = jax.vmap(
            lambda a, b, c, d_: _expert_ffn(a.astype(dtype), b.astype(dtype),
                                            c.astype(dtype), d_.astype(dtype), x2)
        )(w1, b1, w2, b2)                                     # (e_local, N, D)
        part = jnp.einsum("end,ne->nd", outs.astype(jnp.float32), local)
        part = jax.lax.psum(part, axis)
        for a in other_axes:
            part = jax.lax.pmean(part, a)
        return (part.astype(dtype) * gate)

    x2 = x.reshape(-1, shape[-1]).astype(dtype)
    return run(params["router"], params["w1"], params["b1"], params["w2"],
               params["b2"], x2).reshape(shape)


def shard_experts_ep(params, mesh: Mesh, axis: str = "expert"):
    """Place the expert-stacked leaves P(axis); router replicates."""
    ex = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    return {
        "router": jax.device_put(params["router"], repl),
        **{k: jax.device_put(params[k], ex) for k in ("w1", "b1", "w2", "b2")},
    }
