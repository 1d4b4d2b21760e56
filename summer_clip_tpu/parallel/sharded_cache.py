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

import numpy as np
from jax.sharding import NamedSharding

from summer_clip_tpu.ops.cache_kernels import (
    _ceil_to, _pick_blocks_labels_dense, _pick_blocks_onehot,
    cache_attention_auto, cache_attention_reference, labels_dense_pallas,
    onehot_block_classes, onehot_pallas, onehot_table_operands)

__all__ = ["sharded_cache_logits", "pad_cache_for_mesh", "ShardedResidentCache"]


def pad_cache_for_mesh(cache_features: jnp.ndarray, cache_values: jnp.ndarray,
                       n_shards: int) -> tp.Tuple[jnp.ndarray, jnp.ndarray]:
    n = cache_features.shape[0]
    target = -(-n // n_shards) * n_shards
    if target != n:
        cache_features = jnp.pad(cache_features, ((0, target - n), (0, 0)))
        cache_values = jnp.pad(cache_values, ((0, target - n), (0, 0)))
    return cache_features, cache_values


def _shard_kernel(impl: str) -> tp.Callable:
    """Per-shard kernel choice. ``auto``: Pallas on TPU, dense XLA elsewhere;
    ``pallas``: the Pallas kernel everywhere (interpret mode off-TPU — this is
    how the pod composition shard_map+Pallas is proven on the virtual CPU
    mesh, VERDICT r2 #5); ``reference``: dense XLA everywhere."""
    if impl == "reference":
        return cache_attention_reference
    if impl == "pallas":
        from summer_clip_tpu.ops.cache_kernels import cache_attention

        interpret = jax.default_backend() != "tpu"
        return functools.partial(cache_attention, interpret=interpret)
    if impl == "auto":
        return cache_attention_auto
    raise ValueError(f"unknown impl: {impl!r}")


def sharded_cache_logits(test_features: jnp.ndarray, cache_features: jnp.ndarray,
                         cache_values: jnp.ndarray, betas: jnp.ndarray,
                         mesh: Mesh, axis: str = "model",
                         impl: str = "auto") -> jnp.ndarray:
    """(B, Nt, C) logits with the cache sharded over ``axis`` of ``mesh``."""
    n_shards = mesh.shape[axis]
    cache_features, cache_values = pad_cache_for_mesh(cache_features, cache_values, n_shards)
    betas = jnp.atleast_1d(jnp.asarray(betas, jnp.float32))

    other_axes = [a for a in mesh.axis_names if a != axis]
    kernel = _shard_kernel(impl)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis, None), P()),
        out_specs=P(),
        check_vma=False,
    )
    def compute(f, c_shard, v_shard, b):
        part = kernel(f, c_shard, v_shard, b)
        part = jax.lax.psum(part, axis)
        # replicate across unused axes so out_specs=P() is valid
        for a in other_axes:
            part = jax.lax.pmean(part, a)
        return part

    return compute(jnp.asarray(test_features, jnp.float32),
                   jnp.asarray(cache_features, jnp.float32),
                   jnp.asarray(cache_values, jnp.float32), betas)


class ShardedResidentCache:
    """Cache features + outs RESIDENT on the mesh, rows sharded over ``axis``.

    The grid-sweep analog of the single-device resident path
    (``apps/image_attention.py``): the normalized (N, D) features and the raw
    (N, C) outs are uploaded once, sharded ``P(axis, None)``. Each grid combo
    then costs one tiny host->device transfer — an N-byte row mask — instead
    of re-sharding ~GBs of features + values:

    - **selection** is the mask (unselected/pad rows get zero value vectors,
      which contribute exactly nothing — the kernel's padding invariant), so
      no cross-shard gather / all-to-all ever happens; each shard masks its
      own rows,
    - **Hard / Softmax value strategies** compute per-shard on device from
      the resident outs,
    - the only collective is the final ``psum`` of the per-shard partial
      (B, Nt, C) logits over ICI.

    Trade-off vs a compacted gather: masked rows still ride through the
    kernel (shard-local flops on unselected rows), which is the right trade
    on TPU — static shapes, one compile, zero re-upload, no a2a.
    """

    def __init__(self, cache_features: np.ndarray, cache_outs: np.ndarray,
                 mesh: Mesh, axis: str = "model", impl: str = "auto"):
        self.mesh, self.axis = mesh, axis
        self.impl = impl
        self.n_rows = int(cache_features.shape[0])
        n_shards = mesh.shape[axis]
        cf = np.asarray(cache_features, np.float32)
        cf = cf / np.maximum(np.linalg.norm(cf, axis=1, keepdims=True), 1e-12)
        co = np.asarray(cache_outs, np.float32)
        # PREDICTION-SORTED residence (like the single-device app path): row
        # order never changes the psum'd logits, and class-grouped rows make
        # Hard-value combos eligible for the one-hot kernel per shard.
        # Selection masks map through `_rank` in logits().
        preds = co.argmax(axis=1).astype(np.int32)
        order = np.argsort(preds, kind="stable")
        self._rank = np.empty_like(order)
        self._rank[order] = np.arange(order.size)
        cf, co = cf[order], co[order]
        # one-hot kernel geometry: per-shard rows must align to its cache
        # block, so pad rows to a multiple of n_shards * block_n
        self._onehot_bq, self._onehot_bn, self._onehot_bb = _pick_blocks_onehot(
            _ceil_to(cf.shape[1], 128), _ceil_to(max(co.shape[1], 128), 128))
        # label-built dense variant (scattered residences) has its own VMEM
        # budget (the (bn, c_p) value rebuild lives in VMEM too); its bn is
        # clamped to the onehot bn so the shard row padding stays aligned
        # (both are power-of-two multiples of 128, so min divides max)
        ld_bq, ld_bn, ld_bb = _pick_blocks_labels_dense(
            _ceil_to(cf.shape[1], 128), _ceil_to(max(co.shape[1], 128), 128))
        self._ldense = (ld_bq, min(ld_bn, self._onehot_bn), ld_bb)
        pad = (-self.n_rows) % (n_shards * self._onehot_bn)
        if pad:
            cf = np.concatenate([cf, np.zeros((pad, cf.shape[1]), np.float32)])
            co = np.concatenate([co, np.zeros((pad, co.shape[1]), np.float32)])
        self.padded_rows = cf.shape[0]
        self._preds = np.concatenate([preds[order],
                                      np.full(pad, -1, np.int32)])
        # k_max from the FULL label set = a stable upper bound for every
        # selection (masking only removes classes from blocks)
        _, self._k_max = onehot_block_classes(self._preds, self._onehot_bn)
        spec = NamedSharding(mesh, P(axis, None))
        # device_put straight from host numpy: each device receives only its
        # row shard (staging through jnp.asarray would commit the full ~GBs
        # array to one chip first)
        self.features = jax.device_put(cf, spec)
        self.outs = jax.device_put(co, spec)
        self._compute: tp.Dict[str, tp.Callable] = {}

    def _build(self, kind: str) -> tp.Callable:
        axis = self.axis
        other_axes = [a for a in self.mesh.axis_names if a != axis]
        kernel = _shard_kernel(self.impl)

        @functools.partial(
            shard_map, mesh=self.mesh,
            in_specs=(P(), P(axis, None), P(axis, None), P(axis), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
        def compute(f, c_shard, o_shard, m_shard, b, scale):
            if kind == "hard":
                v = jax.nn.one_hot(jnp.argmax(o_shard, axis=1), o_shard.shape[1],
                                   dtype=jnp.float32)
            elif kind == "softmax":
                v = jax.nn.softmax(scale * o_shard, axis=1)
            else:  # pragma: no cover - guarded by logits()
                raise ValueError(kind)
            v = v * m_shard[:, None]
            part = kernel(f, c_shard, v, b)
            part = jax.lax.psum(part, axis)
            for a in other_axes:
                part = jax.lax.pmean(part, a)
            return part

        return compute

    def _build_onehot(self, n_betas: int, skinny: bool) -> tp.Callable:
        """shard_map body running a label-driven kernel on each shard's rows:
        the per-shard label slice (+ tile-legal block class tables when
        ``skinny``) replaces the value matrix entirely; the only collective
        stays the final psum. ``skinny=False`` = the label-built dense kernel
        (class-scattered residences past the k limit)."""
        axis = self.axis
        other_axes = [a for a in self.mesh.axis_names if a != axis]
        on_tpu = jax.default_backend() == "tpu"
        compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32
        num_classes = int(self.outs.shape[1])
        c_p = _ceil_to(max(num_classes, 128), 128)
        bq, bn = self._onehot_bq, self._onehot_bn
        bb = min(self._onehot_bb, max(1, n_betas))

        if skinny:
            specs = (P(), P(axis, None), P(axis, None), P(axis, None),
                     P(None, axis), P())
        else:
            specs = (P(), P(axis, None), P(axis, None), P())

        @functools.partial(
            shard_map, mesh=self.mesh,
            in_specs=specs,
            out_specs=P(),
            check_vma=False,
        )
        def compute(f, c_shard, lab_shard, *rest):
            if skinny:
                crow_shard, ccol_shard, b = rest
                part = onehot_pallas(
                    f.astype(compute_dtype), c_shard.astype(compute_dtype),
                    lab_shard, crow_shard, ccol_shard, b,
                    block_q=bq, block_n=bn, block_b=bb, c_p=c_p,
                    num_classes=num_classes, interpret=not on_tpu,
                    compute_dtype=compute_dtype)
            else:
                (b,) = rest
                ld_bq, ld_bn, ld_bb = self._ldense
                part = labels_dense_pallas(
                    f.astype(compute_dtype), c_shard.astype(compute_dtype),
                    lab_shard, b,
                    block_q=ld_bq, block_n=ld_bn,
                    block_b=min(ld_bb, max(1, n_betas)), c_p=c_p,
                    num_classes=num_classes, interpret=not on_tpu,
                    compute_dtype=compute_dtype)
            part = jax.lax.psum(part, axis)
            for a in other_axes:
                part = jax.lax.pmean(part, a)
            return part

        return compute

    def _onehot_logits(self, test_norm, pos: np.ndarray, betas) -> jnp.ndarray:
        labels_eff = np.full(self.padded_rows, -1, np.int32)
        labels_eff[pos] = self._preds[pos]
        spec_rows = NamedSharding(self.mesh, P(self.axis, None))
        skinny = self._k_max <= 128
        key = ("onehot", skinny, int(betas.shape[0]))
        if key not in self._compute:
            self._compute[key] = self._build_onehot(int(betas.shape[0]), skinny)
        if not skinny:
            # class-scattered residence: label-built dense per shard (no
            # tables; dense MXU, still zero value materialization/streaming)
            return self._compute[key](
                jnp.asarray(test_norm, jnp.float32), self.features,
                jax.device_put(labels_eff.reshape(-1, 1), spec_rows), betas)
        # stable static table width across selections (no recompiles)
        crow8, ccol128, _ = onehot_table_operands(
            labels_eff, self._onehot_bn, k_pad=self._k_max)
        spec_cols = NamedSharding(self.mesh, P(None, self.axis))
        return self._compute[key](
            jnp.asarray(test_norm, jnp.float32), self.features,
            jax.device_put(labels_eff.reshape(-1, 1), spec_rows),
            jax.device_put(crow8, spec_rows),
            jax.device_put(ccol128, spec_cols), betas)

    def logits(self, test_norm: jnp.ndarray, inds: np.ndarray, betas,
               kind: str = "hard", scale: float = 1.0) -> jnp.ndarray:
        """(B, Nt, C) fused cache logits for the selected rows ``inds``."""
        if kind not in ("hard", "softmax"):
            raise ValueError(f"unknown value kind: {kind}")
        betas = jnp.atleast_1d(jnp.asarray(betas, jnp.float32))
        # selection indices are in ORIGINAL row order; residence is sorted
        pos = self._rank[np.asarray(inds)]
        from summer_clip_tpu.ops import cache_kernels as ck

        if kind == "hard" and (jax.default_backend() == "tpu" or ck.ONEHOT_FORCE):
            try:
                return self._onehot_logits(test_norm, pos, betas)
            except Exception as e:  # noqa: BLE001 — masked dense path is always valid
                import warnings

                warnings.warn(f"sharded one-hot kernel unavailable "
                              f"({type(e).__name__}: {str(e)[:120]}); "
                              "masked dense fallback")
        if kind not in self._compute:
            self._compute[kind] = self._build(kind)
        mask = np.zeros(self.padded_rows, np.float32)
        mask[pos] = 1.0
        return self._compute[kind](jnp.asarray(test_norm, jnp.float32),
                                   self.features, self.outs, jnp.asarray(mask),
                                   betas, jnp.asarray(scale, jnp.float32))
