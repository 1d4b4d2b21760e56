"""CLIP-search / image-attention: the thesis method's evaluation grid.

Rebuild of the flagship reference app
(``summer_clip/clip_searcher/image_attention.py``): training-free,
label-free classification by attending test features over a cache of train
features with pseudo-label values, swept over a 4-deep strategy grid
(cache-selection x cache-weights x cache-values x alpha), each combo logged
as a machine-readable ``searcher_result`` record.

TPU-first changes (same grid semantics, different execution):

- cache **selection** runs host-side (numpy — ragged index math),
- the **beta sweep never recomputes affinity**: all betas of the weights
  strategy are batched through the fused Pallas cache-attention kernel
  (``ops.cache_kernels``), one launch per (selection, value) combo instead
  of one dense (Nt, Nc) matmul per beta (cf. reference
  ``image_attention.py:106-110``),
- **alpha blending + top-1/top-5 accuracy** are one jitted sweep over the
  (beta, alpha) grid — sequential over betas, vmapped over alphas — with
  no host round-trips inside the sweep.
"""

from __future__ import annotations

import typing as tp
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from summer_clip_tpu.apps.common import create_clip_session
from summer_clip_tpu.apps.features_io import resolve_array
from summer_clip_tpu.apps.savers import TensorsNumpySaver
from summer_clip_tpu.core import config as C
from summer_clip_tpu.engine.trainer import BaseTrainer, run_trainer
from summer_clip_tpu.methods import cache as cache_methods
from summer_clip_tpu.methods.cache import cache_logits_for_betas
from summer_clip_tpu.methods.zeroshot import (compute_accuracy, label_rank,
                                              zeroshot_classifier)
from summer_clip_tpu.store import FeatureStore


def _one_hot(labels: np.ndarray, num_classes: int) -> np.ndarray:
    out = np.zeros((labels.shape[0], num_classes), np.float32)
    out[np.arange(labels.shape[0]), labels.astype(np.int64)] = 1.0
    return out


@jax.jit
def _device_hard_values(outs: jax.Array, valid: jax.Array) -> jax.Array:
    """One-hot of the predicted class, zeroed past ``valid`` (pad rows)."""
    v = jax.nn.one_hot(jnp.argmax(outs, axis=1), outs.shape[1], dtype=jnp.int8)
    mask = (jnp.arange(outs.shape[0]) < valid)[:, None]
    return v * mask.astype(v.dtype)


@jax.jit
def _device_softmax_values(outs: jax.Array, valid: jax.Array, scale: jax.Array) -> jax.Array:
    v = jax.nn.softmax(scale * outs.astype(jnp.float32), axis=1)
    mask = (jnp.arange(outs.shape[0]) < valid)[:, None]
    v = v * mask
    # bf16 value operand: the kernel's measured-fastest dtype (docs/KERNELS.md)
    return v.astype(jnp.bfloat16) if jax.default_backend() == "tpu" else v


class _ShardedValueSpec(tp.NamedTuple):
    """Marker: compute this value strategy per-shard on the resident mesh
    cache (``parallel.ShardedResidentCache``) instead of on the host."""
    kind: str            # "hard" | "softmax"
    scale: float


class _OnehotValues(tp.NamedTuple):
    """Marker: Hard (one-hot) values represented by per-row labels only —
    feeds the structure-exploiting ``cache_attention_onehot`` kernel (the
    value matrix is never materialized). Produced when the resident cache is
    prediction-sorted, so selections gather class-grouped rows."""
    labels: np.ndarray   # (valid,) int32 predicted class per selected row
    num_classes: int


def _onehot_kernel_ok() -> bool:
    """Single source of truth for one-hot routing lives in ops.cache_kernels
    (ONEHOT_FORCE there is the off-TPU test hook)."""
    from summer_clip_tpu.ops import cache_kernels as ck

    return jax.default_backend() == "tpu" or ck.ONEHOT_FORCE


class ImageAttention(BaseTrainer):
    # -- setup ---------------------------------------------------------------
    def setup_mesh(self):
        """Shard the cache length N across all devices when more than one
        is visible (the SP-analog of this workload — SURVEY.md §2.9)."""
        import jax as _jax

        from summer_clip_tpu.parallel import create_mesh

        n = len(_jax.devices())
        self.mesh = create_mesh(data=1, model=n) if n > 1 else None

    def setup_dataset(self):
        self.dataset = C.instantiate(self.cfg.dataset)
        self.test_labels = np.asarray(self.dataset.labels(), np.int32)
        self.cache_labels: tp.Optional[np.ndarray] = None
        if self.cfg.cache.get("dataset"):
            cache_view = C.instantiate(self.cfg.cache.dataset)
            self.cache_labels = np.asarray(cache_view.labels(), np.int32)
        if self.cfg.run_saves.save_labels:
            self.save_labels()

    def setup_logger(self):
        super().setup_logger()
        self.gold_labels_saver = TensorsNumpySaver(Path("./gold_labels"))
        self.cache_saver = TensorsNumpySaver(Path("./cache_ids"))
        self.preds_saver = TensorsNumpySaver(Path("./preds_ids"))

    def save_labels(self) -> None:
        self.gold_labels_saver.save_named_tensor(self.test_labels, "test_labels")
        if self.cache_labels is not None:
            self.gold_labels_saver.save_named_tensor(self.cache_labels, "cache_labels")

    def setup_model(self):
        store = FeatureStore(self.cfg.store.root) if self.cfg.get("store") else None
        self.test_image_features = np.asarray(resolve_array(
            store, self.cfg.data.get("features_key"),
            self.cfg.data.get("image_features_path"), "features"), np.float32)

        session = create_clip_session(self.cfg.clip.model_name,
                                      self.cfg.clip.get("checkpoint_path"),
                                      self.cfg.clip.get("dtype"), remat=self.cfg.clip.get("remat"),
                                      logger=self.logger, quant=self.cfg.clip.get("quant"))
        classes = self.cfg.prompting.classes or self.dataset.classes
        classifier = zeroshot_classifier(session.encode_text, classes,
                                         self.cfg.prompting.templates)
        f = jnp.asarray(self.test_image_features)
        f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
        self.clip_logits = 100.0 * f @ classifier.T

        self.origin_cache_image_features = np.asarray(resolve_array(
            store, self.cfg.cache.get("features_key"),
            self.cfg.cache.get("image_features_path"), "features"), np.float32)
        self.origin_cache_image_outs = np.asarray(resolve_array(
            store, self.cfg.cache.get("outs_key") or self.cfg.cache.get("features_key"),
            self.cfg.cache.get("image_outs_path"), "outs"), np.float32)
        self.logger.log_info(f"original-data-size: {self.origin_cache_image_outs.shape[0]}")

        # device-resident, pre-normalized cache: strategy selections become
        # device gathers (single-device) or an N-byte row mask (sharded mesh:
        # ShardedResidentCache) instead of re-uploading the (N, D) matrix per
        # combo. The outs matrix is resident too, so Hard/Softmax VALUE
        # strategies compute on device — at ImageNet scale the per-combo
        # value upload alone is ~1.3GB, now zero.
        self._cache_dev = None
        self._outs_dev = None
        self._resident_shards = None
        self._resident_order = None   # original -> sorted permutation
        self._resident_rank = None    # original id -> sorted position
        self._resident_preds = None   # predicted class per SORTED row
        self._cache_rows = self.origin_cache_image_features.shape[0]
        if self.mesh is not None:
            from summer_clip_tpu.parallel import ShardedResidentCache

            self._resident_shards = ShardedResidentCache(
                self.origin_cache_image_features, self.origin_cache_image_outs,
                self.mesh, axis="model")
        if self.mesh is None:
            # resident dtype: bf16 halves HBM residency (the full-ImageNet
            # cache is 2.6GB features + 2.5GB outs in bf16 vs 10.4GB f32 —
            # the difference between fitting one 16GB chip or not); rows are
            # normalized in f32 FIRST, so bf16 only rounds the stored value
            rd = str(self.cfg.cache.get("resident_dtype") or "float32")
            rdtype = {"bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16,
                      "float32": jnp.float32, "f32": jnp.float32}[rd]
            cn = self.origin_cache_image_features
            cn = cn / np.maximum(np.linalg.norm(cn, axis=-1, keepdims=True), 1e-12)
            # PREDICTION-SORTED residence: row order is irrelevant to every
            # combo (the cache logits are sums over rows), so store the
            # resident matrices grouped by predicted class. Selections map
            # through `_resident_rank` and gather class-grouped rows, which
            # makes Hard-value combos eligible for the one-hot kernel
            # (ops/cache_kernels.cache_attention_onehot: the (N, C) value
            # matrix is never built, and its matmul collapses to two skinny
            # dots). Host-side index math, per house rules.
            # predictions from the outs AS THEY WILL RESIDE: with bf16
            # residency the dense fallback argmaxes bf16-rounded outs, so
            # the one-hot labels must come from the same rounded values or
            # tie rows flip class between the two paths
            outs_for_preds = self.origin_cache_image_outs
            if rdtype == jnp.bfloat16:
                import ml_dtypes

                outs_for_preds = outs_for_preds.astype(ml_dtypes.bfloat16).astype(np.float32)
            preds = outs_for_preds.argmax(axis=1).astype(np.int32)
            order = np.argsort(preds, kind="stable")
            self._resident_order = order
            self._resident_rank = np.empty_like(order)
            self._resident_rank[order] = np.arange(order.size)
            self._resident_preds = preds[order]
            cn = cn[order]
            # pre-pad rows to the kernel's max block so neither the identity
            # (AllLogits) path nor the kernel ever copies the big matrix
            pad = (-cn.shape[0]) % 1024
            if pad:
                cn = np.concatenate([cn, np.zeros((pad, cn.shape[1]), np.float32)])
            self._cache_dev = jnp.asarray(cn, rdtype)
            co = self.origin_cache_image_outs[order]
            if pad:
                co = np.concatenate([co, np.zeros((pad, co.shape[1]), np.float32)])
            self._outs_dev = jnp.asarray(co, rdtype)
        tf = self.test_image_features
        self._test_norm = jnp.asarray(
            tf / np.maximum(np.linalg.norm(tf, axis=-1, keepdims=True), 1e-12))

    # -- cache construction ----------------------------------------------------
    def build_cache(self, strategy, feats: np.ndarray, outs: np.ndarray
                    ) -> tp.Tuple[np.ndarray, np.ndarray, dict]:
        self._last_inds: tp.Optional[np.ndarray] = None
        self._outs_replaced = False
        if not isinstance(strategy, cache_methods.IndexedCacheStrategy):
            cf, co = strategy.transform(feats, outs)
            return cf, co, {}
        inds = np.asarray(strategy.select(feats, outs))
        self._last_inds = inds
        cf, co = feats[inds], outs[inds]
        info: dict = {"cache_size": int(co.shape[0])}
        if self.cfg.run_saves.save_cache_inds:
            info["cache_inds_path"] = str(self.cache_saver.save_tensor(inds))
        if self.cache_labels is not None:
            labels = self.cache_labels[inds]
            a1, a5 = compute_accuracy(co, labels)
            info.update(acc1=a1, acc5=a5)
            if self.cfg.cache.get("replace_outs_with_golds", False):
                co = _one_hot(labels, co.shape[1])
                self._outs_replaced = True
                a1, a5 = compute_accuracy(co, labels)
                info.update(acc1_replace=a1, acc5_replace=a5)
        return cf, co, info

    # -- grid ----------------------------------------------------------------
    def _grid_eval_fn(self):
        """Jitted (beta-chunk) x alpha accuracy evaluator.

        The logits/labels ride as jit ARGUMENTS, not closure captures: a
        captured jax.Array becomes a literal constant in the lowered MLIR,
        and at ImageNet scale the (50k, 1000) f32 clip_logits turned every
        combo's grid compile into a 200MB payload for the out-of-process
        compile helper (~100s per cold compile; measured in
        tools/attr_all_logits_compile.py / attr_grid_variants.py — the
        same program compiles in ~1s with the operands passed as args).
        """
        labels = jnp.asarray(self.test_labels)
        clip_logits = self.clip_logits
        alphas = jnp.asarray(list(self.cfg.cache.alpha), jnp.float32)
        k5 = min(5, int(clip_logits.shape[1]))

        @jax.jit
        def evaluate_args(cache_chunk: jax.Array, clip_logits: jax.Array,
                          labels: jax.Array, alphas: jax.Array
                          ) -> tp.Tuple[jax.Array, jax.Array]:
            def eval_beta(cache_one):
                def eval_alpha(alpha):
                    logits = clip_logits + alpha * cache_one
                    # sort-free top-k membership (exact vs lax.top_k incl.
                    # index tiebreaks, ~10x faster per grid on-chip —
                    # methods/zeroshot.label_rank)
                    rank = label_rank(logits, labels)
                    hit1 = (rank == 0).astype(jnp.float32).mean() * 100.0
                    hit5 = (rank < k5).astype(jnp.float32).mean() * 100.0
                    return hit1, hit5
                return jax.vmap(eval_alpha)(alphas)
            # sequential over betas: a beta-vmap materializes the full
            # (betas, alphas, Nt, C) f32 slab — ~11GB at ImageNet scale
            # (50k x 1000, 8x7 grid), which OOMs a 16GB chip. lax.map keeps
            # one (alphas, Nt, C) slab live (~1.4GB) with the same results.
            return jax.lax.map(eval_beta, cache_chunk)

        def evaluate(cache_chunk: jax.Array) -> tp.Tuple[jax.Array, jax.Array]:
            return evaluate_args(cache_chunk, clip_logits, labels, alphas)

        # exposed for the compile-payload canary (tests/test_compile_payload)
        evaluate.jitted = evaluate_args
        evaluate.operands = (clip_logits, labels, alphas)
        return evaluate

    def _inject_context(self, strategy_cfg: dict) -> dict:
        """Fill label-dependent strategy params from the cache dataset."""
        cfg = dict(strategy_cfg)
        if "cache_labels" in cfg and cfg["cache_labels"] is None:
            assert self.cache_labels is not None, "strategy needs cache labels but no cache dataset configured"
            cfg["cache_labels"] = self.cache_labels
        return cfg

    def train_loop(self):
        a1, a5 = compute_accuracy(self.clip_logits, self.test_labels)
        zinfo: dict = {"acc1": a1, "acc5": a5}
        if self.cfg.run_saves.save_preds:
            preds = np.asarray(jnp.argmax(self.clip_logits, axis=1))
            zinfo["preds_path"] = str(self.preds_saver.save_tensor(preds))
        if self.cfg.run_saves.save_logits:
            zinfo["logits_path"] = str(self.preds_saver.save_tensor(np.asarray(self.clip_logits)))
        self.logger.log_info({**zinfo, "type": "zero_shot"})

        evaluate = self._grid_eval_fn()
        alphas = list(self.cfg.cache.alpha)
        weights_cfg = C.to_container(self.cfg.cache_weights_strategy, resolve=True)
        value_cfg = C.to_container(self.cfg.cache_value_strategy, resolve=True)

        for strategy_cfg in self.cfg.cache_strategies.values():
            raw_cfg = C.to_container(strategy_cfg, resolve=True)
            for strategy, strategy_params in C.instantiate_all(self._inject_context(raw_cfg)):
                strategy_params = {k: v for k, v in strategy_params.items()
                                   if not isinstance(v, np.ndarray)}
                cf, co, cache_info = self.build_cache(
                    strategy, self.origin_cache_image_features, self.origin_cache_image_outs)
                self.logger.log_info({**cache_info, "cache_strategy": strategy_params,
                                      "type": "cache_info"})
                self._sweep_weights_values(cf, co, strategy_params, weights_cfg,
                                           value_cfg, alphas, evaluate)

    def _selection_dev(self) -> tp.Optional[tp.Tuple[jax.Array, tp.Optional[jax.Array], int]]:
        """(features, outs, valid_rows) of the current selection gathered
        from the single-device resident cache, rows padded to the kernel's
        max block. Identity selections reuse the resident matrices as-is.
        Memoized per selection (keyed on the `_last_inds` array identity) so
        `_device_values` and `_fused_cache_logits` share one gather."""
        if self._cache_dev is None or self._last_inds is None:
            return None
        outs_dev = getattr(self, "_outs_dev", None)
        cached = getattr(self, "_sel_cache", None)
        if cached is None or cached[0] is not self._last_inds or cached[1] is not outs_dev:
            inds = self._last_inds
            identity = (len(inds) == self._cache_rows
                        and bool((inds == np.arange(self._cache_rows)).all()))
            if identity:
                # identity over a prediction-sorted residence: host values
                # must be permuted by the residence order to stay row-aligned
                self._sel_perm = getattr(self, "_resident_order", None)
                self._sel_pos = None
                sel = (self._cache_dev, outs_dev, self._cache_rows)
            else:
                if getattr(self, "_resident_rank", None) is not None:
                    # gather in SORTED-position order (class-grouped rows);
                    # remember the permutation for host-side value matrices
                    perm = np.argsort(self._resident_rank[inds], kind="stable")
                    pos = self._resident_rank[inds][perm]
                else:
                    perm, pos = None, inds
                self._sel_perm = perm
                self._sel_pos = pos
                pad = (-len(inds)) % 1024
                pos_p = np.concatenate([pos, np.zeros(pad, pos.dtype)]) if pad else pos
                pos_j = jnp.asarray(pos_p)
                outs = (jnp.take(outs_dev, pos_j, axis=0)
                        if outs_dev is not None else None)
                sel = (jnp.take(self._cache_dev, pos_j, axis=0), outs, len(inds))
            self._sel_cache = (inds, outs_dev, sel)
        return self._sel_cache[2]

    def _device_values(self, value_strategy) -> tp.Union[jax.Array, _ShardedValueSpec, None]:
        """Compute the value matrix ON DEVICE from the resident outs, padded
        in lockstep with the feature gather (pad rows carry zero values).
        On the sharded mesh path, return a `_ShardedValueSpec` marker so the
        strategy computes per-shard inside the resident shard_map instead.
        Returns None when the device path doesn't apply (non-indexed
        selection, replaced outs, or an unknown strategy)."""
        if self._last_inds is None or self._outs_replaced:
            return None
        if self._resident_shards is not None:
            if isinstance(value_strategy, cache_methods.HardCacheStrategy):
                return _ShardedValueSpec("hard", 1.0)
            if isinstance(value_strategy, cache_methods.SoftmaxCacheStrategy):
                return _ShardedValueSpec(
                    "softmax", float(value_strategy.clip_scale) * float(value_strategy.scale))
            return None
        sel = self._selection_dev()
        if sel is None or sel[1] is None:
            return None
        _, outs_sel, valid = sel
        if isinstance(value_strategy, cache_methods.HardCacheStrategy):
            if getattr(self, "_resident_preds", None) is not None and _onehot_kernel_ok():
                # Hard values == one-hot of predictions: hand the kernel the
                # labels instead of a value matrix (class-grouped rows by
                # construction of the sorted residence)
                labels = (self._resident_preds if self._sel_pos is None
                          else self._resident_preds[self._sel_pos])
                return _OnehotValues(labels, int(outs_sel.shape[1]))
            return _device_hard_values(outs_sel, jnp.asarray(valid))
        if isinstance(value_strategy, cache_methods.SoftmaxCacheStrategy):
            scale = float(value_strategy.clip_scale) * float(value_strategy.scale)
            return _device_softmax_values(outs_sel, jnp.asarray(valid), jnp.asarray(scale))
        return None

    def _fused_cache_logits(self, cache_features, values, betas):
        if self.mesh is not None:
            if isinstance(values, _ShardedValueSpec):
                # resident mesh path: the only per-combo upload is the row mask
                return self._resident_shards.logits(
                    self._test_norm, self._last_inds, list(betas),
                    kind=values.kind, scale=values.scale)
            from summer_clip_tpu.parallel import sharded_cache_logits

            c = jnp.asarray(cache_features, jnp.float32)
            c = c / jnp.maximum(jnp.linalg.norm(c, axis=-1, keepdims=True), 1e-12)
            return sharded_cache_logits(self._test_norm, c,
                                        jnp.asarray(values, jnp.float32),
                                        jnp.asarray(list(betas), jnp.float32),
                                        self.mesh, axis="model")
        sel = self._selection_dev()
        if sel is not None:
            # device gather of the pre-normalized resident cache; row counts
            # pad to the kernel's max block with zero VALUE rows (exact)
            from summer_clip_tpu.ops.cache_kernels import (
                cache_attention_auto, cache_attention_from_labels)

            cf_dev, outs_sel, valid = sel
            pad = cf_dev.shape[0] - valid
            if isinstance(values, _OnehotValues):
                labels_p = np.full((cf_dev.shape[0],), -1, np.int32)
                labels_p[:valid] = values.labels
                try:
                    # skinny two-dot kernel for class-grouped selections,
                    # label-built dense for scattered ones — either way the
                    # (N, C) value matrix never exists (ops/cache_kernels)
                    return cache_attention_from_labels(
                        self._test_norm, cf_dev, labels_p,
                        jnp.asarray(list(betas), jnp.float32), values.num_classes,
                        interpret=jax.default_backend() != "tpu")
                except Exception as e:  # noqa: BLE001 — dense path is always valid
                    # a Mosaic/VMEM compile failure at an unusual geometry:
                    # dense values
                    import warnings

                    warnings.warn(f"label-driven cache kernels unavailable "
                                  f"({type(e).__name__}: {str(e)[:120]}); "
                                  "dense fallback")
                    values = _device_hard_values(outs_sel, jnp.asarray(valid))
            if isinstance(values, jax.Array):
                # device-computed values (already padded + pad rows zeroed)
                assert values.shape[0] == cf_dev.shape[0], (values.shape, cf_dev.shape)
                values_dev = values
            else:
                v_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
                if getattr(self, "_sel_perm", None) is not None:
                    # resident rows are gathered in sorted order — permute
                    # host-built value matrices to stay row-aligned
                    values = np.asarray(values)[self._sel_perm]
                values_p = (np.concatenate([values, np.zeros((pad, values.shape[1]), np.float32)])
                            if pad else values)
                values_dev = jnp.asarray(values_p, v_dtype)
            return cache_attention_auto(self._test_norm, cf_dev, values_dev,
                                        jnp.asarray(list(betas), jnp.float32))
        return cache_logits_for_betas(self.test_image_features, cache_features,
                                      values, betas)

    def _sweep_weights_values(self, cache_features, cache_outs, strategy_params,
                              weights_cfg, value_cfg, alphas, evaluate,
                              beta_chunk: int = 8):
        weights_list = list(C.instantiate_all(weights_cfg))
        all_tip = all(isinstance(w, cache_methods.TipAdapterWeightsStrategy)
                      for w, _ in weights_list)
        for value_strategy, value_params in C.instantiate_all(value_cfg):
            # device-resident values only feed the fused kernel path; the
            # generic dense fallback multiplies host matrices directly
            values = self._device_values(value_strategy) if all_tip else None
            if values is None:
                values = value_strategy.transform(cache_outs)
            if all_tip:
                betas = [w.beta for w, _ in weights_list]
                for s in range(0, len(betas), beta_chunk):
                    chunk = betas[s:s + beta_chunk]
                    cache_logits = self._fused_cache_logits(cache_features, values, chunk)
                    accs = np.asarray(jnp.stack(evaluate(cache_logits), -1))  # (Bc, A, 2)
                    for bi, beta in enumerate(chunk):
                        wp = weights_list[s + bi][1]
                        self._log_results(strategy_params, wp, value_params, alphas,
                                          accs[bi], cache_logits[bi])
            else:  # generic weights strategy: dense fallback
                for w_strategy, wp in weights_list:
                    weights = w_strategy.transform(self.test_image_features, cache_features)
                    cache_logits = jnp.asarray(weights @ values)[None]
                    accs = np.asarray(jnp.stack(evaluate(cache_logits), -1))
                    self._log_results(strategy_params, wp, value_params, alphas,
                                      accs[0], cache_logits[0])

    def _log_results(self, strategy_params, weights_params, value_params,
                     alphas, accs: np.ndarray, cache_logits_one) -> None:
        for ai, alpha in enumerate(alphas):
            info: dict = {
                "cache_strategy": strategy_params,
                "cache_value_strategy": value_params,
                "cache_weights_strategy": weights_params,
                "alpha": float(alpha),
                "acc1": float(accs[ai, 0]), "acc5": float(accs[ai, 1]),
            }
            if self.cfg.run_saves.save_preds:
                preds = np.asarray(jnp.argmax(self.clip_logits + alpha * cache_logits_one, axis=1))
                info["preds_path"] = str(self.preds_saver.save_tensor(preds))
            self.logger.log_info_wandb({**info, "type": "searcher_result"})


@C.main(config_path="../conf", config_name="image_attention")
def run(cfg) -> None:
    run_trainer(ImageAttention, cfg)


if __name__ == "__main__":
    run()
