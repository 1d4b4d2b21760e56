"""ClipGPT pretraining: the framework's distributed LM workload.

Rebuild of ``summer_clip/clip_prompt/train_gpt.py`` — GPT-2 retrofitted to
CLIP's vocabulary, trained on a tokenized corpus with gradient accumulation,
mid-epoch perplexity evals and trainable-only step checkpoints. Where the
reference scaffolds HF Accelerate but pins it to single-process
(``conf/accelerate/cfg_v1.yaml``: ``distributed_type: 'NO'``), this trainer
is **data-parallel by construction**: params replicate over a
``('data',)`` mesh, batches shard over it, and XLA inserts the gradient
all-reduce — one jitted train step, any number of chips.

Trainable subset via optax masking: adapters only (``ClipGPT`` semantics) or
everything-but-embeddings (``ClipGPTFull``), cf. reference gpt.py:94-127.
"""

from __future__ import annotations

import typing as tp
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from summer_clip_tpu.core import config as C
from summer_clip_tpu.engine import checkpoint as ckpt
from summer_clip_tpu.engine.optim import decay_mask, warmup_cosine, warmup_linear, with_grad_accum
from summer_clip_tpu.engine.trainer import BaseTrainer, run_trainer
from summer_clip_tpu.models import gpt2 as gpt2_mod
from summer_clip_tpu.models.tokenizer import get_tokenizer
from summer_clip_tpu.parallel import create_mesh, replicate, shard_batch
from summer_clip_tpu.store import load_array


def lm_loss_fn(logits: jax.Array, ids: jax.Array) -> jax.Array:
    """Causal-LM shifted CE with labels == inputs (HF collator semantics).

    Written as ``logsumexp - target_logit`` so the normalized (B, T, V) f32
    log-softmax array is never materialized — only a fused f32 reduction and
    a one-element-per-row gather. The train step is HBM-roofline-bound
    (docs/KERNELS.md: 81GB/step at gpt2 b8) and the vocab head is its
    widest tensor, so this is pure traffic savings at identical math.
    """
    lg = logits[:, :-1]
    tgt = jnp.take_along_axis(lg, ids[:, 1:, None], axis=-1)[..., 0].astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(lg.astype(jnp.float32), axis=-1)
    return (lse - tgt).mean()


class ClipGPTTrainer(BaseTrainer):
    def setup_mesh(self):
        n = len(jax.devices())
        bs = int(self.cfg.data_loader.train.batch_size)
        tp = int(self.cfg.training.get("tp", 1))
        pp = int(self.cfg.training.get("pp", 1))
        self.pp_mesh = None
        if pp > 1:
            # GPipe pipeline over a 'stage' axis (parallel/pp.py); v1 is
            # PP-only (no combined DP/TP axes)
            assert tp == 1, "training.pp and training.tp are mutually exclusive"
            assert not bool(self.cfg.training.get("fsdp", False)), \
                "training.pp and training.fsdp are mutually exclusive"
            assert n >= pp, f"pp={pp} needs >= {pp} devices (have {n})"
            from jax.sharding import Mesh as _Mesh

            self.pp_mesh = _Mesh(np.asarray(jax.devices()[:pp]).reshape(pp),
                                 ("stage",))
            self.mesh = None
            self.logger.log_info(f"mesh: pipeline over {pp} stages (GPipe)")
            return
        assert n % max(tp, 1) == 0, f"tp={tp} does not divide {n} devices"
        dp = n // max(tp, 1)
        if n > 1 and bs % dp == 0:
            self.mesh = create_mesh(data=dp, model=tp)
            if tp > 1:
                self.logger.log_info(f"mesh: data={dp} x model={tp} (Megatron TP)")
        else:
            if n > 1:
                self.logger.log_info(
                    f"WARNING: batch size {bs} not divisible by {dp} data shards — "
                    f"running single-device")
            self.mesh = None

    def setup_dataset(self):
        self.tokenizer = get_tokenizer()
        dcfg = self.cfg.dataset
        self.train_tokens = np.asarray(load_array(dcfg.train.tokens_path), np.int32)
        if dcfg.train.get("subpart"):
            rng = np.random.default_rng(int(self.cfg.meta.random_state))
            n = int(float(dcfg.train.subpart) * len(self.train_tokens))
            self.train_tokens = self.train_tokens[rng.permutation(len(self.train_tokens))[:n]]
        self.val_tokens = (np.asarray(load_array(dcfg.val.tokens_path), np.int32)
                           if dcfg.get("val") and dcfg.val.get("tokens_path") else None)
        self.logger.log_info(
            f"train chunks: {len(self.train_tokens)}, "
            f"val chunks: {len(self.val_tokens) if self.val_tokens is not None else 0}")

    def setup_model(self):
        mcfg = self.cfg.clip_gpt
        gpt_cfg = gpt2_mod.GPT2_CONFIGS[str(mcfg.gpt_config)]
        tcfg = self.cfg.training
        dtype = jnp.bfloat16 if bool(tcfg.get("bf16", False)) else jnp.float32
        self.model = gpt2_mod.ClipGPT(
            gpt_cfg, clip_vocab_size=self.tokenizer.vocab_size,
            clip_emb_dim=int(mcfg.clip_emb_dim),
            emb_hid_dim=int(mcfg.adapters.emb_hid_dim),
            head_hid_dim=mcfg.adapters.get("head_hid_dim"),
            dtype=dtype, remat=bool(tcfg.get("remat", False)),
            remat_policy=tcfg.get("remat_policy"))
        # keep the init key: checkpoints store ONLY the trainable subset
        # (reference semantics, gpt.py:104-105), so the frozen leaves must
        # be re-derivable at load time — the key rides the checkpoint meta
        # and load_pretrained_clip_gpt re-inits with it, making reload
        # correct regardless of the eval run's own seed
        self._init_key = self.rng.next()
        self.params = self.model.init(self._init_key,
                                      jnp.zeros((1, 8), jnp.int32))["params"]
        # trainable subset mask
        full = bool(mcfg.get("train_full", False))
        self.trainable_mask_fn = (gpt2_mod.clip_gpt_full_trainable_mask if full
                                  else gpt2_mod.clip_gpt_trainable_mask)
        if mcfg.get("clip_checkpoint_path") and Path(mcfg.clip_checkpoint_path).exists():
            # import the CLIP token table from a converted CLIP checkpoint
            from summer_clip_tpu.models.clip.convert import load_clip as load_clip_ckpt

            _, _, variables = load_clip_ckpt(mcfg.clip_checkpoint_path)
            self.params["clip_emb"] = jnp.asarray(
                variables["params"]["text"]["token_embedding"]["embedding"])
        self.scan_layers = bool(tcfg.get("scan_layers", False))
        if self.pp_mesh is not None:
            from summer_clip_tpu.parallel import (
                check_pp_divisibility, shard_stacked_pp, stack_block_params,
            )

            n_stages = self.pp_mesh.shape["stage"]
            check_pp_divisibility(gpt_cfg.n_layer, n_stages)
            rest, stacked = stack_block_params(self.params, n_stages)
            self.params = {"rest": rest,
                           "stacked": shard_stacked_pp(stacked, self.pp_mesh)}
        elif self.scan_layers:
            # scan-over-layers: one block body in the HLO instead of n_layer
            # unrolled copies — the compile-time lever for gpt2-large on the
            # tunneled chip (docs/KERNELS.md compile-time table). Same math
            # (tests/test_parallel.py::TestScanForward); checkpoint layout
            # shared with PP, so resume/interchange is free.
            from summer_clip_tpu.parallel import stack_block_params

            assert int(tcfg.get("tp", 1)) == 1 and not bool(tcfg.get("fsdp", False)), \
                "training.scan_layers composes with DP only (not tp/fsdp)"
            rest, stacked = stack_block_params(self.params, 1)
            self.params = {"rest": rest, "stacked": stacked}
            if self.mesh is not None:
                self.params = replicate(self.params, self.mesh)
        elif self.mesh is not None:
            fsdp = bool(tcfg.get("fsdp", False))
            if fsdp:
                from summer_clip_tpu.parallel.fsdp import FSDP_MIN_ELEMS

                fsdp_min = int(tcfg.get("fsdp_min_elems", FSDP_MIN_ELEMS))
            if self.mesh.shape["model"] > 1:
                from summer_clip_tpu.parallel import check_tp_divisibility

                check_tp_divisibility(gpt_cfg.n_embd, gpt_cfg.n_head,
                                      self.mesh.shape["model"])
                if fsdp:
                    from summer_clip_tpu.parallel import shard_params_fsdp

                    self.params = shard_params_fsdp(self.params, self.mesh,
                                                    with_tp=True,
                                                    min_elems=fsdp_min)
                    self.logger.log_info("params: FSDP over data x Megatron TP")
                else:
                    from summer_clip_tpu.parallel import shard_params_tp

                    self.params = shard_params_tp(self.params, self.mesh)
            elif fsdp:
                from summer_clip_tpu.parallel import shard_params_fsdp

                self.params = shard_params_fsdp(self.params, self.mesh,
                                                min_elems=fsdp_min)
                self.logger.log_info(
                    f"params: FSDP (ZeRO-3) over {self.mesh.shape['data']} data shards")
            else:
                self.params = replicate(self.params, self.mesh)

    def setup_optimizer(self):
        ocfg = self.cfg.optim
        scfg = self.cfg.scheduler
        accum = int(self.cfg.training.get("grad_accum_steps", 1))
        steps_per_epoch = max(len(self.train_tokens) // int(self.cfg.data_loader.train.batch_size), 1)
        total = int(self.cfg.training.epochs_num) * steps_per_epoch // max(accum, 1)
        warmup = int(total * float(scfg.get("warmup_part", 0.0)))
        sched_fn = warmup_cosine if str(scfg.get("name", "cosine")) == "cosine" else warmup_linear
        schedule = sched_fn(float(ocfg.adamw_kwargs.lr), warmup, total)

        def is_trainable_and_decayed(p):
            flat = jax.tree_util.tree_flatten_with_path(p)[0]
            labels = []
            dmask = decay_mask(p)
            dflat = jax.tree_util.tree_flatten(dmask)[0]
            for (path, _), dec in zip(flat, dflat):
                if not self.trainable_mask_fn(path):
                    labels.append("freeze")
                elif dec:
                    labels.append("decay")
                else:
                    labels.append("no_decay")
            return jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(p), labels)

        kw = dict(ocfg.adamw_kwargs.items())
        kw.pop("lr", None)
        adamw = lambda wd: optax.adamw(schedule, weight_decay=wd, **kw)
        base = optax.multi_transform(
            {"decay": adamw(float(ocfg.weight_decay)),
             "no_decay": adamw(0.0),
             "freeze": optax.set_to_zero()},
            is_trainable_and_decayed)
        clip_norm = float(self.cfg.training.get("clip_grad_norm", 0) or 0)
        if clip_norm:
            base = optax.chain(optax.clip_by_global_norm(clip_norm), base)
        self.tx = with_grad_accum(base, accum)
        # opt state inherits the params' shardings (replicated for DP,
        # Megatron specs for TP): zeros_like preserves placement. Only the
        # fresh scalars optax creates (step counts) need explicit
        # replication — a blanket device_put would clobber the TP layout.
        self.opt_state = self.tx.init(self.params)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            repl = NamedSharding(self.mesh, PartitionSpec())
            self.opt_state = jax.tree_util.tree_map(
                lambda x: x if isinstance(getattr(x, "sharding", None), NamedSharding)
                else jax.device_put(x, repl), self.opt_state)

    def setup_loss(self):
        model, tx = self.model, self.tx

        if self.pp_mesh is not None:
            from summer_clip_tpu.parallel import pp_clip_gpt_forward

            pp_mesh = self.pp_mesh
            n_mb = int(self.cfg.training.get("pp_microbatches", 2))
            remat = bool(self.cfg.training.get("remat", False))

            def logits_of(p, ids):
                return pp_clip_gpt_forward(model, p["rest"], p["stacked"], ids,
                                           pp_mesh, n_microbatches=n_mb,
                                           remat=remat)
        elif getattr(self, "scan_layers", False):
            from summer_clip_tpu.parallel import scan_clip_gpt_forward

            remat = bool(self.cfg.training.get("remat", False))

            def logits_of(p, ids):
                return scan_clip_gpt_forward(model, p["rest"], p["stacked"],
                                             ids, remat=remat)
        else:
            def logits_of(p, ids):
                return model.apply({"params": p}, ids)["logits"]

        @jax.jit
        def train_step(params, opt_state, ids):
            def loss_of(p):
                return lm_loss_fn(logits_of(p, ids), ids)
            loss, grads = jax.value_and_grad(loss_of)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def eval_step(params, ids):
            return lm_loss_fn(logits_of(params, ids), ids)

        self._train_step = train_step
        self._eval_step = eval_step

    def setup(self):
        super().setup()
        self.setup_pretrained()

    def setup_pretrained(self):
        pcfg = self.cfg.get("pretrained") or {}
        model_path = pcfg.get("model") if hasattr(pcfg, "get") else None
        if not (model_path and Path(model_path).exists()):
            return

        def _restore_placement(new, old):
            # checkpoint arrays arrive host-resident; re-apply the live
            # sharding (replicated for DP, Megatron/PP specs otherwise) so
            # the jitted step doesn't see params/opt_state layouts diverge
            sh = getattr(old, "sharding", None)
            return jax.device_put(new, sh) if sh is not None else new

        # opt_target rebuilds the typed optax state (MultiTransform /
        # grad-accum NamedTuples) from msgpack — without it the raw
        # nested-dict restore detonates inside tx.update on resume. In
        # stacked layout (pp/scan_layers) the saved opt_state mirrors the
        # stacked param tree, so resuming it requires the SAME layout config
        # (from_bytes fails loudly on a structure mismatch).
        want_opt = bool(pcfg.get("optimizer"))
        if self._stacked_layout():
            # params checkpoints are in the standard layout: merge, restack
            from summer_clip_tpu.parallel import (
                shard_stacked_pp, stack_block_params,
            )

            std = self._checkpoint_params()
            loaded = ckpt.load_checkpoint(
                Path(model_path), params_target=std,
                opt_target=(self.opt_state if want_opt else None))
            n_stages = (self.pp_mesh.shape["stage"]
                        if self.pp_mesh is not None else 1)
            rest, stacked = stack_block_params(loaded["params"], n_stages)
            if self.pp_mesh is not None:
                stacked = shard_stacked_pp(stacked, self.pp_mesh)
            self.params = {"rest": rest, "stacked": stacked}
            if self.pp_mesh is None and self.mesh is not None:
                self.params = replicate(self.params, self.mesh)
            if "opt_state" in loaded and want_opt:
                self.opt_state = jax.tree_util.tree_map(
                    _restore_placement, loaded["opt_state"], self.opt_state)
            self.logger.log_info(f"Resumed (restacked) from {model_path}")
            return
        loaded = ckpt.load_checkpoint(
            Path(model_path), params_target=self.params,
            opt_target=(self.opt_state if want_opt else None))
        if self.mesh is not None:
            self.params = jax.tree_util.tree_map(
                _restore_placement, loaded["params"], self.params)
        else:
            self.params = loaded["params"]
        if "opt_state" in loaded and want_opt:
            if self.mesh is not None:
                self.opt_state = jax.tree_util.tree_map(
                    _restore_placement, loaded["opt_state"], self.opt_state)
            else:
                self.opt_state = loaded["opt_state"]
        self.logger.log_info(f"Resumed from {model_path}")

    def evaluate(self) -> tp.Tuple[float, float]:
        assert self.val_tokens is not None
        bs = int(self.cfg.data_loader.val.batch_size)
        losses = []
        n_full = max((len(self.val_tokens) // bs) * bs, bs)
        for s in range(0, min(n_full, len(self.val_tokens) - bs + 1) or 1, bs):
            ids = jnp.asarray(self.val_tokens[s:s + bs])
            losses.append(float(self._eval_step(self.params, ids)))
        loss = float(np.mean(losses)) if losses else float("nan")
        return loss, float(np.exp(loss))

    def _checkpoint_params(self):
        """Params in the standard (unstacked) layout for checkpoints —
        PP/scan-trained weights interchange with every other run mode."""
        if self._stacked_layout():
            from summer_clip_tpu.parallel import unstack_block_params

            return unstack_block_params(self.params["rest"], self.params["stacked"])
        return self.params

    def _stacked_layout(self) -> bool:
        return self.pp_mesh is not None or getattr(self, "scan_layers", False)

    def save_step_model(self, epoch_num: int, step: tp.Union[int, str],
                        with_optimizer: bool = False) -> None:
        step_dir = Path(str(self.cfg.training.checkpoints_dir)) / f"epoch_{epoch_num}" / f"step_{step}"
        ckpt.save_checkpoint(
            step_dir, params=self._checkpoint_params(),
            # stacked layouts save opt_state in their stacked tree: resuming
            # it needs the same pp/scan config (params stay interchangeable)
            opt_state=(self.opt_state if with_optimizer else None),
            keep=lambda names: self.trainable_mask_fn(
                tuple(type("K", (), {"key": n})() for n in names)),
            meta={"model_cfg": C.to_container(self.cfg.clip_gpt, resolve=True),
                  "init_key": np.asarray(self._init_key).tolist()})

    def train_epoch(self, epoch_num, epoch_info):
        tcfg = self.cfg.training
        bs = int(self.cfg.data_loader.train.batch_size)
        rng = np.random.default_rng((int(self.cfg.meta.random_state), epoch_num))
        order = rng.permutation(len(self.train_tokens))
        steps_total = len(order) // bs
        evals = max(int(tcfg.get("evals_per_epoch", 1)), 1)
        eval_steps = set(range(steps_total, 0, -max(steps_total // evals, 1))[:evals]) \
            if steps_total else set()

        for step in range(1, steps_total + 1):
            idx = order[(step - 1) * bs: step * bs]
            ids = jnp.asarray(self.train_tokens[idx])
            if self.mesh is not None:
                ids = shard_batch(ids, self.mesh)
            self.params, self.opt_state, loss = self._train_step(
                self.params, self.opt_state, ids)
            epoch_info.update_value("loss/train", float(loss))

            if step % int(tcfg.get("info_steps", 100)) == 0:
                self.logger.log_info_wandb({
                    "samples": step * bs, "steps": step, "loss/train": float(loss)})
            if step in eval_steps:
                if self.val_tokens is not None:
                    eval_loss, perplexity = self.evaluate()
                    self.logger.log_info({"type": "gpt_eval", "loss/eval": eval_loss,
                                          "metrics/perplexity": perplexity, "step": step})
                    epoch_info.update_values({"loss/eval": eval_loss,
                                              "metrics/perplexity": perplexity})
                self.save_step_model(epoch_num, step,
                                     with_optimizer=(step == max(eval_steps)))
            if self.preempted():
                # eviction grace window (engine/preemption.py): checkpoint
                # WITH optimizer state mid-epoch so pretrained.model/
                # optimizer resume restarts at exactly this step
                self.save_step_model(epoch_num, f"{step}_preempt",
                                     with_optimizer=True)
                self.logger.log_info({"type": "preempted", "epoch": epoch_num,
                                      "step": step})
                break
        return epoch_info


@C.main(config_path="../conf", config_name="train_gpt")
def run(cfg) -> None:
    run_trainer(ClipGPTTrainer, cfg)


if __name__ == "__main__":
    run()
