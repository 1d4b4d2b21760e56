"""CoOp-family prompt training: soft/discrete prompts through frozen CLIP.

Rebuild of the reference's largest trainer
(``summer_clip/clip_prompt/train_coop.py``): optimize a prompt (CoOp
continuous / VQ straight-through / Gumbel relaxations) against

    loss = w_clip * CE(image-text logits) + w_fluency * LM + w_entropy * H

where gradients flow through the **frozen text tower** into spliced prompt
embeddings and (for fluency) through a ClipGPT adapter LM.

TPU-first execution:

- text features for ALL classes are recomputed *inside the jitted train
  step* each iteration — the (C, 77) tower forward is one XLA program, no
  class-chunked python loop (cf. reference train_coop.py:187-201),
- the whole step (prompt forward -> tower -> logits -> LM -> grads ->
  optax update with accumulation) is a single jit; the Gumbel temperature
  enters as a traced scalar from the host-side scheduler,
- image features are cached (N, D) arrays from the feature store.
"""

from __future__ import annotations

import typing as tp
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
import yaml

from summer_clip_tpu.apps.common import create_clip_session
from summer_clip_tpu.apps.features_io import resolve_features
from summer_clip_tpu.apps.train_adapter import balanced_indices
from summer_clip_tpu.core import config as C
from summer_clip_tpu.engine import checkpoint as ckpt
from summer_clip_tpu.engine.optim import warmup_cosine, with_grad_accum
from summer_clip_tpu.engine.trainer import BaseTrainer, run_trainer
from summer_clip_tpu.methods import prompt_learner as PL
from summer_clip_tpu.methods.zeroshot import compute_accuracy
from summer_clip_tpu.models import gpt2 as gpt2_mod
from summer_clip_tpu.models.tokenizer import get_tokenizer
from summer_clip_tpu.store import FeatureStore


class CoOpTrainer(BaseTrainer):
    # -- setup -----------------------------------------------------------------
    def setup_dataset(self):
        self.dataset = C.instantiate(self.cfg.dataset)
        self.labels = np.asarray(self.dataset.labels(), np.int64)
        rng = np.random.default_rng(int(self.cfg.meta.random_state))
        self.train_indices = balanced_indices(
            self.labels, int(self.cfg.dataset_info.get("k_shots", -1)), rng)
        self.val_dataset = C.instantiate(self.cfg.val_dataset) if self.cfg.get("val_dataset") else None
        self.val_labels = (np.asarray(self.val_dataset.labels(), np.int64)
                           if self.val_dataset else None)

        self.tokenizer = get_tokenizer()
        self.classes = list(self.cfg.prompting.classes or self.dataset.classes)

    def _load_gpt(self):
        """Build the fluency LM (ClipGPT); optional — fluency may be off."""
        gcfg = self.cfg.get("gpt")
        if not gcfg:
            return None, None
        gpt_cfg = gpt2_mod.GPT2_CONFIGS[str(gcfg.get("gpt_config", "test-gpt"))]
        model = gpt2_mod.ClipGPT(
            gpt_cfg, clip_vocab_size=self.tokenizer.vocab_size,
            clip_emb_dim=int(self.clip_embs_table.shape[1]),
            emb_hid_dim=int(gcfg.get("emb_hid_dim", 1024)),
            head_hid_dim=gcfg.get("head_hid_dim", 1024))
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
        ckpt_dir = gcfg.get("checkpoint_dir")
        if ckpt_dir and Path(ckpt_dir).exists():
            loaded = ckpt.load_checkpoint(ckpt_dir, params_target=variables["params"])
            variables = {"params": loaded["params"]}
            self.logger.log_info(f"Loaded ClipGPT from {ckpt_dir}")
        # the CLIP token table is shared: overwrite the LM's clip_emb
        variables["params"]["clip_emb"] = jnp.asarray(self.clip_embs_table)
        return model, variables

    def setup_model(self):
        cfg = self.cfg
        self.session = create_clip_session(cfg.clip.model_name,
                                           cfg.clip.get("checkpoint_path"),
                                           cfg.clip.get("dtype"), remat=cfg.clip.get("remat"), logger=self.logger)
        self.clip_embs_table = self.session.token_embedding_table()  # (V, D_text)
        self.logit_scale = self.session.logit_scale

        # vocab filter -> allowed tokens
        allowed = None
        if cfg.get("vocab_filter"):
            vf = C.instantiate(C.to_container(cfg.vocab_filter, resolve=True),
                               tokenizer=self.tokenizer)
            allowed = vf.get_allowed_tokens()

        # init prompt ids (for models that start from tokens)
        prompt_len = int(cfg.prompt.length)
        init_ids = None
        if cfg.prompt.get("init_prompter"):
            prompter = C.instantiate(C.to_container(cfg.prompt.init_prompter, resolve=True))
            init_ids = prompter.get_ids(self.tokenizer)
            prompt_len = len(init_ids)
        self.prompt_len = prompt_len

        # collator + class tables
        self.collator = PL.LeftPromptCollator(self.tokenizer, prompt_len,
                                              int(cfg.get("clip_seq_len", 77)))
        token_classes = self.collator.tokenize_classes(self.classes)
        self.class_table = self.collator.build_class_table(token_classes + [[]])  # +empty row
        # tokenized class names table (reference train_coop.py:113-118)
        self.logger.exp_logger.log_table(
            "token_classes", columns=["class", "token_ids"],
            rows=[[c, ids] for c, ids in zip(self.classes, token_classes)])

        # fluency LM first: the Gumbelv3a1 proposer rides on it
        self.gpt_model, self.gpt_variables = self._load_gpt()

        # prompt model
        pm_cfg = C.to_container(cfg.prompt_model, resolve=True)
        if str(pm_cfg.get("_target_", "")).endswith("Gumbelv3a1"):
            assert self.gpt_model is not None, "Gumbelv3a1 needs a gpt config"
            from summer_clip_tpu.methods.gpt_heads import AdapterGPT, LoRAGPT

            head_cfg = pm_cfg.pop("head", None) or {"kind": "adapter", "hidden_dim": 256}
            if str(head_cfg.get("kind", "adapter")) == "lora":
                proposer: tp.Any = LoRAGPT(self.gpt_model, self.gpt_variables,
                                           rank=int(head_cfg.get("rank", 8)))
            else:
                proposer = AdapterGPT(self.gpt_model, self.gpt_variables,
                                      hidden_dim=int(head_cfg.get("hidden_dim", 256)))
            pm_cfg.update(proposer=proposer, bos_token_id=self.tokenizer.sot_token)
        self.prompt_model = C.instantiate(
            pm_cfg, clip_embs=self.clip_embs_table, prompt_len=prompt_len,
            allowed_tokens=allowed)
        self.prompt_params = self.prompt_model.init(self.rng.next())
        if init_ids is not None and "prompt_embs" in self.prompt_params:
            self.prompt_params = {
                **self.prompt_params,
                "prompt_embs": jnp.asarray(self.clip_embs_table[np.asarray(init_ids)]),
            }

        # temperature scheduler (Gumbel)
        self.temp_scheduler = (C.instantiate(C.to_container(cfg.temp_scheduler, resolve=True))
                               if cfg.get("temp_scheduler") else None)

        # fluency loss + batcher (LM itself loaded above)
        lm_cfg = C.to_container(cfg.get("lm_loss") or
                                {"_target_": "summer_clip_tpu.methods.prompt_learner.NoLMLoss"},
                                resolve=True)
        if lm_cfg.get("_target_", "").endswith("SuffixLMLoss"):
            lm_cfg.setdefault("prompt_len", prompt_len)
        self.lm_loss = C.instantiate(lm_cfg)
        tb_cfg = C.to_container(cfg.get("text_batcher") or
                                {"_target_": "summer_clip_tpu.methods.prompt_learner.ImageTextBatcher"},
                                resolve=True)
        self.text_batcher = C.instantiate(tb_cfg, num_classes=len(self.classes),
                                          text_classes=self.classes)

        # cached image features
        store = FeatureStore(cfg.store.root) if cfg.get("store") else None
        feats = np.asarray(resolve_features(cfg.data, store), np.float32)
        self.image_features = feats / np.maximum(
            np.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
        if cfg.data.get("val_features_key") or cfg.data.get("val_image_features_path"):
            vf_arr = np.asarray(resolve_array_val(cfg.data, store), np.float32)
            self.val_image_features = vf_arr / np.maximum(
                np.linalg.norm(vf_arr, axis=-1, keepdims=True), 1e-12)
        else:
            self.val_image_features = None

    def setup_optimizer(self):
        tcfg = self.cfg.training
        steps_per_epoch = max(len(self.train_indices) // int(self.cfg.data.batch_size), 1)
        total = int(tcfg.epochs_num) * steps_per_epoch
        schedule = warmup_cosine(float(tcfg.learning_rate),
                                 int(tcfg.get("warmup_steps", 0)), total)
        base = optax.adamw(schedule, weight_decay=float(tcfg.get("weight_decay", 0.0)))
        if tcfg.get("clip_grad_norm"):
            base = optax.chain(optax.clip_by_global_norm(float(tcfg.clip_grad_norm)), base)
        self.tx = with_grad_accum(base, int(tcfg.get("accum_steps", 1)))
        self.opt_state = self.tx.init(self.prompt_params)

    def setup_loss(self):
        cfg = self.cfg
        w_clip = float(cfg.loss.get("clip", 1.0))
        w_fluency = float(cfg.loss.get("fluency", 0.0))
        w_entropy = float(cfg.loss.get("entropy", 0.0))
        model = self.prompt_model
        collator = self.collator
        class_table = self.class_table
        session = self.session
        logit_scale = self.logit_scale
        lm_loss = self.lm_loss
        gpt_model, gpt_variables = self.gpt_model, self.gpt_variables
        n_classes = len(self.classes)
        all_class_idx = jnp.arange(n_classes)
        clip_embs_table = jnp.asarray(self.clip_embs_table)

        def text_features_for(prompt_clip_embs: jax.Array) -> jax.Array:
            """All-class text features with the prompt spliced in (C, D_out)."""
            ids, lens = collator.get_clip_input(class_table, all_class_idx)
            embeds = jnp.take(clip_embs_table, ids, axis=0)
            embeds = PL.splice_prompt_embeds(embeds, prompt_clip_embs)
            feats = session.model.apply(session.variables, embeds, lens,
                                        method=session.model.encode_text_embeds)
            return feats.astype(jnp.float32)

        self._text_features_for = text_features_for

        # table/tower/LM variables ride the jitted loss as ARGUMENTS:
        # closure-captured trees embed as MLIR constants and inflate the
        # remote compile payload by ~850MB (tools/attr_grid_variants.py)
        def loss_fn(prompt_params, batch_feats, batch_labels, lm_class_idx,
                    temperature, embs_table, clip_vars, gpt_vars):
            out = model.apply(prompt_params, temperature=temperature, training=True)
            total = jnp.asarray(0.0, jnp.float32)
            metrics = {}

            if w_clip:
                ids, lens = collator.get_clip_input(class_table, all_class_idx)
                embeds = jnp.take(embs_table, ids, axis=0)
                embeds = PL.splice_prompt_embeds(embeds, out["clip_embs"])
                tf = session.model.apply(clip_vars, embeds, lens,
                                         method=session.model.encode_text_embeds
                                         ).astype(jnp.float32)
                tf = tf / jnp.maximum(jnp.linalg.norm(tf, axis=-1, keepdims=True), 1e-12)
                logits = logit_scale * batch_feats @ tf.T
                clip_ce = optax.softmax_cross_entropy_with_integer_labels(
                    logits, batch_labels).mean()
                acc = jnp.mean((jnp.argmax(logits, 1) == batch_labels).astype(jnp.float32))
                total = total + w_clip * clip_ce
                metrics.update({"loss/clip": clip_ce, "acc/batch": acc * 100.0})

            if w_fluency and gpt_model is not None:
                ids, _, mask = collator.get_gpt_input(class_table, lm_class_idx,
                                                      prompt_ids=out["ids"])
                embeds = jnp.take(embs_table, ids, axis=0)
                embeds = PL.splice_prompt_embeds(embeds, out["gpt_embs"])
                lm_out = gpt_model.apply(gpt_vars, inputs_embeds=embeds)
                fl = lm_loss.transform(ids, mask, lm_out["logits"])
                total = total + w_fluency * fl
                metrics["loss/fluency"] = fl

            if w_entropy:
                probs = out.get("probs")
                if probs is None and "weights/mean" in out:
                    # Gumbel models expose y_soft stats; entropy needs probs —
                    # recompute from logits via the model's API
                    probs = jax.nn.softmax(
                        model.get_prompt_logits(prompt_params) / model.logits_temperature, -1)
                if probs is not None:
                    ent = -jnp.mean(jnp.sum(probs * jnp.log(probs + 1e-9), axis=-1))
                    total = total + w_entropy * ent
                    metrics["loss/entropy"] = ent

            metrics["loss/total"] = total
            return total, metrics

        tx = self.tx

        @jax.jit
        def train_step_j(prompt_params, opt_state, batch_feats, batch_labels,
                         lm_class_idx, temperature, embs_table, clip_vars,
                         gpt_vars):
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                prompt_params, batch_feats, batch_labels, lm_class_idx,
                temperature, embs_table, clip_vars, gpt_vars)
            updates, opt_state = tx.update(grads, opt_state, prompt_params)
            new_params = optax.apply_updates(prompt_params, updates)
            return new_params, opt_state, metrics, grads

        gpt_vars = gpt_variables if (w_fluency and gpt_model is not None) else None
        self._train_step = lambda *a: train_step_j(
            *a, clip_embs_table, session.variables, gpt_vars)

    # -- loops -------------------------------------------------------------------
    def train_epoch(self, epoch_num, epoch_info):
        bs = int(self.cfg.data.batch_size)
        rng = np.random.default_rng((int(self.cfg.meta.random_state), epoch_num))
        order = rng.permutation(self.train_indices)
        n_full = max((len(order) // bs) * bs, 0)
        for s in range(0, n_full, bs):
            idx = order[s:s + bs]
            temp = self.temp_scheduler.get_val() if self.temp_scheduler else 1.0
            if self.temp_scheduler:
                self.temp_scheduler.step()
            lm_idx = self.text_batcher.get_batch_classes(self.labels[idx])
            self.prompt_params, self.opt_state, metrics, grads = self._train_step(
                self.prompt_params, self.opt_state,
                jnp.asarray(self.image_features[idx]), jnp.asarray(self.labels[idx]),
                jnp.asarray(lm_idx), jnp.asarray(temp, jnp.float32))
            epoch_info.update_values({k: float(v) for k, v in metrics.items()})
            for k, v in self.prompt_model.step_info(grads).items():
                epoch_info.update_value(k, v)
        return epoch_info

    def eval_full_accuracy(self, features: np.ndarray, labels: np.ndarray
                           ) -> tp.Tuple[float, float]:
        out = self.prompt_model.apply(self.prompt_params, training=False)
        tf = self._text_features_for(out["clip_embs"])
        tf = tf / jnp.maximum(jnp.linalg.norm(tf, axis=-1, keepdims=True), 1e-12)
        logits = self.logit_scale * jnp.asarray(features) @ tf.T
        return compute_accuracy(logits, labels)

    def compute_metrics(self, epoch_num, epoch_info):
        a1, a5 = self.eval_full_accuracy(self.image_features[self.train_indices],
                                         self.labels[self.train_indices])
        epoch_info.update_values({"train/acc1": a1, "train/acc5": a5})
        if self.val_image_features is not None and self.val_labels is not None:
            v1, v5 = self.eval_full_accuracy(self.val_image_features, self.val_labels)
            epoch_info.update_values({"val/acc1": v1, "val/acc5": v5})

    def decode_prompt(self) -> tp.Tuple[tp.List[int], tp.List[str]]:
        ids = [int(i) for i in self.prompt_model.decode_ids(self.prompt_params)]
        tokens = [self.tokenizer.decoder.get(i, "?") for i in ids]
        return ids, tokens

    def save_epoch_model(self, epoch_num):
        ids, tokens = self.decode_prompt()
        self.logger.log_info({"type": "prompt", "epoch": epoch_num,
                              "prompt_ids": ids, "prompt_tokens": tokens,
                              "prompt_text": self.tokenizer.decode(ids)})
        # prompt-over-epochs table (reference wandb table, train_coop.py:372-377)
        self.logger.exp_logger.log_table(
            "prompts", columns=["epoch", "prompt_text", "prompt_ids"],
            rows=[[epoch_num, self.tokenizer.decode(ids), ids]])
        out_dir = Path(self.cfg.data.get("checkpoints_dir", "checkpoints")) / f"epoch_{epoch_num}"
        ckpt.save_checkpoint(out_dir, params=self.prompt_params,
                             meta={"prompt_ids": ids, "prompt_tokens": tokens,
                                   "epoch": epoch_num,
                                   "prompt_model": C.to_container(self.cfg.prompt_model, resolve=True)})
        (out_dir / "prompt.yaml").write_text(yaml.safe_dump(
            {"ids": ids, "tokens": tokens}, allow_unicode=True))


def resolve_array_val(data_cfg, store):
    from summer_clip_tpu.apps.features_io import resolve_array

    return resolve_array(store, data_cfg.get("val_features_key"),
                         data_cfg.get("val_image_features_path"), "features")


@C.main(config_path="../conf", config_name="train_coop")
def run(cfg) -> None:
    run_trainer(CoOpTrainer, cfg)


if __name__ == "__main__":
    run()
