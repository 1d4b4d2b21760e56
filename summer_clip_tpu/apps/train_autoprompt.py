"""Discrete prompt search: AutoPrompt (HotFlip) and FluentPrompt (SGLD).

Rebuild of ``summer_clip/clip_prompt/train_autoprompt.py`` (+ the
FluentPrompt path of ``fluentprompt_learner.py``): shares the CoOp trainer's
setup (cached features, collator, frozen towers) but optimizes a **discrete**
prompt:

- ``mode=autoprompt``: per step, take the gradient of the loss at the
  current prompt embeddings (one jitted backward through the frozen text
  tower), score HotFlip candidates, re-evaluate them on ``search_steps``
  fresh batches with a jitted loss, greedily accept, and track the
  best-loss prompts in a bounded heap saved as human-readable yaml
  checkpoints,
- ``mode=fluentprompt``: SGLD updates (sqrt(2 lr beta_t) noise, geometric
  beta anneal) on continuous prompt embeddings with projection onto the
  nearest vocabulary embedding after every step.
"""

from __future__ import annotations

import typing as tp
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
import yaml

from summer_clip_tpu.apps.train_coop import CoOpTrainer
from summer_clip_tpu.core import config as C
from summer_clip_tpu.engine.trainer import run_trainer
from summer_clip_tpu.methods import prompt_learner as PL
from summer_clip_tpu.methods.autoprompt import AutoPromptState, TopPrompter, hotflip_step
from summer_clip_tpu.methods.fluentprompt import FluentPromptState, make_langevin_optimizer
from summer_clip_tpu.methods.zeroshot import compute_accuracy


def save_step_prompts(prompt_items: tp.List[tp.Tuple[tp.List[int], float]],
                      tokenizer, epoch_num: int, step: tp.Union[int, str],
                      checkpoints_dir: Path) -> Path:
    """Human-readable yaml heap dump (reference train_autoprompt.py:26-39)."""
    step_dir = checkpoints_dir / f"epoch_{epoch_num}" / f"step_{step}"
    step_dir.mkdir(parents=True, exist_ok=True)
    records = [
        {"loss": float(loss), "prompt_ids": [int(i) for i in ids],
         "prompt_tokens": [tokenizer.decoder.get(int(i), "?") for i in ids]}
        for ids, loss in prompt_items
    ]
    (step_dir / "prompts.yaml").write_text(yaml.safe_dump(records, allow_unicode=True))
    return step_dir


class PromptTrainer(CoOpTrainer):
    """Discrete search scaffold over the CoOp setup."""

    def setup_model(self):
        super().setup_model()
        init_prompter = C.instantiate(C.to_container(self.cfg.prompt.init_prompter, resolve=True))
        self.init_ids = init_prompter.get_ids(self.tokenizer)
        self.prompt_len = len(self.init_ids)
        # rebuild the collator/table at the true prompt length
        self.collator = PL.LeftPromptCollator(self.tokenizer, self.prompt_len,
                                              int(self.cfg.get("clip_seq_len", 77)))
        token_classes = self.collator.tokenize_classes(self.classes)
        self.class_table = self.collator.build_class_table(token_classes + [[]])
        self.mode = str(self.cfg.search.get("mode", "autoprompt"))
        if self.mode == "autoprompt":
            self.state: tp.Any = AutoPromptState(self.clip_embs_table, self.init_ids)
        else:
            self.state = FluentPromptState(self.clip_embs_table, self.init_ids,
                                           dist_p=float(self.cfg.search.get("dist_p", 2.0)))
        self.top_prompts = TopPrompter(int(self.cfg.search.get("top_size", 10)))

    def setup_optimizer(self):
        if self.mode == "fluentprompt":
            scfg = self.cfg.search
            steps_per_epoch = max(len(self.train_indices) // int(self.cfg.data.batch_size), 1)
            total = int(self.cfg.training.epochs_num) * steps_per_epoch
            self.tx = make_langevin_optimizer(
                float(self.cfg.training.learning_rate),
                float(scfg.get("beta_start", 1.0)), float(scfg.get("beta_end", 0.0001)),
                total, seed=int(self.cfg.meta.random_state))
            self.opt_state = self.tx.init(self.state.params)

    def setup_loss(self):
        w_clip = float(self.cfg.loss.get("clip", 1.0))
        w_fluency = float(self.cfg.loss.get("fluency", 0.0))
        collator, class_table = self.collator, self.class_table
        session, logit_scale = self.session, self.logit_scale
        gpt_model, gpt_variables = self.gpt_model, self.gpt_variables
        lm_loss = self.lm_loss
        clip_embs_table = jnp.asarray(self.clip_embs_table)
        all_class_idx = jnp.arange(len(self.classes))

        def text_features_for(prompt_embs):
            ids, lens = collator.get_clip_input(class_table, all_class_idx)
            embeds = jnp.take(clip_embs_table, ids, axis=0)
            embeds = PL.splice_prompt_embeds(embeds, prompt_embs)
            return session.model.apply(session.variables, embeds, lens,
                                       method=session.model.encode_text_embeds).astype(jnp.float32)

        self._text_features_for = text_features_for

        # the CLIP tower variables, GPT variables, and embedding table ride
        # the jitted loss as ARGUMENTS: closure-captured trees embed as MLIR
        # constants (~850MB of compile payload here — tower + LM + table),
        # which crushes this host's out-of-process compile helper
        # (tools/attr_grid_variants.py)
        def full_loss_args(prompt_embs, prompt_ids, feats, labels, lm_class_idx,
                           embs_table, clip_vars, gpt_vars):
            ids, lens = collator.get_clip_input(class_table, all_class_idx)
            embeds = jnp.take(embs_table, ids, axis=0)
            embeds = PL.splice_prompt_embeds(embeds, prompt_embs)
            tf = session.model.apply(clip_vars, embeds, lens,
                                     method=session.model.encode_text_embeds
                                     ).astype(jnp.float32)
            tf = tf / jnp.maximum(jnp.linalg.norm(tf, axis=-1, keepdims=True), 1e-12)
            logits = logit_scale * feats @ tf.T
            loss = w_clip * optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
            if w_fluency and gpt_model is not None:
                ids, _, mask = collator.get_gpt_input(class_table, lm_class_idx,
                                                      prompt_ids=prompt_ids)
                embeds = jnp.take(embs_table, ids, axis=0)
                embeds = PL.splice_prompt_embeds(embeds, prompt_embs)
                lm_out = gpt_model.apply(gpt_vars, inputs_embeds=embeds)
                loss = loss + w_fluency * lm_loss.transform(ids, mask, lm_out["logits"])
            return loss

        _jit = jax.jit(full_loss_args)
        _jit_grad = jax.jit(jax.value_and_grad(full_loss_args))
        gpt_vars = gpt_variables if (w_fluency and gpt_model is not None) else None
        self._loss_jit = lambda *a: _jit(
            *a, clip_embs_table, session.variables, gpt_vars)
        self._loss_grad_jit = lambda *a: _jit_grad(
            *a, clip_embs_table, session.variables, gpt_vars)

    # -- batch plumbing -----------------------------------------------------------
    def _batch(self, idx: np.ndarray):
        lm_idx = self.text_batcher.get_batch_classes(self.labels[idx])
        return (jnp.asarray(self.image_features[idx]),
                jnp.asarray(self.labels[idx]), jnp.asarray(lm_idx))

    def _batches_iter(self, epoch_num: int):
        bs = int(self.cfg.data.batch_size)
        rng = np.random.default_rng((int(self.cfg.meta.random_state), epoch_num))
        order = rng.permutation(self.train_indices)
        for s in range(0, (len(order) // bs) * bs, bs):
            yield order[s:s + bs]

    # -- training -----------------------------------------------------------------
    def train_epoch(self, epoch_num, epoch_info):
        if self.mode == "autoprompt":
            return self._train_epoch_autoprompt(epoch_num, epoch_info)
        return self._train_epoch_fluent(epoch_num, epoch_info)

    def _train_epoch_autoprompt(self, epoch_num, epoch_info):
        scfg = self.cfg.search
        search_steps = int(scfg.get("search_steps", 2))
        num_cands = int(scfg.get("num_cands", 10))
        save_every = int(scfg.get("save_every", 50))
        rng = np.random.default_rng((int(self.cfg.meta.random_state), epoch_num, 7))

        batch_ids = list(self._batches_iter(epoch_num))
        step = 0
        pos = 0
        while pos + search_steps <= len(batch_ids):
            eval_batches = [self._batch(batch_ids[pos + j]) for j in range(search_steps)]
            pos += search_steps
            step += 1

            def grad_fn(prompt_embs, batch):
                feats, labels, lm_idx = batch
                loss, g = self._loss_grad_jit(jnp.asarray(prompt_embs),
                                              jnp.asarray(self.state.prompt_ids),
                                              feats, labels, lm_idx)
                return float(loss), g

            def loss_fn(prompt_embs, prompt_ids, batch):
                feats, labels, lm_idx = batch
                return float(self._loss_jit(jnp.asarray(prompt_embs),
                                            jnp.asarray(prompt_ids), feats, labels, lm_idx))

            info = hotflip_step(self.state, grad_fn, loss_fn, eval_batches,
                                num_cands=num_cands, rng=rng)
            self.top_prompts.push(self.state.prompt_ids,
                                  min(info["curr_loss"], info["best_cand_loss"])
                                  if info["accepted"] else info["curr_loss"])
            epoch_info.update_values({"loss/train": info["curr_loss"],
                                      "search/accepted": float(info["accepted"])})
            if step % save_every == 0:
                save_step_prompts(self.top_prompts.items(), self.tokenizer,
                                  epoch_num, step,
                                  Path(self.cfg.data.get("checkpoints_dir", "checkpoints")))
        return epoch_info

    def _train_epoch_fluent(self, epoch_num, epoch_info):
        for idx in self._batches_iter(epoch_num):
            feats, labels, lm_idx = self._batch(idx)
            loss, grads = self._loss_grad_jit(
                self.state.params["prompt_embs"],
                jnp.asarray(self.state.prompt_ids), feats, labels, lm_idx)
            updates, self.opt_state = self.tx.update(
                {"prompt_embs": grads}, self.opt_state, self.state.params)
            self.state.params = optax.apply_updates(self.state.params, updates)
            self.state.project()
            self.top_prompts.push(self.state.prompt_ids, float(loss))
            epoch_info.update_value("loss/train", float(loss))
        return epoch_info

    # -- eval / save -----------------------------------------------------------------
    def compute_metrics(self, epoch_num, epoch_info):
        embs = jnp.asarray(self.state.prompt_embs if self.mode == "autoprompt"
                           else self.state.params["prompt_embs"])
        tf = self._text_features_for(embs)
        tf = tf / jnp.maximum(jnp.linalg.norm(tf, axis=-1, keepdims=True), 1e-12)
        logits = self.logit_scale * jnp.asarray(self.image_features[self.train_indices]) @ tf.T
        a1, a5 = compute_accuracy(logits, self.labels[self.train_indices])
        epoch_info.update_values({"train/acc1": a1, "train/acc5": a5})

    def save_epoch_model(self, epoch_num):
        step_dir = save_step_prompts(
            self.top_prompts.items(), self.tokenizer, epoch_num, "final",
            Path(self.cfg.data.get("checkpoints_dir", "checkpoints")))
        ids = [int(i) for i in self.state.prompt_ids]
        self.logger.log_info({"type": "prompt", "epoch": epoch_num, "prompt_ids": ids,
                              "prompt_text": self.tokenizer.decode(ids),
                              "checkpoint": str(step_dir)})


@C.main(config_path="../conf", config_name="train_autoprompt")
def run(cfg) -> None:
    run_trainer(PromptTrainer, cfg)


if __name__ == "__main__":
    run()
