"""AutoPrompt trigger search: templatizer + dataset + eval loop + search app.

The full surface of the reference's vendored ucinlp/autoprompt
(``/root/reference/summer_clip/clip_prompt/autoprompt/create_trigger.py:57-134``
and ``autoprompt/utils.py:57`` onward), rebuilt JAX-native on top of the
primitives in :mod:`summer_clip_tpu.sandbox.mlm_trigger`:

- :class:`Templatizer` — formats ``"[T] [T] {sentence} [P]"``-style templates
  over label-map datasets into **fixed-shape** id/mask arrays (the reference
  emits ragged tensors + a pad collator; static shapes mean the jitted
  forward/grad compile once),
- :func:`load_trigger_dataset` — tsv/jsonl example loaders,
- :func:`label_loss` — multi-token label scoring
  (``-logsumexp(log p(label tokens))`` with pad masking, reference
  ``get_loss``),
- :class:`AccuracyFn` — label-map accuracy: gold label log-prob must beat
  every other label's (reference ``AccuracyFn.__call__``),
- :func:`build_token_filter` — -1e32 mask over label/special/capitalized
  tokens (reference ``run_model`` filter construction),
- :class:`TriggerSearch` — the gradient-accumulation + HotFlip candidate
  re-evaluation + dev-eval loop (reference ``run_model``). The backward
  hook (``GradientStorage``) disappears: gradients w.r.t. the trigger
  embeddings are an explicit ``jax.grad`` through the frozen LM, with the
  per-row trigger slots scattered via a cumsum-indexed ``where`` so rows
  with different field lengths share one compiled program.

Works with causal LMs (our GPT-2 family: predictions for position p read
from logits at p-1) and mask-predicting LMs (``causal=False``).
"""

from __future__ import annotations

import csv
import json
import typing as tp
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "TriggerExample", "Templatizer", "load_trigger_dataset", "encode_label",
    "label_loss", "AccuracyFn", "build_token_filter", "TriggerSearch",
]


class TriggerExample(tp.NamedTuple):
    input_ids: np.ndarray     # (T,) int32, padded to the templatizer's max_len
    trigger_mask: np.ndarray  # (T,) bool — trigger slots
    predict_mask: np.ndarray  # (T,) bool — exactly one predict slot
    label_ids: np.ndarray     # (L,) int32, 0-padded (multi-token labels)


def encode_label(encode_fn: tp.Callable[[str], tp.List[int]],
                 label: tp.Union[str, int, tp.Sequence[int]],
                 max_label_len: int = 4) -> np.ndarray:
    """Label -> 0-padded id row (reference ``utils.encode_label``)."""
    if isinstance(label, str):
        ids = list(encode_fn(label))
    elif isinstance(label, int):
        ids = [label]
    else:
        ids = [int(i) for i in label]
    if not ids or len(ids) > max_label_len:
        raise ValueError(f"label {label!r} encodes to {len(ids)} tokens "
                         f"(max {max_label_len})")
    out = np.zeros(max_label_len, np.int32)
    out[:len(ids)] = ids
    return out


class Templatizer:
    """Format a ``[T]``/``[P]``/``{field}`` template into fixed-shape arrays.

    Reference ``utils.TriggerTemplatizer`` adds special ``[T]``/``[P]``
    tokens to the tokenizer and masks them out of the encoded text; here the
    template is split on the markers and each literal/field chunk is encoded
    independently, so no vocabulary surgery is needed and any
    ``encode(text) -> List[int]`` callable works.
    """

    def __init__(self, template: str,
                 encode_fn: tp.Callable[[str], tp.List[int]],
                 mask_id: int, *,
                 label_map: tp.Optional[tp.Mapping[str, tp.Any]] = None,
                 label_field: str = "label",
                 max_len: int = 64, max_label_len: int = 4,
                 pad_id: int = 0):
        self.encode_fn = encode_fn
        self.mask_id = int(mask_id)
        self.label_map = dict(label_map) if label_map is not None else None
        self.label_field = label_field
        self.max_len = max_len
        self.max_label_len = max_label_len
        self.pad_id = int(pad_id)
        # split into literal / [T] / [P] / {field} pieces
        self.pieces: tp.List[tp.Tuple[str, str]] = []  # (kind, payload)
        for tok in template.split():
            if tok == "[T]":
                self.pieces.append(("trigger", ""))
            elif tok == "[P]":
                self.pieces.append(("predict", ""))
            elif tok.startswith("{") and tok.endswith("}"):
                self.pieces.append(("field", tok[1:-1]))
            else:
                self.pieces.append(("literal", tok))
        self.num_trigger_tokens = sum(1 for k, _ in self.pieces if k == "trigger")
        if sum(1 for k, _ in self.pieces if k == "predict") != 1:
            raise ValueError("template must contain exactly one [P] slot")

    def __call__(self, example: tp.Mapping[str, tp.Any]) -> TriggerExample:
        example = dict(example)
        label = example.pop(self.label_field)
        if label is None:
            raise ValueError(f"bad example (no {self.label_field}): {example}")
        if self.label_map is not None:
            label = self.label_map[str(label)]

        ids: tp.List[int] = []
        trig: tp.List[bool] = []
        pred: tp.List[bool] = []

        def push(token_ids: tp.Sequence[int], is_t: bool = False, is_p: bool = False):
            for t in token_ids:
                ids.append(int(t))
                trig.append(is_t)
                pred.append(is_p)

        for kind, payload in self.pieces:
            if kind == "trigger":
                push([self.mask_id], is_t=True)
            elif kind == "predict":
                push([self.mask_id], is_p=True)
            elif kind == "field":
                push(self.encode_fn(str(example[payload])))
            else:
                push(self.encode_fn(payload))
        if len(ids) > self.max_len:
            raise ValueError(f"templated example length {len(ids)} > max_len "
                             f"{self.max_len}")
        pad = self.max_len - len(ids)
        input_ids = np.asarray(ids + [self.pad_id] * pad, np.int32)
        trigger_mask = np.asarray(trig + [False] * pad)
        predict_mask = np.asarray(pred + [False] * pad)
        label_ids = encode_label(self.encode_fn, label, self.max_label_len)
        return TriggerExample(input_ids, trigger_mask, predict_mask, label_ids)


MAX_CONTEXT_LEN = 50


def load_trigger_dataset(path: tp.Union[str, Path], templatizer: Templatizer,
                         limit: tp.Optional[int] = None, use_ctx: bool = False,
                         rng: tp.Optional[np.random.Generator] = None
                         ) -> tp.List[TriggerExample]:
    """tsv (DictReader) / jsonl loaders (reference ``utils.load_trigger_dataset``).
    Examples that fail to templatize (too long, bad label) are skipped.

    ``use_ctx``: relation-extraction mode — each jsonl row carries
    ``evidences`` [{obj_surface, masked_sentence}]; one evidence is sampled,
    truncated to ``MAX_CONTEXT_LEN`` words, its ``[MASK]`` replaced by the
    surface form, and exposed to the template as ``{context}`` (reference
    ``utils.py`` use_ctx branch)."""
    path = Path(path)
    rng = rng or np.random.default_rng(0)
    if path.suffix == ".tsv":
        with open(path) as f:
            rows: tp.Iterable[dict] = list(csv.DictReader(f, delimiter="\t"))
    elif path.suffix == ".jsonl":
        rows = [json.loads(l) for l in open(path) if l.strip()]
    else:
        raise ValueError(f"unsupported dataset format: {path.suffix}")
    out: tp.List[TriggerExample] = []
    for row in rows:
        if use_ctx:
            evidences = row.get("evidences")
            if not evidences:
                continue  # RE sample without context sentences
            ev = evidences[int(rng.integers(0, len(evidences)))]
            words = str(ev["masked_sentence"]).split()
            sent = " ".join(words[:MAX_CONTEXT_LEN])
            row = dict(row, context=sent.replace("[MASK]", str(ev["obj_surface"])))
        try:
            out.append(templatizer(row))
        except (ValueError, KeyError):
            continue
        if limit is not None and len(out) >= limit:
            break
    return out


def collate(examples: tp.Sequence[TriggerExample]) -> tp.Dict[str, np.ndarray]:
    return {
        "input_ids": np.stack([e.input_ids for e in examples]),
        "trigger_mask": np.stack([e.trigger_mask for e in examples]),
        "predict_mask": np.stack([e.predict_mask for e in examples]),
        "label_ids": np.stack([e.label_ids for e in examples]),
    }


def label_loss(predict_logits: jax.Array, label_ids: jax.Array) -> jax.Array:
    """-log p(label) with multi-token labels 0-padded (reference ``get_loss``)."""
    logp = jax.nn.log_softmax(predict_logits.astype(jnp.float32), axis=-1)
    tgt = jnp.take_along_axis(logp, label_ids.astype(jnp.int32), axis=-1)
    tgt = tgt - 1e32 * (label_ids == 0)
    return -jax.scipy.special.logsumexp(tgt, axis=-1)


class AccuracyFn:
    """Correct iff the gold label's log-prob >= every other mapped label's
    (reference ``AccuracyFn``: ``ge_count.le(1)``)."""

    def __init__(self, all_label_ids: tp.Sequence[np.ndarray],
                 labels: tp.Optional[tp.Sequence[str]] = None):
        self.all_label_ids = jnp.stack([jnp.asarray(l) for l in all_label_ids])
        self.labels = list(labels) if labels is not None else None

    @classmethod
    def from_label_map(cls, encode_fn, label_map: tp.Mapping[str, tp.Any],
                       max_label_len: int = 4) -> "AccuracyFn":
        names, rows = [], []
        for name, toks in label_map.items():
            names.append(name)
            rows.append(encode_label(encode_fn, toks, max_label_len))
        return cls(rows, names)

    def all_label_logp(self, predict_logits: jax.Array) -> jax.Array:
        """(B, n_labels) log-prob of every mapped label."""
        return -jax.vmap(
            lambda ids: label_loss(predict_logits,
                                   jnp.broadcast_to(ids, (predict_logits.shape[0],
                                                          ids.shape[0]))),
            out_axes=1,
        )(self.all_label_ids)

    def __call__(self, predict_logits: jax.Array, gold_label_ids: jax.Array) -> jax.Array:
        gold_logp = -label_loss(predict_logits, gold_label_ids)
        all_logp = self.all_label_logp(predict_logits)
        ge_count = jnp.sum(all_logp >= gold_logp[:, None], axis=-1)
        return (ge_count <= 1).astype(jnp.float32)

    def predict(self, predict_logits: jax.Array) -> tp.List[str]:
        idx = np.asarray(jnp.argmax(self.all_label_logp(predict_logits), axis=-1))
        if self.labels is None:
            return [str(i) for i in idx]
        return [self.labels[i] for i in idx]


def build_token_filter(vocab_size: int, *,
                       label_ids: tp.Sequence[np.ndarray] = (),
                       special_ids: tp.Sequence[int] = (),
                       decode_fn: tp.Optional[tp.Callable[[tp.List[int]], str]] = None
                       ) -> np.ndarray:
    """(V,) additive mask: -1e32 on label tokens, special tokens, and
    capitalized word-initial tokens (reference filter construction +
    ``isupper``)."""
    filt = np.zeros(vocab_size, np.float32)
    for row in label_ids:
        for t in np.asarray(row).reshape(-1):
            if t != 0:
                filt[int(t)] = -1e32
    for t in special_ids:
        filt[int(t)] = -1e32
    if decode_fn is not None:
        for idx in range(vocab_size):
            if filt[idx] != 0.0:
                continue
            try:
                word = decode_fn([idx])
            except Exception:
                continue
            stripped = word.lstrip(" ")
            if stripped[:1].isupper():
                filt[idx] = -1e32
    return filt


class TriggerSearch:
    """The ``create_trigger.run_model`` loop, JAX-native.

    ``model_fn(input_embeds, input_ids) -> (B, T, V) logits`` is the frozen
    LM forward (embeddings in, so gradients flow to the trigger slots);
    ``embedding_table`` is its (V, D) input embedding matrix.
    """

    def __init__(self, model_fn: tp.Callable[[jax.Array], jax.Array],
                 embedding_table: jax.Array, num_trigger_tokens: int, *,
                 causal: bool = True,
                 evaluation_fn: tp.Optional[AccuracyFn] = None,
                 token_filter: tp.Optional[np.ndarray] = None,
                 model_params: tp.Any = None):
        # When ``model_params`` is given, ``model_fn`` is called as
        # ``model_fn(model_params, input_embeds)`` and the parameter tree +
        # embedding table ride the jitted programs as ARGUMENTS. A closure-
        # captured jax.Array embeds as a literal MLIR constant — at gpt2
        # scale that is ~500MB of params + a 154MB table per compiled
        # program, a crushing payload for this host's out-of-process
        # compile helper (tools/attr_grid_variants.py). The single-arg
        # ``model_fn(input_embeds)`` contract remains for small closures
        # (the unit tests' fake models).
        self.model_fn = model_fn
        if model_params is None:
            self._apply2 = lambda _p, e: model_fn(e)
        else:
            self._apply2 = model_fn
        self.model_params = model_params
        self.table = jnp.asarray(embedding_table)
        self.L = num_trigger_tokens
        self.causal = causal
        self.evaluation_fn = evaluation_fn
        self.token_filter = None if token_filter is None else jnp.asarray(token_filter)
        self._jit_grad = jax.jit(self._grad_step)
        self._jit_eval = jax.jit(self._eval_step)
        # all candidate trials + the current trigger scored in ONE dispatch
        # (the reference loops candidates re-running the model per candidate,
        # create_trigger.py:374-388 — num_cand+1 forwards per batch)
        self._jit_eval_many = jax.jit(
            jax.vmap(self._eval_step, in_axes=(0, None, None, None)))

    # -- jitted primitives ----------------------------------------------------

    def _splice(self, trigger_embs: jax.Array, batch: tp.Dict[str, jax.Array],
                table: jax.Array) -> jax.Array:
        """Scatter the k-th trigger embedding into each row's k-th trigger slot
        (replaces the reference's ``replace_trigger_tokens`` masked_scatter)."""
        embs = jnp.take(table, batch["input_ids"], axis=0)
        mask = batch["trigger_mask"]
        slot = jnp.clip(jnp.cumsum(mask, axis=1) - 1, 0, self.L - 1)
        return jnp.where(mask[..., None], trigger_embs[slot], embs)

    def _predict_logits(self, trigger_embs: jax.Array,
                        batch: tp.Dict[str, jax.Array], table: jax.Array,
                        params: tp.Any) -> jax.Array:
        embs = self._splice(trigger_embs, batch, table)
        logits = self._apply2(params, embs)
        pmask = batch["predict_mask"]
        pos = jnp.argmax(pmask, axis=1)
        if self.causal:  # causal LM: position p is predicted at p-1
            pos = jnp.maximum(pos - 1, 0)
        return logits[jnp.arange(logits.shape[0]), pos, :]

    def _grad_step(self, trigger_ids: jax.Array, batch: tp.Dict[str, jax.Array],
                   table: jax.Array, params: tp.Any) -> jax.Array:
        def loss_of(trigger_embs):
            pl = self._predict_logits(trigger_embs, batch, table, params)
            return jnp.mean(label_loss(pl, batch["label_ids"]))
        return jax.grad(loss_of)(jnp.take(table, trigger_ids, axis=0))

    def _eval_step(self, trigger_ids: jax.Array, batch: tp.Dict[str, jax.Array],
                   table: jax.Array, params: tp.Any) -> jax.Array:
        pl = self._predict_logits(jnp.take(table, trigger_ids, axis=0), batch,
                                  table, params)
        if self.evaluation_fn is not None:
            return jnp.sum(self.evaluation_fn(pl, batch["label_ids"]))
        return jnp.sum(-label_loss(pl, batch["label_ids"]))

    # -- loop pieces ----------------------------------------------------------

    def _batches(self, examples: tp.Sequence[TriggerExample], bsz: int,
                 rng: tp.Optional[np.random.Generator] = None,
                 steps: tp.Optional[int] = None) -> tp.Iterator[tp.Dict[str, jax.Array]]:
        order = np.arange(len(examples))
        if rng is not None:
            rng.shuffle(order)
        starts = range(0, len(order) - bsz + 1, bsz) if len(order) >= bsz else []
        for i, s in enumerate(starts):
            if steps is not None and i >= steps:
                return
            yield {k: jnp.asarray(v) for k, v in
                   collate([examples[j] for j in order[s:s + bsz]]).items()}

    def evaluate(self, trigger_ids: tp.Sequence[int],
                 examples: tp.Sequence[TriggerExample], bsz: int = 32) -> float:
        """Dev-set metric of a trigger (reference dev-eval loop)."""
        if not examples:
            return 0.0
        tid = jnp.asarray(np.asarray(trigger_ids, np.int32))
        num, den = 0.0, 0
        for batch in self._batches(examples, min(bsz, len(examples))):
            num += float(self._jit_eval(tid, batch, self.table, self.model_params))
            den += batch["input_ids"].shape[0]
        return num / (den + 1e-13)

    def search(self, train: tp.Sequence[TriggerExample],
               dev: tp.Sequence[TriggerExample], *,
               iters: int = 10, bsz: int = 8, accumulation_steps: int = 4,
               num_cand: int = 10, eval_size: int = 32,
               initial_trigger: tp.Optional[tp.Sequence[int]] = None,
               mask_id: int = 0, seed: int = 0,
               log_fn: tp.Optional[tp.Callable[[dict], None]] = None) -> dict:
        """Full search: per iteration, accumulate gradients over train batches,
        HotFlip one random slot, re-score candidates on fresh batches, accept
        if better, track the best trigger by dev metric."""
        if len(train) < bsz:
            raise ValueError(
                f"train set has {len(train)} usable examples < bsz {bsz} "
                "(rows that fail to templatize are skipped — check template/"
                "label_field/max_len)")
        if not dev:
            raise ValueError("dev set is empty after templatizing")
        rng = np.random.default_rng(seed)
        trigger = list(initial_trigger) if initial_trigger is not None else [mask_id] * self.L
        assert len(trigger) == self.L
        best = {"trigger_ids": list(trigger),
                "dev_metric": self.evaluate(trigger, dev, eval_size)}
        history = [dict(best, iter=-1)]

        for it in range(iters):
            tid = jnp.asarray(np.asarray(trigger, np.int32))
            # 1) averaged gradient over accumulation_steps fresh train batches
            avg_grad = None
            for batch in self._batches(train, bsz, rng, accumulation_steps):
                g = self._jit_grad(tid, batch, self.table, self.model_params)
                avg_grad = g if avg_grad is None else avg_grad + g
            if avg_grad is None:
                break
            avg_grad = avg_grad / accumulation_steps

            # 2) HotFlip candidates for one random slot (minimize loss)
            slot = int(rng.integers(0, self.L))
            scores = -(self.table @ avg_grad[slot])
            if self.token_filter is not None:
                scores = scores + self.token_filter
            cands = np.asarray(jax.lax.top_k(scores, num_cand)[1])

            # 3) score current + all candidates on the SAME fresh batches —
            # one vmapped dispatch per batch (row 0 = current trigger)
            trials = np.tile(np.asarray(trigger, np.int32), (num_cand + 1, 1))
            trials[1:, slot] = cands
            trials_j = jnp.asarray(trials)
            cur_score, cand_scores, den = 0.0, np.zeros(num_cand), 0
            for batch in self._batches(train, bsz, rng, accumulation_steps):
                scores = np.asarray(self._jit_eval_many(trials_j, batch, self.table, self.model_params))
                cur_score += float(scores[0])
                cand_scores += scores[1:]
                den += batch["input_ids"].shape[0]

            accepted = bool(den) and bool((cand_scores > cur_score).any())
            rec = {"iter": it, "slot": slot, "accepted": accepted,
                   "train_metric": (max(cand_scores.max(initial=-np.inf), cur_score)
                                    / (den + 1e-13))}
            if accepted:
                trigger[slot] = int(cands[int(cand_scores.argmax())])
                rec["dev_metric"] = self.evaluate(trigger, dev, eval_size)
                rec["trigger_ids"] = list(trigger)
                if rec["dev_metric"] >= best["dev_metric"]:
                    best = {"trigger_ids": list(trigger), "dev_metric": rec["dev_metric"]}
            history.append(rec)
            if log_fn is not None:
                log_fn(rec)
        return {"best": best, "final_trigger_ids": list(trigger), "history": history}


def main(argv: tp.Optional[tp.Sequence[str]] = None) -> dict:
    """Runnable trigger search over a GPT-2 family model + CLIP BPE tokenizer
    (reference launches ``create_trigger`` via argparse; same surface here:
    ``python -m summer_clip_tpu.sandbox.create_trigger --train t.jsonl ...``)."""
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--train", type=Path, required=True)
    p.add_argument("--dev", type=Path, required=True)
    p.add_argument("--template", required=True,
                   help='e.g. "[T] [T] [T] {sentence} [P]"')
    p.add_argument("--label-map", default=None,
                   help="json dict: label value -> label token string(s)")
    p.add_argument("--label-field", default="label")
    p.add_argument("--model", default="gpt2", help="GPT2_CONFIGS name")
    p.add_argument("--checkpoint", default=None,
                   help="msgpack/ckpt params for the model (random init if absent)")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--bsz", type=int, default=8)
    p.add_argument("--accumulation-steps", type=int, default=4)
    p.add_argument("--num-cand", type=int, default=10)
    p.add_argument("--eval-size", type=int, default=32)
    p.add_argument("--max-len", type=int, default=64)
    p.add_argument("--initial-trigger", default=None,
                   help="space-separated initial trigger text (tokenized)")
    p.add_argument("--filter", action="store_true",
                   help="filter label/special/capitalized tokens from candidates")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=Path, default=None, help="results json path")
    args = p.parse_args(argv)

    from summer_clip_tpu.models import gpt2 as gpt2_mod
    from summer_clip_tpu.models.tokenizer import SimpleTokenizer

    tok = SimpleTokenizer()
    cfg = gpt2_mod.GPT2_CONFIGS[args.model]
    model = gpt2_mod.GPT2(cfg)
    if args.checkpoint:
        from summer_clip_tpu.engine.checkpoint import load_pytree

        params = load_pytree(args.checkpoint)
    else:
        params = jax.jit(model.init)(jax.random.PRNGKey(args.seed),
                                     jnp.zeros((1, 4), jnp.int32))["params"]
    table = params["wte"]["embedding"]

    def encode(text: str) -> tp.List[int]:
        return [i % cfg.vocab_size for i in tok.encode(text)]

    label_map = json.loads(args.label_map) if args.label_map else None
    templatizer = Templatizer(args.template, encode, mask_id=0,
                              label_map=label_map,
                              label_field=args.label_field,
                              max_len=args.max_len)
    train = load_trigger_dataset(args.train, templatizer, limit=args.limit)
    dev = load_trigger_dataset(args.dev, templatizer)
    evaluation_fn = (AccuracyFn.from_label_map(encode, label_map)
                     if label_map else None)
    token_filter = None
    if args.filter:
        label_rows = ([encode_label(encode, v) for v in label_map.values()]
                      if label_map else [e.label_ids for e in train])
        token_filter = build_token_filter(
            cfg.vocab_size, label_ids=label_rows,
            special_ids=[0], decode_fn=lambda ids: tok.decode(ids))

    # two-arg contract + model_params=: the gpt2-scale param tree rides the
    # jits as an argument instead of an embedded MLIR constant
    def model_fn(p, inputs_embeds):
        return model.apply({"params": p}, inputs_embeds=inputs_embeds)["logits"]

    searcher = TriggerSearch(model_fn, table, templatizer.num_trigger_tokens,
                             causal=True, evaluation_fn=evaluation_fn,
                             token_filter=token_filter, model_params=params)
    initial = encode(args.initial_trigger) if args.initial_trigger else None
    result = searcher.search(
        train, dev, iters=args.iters, bsz=args.bsz,
        accumulation_steps=args.accumulation_steps, num_cand=args.num_cand,
        eval_size=args.eval_size, initial_trigger=initial, seed=args.seed,
        log_fn=lambda rec: print(json.dumps(rec)))
    result["best"]["trigger_text"] = tok.decode(result["best"]["trigger_ids"])
    print(json.dumps({"type": "best", **result["best"]}))
    if args.out:
        args.out.write_text(json.dumps(result, indent=2, default=float))
    return result


if __name__ == "__main__":
    main()
