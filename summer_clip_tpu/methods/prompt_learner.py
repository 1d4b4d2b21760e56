"""Prompt-learning plumbing: collators, init prompters, text batchers, LM losses.

Rebuild of ``summer_clip/clip_prompt/prompt_learner.py`` on static-shape jnp:

- :class:`LeftPromptCollator` builds ``[SOT] <prompt x P> <class tokens> [EOT]``
  id matrices padded to the CLIP context (77) and **splices trainable prompt
  embeddings into positions 1..P** of the embedded batch — the central trick
  that lets gradients flow through the frozen text tower into the prompt.
  Class token rows are precomputed once into a fixed (C, 77) table so every
  jitted train step just gathers rows (no ragged python batching),
- init prompters produce the initial prompt ids (text / token list /
  repeated token / random vocab),
- text batchers choose which class strings feed the LM fluency loss,
- LM losses: full-sequence CE, suffix-only CE (prompt positions excluded),
  and the no-op loss.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "LeftPromptCollator", "splice_prompt_embeds",
    "InitTextPrompter", "InitTokensPrompter", "InitNumTokensPrompter", "InitRandomPrompter",
    "ImageTextBatcher", "OneTextBatcher", "OneStrTextBatcher", "EmptyTextBatcher",
    "FullLMLoss", "SuffixLMLoss", "NoLMLoss",
]


def splice_prompt_embeds(token_embeds: jax.Array, prompt_embeds: jax.Array) -> jax.Array:
    """Replace positions 1..P of (B, T, D) embeddings with (P, D) prompt."""
    p = prompt_embeds.shape[0]
    b = token_embeds.shape[0]
    broadcast = jnp.broadcast_to(prompt_embeds[None], (b, p, prompt_embeds.shape[1]))
    return jax.lax.dynamic_update_slice(
        token_embeds, broadcast.astype(token_embeds.dtype), (0, 1, 0))


class LeftPromptCollator:
    """Builds CLIP / GPT input id tables for prompt learning.

    ``tokenizer`` is the CLIP BPE tokenizer (SOT doubles as BOS, EOT as EOS,
    matching the reference's CLIPTokenizer usage).
    """

    def __init__(self, tokenizer, prompt_len: int, clip_seq_len: int = 77,
                 gpt_seq_len: tp.Optional[int] = None):
        self.tokenizer = tokenizer
        self.prompt_len = prompt_len
        self.clip_seq_len = clip_seq_len
        self.gpt_seq_len = gpt_seq_len or clip_seq_len
        self.bos_id = tokenizer.sot_token
        self.eos_id = tokenizer.eot_token

    def tokenize_classes(self, classnames: tp.Sequence[str]) -> tp.List[tp.List[int]]:
        return [self.tokenizer.encode(str(c).replace("_", " ")) for c in classnames]

    def build_class_table(self, token_classes: tp.Sequence[tp.Sequence[int]]
                          ) -> tp.Tuple[np.ndarray, np.ndarray]:
        """(C, clip_seq_len) id rows ``[SOT, 0*P, class, EOT, pad...]`` + lens."""
        c = len(token_classes)
        p = self.prompt_len
        ids = np.zeros((c, self.clip_seq_len), np.int32)
        lens = np.zeros((c,), np.int32)
        for row, toks in enumerate(token_classes):
            toks = list(toks)
            total = 1 + p + len(toks) + 1
            if total > self.clip_seq_len:
                toks = toks[: self.clip_seq_len - p - 2]
                total = self.clip_seq_len
            ids[row, 0] = self.bos_id
            ids[row, 1 + p: 1 + p + len(toks)] = toks
            ids[row, 1 + p + len(toks)] = self.eos_id
            lens[row] = total
        return ids, lens

    def get_clip_input(self, class_table: tp.Tuple[np.ndarray, np.ndarray],
                       class_idx: tp.Union[np.ndarray, jax.Array]
                       ) -> tp.Tuple[jax.Array, jax.Array]:
        ids, lens = class_table
        idx = jnp.asarray(class_idx)
        return jnp.take(jnp.asarray(ids), idx, axis=0), jnp.take(jnp.asarray(lens), idx, axis=0)

    def get_gpt_input(self, class_table: tp.Tuple[np.ndarray, np.ndarray],
                      class_idx: tp.Union[np.ndarray, jax.Array],
                      prompt_ids: tp.Optional[jax.Array] = None
                      ) -> tp.Tuple[jax.Array, jax.Array, jax.Array]:
        """(ids (B, T), lens, loss_mask) for the LM pass: no trailing EOT.

        ``prompt_ids`` (P,), when given, fills positions 1..P so FullLMLoss
        sees the discrete prompt; loss positions beyond ``len-1`` are masked.
        """
        ids, lens = self.get_clip_input(class_table, class_idx)
        # drop EOT: zero the position at len-1, shorten len by 1
        t = ids.shape[1]
        pos = jnp.arange(t)[None, :]
        ids = jnp.where(pos == (lens - 1)[:, None], 0, ids)
        lens = lens - 1
        if prompt_ids is not None:
            b = ids.shape[0]
            pr = jnp.broadcast_to(jnp.asarray(prompt_ids, ids.dtype)[None],
                                  (b, self.prompt_len))
            ids = jax.lax.dynamic_update_slice(ids, pr, (0, 1))
        mask = (pos < lens[:, None]).astype(jnp.float32)
        return ids, lens, mask


# ---------------------------------------------------------------------------
# Init prompters (reference prompt_learner.py:40-83)
# ---------------------------------------------------------------------------

class InitTextPrompter:
    def __init__(self, text: str, assert_length: tp.Optional[int] = None):
        self.text = text
        self.assert_length = assert_length

    def get_ids(self, tokenizer) -> tp.List[int]:
        ids = tokenizer.encode(self.text)
        if self.assert_length is not None:
            assert len(ids) == self.assert_length, "Lens do not match"
        return ids


class InitTokensPrompter:
    def __init__(self, tokens: tp.List[str]):
        self.tokens = tokens

    def get_ids(self, tokenizer) -> tp.List[int]:
        out: tp.List[int] = []
        for tok in self.tokens:
            out.extend(tokenizer.encode(tok))
        return out


class InitNumTokensPrompter:
    def __init__(self, token: str, length: int):
        self.token = token
        self.length = length

    def get_ids(self, tokenizer) -> tp.List[int]:
        # repeat the token's (first) id `length` times; the reference asserts
        # single-token inputs here
        tok_ids = tokenizer.encode(self.token)
        assert tok_ids, f"token {self.token!r} tokenizes to nothing"
        return [tok_ids[0]] * self.length


class InitRandomPrompter:
    def __init__(self, length: int, seed: tp.Optional[int] = None):
        self.length = length
        self.rng = np.random.default_rng(seed)

    def get_ids(self, tokenizer) -> tp.List[int]:
        special = {tokenizer.sot_token, tokenizer.eot_token, 0}
        vocab = np.setdiff1d(np.arange(tokenizer.vocab_size), np.asarray(sorted(special)))
        return [int(i) for i in self.rng.choice(vocab, size=self.length, replace=True)]


# ---------------------------------------------------------------------------
# Text batchers (reference prompt_learner.py:126-157)
# ---------------------------------------------------------------------------

class ImageTextBatcher:
    """LM loss sees each batch image's class string."""

    def __init__(self, num_classes: int, class_ind: tp.Optional[int] = None,
                 text_classes: tp.Optional[tp.Sequence[str]] = None):
        del class_ind, text_classes
        self.num_classes = num_classes

    def get_batch_classes(self, batch_labels: np.ndarray) -> np.ndarray:
        return np.asarray(batch_labels)


class OneTextBatcher:
    """LM loss sees one fixed class per step."""

    def __init__(self, num_classes: int, class_ind: int,
                 text_classes: tp.Optional[tp.Sequence[str]] = None):
        del text_classes
        self.class_ind = class_ind

    def get_batch_classes(self, batch_labels: np.ndarray) -> np.ndarray:
        return np.asarray([self.class_ind])


class OneStrTextBatcher(OneTextBatcher):
    def __init__(self, num_classes: int, class_str: str,
                 text_classes: tp.Sequence[str] = ()):
        super().__init__(num_classes, list(text_classes).index(class_str))


class EmptyTextBatcher:
    """LM loss sees the bare prompt (empty class suffix). Uses a sentinel
    row that the collator's class table must include at index -1 (all-pad)."""

    def __init__(self, num_classes: int, class_ind: tp.Optional[int] = None,
                 text_classes: tp.Optional[tp.Sequence[str]] = None):
        self.empty_index = num_classes  # by convention, appended empty row

    def get_batch_classes(self, batch_labels: np.ndarray) -> np.ndarray:
        return np.asarray([self.empty_index])


# ---------------------------------------------------------------------------
# LM losses (reference prompt_learner.py:160-184)
# ---------------------------------------------------------------------------

def _shifted_ce(logits: jax.Array, labels: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean next-token CE: logits[:, t] predicts labels[:, t+1]."""
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = labels[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    m = mask[:, 1:]
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


class FullLMLoss:
    def transform(self, ids: jax.Array, mask: jax.Array, logits: jax.Array) -> jax.Array:
        return _shifted_ce(logits, ids, mask)


class SuffixLMLoss:
    """CE only on the class-suffix tokens (prompt positions excluded)."""

    def __init__(self, prompt_len: int, has_bos: bool = True):
        self.prefix_len = prompt_len + (1 if has_bos else 0)

    def transform(self, ids: jax.Array, mask: jax.Array, logits: jax.Array) -> jax.Array:
        t = ids.shape[1]
        pos = jnp.arange(t)[None, :]
        suffix_mask = mask * (pos >= self.prefix_len)
        return _shifted_ce(logits, ids, suffix_mask)


class NoLMLoss:
    def transform(self, ids, mask, logits) -> jax.Array:
        return jnp.asarray(0.0, jnp.float32)
