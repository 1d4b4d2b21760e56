"""Continuous-batching GPT serving engine (iteration-level scheduling).

Production-serving layer over the decode path (beyond the reference's
one-shot ``gen_gpt.py``, whose batched sampler — ``generate_device_batched``
— admits a fixed prompt list and drains it): here requests are **admitted
into free batch slots mid-decode** (vLLM-style iteration-level batching,
arXiv:2309.06180 idea, re-designed for XLA's static shapes):

- ONE compiled step program for the whole engine lifetime: every iteration
  advances every slot by exactly one token (static (B, 1) shapes — no
  recompiles, no bucketing),
- per-slot KV rings via the (B,)-indexed cache (``models/gpt2.py``
  per-row ``cache["index"]``): admitting a request resets only that slot's
  index — stale K/V beyond it are causally masked, so slot reuse costs
  zero cache zeroing and zero host->device traffic beyond the token ids,
- prompt PREFILL is token-per-step in the same program (chunk-1 chunked
  prefill): a prefilling slot feeds its next prompt token and ignores the
  sampled output; a decoding slot feeds its previous sample. Mixed
  prefill/decode batches are therefore the norm, not a special case,
- sampling (temperature / top-k) happens on device; the host fetches one
  (B,) token vector per iteration and runs the per-slot state machines.

Determinism: with ``top_k=1`` (greedy) the engine's per-request outputs
are bit-identical to ``gen_gpt.generate_device`` on the same model
(pinned by tests) regardless of what shares the batch.
"""

from __future__ import annotations

import dataclasses
import functools
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ContinuousBatcher", "Request"]


@dataclasses.dataclass
class Request:
    uid: int
    prompt_ids: tp.List[int]
    max_new_tokens: int
    out_ids: tp.List[int] = dataclasses.field(default_factory=list)
    done: bool = False


@dataclasses.dataclass
class _Slot:
    req: tp.Optional[Request] = None
    fed: int = 0          # prompt tokens fed so far
    generated: int = 0    # sampled tokens kept so far

    @property
    def free(self) -> bool:
        return self.req is None


@functools.lru_cache(maxsize=16)
def _engine_step(model, temp: float, top_k: int, greedy: bool):
    """One engine iteration, jitted once per (model, sampling params)."""
    from summer_clip_tpu.apps.gen_gpt import _sample_next

    @jax.jit
    def step(variables, cache, tokens, pos, rng):
        # tokens: (B,) this iteration's input token per slot
        # pos:    (B,) per-slot position of that token (for wpe)
        out = model.apply(variables, tokens[:, None], position_offset=pos[:, None],
                          cache=cache)
        last = out["logits"][:, -1, :]
        if greedy:
            nxt = jnp.argmax(last, axis=-1).astype(jnp.int32)
        else:
            nxt = _sample_next(last / temp, rng, top_k, False).astype(jnp.int32)
        return out["cache"], nxt

    return step


class ContinuousBatcher:
    """Iteration-level batched decode over ``batch_slots`` concurrent slots.

    Usage::

        eng = ContinuousBatcher(model, variables, batch_slots=4, max_len=96)
        eng.submit([ids...], max_new_tokens=20)
        while eng.pending:
            for req in eng.step():
                ... req.out_ids ...
    """

    def __init__(self, model, variables, *, batch_slots: int = 8,
                 max_len: tp.Optional[int] = None, temperature: float = 1.0,
                 top_k: int = 50, greedy: bool = False,
                 eot_id: tp.Optional[int] = None,
                 rng: tp.Optional[jax.Array] = None):
        self.model = model
        self.variables = variables
        self.B = int(batch_slots)
        self.max_len = int(max_len or model.config.n_positions)
        assert self.max_len <= model.config.n_positions
        self.temperature = max(float(temperature), 1e-6)
        self.top_k = int(top_k)
        self.greedy = bool(greedy)
        self.eot_id = eot_id
        self._rng = rng if rng is not None else jax.random.PRNGKey(0)
        self._slots = [_Slot() for _ in range(self.B)]
        self._queue: tp.List[Request] = []
        self._next_uid = 0
        cache = model.apply(variables, method=model.init_cache, batch=self.B,
                            max_len=self.max_len)
        # per-row ring indices (scalar -> (B,) switches the cache layout to
        # independent slots; see GPT2Attention)
        for layer in cache:
            layer["index"] = jnp.zeros((self.B,), jnp.int32)
        self._cache = cache
        self._step = _engine_step(model, self.temperature, self.top_k, self.greedy)
        # host mirrors of per-slot device state
        self._positions = np.zeros(self.B, np.int64)   # next position per slot
        self._last_sample = np.zeros(self.B, np.int64)

    # -- client API -----------------------------------------------------------

    def submit(self, prompt_ids: tp.Sequence[int], max_new_tokens: int = 20) -> Request:
        assert len(prompt_ids) > 0, "empty prompt"
        assert len(prompt_ids) + max_new_tokens <= self.max_len, (
            f"prompt {len(prompt_ids)} + max_new {max_new_tokens} exceeds "
            f"engine max_len {self.max_len}")
        req = Request(self._next_uid, [int(i) for i in prompt_ids],
                      int(max_new_tokens))
        self._next_uid += 1
        self._queue.append(req)
        return req

    @property
    def pending(self) -> bool:
        return bool(self._queue) or any(not s.free for s in self._slots)

    def run(self) -> tp.List[Request]:
        """Drain everything submitted; returns finished requests in
        completion order."""
        done: tp.List[Request] = []
        while self.pending:
            done.extend(self.step())
        return done

    # -- engine iteration -----------------------------------------------------

    def _admit(self) -> None:
        for b, slot in enumerate(self._slots):
            if not slot.free or not self._queue:
                continue
            req = self._queue.pop(0)
            self._slots[b] = _Slot(req=req, fed=0, generated=0)
            self._positions[b] = 0
            # reset ONLY this row's ring index on device (tiny (B,) update)
            for layer in self._cache:
                layer["index"] = layer["index"].at[b].set(0)

    def step(self) -> tp.List[Request]:
        """One iteration: every active slot advances one token. Returns the
        requests that finished this iteration."""
        self._admit()
        active = [b for b, s in enumerate(self._slots) if not s.free]
        if not active:
            return []

        tokens = np.zeros(self.B, np.int32)
        for b, slot in enumerate(self._slots):
            if slot.free:
                continue  # idle rows advance harmlessly (their slots rewind on admit)
            req = slot.req
            if slot.fed < len(req.prompt_ids):
                tokens[b] = req.prompt_ids[slot.fed]          # prefill feed
            else:
                tokens[b] = self._last_sample[b]               # decode feed

        self._rng, sub = jax.random.split(self._rng)
        self._cache, nxt = self._step(
            self.variables, self._cache, jnp.asarray(tokens),
            jnp.asarray(self._positions, jnp.int32), sub)
        nxt = np.asarray(nxt)

        finished: tp.List[Request] = []
        for b, slot in enumerate(self._slots):
            if slot.free:
                self._positions[b] += 1
                continue
            req = slot.req
            self._positions[b] += 1
            if slot.fed < len(req.prompt_ids):
                slot.fed += 1
                if slot.fed < len(req.prompt_ids):
                    continue  # still prefilling; sampled token unused
            # the sample after the last prompt token (or a decode step) counts
            tok = int(nxt[b])
            self._last_sample[b] = tok
            req.out_ids.append(tok)
            slot.generated += 1
            if ((self.eot_id is not None and tok == self.eot_id)
                    or slot.generated >= req.max_new_tokens):
                req.done = True
                finished.append(req)
                self._slots[b] = _Slot()
        return finished
