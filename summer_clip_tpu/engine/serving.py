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
- prompt PREFILL is **chunked**: an admitted prompt runs through one
  batched (B, L_bucket) forward (left-padded, per-row positions, a
  persistent per-slot key-pad masking the pad slots) — one dispatch per
  admission instead of one per prompt token; decoding batch-mates stall
  for that single call and their rings are rolled back on the host (the
  junk K/V they wrote is never causally attendable). ``prefill_chunk=False``
  falls back to token-per-step prefill in the shared step program,
- sampling (temperature / top-k) happens on device; the host fetches one
  (B,) token vector per iteration and runs the per-slot state machines.

Determinism: with ``top_k=1`` or ``greedy=True`` the engine's per-request
outputs are bit-identical to ``gen_gpt.generate_device`` on the same model
(pinned by tests) regardless of what shares the batch or how prefill is
chunked.
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


def _pick(last, temp, top_k, greedy, rng, top_p=1.0):
    from summer_clip_tpu.apps.gen_gpt import _sample_next

    if greedy:
        return jnp.argmax(last, axis=-1).astype(jnp.int32)
    return _sample_next(last / temp, rng, top_k, False, top_p).astype(jnp.int32)


def _last_logits(out, head_table):
    """Last-position logits: in-model when ``head_table`` is None; off the
    hoisted int8 table otherwise (the in-model logits are then dead code —
    DCE'd — so a quantized tree never recomputes/dequantizes the 49k-row
    ClipGPT head per dispatch; decode-shaped reads stream int8 through
    ops/gemv)."""
    if head_table is None:
        return out["logits"][:, -1, :]
    from summer_clip_tpu.ops.gemv import qdot

    return qdot(out["hidden"][:, -1, :], head_table, jnp.float32)


@functools.lru_cache(maxsize=16)
def _engine_step(model, temp: float, top_k: int, greedy: bool,
                 top_p: float = 1.0):
    """One engine iteration (every slot advances one token), jitted once.

    int8 trees are consumed AS STORED: ``models/gpt2.QDense`` streams the
    int8 weights per dispatch (B slots <= 8 rows rides the Pallas GEMV),
    and the lm head reads the engine's pre-quantized ``head_table``."""

    @jax.jit
    def step(variables, cache, tokens, pos, key_pad, rng, head_table=None):
        # tokens: (B,) this iteration's input token per slot
        # pos:    (B,) per-slot position of that token (for wpe)
        out = model.apply(variables, tokens[:, None],
                          position_offset=pos[:, None], cache=cache, key_pad=key_pad)
        return out["cache"], _pick(_last_logits(out, head_table), temp, top_k,
                                   greedy, rng, top_p)

    return step


@functools.lru_cache(maxsize=32)
def _engine_burst(model, temp: float, top_k: int, greedy: bool, n: int,
                  top_p: float = 1.0):
    """``n`` decode iterations in ONE dispatch (admission-free window).

    Exactly ``n`` back-to-back :func:`_engine_step` bodies as a
    ``lax.scan``: the host pre-splits the same ``n`` rng subkeys it would
    have split per step, ``active`` rows feed their previous sample while
    rows free at burst start keep feeding token 0 at a frozen position
    (what per-step dispatch does to free rows), and the KV index
    advances inside the cache. Emitted tokens for every row are bitwise
    what ``n`` sequential steps emit; a row that hits EOT mid-burst keeps
    decoding junk that the host discards and the ring rollback on its
    slot's next admission makes causally invisible (the same argument as
    chunk-prefill junk).

    ``rem`` (B,) int32 is each row's remaining token budget at burst
    start: DEVICE-SIDE RETIREMENT (VERDICT r3 #3). A row is live while
    ``i < rem[b]``; after that its feed token and position freeze and its
    emitted tokens are junk the host discards — which lets a chain run to
    the MAX remaining budget across rows instead of stopping at the
    earliest retirement. While live, emitted ids are bitwise identical to
    per-step dispatch (the budget mask only flips AFTER the budget is
    spent, which is exactly when per-step dispatch would have retired the
    row on the host)."""

    @jax.jit
    def burst(variables, cache, feed0, pos0, active, rem, key_pad, subs,
              head_table=None):
        def body(carry, sub_i):
            feed, cache = carry
            sub, i = sub_i
            live = active & (i < rem)
            pos = jnp.where(active, pos0 + jnp.minimum(i, rem), pos0)
            out = model.apply(variables, feed[:, None],
                              position_offset=pos[:, None], cache=cache,
                              key_pad=key_pad)
            nxt = _pick(_last_logits(out, head_table), temp, top_k, greedy,
                        sub, top_p)
            feed_next = jnp.where(live, nxt, feed).astype(jnp.int32)
            return (feed_next, out["cache"]), nxt

        (feed, cache), toks = jax.lax.scan(
            body, (feed0, cache), (subs, jnp.arange(n, dtype=jnp.int32)))
        # feed is returned ON DEVICE so a chained burst can start from it
        # without the host ever fetching a token (see _dispatch_burst)
        return cache, toks, feed  # toks: (n, B)

    return burst


@functools.lru_cache(maxsize=8)
def _split_program(count: int):
    """``count`` SEQUENTIAL rng splits as one jitted scan. Bit-identical to
    ``count`` host-side ``jax.random.split`` calls (the equality contract
    between burst and per-step dispatch rides on the split order), but ONE
    device dispatch instead of ``count`` — the wave window's host cost was
    dominated by these tiny dispatches (VERDICT r4 #2)."""

    @jax.jit
    def split(rng):
        def body(carry, _):
            rng, s = jax.random.split(carry)
            return rng, s

        rng, subs = jax.lax.scan(body, rng, None, length=count)
        return rng, subs

    return split


@functools.lru_cache(maxsize=32)
def _mega_prefill_step(model, temp: float, top_k: int, greedy: bool,
                       length: int, top_p: float = 1.0):
    """Batched admission prefill for MEGAKERNEL serving: the standard wide
    forward runs into a FRESH short (length) cache inside the program, and
    only the admitted rows' K/V quantize + merge into the engine's mega KV
    rings (masked set — non-admitted rows' junk never touches the rings,
    so this prefill needs neither ring rollback nor the clamp guard)."""
    from summer_clip_tpu.ops.decode_block import _quant_rows

    @jax.jit
    def prefill(variables, mega_kv, tokens, offs, key_pad, admit_mask, rng,
                head_table):
        B = tokens.shape[0]
        assert tokens.shape[1] == length, (tokens.shape, length)
        cache = model.apply(variables, method=model.init_cache, batch=B,
                            max_len=length)
        for layer in cache:
            layer["index"] = jnp.zeros((B,), jnp.int32)
        out = model.apply(variables, tokens, position_offset=offs[:, None],
                          cache=cache, key_pad=key_pad)
        knew = jnp.stack([c["k"] for c in out["cache"]]).astype(jnp.float32)
        vnew = jnp.stack([c["v"] for c in out["cache"]]).astype(jnp.float32)
        kq, ks = _quant_rows(knew, mega_kv["k"].dtype)     # (L, B, lb, D)
        vq, vs = _quant_rows(vnew, mega_kv["v"].dtype)
        m = admit_mask[None, :, None, None]
        new_kv = {
            "k": mega_kv["k"].at[:, :, :length].set(
                jnp.where(m, kq, mega_kv["k"][:, :, :length])),
            "v": mega_kv["v"].at[:, :, :length].set(
                jnp.where(m, vq, mega_kv["v"][:, :, :length])),
            "ks": mega_kv["ks"].at[:, :, :length].set(
                jnp.where(m, ks, mega_kv["ks"][:, :, :length])),
            "vs": mega_kv["vs"].at[:, :, :length].set(
                jnp.where(m, vs, mega_kv["vs"][:, :, :length])),
        }
        return new_kv, _pick(_last_logits(out, head_table), temp, top_k,
                             greedy, rng, top_p)

    return prefill


@functools.lru_cache(maxsize=32)
def _mega_burst(model, temp: float, top_k: int, greedy: bool, n: int,
                top_p: float = 1.0):
    """``n`` MEGAKERNEL decode iterations in ONE dispatch: each iteration
    runs the whole block stack for all B slots in one pallas launch
    (``ops/decode_block`` batched streams — the int8 weight read amortizes
    across slots). Scheduling semantics are exactly :func:`_engine_burst`'s
    (live masks, frozen feeds/positions, device-side retirement via
    ``rem``); the KV state is the engine's per-stream mega rings and the
    ring indices advance in the scan carry so chains stay host-sync-free."""
    from summer_clip_tpu.ops import decode_block as DB
    from summer_clip_tpu.ops.gemv import gather_rows, qdot

    from summer_clip_tpu.models import gpt2 as gpt2_mod

    cfg = model.config

    @jax.jit
    def burst(variables, packed, kv, feed0, pos0, idx0, active, rem,
              key_pad, subs, head_table):
        params = variables["params"]
        core = params["core"]
        lnf = core["ln_f"]
        t = kv["k"].shape[2]

        def embed_x(toks, pos):       # (B,), (B,) -> (B, D) f32
            if isinstance(model, gpt2_mod.ClipGPT):
                e = model.apply(variables, toks[:, None], method=model.embed)
                x = model.apply(variables, e, method=model.adapt_embeds)[:, 0]
            else:
                x = gather_rows(params["wte"]["embedding"], toks)
            pos_c = jnp.clip(pos, 0, cfg.n_positions - 1)
            return (x.astype(jnp.float32)
                    + gather_rows(core["wpe"], pos_c).astype(jnp.float32))

        def body(carry, sub_i):
            feed, kv, idx = carry
            sub, i = sub_i
            live = active & (i < rem)
            pos = jnp.where(active, pos0 + jnp.minimum(i, rem), pos0)
            x = embed_x(feed, pos)
            y, kq, vq, ksn, vsn = DB.decode_block(
                x, packed, kv, idx, nh=cfg.n_head, pad=key_pad)
            kv = DB.mega_update_kv(kv, kq, vq, ksn, vsn, idx)
            h = DB._ln_rows(y, lnf["scale"][None], lnf["bias"][None])
            nxt = _pick(qdot(h, head_table, jnp.float32), temp, top_k,
                        greedy, sub, top_p)
            feed_next = jnp.where(live, nxt, feed).astype(jnp.int32)
            # every slot's ring advances (junk writes clamp; admission
            # resets the ring) — the standard engine's exact discipline
            idx = jnp.minimum(idx + 1, t)
            return (feed_next, kv, idx), nxt

        (feed, kv, idx), toks = jax.lax.scan(
            body, (feed0, kv, idx0), (subs, jnp.arange(n, dtype=jnp.int32)))
        return kv, toks, feed, idx  # all ON DEVICE for chaining

    return burst


@functools.lru_cache(maxsize=32)
def _prefill_step(model, temp: float, top_k: int, greedy: bool, length: int,
                  top_p: float = 1.0):
    """Bucketed chunk prefill: (B, length) tokens in one forward. Only the
    admitted slot's row is meaningful; batch-mates carry junk that is
    rolled back (ring index) / never attendable (causal mask)."""

    @jax.jit
    def prefill(variables, cache, tokens, offs, key_pad, rng, head_table=None):
        assert tokens.shape[1] == length, (tokens.shape, length)
        out = model.apply(variables, tokens,
                          position_offset=offs[:, None], cache=cache, key_pad=key_pad)
        return out["cache"], _pick(_last_logits(out, head_table), temp, top_k,
                                   greedy, rng, top_p)

    return prefill


class ContinuousBatcher:
    """Iteration-level batched decode over ``batch_slots`` concurrent slots.

    Usage::

        eng = ContinuousBatcher(model, variables, batch_slots=4, max_len=96)
        eng.submit([ids...], max_new_tokens=20)
        while eng.pending:
            for req in eng.step():
                ... req.out_ids ...
    """

    PREFILL_BUCKET = 16

    def __init__(self, model, variables, *, batch_slots: int = 8,
                 max_len: tp.Optional[int] = None, temperature: float = 1.0,
                 top_k: int = 50, greedy: bool = False, top_p: float = 1.0,
                 eot_id: tp.Optional[int] = None,
                 rng: tp.Optional[jax.Array] = None,
                 prefill_chunk: bool = True,
                 quant_int8: bool = False,
                 burst: int = 8,
                 pipeline: int = 4,
                 wave: bool = True,
                 megakernel: bool = False,
                 mesh=None):
        self.model = model
        self._head_table = None
        if quant_int8:
            from summer_clip_tpu.engine.quant import quant_head_table, quantize_tree

            variables = dict(variables, params=quantize_tree(variables["params"]))
            # hoisted once per engine: the per-dispatch programs read logits
            # off this int8 table instead of recomputing/dequantizing the
            # model head every iteration (see _last_logits)
            self._head_table = quant_head_table(model, variables)
        self.quant_int8 = bool(quant_int8)
        self.variables = variables
        self.B = int(batch_slots)
        self.max_len = int(max_len or model.config.n_positions)
        assert self.max_len <= model.config.n_positions
        self.temperature = max(float(temperature), 1e-6)
        self.top_k = int(top_k)
        self.top_p = float(top_p)
        self.greedy = bool(greedy)
        self.eot_id = eot_id
        self.prefill_chunk = bool(prefill_chunk)
        # admission-free windows dispatch up to `burst` iterations as one
        # scan (the per-iteration host round-trip is the engine's measured
        # cost vs the static sampler — docs/SERVING.md); 1 = per-step
        self.burst = max(int(burst), 1)
        # up to `pipeline` bursts chain back-to-back per host visit: the
        # feed token stays ON DEVICE between bursts (async dispatch — the
        # host enqueues all of them, then fetches the whole token block
        # once), so the effective scheduling granularity is burst*pipeline
        # iterations at one RTT + one compiled program of length `burst`
        self.pipeline = max(int(pipeline), 1)
        # wave dispatch (VERDICT r3 #3): per host visit, ONE batched prefill
        # admits every queued request into the free slots, chained bursts
        # carry per-row budgets (device-side retirement — the chain runs to
        # the MAX remaining budget, not the min), and prefill first-tokens +
        # all chain tokens come back in ONE sync
        self.wave = bool(wave)
        self._rng = rng if rng is not None else jax.random.PRNGKey(0)
        self._slots = [_Slot() for _ in range(self.B)]
        self._queue: tp.List[Request] = []
        self._next_uid = 0
        # megakernel serving (round 5): each wave-chain iteration runs the
        # whole block stack for all slots in ONE pallas launch — the int8
        # weight read amortizes over the batch (ops/decode_block batched
        # streams). State: once-packed weight slabs + per-slot mega KV
        # rings; prefill stays the standard wide forward (masked merge).
        self.megakernel = bool(megakernel)
        cache = None
        if self.megakernel:
            from summer_clip_tpu.ops.decode_block import (
                init_mega_kv, mega_legal, pack_core_params)

            mcfg = model.config
            assert self.quant_int8, (
                "megakernel serving rides the stored-int8 tree "
                "(quant_int8=True); bf16 packing would demote numerics")
            assert self.wave and self.prefill_chunk and self.burst > 1, (
                "megakernel serving is a wave-dispatch mode "
                "(wave=True, prefill_chunk=True, burst>1)")
            assert self.B <= 8, (
                f"megakernel streams ride one (8, 128) tile; "
                f"batch_slots={self.B}")
            assert mesh is None or mesh.shape.get("model", 1) == 1, (
                "TP serving and the megakernel do not compose")
            assert mega_legal(mcfg.n_embd, 4 * mcfg.n_embd, mcfg.n_head), (
                f"megakernel does not support {mcfg.name} geometry")
            pack = jax.jit(lambda c: pack_core_params(
                c, mcfg.n_layer, store="int8"))
            self._packed = pack(self.variables["params"]["core"])
            self._mega_kv = init_mega_kv(mcfg.n_layer, mcfg.n_embd,
                                         self.max_len, jnp.int8,
                                         batch=self.B)
        else:
            cache = model.apply(variables, method=model.init_cache,
                                batch=self.B, max_len=self.max_len)
            for layer in cache:
                layer["index"] = jnp.zeros((self.B,), jnp.int32)
        if mesh is not None and mesh.shape.get("model", 1) > 1:
            if quant_int8:
                # int8 x TP serving (VERDICT r4 #3): the engine's programs
                # call self.model.apply — swapping in the shard_map int8
                # decoder routes every chip's streamed GEMV to its own
                # Megatron shard with psums after the row-parallel matmuls
                from summer_clip_tpu.parallel.tp_int8 import (
                    shard_decode_tp_int8, tp_int8_decoder)

                self.variables, cache = shard_decode_tp_int8(
                    self.variables, cache, mesh)
                self.model = tp_int8_decoder(model, mesh)
            else:
                # Megatron-TP serving: same committed placements as the
                # one-shot decode paths (parallel/tp.py:shard_decode_tp) —
                # the engine's step/prefill programs are placement-agnostic,
                # GSPMD compiles them sharded; the host-side slot state
                # machine is unchanged
                from summer_clip_tpu.parallel import shard_decode_tp

                self.variables, cache = shard_decode_tp(self.variables,
                                                        cache, mesh)
        self._cache = cache
        self._step = _engine_step(self.model, self.temperature, self.top_k, self.greedy,
                                  self.top_p)
        # host mirrors of per-slot device state (the ring index is
        # authoritative HERE and re-stamped into the cache before every
        # dispatch — that is what makes prefill rollback a host-side no-op)
        self._ring = np.zeros(self.B, np.int64)
        self._key_pad = np.zeros(self.B, np.int64)
        self._positions = np.zeros(self.B, np.int64)   # next position per slot
        self._last_sample = np.zeros(self.B, np.int64)
        # deferred-fetch drain state (run() with no eot_id): waves dispatch
        # back-to-back with the feed token carried on device; token blocks
        # accumulate unfetched and flush once at the end
        self._defer = False
        self._deferred: tp.List[dict] = []
        self._feed_dev: tp.Optional[jax.Array] = None

    # -- client API -----------------------------------------------------------

    def submit(self, prompt_ids: tp.Sequence[int], max_new_tokens: int = 20) -> Request:
        assert len(prompt_ids) > 0, "empty prompt"
        # capacity is the RAW need; if the prefill bucket doesn't also fit,
        # admission falls back to token-per-step prefill for that request
        assert len(prompt_ids) + max_new_tokens <= self.max_len, (
            f"prompt {len(prompt_ids)} + max_new {max_new_tokens} exceeds "
            f"engine max_len {self.max_len}")
        if self.megakernel:
            # no token-per-step fallback in megakernel mode: the bucketed
            # prefill itself must fit (waves may defer an admission whose
            # batch-mates force a larger shared bucket, but a request that
            # busts its OWN bucket could never be admitted)
            lb = -(-len(prompt_ids) // self.PREFILL_BUCKET) * self.PREFILL_BUCKET
            assert lb + max_new_tokens <= self.max_len, (
                f"megakernel serving admits via the {self.PREFILL_BUCKET}-"
                f"bucketed prefill: bucket {lb} + max_new {max_new_tokens} "
                f"exceeds engine max_len {self.max_len}")
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
        completion order.

        With no ``eot_id``, the drain runs in DEFERRED-FETCH mode: token
        values can't affect scheduling (budget-only retirement), so waves
        dispatch back-to-back with the feed carried on device and ZERO host
        syncs until one flush at the end — the whole drain is one async
        dispatch stream, the same discipline as the static batched scan
        (VERDICT r4 #2). With ``eot_id`` set, scheduling is data-dependent
        and the engine keeps one sync per wave."""
        done: tp.List[Request] = []
        self._defer = self.wave and self.eot_id is None
        try:
            while self.pending:
                done.extend(self.step())
        finally:
            if self._defer or self._deferred:
                self._exit_defer()
        return done

    # -- engine internals -----------------------------------------------------

    def _stamped_cache(self):
        idx = jnp.asarray(self._ring, jnp.int32)
        for layer in self._cache:
            layer["index"] = idx
        return self._cache

    def _finish_token(self, b: int, tok: int) -> tp.Optional[Request]:
        """Record a sampled token for slot b; return the request if done."""
        slot = self._slots[b]
        req = slot.req
        self._last_sample[b] = tok
        req.out_ids.append(tok)
        slot.generated += 1
        if ((self.eot_id is not None and tok == self.eot_id)
                or slot.generated >= req.max_new_tokens):
            req.done = True
            self._slots[b] = _Slot()
            return req
        return None

    def _chunk_prefill(self, b: int, req: Request) -> tp.Optional[Request]:
        """One-dispatch prompt prefill for slot b (left-padded bucket)."""
        L = len(req.prompt_ids)
        lb = -(-L // self.PREFILL_BUCKET) * self.PREFILL_BUCKET
        pad = lb - L
        if lb + req.max_new_tokens > self.max_len:
            return "fallback"  # type: ignore[return-value]  # bucket doesn't fit
        # safety: the batched junk write must not clamp into an ACTIVE
        # row's real history near capacity
        for ob, s in enumerate(self._slots):
            if ob != b and not s.free and self._ring[ob] + lb > self.max_len:
                return "fallback"  # type: ignore[return-value]
        tokens = np.zeros((self.B, lb), np.int32)
        tokens[b, pad:] = req.prompt_ids
        offs = np.zeros(self.B, np.int64)
        offs[b] = -pad
        self._ring[b] = 0
        self._key_pad[b] = pad
        self._positions[b] = 0
        prefill = _prefill_step(self.model, self.temperature, self.top_k,
                                self.greedy, lb, self.top_p)
        self._rng, sub = jax.random.split(self._rng)
        ring_before = self._ring.copy()
        self._cache, nxt = prefill(
            self.variables, self._stamped_cache(), jnp.asarray(tokens),
            jnp.asarray(offs, jnp.int32), jnp.asarray(self._key_pad, jnp.int32),
            sub, self._head_table)
        # roll every OTHER row's ring back (their lb junk writes are beyond
        # the restored index -> causally invisible); slot b keeps its lb
        self._ring = ring_before
        self._ring[b] = lb
        self._positions[b] = L
        self._slots[b].fed = L
        return self._finish_token(b, int(np.asarray(nxt)[b]))

    def _admit(self) -> tp.List[Request]:
        finished: tp.List[Request] = []
        for b, slot in enumerate(self._slots):
            if not slot.free or not self._queue:
                continue
            req = self._queue.pop(0)
            self._slots[b] = _Slot(req=req, fed=0, generated=0)
            self._ring[b] = 0
            self._key_pad[b] = 0
            self._positions[b] = 0
            if self.prefill_chunk and len(req.prompt_ids) > 1:
                out = self._chunk_prefill(b, req)
                if out == "fallback":
                    continue  # token-by-token prefill via step()
                if out is not None:
                    finished.append(out)
        return finished

    def _burst_len(self, active: tp.List[int], safe: int) -> int:
        """Iterations safely dispatchable with no host visit: bounded by the
        burst knob, every active row's remaining budget, and capacity
        (``safe`` — the :meth:`_safe_iters` value step() computed once);
        requires every active row past its prompt (prefill feeds are host
        data). A non-empty queue does NOT block a burst — ``_admit`` just
        ran, so a backlog implies every slot is busy and no admission could
        happen for at least one iteration anyway. The scheduling
        granularity is ``burst * pipeline`` when bursts chain
        (:meth:`_dispatch_burst`): a request retiring mid-chain via
        ``eot_id`` delays the next admission — and decodes discarded junk
        tokens — for up to ``burst * pipeline - 1`` iterations (budget
        retirements can't, ``safe`` never outlives the earliest budget).
        Greedy outputs are per-request identical regardless; SAMPLED
        streams under a backlog depend on admission timing, which chaining
        coarsens the same way (the rng stream is consumed per iteration)."""
        if self.burst <= 1:
            return 1
        return min(self.burst, safe)

    def _safe_iters(self, active: tp.List[int]) -> int:
        """Iterations dispatchable with zero host visits, uncapped by the
        burst knob: min over active rows of remaining budget and KV
        capacity (1 while any row is still prefilling — prefill feeds are
        host data). Because it is bounded by the minimum remaining
        ``max_new_tokens`` budget, a chain never outlives the first
        retirement unless ``eot_id`` cuts a stream short (those post-EOT
        tokens are junk the host discards — the same contract as a single
        burst)."""
        n = 1 << 30
        for b in active:
            slot = self._slots[b]
            if slot.fed < len(slot.req.prompt_ids):
                return 1
            n = min(n, slot.req.max_new_tokens - slot.generated)
            n = min(n, self.max_len - int(self._ring[b]))
        return max(n, 1)

    def _dispatch_burst(self, active: tp.List[int], n: int,
                        tokens: np.ndarray, safe: int,
                        prefill_nxt: tp.Optional[jax.Array] = None,
                        admitted: tp.Sequence[int] = (),
                        chains: tp.Optional[int] = None) -> tp.List[Request]:
        """Dispatch ``chains`` back-to-back bursts of ``n`` iterations and
        fetch their tokens in ONE host sync. Between bursts the feed token
        and the KV ring index live on device (``apply`` advances the index
        itself; ``feed`` is the scan carry), so chaining is pure async
        dispatch — the emitted ids are bitwise what n*chains sequential
        steps emit (the host pre-splits the identical rng stream and the
        per-burst position bases are host arithmetic).

        Wave mode (``prefill_nxt`` set): rows in ``admitted`` seed their
        feed from the still-on-device first sampled token of the batched
        admission prefill (:meth:`_admit_wave`) — the prefill's fetch is
        folded into this dispatch's single sync. Each row carries its
        remaining budget into the burst program, so the chain length is
        bounded by the MAX remaining budget (+ capacity), not the min;
        budget-retired rows freeze on device and their tail tokens are
        junk discarded here (VERDICT r3 #3 device-side retirement)."""
        rem = np.zeros(self.B, np.int64)
        for b in active:
            slot = self._slots[b]
            rem[b] = slot.req.max_new_tokens - slot.generated
        for b in admitted:
            rem[b] -= 1  # the pending prefill token spends one budget unit
        if chains is None:
            chains = 1
            if self.pipeline > 1 and n == self.burst:
                chains = max(1, min(self.pipeline, safe // n))
        mask = np.zeros(self.B, bool)
        mask[active] = True
        mask_dev = jnp.asarray(mask)
        key_pad = jnp.asarray(self._key_pad, jnp.int32)
        base_pos = self._positions.copy()
        feed = jnp.asarray(tokens)
        if prefill_nxt is not None:
            amask = np.zeros(self.B, bool)
            amask[list(admitted)] = True
            feed = jnp.where(jnp.asarray(amask), prefill_nxt, feed)
        if self.megakernel:
            run = _mega_burst(self.model, self.temperature, self.top_k,
                              self.greedy, n, self.top_p)
            kv = self._mega_kv
            idx_dev = jnp.asarray(self._ring, jnp.int32)
        else:
            run = _engine_burst(self.model, self.temperature, self.top_k,
                                self.greedy, n, self.top_p)
            cache = self._stamped_cache()
        # the exact rng stream n*chains single steps consume, pre-split as
        # ONE jitted scan dispatch (bit-identical keys; the per-split host
        # dispatches used to dominate the window's host cost)
        self._rng, subs_all = _split_program(n * chains)(self._rng)
        parts = []
        for k in range(chains):
            done_k = np.minimum(k * n, rem)      # live iterations so far
            pos_k = np.where(mask, base_pos + done_k, base_pos)
            rem_k = np.where(mask, rem - done_k, 0)
            if self.megakernel:
                kv, toks, feed, idx_dev = run(
                    self.variables, self._packed, kv, feed,
                    jnp.asarray(pos_k, jnp.int32), idx_dev, mask_dev,
                    jnp.asarray(rem_k, jnp.int32), key_pad,
                    subs_all[k * n:(k + 1) * n], self._head_table)
            else:
                cache, toks, feed = run(
                    self.variables, cache, feed, jnp.asarray(pos_k, jnp.int32),
                    mask_dev, jnp.asarray(rem_k, jnp.int32), key_pad,
                    subs_all[k * n:(k + 1) * n], self._head_table)
            parts.append(toks)
        if self.megakernel:
            self._mega_kv = kv
        else:
            self._cache = cache
        blocks = parts[0] if chains == 1 else jnp.concatenate(parts, axis=0)
        if prefill_nxt is not None:  # ONE sync for prefill + all chains
            blocks = jnp.concatenate([prefill_nxt[None], blocks], axis=0)
        total = n * chains
        self._ring += total
        if self._defer:
            # deferred-fetch drain (run() with no eot_id): token VALUES
            # don't affect scheduling — only budgets do — so the block stays
            # ON DEVICE, the feed carries to the next wave on device, and
            # retirement is host arithmetic. One flush fetches everything.
            self._feed_dev = feed
            self._deferred.append({
                "blocks": blocks, "active": list(active),
                "admitted": list(admitted), "rem": rem.copy(),
                "total": total, "has_prefill": prefill_nxt is not None,
                "reqs": {b: self._slots[b].req
                         for b in set(active) | set(admitted)}})
            return self._retire_budget(active, admitted, rem, total,
                                       prefill=prefill_nxt is not None)
        toks = np.asarray(blocks)
        finished: tp.List[Request] = []
        if prefill_nxt is not None:
            toks, pre = toks[1:], toks[0]
            for b in admitted:  # prefill's sampled token precedes the chain
                done = self._finish_token(b, int(pre[b]))
                if done is not None:
                    finished.append(done)
        for b in active:
            self._positions[b] += min(total, int(rem[b]))
            if self._slots[b].free:   # retired by its own prefill token
                continue
            for i in range(total):
                done = self._finish_token(b, int(toks[i, b]))
                if done is not None:  # post-EOT/budget burst tokens are junk
                    finished.append(done)
                    break
        return finished

    def _retire_budget(self, active, admitted, rem, total, *,
                       prefill: bool) -> tp.List[Request]:
        """Deferred-mode retirement: with no ``eot_id``, slot lifecycles
        depend ONLY on budgets, so requests retire on host arithmetic while
        their tokens are still in flight (out_ids fill at flush). Mirrors
        the sync path's _finish_token arithmetic exactly."""
        finished: tp.List[Request] = []
        if prefill:
            for b in admitted:
                slot = self._slots[b]
                slot.generated += 1
                if slot.generated >= slot.req.max_new_tokens:
                    slot.req.done = True
                    finished.append(slot.req)
                    self._slots[b] = _Slot()
        for b in active:
            self._positions[b] += min(total, int(rem[b]))
            slot = self._slots[b]
            if slot.free:   # retired by its own prefill token
                continue
            slot.generated += min(total, int(rem[b]))
            if slot.generated >= slot.req.max_new_tokens:
                slot.req.done = True
                finished.append(slot.req)
                self._slots[b] = _Slot()
        return finished

    def _flush_deferred(self) -> None:
        """Fetch every deferred wave's token block and fill out_ids in the
        order the sync path would have (prefill token first, then each
        active row's kept chain tokens)."""
        for rec in self._deferred:
            toks = np.asarray(rec["blocks"])
            if rec["has_prefill"]:
                pre, toks = toks[0], toks[1:]
                for b in rec["admitted"]:
                    rec["reqs"][b].out_ids.append(int(pre[b]))
            for b in rec["active"]:
                req = rec["reqs"][b]
                for i in range(min(rec["total"], int(rec["rem"][b]))):
                    req.out_ids.append(int(toks[i, b]))
        self._deferred = []

    def _exit_defer(self) -> None:
        """Leave deferred mode mid-run (legacy fallback or run() teardown):
        flush the blocks and restore the host state sync dispatch needs
        (_last_sample per still-active slot = its request's latest id)."""
        self._flush_deferred()
        self._defer = False
        self._feed_dev = None
        for b, slot in enumerate(self._slots):
            if not slot.free and slot.req.out_ids:
                self._last_sample[b] = slot.req.out_ids[-1]

    def _prefill_wave(self, admit: tp.Sequence[tp.Tuple[int, Request]],
                      lb: int) -> jax.Array:
        """Batched multi-slot admission prefill: every (slot, request) pair
        rides ONE (B, lb) dispatch (per-row offsets + key-pads make the
        rows independent — each row's math is exactly its solo
        :meth:`_chunk_prefill`), and the (B,) first-sampled-token vector is
        returned ON DEVICE: the wave's burst chain seeds from it and the
        fetch is folded into the chain's single sync."""
        tokens = np.zeros((self.B, lb), np.int32)
        offs = np.zeros(self.B, np.int64)
        for b, req in admit:
            L = len(req.prompt_ids)
            pad = lb - L
            tokens[b, pad:] = req.prompt_ids
            offs[b] = -pad
            self._slots[b] = _Slot(req=req, fed=L, generated=0)
            self._ring[b] = 0
            self._key_pad[b] = pad
            self._positions[b] = 0
        ring_before = self._ring.copy()
        self._rng, sub = jax.random.split(self._rng)
        if self.megakernel:
            prefill = _mega_prefill_step(self.model, self.temperature,
                                         self.top_k, self.greedy, lb,
                                         self.top_p)
            amask = np.zeros(self.B, bool)
            for b, _ in admit:
                amask[b] = True
            self._mega_kv, nxt = prefill(
                self.variables, self._mega_kv, jnp.asarray(tokens),
                jnp.asarray(offs, jnp.int32),
                jnp.asarray(self._key_pad, jnp.int32), jnp.asarray(amask),
                sub, self._head_table)
        else:
            prefill = _prefill_step(self.model, self.temperature, self.top_k,
                                    self.greedy, lb, self.top_p)
            self._cache, nxt = prefill(
                self.variables, self._stamped_cache(), jnp.asarray(tokens),
                jnp.asarray(offs, jnp.int32), jnp.asarray(self._key_pad, jnp.int32),
                sub, self._head_table)
        # non-admitted rows' lb junk writes roll back (causally invisible;
        # megakernel mode never wrote them in the first place)
        self._ring = ring_before
        for b, req in admit:
            self._ring[b] = lb
            self._positions[b] = len(req.prompt_ids)
        return nxt

    def _step_wave(self) -> tp.Optional[tp.List[Request]]:
        """Wave dispatch: batched admission prefill + rem-masked burst
        chains + ONE host sync for the whole window (VERDICT r3 #3: the
        remaining 3x gap to the static ceiling was per-burst host returns).
        Returns None when a precondition fails; :meth:`step` then falls
        back to the legacy per-slot path for this iteration."""
        if not (self.prefill_chunk and self.burst > 1):
            return None
        for s in self._slots:
            if not s.free and s.fed < len(s.req.prompt_ids):
                return None  # mid token-wise prefill: host feeds each token
        free = [b for b, s in enumerate(self._slots) if s.free]
        n_adm = min(len(free), len(self._queue))
        admit = list(zip(free, self._queue[:n_adm]))
        if admit and self.megakernel:
            # no legacy fallback in megakernel mode: defer the queue tail
            # whose batch-mates' shared bucket wouldn't fit (each request's
            # OWN bucket fits by the submit-time assert, so the head of the
            # queue always admits — no starvation)
            bucket = self.PREFILL_BUCKET
            kept: tp.List[tp.Tuple[int, Request]] = []
            for b, r in admit:
                trial = kept + [(b, r)]
                lb_t = max(-(-len(x.prompt_ids) // bucket) * bucket
                           for _, x in trial)
                if any(lb_t + x.max_new_tokens > self.max_len
                       for _, x in trial):
                    break  # keep queue order; retry next wave
                kept.append((b, r))
            admit, n_adm = kept, len(kept)
        prefill_nxt = None
        admitted: tp.List[int] = []
        if admit:
            bucket = self.PREFILL_BUCKET
            lb = max(-(-len(r.prompt_ids) // bucket) * bucket
                     for _, r in admit)
            if not self.megakernel:
                if any(lb + r.max_new_tokens > self.max_len for _, r in admit):
                    return None  # shared bucket doesn't fit someone: legacy path
                for ob, s in enumerate(self._slots):
                    if not s.free and self._ring[ob] + lb > self.max_len:
                        return None  # junk write would clamp into real history
                # (megakernel prefill writes through a masked merge into the
                # per-slot rings — other rows' junk never lands, so neither
                # guard applies)
            del self._queue[:n_adm]
            admitted = [b for b, _ in admit]
            prefill_nxt = self._prefill_wave(admit, lb)
        active = [b for b, s in enumerate(self._slots) if not s.free]
        if not active:
            return []
        adm_set = set(admitted)
        rem_max = max(self._slots[b].req.max_new_tokens
                      - self._slots[b].generated - (b in adm_set)
                      for b in active)
        if rem_max <= 0:  # every active row retires on its prefill token
            if self._defer:
                self._deferred.append({
                    "blocks": prefill_nxt[None], "active": [],
                    "admitted": admitted, "rem": np.zeros(self.B, np.int64),
                    "total": 0, "has_prefill": True,
                    "reqs": {b: self._slots[b].req for b in admitted}})
                return self._retire_budget([], admitted,
                                           np.zeros(self.B, np.int64), 0,
                                           prefill=True)
            pre = np.asarray(prefill_nxt)
            finished = []
            for b in admitted:
                done = self._finish_token(b, int(pre[b]))
                if done is not None:
                    finished.append(done)
            return finished
        if self._defer and self._feed_dev is not None:
            # the feed never visits the host between waves: decode rows
            # continue from the device-carried token, admitted rows are
            # overridden from prefill_nxt inside the dispatch
            tokens = self._feed_dev
        else:
            tokens = np.zeros(self.B, np.int32)
            for b in active:
                if b not in adm_set:
                    tokens[b] = self._last_sample[b]  # admitted rows seed on device
        n = self.burst
        chains = max(1, min(self.pipeline, -(-rem_max // n)))
        return self._dispatch_burst(active, n, tokens, rem_max,
                                    prefill_nxt=prefill_nxt,
                                    admitted=admitted, chains=chains)

    def step(self) -> tp.List[Request]:
        """One iteration: every active slot advances one token (an
        admission-free all-decode window advances up to ``burst`` tokens in
        one dispatch — same emitted ids, see :func:`_engine_burst`; with
        ``wave=True`` the window also folds the batched admission prefill
        and runs to the max remaining budget, see :meth:`_step_wave`).
        Returns the requests that finished (admission prefills may finish a
        1-new-token request immediately)."""
        if self.wave:
            out = self._step_wave()
            if out is not None:
                return out
            if self._defer:
                # legacy fallback needs host-side feed state: flush the
                # in-flight blocks and finish this run synchronously
                self._exit_defer()
        finished = self._admit()
        active = [b for b, s in enumerate(self._slots) if not s.free]
        if not active:
            return finished

        tokens = np.zeros(self.B, np.int32)
        for b, slot in enumerate(self._slots):
            if slot.free:
                continue  # idle rows advance harmlessly (their slots rewind on admit)
            req = slot.req
            if slot.fed < len(req.prompt_ids):
                tokens[b] = req.prompt_ids[slot.fed]          # prefill feed
            else:
                tokens[b] = self._last_sample[b]               # decode feed

        safe = self._safe_iters(active)
        n = self._burst_len(active, safe)
        if n > 1:
            return finished + self._dispatch_burst(active, n, tokens, safe)

        self._rng, sub = jax.random.split(self._rng)
        self._cache, nxt = self._step(
            self.variables, self._stamped_cache(), jnp.asarray(tokens),
            jnp.asarray(self._positions, jnp.int32),
            jnp.asarray(self._key_pad, jnp.int32), sub, self._head_table)
        nxt = np.asarray(nxt)
        self._ring += 1

        for b, slot in enumerate(self._slots):
            if slot.free:
                continue
            self._positions[b] += 1
            if slot.fed < len(slot.req.prompt_ids):
                slot.fed += 1
                if slot.fed < len(slot.req.prompt_ids):
                    continue  # still prefilling; sampled token unused
            done = self._finish_token(b, int(nxt[b]))
            if done is not None:
                finished.append(done)
        return finished
