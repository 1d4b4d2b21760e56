"""Speculative decoding: a small draft model proposes, the target verifies.

The reference's generation path (``clip_prompt/gen_gpt.py:56-117``) samples
one token per GPT-2-large forward. Decode is parameter-read-bound — every
token re-reads all 774M weights from HBM — so the TPU-native lever beyond
int8 weights (``engine/quant.py``) is to amortize the big model's reads over
several tokens: a cheap draft model (e.g. gpt2-124M bridged to the same CLIP
vocabulary) greedily proposes ``k`` tokens, then the target scores all
``k+1`` positions in ONE forward and accepts the longest agreeing prefix
(Leviathan et al. 2023, greedy case). Every iteration emits between 1 and
``k+1`` tokens for a single target dispatch; outputs are **bit-identical to
the target-only greedy decode** (pinned by tests against
``gen_gpt.generate_device(top_k=1)``) because acceptance only ever keeps
tokens the target itself would have produced.

The whole loop — draft scan, verify forward, acceptance, KV rollback — runs
on device inside one ``lax.while_loop`` jit; tokens are fetched once at the
end (the remote-TPU tunnel costs ~25ms per host round-trip, see
docs/SERVING.md).

KV-cache rollback: after a verify forward the cache index sits at
``L + k + 1`` even when only ``a < k`` drafts were accepted. Rolling the
index back to ``L + a + 1`` is enough — stale K/V rows beyond the index are
never attended before being overwritten, because the causal mask only admits
``k_pos <= q_pos`` and the next write fills exactly the positions the next
query window can newly reach (same argument as the serving engine's ring
reuse, ``models/gpt2.py:77-104``).
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["generate_device_speculative"]


@functools.lru_cache(maxsize=32)
def _speculative_program(model, draft_model, n_prompt: int, max_new: int,
                         k: int, eot: int, quant_int8: bool,
                         draft_quant_int8: bool):
    """Jitted prefill + speculative while_loop, memoized on shapes.

    int8 trees (``quant_int8`` / ``draft_quant_int8``) are consumed AS
    STORED — QDense streams the weights through the GEMV kernel (both the
    1-row draft steps and the (k+1)-row verify forward are decode-shaped),
    and each model's logits come off a head table hoisted + int8-quantized
    once before the while_loop (``engine/quant.quant_head_table``), never
    a per-iteration head recompute/dequant."""
    from summer_clip_tpu.engine.quant import quant_head_table
    from summer_clip_tpu.ops.gemv import qdot

    def _logits(out, table):
        # (positions, vocab) logits for batch row 0
        if table is None:
            return out["logits"][0]
        return qdot(out["hidden"][0], table, jnp.float32)

    def rollback(cache, new_index):
        return [dict(c, index=new_index) for c in cache]

    @jax.jit
    def run(variables, draft_variables, prompt, cache, draft_cache):
        t_table = quant_head_table(model, variables) if quant_int8 else None
        d_table = (quant_head_table(draft_model, draft_variables)
                   if draft_quant_int8 else None)
        # prefill both models on the prompt; the target's last-position
        # argmax is the first *certain* token ("pending": decided, but not
        # yet consumed by either cache)
        out = model.apply(variables, prompt, position_offset=0,
                          cache=cache)
        dout = draft_model.apply(draft_variables, prompt,
                                 position_offset=0, cache=draft_cache)
        # keep the draft's PREFILLED cache (its prompt logits are unused) —
        # proposing from the empty init cache would condition every draft on
        # garbage and drive acceptance to zero while staying bit-identical
        # (regression pinned by test_verify_iterations_amortize)
        draft_cache = dout["cache"]
        pending = jnp.argmax(out["logits"][0, -1, :]).astype(jnp.int32)
        cache = out["cache"]

        buf = jnp.zeros((max_new + k + 1,), jnp.int32)
        # carry: pending token, target cache, draft cache, emitted count,
        # sequence length L (tokens consumed by the target cache), done flag,
        # buffer, verify-forward count (the quantity speculation minimizes)
        init = (pending, cache, draft_cache, jnp.asarray(0, jnp.int32),
                jnp.asarray(n_prompt, jnp.int32), jnp.asarray(False), buf,
                jnp.asarray(0, jnp.int32))

        def cond(c):
            return (~c[5]) & (c[3] < max_new)

        def body(c):
            pending, cache, dcache, n, L, done, buf, iters = c

            # ---- draft: k+1 greedy single-token steps ------------------
            # feeding pending, d_1, ..., d_k advances the draft cache
            # through position L+k so a fully-accepted window needs no
            # catch-up next iteration; d_{k+1} is discarded
            def dstep(carry, _):
                tok, dc = carry
                o = draft_model.apply(draft_variables, tok[None, None],
                                      position_offset=dc[0]["index"],
                                      cache=dc)
                nxt = jnp.argmax(_logits(o, d_table)[-1]).astype(jnp.int32)
                return (nxt, o["cache"]), tok

            (_, dcache), window = jax.lax.scan(
                dstep, (pending, dcache), None, length=k + 1)
            # window = [pending, d_1, ..., d_k]: exactly the tokens the
            # target must score
            drafts = window[1:]

            # ---- target: verify all k+1 positions in one forward -------
            o = model.apply(variables, window[None],
                            position_offset=L, cache=cache)
            preds = jnp.argmax(_logits(o, t_table), axis=-1).astype(jnp.int32)
            # preds[i] = target's token for position L+i+1
            match = preds[:k] == drafts
            a = jnp.sum(jnp.cumprod(match.astype(jnp.int32)))  # accepted
            new_pending = preds[a]  # correction (a<k) or bonus (a==k)

            # emit window[:a+1] = pending + accepted drafts; later writes
            # overwrite the invalid tail
            buf = jax.lax.dynamic_update_slice(buf, window, (n,))
            valid = jnp.arange(k + 1) <= a
            done = jnp.any((window == eot) & valid)
            L2 = L + a + 1
            return (new_pending, rollback(o["cache"], L2),
                    rollback(dcache, L2), n + a + 1, L2, done, buf, iters + 1)

        _, _, _, n, _, _, buf, iters = jax.lax.while_loop(cond, body, init)
        return buf, n, iters

    return run


def generate_device_speculative(
        model, variables, draft_model, draft_variables,
        prompt_ids: tp.Sequence[int], *, max_new_tokens: int = 20,
        k: int = 4, eot_id: tp.Optional[int] = None,
        quant_int8: bool = False, draft_quant_int8: bool = False,
        return_stats: bool = False,
) -> tp.Union[tp.List[int], tp.Tuple[tp.List[int], tp.Dict[str, int]]]:
    """Greedy decode with draft-model speculation; one device dispatch.

    Returns exactly what ``generate_device(..., top_k=1)`` on the target
    alone returns (the draft only changes *speed*, never tokens): per-row
    logits are bitwise independent of how many positions share a forward,
    so acceptance compares the same argmaxes the solo decoder would take.

    ``k``: draft tokens proposed per verify step. Higher k amortizes more
    target reads but wastes draft work when agreement is low; 3-8 is the
    useful range (docs/SERVING.md).
    """
    assert k >= 1, "speculation needs at least one draft token"
    n_prompt = len(prompt_ids)
    need = n_prompt + max_new_tokens + k + 1
    assert need <= model.config.n_positions, (
        f"prompt {n_prompt} + max_new {max_new_tokens} + speculation margin "
        f"{k + 1} exceeds the target's {model.config.n_positions} positions")
    assert need <= draft_model.config.n_positions, (
        f"speculation window exceeds the draft's "
        f"{draft_model.config.n_positions} positions")
    cache = model.apply(variables, method=model.init_cache, batch=1,
                        max_len=need)
    draft_cache = draft_model.apply(draft_variables,
                                    method=draft_model.init_cache,
                                    batch=1, max_len=need)
    run = _speculative_program(model, draft_model, n_prompt,
                               int(max_new_tokens), int(k),
                               -1 if eot_id is None else int(eot_id),
                               bool(quant_int8), bool(draft_quant_int8))
    prompt = jnp.asarray(np.asarray(prompt_ids, np.int32))[None]
    buf, n, iters = run(variables, draft_variables, prompt, cache, draft_cache)
    toks = np.asarray(buf)[:min(int(n), int(max_new_tokens))]
    out_ids = list(int(i) for i in prompt_ids)
    for t in toks:
        out_ids.append(int(t))
        if eot_id is not None and int(t) == eot_id:
            break
    if return_stats:
        # verify_iters counts target forwards in the loop; emitted/iters is
        # the amortization factor speculation exists to maximize
        return out_ids, {"verify_iters": int(iters), "emitted": int(n)}
    return out_ids
