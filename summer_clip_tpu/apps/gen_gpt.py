"""ClipGPT evaluation & generation (reference ``clip_prompt/gen_gpt.py``).

Loads a trained ClipGPT step checkpoint, reports perplexity on a validation
token matrix, and samples continuations for a fixed prompt list via the
functional KV cache (temperature / top-k sampling). Results go to
``results.yaml`` + JSON records.
"""

from __future__ import annotations

import functools
import logging
import typing as tp
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from summer_clip_tpu.core import config as C
from summer_clip_tpu.engine import checkpoint as ckpt
from summer_clip_tpu.engine.trainer import BaseTrainer, run_trainer
from summer_clip_tpu.models import gpt2 as gpt2_mod
from summer_clip_tpu.models.tokenizer import get_tokenizer
from summer_clip_tpu.store import load_array

__all__ = ["load_pretrained_clip_gpt", "generate", "generate_device",
           "generate_device_batched", "run"]


def load_pretrained_clip_gpt(checkpoint_dir: tp.Union[str, Path], tokenizer,
                             rng: tp.Optional[jax.Array] = None):
    """Rebuild a ClipGPT from a step checkpoint's model_cfg meta + params.

    Checkpoints hold only the TRAINABLE subset (reference semantics); the
    frozen leaves (embedding tables, and the whole core for adapters-only
    runs) are re-initialized. The trainer records its init key in the
    checkpoint meta so the re-init reproduces the trained model exactly,
    regardless of this run's seed; ``rng`` is only a fallback for legacy
    checkpoints without the recorded key."""
    loaded = ckpt.load_checkpoint(checkpoint_dir)
    meta = loaded.get("meta") or {}
    mcfg = meta.get("model_cfg") or {}
    gpt_cfg = gpt2_mod.GPT2_CONFIGS[str(mcfg.get("gpt_config", "gpt2-large"))]
    adapters = mcfg.get("adapters") or {}
    model = gpt2_mod.ClipGPT(
        gpt_cfg, clip_vocab_size=tokenizer.vocab_size,
        clip_emb_dim=int(mcfg.get("clip_emb_dim", 512)),
        emb_hid_dim=int(adapters.get("emb_hid_dim", 1024)),
        head_hid_dim=adapters.get("head_hid_dim", 1024))
    if meta.get("init_key") is not None:
        key = jnp.asarray(np.asarray(meta["init_key"], np.uint32))
    else:
        key = rng if rng is not None else jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, 4), jnp.int32))["params"]
    if "params" in loaded:
        params = ckpt.merge_tree(params, loaded["params"])
    return model, {"params": params}


def generate(model, variables, prompt_ids: tp.Sequence[int], *, max_new_tokens: int = 20,
             temperature: float = 1.0, top_k: int = 50,
             rng: tp.Optional[jax.Array] = None, eot_id: tp.Optional[int] = None,
             top_p: float = 1.0) -> tp.List[int]:
    """Incremental sampling via the functional KV cache."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    max_len = len(prompt_ids) + max_new_tokens
    cache = model.apply(variables, method=model.init_cache, batch=1, max_len=max_len)

    @jax.jit
    def step(params_vars, ids, offset, cache):
        out = model.apply(params_vars, ids, position_offset=offset, cache=cache)
        return out["logits"][:, -1, :], out["cache"]

    ids = jnp.asarray(np.asarray(prompt_ids, np.int32))[None]
    logits, cache = step(variables, ids, 0, cache)
    out_ids = list(int(i) for i in prompt_ids)
    offset = len(prompt_ids)
    for _ in range(max_new_tokens):
        scaled = logits[0] / max(temperature, 1e-6)
        rng, sub = jax.random.split(rng)
        nxt = int(_sample_next(scaled, sub, int(top_k), False, float(top_p)))
        out_ids.append(nxt)
        if eot_id is not None and nxt == eot_id:
            break
        logits, cache = step(variables, jnp.asarray([[nxt]], jnp.int32), offset, cache)
        offset += 1
    return out_ids


def _sample_next(scaled: jax.Array, sub: jax.Array, top_k: int,
                 approx_top_k: bool, top_p: float = 1.0) -> jax.Array:
    """One sampling pick over (..., V) logits (shared by both scan bodies).

    ``approx_top_k`` routes through ``jax.lax.approx_max_k`` — the
    TPU-native O(V) top-k vs the full sort ``lax.top_k`` lowers to; trades
    exact host-loop parity for ~0.95-recall boundary approximation.

    ``top_p`` < 1 applies nucleus filtering AFTER the top-k cut, matching
    HF's warper order (reference ``conf/gen_gpt.yaml:46-49`` samples with
    ``top_k=50, top_p=0.95``): softmax over the surviving logits, then keep
    a token iff the cumulative probability of strictly-better tokens is
    still < top_p (the top-1 token always survives). With ``top_k=0`` the
    nucleus runs over the full sorted vocab.
    """
    if not top_k and top_p >= 1.0:
        return jax.random.categorical(sub, scaled, axis=-1)
    vals, idx = _filter_logits(scaled, top_k, approx_top_k, top_p)
    pick = jax.random.categorical(sub, vals, axis=-1)
    return jnp.take_along_axis(idx, pick[..., None], axis=-1)[..., 0]


def _filter_logits(scaled: jax.Array, top_k: int, approx_top_k: bool,
                   top_p: float) -> tp.Tuple[jax.Array, jax.Array]:
    """Top-k cut then nucleus cut; dropped entries become -inf in ``vals``.

    Returns ``(vals, idx)`` sorted by descending logit; the surviving token
    set is exactly what HF's TopKLogitsWarper -> TopPLogitsWarper chain
    keeps (pinned against transformers in tests)."""
    k = int(top_k) if top_k else scaled.shape[-1]
    if top_k and approx_top_k:
        vals, idx = jax.lax.approx_max_k(scaled, k)
    else:
        vals, idx = jax.lax.top_k(scaled, k)
    if top_p < 1.0:
        probs = jax.nn.softmax(vals, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        vals = jnp.where(cum - probs < top_p, vals, -jnp.inf)
    return vals, idx


def _quant_head_table(model, variables):
    from summer_clip_tpu.engine.quant import quant_head_table

    return quant_head_table(model, variables)


@functools.lru_cache(maxsize=64)
def _decode_program(model, n_prompt: int, max_new: int, temp: float,
                    top_k: int, approx_top_k: bool, eot: int,
                    quant_int8: bool = False, top_p: float = 1.0):
    """Jitted prefill + decode scan, memoized on (model, shapes, sampling
    params) — defining the jit inside generate_device would retrace and
    recompile on every call.

    ``quant_int8``: ``variables["params"]`` is a weight-only int8 tree
    (``engine.quant.quantize_tree``) consumed AS STORED — QDense streams
    int8 weight slabs through the Pallas GEMV (ops/gemv.py), embeds gather
    int8 rows, and the lm head reads a pre-computed int8 table
    (:func:`_quant_head_table`). Per-token HBM traffic is the int8 bytes;
    nothing is dequantized into HBM inside the loop."""

    @jax.jit
    def run(variables, prompt, rng, cache):
        out = model.apply(variables, prompt, position_offset=0, cache=cache)
        last, cache = out["logits"][:, -1, :], out["cache"]
        if quant_int8:
            from summer_clip_tpu.ops.gemv import qdot

            table = _quant_head_table(model, variables)

        def body(carry, _):
            last, cache, rng, offset, done = carry
            rng, sub = jax.random.split(rng)
            nxt = _sample_next(last[0] / temp, sub, top_k, approx_top_k, top_p)
            nxt = jnp.where(done, jnp.asarray(eot, nxt.dtype), nxt).astype(jnp.int32)
            done = done | (nxt == eot)
            out = model.apply(variables, nxt[None, None],
                              position_offset=offset, cache=cache)
            if quant_int8:  # in-model logits are dead code (DCE'd)
                logits = qdot(out["hidden"][:, -1, :], table, jnp.float32)
            else:
                logits = out["logits"][:, -1, :]
            return (logits, out["cache"], rng, offset + 1, done), nxt

        init = (last, cache, rng, jnp.asarray(n_prompt, jnp.int32),
                jnp.asarray(False))
        _, toks = jax.lax.scan(body, init, None, length=max_new)
        return toks

    return run


@functools.lru_cache(maxsize=64)
def _decode_program_mega(model, n_prompt: int, max_new: int, temp: float,
                         top_k: int, approx_top_k: bool, eot: int,
                         kv_int8: bool = True, top_p: float = 1.0):
    """Jitted prefill + megakernel decode scan.

    The decode body runs the ENTIRE block stack in ONE pallas launch per
    token (``ops/decode_block``): embed/adapters -> megakernel -> ln_f ->
    hoisted head table -> sample; the int8 KV cache (per-token scales)
    rides the scan carry and fresh rows land via in-place
    ``dynamic_update_slice``. Weight packing (stack per-layer leaves into
    the kernel layout) happens once at trace top, outside the scan.
    Sampling semantics (rng split order, eot freeze, warper chain) match
    :func:`_decode_program` exactly.
    """
    from summer_clip_tpu.ops import decode_block as DB
    from summer_clip_tpu.ops.gemv import gather_rows, is_qleaf, qdot

    cfg = model.config

    @jax.jit
    def run(variables, prompt, rng, cache):
        out = model.apply(variables, prompt, position_offset=0, cache=cache)
        last, std_cache = out["logits"][:, -1, :], out["cache"]
        params = variables["params"]
        core = params["core"]
        probe = core["h_0"]["attn"]["c_attn"]["kernel"]
        store = "int8" if is_qleaf(probe) else "bf16"
        packed = DB.pack_core_params(core, cfg.n_layer, store=store)
        kv = DB.cache_to_mega(std_cache, n_prompt + max_new,
                              jnp.int8 if kv_int8 else jnp.bfloat16)
        lnf = core["ln_f"]
        if store == "int8":
            table = _quant_head_table(model, variables)
        elif isinstance(model, gpt2_mod.ClipGPT):
            table = model.apply(variables, method=model.lm_head_table).T
        else:
            table = params["wte"]["embedding"].T

        def embed_x(tok, pos):
            ids = tok[None, None]
            if isinstance(model, gpt2_mod.ClipGPT):
                e = model.apply(variables, ids, method=model.embed)
                x = model.apply(variables, e, method=model.adapt_embeds)[0]
            else:
                x = gather_rows(params["wte"]["embedding"], ids)[0]
            pos_row = jnp.clip(pos, 0, cfg.n_positions - 1)[None]
            return (x.astype(jnp.float32)
                    + gather_rows(core["wpe"], pos_row).astype(jnp.float32))

        def body(carry, _):
            last, kv, rng, offset, done = carry
            rng, sub = jax.random.split(rng)
            nxt = _sample_next(last[0] / temp, sub, top_k, approx_top_k, top_p)
            nxt = jnp.where(done, jnp.asarray(eot, nxt.dtype), nxt).astype(jnp.int32)
            done = done | (nxt == eot)
            x = embed_x(nxt, offset)
            y, kq, vq, ksn, vsn = DB.decode_block(x, packed, kv, offset,
                                                  nh=cfg.n_head)
            kv = {
                "k": jax.lax.dynamic_update_slice(kv["k"], kq, (0, offset, 0)),
                "v": jax.lax.dynamic_update_slice(kv["v"], vq, (0, offset, 0)),
                "ks": jax.lax.dynamic_update_slice(kv["ks"], ksn, (0, offset, 0)),
                "vs": jax.lax.dynamic_update_slice(kv["vs"], vsn, (0, offset, 0)),
            }
            h = DB._ln_rows(y, lnf["scale"][None], lnf["bias"][None])
            if is_qleaf(table):
                logits = qdot(h, table, jnp.float32)
            else:
                logits = jnp.dot(h.astype(jnp.bfloat16),
                                 table.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32)
            return (logits, kv, rng, offset + 1, done), nxt

        init = (last, kv, rng, jnp.asarray(n_prompt, jnp.int32),
                jnp.asarray(False))
        _, toks = jax.lax.scan(body, init, None, length=max_new)
        return toks

    return run


def generate_device(model, variables, prompt_ids: tp.Sequence[int], *,
                    max_new_tokens: int = 20, temperature: float = 1.0,
                    top_k: int = 50, rng: tp.Optional[jax.Array] = None,
                    eot_id: tp.Optional[int] = None,
                    approx_top_k: bool = False,
                    quant_int8: bool = False,
                    top_p: float = 1.0,
                    megakernel: bool = False,
                    mesh=None) -> tp.List[int]:
    """Whole-sequence sampling as ONE device program (``lax.scan`` decode).

    The host-loop :func:`generate` pays >= 2 host<->device round-trips per
    token (a fetched ``int(...)`` pick + a fresh dispatch) — ~50ms/token
    over the remote-TPU tunnel. Here prefill + the full decode loop run
    inside a single jit: the KV cache, rng and last-token logits ride the
    scan carry, and tokens are fetched once at the end. RNG-split order
    matches :func:`generate` exactly, so given the same key both samplers
    produce identical ids (pinned by tests). After an ``eot_id`` the carry
    freezes (emits eot), matching the host loop's early break once the
    host side truncates at the first eot.
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    n_prompt = len(prompt_ids)
    assert n_prompt + max_new_tokens <= model.config.n_positions, (
        f"prompt {n_prompt} + max_new_tokens {max_new_tokens} exceeds the "
        f"model's {model.config.n_positions} positions")
    cache = model.apply(variables, method=model.init_cache, batch=1,
                        max_len=n_prompt + max_new_tokens)
    if mesh is not None and mesh.shape.get("model", 1) > 1:
        assert not megakernel, "TP decode and the megakernel do not compose"
        if quant_int8:
            # int8 x TP: explicit SPMD — the Pallas GEMV streams each
            # chip's int8 shard inside shard_map (parallel/tp_int8.py)
            from summer_clip_tpu.parallel.tp_int8 import (
                shard_decode_tp_int8, tp_int8_decoder)

            variables, cache = shard_decode_tp_int8(variables, cache, mesh)
            model = tp_int8_decoder(model, mesh)
        else:
            # Megatron-TP decode: committed placements make the SAME jitted
            # program run sharded — GSPMD inserts the ICI psums (parallel/tp.py)
            from summer_clip_tpu.parallel import shard_decode_tp

            variables, cache = shard_decode_tp(variables, cache, mesh)
    if megakernel:
        from summer_clip_tpu.ops.decode_block import mega_legal

        cfg = model.config
        assert mega_legal(cfg.n_embd, 4 * cfg.n_embd, cfg.n_head), (
            f"megakernel does not support {cfg.name} geometry")
        run = _decode_program_mega(model, n_prompt, int(max_new_tokens),
                                   max(float(temperature), 1e-6), int(top_k),
                                   bool(approx_top_k),
                                   -1 if eot_id is None else int(eot_id),
                                   bool(quant_int8), float(top_p))
    else:
        run = _decode_program(model, n_prompt, int(max_new_tokens),
                              max(float(temperature), 1e-6), int(top_k),
                              bool(approx_top_k),
                              -1 if eot_id is None else int(eot_id),
                              bool(quant_int8), float(top_p))
    toks = np.asarray(run(variables, jnp.asarray(np.asarray(prompt_ids, np.int32))[None],
                          rng, cache))
    out_ids = list(int(i) for i in prompt_ids)
    for t in toks:
        out_ids.append(int(t))
        if eot_id is not None and int(t) == eot_id:
            break
    return out_ids


@functools.lru_cache(maxsize=64)
def _decode_program_batched(model, batch: int, l_max: int, max_new: int,
                            temp: float, top_k: int, approx_top_k: bool,
                            eot: int, quant_int8: bool = False,
                            top_p: float = 1.0):
    """Jitted batched prefill + decode scan (memoized; see _decode_program)."""

    @jax.jit
    def run(variables, ids, pad, rng, cache):
        out = model.apply(variables, ids, position_offset=(-pad)[:, None],
                          cache=cache, key_pad=pad)
        last, cache0 = out["logits"][:, -1, :], out["cache"]
        if quant_int8:
            from summer_clip_tpu.ops.gemv import qdot

            table = _quant_head_table(model, variables)

        def body(carry, step):
            last, cache, rng, done = carry
            rng, sub = jax.random.split(rng)
            nxt = _sample_next(last / temp, sub, top_k, approx_top_k, top_p)
            nxt = jnp.where(done, jnp.asarray(eot, nxt.dtype), nxt).astype(jnp.int32)
            done = done | (nxt == eot)
            offs = (l_max + step - pad)[:, None]
            out = model.apply(variables, nxt[:, None], position_offset=offs,
                              cache=cache, key_pad=pad)
            if quant_int8:  # in-model logits are dead code (DCE'd)
                logits = qdot(out["hidden"][:, -1, :], table, jnp.float32)
            else:
                logits = out["logits"][:, -1, :]
            return (logits, out["cache"], rng, done), nxt

        init = (last, cache0, rng, jnp.zeros(batch, bool))
        _, toks = jax.lax.scan(body, init, jnp.arange(max_new))
        return toks  # (max_new, B)

    return run


@functools.lru_cache(maxsize=64)
def _decode_program_batched_mega(model, batch: int, l_max: int, max_new: int,
                                 temp: float, top_k: int, approx_top_k: bool,
                                 eot: int, kv_int8: bool = True,
                                 top_p: float = 1.0):
    """Batched prefill + MEGAKERNEL decode scan: each decode iteration runs
    the whole block stack for all B (<= 8) streams in ONE pallas launch
    (``ops/decode_block`` batched streams — the weight read amortizes over
    the batch). Prefill is the standard wide forward into a SHORT (l_max)
    cache, converted once into the mega KV layout; per-row left-pads ride
    the kernel's pad mask (the ``key_pad`` contract). Sampling semantics
    (rng stream, eot freeze, warper chain) match
    :func:`_decode_program_batched` exactly."""
    from summer_clip_tpu.ops import decode_block as DB
    from summer_clip_tpu.ops.gemv import gather_rows, is_qleaf, qdot

    cfg = model.config

    @jax.jit
    def run(variables, ids, pad, rng, cache):
        out = model.apply(variables, ids, position_offset=(-pad)[:, None],
                          cache=cache, key_pad=pad)
        last = out["logits"][:, -1, :]
        params = variables["params"]
        core = params["core"]
        probe = core["h_0"]["attn"]["c_attn"]["kernel"]
        store = "int8" if is_qleaf(probe) else "bf16"
        packed = DB.pack_core_params(core, cfg.n_layer, store=store)
        kv = DB.cache_to_mega(out["cache"], l_max + max_new,
                              jnp.int8 if kv_int8 else jnp.bfloat16,
                              batched=True)
        lnf = core["ln_f"]
        if store == "int8":
            table = _quant_head_table(model, variables)
        elif isinstance(model, gpt2_mod.ClipGPT):
            table = model.apply(variables, method=model.lm_head_table).T
        else:
            table = params["wte"]["embedding"].T

        def embed_x(toks, pos):       # toks (B,), pos (B,)
            if isinstance(model, gpt2_mod.ClipGPT):
                e = model.apply(variables, toks[:, None], method=model.embed)
                x = model.apply(variables, e, method=model.adapt_embeds)[:, 0]
            else:
                x = gather_rows(params["wte"]["embedding"], toks)
            pos_c = jnp.clip(pos, 0, cfg.n_positions - 1)
            return (x.astype(jnp.float32)
                    + gather_rows(core["wpe"], pos_c).astype(jnp.float32))

        def body(carry, step):
            last, kv, rng, done = carry
            rng, sub = jax.random.split(rng)
            nxt = _sample_next(last / temp, sub, top_k, approx_top_k, top_p)
            nxt = jnp.where(done, jnp.asarray(eot, nxt.dtype), nxt).astype(jnp.int32)
            done = done | (nxt == eot)
            x = embed_x(nxt, l_max + step - pad)
            y, kq, vq, ksn, vsn = DB.decode_block(
                x, packed, kv, l_max + step, nh=cfg.n_head, pad=pad)
            kv = DB.mega_update_kv(kv, kq, vq, ksn, vsn, l_max + step)
            h = DB._ln_rows(y, lnf["scale"][None], lnf["bias"][None])
            if is_qleaf(table):
                logits = qdot(h, table, jnp.float32)
            else:
                logits = jnp.dot(h.astype(jnp.bfloat16),
                                 table.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32)
            return (logits, kv, rng, done), nxt

        init = (last, kv, rng, jnp.zeros(batch, bool))
        _, toks = jax.lax.scan(body, init, jnp.arange(max_new))
        return toks  # (max_new, B)

    return run


def generate_device_batched(model, variables, prompts: tp.Sequence[tp.Sequence[int]], *,
                            max_new_tokens: int = 20, temperature: float = 1.0,
                            top_k: int = 50, rng: tp.Optional[jax.Array] = None,
                            eot_id: tp.Optional[int] = None,
                            approx_top_k: bool = False,
                            quant_int8: bool = False,
                            top_p: float = 1.0,
                            megakernel: bool = False,
                            mesh=None) -> tp.List[tp.List[int]]:
    """Batched serving path: sample B variable-length prompts in ONE scan.

    Prompts are LEFT-padded to a shared length so every row appends at the
    same cache slot; per-row position offsets (``position_offset`` as a
    (B, 1) array) restore position 0 at each row's first real token, and
    ``key_pad`` masks the pad slots out of attention for good. Rows freeze
    independently on ``eot_id``. One rng per step drives the whole batch
    (row picks stay independent via the batched categorical).

    ``megakernel=True`` (B <= 8): decode iterations run the whole block
    stack for the batch in one pallas launch each (batched
    ``ops/decode_block`` streams) instead of the per-layer XLA/GEMV chain —
    the weight read per token amortizes across the batch rows.
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    B = len(prompts)
    lens = [len(p) for p in prompts]
    assert min(lens) > 0, "empty prompt"
    # bucket the padded length to a multiple of 16: serving workloads with
    # varying prompt lengths then reuse a handful of compiled programs
    # instead of one per distinct length (extra pad columns are key_pad-
    # masked like any other pad)
    l_max = min(-(-max(lens) // 16) * 16,
                model.config.n_positions - max_new_tokens)
    assert max(lens) + max_new_tokens <= model.config.n_positions, (
        f"longest prompt {max(lens)} + max_new_tokens {max_new_tokens} "
        f"exceeds the model's {model.config.n_positions} positions")
    ids = np.zeros((B, l_max), np.int32)
    for r, p in enumerate(prompts):
        ids[r, l_max - len(p):] = p
    pad = jnp.asarray([l_max - ln for ln in lens], jnp.int32)
    # megakernel prefill only needs the prompt window: the decode scan owns
    # the (quantized) mega cache, so the standard cache stays SHORT
    cache = model.apply(variables, method=model.init_cache, batch=B,
                        max_len=l_max if megakernel
                        else l_max + max_new_tokens)
    if mesh is not None and mesh.shape.get("model", 1) > 1:
        assert not megakernel, "TP decode and the megakernel do not compose"
        if quant_int8:
            from summer_clip_tpu.parallel.tp_int8 import (
                shard_decode_tp_int8, tp_int8_decoder)

            variables, cache = shard_decode_tp_int8(variables, cache, mesh)
            model = tp_int8_decoder(model, mesh)
        else:
            # same committed TP placements as generate_device: GSPMD compiles
            # the one batched program sharded over the 'model' axis
            from summer_clip_tpu.parallel import shard_decode_tp

            variables, cache = shard_decode_tp(variables, cache, mesh)
    if megakernel:
        from summer_clip_tpu.ops.decode_block import mega_legal

        cfg = model.config
        assert B <= 8, f"megakernel streams ride one (8, 128) tile; B={B}"
        assert mega_legal(cfg.n_embd, 4 * cfg.n_embd, cfg.n_head), (
            f"megakernel does not support {cfg.name} geometry")
        run = _decode_program_batched_mega(
            model, B, l_max, int(max_new_tokens),
            max(float(temperature), 1e-6), int(top_k), bool(approx_top_k),
            -1 if eot_id is None else int(eot_id),
            bool(quant_int8), float(top_p))
    else:
        run = _decode_program_batched(model, B, l_max, int(max_new_tokens),
                                      max(float(temperature), 1e-6), int(top_k),
                                      bool(approx_top_k),
                                      -1 if eot_id is None else int(eot_id),
                                      bool(quant_int8), float(top_p))
    toks = np.asarray(run(variables, jnp.asarray(ids), pad, rng, cache))
    results: tp.List[tp.List[int]] = []
    for r, p in enumerate(prompts):
        out_ids = list(int(i) for i in p)
        for t in toks[:, r]:
            out_ids.append(int(t))
            if eot_id is not None and int(t) == eot_id:
                break
        results.append(out_ids)
    return results


class GptGenerator(BaseTrainer):
    def setup_dataset(self):
        self.tokenizer = get_tokenizer()
        vcfg = self.cfg.get("val")
        self.val_tokens = (np.asarray(load_array(vcfg.tokens_path), np.int32)
                           if vcfg and vcfg.get("tokens_path") else None)

    def setup_model(self):
        self.model, self.variables = load_pretrained_clip_gpt(
            self.cfg.model.checkpoint_dir, self.tokenizer, self.rng.next())

    def perplexity(self) -> tp.Optional[float]:
        if self.val_tokens is None:
            return None
        from summer_clip_tpu.apps.train_gpt import lm_loss_fn

        @jax.jit
        def eval_step(variables, ids):
            out = self.model.apply(variables, ids)
            return lm_loss_fn(out["logits"], ids)

        bs = int(self.cfg.get("batch_size", 8))
        losses = [float(eval_step(self.variables, jnp.asarray(self.val_tokens[s:s + bs])))
                  for s in range(0, max(len(self.val_tokens) - bs + 1, 1), bs)]
        return float(np.exp(np.mean(losses))) if losses else None

    def train_loop(self):
        results: dict = {"generations": []}
        ppl = self.perplexity()
        if ppl is not None:
            results["perplexity"] = ppl
            self.logger.log_info({"type": "gpt_perplexity", "perplexity": ppl})

        gcfg = self.cfg.generation
        rng = self.rng.next()
        base_prompts = [str(p) for p in (self.cfg.prompts or [])]
        # reference conf/gen_gpt.yaml:50 samples num_return_sequences per
        # prompt; each repeat flows through the samplers as its own row /
        # rng split, so samples stay independent
        n_ret = max(int(gcfg.get("num_return_sequences", 1)), 1)
        prompts = [p for p in base_prompts for _ in range(n_ret)]
        mesh = None
        tp_size = int(gcfg.get("tp", 1))
        if tp_size > 1:
            # Megatron-TP decode over the first tp devices (generation.tp=N);
            # the jitted samplers are placement-agnostic — committed TP
            # placements make GSPMD compile the sharded program
            from summer_clip_tpu.parallel import check_tp_divisibility
            from summer_clip_tpu.parallel.mesh import create_mesh

            assert not (gcfg.get("continuous") or gcfg.get("speculative")), (
                "generation.tp composes with the device_loop/batched "
                "samplers, not the serving/speculative engines")
            assert gcfg.get("batched") or gcfg.get("device_loop", True), (
                "generation.tp needs a device-scan sampler: set "
                "generation.device_loop=true or generation.batched=true "
                "(the host-loop oracle would silently run unsharded)")
            check_tp_divisibility(self.model.config.n_embd,
                                  self.model.config.n_head, tp_size)
            mesh = create_mesh(data=1, model=tp_size,
                               devices=jax.devices()[:tp_size])
        common = dict(max_new_tokens=int(gcfg.max_new_tokens),
                      temperature=float(gcfg.temperature),
                      top_k=int(gcfg.top_k), eot_id=self.tokenizer.eot_token,
                      top_p=float(gcfg.get("top_p", 1.0)))
        if prompts and bool(gcfg.get("continuous", False)):
            # continuous-batching engine (engine/serving.py): iteration-level
            # admission into fixed slots; here it simply drains the prompt
            # list, but the same engine serves a live request stream
            from summer_clip_tpu.engine.serving import ContinuousBatcher

            ids_all = [[self.tokenizer.sot_token] + self.tokenizer.encode(p)
                       for p in prompts]
            rng, sub = jax.random.split(rng)
            max_new = int(gcfg.max_new_tokens)
            quant = bool(gcfg.get("quant_int8", False))
            mk = gcfg.get("megakernel", "auto")
            if mk == "auto":
                # megakernel serving amortizes the int8 weight read over the
                # slots; same depth/legality gate as the samplers
                from summer_clip_tpu.ops.decode_block import mega_legal

                cfg_m = self.model.config
                mk = (quant and int(gcfg.get("batch_slots", 8)) <= 8
                      and cfg_m.n_layer >= 24
                      and mega_legal(cfg_m.n_embd, 4 * cfg_m.n_embd,
                                     cfg_m.n_head))
            l_top = max(len(i) for i in ids_all)
            if mk:  # megakernel admits via the bucketed prefill: capacity
                bucket = ContinuousBatcher.PREFILL_BUCKET
                l_top = -(-l_top // bucket) * bucket
            eng = ContinuousBatcher(
                self.model, self.variables,
                batch_slots=int(gcfg.get("batch_slots", 8)),
                max_len=min(self.model.config.n_positions, l_top + max_new),
                temperature=float(gcfg.temperature), top_k=int(gcfg.top_k),
                top_p=float(gcfg.get("top_p", 1.0)),
                burst=int(gcfg.get("burst", 16)),
                pipeline=int(gcfg.get("pipeline", 4)),
                wave=bool(gcfg.get("wave", True)),
                quant_int8=quant, megakernel=bool(mk),
                eot_id=self.tokenizer.eot_token, rng=sub)
            reqs = [eng.submit(ids, max_new_tokens=max_new) for ids in ids_all]
            eng.run()
            outs = [ids + r.out_ids for ids, r in zip(ids_all, reqs)]
        elif prompts and bool(gcfg.get("speculative", False)):
            # greedy speculative decoding: a smaller ClipGPT (same CLIP
            # vocab) drafts k tokens per target verify forward; output is
            # bit-identical to generate_device(top_k=1) on the target
            from summer_clip_tpu.engine.speculative import generate_device_speculative

            draft_dir = gcfg.get("draft_checkpoint_dir")
            assert draft_dir, "generation.speculative needs draft_checkpoint_dir"
            draft_model, draft_vars = load_pretrained_clip_gpt(
                draft_dir, self.tokenizer, self.rng.next())
            if int(gcfg.top_k) != 1 or float(gcfg.get("top_p", 1.0)) < 1.0:
                self.logger.log_info(
                    "speculative decoding is greedy — ignoring "
                    "top_k/top_p/temperature")
            if n_ret > 1:
                self.logger.log_info(
                    "speculative decoding is deterministic — "
                    f"num_return_sequences={n_ret} repeats identical samples")
            outs = []
            for prompt in prompts:
                ids = [self.tokenizer.sot_token] + self.tokenizer.encode(prompt)
                outs.append(generate_device_speculative(
                    self.model, self.variables, draft_model, draft_vars, ids,
                    max_new_tokens=int(gcfg.max_new_tokens),
                    k=int(gcfg.get("speculative_k", 4)),
                    eot_id=self.tokenizer.eot_token))
        elif prompts and bool(gcfg.get("batched", False)):
            # all prompts in ONE scan (left-padded serving path)
            ids_all = [[self.tokenizer.sot_token] + self.tokenizer.encode(p)
                       for p in prompts]
            rng, sub = jax.random.split(rng)
            variables = self.variables
            quant = bool(gcfg.get("quant_int8", False))
            if quant:  # stored-int8 tree through the streaming GEMV
                from summer_clip_tpu.engine.quant import quantize_tree

                variables = dict(variables,
                                 params=quantize_tree(variables["params"]))
            mk = gcfg.get("megakernel", "auto")
            if mk == "auto":
                # same gate as the solo path: int8 tree + deep tile-legal
                # stack; the batched kernel additionally needs B <= 8 rows
                from summer_clip_tpu.ops.decode_block import mega_legal

                cfg_m = self.model.config
                mk = (quant and mesh is None and len(ids_all) <= 8
                      and cfg_m.n_layer >= 24
                      and mega_legal(cfg_m.n_embd, 4 * cfg_m.n_embd,
                                     cfg_m.n_head))
            outs = generate_device_batched(
                self.model, variables, ids_all, rng=sub, mesh=mesh,
                quant_int8=quant, megakernel=bool(mk),
                approx_top_k=bool(gcfg.get("approx_top_k", False)), **common)
        else:
            # device_loop (default): per-prompt decode as one lax.scan jit —
            # the host loop is kept as the parity oracle (device_loop=false)
            device = bool(gcfg.get("device_loop", True))
            sampler = generate_device if device else generate
            variables = self.variables
            quant = bool(gcfg.get("quant_int8", False))
            if quant:  # stored-int8 tree through the streaming GEMV
                from summer_clip_tpu.engine.quant import quantize_tree

                variables = dict(variables,
                                 params=quantize_tree(variables["params"]))
            # megakernel: one pallas launch per token for the whole block
            # stack — wins at gpt2-large scale (+36%, docs/KERNELS.md), a
            # small loss at 124M (the chain is already launch-light), so
            # "auto" gates on depth + tile legality
            mk = gcfg.get("megakernel", "auto")
            if mk == "auto":
                from summer_clip_tpu.ops.decode_block import mega_legal

                cfg_m = self.model.config
                # auto only rides the int8 tree: the megakernel stores bf16
                # otherwise, which would silently demote an f32 run's
                # numerics (explicit megakernel=true opts into that)
                mk = (quant and device and mesh is None
                      and cfg_m.n_layer >= 24
                      and mega_legal(cfg_m.n_embd, 4 * cfg_m.n_embd,
                                     cfg_m.n_head))
            outs = []
            for prompt in prompts:
                ids = [self.tokenizer.sot_token] + self.tokenizer.encode(prompt)
                rng, sub = jax.random.split(rng)
                extra = ({"approx_top_k": bool(gcfg.get("approx_top_k", False)),
                          "mesh": mesh, "quant_int8": quant,
                          "megakernel": bool(mk)}
                         if device else {})
                outs.append(sampler(self.model, variables, ids, rng=sub,
                                    **common, **extra))
        for i, (prompt, out_ids) in enumerate(zip(prompts, outs)):
            text = self.tokenizer.decode(out_ids)
            results["generations"].append({"prompt": prompt, "sample": i % n_ret,
                                           "ids": out_ids, "text": text})
            self.logger.log_info({"type": "generation", "prompt": prompt,
                                  "sample": i % n_ret, "text": text})

        Path("results.yaml").write_text(yaml.safe_dump(results, allow_unicode=True))
        logging.info("Saved results.yaml")


@C.main(config_path="../conf", config_name="gen_gpt")
def run(cfg) -> None:
    run_trainer(GptGenerator, cfg)


if __name__ == "__main__":
    run()
