"""Anomalous-token analysis sandbox (JAX).

Rebuild of the reference's standalone scripts
(``summer_clip/clip_prompt/anomalous_tokens/``): probing a causal LM's
embedding space for tokens/inputs with anomalous behavior.

- :func:`kmeans` — cosine k-means over the token-embedding table (the
  reference's ``kkmeans``, helpers.py:68-138), jitted lax iteration, with an
  optional equal-size rebalance (helpers.py:109-127),
- :func:`closest_tokens` — nearest tokens under cosine distance,
- :func:`greedy_rollout` — the reference's ``model_emb`` (helpers.py:166-190):
  autoregressive greedy decode in embedding space with a fixed-shape
  ``lax.scan`` (the argmax feedback is non-differentiable, exactly like the
  torch index path),
- :func:`confidence_perplexity` — ``helpers.perplexity`` (helpers.py:194-198),
- :func:`optimise_input` — continuous input optimization: find input
  embeddings (projected to the unit sphere) that make the LM emit a target
  output (backwards.py:16-216), with the full reference search surface:
  sliding-window targets (output_len > len(target)), log-prob/CE losses,
  repetition penalty, success detection by greedy generation with per-row
  re-initialization + early return, and reduce-on-plateau LR decay,
- :func:`backwards_main` — the ``backwards.py`` CLI (test sets, random
  targets, metrics through the experiment logger instead of wandb).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["kmeans", "closest_tokens", "greedy_rollout", "confidence_perplexity",
           "optimise_input", "backwards_main"]


def _l2n(x: jax.Array) -> jax.Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def kmeans(embeddings: jax.Array, num_clusters: int, *, max_iter: int = 100,
           threshold: float = 1e-5, seed: int = 0, equal_clusters: bool = False
           ) -> tp.Tuple[jax.Array, jax.Array]:
    """Cosine k-means. Returns (assignments (V,), centroids (K, D)).

    ``equal_clusters=True`` mirrors the reference's capacity rebalance
    (helpers.py:109-127): oversized clusters keep their ``V // K`` nearest
    members and spill the rest, farthest-first, into clusters with free
    space. The rebalance is host-side numpy (data-dependent sizes); the
    plain path stays a jitted ``lax.while_loop``.
    """
    emb = _l2n(jnp.asarray(embeddings, jnp.float32))
    v = emb.shape[0]
    rng = jax.random.PRNGKey(seed)
    init_idx = jax.random.permutation(rng, v)[:num_clusters]
    centroids0 = emb[init_idx]
    if equal_clusters:
        return _kmeans_equal(np.asarray(emb), np.asarray(centroids0),
                             num_clusters, max_iter=max_iter, threshold=threshold)

    def step(state):
        centroids, _, i = state
        dists = 1.0 - emb @ centroids.T
        assign = jnp.argmin(dists, axis=1)
        one_hot = jax.nn.one_hot(assign, num_clusters, dtype=emb.dtype)
        sums = one_hot.T @ emb
        counts = one_hot.sum(axis=0)[:, None]
        new_centroids = _l2n(jnp.where(counts > 0, sums / jnp.maximum(counts, 1), centroids))
        movement = jnp.mean(jnp.abs(new_centroids - centroids))
        return new_centroids, movement, i + 1

    def cond(state):
        _, movement, i = state
        return jnp.logical_and(movement > threshold, i < max_iter)

    centroids, _, _ = jax.lax.while_loop(
        cond, step, (centroids0, jnp.asarray(jnp.inf), jnp.asarray(0)))
    assign = jnp.argmin(1.0 - emb @ centroids.T, axis=1)
    return assign, centroids


def _kmeans_equal(emb: np.ndarray, centroids: np.ndarray, k: int, *,
                  max_iter: int, threshold: float
                  ) -> tp.Tuple[jax.Array, jax.Array]:
    cap = emb.shape[0] // k
    assign = np.zeros(emb.shape[0], np.int64)
    for _ in range(max_iter):
        dists = 1.0 - emb @ centroids.T               # (V, K)
        assign = dists.argmin(axis=1)
        # rebalance: oversized clusters keep the cap nearest-to-centroid
        # members, spares go to the nearest cluster with free space
        spares: tp.List[int] = []
        for c in range(k):
            members = np.flatnonzero(assign == c)
            if members.size > cap:
                order = np.argsort(dists[members, c])
                spares.extend(members[order[cap:]].tolist())
        if spares:
            spares_a = np.asarray(spares)
            free = np.asarray([max(cap - (assign == c).sum(), 0) for c in range(k)])
            # farthest spares pick first (reference spills them in cluster
            # order; nearest-with-space is the same greedy up to tie order)
            for s in spares_a[np.argsort(-dists[spares_a, assign[spares_a]])]:
                order = np.argsort(dists[s])
                for c in order:
                    if free[c] > 0:
                        assign[s] = c
                        free[c] -= 1
                        break
        new_centroids = np.stack([
            emb[assign == c].mean(axis=0) if (assign == c).any() else centroids[c]
            for c in range(k)])
        new_centroids /= np.maximum(np.linalg.norm(new_centroids, axis=1, keepdims=True), 1e-12)
        movement = np.abs(new_centroids - centroids).mean()
        centroids = new_centroids
        if movement <= threshold:
            break
    return jnp.asarray(assign), jnp.asarray(centroids, jnp.float32)


def closest_tokens(query: jax.Array, embeddings: jax.Array, n: int = 10
                   ) -> tp.Tuple[jax.Array, jax.Array]:
    """(distances, ids) of the n nearest tokens by cosine distance."""
    emb = _l2n(jnp.asarray(embeddings, jnp.float32))
    q = _l2n(jnp.atleast_2d(jnp.asarray(query, jnp.float32)))
    dists = 1.0 - (q @ emb.T)[0]
    neg_d, ids = jax.lax.top_k(-dists, n)
    return -neg_d, ids


def greedy_rollout(gpt_apply: tp.Callable[[jax.Array], jax.Array],
                   inputs_embeds: jax.Array, table: jax.Array, out_len: int
                   ) -> tp.Tuple[jax.Array, jax.Array, jax.Array]:
    """Reference ``model_emb`` (helpers.py:166-190) as one fixed-shape program.

    Autoregressively greedy-decode ``out_len`` tokens in embedding space:
    each step feeds back ``table[argmax]``. Static shapes for XLA: the
    sequence buffer is (B, L+O, D) from the start and a ``lax.scan`` fills
    position L+i at step i — causality guarantees the logits read at
    position L+i-1 are exact regardless of the garbage beyond it. Returns
    ``(all_logits (B, L+O, V), out_ids (B, O), final_seq)``; gradients flow
    to ``inputs_embeds`` only through the final full forward (the argmax
    feedback is detached, matching torch's non-differentiable index path).
    """
    b, l, d = inputs_embeds.shape
    seq0 = jnp.concatenate(
        [inputs_embeds, jnp.zeros((b, out_len, d), inputs_embeds.dtype)], axis=1)

    # step i reads logits at position l+i-1 and writes the argmax embedding
    # at position l+i
    def scan_step(seq, i):
        logits = gpt_apply(jax.lax.stop_gradient(seq))
        last = jax.lax.dynamic_slice_in_dim(logits, l - 1 + i, 1, axis=1)[:, 0]
        ix = jnp.argmax(last, axis=-1)                           # (B,)
        upd = jax.lax.stop_gradient(table[ix])[:, None, :].astype(seq.dtype)
        seq = jax.lax.dynamic_update_slice(seq, upd, (0, l + i, 0))
        return seq, ix

    seq, out_ids = jax.lax.scan(scan_step, seq0, jnp.arange(out_len))
    # one differentiable forward over the completed sequence gives every
    # logit the loss needs (identical values to the per-step reads)
    all_logits = gpt_apply(seq)
    return all_logits, out_ids.T, seq


def confidence_perplexity(logits: jax.Array) -> jax.Array:
    """``helpers.perplexity`` (helpers.py:194-198): 1/geomean(max softmax
    prob) - 1 per row — a confidence measure of the greedy path."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    max_logp = logp.max(axis=-1)                                  # (..., T)
    return jnp.exp(-max_logp.mean(axis=-1)) - 1.0


def _subseq_found(hay: np.ndarray, needle: np.ndarray) -> bool:
    n = len(needle)
    return any(np.array_equal(hay[i:i + n], needle)
               for i in range(len(hay) - n + 1))


def optimise_input(gpt_apply: tp.Callable[[jax.Array], jax.Array],
                   word_embeddings: jax.Array,
                   target_ids: tp.Sequence[int], *,
                   input_len: int = 10, batch_size: int = 8, epochs: int = 100,
                   lr: float = 0.1, dist_reg: float = 0.1, perp_reg: float = 0.0,
                   seed: int = 0,
                   init: str = "kmeans",
                   output_len: tp.Optional[int] = None,
                   loss_type: str = "log_prob",
                   penalise_repetition: bool = False,
                   equal_clusters: bool = False,
                   optimiser: str = "adam",
                   lr_decay: bool = False,
                   no_reinit: bool = False,
                   return_early: bool = False,
                   check_freq: int = 10,
                   decode_fn: tp.Optional[tp.Callable[[tp.Sequence[int]], str]] = None,
                   log_fn: tp.Optional[tp.Callable[[dict], None]] = None,
                   gpt_params: tp.Any = None
                   ) -> tp.Dict[str, tp.Any]:
    """Optimize continuous inputs so the LM outputs ``target_ids``.

    The reference search loop (backwards.py:16-216), end to end:

    - rollout: :func:`greedy_rollout` (NOT teacher forcing — the loss reads
      the target's logits off the model's own greedy continuation),
    - loss (per candidate): -log p(target) at the output positions — with a
      per-token max over sliding windows when ``output_len`` exceeds the
      target length (backwards.py:98-104) — plus ``dist_reg`` * mean
      distance-to-nearest-vocab-token and ``perp_reg`` * confidence
      perplexity; the three terms are averaged (backwards.py:134). ``ce``
      loss is single-token only, like the reference (backwards.py:122-127).
    - ``penalise_repetition`` adds the target's logits summed over the first
      ``min(input_len, output_len)`` rollout positions (backwards.py:136-138),
    - every ``check_freq`` epochs each candidate's nearest-token ids are
      greedy-decoded through the RAW embedding table (the reference's
      ``model.generate(closest_ix)``, backwards.py:142); candidates whose
      continuation contains the target (id-subsequence, or string
      containment when ``decode_fn`` is given) are recorded and re-initialized
      unless ``no_reinit`` (backwards.py:144-174); ``return_early`` stops at
      the first find,
    - ``lr_decay`` is reduce-on-plateau (factor 0.5, patience 20, cooldown
      20, backwards.py:87) applied at check points.

    ``init``: "kmeans" (cluster centroids, optionally ``equal_clusters``),
    "random" (random token embeddings), or "local" (tokens nearest the
    target's mean embedding, backwards.py:67-77).

    ``gpt_params``: when given, ``gpt_apply`` is called as
    ``gpt_apply(gpt_params, inputs_embeds)`` and the parameter tree rides
    the jitted programs as an argument (a closure-captured tree embeds as
    MLIR constants — ~500MB of compile payload at gpt2 scale). The
    single-arg ``gpt_apply(inputs_embeds)`` contract remains for small
    closures.
    """
    raw = jnp.asarray(word_embeddings, jnp.float32)
    emb = _l2n(raw)    # the reference normalizes the table in place (line 53)
    v, d = emb.shape
    target = jnp.asarray(np.asarray(target_ids, np.int32))
    t_len = int(target.shape[0])
    out_len = t_len if output_len is None or output_len < t_len else int(output_len)
    if loss_type == "ce" and t_len > 1:
        raise ValueError("CE loss is single-token only (backwards.py:123)")
    if loss_type not in ("log_prob", "ce"):
        raise ValueError(f"unknown loss_type {loss_type!r}")
    rng = jax.random.PRNGKey(seed)
    host_rng = np.random.default_rng(seed)

    centroids = None
    if init == "random":
        idx = jax.random.permutation(rng, v)[: input_len * batch_size]
        x0 = emb[idx].reshape(batch_size, input_len, d)
    elif init == "local":
        _, near = closest_tokens(emb[target].mean(axis=0), emb, n=batch_size)
        x0 = jnp.repeat(emb[near][:, None, :], input_len, axis=1)
    else:
        _, centroids = kmeans(emb, batch_size * input_len, seed=seed,
                              equal_clusters=equal_clusters)
        x0 = centroids.reshape(batch_size, input_len, d)

    params = {"inputs": x0}
    if optimiser == "adam":
        base_tx = optax.inject_hyperparams(optax.adam)(learning_rate=lr, eps=1e-4)
    elif optimiser == "sgd":
        base_tx = optax.inject_hyperparams(optax.sgd)(learning_rate=lr)
    else:
        raise ValueError(f"unsupported optimiser {optimiser!r}")
    opt_state = base_tx.init(params)

    # sliding windows: window w covers output positions w .. w+t_len-1; the
    # per-token max over windows mirrors backwards.py:98-100
    windows = np.stack([np.arange(t_len) + w for w in range(out_len - t_len + 1)])
    windows_j = jnp.asarray(windows)

    # gpt params + the (V, D) embedding tables ride through the jits as
    # ARGUMENTS (when `gpt_params` is given): a closure-captured array
    # embeds as a literal MLIR constant — at gpt2 scale that is the whole
    # ~500MB parameter tree per compiled program, a crushing payload for
    # this host's out-of-process compile helper (tools/attr_grid_variants.py).
    # The legacy single-arg `gpt_apply(embeds)` contract still works for
    # small closures (the unit tests' fake models).
    if gpt_params is None:
        def apply2(_gp, inputs_embeds):
            return gpt_apply(inputs_embeds)
    else:
        apply2 = gpt_apply

    def loss_fn(p, gp, emb):
        x = _l2n(p["inputs"])                               # (B, L, D) on the sphere
        all_logits, out_ids, _ = greedy_rollout(
            lambda e: apply2(gp, e), x, emb, out_len)
        # rollout logits at output positions: L-1 .. L+out_len-2
        out_logits = all_logits[:, input_len - 1: input_len + out_len - 1, :]
        logp = jax.nn.log_softmax(out_logits.astype(jnp.float32), axis=-1)
        # (B, W, T): log p(target_t) at window w
        lp_win = logp[:, windows_j, target[None, :]]
        target_logp = lp_win.max(axis=1)                    # (B, T) per-token max
        if loss_type == "ce":
            nll = -jax.nn.log_softmax(
                out_logits[:, 0].astype(jnp.float32), axis=-1)[:, target[0]][:, None]
        else:
            nll = -target_logp                              # (B, T)
        nll_b = nll.mean(axis=1)                            # (B,)
        dists = 1.0 - jnp.einsum("bld,vd->blv", x, emb).max(axis=-1)
        dist_b = dists.mean(axis=1)                         # (B,)
        # confidence perplexity of the whole greedy path (positions 0..L+O-2)
        perp_b = confidence_perplexity(all_logits[:, :-1, :])
        total = jnp.stack([dist_b.mean() * dist_reg, nll_b.mean(),
                           perp_b.mean() * perp_reg]).mean()
        if penalise_repetition:
            # exact reference computation (backwards.py:137): target logits
            # over the first min(L, O) rollout output positions
            rep = out_logits[:, : min(input_len, out_len), :][..., target].sum()
            total = total + rep
        return total, (nll_b, dist_b, perp_b, out_ids)

    @jax.jit
    def step_j(params, opt_state, gp, emb):
        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, gp, emb)
        updates, opt_state = base_tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, total, aux

    @jax.jit
    def decode_ids_j(ids, gp, raw):
        # the success check decodes through the RAW table — the model's real
        # token embeddings, like the reference's model.generate(closest_ix)
        _, out_ids, _ = greedy_rollout(lambda e: apply2(gp, e),
                                       raw[ids], raw, out_len)
        return out_ids

    @jax.jit
    def nearest_ids_j(p, emb):
        return jnp.argmax(jnp.einsum("bld,vd->blv", _l2n(p["inputs"]), emb), axis=-1)

    def step(params, opt_state):
        return step_j(params, opt_state, gpt_params, emb)

    def decode_ids(ids):
        return decode_ids_j(ids, gpt_params, raw)

    def nearest_ids(p):
        return nearest_ids_j(p, emb)

    target_np = np.asarray(target_ids, np.int64)
    target_str = decode_fn(list(target_np)) if decode_fn else None
    found: tp.List[dict] = []
    found_keys: tp.Set[tp.Tuple[int, ...]] = set()
    best_loss, plateau_wait, cooldown, cur_lr = np.inf, 0, 0, lr
    total = nll_b = dist_b = perp_b = None
    epochs_run = 0

    def reinit_row(b: int, inputs: np.ndarray) -> np.ndarray:
        if centroids is not None:
            pick = host_rng.integers(0, centroids.shape[0], size=input_len)
            inputs[b] = np.array(centroids)[pick]
        else:
            pick = host_rng.permutation(v)[:input_len]
            inputs[b] = np.array(emb)[pick]
        return inputs

    for e in range(epochs):
        params, opt_state, total, (nll_b, dist_b, perp_b, _) = step(params, opt_state)
        epochs_run = e + 1
        if (e + 1) % check_freq != 0 and e + 1 != epochs:
            continue
        near = np.asarray(nearest_ids(params))              # (B, L)
        outs = np.asarray(decode_ids(jnp.asarray(near)))    # (B, O)
        total_f = float(total)
        nll_np, dist_np, perp_np = (np.asarray(a) for a in (nll_b, dist_b, perp_b))
        hit = False
        for b in range(batch_size):
            if decode_fn is not None:
                ok = target_str in decode_fn(list(outs[b]))
            else:
                ok = _subseq_found(outs[b], target_np)
            key = tuple(near[b].tolist()) + tuple(outs[b].tolist())
            if ok and key not in found_keys:
                found_keys.add(key)
                found.append({
                    "input_ids": near[b].tolist(),
                    "output_ids": outs[b].tolist(),
                    "loss": float(nll_np[b]),
                    "perplexity": float(perp_np[b]),
                    "distance": float(dist_np[b]),
                    "epoch": e + 1,
                })
                hit = True
                if not no_reinit:
                    inputs = np.array(params["inputs"])  # writable copy
                    params = {"inputs": jnp.asarray(reinit_row(b, inputs))}
        if log_fn is not None:
            log_fn({"type": "optimise_input", "epoch": e + 1, "total_loss": total_f,
                    "nll": float(nll_np.mean()), "token_dist": float(dist_np.mean()),
                    "perplexity": float(perp_np.mean()), "lr": cur_lr,
                    "num_found": len(found)})
        if lr_decay:
            if total_f < best_loss - 1e-12:
                best_loss, plateau_wait = total_f, 0
            elif cooldown > 0:
                cooldown -= check_freq
            else:
                plateau_wait += check_freq
                if plateau_wait >= 20:
                    cur_lr *= 0.5
                    plateau_wait, cooldown = 0, 20
                    opt_state.hyperparams["learning_rate"] = jnp.asarray(cur_lr)
        if hit and return_early:
            break

    final_inputs = _l2n(params["inputs"])
    nearest = np.asarray(nearest_ids(params))
    per_cand = np.asarray(nll_b) + dist_reg * np.asarray(dist_b) \
        + perp_reg * np.asarray(perp_b)
    return {
        "inputs": final_inputs,
        "nearest_token_ids": nearest,
        "losses": per_cand,
        "nll": np.asarray(nll_b),
        "distances": np.asarray(dist_b),
        "perplexities": np.asarray(perp_b),
        "found": found,
        "epochs_run": epochs_run,
        "final_lr": cur_lr,
    }


def backwards_main(argv: tp.Optional[tp.Sequence[str]] = None) -> tp.Dict[str, tp.Any]:
    """The ``backwards.py`` CLI (backwards.py:219-288): optimize inputs for a
    target (or a curated test set, or random targets), logging metrics and
    the found-inputs table through the experiment logger."""
    import argparse

    p = argparse.ArgumentParser(description="anomalous-token input optimization")
    p.add_argument("--model_name", default="test-gpt")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--no_reinit", action="store_true")
    p.add_argument("--w_freq", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--input_len", type=int, default=10)
    p.add_argument("--target", type=int, nargs="+", default=[7],
                   help="target token id(s)")
    p.add_argument("--output_len", type=int, default=None)
    p.add_argument("--dist_reg", type=float, default=0.1)
    p.add_argument("--perp_reg", type=float, default=0.0)
    p.add_argument("--loss_type", default="log_prob", choices=["log_prob", "ce"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--return_early", action="store_true")
    p.add_argument("--lr_decay", action="store_true")
    p.add_argument("--init", default="kmeans", choices=["kmeans", "random", "local"])
    p.add_argument("--optimiser", default="adam", choices=["adam", "sgd"])
    p.add_argument("--equal_clusters", action="store_true")
    p.add_argument("--penalise_repetition", action="store_true")
    p.add_argument("--run_test_set", type=int, nargs="*", default=None,
                   help="token ids to sweep as single-token targets")
    p.add_argument("--run_random", type=int, default=0,
                   help="optimize N uniformly random single-token targets")
    p.add_argument("--log", default=None, help="JSONL metrics path")
    args = p.parse_args(argv)

    from summer_clip_tpu.core.log_utils import JsonlLogger, NullExpLogger
    from summer_clip_tpu.models import gpt2 as gpt2_mod

    model, cfg = gpt2_mod.build_gpt2(args.model_name)
    if args.checkpoint:
        from summer_clip_tpu.engine.checkpoint import load_pytree

        params = load_pytree(args.checkpoint)
    else:
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 4), jnp.int32))["params"]
    table = params["wte"]["embedding"]

    # two-arg contract + gpt_params=: the 500MB param tree rides the jits
    # as an argument instead of an embedded MLIR constant
    def gpt_apply(p, inputs_embeds):
        return model.apply({"params": p}, inputs_embeds=inputs_embeds)["logits"]

    logger = JsonlLogger(args.log) if args.log else NullExpLogger()

    if args.run_test_set is not None:
        targets = [[t] for t in args.run_test_set]
    elif args.run_random > 0:
        host = np.random.default_rng(args.seed)
        targets = [[int(host.integers(0, cfg.vocab_size))]
                   for _ in range(args.run_random)]
    else:
        targets = [list(args.target)]

    runs = []
    for tgt in targets:
        out = optimise_input(
            gpt_apply, table, tgt, input_len=args.input_len,
            batch_size=args.batch_size, epochs=args.epochs, lr=args.lr,
            dist_reg=args.dist_reg, perp_reg=args.perp_reg, seed=args.seed,
            init=args.init, output_len=args.output_len, loss_type=args.loss_type,
            penalise_repetition=args.penalise_repetition,
            equal_clusters=args.equal_clusters, optimiser=args.optimiser,
            lr_decay=args.lr_decay, no_reinit=args.no_reinit,
            return_early=args.return_early, check_freq=args.w_freq,
            log_fn=logger.log, gpt_params=params)
        logger.log_table(
            "optimised_inputs",
            ["Input", "Output", "Loss", "Perplexity", "Distance", "Epoch"],
            [[f["input_ids"], f["output_ids"], f["loss"], f["perplexity"],
              f["distance"], f["epoch"]] for f in out["found"]])
        print(f"target={tgt}: found={len(out['found'])} "
              f"epochs_run={out['epochs_run']} final_lr={out['final_lr']:.4f}")
        runs.append({"target": tgt, "num_found": len(out["found"]),
                     "found": out["found"], "epochs_run": out["epochs_run"]})
    logger.finish()
    return {"runs": runs}


def main(argv: tp.Optional[tp.Sequence[str]] = None) -> str:
    """Generation CLI (reference ``anomalous_tokens/generate.py``): tokenize
    an input, print its per-token decomposition, greedy-decode a
    continuation, print the output text."""
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("-m", "--model", default="gpt2", help="GPT2_CONFIGS name")
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-o", "--output-length", type=int, default=20)
    p.add_argument("--checkpoint", default=None, help="params pytree path")
    args = p.parse_args(argv)

    from summer_clip_tpu.apps.gen_gpt import generate_device
    from summer_clip_tpu.models import gpt2 as gpt2_mod
    from summer_clip_tpu.models.tokenizer import get_tokenizer

    tok = get_tokenizer()
    cfg = gpt2_mod.GPT2_CONFIGS[args.model]
    model = gpt2_mod.GPT2(cfg)
    if args.checkpoint:
        from summer_clip_tpu.engine.checkpoint import load_pytree

        params = load_pytree(args.checkpoint)
    else:
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 4), jnp.int32))["params"]
    ix = [i % cfg.vocab_size for i in tok.encode(args.input)]
    print(f"{len(ix)} input tokens: {[tok.decode([i]) for i in ix]}")
    out_ids = generate_device(model, {"params": params}, ix,
                              max_new_tokens=int(args.output_length),
                              top_k=1, rng=jax.random.PRNGKey(0))
    text = tok.decode(out_ids)
    print(f"\nOutput:\n{text}")
    return text


if __name__ == "__main__":
    main()
