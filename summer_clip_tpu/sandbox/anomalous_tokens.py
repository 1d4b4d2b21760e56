"""Anomalous-token analysis sandbox (JAX).

Rebuild of the reference's standalone scripts
(``summer_clip/clip_prompt/anomalous_tokens/``): probing a causal LM's
embedding space for tokens/inputs with anomalous behavior.

- :func:`kmeans` — cosine k-means over the token-embedding table (the
  reference's ``kkmeans``, helpers.py:68-138), jitted lax iteration,
- :func:`closest_tokens` — nearest tokens under cosine distance,
- :func:`optimise_input` — continuous input optimization: find input
  embeddings (projected to the unit sphere) that make the LM emit a target
  output, regularized by output perplexity and distance-to-vocab
  (backwards.py:16-216); batched over candidate inputs with optax Adam.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["kmeans", "closest_tokens", "optimise_input"]


def _l2n(x: jax.Array) -> jax.Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def kmeans(embeddings: jax.Array, num_clusters: int, *, max_iter: int = 100,
           threshold: float = 1e-5, seed: int = 0
           ) -> tp.Tuple[jax.Array, jax.Array]:
    """Cosine k-means. Returns (assignments (V,), centroids (K, D))."""
    emb = _l2n(jnp.asarray(embeddings, jnp.float32))
    v = emb.shape[0]
    rng = jax.random.PRNGKey(seed)
    init_idx = jax.random.permutation(rng, v)[:num_clusters]
    centroids0 = emb[init_idx]

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


def closest_tokens(query: jax.Array, embeddings: jax.Array, n: int = 10
                   ) -> tp.Tuple[jax.Array, jax.Array]:
    """(distances, ids) of the n nearest tokens by cosine distance."""
    emb = _l2n(jnp.asarray(embeddings, jnp.float32))
    q = _l2n(jnp.atleast_2d(jnp.asarray(query, jnp.float32)))
    dists = 1.0 - (q @ emb.T)[0]
    neg_d, ids = jax.lax.top_k(-dists, n)
    return -neg_d, ids


def optimise_input(gpt_apply: tp.Callable[[jax.Array], jax.Array],
                   word_embeddings: jax.Array,
                   target_ids: tp.Sequence[int], *,
                   input_len: int = 10, batch_size: int = 8, epochs: int = 100,
                   lr: float = 0.1, dist_reg: float = 0.1, perp_reg: float = 0.0,
                   seed: int = 0,
                   init: str = "kmeans") -> tp.Dict[str, tp.Any]:
    """Optimize continuous inputs so the LM outputs ``target_ids``.

    ``gpt_apply(inputs_embeds (B, T, D)) -> logits (B, T, V)`` closes over the
    frozen LM. Loss per candidate = -log p(target | input) +
    dist_reg * distance-to-nearest-vocab + perp_reg * output perplexity.
    Returns the optimized inputs, their nearest token ids, and final losses.
    """
    emb = _l2n(jnp.asarray(word_embeddings, jnp.float32))
    v, d = emb.shape
    target = jnp.asarray(np.asarray(target_ids, np.int32))
    out_len = target.shape[0]
    rng = jax.random.PRNGKey(seed)

    if init == "random":
        idx = jax.random.permutation(rng, v)[: input_len * batch_size]
        x0 = emb[idx].reshape(batch_size, input_len, d)
    else:
        _, centroids = kmeans(emb, batch_size * input_len, seed=seed)
        x0 = centroids.reshape(batch_size, input_len, d)

    params = {"inputs": x0}
    tx = optax.adam(lr, eps=1e-4)
    opt_state = tx.init(params)

    def loss_fn(p):
        x = _l2n(p["inputs"])  # (B, L, D) on the sphere
        # teacher-forced rollout: feed input ++ target embeddings
        tgt_emb = jnp.broadcast_to(emb[target][None], (batch_size, out_len, d))
        seq = jnp.concatenate([x, tgt_emb], axis=1)
        logits = gpt_apply(seq)  # (B, L+out_len, V)
        # positions predicting the target: input_len-1 .. input_len+out_len-2
        pred = logits[:, input_len - 1: input_len + out_len - 1, :]
        logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(
            logp, jnp.broadcast_to(target[None, :, None], (batch_size, out_len, 1)),
            axis=-1)[..., 0].mean(axis=1)                      # (B,)
        dists = 1.0 - jnp.einsum("bld,vd->blv", x, emb).max(axis=-1)  # (B, L)
        dist_term = dists.mean(axis=1)
        perp_term = nll  # output perplexity proxy = mean nll
        loss_b = nll + dist_reg * dist_term + perp_reg * perp_term
        return loss_b.mean(), (loss_b, nll)

    @jax.jit
    def step(params, opt_state):
        (_, (loss_b, nll)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss_b, nll

    loss_b = nll = None
    for _ in range(epochs):
        params, opt_state, loss_b, nll = step(params, opt_state)

    final_inputs = _l2n(params["inputs"])
    nearest = jnp.argmax(jnp.einsum("bld,vd->blv", final_inputs, emb), axis=-1)
    return {
        "inputs": final_inputs,
        "nearest_token_ids": np.asarray(nearest),
        "losses": np.asarray(loss_b),
        "nll": np.asarray(nll),
    }


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
