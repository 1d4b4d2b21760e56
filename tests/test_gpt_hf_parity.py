"""GPT-2 parity vs HF transformers' own implementation (external oracle).

Unlike the CLIP towers (whose upstream lives in the absent `clip` package),
GPT-2's upstream implementation IS installed: `transformers` with CPU torch.
A GPT2LMHeadModel can be built offline from a config, so `convert_hf_gpt2`
+ our Flax GPT2 are checked against the real reference implementation the
reference repo uses (`summer_clip/clip_prompt/gpt.py` wraps
`GPT2LMHeadModel`), on random weights. Measured agreement: ~2e-7 relative.
"""

import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.full  # heavy tier: excluded from smoke (pytest -m "not full")

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _build_pair(cfg_name="test-gpt", seed=0):
    import jax.numpy as jnp  # noqa: F401

    from summer_clip_tpu.models.gpt2 import GPT2, GPT2_CONFIGS, convert_hf_gpt2

    cfg = GPT2_CONFIGS[cfg_name]
    hf = transformers.GPT2LMHeadModel(transformers.GPT2Config(
        vocab_size=cfg.vocab_size, n_positions=cfg.n_positions,
        n_embd=cfg.n_embd, n_layer=cfg.n_layer, n_head=cfg.n_head)).eval()
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in hf.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
    variables = convert_hf_gpt2(hf.state_dict(), cfg.n_layer)
    return cfg, hf, GPT2(cfg), variables


def test_logits_match_hf_reference():
    import jax.numpy as jnp

    cfg, hf, model, variables = _build_pair()
    ids = np.random.RandomState(0).randint(1, cfg.vocab_size, (3, 17))
    with torch.no_grad():
        hf_logits = hf(torch.from_numpy(ids)).logits.numpy()
    ours = np.asarray(model.apply(variables, jnp.asarray(ids))["logits"])
    rel = np.abs(ours - hf_logits).max() / np.abs(hf_logits).max()
    assert rel < 1e-5, rel


def test_weight_tying_matches_hf():
    """HF ties lm_head to wte; our GPT2 reuses the embedding table for the
    output projection — logits must reflect the SAME table.

    Also a regression test: convert_hf_gpt2 once returned numpy VIEWS of the
    torch storage, so the post-convert perturbation below silently landed
    twice on our side (caught by this test; converters now copy)."""
    import jax.numpy as jnp

    cfg, hf, model, variables = _build_pair(seed=1)
    assert hf.lm_head.weight.data_ptr() == hf.transformer.wte.weight.data_ptr()
    # perturb one embedding row on both sides identically -> logits stay equal
    with torch.no_grad():
        hf.transformer.wte.weight[7] += 0.5
    variables["params"]["wte"]["embedding"] = (
        np.asarray(variables["params"]["wte"]["embedding"]).copy())
    variables["params"]["wte"]["embedding"][7] += 0.5
    ids = np.random.RandomState(1).randint(1, cfg.vocab_size, (2, 9))
    with torch.no_grad():
        hf_logits = hf(torch.from_numpy(ids)).logits.numpy()
    ours = np.asarray(model.apply(variables, jnp.asarray(ids))["logits"])
    rel = np.abs(ours - hf_logits).max() / np.abs(hf_logits).max()
    assert rel < 1e-5, rel


def test_kv_cache_decode_matches_hf_full_context():
    """Our incremental KV-cache decode must equal HF's full-context forward
    position by position (greedy path of gen_gpt)."""
    import jax.numpy as jnp

    cfg, hf, model, variables = _build_pair(seed=2)
    ids = np.random.RandomState(2).randint(1, cfg.vocab_size, (2, 12))
    with torch.no_grad():
        hf_logits = hf(torch.from_numpy(ids)).logits.numpy()

    cache = model.apply(variables, 2, 24, method=model.init_cache)
    step_logits = []
    for t in range(ids.shape[1]):
        out = model.apply(variables, jnp.asarray(ids[:, t:t + 1]),
                          position_offset=t, cache=cache)
        cache = out["cache"]
        step_logits.append(np.asarray(out["logits"])[:, 0])
    ours = np.stack(step_logits, axis=1)
    rel = np.abs(ours - hf_logits).max() / np.abs(hf_logits).max()
    assert rel < 1e-4, rel
