"""Int8 MXU inference path (ops/int8.py + build_clip(quant='int8')).

The None path must be BIT-identical to the nn.Dense/nn.Conv modules it
replaces (the towers' default path must not move); the int8 path must stay
within dynamic-quantization error of the f32 math and produce features
whose zero-shot behavior matches the full-precision tower.
"""

import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.full  # heavy tier: excluded from smoke (pytest -m "not full")

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from summer_clip_tpu.models.clip import build_clip, init_clip
from summer_clip_tpu.ops.int8 import (
    QuantConv, QuantDense, int8_dense, quantize_cols, quantize_rows,
)


def test_quantize_roundtrip_error_bounds():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(16, 64).astype(np.float32))
    q, s = quantize_rows(x)
    assert q.dtype == jnp.int8
    deq = q.astype(jnp.float32) * s
    # symmetric 127-level quant: elementwise error <= scale/2 per row
    assert float(jnp.max(jnp.abs(deq - x) / s)) <= 0.5 + 1e-6
    w = jnp.asarray(rng.randn(64, 32).astype(np.float32))
    qw, sw = quantize_cols(w)
    deqw = qw.astype(jnp.float32) * sw
    assert float(jnp.max(jnp.abs(deqw - w) / sw)) <= 0.5 + 1e-6


def test_int8_dense_matches_f32_oracle():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(128, 256).astype(np.float32))
    w = jnp.asarray(rng.randn(256, 64).astype(np.float32))
    b = jnp.asarray(rng.randn(64).astype(np.float32))
    got = int8_dense(x, w, b, out_dtype=jnp.float32)
    want = x @ w + b
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 0.02, rel


def test_int8_dense_batched_shape():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(4, 7, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(32, 16).astype(np.float32))
    out = int8_dense(x, w, None, out_dtype=jnp.bfloat16)
    assert out.shape == (4, 7, 16) and out.dtype == jnp.bfloat16


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_quant_dense_none_bitmatches_nn_dense(dtype):
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(8, 24).astype(np.float32))
    ref = nn.Dense(12, dtype=dtype)
    var = ref.init(jax.random.PRNGKey(0), x)
    ours = QuantDense(12, quant=None, dtype=dtype)
    got = ours.apply(var, x)  # same param tree: kernel/bias
    want = ref.apply(var, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("ksize,stride,pad", [(1, 1, 0), (3, 1, 1), (3, 2, 1)])
def test_quant_conv_none_bitmatches_nn_conv(ksize, stride, pad):
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 8, 8, 6).astype(np.float32))
    ref = nn.Conv(10, (ksize, ksize), strides=stride, padding=pad, use_bias=False)
    var = ref.init(jax.random.PRNGKey(0), x)
    ours = QuantConv(10, (ksize, ksize), strides=(stride, stride), padding=pad)
    got = ours.apply(var, x)
    want = ref.apply(var, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_quant_conv_int8_matches_f32_oracle():
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    mod = QuantConv(8, (3, 3), padding=1, quant="int8", dtype=jnp.float32)
    var = mod.init(jax.random.PRNGKey(0), x)
    got = mod.apply(var, x)
    want = QuantConv(8, (3, 3), padding=1).apply(var, x)
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 0.03, rel


@pytest.mark.parametrize("name", ["test-vit", "test-rn"])
def test_int8_tower_param_tree_identical_and_features_close(name):
    """quant='int8' shares the param tree with the default tower (same
    checkpoints) and its normalized features stay close to f32's."""
    model, cfg, variables = init_clip(name, jax.random.PRNGKey(0))
    qmodel, _ = build_clip(name, quant="int8")
    qvars = jax.jit(qmodel.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3), jnp.float32),
        jnp.zeros((1, cfg.context_length), jnp.int32))
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(qvars))

    rng = np.random.RandomState(6)
    images = jnp.asarray(rng.rand(4, cfg.image_resolution, cfg.image_resolution, 3)
                         .astype(np.float32))
    f = model.apply(variables, images, method=model.encode_image)
    q = qmodel.apply(variables, images, method=qmodel.encode_image)
    fn = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
    qn = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    cos = np.asarray(jnp.sum(fn * qn, axis=-1))
    assert cos.min() > 0.98, cos

    tokens = jnp.asarray(rng.randint(1, cfg.vocab_size, (3, cfg.context_length)))
    t = model.apply(variables, tokens, method=model.encode_text)
    qt = qmodel.apply(variables, tokens, method=qmodel.encode_text)
    tn = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
    qtn = qt / jnp.linalg.norm(qt, axis=-1, keepdims=True)
    cos_t = np.asarray(jnp.sum(tn * qtn, axis=-1))
    assert cos_t.min() > 0.98, cos_t


def test_int8_zeroshot_argmax_agreement():
    """End-to-end proxy for accuracy drift: zero-shot argmax over a synthetic
    classifier agrees between the int8 and f32 towers."""
    model, cfg, variables = init_clip("test-vit", jax.random.PRNGKey(1))
    qmodel, _ = build_clip("test-vit", quant="int8")
    rng = np.random.RandomState(7)
    images = jnp.asarray(rng.rand(16, cfg.image_resolution, cfg.image_resolution, 3)
                         .astype(np.float32))
    classifier = jnp.asarray(rng.randn(cfg.embed_dim, 10).astype(np.float32))
    classifier = classifier / jnp.linalg.norm(classifier, axis=0, keepdims=True)

    def logits(m):
        f = m.apply(variables, images, method=m.encode_image)
        f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
        return 100.0 * f @ classifier

    a = np.asarray(jnp.argmax(logits(model), -1))
    b = np.asarray(jnp.argmax(logits(qmodel), -1))
    # tiny random towers have near-degenerate logit gaps; require >=80%
    # agreement (real towers with real margins do far better — the on-chip
    # drift measurement lives in tools/bench_int8_mxu.py / KERNELS.md)
    assert (a == b).mean() >= 0.8, (a, b)
