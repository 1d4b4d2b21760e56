"""Fused ResNet inference path vs the Flax oracle (CPU interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summer_clip_tpu.models.clip import init_clip
from summer_clip_tpu.models.clip.modeling import Bottleneck
from summer_clip_tpu.ops import resnet_infer as RI


class TestFusedBottleneck:
    @pytest.mark.parametrize("h,w,c_in,c_mid", [(8, 8, 32, 8), (6, 10, 16, 16)])
    def test_matches_flax_block(self, h, w, c_in, c_mid):
        block = Bottleneck(planes=c_mid, stride=1)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, h, w, c_in))
        # choose c_in == 4 * c_mid so no downsample branch exists
        if c_in != 4 * c_mid:
            pytest.skip("identity residual requires c_in == expansion * planes")
        variables = block.init(jax.random.PRNGKey(1), x)
        # randomize batch stats so BN folding is non-trivial
        stats = jax.tree_util.tree_map(
            lambda t: jnp.abs(jax.random.normal(jax.random.PRNGKey(2), t.shape)) + 0.5,
            variables["batch_stats"])
        variables = {"params": variables["params"], "batch_stats": stats}
        ref = block.apply(variables, x)

        p, s = variables["params"], variables["batch_stats"]
        w1, b1 = RI.fold_conv_bn(p["conv1"]["kernel"], p["bn1"], s["bn1"])
        w2, b2 = RI.fold_conv_bn(p["conv2"]["kernel"], p["bn2"], s["bn2"])
        w3, b3 = RI.fold_conv_bn(p["conv3"]["kernel"], p["bn3"], s["bn3"])
        got = RI.fused_bottleneck(
            x, w1.reshape(c_in, c_mid), b1, w2, b2,
            w3.reshape(c_mid, 4 * c_mid), b3, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-3, rtol=2e-3)


class TestFusedTower:
    def test_matches_flax_encode_image(self):
        model, cfg, variables = init_clip("test-rn")
        imgs = jax.random.normal(jax.random.PRNGKey(3),
                                 (2, cfg.image_resolution, cfg.image_resolution, 3))
        ref = model.apply(variables, imgs, method=model.encode_image)
        got = RI.fused_resnet_encode(
            variables, imgs, layers=tuple(cfg.vision_layers),
            num_heads=cfg.vision_heads, dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-3, rtol=5e-3)

    def test_xla_only_path_also_matches(self):
        model, cfg, variables = init_clip("test-rn")
        imgs = jax.random.normal(jax.random.PRNGKey(4),
                                 (1, cfg.image_resolution, cfg.image_resolution, 3))
        ref = model.apply(variables, imgs, method=model.encode_image)
        got = RI.fused_resnet_encode(
            variables, imgs, layers=tuple(cfg.vision_layers),
            num_heads=cfg.vision_heads, dtype=jnp.float32, use_pallas=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-3, rtol=5e-3)
