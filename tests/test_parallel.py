"""Multi-device tests on the 8-device virtual CPU mesh."""

import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.full  # heavy tier: excluded from smoke (pytest -m "not full")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summer_clip_tpu.ops.cache_kernels import cache_attention_reference
from summer_clip_tpu.parallel import (
    ShardedResidentCache, create_mesh, sharded_cache_logits, shard_batch, replicate,
)


class TestMesh:
    def test_create_mesh_shapes(self, devices8):
        mesh = create_mesh(data=4, model=2, devices=devices8)
        assert mesh.shape == {"data": 4, "model": 2}
        mesh2 = create_mesh(devices=devices8)
        assert mesh2.shape["data"] == 8

    def test_shard_and_replicate(self, devices8):
        mesh = create_mesh(data=8, model=1, devices=devices8)
        x = np.arange(32, dtype=np.float32).reshape(8, 4)
        xs = shard_batch(x, mesh)
        assert len(xs.sharding.device_set) == 8
        p = replicate({"w": np.ones((3,))}, mesh)
        np.testing.assert_array_equal(np.asarray(p["w"]), np.ones(3))


class TestShardedCache:
    def test_matches_dense_oracle(self, devices8):
        mesh = create_mesh(data=2, model=4, devices=devices8)
        rng = np.random.RandomState(0)
        nt, nc, d, c = 12, 37, 16, 5  # nc deliberately not divisible by 4
        f = rng.randn(nt, d).astype(np.float32)
        f /= np.linalg.norm(f, axis=1, keepdims=True)
        cache = rng.randn(nc, d).astype(np.float32)
        cache /= np.linalg.norm(cache, axis=1, keepdims=True)
        values = rng.randn(nc, c).astype(np.float32)
        betas = jnp.asarray([0.5, 5.5, 11.0])

        out = sharded_cache_logits(f, cache, values, betas, mesh, axis="model")
        ref = cache_attention_reference(jnp.asarray(f), jnp.asarray(cache),
                                        jnp.asarray(values), betas)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)

    def test_resident_cache_matches_dense_oracle(self, devices8):
        """Mask-selected resident shards == dense oracle on the compacted
        subset, for both value kinds, identity and strict-subset selection."""
        mesh = create_mesh(data=2, model=4, devices=devices8)
        rng = np.random.RandomState(2)
        nt, nc, d, c = 9, 37, 16, 5  # nc not divisible by 4 -> pad rows exist
        f = rng.randn(nt, d).astype(np.float32)
        f /= np.linalg.norm(f, axis=1, keepdims=True)
        cache = rng.randn(nc, d).astype(np.float32)
        outs = rng.randn(nc, c).astype(np.float32)
        cn = cache / np.linalg.norm(cache, axis=1, keepdims=True)
        betas = [0.5, 5.5]
        scale = 100.0 * 0.05

        resident = ShardedResidentCache(cache, outs, mesh, axis="model")
        assert resident.padded_rows % 4 == 0

        def softmax(x):
            e = np.exp(x - x.max(axis=1, keepdims=True))
            return e / e.sum(axis=1, keepdims=True)

        for inds in (np.arange(nc), np.asarray([1, 4, 9, 16, 25, 36])):
            hard = np.zeros((len(inds), c), np.float32)
            hard[np.arange(len(inds)), outs[inds].argmax(1)] = 1.0
            for kind, host_vals in (("hard", hard), ("softmax", softmax(scale * outs[inds]))):
                got = resident.logits(jnp.asarray(f), inds, betas, kind=kind, scale=scale)
                ref = cache_attention_reference(
                    jnp.asarray(f), jnp.asarray(cn[inds]), jnp.asarray(host_vals),
                    jnp.asarray(betas))
                np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                           atol=1e-4, rtol=1e-4)

    def test_pallas_interpret_through_shard_map(self, devices8):
        """The composition a pod would run — shard_map with the PALLAS kernel
        per shard — proven structurally on the virtual mesh via interpret mode
        (VERDICT r2 #5): must match the dense oracle, not just the XLA
        fallback path."""
        mesh = create_mesh(data=2, model=4, devices=devices8)
        rng = np.random.RandomState(3)
        nt, nc, d, c = 8, 37, 16, 5  # nc not divisible -> pad rows ride the kernel
        f = rng.randn(nt, d).astype(np.float32)
        f /= np.linalg.norm(f, axis=1, keepdims=True)
        cache = rng.randn(nc, d).astype(np.float32)
        cache /= np.linalg.norm(cache, axis=1, keepdims=True)
        values = rng.randn(nc, c).astype(np.float32)
        betas = jnp.asarray([0.5, 5.5])

        out = sharded_cache_logits(f, cache, values, betas, mesh, axis="model",
                                   impl="pallas")
        ref = cache_attention_reference(jnp.asarray(f), jnp.asarray(cache),
                                        jnp.asarray(values), betas)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)

    def test_resident_cache_pallas_interpret_shard_path(self, devices8):
        mesh = create_mesh(data=2, model=4, devices=devices8)
        rng = np.random.RandomState(4)
        nt, nc, d, c = 6, 21, 16, 4
        f = rng.randn(nt, d).astype(np.float32)
        f /= np.linalg.norm(f, axis=1, keepdims=True)
        cache = rng.randn(nc, d).astype(np.float32)
        outs = rng.randn(nc, c).astype(np.float32)
        cn = cache / np.linalg.norm(cache, axis=1, keepdims=True)
        betas = [1.0, 7.5]

        resident = ShardedResidentCache(cache, outs, mesh, axis="model", impl="pallas")
        inds = np.asarray([0, 2, 5, 9, 14, 20])
        got = resident.logits(jnp.asarray(f), inds, betas, kind="hard")
        hard = np.zeros((len(inds), c), np.float32)
        hard[np.arange(len(inds)), outs[inds].argmax(1)] = 1.0
        ref = cache_attention_reference(jnp.asarray(f), jnp.asarray(cn[inds]),
                                        jnp.asarray(hard), jnp.asarray(betas))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)

    def test_resident_cache_onehot_shard_path(self, devices8, monkeypatch):
        """The one-hot kernel INSIDE shard_map (per-shard labels + class
        tables, no value matrix anywhere) == dense oracle — the pod-scale
        composition of the structure-exploiting kernel, forced on via
        ONEHOT_FORCE (interpret kernels per shard)."""
        from summer_clip_tpu.ops import cache_kernels as ck

        monkeypatch.setattr(ck, "ONEHOT_FORCE", True)
        mesh = create_mesh(data=2, model=4, devices=devices8)
        rng = np.random.RandomState(5)
        nt, nc, d, c = 7, 43, 16, 6
        f = rng.randn(nt, d).astype(np.float32)
        f /= np.linalg.norm(f, axis=1, keepdims=True)
        cache = rng.randn(nc, d).astype(np.float32)
        outs = rng.randn(nc, c).astype(np.float32)
        cn = cache / np.linalg.norm(cache, axis=1, keepdims=True)
        betas = [0.5, 5.5, 11.0]

        resident = ShardedResidentCache(cache, outs, mesh, axis="model")
        for inds in (np.arange(nc), np.asarray([0, 3, 8, 15, 24, 35, 42])):
            got = resident.logits(jnp.asarray(f), inds, betas, kind="hard")
            hard = np.zeros((len(inds), c), np.float32)
            hard[np.arange(len(inds)), outs[inds].argmax(1)] = 1.0
            ref = cache_attention_reference(jnp.asarray(f), jnp.asarray(cn[inds]),
                                            jnp.asarray(hard), jnp.asarray(betas))
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-4, rtol=1e-4)

    def test_resident_cache_labels_dense_shard_path(self, devices8, monkeypatch):
        """Class-scattered residence (k_max > 128) must route to the
        label-built dense kernel INSIDE shard_map (no class tables, no value
        matrix) and still match the dense oracle."""
        from summer_clip_tpu.ops import cache_kernels as ck

        monkeypatch.setattr(ck, "ONEHOT_FORCE", True)
        mesh = create_mesh(data=2, model=4, devices=devices8)
        rng = np.random.RandomState(6)
        nt, nc, d, c = 5, 900, 16, 300
        f = rng.randn(nt, d).astype(np.float32)
        f /= np.linalg.norm(f, axis=1, keepdims=True)
        cache = rng.randn(nc, d).astype(np.float32)
        # outs whose argmax is 'preds': scattered so sorted blocks still
        # span ~300 distinct classes (every class has ~3 rows)
        preds = rng.randint(0, c, nc)
        outs = rng.randn(nc, c).astype(np.float32)
        outs[np.arange(nc), preds] += 10.0
        cn = cache / np.linalg.norm(cache, axis=1, keepdims=True)
        betas = [0.5, 5.5]

        resident = ShardedResidentCache(cache, outs, mesh, axis="model")
        assert resident._k_max > 128  # the scattered regime this test pins
        for inds in (np.arange(nc), np.asarray([0, 13, 88, 215, 514, 899])):
            got = resident.logits(jnp.asarray(f), inds, betas, kind="hard")
            hard = np.zeros((len(inds), c), np.float32)
            hard[np.arange(len(inds)), outs[inds].argmax(1)] = 1.0
            ref = cache_attention_reference(jnp.asarray(f), jnp.asarray(cn[inds]),
                                            jnp.asarray(hard), jnp.asarray(betas))
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-4, rtol=1e-4)

    def test_data_axis_sharding(self, devices8):
        mesh = create_mesh(data=8, model=1, devices=devices8)
        rng = np.random.RandomState(1)
        f = rng.randn(8, 8).astype(np.float32)
        cache = rng.randn(16, 8).astype(np.float32)
        values = rng.randn(16, 3).astype(np.float32)
        out = sharded_cache_logits(f, cache, values, [1.0], mesh, axis="data")
        ref = cache_attention_reference(*map(jnp.asarray, (f, cache, values)), jnp.asarray([1.0]))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


class TestPipelineParallel:
    """GPipe over the 'stage' axis (parallel/pp.py): staged block stack must
    equal the dense single-device model, forward AND gradients."""

    def _setup(self, devices8, n_stages=2):  # test-gpt has 2 layers
        import jax.numpy as jnp

        from summer_clip_tpu.models import gpt2 as G
        from summer_clip_tpu.parallel.pp import (
            shard_stacked_pp, stack_block_params, unstack_block_params,
        )

        mesh = create_mesh_named(devices8, n_stages)
        model, cfg = G.build_gpt2("test-gpt")
        ids = jax.random.randint(jax.random.PRNGKey(0), (4, 12), 1, cfg.vocab_size)
        params = model.init(jax.random.PRNGKey(1), ids)["params"]
        rest, stacked = stack_block_params(params, n_stages)
        # stack/unstack is a faithful round trip
        rt = unstack_block_params(rest, stacked)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            params, rt)
        stacked = shard_stacked_pp(stacked, mesh)
        return mesh, model, cfg, ids, params, rest, stacked

    def test_forward_matches_dense(self, devices8):
        from summer_clip_tpu.parallel.pp import pp_gpt2_forward

        mesh, model, cfg, ids, params, rest, stacked = self._setup(devices8)
        dense = model.apply({"params": params}, ids)["logits"]
        for m in (1, 2, 4):
            pp = pp_gpt2_forward(model, rest, stacked, ids, mesh,
                                 n_microbatches=m)
            np.testing.assert_allclose(np.asarray(pp), np.asarray(dense),
                                       atol=2e-4, rtol=2e-4)

    def test_dp_pp_composition_matches_dense(self, devices8):
        """('data', 'stage') mesh: batch sharded over data, each data row
        runs its own pipeline — forward and grads equal the dense model."""
        import jax.numpy as jnp
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from summer_clip_tpu.models import gpt2 as G
        from summer_clip_tpu.parallel.pp import (
            pp_gpt2_forward, stack_block_params,
        )

        mesh = Mesh(np.asarray(devices8).reshape(4, 2), ("data", "stage"))
        model, cfg = G.build_gpt2("test-gpt")
        ids = jax.random.randint(jax.random.PRNGKey(0), (8, 12), 1, cfg.vocab_size)
        params = model.init(jax.random.PRNGKey(1), ids)["params"]
        rest, stacked = stack_block_params(params, 2)
        stacked = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P("stage"))), stacked)
        ids_sharded = jax.device_put(ids, NamedSharding(mesh, P("data", None)))

        dense = model.apply({"params": params}, ids)["logits"]
        pp = pp_gpt2_forward(model, rest, stacked, ids_sharded, mesh,
                             n_microbatches=2, data_axis="data")
        np.testing.assert_allclose(np.asarray(pp), np.asarray(dense),
                                   atol=2e-4, rtol=2e-4)

        def dense_loss(p):
            lg = model.apply({"params": p}, ids)["logits"].astype(jnp.float32)
            return jnp.mean(jax.nn.logsumexp(lg, -1))

        def pp_loss(st):
            lg = pp_gpt2_forward(model, rest, st, ids_sharded, mesh,
                                 n_microbatches=2, data_axis="data")
            return jnp.mean(jax.nn.logsumexp(lg.astype(jnp.float32), -1))

        g_dense_stacked = stack_block_params(jax.grad(dense_loss)(params), 2)[1]
        g_pp = jax.grad(pp_loss)(stacked)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-3),
            g_dense_stacked, g_pp)

    def test_remat_pipeline_grads(self, devices8):
        """remat inside the staged chunk preserves gradients exactly."""
        import jax.numpy as jnp

        from summer_clip_tpu.parallel.pp import pipeline_blocks

        mesh, model, cfg, ids, params, rest, stacked = self._setup(devices8)
        x = jax.random.normal(jax.random.PRNGKey(3), (4, 12, cfg.n_embd))

        def loss(stacked_p, remat):
            y = pipeline_blocks(stacked_p, x, mesh, num_heads=cfg.n_head,
                                n_microbatches=2, remat=remat)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        g1 = jax.grad(lambda p: loss(p, False))(stacked)
        g2 = jax.grad(lambda p: loss(p, True))(stacked)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4), g1, g2)

    def test_grads_match_dense(self, devices8):
        import jax.numpy as jnp

        from summer_clip_tpu.parallel.pp import (
            pp_gpt2_forward, stack_block_params,
        )

        mesh, model, cfg, ids, params, rest, stacked = self._setup(devices8)

        def dense_loss(p):
            lg = model.apply({"params": p}, ids)["logits"].astype(jnp.float32)
            return jnp.mean(jax.nn.logsumexp(lg, -1))

        def pp_loss(rest_p, stacked_p):
            lg = pp_gpt2_forward(model, rest_p, stacked_p, ids, mesh,
                                 n_microbatches=2).astype(jnp.float32)
            return jnp.mean(jax.nn.logsumexp(lg, -1))

        g_dense = jax.grad(dense_loss)(params)
        g_rest, g_stacked = jax.grad(pp_loss, argnums=(0, 1))(rest, stacked)
        gd_rest, gd_stacked = stack_block_params(g_dense, mesh.shape["stage"])
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-3),
            gd_stacked, g_stacked)
        # embedding grad flows through both the input and the tied head
        np.testing.assert_allclose(
            np.asarray(gd_rest["wte"]["embedding"]),
            np.asarray(g_rest["wte"]["embedding"]), atol=2e-4, rtol=2e-3)


class TestScanForward:
    """Single-device scan-over-layers forwards (parallel/pp.py:scan_*):
    same math as the unrolled models, one block body in the HLO —
    the compile-time lever for gpt2-large on the tunneled chip."""

    def test_scan_gpt2_matches_dense(self):
        from summer_clip_tpu.models import gpt2 as G
        from summer_clip_tpu.parallel.pp import (
            scan_gpt2_forward, stack_block_params,
        )

        model, cfg = G.build_gpt2("test-gpt")
        ids = jax.random.randint(jax.random.PRNGKey(0), (4, 12), 1, cfg.vocab_size)
        params = model.init(jax.random.PRNGKey(1), ids)["params"]
        rest, stacked = stack_block_params(params, 1)
        dense = model.apply({"params": params}, ids)["logits"]
        for remat in (False, True):
            scan = scan_gpt2_forward(model, rest, stacked, ids, remat=remat)
            np.testing.assert_allclose(np.asarray(scan), np.asarray(dense),
                                       atol=2e-4, rtol=2e-4)

    def test_scan_gpt2_grads_match_dense(self):
        from summer_clip_tpu.models import gpt2 as G
        from summer_clip_tpu.parallel.pp import (
            scan_gpt2_forward, stack_block_params,
        )

        model, cfg = G.build_gpt2("test-gpt")
        ids = jax.random.randint(jax.random.PRNGKey(0), (2, 10), 1, cfg.vocab_size)
        params = model.init(jax.random.PRNGKey(1), ids)["params"]
        rest, stacked = stack_block_params(params, 1)

        def dense_loss(p):
            lg = model.apply({"params": p}, ids)["logits"].astype(jnp.float32)
            return jnp.mean(jax.nn.logsumexp(lg, -1))

        def scan_loss(rest_p, stacked_p):
            lg = scan_gpt2_forward(model, rest_p, stacked_p, ids, remat=True)
            return jnp.mean(jax.nn.logsumexp(lg.astype(jnp.float32), -1))

        g_dense = jax.grad(dense_loss)(params)
        g_rest, g_stacked = jax.grad(scan_loss, argnums=(0, 1))(rest, stacked)
        gd_rest, gd_stacked = stack_block_params(g_dense, 1)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-3),
            gd_stacked, g_stacked)
        np.testing.assert_allclose(
            np.asarray(gd_rest["wte"]["embedding"]),
            np.asarray(g_rest["wte"]["embedding"]), atol=2e-4, rtol=2e-3)

    def test_scan_clip_gpt_matches_dense(self):
        from summer_clip_tpu.models import gpt2 as G
        from summer_clip_tpu.parallel.pp import (
            scan_clip_gpt_forward, stack_block_params,
        )

        cfg = G.GPT2_CONFIGS["test-gpt"]
        for head_hid in (24, None):  # separate and shared head adapter
            model = G.ClipGPT(cfg, clip_vocab_size=64, clip_emb_dim=8,
                              emb_hid_dim=16, head_hid_dim=head_hid)
            ids = jax.random.randint(jax.random.PRNGKey(0), (3, 9), 1, 64)
            params = model.init(jax.random.PRNGKey(1), ids)["params"]
            rest, stacked = stack_block_params(params, 1)
            dense = model.apply({"params": params}, ids)["logits"]
            scan = scan_clip_gpt_forward(model, rest, stacked, ids)
            np.testing.assert_allclose(np.asarray(scan), np.asarray(dense),
                                       atol=2e-4, rtol=2e-4)


def create_mesh_named(devices8, n_stages):
    from jax.sharding import Mesh

    return Mesh(np.asarray(devices8[:n_stages]).reshape(n_stages), ("stage",))


class TestExpertParallel:
    """Switch-MoE MLP with experts sharded over an 'expert' axis
    (parallel/ep.py): EP path must equal the dense oracle, fwd + grads."""

    def _setup(self, devices8, e=8, d=16):
        import jax.numpy as jnp
        from jax.sharding import Mesh

        from summer_clip_tpu.parallel.ep import MoEMLP, shard_experts_ep

        mesh = Mesh(np.asarray(devices8[:8]).reshape(8), ("expert",))
        moe = MoEMLP(num_experts=e, hidden_mult=2)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 6, d))
        params = moe.init(jax.random.PRNGKey(1), x)["params"]
        return mesh, moe, x, params

    def test_ep_matches_dense(self, devices8):
        from summer_clip_tpu.parallel.ep import moe_apply_ep, shard_experts_ep

        mesh, moe, x, params = self._setup(devices8)
        dense = moe.apply({"params": params}, x)
        ep = moe_apply_ep(shard_experts_ep(params, mesh), x, mesh)
        np.testing.assert_allclose(np.asarray(ep), np.asarray(dense),
                                   atol=1e-5, rtol=1e-5)

    def test_ep_grads_match_dense(self, devices8):
        import jax.numpy as jnp

        from summer_clip_tpu.parallel.ep import moe_apply_ep, shard_experts_ep

        mesh, moe, x, params = self._setup(devices8)

        def dense_loss(p):
            return jnp.sum(moe.apply({"params": p}, x) ** 2)

        def ep_loss(p):
            return jnp.sum(moe_apply_ep(p, x, mesh) ** 2)

        g1 = jax.grad(dense_loss)(params)
        g2 = jax.grad(ep_loss)(shard_experts_ep(params, mesh))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4),
            g1, dict(g2))

    def test_every_token_served_once(self, devices8):
        """Top-1 routing with masked-psum EP: no token dropped, none
        double-counted — the routing one-hot sums to exactly 1 per token."""
        import jax.numpy as jnp

        from summer_clip_tpu.parallel.ep import _route

        mesh, moe, x, params = self._setup(devices8)
        x2 = np.asarray(x).reshape(-1, x.shape[-1])
        onehot, gate = _route(params, jnp.asarray(x2), jnp.float32)
        np.testing.assert_array_equal(np.asarray(onehot).sum(1), 1.0)
        assert (np.asarray(gate) > 0).all()


class TestGraftEntry:
    def test_dryrun_multichip_8(self, devices8):
        import sys
        from pathlib import Path
        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(8)


class TestMeshFeatureExtraction:
    def test_clip_session_dp_extraction(self, devices8):
        """Data-parallel encode over the 8-device mesh must match single-device."""
        from summer_clip_tpu.apps.common import ClipSession, extract_image_features
        from summer_clip_tpu.data.datasets import SyntheticDataset, SyntheticBatcher
        from summer_clip_tpu.models.clip import init_clip
        from summer_clip_tpu.parallel import create_mesh

        model, cfg, variables = init_clip("test-vit")
        mesh = create_mesh(data=8, model=1, devices=devices8)
        ds = SyntheticDataset(num_classes=2, per_class=8, image_size=cfg.image_resolution)

        session_mesh = ClipSession(model, cfg, variables, mesh=mesh)
        feats_m, labels_m, _ = extract_image_features(
            session_mesh, SyntheticBatcher(ds.test, batch_size=8, image_size=cfg.image_resolution))

        session_one = ClipSession(model, cfg, variables, mesh=None)
        feats_1, labels_1, _ = extract_image_features(
            session_one, SyntheticBatcher(ds.test, batch_size=8, image_size=cfg.image_resolution))

        np.testing.assert_array_equal(labels_m, labels_1)
        np.testing.assert_allclose(feats_m, feats_1, atol=1e-4, rtol=1e-4)

    def test_dp_extraction_with_fused_block_kernels(self, devices8):
        """The composition a TPU pod would run: DP mesh extraction with the
        fused Pallas block halves inside each shard (interpret mode off-TPU).
        Must match the single-device module path, not just compile."""
        import summer_clip_tpu.models.clip.modeling as M
        from summer_clip_tpu.apps.common import ClipSession, extract_image_features
        from summer_clip_tpu.data.datasets import SyntheticDataset, SyntheticBatcher
        from summer_clip_tpu.models.clip import init_clip
        from summer_clip_tpu.parallel import create_mesh

        model, cfg, variables = init_clip("test-vit")
        mesh = create_mesh(data=8, model=1, devices=devices8)
        ds = SyntheticDataset(num_classes=2, per_class=8, image_size=cfg.image_resolution)
        batcher = lambda: SyntheticBatcher(ds.test, batch_size=8,
                                           image_size=cfg.image_resolution)

        session_one = ClipSession(model, cfg, variables, mesh=None)
        feats_1, labels_1, _ = extract_image_features(session_one, batcher())

        old = M.FUSED_BLOCK_FORCE
        M.FUSED_BLOCK_FORCE = True
        try:
            session_mesh = ClipSession(model, cfg, variables, mesh=mesh)
            feats_m, labels_m, _ = extract_image_features(session_mesh, batcher())
        finally:
            M.FUSED_BLOCK_FORCE = old

        np.testing.assert_array_equal(labels_m, labels_1)
        np.testing.assert_allclose(feats_m, feats_1, atol=1e-4, rtol=1e-4)


class TestFSDP:
    """ZeRO-3 placement (parallel/fsdp.py): spec choices, shard sizes, and
    a jitted train step that matches the replicated one bit-for-bit math."""

    def test_spec_picks_largest_free_divisible_axis(self):
        from jax.sharding import PartitionSpec as P

        from summer_clip_tpu.parallel import fsdp_spec

        class Leaf:
            def __init__(self, *shape):
                self.shape = shape

        # plain kernel: largest axis sharded over data
        assert fsdp_spec(Leaf(64, 256), 8, min_elems=0) == P(None, "data")
        assert fsdp_spec(Leaf(512, 32), 8, min_elems=0) == P("data", None)
        # Megatron-claimed axis is respected; FSDP takes the free one
        assert fsdp_spec(Leaf(64, 256), 8, base=P(None, "model"),
                         min_elems=0) == P("data", "model")
        assert fsdp_spec(Leaf(256, 64), 8, base=P("model", None),
                         min_elems=0) == P("model", "data")
        # small tensors stay replicated (min_elems gate)
        assert fsdp_spec(Leaf(64,), 8) == P()
        # nothing divisible -> replicated
        assert fsdp_spec(Leaf(63, 1025), 8, min_elems=0) == P()

    def test_shards_cut_memory_and_step_matches_replicated(self, devices8):
        import jax
        import jax.numpy as jnp
        import optax

        from summer_clip_tpu.models import gpt2 as gpt2_mod
        from summer_clip_tpu.parallel import create_mesh, replicate, shard_batch, shard_params_fsdp

        model, cfg = gpt2_mod.build_gpt2("test-gpt")
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 8), jnp.int32))["params"]
        mesh = create_mesh(data=8, model=1, devices=devices8)
        fs = shard_params_fsdp(params, mesh, min_elems=0)

        # every divisible kernel is actually cut 8-ways
        wte = fs["wte"]["embedding"]  # (512, 32) -> data on axis 0
        assert wte.addressable_shards[0].data.shape[0] == wte.shape[0] // 8
        cut = [l for l in jax.tree_util.tree_leaves(fs)
               if l.addressable_shards[0].data.size < l.size]
        assert len(cut) >= 10

        # sgd keeps the update linear in the grad, so the only divergence
        # from the replicated run is f32 reduction order (adam's g/sqrt(v)
        # normalization would amplify that noise on near-zero grads; the
        # adamw path is covered by the e2e loss-curve test)
        tx = optax.sgd(1e-2)
        ids = np.tile(np.arange(16, dtype=np.int32), (8, 1))

        def loss_of(p, batch):
            logits = model.apply({"params": p}, batch)["logits"]
            tgt = jnp.take_along_axis(logits[:, :-1], batch[:, 1:, None],
                                      axis=-1)[..., 0]
            return (jax.scipy.special.logsumexp(logits[:, :-1], axis=-1) - tgt).mean()

        @jax.jit
        def step(p, s, batch):
            loss, g = jax.value_and_grad(loss_of)(p, batch)
            up, s = tx.update(g, s, p)
            return optax.apply_updates(p, up), s, loss

        # FSDP run
        s_fs = tx.init(fs)
        p1, _, l1 = step(fs, s_fs, shard_batch(jnp.asarray(ids), mesh))
        # replicated run
        rep = replicate(params, mesh)
        s_rep = tx.init(rep)
        p2, _, l2 = step(rep, s_rep, shard_batch(jnp.asarray(ids), mesh))

        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
        a = jax.tree_util.tree_leaves(p1)
        b = jax.tree_util.tree_leaves(p2)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=1e-6, rtol=1e-6)


class TestTPDecode:
    """Megatron-TP KV-cached decode (parallel/tp.py:shard_decode_tp +
    gen_gpt mesh kwarg): committed placements must leave the decoded ids
    exactly equal to the single-device program (greedy — sharded psums
    reorder float adds, so argmax, not sampled, is the pinned contract)."""

    def test_tp_decode_matches_single_device(self, devices8):
        from summer_clip_tpu.apps.gen_gpt import generate_device
        from summer_clip_tpu.models import gpt2 as gpt2_mod
        from summer_clip_tpu.parallel import create_mesh

        cfg = gpt2_mod.GPT2_CONFIGS["test-gpt"]
        model = gpt2_mod.GPT2(cfg)
        variables = {"params": jax.jit(model.init)(
            jax.random.PRNGKey(0), np.zeros((1, 4), np.int32))["params"]}
        prompt = [3, 14, 15, 2]
        solo = generate_device(model, variables, prompt, max_new_tokens=10,
                               top_k=1, rng=jax.random.PRNGKey(5))
        mesh = create_mesh(data=1, model=2, devices=devices8[:2])
        tp = generate_device(model, variables, prompt, max_new_tokens=10,
                             top_k=1, rng=jax.random.PRNGKey(5), mesh=mesh)
        assert tp == solo

    def test_tp_decode_clip_gpt_batched(self, devices8):
        """ClipGPT (adapters replicated, tower TP-sharded) through the
        batched serving sampler over a model=2 mesh == unsharded."""
        from summer_clip_tpu.apps.gen_gpt import generate_device_batched
        from summer_clip_tpu.models import gpt2 as gpt2_mod
        from summer_clip_tpu.parallel import create_mesh

        cfg = gpt2_mod.GPT2_CONFIGS["test-gpt"]
        model = gpt2_mod.ClipGPT(cfg, clip_vocab_size=64, clip_emb_dim=16,
                                 emb_hid_dim=16, head_hid_dim=16)
        variables = {"params": jax.jit(model.init)(
            jax.random.PRNGKey(0), np.zeros((1, 4), np.int32))["params"]}
        prompts = [[3, 14, 15], [9, 2, 6, 5, 3], [11]]
        solo = generate_device_batched(
            model, variables, prompts, max_new_tokens=8, top_k=1,
            rng=jax.random.PRNGKey(7), eot_id=7)
        mesh = create_mesh(data=1, model=2, devices=devices8[:2])
        tp = generate_device_batched(
            model, variables, prompts, max_new_tokens=8, top_k=1,
            rng=jax.random.PRNGKey(7), eot_id=7, mesh=mesh)
        assert tp == solo

class TestTPInt8Decode:
    """int8 x Megatron-TP (parallel/tp_int8.py, round 5 — lifts the round-4
    refusal): the shard_map decoder streams each chip's int8 shard through
    the GEMV with psums after the row-parallel matmuls, and greedy ids must
    equal the single-device int8 program exactly."""

    def _int8_gpt(self):
        from summer_clip_tpu.engine.quant import quantize_tree
        from summer_clip_tpu.models import gpt2 as gpt2_mod

        cfg = gpt2_mod.GPT2_CONFIGS["test-gpt"]
        model = gpt2_mod.GPT2(cfg)
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     np.zeros((1, 4), np.int32))["params"]
        return model, cfg, {"params": quantize_tree(params)}

    def test_tp_int8_matches_single_device(self, devices8):
        from summer_clip_tpu.apps.gen_gpt import generate_device
        from summer_clip_tpu.parallel import create_mesh

        model, cfg, variables = self._int8_gpt()
        prompt = [3, 14, 15, 2]
        solo = generate_device(model, variables, prompt, max_new_tokens=10,
                               top_k=1, quant_int8=True,
                               rng=jax.random.PRNGKey(5))
        mesh = create_mesh(data=1, model=2, devices=devices8[:2])
        tp = generate_device(model, variables, prompt, max_new_tokens=10,
                             top_k=1, quant_int8=True,
                             rng=jax.random.PRNGKey(5), mesh=mesh)
        assert tp == solo

    def test_tp_int8_batched_key_pad(self, devices8):
        """Variable-length prompts through the batched sampler: the sharded
        decoder's key_pad/per-row-offset handling must match unsharded."""
        from summer_clip_tpu.apps.gen_gpt import generate_device_batched
        from summer_clip_tpu.parallel import create_mesh

        model, cfg, variables = self._int8_gpt()
        prompts = [[3, 14, 15], [9, 2, 6, 5, 3], [11]]
        solo = generate_device_batched(
            model, variables, prompts, max_new_tokens=8, top_k=1,
            quant_int8=True, rng=jax.random.PRNGKey(7), eot_id=7)
        mesh = create_mesh(data=1, model=2, devices=devices8[:2])
        tp = generate_device_batched(
            model, variables, prompts, max_new_tokens=8, top_k=1,
            quant_int8=True, rng=jax.random.PRNGKey(7), eot_id=7, mesh=mesh)
        assert tp == solo

    def test_tp_int8_clip_gpt(self, devices8):
        """ClipGPT: adapters/embeddings replicated, tower int8-sharded."""
        from summer_clip_tpu.apps.gen_gpt import generate_device
        from summer_clip_tpu.engine.quant import quantize_tree
        from summer_clip_tpu.models import gpt2 as gpt2_mod
        from summer_clip_tpu.parallel import create_mesh

        cfg = gpt2_mod.GPT2_CONFIGS["test-gpt"]
        model = gpt2_mod.ClipGPT(cfg, clip_vocab_size=64, clip_emb_dim=16,
                                 emb_hid_dim=16, head_hid_dim=16)
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     np.zeros((1, 4), np.int32))["params"]
        variables = {"params": quantize_tree(params)}
        prompt = [3, 14, 15, 2]
        solo = generate_device(model, variables, prompt, max_new_tokens=8,
                               top_k=1, quant_int8=True,
                               rng=jax.random.PRNGKey(5))
        mesh = create_mesh(data=1, model=2, devices=devices8[:2])
        tp = generate_device(model, variables, prompt, max_new_tokens=8,
                             top_k=1, quant_int8=True,
                             rng=jax.random.PRNGKey(5), mesh=mesh)
        assert tp == solo

    def test_tp_int8_serving_engine(self, devices8):
        """The engine's per-row cache rings + wave dispatch through the
        sharded int8 decoder: greedy per-request ids == the solo int8
        sampler (the round-4 assert this composition replaces)."""
        from summer_clip_tpu.apps.gen_gpt import generate_device
        from summer_clip_tpu.engine.serving import ContinuousBatcher
        from summer_clip_tpu.parallel import create_mesh

        model, cfg, variables = self._int8_gpt()
        mesh = create_mesh(data=1, model=2, devices=devices8[:2])
        rng = np.random.RandomState(0)
        prompts = [list(rng.randint(1, cfg.vocab_size, n)) for n in (3, 5)]
        eng = ContinuousBatcher(model, variables, batch_slots=2, max_len=48,
                                greedy=True, quant_int8=True, mesh=mesh,
                                burst=4, pipeline=2)
        reqs = [eng.submit(p, max_new_tokens=6) for p in prompts]
        eng.run()
        for p, r in zip(prompts, reqs):
            solo = generate_device(model, variables, p, max_new_tokens=6,
                                   temperature=1.0, top_k=1, quant_int8=True,
                                   rng=jax.random.PRNGKey(7))
            assert r.out_ids == solo[len(p):], p
