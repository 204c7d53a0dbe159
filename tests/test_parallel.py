"""Multi-device sharding tests on the simulated 8-device CPU mesh.

Validates the DDP-analogue layout (reference: exp/cips3d/scripts/train.py
DDP setup at :41-53,235-236): params replicated, batch sharded over 'data',
gradients all-reduced by XLA over the mesh.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cips3d_tpu.models.discriminator import DiscriminatorMultiScaleAux
from cips3d_tpu.models.generator import GeneratorConfig, GeneratorNerfINR, RenderOptions
from cips3d_tpu.parallel.mesh import make_mesh, replicated, shard_batch, shard_train_step
from cips3d_tpu.train.state import TrainConfig
from cips3d_tpu.train.step import init_train_state, make_train_step

TINY = {r: 16 for r in (4, 8, 16, 32, 64, 128, 256, 512, 1024)}
GCFG = GeneratorConfig(
    z_dim_nerf=16, z_dim_inr=32, nerf_hidden_dim=16, nerf_style_dim=16,
    nerf_mapping_layers=2, inr_hidden_dim=32, inr_style_dim=32, inr_mapping_layers=2,
)
OPTS = RenderOptions(img_size=8, num_steps=3)


class TestMesh:
    def test_make_mesh(self):
        mesh = make_mesh(4)
        assert mesh.devices.shape == (4,)
        assert mesh.axis_names == ("data",)

    def test_2d_mesh(self):
        mesh = make_mesh(8, axis_names=("data", "rays"), shape=(2, 4))
        assert mesh.devices.shape == (2, 4)

    def test_shard_batch_layout(self):
        mesh = make_mesh(4)
        x = jnp.arange(4 * 3, dtype=jnp.float32).reshape(4, 3)
        with mesh:
            sx = shard_batch(x, mesh)
        assert len(sx.addressable_shards) == 4
        np.testing.assert_allclose(np.asarray(sx), np.asarray(x))


class TestRaySharding:
    """Pixel/ray-axis sharded rendering (SURVEY §2.6 ray-axis row): the
    same render over an 8-way mesh must equal the 1-device run — rays are
    independent, so partitioning changes nothing but the layout."""

    def test_render_sharded_matches_single_device(self):
        from cips3d_tpu.apps.render import render_sharded
        from cips3d_tpu.models.generator import sample_zs

        gen = GeneratorNerfINR(cfg=GCFG)
        key = jax.random.PRNGKey(0)
        zs = sample_zs(jax.random.PRNGKey(1), 2, GCFG)
        params = gen.init(key, zs, key, OPTS)
        styles = gen.apply(params, zs["z_nerf"], zs["z_inr"], method=gen.mapping)

        cam = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (2, 1))
        look = -cam
        kw = dict(camera_pos=cam, camera_lookup=look, return_depth=True)
        img8, d8 = render_sharded(
            params, gen, styles, OPTS, key, make_mesh(8), **kw
        )
        img1, d1 = render_sharded(
            params, gen, styles, OPTS, key, make_mesh(1), **kw
        )
        assert img8.shape == (2, 3, 8, 8) and d8.shape == (2, 1, 8, 8)
        np.testing.assert_allclose(np.asarray(img8), np.asarray(img1), atol=1e-5)
        np.testing.assert_allclose(np.asarray(d8), np.asarray(d1), atol=1e-5)

    def test_render_sharded_fused_kernels(self):
        """The serving defaults (fused_ray + fused_inr) through the
        pixel-sharded mesh: render_sharded activates a batch-unsharded
        pixel scope so the Mosaic kernels are shard_map-wrapped (GSPMD
        cannot auto-partition them on real multi-chip TPU).  8-way shard
        must equal the single-device run."""
        from cips3d_tpu.apps.render import render_sharded
        from cips3d_tpu.models.generator import sample_zs

        cfg = dataclasses.replace(GCFG, fused_ray=True, fused_inr=True)
        gen = GeneratorNerfINR(cfg=cfg)
        key = jax.random.PRNGKey(0)
        zs = sample_zs(jax.random.PRNGKey(1), 2, cfg)
        params = gen.init(key, zs, key, OPTS)
        styles = gen.apply(params, zs["z_nerf"], zs["z_inr"], method=gen.mapping)

        cam = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (2, 1))
        kw = dict(camera_pos=cam, camera_lookup=-cam)
        img8 = render_sharded(params, gen, styles, OPTS, key, make_mesh(8), **kw)
        img1 = render_sharded(params, gen, styles, OPTS, key, make_mesh(1), **kw)
        assert img8.shape == (2, 3, 8, 8)
        np.testing.assert_allclose(np.asarray(img8), np.asarray(img1), atol=1e-5)

    def test_render_sharded_rays_axis_of_2d_mesh(self):
        from cips3d_tpu.apps.render import render_sharded
        from cips3d_tpu.models.generator import sample_zs

        gen = GeneratorNerfINR(cfg=GCFG)
        key = jax.random.PRNGKey(0)
        zs = sample_zs(jax.random.PRNGKey(1), 2, GCFG)
        params = gen.init(key, zs, key, OPTS)
        styles = gen.apply(params, zs["z_nerf"], zs["z_inr"], method=gen.mapping)
        mesh = make_mesh(8, axis_names=("data", "rays"), shape=(2, 4))
        img = render_sharded(params, gen, styles, OPTS, key, mesh)
        assert img.shape == (2, 3, 8, 8)
        assert np.isfinite(np.asarray(img)).all()


class TestShardedTrainStep:
    @pytest.fixture(scope="class")
    def setup(self):
        gen = GeneratorNerfINR(cfg=GCFG)
        disc = DiscriminatorMultiScaleAux(max_size=16, channels_override=TINY)
        cfg = TrainConfig(img_size=8, batch_size=1, grad_points=None)
        key = jax.random.PRNGKey(0)
        state = init_train_state(key, gen, disc, cfg, OPTS)
        return gen, disc, cfg, state

    def test_four_device_step(self, setup):
        gen, disc, cfg, state = setup
        mesh = make_mesh(4)
        step = shard_train_step(make_train_step(gen, disc, cfg, OPTS, aux_reg=False), mesh)
        batch = jax.random.uniform(jax.random.PRNGKey(1), (4, 3, 8, 8)) * 2 - 1
        with mesh:
            state_r = jax.device_put(state, replicated(mesh))
            b = shard_batch(batch, mesh)
            new_state, metrics = step(state_r, b, jax.random.PRNGKey(2))
        assert int(new_state.step) == 1
        assert np.isfinite(float(metrics["d_loss"]))
        assert np.isfinite(float(metrics["g_loss"]))
        # updated params stay replicated across the mesh
        leaf = jax.tree_util.tree_leaves(new_state.g_params)[0]
        assert len({s.device.id for s in leaf.addressable_shards}) == 4

    def test_2d_mesh_step_matches_1d(self, setup):
        """(data=2, rays=4) mesh with the pixel axis sharded inside
        points_forward (incl. the grad_points gather) must reproduce the
        1-device step — rays are pointwise-parallel, so partitioning is
        layout-only.  Aux on exercises the fake-batch doubling + joint
        (data, rays) reshard in front of D."""
        from cips3d_tpu.parallel.mesh import (
            pixel_sharding_scope,
            shard_joint_batch,
            shard_train_step_2d,
        )

        gen, disc, _, _ = setup
        cfg = TrainConfig(img_size=8, batch_size=8, grad_points=4)  # 16 of 64 px
        key = jax.random.PRNGKey(0)
        state = init_train_state(key, gen, disc, cfg, OPTS)
        batch = jax.random.uniform(jax.random.PRNGKey(1), (8, 3, 8, 8)) * 2 - 1
        step_key = jax.random.PRNGKey(2)

        step_fn = make_train_step(gen, disc, cfg, OPTS, aux_reg=True)

        mesh1 = make_mesh(1)
        with mesh1:
            s1 = jax.device_put(state, replicated(mesh1))
            ref_state, ref_metrics = jax.jit(step_fn, donate_argnums=(0,))(
                s1, batch, step_key
            )
        ref_metrics = {k: float(v) for k, v in ref_metrics.items()}

        mesh = make_mesh(8, axis_names=("data", "rays"), shape=(2, 4))
        state2 = init_train_state(key, gen, disc, cfg, OPTS)
        with pixel_sharding_scope(mesh):
            step = shard_train_step_2d(step_fn, mesh)
            with mesh:
                s2 = jax.device_put(state2, replicated(mesh))
                b = shard_joint_batch(np.asarray(batch), mesh)
                new_state, metrics = step(s2, b, step_key)
        for k, v in ref_metrics.items():
            np.testing.assert_allclose(float(metrics[k]), v, rtol=2e-3, atol=2e-4,
                                       err_msg=f"metric {k}")
        ref_leaf = np.asarray(jax.tree_util.tree_leaves(ref_state.g_params)[0])
        new_leaf = np.asarray(jax.tree_util.tree_leaves(new_state.g_params)[0])
        np.testing.assert_allclose(new_leaf, ref_leaf, rtol=1e-3, atol=1e-4)

    def test_fused_ray_step_matches_under_mesh(self, setup):
        """The fused ray-tile kernel (both VJP implementations) running
        under the data mesh reproduces the single-device XLA step —
        prerequisite for flipping any fused variant to a multi-chip
        training default."""
        gen, disc, _, _ = setup
        cfg = TrainConfig(img_size=8, batch_size=4, grad_points=None)
        key = jax.random.PRNGKey(0)
        step_key = jax.random.PRNGKey(2)
        batch = jax.random.uniform(jax.random.PRNGKey(1), (4, 3, 8, 8)) * 2 - 1

        mesh1 = make_mesh(1)
        state = init_train_state(key, gen, disc, cfg, OPTS)
        with mesh1:
            s1 = jax.device_put(state, replicated(mesh1))
            _, ref = jax.jit(
                make_train_step(gen, disc, cfg, OPTS, aux_reg=False),
                donate_argnums=(0,),
            )(s1, batch, step_key)
        ref = {k: float(v) for k, v in ref.items()}

        from cips3d_tpu.parallel.mesh import pixel_sharding_scope

        mesh = make_mesh(4)
        for impl in ("pallas", "pallas_residual"):
            gen_f = GeneratorNerfINR(
                cfg=dataclasses.replace(GCFG, fused_ray=True, fused_ray_vjp=impl)
            )
            state_f = init_train_state(key, gen_f, disc, cfg, OPTS)
            # The 1-D scope (rays_axis=None) routes the Pallas calls through
            # pixel_shard_map — mandatory on real multi-chip TPU, where
            # GSPMD cannot auto-partition Mosaic custom calls.
            with pixel_sharding_scope(mesh, rays_axis=None):
                step = shard_train_step(
                    make_train_step(gen_f, disc, cfg, OPTS, aux_reg=False), mesh
                )
                with mesh:
                    s4 = jax.device_put(state_f, replicated(mesh))
                    b = shard_batch(np.asarray(batch), mesh)
                    _, metrics = step(s4, b, step_key)
            for k in ("d_loss", "g_loss", "d_logits_fake"):
                np.testing.assert_allclose(
                    float(metrics[k]), ref[k], rtol=3e-3, atol=3e-4,
                    err_msg=f"{impl}: metric {k}",
                )

    def test_graft_dryrun(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)
