"""Differentiable-camera pipeline tests (reference: exp/cips3d_inversion/
models/generator.py:1294-1540, tl2 cam_params usage in
exp/cips3d_inversion/scripts/train.py:310-329)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cips3d_tpu.models.camera import CamParams, axis_angle_to_matrix, pinhole_rays
from cips3d_tpu.models.generator import GeneratorConfig, sample_zs
from cips3d_tpu.models.generator_diffcam import GeneratorDiffcam, NerfKwargs

GCFG = GeneratorConfig(
    z_dim_nerf=16, z_dim_inr=32, nerf_hidden_dim=16, nerf_style_dim=16,
    nerf_mapping_layers=2, inr_hidden_dim=32, inr_style_dim=32, inr_mapping_layers=2,
)


class TestAxisAngle:
    def test_identity(self):
        R = axis_angle_to_matrix(jnp.zeros((2, 3)))
        np.testing.assert_allclose(np.asarray(R), np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-6)

    def test_quarter_turn_z(self):
        aa = jnp.array([[0.0, 0.0, math.pi / 2]])
        R = np.asarray(axis_angle_to_matrix(aa))[0]
        np.testing.assert_allclose(R @ np.array([1, 0, 0]), [0, 1, 0], atol=1e-6)

    def test_orthonormal(self, rng):
        aa = jax.random.normal(rng, (5, 3))
        R = np.asarray(axis_angle_to_matrix(aa))
        for i in range(5):
            np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-5)


class TestPinholeRays:
    def test_center_ray_looks_forward(self):
        rot = jnp.eye(3)[None]
        trans = jnp.zeros((1, 3))
        rays_o, rays_d = pinhole_rays(rot, trans, 35.0, 35.0, 5, 5)
        assert rays_o.shape == rays_d.shape == (1, 5, 5, 3)
        np.testing.assert_allclose(rays_d[0, 2, 2], [0, 0, -1], atol=1e-6)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(rays_d), axis=-1), 1.0, atol=1e-6)


class TestCamParams:
    def test_intrinsics_scale_with_resolution(self, rng):
        cam = CamParams(H0=64, W0=64, fov0=12.0)
        params = cam.init(rng, rng, 2, 8, 8, method=cam.get_rays_random_pose)
        fx64, _ = cam.apply(params, 64, 64, method=cam.intrinsics)
        fx128, _ = cam.apply(params, 128, 128, method=cam.intrinsics)
        np.testing.assert_allclose(np.asarray(fx128), 2 * np.asarray(fx64), rtol=1e-5)
        expected = 0.5 * 64 / math.tan(0.5 * math.radians(12.0))
        np.testing.assert_allclose(np.asarray(fx64), expected, rtol=1e-3)

    def test_random_pose_rays(self, rng):
        cam = CamParams(H0=32, W0=32)
        params = cam.init(rng, rng, 2, 8, 8, method=cam.get_rays_random_pose)
        rays_o, rays_d, pitch_yaw = cam.apply(
            params, rng, 2, 8, 8, method=cam.get_rays_random_pose
        )
        assert rays_o.shape == (2, 8, 8, 3)
        assert pitch_yaw.shape == (2, 2)
        # camera on unit sphere
        np.testing.assert_allclose(np.linalg.norm(np.asarray(rays_o[:, 0, 0]), axis=-1), 1.0, atol=1e-5)

    def test_learnable_extrinsics(self, rng):
        cam = CamParams(H0=16, W0=16, num_cams=3)
        idx = jnp.array([0, 2])
        params = cam.init(rng, idx, 8, 8)
        rays_o, rays_d = cam.apply(params, idx, 8, 8)
        assert rays_o.shape == (2, 8, 8, 3)
        # default trans (0,0,1)
        np.testing.assert_allclose(np.asarray(rays_o[0, 0, 0]), [0, 0, 1], atol=1e-6)


class TestGeneratorDiffcam:
    @pytest.fixture(scope="class")
    def setup(self):
        rng = jax.random.PRNGKey(0)
        gen = GeneratorDiffcam(cfg=GCFG)
        cam = CamParams(H0=8, W0=8)
        cam_params = cam.init(rng, rng, 2, 8, 8, method=cam.get_rays_random_pose)
        rays_o, rays_d, _ = cam.apply(cam_params, rng, 2, 8, 8, method=cam.get_rays_random_pose)
        zs = sample_zs(rng, 2, GCFG)
        nk = NerfKwargs(n_samples=3, n_importance=3)
        params = gen.init(rng, zs, rays_o, rays_d, rng, nk, method=gen.forward_rays)
        return gen, cam, params, cam_params, zs, nk, rays_o, rays_d

    def test_forward_rays(self, setup):
        gen, cam, params, cam_params, zs, nk, rays_o, rays_d = setup
        key = jax.random.PRNGKey(1)
        imgs, ret = gen.apply(
            params, zs, rays_o, rays_d, key, nk, return_aux_img=True, method=gen.forward_rays
        )
        assert imgs.shape == (2, 3, 8, 8)
        assert ret["aux_img"].shape == (2, 3, 8, 8)
        assert ret["depth"].shape == (2, 1, 8, 8)
        assert np.all(np.isfinite(np.asarray(imgs)))

    def test_grads_flow_to_camera(self, setup):
        """The whole point of diffcam: d(loss)/d(camera intrinsics) != 0."""
        gen, cam, params, cam_params, zs, nk, _, _ = setup
        key = jax.random.PRNGKey(2)

        def loss(cam_p):
            rays_o, rays_d, _ = cam.apply(cam_p, key, 2, 8, 8, method=cam.get_rays_random_pose)
            imgs, _ = gen.apply(params, zs, rays_o, rays_d, key, nk, method=gen.forward_rays)
            return jnp.sum(imgs ** 2)

        g = jax.grad(loss)(cam_params)
        total = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
        assert np.isfinite(total) and total > 0
