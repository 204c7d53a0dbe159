"""Golden-value and property tests for cips3d_tpu.core.rays.

The reference semantics live at exp/comm/comm_utils.py:365-763; the golden
values here were hand-derived from the published math (pinhole NDC grid,
look-at matrix, sphere parameterization).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cips3d_tpu.core import rays


class TestInitialRays:
    def test_shapes(self):
        pts, z_vals, dirs = rays.get_initial_rays_trig(
            num_steps=12, fov=12, resolution=(8, 8), ray_start=0.88, ray_end=1.12
        )
        assert pts.shape == (64, 12, 3)
        assert z_vals.shape == (64, 12, 1)
        assert dirs.shape == (64, 3)

    def test_directions_normalized(self):
        _, _, dirs = rays.get_initial_rays_trig(
            num_steps=4, fov=12, resolution=(5, 5), ray_start=0.5, ray_end=1.5
        )
        np.testing.assert_allclose(jnp.linalg.norm(dirs, axis=-1), 1.0, atol=1e-6)

    def test_pixel_grid_layout(self):
        """Row 0 has y=+1 (top), col 0 has x=-1; z = -1/tan(fov/2)."""
        _, _, dirs = rays.get_initial_rays_trig(
            num_steps=2, fov=90, resolution=(3, 3), ray_start=0.5, ray_end=1.5
        )
        d = np.asarray(dirs).reshape(3, 3, 3)
        # fov=90deg -> z = -1/tan(45deg) = -1.
        # top-left pixel: (x, y, z) = (-1, 1, -1) normalized.
        expected = np.array([-1.0, 1.0, -1.0]) / math.sqrt(3)
        np.testing.assert_allclose(d[0, 0], expected, atol=1e-6)
        # center pixel: (0, 0, -1)
        np.testing.assert_allclose(d[1, 1], [0, 0, -1], atol=1e-6)
        # bottom-right: (1, -1, -1)/sqrt(3)
        np.testing.assert_allclose(d[2, 2], np.array([1.0, -1.0, -1.0]) / math.sqrt(3), atol=1e-6)

    def test_z_vals_linspace(self):
        _, z_vals, _ = rays.get_initial_rays_trig(
            num_steps=3, fov=12, resolution=(2, 2), ray_start=1.0, ray_end=2.0
        )
        np.testing.assert_allclose(z_vals[0, :, 0], [1.0, 1.5, 2.0], atol=1e-6)


class TestPerturbPoints:
    def test_offset_bounds_and_consistency(self, rng):
        pts, z_vals, dirs = rays.get_initial_rays_trig(
            num_steps=8, fov=12, resolution=(4, 4), ray_start=0.88, ray_end=1.12
        )
        pts, z_vals, dirs = pts[None], z_vals[None], dirs[None]
        spacing = float(z_vals[0, 0, 1, 0] - z_vals[0, 0, 0, 0])
        p2, z2 = rays.perturb_points(rng, pts, z_vals, dirs)
        dz = np.asarray(z2 - z_vals)
        assert np.all(np.abs(dz) <= 0.5 * spacing + 1e-6)
        # points move along the ray direction by exactly the z offset
        dp = np.asarray(p2 - pts)
        expected = dz * np.asarray(dirs)[:, :, None, :]
        np.testing.assert_allclose(dp, expected, atol=1e-6)


class TestCameraSampling:
    @pytest.mark.parametrize("mode", rays.CAMERA_MODES)
    def test_modes_shapes_and_sphere(self, rng, mode):
        pos, phi, theta = rays.sample_camera_positions(
            rng, bs=16, r=1.0, horizontal_stddev=0.3, vertical_stddev=0.155, mode=mode
        )
        assert pos.shape == (16, 3)
        assert phi.shape == (16, 1)
        assert theta.shape == (16, 1)
        np.testing.assert_allclose(jnp.linalg.norm(pos, axis=-1), 1.0, atol=1e-5)
        assert np.all(np.asarray(phi) >= 1e-6) and np.all(np.asarray(phi) <= math.pi)

    def test_mean_mode_deterministic(self, rng):
        pos, phi, theta = rays.sample_camera_positions(
            rng, bs=2, horizontal_mean=math.pi / 2, vertical_mean=math.pi / 2, mode="mean"
        )
        # phi=theta=pi/2 -> (cos(pi/2)*sin, cos, sin*sin) = (0, 0, 1)
        np.testing.assert_allclose(pos, [[0, 0, 1], [0, 0, 1]], atol=1e-6)

    def test_sphere_parameterization(self, rng):
        """pos = (r sin(phi) cos(theta), r cos(phi), r sin(phi) sin(theta))."""
        pos, phi, theta = rays.sample_camera_positions(rng, bs=8, mode="gaussian")
        p, t = np.asarray(phi)[:, 0], np.asarray(theta)[:, 0]
        expected = np.stack([np.sin(p) * np.cos(t), np.cos(p), np.sin(p) * np.sin(t)], -1)
        np.testing.assert_allclose(pos, expected, atol=1e-5)


class TestCam2World:
    def test_identity_like_camera(self):
        """Camera at +z looking at origin: forward=-z, so -forward=+z column."""
        origin = jnp.array([[0.0, 0.0, 1.0]])
        forward = rays.normalize_vecs(-origin)
        m = np.asarray(rays.create_cam2world_matrix(forward, origin))[0]
        # rotation should be identity (up=+y, left=-x -> -left=+x)
        np.testing.assert_allclose(m[:3, :3], np.eye(3), atol=1e-6)
        np.testing.assert_allclose(m[:3, 3], [0, 0, 1], atol=1e-6)
        np.testing.assert_allclose(m[3], [0, 0, 0, 1], atol=1e-6)

    def test_rotation_orthonormal(self, rng):
        origin, _, _ = rays.sample_camera_positions(rng, bs=6, mode="gaussian")
        m = rays.create_cam2world_matrix(rays.normalize_vecs(-origin), origin)
        r = np.asarray(m)[:, :3, :3]
        for i in range(6):
            np.testing.assert_allclose(r[i] @ r[i].T, np.eye(3), atol=1e-5)
            assert np.linalg.det(r[i]) > 0.99

    def test_camera_space_forward_maps_to_lookat(self):
        """A camera-space ray (0,0,-1) must map to the world forward vector."""
        origin = jnp.array([[0.6, 0.3, 0.74]])
        forward = rays.normalize_vecs(-origin)
        m = np.asarray(rays.create_cam2world_matrix(forward, origin))[0]
        world_dir = m[:3, :3] @ np.array([0.0, 0.0, -1.0])
        np.testing.assert_allclose(world_dir, np.asarray(forward)[0], atol=1e-6)


class TestWorldRays:
    def test_full_pipeline_shapes(self, rng):
        out = rays.get_world_points_and_direction(
            rng, batch_size=2, num_steps=12, img_size=8, fov=12,
            ray_start=0.88, ray_end=1.12, h_stddev=0.3, v_stddev=0.155,
            h_mean=math.pi / 2, v_mean=math.pi / 2, sample_dist="gaussian",
        )
        assert out.points.shape == (2, 64, 12, 3)
        assert out.dirs_expanded.shape == (2, 64, 12, 3)
        assert out.origins.shape == (2, 64, 3)
        assert out.dirs.shape == (2, 64, 3)
        assert out.z_vals.shape == (2, 64, 12, 1)
        assert out.pitch.shape == (2, 1)

    def test_points_on_rays(self, rng):
        """world points == origin + dir_unnormalized... — verify points lie on
        the line origin + t * dir (dirs are unit in camera z-scaling, but the
        sample point at depth z sits at origin + z * d_cam rotated; check
        collinearity instead)."""
        out = rays.get_world_points_and_direction(
            rng, batch_size=1, num_steps=4, img_size=4, fov=12,
            ray_start=0.88, ray_end=1.12, h_stddev=0.0, v_stddev=0.0,
            h_mean=math.pi / 2, v_mean=math.pi / 2, sample_dist="mean",
        )
        v = np.asarray(out.points - out.origins[:, :, None, :])
        d = np.asarray(out.dirs)[:, :, None, :]
        cross = np.cross(v, np.broadcast_to(d, v.shape))
        np.testing.assert_allclose(cross, 0.0, atol=1e-5)

    def test_lock_view_dependence(self, rng):
        out = rays.get_world_points_and_direction(
            rng, batch_size=1, num_steps=2, img_size=2, fov=12,
            ray_start=0.88, ray_end=1.12, h_stddev=0.3, v_stddev=0.155,
            h_mean=math.pi / 2, v_mean=math.pi / 2, sample_dist="gaussian",
            lock_view_dependence=True,
        )
        d = np.asarray(out.dirs_expanded)
        np.testing.assert_allclose(d[..., :2], 0.0)
        np.testing.assert_allclose(d[..., 2], -1.0)

    def test_explicit_camera(self, rng):
        pos = jnp.array([[0.0, 0.0, 1.0]])
        lookup = jnp.array([[0.0, 0.0, -1.0]])
        out = rays.get_world_points_and_direction(
            rng, batch_size=1, num_steps=2, img_size=2, fov=12,
            ray_start=0.88, ray_end=1.12, h_stddev=0, v_stddev=0,
            h_mean=0, v_mean=0, sample_dist="gaussian",
            camera_pos=pos, camera_lookup=lookup, perturb=False,
        )
        np.testing.assert_allclose(out.origins[0, 0], [0, 0, 1], atol=1e-6)
        np.testing.assert_allclose(out.pitch, 0.0)

    def test_jit_compatible(self, rng):
        f = jax.jit(
            lambda k: rays.get_world_points_and_direction(
                k, batch_size=1, num_steps=3, img_size=4, fov=12,
                ray_start=0.88, ray_end=1.12, h_stddev=0.3, v_stddev=0.155,
                h_mean=math.pi / 2, v_mean=math.pi / 2, sample_dist="hybrid",
            )
        )
        out = f(rng)
        assert out.points.shape == (1, 16, 3, 3)
