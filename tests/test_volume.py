"""Tests for cips3d_tpu.core.volume against hand-computed golden values.

Reference semantics: exp/pigan/pigan_utils.py:164-273 and
exp/dev/nerf_inr/models/generator_nerf_inr.py:538-598.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cips3d_tpu.core import volume


def _manual_render(rgbs, sigmas, z_vals):
    """Straightforward NumPy re-derivation of NeRF compositing (relu clamp,
    no noise) used as an independent oracle."""
    s = len(z_vals)
    deltas = np.diff(z_vals).tolist() + [1e10]
    alphas = [1 - np.exp(-deltas[i] * max(sigmas[i], 0.0)) for i in range(s)]
    T = 1.0
    weights = []
    for a in alphas:
        weights.append(a * T)
        T = T * (1 - a + 1e-10)
    rgb = sum(w * np.asarray(r) for w, r in zip(weights, rgbs))
    depth = sum(w * z for w, z in zip(weights, z_vals))
    return rgb, depth, weights


class TestVolumeRender:
    def test_against_manual(self):
        z = [0.5, 1.0, 1.5, 2.0]
        sig = [0.3, 2.0, -1.0, 5.0]
        rgbs = [[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0], [0.5, 0.5, 0.5]]
        rgb_sigma = jnp.array(
            [[r + [s] for r, s in zip(rgbs, sig)]], dtype=jnp.float32
        )[None]  # (1, 1, 4, 4)
        z_vals = jnp.array(z, dtype=jnp.float32)[None, None, :, None]
        rgb, depth, weights = volume.volume_render(
            rgb_sigma, z_vals, noise_key=None, noise_std=0.0, dim_rgb=3, clamp_mode="relu"
        )
        m_rgb, m_depth, m_w = _manual_render(rgbs, sig, z)
        np.testing.assert_allclose(rgb[0, 0], m_rgb, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(depth[0, 0, 0], m_depth, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(weights[0, 0, :, 0], m_w, rtol=1e-4, atol=1e-5)

    def test_opaque_first_sample(self):
        """A huge density at the first sample makes its weight ~1."""
        rgb_sigma = jnp.zeros((1, 1, 3, 4)).at[0, 0, 0].set(jnp.array([1, 0, 0, 1e6]))
        z_vals = jnp.array([0.5, 1.0, 1.5])[None, None, :, None]
        rgb, depth, w = volume.volume_render(rgb_sigma, z_vals, noise_std=0.0, clamp_mode="relu")
        np.testing.assert_allclose(w[0, 0, :, 0], [1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(rgb[0, 0], [1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(depth[0, 0, 0], 0.5, atol=1e-6)

    def test_empty_space(self):
        rgb_sigma = jnp.zeros((1, 2, 3, 4))
        z_vals = jnp.array([0.5, 1.0, 1.5])[None, None, :, None].repeat(2, axis=1)
        rgb, _, w = volume.volume_render(rgb_sigma, z_vals, noise_std=0.0, clamp_mode="relu")
        np.testing.assert_allclose(w, 0.0, atol=1e-6)
        np.testing.assert_allclose(rgb, 0.0, atol=1e-6)

    def test_white_back(self):
        rgb_sigma = jnp.zeros((1, 1, 3, 4))
        z_vals = jnp.array([0.5, 1.0, 1.5])[None, None, :, None]
        rgb, _, _ = volume.volume_render(
            rgb_sigma, z_vals, noise_std=0.0, clamp_mode="relu", white_back=True
        )
        np.testing.assert_allclose(rgb, 1.0, atol=1e-6)

    def test_last_back(self):
        rgb_sigma = jnp.zeros((1, 1, 3, 4)).at[0, 0, 2, :3].set(jnp.array([0.2, 0.4, 0.6]))
        z_vals = jnp.array([0.5, 1.0, 1.5])[None, None, :, None]
        rgb, _, w = volume.volume_render(
            rgb_sigma, z_vals, noise_std=0.0, clamp_mode="relu", last_back=True
        )
        np.testing.assert_allclose(w[0, 0, -1, 0], 1.0, atol=1e-6)
        np.testing.assert_allclose(rgb[0, 0], [0.2, 0.4, 0.6], atol=1e-6)

    def test_softplus_clamp(self):
        # distinct rgb per sample so the weighting actually shows up
        rgb_sigma = jnp.stack(
            [jnp.array([1.0, 0, 0, 0.3]), jnp.array([0, 1.0, 0, 0.3])]
        )[None, None]
        z_vals = jnp.array([0.5, 1.0])[None, None, :, None]
        rgb_r, _, _ = volume.volume_render(rgb_sigma, z_vals, noise_std=0.0, clamp_mode="relu")
        rgb_s, _, _ = volume.volume_render(rgb_sigma, z_vals, noise_std=0.0, clamp_mode="softplus")
        assert not np.allclose(np.asarray(rgb_r), np.asarray(rgb_s))

    def test_feature_dim_32(self):
        """The CIPS-3D generator integrates a 32-dim feature, not RGB."""
        rgb_sigma = jnp.ones((2, 5, 4, 33))
        z_vals = jnp.linspace(0.88, 1.12, 4)[None, None, :, None].repeat(5, 1).repeat(2, 0)
        rgb, depth, w = volume.volume_render(rgb_sigma, z_vals, noise_std=0.0, dim_rgb=32)
        assert rgb.shape == (2, 5, 32)
        assert depth.shape == (2, 5, 1)

    def test_noise_reproducible(self, rng):
        rgb_sigma = jnp.ones((1, 2, 4, 4))
        z_vals = jnp.linspace(0.5, 2.0, 4)[None, None, :, None].repeat(2, 1)
        a, _, _ = volume.volume_render(rgb_sigma, z_vals, noise_key=rng, noise_std=1.0)
        b, _, _ = volume.volume_render(rgb_sigma, z_vals, noise_key=rng, noise_std=1.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_differentiable(self):
        rgbs = jnp.arange(12, dtype=jnp.float32).reshape(1, 1, 4, 3)

        def loss(sig):
            rgb_sigma = jnp.concatenate([rgbs, sig], axis=-1)
            z_vals = jnp.linspace(0.5, 2.0, 4)[None, None, :, None]
            rgb, _, _ = volume.volume_render(rgb_sigma, z_vals, noise_std=0.0)
            return jnp.sum(rgb)

        g = jax.grad(loss)(jnp.ones((1, 1, 4, 1)) * 0.5)
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.any(np.asarray(g) != 0)


class TestSamplePdf:
    def test_det_uniform_weights(self):
        """Uniform weights + det=True -> near-linspace over the bin span."""
        bins = jnp.linspace(0.0, 1.0, 11)[None].repeat(3, 0)  # (3, 11)
        weights = jnp.ones((3, 10))
        s = volume.sample_pdf(None, bins, weights, 5, det=True)
        np.testing.assert_allclose(s, np.broadcast_to(np.linspace(0, 1, 5), (3, 5)), atol=1e-5)

    def test_concentrated_weight(self, rng):
        """All mass in one bin -> all samples inside that bin."""
        bins = jnp.linspace(0.0, 1.0, 6)[None]  # bins [0,.2,...,1]
        weights = jnp.array([[0.0, 0.0, 100.0, 0.0, 0.0]])
        s = np.asarray(volume.sample_pdf(rng, bins, weights, 64))
        assert np.all(s >= 0.39) and np.all(s <= 0.61)

    def test_monotone_det(self):
        bins = jnp.linspace(0.5, 2.0, 12)[None]
        weights = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (1, 11)))
        s = np.asarray(volume.sample_pdf(None, bins, weights, 12, det=True))[0]
        assert np.all(np.diff(s) >= -1e-6)

    def test_range_bounded(self, rng):
        bins = jnp.linspace(0.88, 1.12, 11)[None].repeat(4, 0)
        weights = jax.random.uniform(rng, (4, 10)) + 0.01
        s = np.asarray(volume.sample_pdf(rng, bins, weights, 12))
        assert s.min() >= 0.88 - 1e-6 and s.max() <= 1.12 + 1e-6


class TestHierarchical:
    def test_fine_points_shapes_and_stopgrad(self, rng):
        b, n, s = 2, 16, 6
        coarse = jax.random.normal(rng, (b, n, s, 33))
        z_vals = jnp.broadcast_to(jnp.linspace(0.88, 1.12, s)[None, None, :, None], (b, n, s, 1))
        origins = jax.random.normal(rng, (b, n, 3))
        dirs = jax.random.normal(rng, (b, n, 3))
        fp, fz = volume.get_fine_points(
            rng, coarse, z_vals, dim_rgb=32, clamp_mode="relu", noise_std=0.0,
            num_steps=s, ray_origins=origins, ray_directions=dirs,
        )
        assert fp.shape == (b, n, s, 3)
        assert fz.shape == (b, n, s, 1)

        # gradient through the resample must be zero (detached)
        def loss(c):
            fp, _ = volume.get_fine_points(
                rng, c, z_vals, dim_rgb=32, clamp_mode="relu", noise_std=0.0,
                num_steps=s, ray_origins=origins, ray_directions=dirs,
            )
            return jnp.sum(fp)

        g = jax.grad(loss)(coarse)
        np.testing.assert_allclose(np.asarray(g), 0.0)

    def test_fine_points_on_rays(self, rng):
        b, n, s = 1, 4, 5
        coarse = jnp.ones((b, n, s, 33))
        z_vals = jnp.broadcast_to(jnp.linspace(0.88, 1.12, s)[None, None, :, None], (b, n, s, 1))
        origins = jnp.zeros((b, n, 3)).at[..., 2].set(1.0)
        dirs = jnp.zeros((b, n, 3)).at[..., 2].set(-1.0)
        fp, fz = volume.get_fine_points(
            rng, coarse, z_vals, dim_rgb=32, clamp_mode="relu", noise_std=0.0,
            num_steps=s, ray_origins=origins, ray_directions=dirs,
        )
        np.testing.assert_allclose(
            np.asarray(fp), np.asarray(origins[:, :, None, :] + dirs[:, :, None, :] * fz), atol=1e-6
        )

    def test_merge_sorted(self):
        cz = jnp.array([1.0, 3.0])[None, None, :, None]
        fz = jnp.array([2.0, 4.0])[None, None, :, None]
        co = jnp.array([[10.0], [30.0]])[None, None]
        fo = jnp.array([[20.0], [40.0]])[None, None]
        out, z = volume.merge_sorted_samples(co, cz, fo, fz)
        np.testing.assert_allclose(z[0, 0, :, 0], [1, 2, 3, 4])
        np.testing.assert_allclose(out[0, 0, :, 0], [10, 20, 30, 40])

    def test_merge_sorted_multichannel(self, rng):
        k1, k2 = jax.random.split(rng)
        cz = jnp.sort(jax.random.uniform(k1, (2, 3, 4, 1)), axis=-2)
        fz = jnp.sort(jax.random.uniform(k2, (2, 3, 4, 1)), axis=-2)
        co = jax.random.normal(k1, (2, 3, 4, 5))
        fo = jax.random.normal(k2, (2, 3, 4, 5))
        out, z = volume.merge_sorted_samples(co, cz, fo, fz)
        assert out.shape == (2, 3, 8, 5)
        assert np.all(np.diff(np.asarray(z)[..., 0], axis=-1) >= 0)
        # every (z, out) pair must still be associated
        src = {}
        for zz, oo in zip(np.asarray(jnp.concatenate([fz, cz], -2)).ravel(),
                          np.asarray(jnp.concatenate([fo, co], -2)).reshape(-1, 5)):
            src[round(float(zz), 6)] = oo
        for zz, oo in zip(np.asarray(z).ravel(), np.asarray(out).reshape(-1, 5)):
            np.testing.assert_allclose(oo, src[round(float(zz), 6)], atol=1e-6)


class TestUnsortedRender:
    """volume_render_unsorted == merge_sorted_samples + volume_render."""

    def _ref_and_unsorted(self, rng, last_back=False, white_back=False, with_ties=False):
        from cips3d_tpu.core.volume import (
            merge_sorted_samples,
            volume_render,
            volume_render_unsorted,
        )

        b, n, s, c = 2, 5, 4, 6
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        co = jax.random.normal(k1, (b, n, s, c + 1))
        fo = jax.random.normal(k2, (b, n, s, c + 1))
        cz = jnp.sort(jax.random.uniform(k3, (b, n, s, 1)), axis=-2)
        fz = jnp.sort(jax.random.uniform(k4, (b, n, s, 1)), axis=-2)
        if with_ties:
            fz = cz  # every depth duplicated: stresses the stable tie-break
        merged, mz = merge_sorted_samples(co, cz, fo, fz)
        ref = volume_render(merged, mz, dim_rgb=c, last_back=last_back, white_back=white_back)
        got = volume_render_unsorted(
            jnp.concatenate([fo[..., :c], co[..., :c]], axis=-2),
            jnp.concatenate([fo[..., c:], co[..., c:]], axis=-2),
            jnp.concatenate([fz, cz], axis=-2),
            last_back=last_back,
            white_back=white_back,
        )
        return ref, got

    @pytest.mark.parametrize("last_back,white_back", [(False, False), (True, False), (False, True)])
    def test_matches_sorted_path(self, rng, last_back, white_back):
        ref, got = self._ref_and_unsorted(rng, last_back, white_back)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]), atol=1e-5)
        # weights agree as multisets per ray (arrival vs depth order)
        np.testing.assert_allclose(
            np.sort(np.asarray(got[2])[..., 0], axis=-1),
            np.sort(np.asarray(ref[2])[..., 0], axis=-1),
            atol=1e-5,
        )

    def test_matches_with_duplicate_depths(self, rng):
        ref, got = self._ref_and_unsorted(rng, with_ties=True)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]), atol=1e-5)

    def test_differentiable(self, rng):
        from cips3d_tpu.core.volume import volume_render_unsorted

        b, n, m, c = 1, 3, 6, 4
        k1, k2, k3 = jax.random.split(rng, 3)
        rgb = jax.random.normal(k1, (b, n, m, c))
        sig = jax.random.normal(k2, (b, n, m, 1))
        z = jax.random.uniform(k3, (b, n, m, 1))

        def loss(rgb, sig):
            r, d, w = volume_render_unsorted(rgb, sig, z)
            return jnp.sum(r ** 2) + jnp.sum(d ** 2)

        g_rgb, g_sig = jax.grad(loss, argnums=(0, 1))(rgb, sig)
        assert np.isfinite(np.asarray(g_rgb)).all()
        assert np.isfinite(np.asarray(g_sig)).all()
        assert float(jnp.abs(g_sig).sum()) > 0


class TestEmaAndPoints:
    def test_ema_frozen_then_decay(self):
        from cips3d_tpu.core.ema import ema_update

        ema = {"w": jnp.zeros(3)}
        src = {"w": jnp.ones(3)}
        out = ema_update(ema, src, step=10, decay=0.9, start_itr=100)
        np.testing.assert_allclose(out["w"], 0.0)
        out = ema_update(ema, src, step=100, decay=0.9, start_itr=100)
        np.testing.assert_allclose(out["w"], 0.1, atol=1e-6)

    def test_gather_scatter_roundtrip(self, rng):
        from cips3d_tpu.core import points as P

        x = jax.random.normal(rng, (2, 10, 3))
        perm = jax.random.permutation(rng, 10)
        idx_g, idx_n = perm[:4], perm[4:]
        g = P.gather_points(x, idx_g)
        n = P.gather_points(x, idx_n)
        merged = P.scatter_points(idx_g, g, idx_n, n, 10)
        np.testing.assert_allclose(np.asarray(merged), np.asarray(x), atol=1e-6)

    def test_batch_gather_scatter_roundtrip(self, rng):
        from cips3d_tpu.core import points as P

        x = jax.random.normal(rng, (2, 8, 3))
        perm = jnp.stack([jax.random.permutation(jax.random.fold_in(rng, i), 8) for i in range(2)])
        idx_g, idx_n = perm[:, :3], perm[:, 3:]
        merged = P.batch_scatter_points(
            idx_g, P.batch_gather_points(x, idx_g), idx_n, P.batch_gather_points(x, idx_n), 8
        )
        np.testing.assert_allclose(np.asarray(merged), np.asarray(x), atol=1e-6)
