"""Discriminator stack tests (reference: exp/cips3d/models/discriminator.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from cips3d_tpu.models.discriminator import (
    ConvLayer,
    Discriminator,
    DiscriminatorMultiScale,
    DiscriminatorMultiScaleAux,
    ResBlock,
    aux_channels,
    stylegan2_channels,
)


class TestConvLayer:
    def test_same_resolution(self, rng):
        m = ConvLayer(8, 3)
        x = jax.random.normal(rng, (2, 3, 16, 16))
        params = m.init(rng, x)
        out = m.apply(params, x)
        assert out.shape == (2, 8, 16, 16)

    def test_downsample_halves(self, rng):
        m = ConvLayer(8, 3, downsample=True)
        x = jax.random.normal(rng, (2, 4, 16, 16))
        params = m.init(rng, x)
        assert m.apply(params, x).shape == (2, 8, 8, 8)

    def test_upsample_doubles(self, rng):
        m = ConvLayer(8, 3, upsample=True)
        x = jax.random.normal(rng, (2, 4, 8, 8))
        params = m.init(rng, x)
        assert m.apply(params, x).shape == (2, 8, 16, 16)


class TestResBlock:
    def test_halves_resolution(self, rng):
        m = ResBlock(16)
        x = jax.random.normal(rng, (2, 8, 16, 16))
        params = m.init(rng, x)
        assert m.apply(params, x).shape == (2, 16, 8, 8)

    def test_first_downsample_same_output_shape(self, rng):
        m = ResBlock(16, first_downsample=True)
        x = jax.random.normal(rng, (2, 8, 16, 16))
        params = m.init(rng, x)
        assert m.apply(params, x).shape == (2, 16, 8, 8)


class TestDiscriminator:
    def test_fixed_size(self, rng):
        m = Discriminator(size=32, channel_multiplier=1)
        x = jax.random.normal(rng, (4, 3, 32, 32))
        params = m.init(rng, x)
        out = m.apply(params, x)
        assert out.shape == (4, 1)


class TestMultiScale:
    def _make(self, rng, **kw):
        m = DiscriminatorMultiScale(max_size=64, **kw)
        params = m.init(rng, jnp.zeros((2, 3, 8, 8)), method=m.init_all)
        return m, params

    def test_multi_resolution_same_params(self, rng):
        m, params = self._make(rng)
        for size in (8, 16, 32, 64):
            x = jax.random.normal(rng, (2, 3, size, size))
            out = m.apply(params, x, 1.0)
            assert out.shape == (2, 1), size

    def test_alpha_blending(self, rng):
        m, params = self._make(rng)
        x = jax.random.normal(rng, (2, 3, 32, 32))
        full = m.apply(params, x, 1.0)
        half = m.apply(params, x, 0.0)
        mid = m.apply(params, x, 0.5)
        assert not np.allclose(np.asarray(full), np.asarray(half))
        assert np.all(np.isfinite(np.asarray(mid)))

    def test_alpha_one_matches_no_fadein(self, rng):
        m, params = self._make(rng)
        x = jax.random.normal(rng, (2, 3, 16, 16))
        a = m.apply(params, x, 1.0, fade_in=True)
        b = m.apply(params, x, 1.0, fade_in=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_stddev_group(self, rng):
        m = DiscriminatorMultiScale(max_size=32, stddev_group=4)
        params = m.init(rng, jnp.zeros((4, 3, 8, 8)), method=m.init_all)
        x = jax.random.normal(rng, (4, 3, 32, 32))
        assert m.apply(params, x, 1.0).shape == (4, 1)

    def test_r1_grad_through_d(self, rng):
        """R1: grad of D(x).sum() w.r.t. x, then grad of its norm w.r.t.
        params — the double-backward path through blur/conv must be finite."""
        m, params = self._make(rng)
        x = jax.random.normal(rng, (2, 3, 16, 16))

        def r1(params, x):
            g = jax.grad(lambda xx: jnp.sum(m.apply(params, xx, 1.0)))(x)
            return jnp.sum(g ** 2)

        val = r1(params, x)
        assert np.isfinite(float(val)) and float(val) > 0
        gp = jax.grad(r1)(params, x)
        total = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(gp))
        assert np.isfinite(total) and total > 0


class TestMultiScaleAux:
    def test_aux_split(self, rng):
        m = DiscriminatorMultiScaleAux(max_size=32)
        params = m.init(rng, jnp.zeros((2, 3, 8, 8)), method=m.init_all)
        x = jax.random.normal(rng, (4, 3, 16, 16))
        out = m.apply(params, x, 1.0, use_aux_disc=True)
        assert out.shape == (4, 1)
        out2 = m.apply(params, x[:2], 1.0, use_aux_disc=False)
        # main disc on the first half must agree
        np.testing.assert_allclose(np.asarray(out[:2]), np.asarray(out2), atol=1e-5)

    def test_channel_tables(self):
        assert stylegan2_channels(2)[64] == 512
        assert aux_channels(2)[64] == 256
        assert stylegan2_channels(2)[4] == 512

    def test_diffaug_enabled(self, rng):
        m = DiscriminatorMultiScaleAux(max_size=16, diffaug=True)
        params = m.init(rng, jnp.zeros((2, 3, 8, 8)), method=m.init_all)
        x = jax.random.normal(rng, (2, 3, 16, 16))
        a = m.apply(params, x, 1.0, diffaug_key=rng)
        b = m.apply(params, x, 1.0, diffaug_key=jax.random.PRNGKey(7))
        assert not np.allclose(np.asarray(a), np.asarray(b))
