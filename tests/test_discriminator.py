"""Discriminator stack tests (reference: exp/cips3d/models/discriminator.py).

Uses a narrow channel table (the reference's custom-``channels`` feature,
`discriminator.py:417,440`) and module-scoped fixtures — this box has one CPU
core, so traces/compiles dominate and must be shared.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cips3d_tpu.models.discriminator import (
    ConvLayer,
    Discriminator,
    DiscriminatorMultiScale,
    DiscriminatorMultiScaleAux,
    ResBlock,
    aux_channels,
    stylegan2_channels,
)

TINY = {4: 16, 8: 16, 16: 16, 32: 16, 64: 16, 128: 16, 256: 16, 512: 16, 1024: 16}
RNG = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def ms():
    m = DiscriminatorMultiScale(max_size=64, channels_override=TINY)
    params = m.init(RNG, jnp.zeros((2, 3, 8, 8)), method=m.init_all)
    return m, params


@pytest.fixture(scope="module")
def msa():
    m = DiscriminatorMultiScaleAux(max_size=32, channels_override=TINY)
    params = m.init(RNG, jnp.zeros((2, 3, 8, 8)), method=m.init_all)
    return m, params


class TestConvLayer:
    def test_same_resolution(self, rng):
        m = ConvLayer(8, 3)
        x = jax.random.normal(rng, (2, 3, 16, 16))
        params = m.init(rng, x)
        assert m.apply(params, x).shape == (2, 8, 16, 16)

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


class TestFixedDiscriminator:
    def test_fixed_size(self, rng):
        m = Discriminator(size=16, channels_override=TINY)
        x = jax.random.normal(rng, (4, 3, 16, 16))
        params = m.init(rng, x)
        assert m.apply(params, x).shape == (4, 1)


class TestMultiScale:
    def test_multi_resolution_same_params(self, ms):
        m, params = ms
        for size in (16, 64):
            x = jax.random.normal(RNG, (2, 3, size, size))
            assert m.apply(params, x, 1.0).shape == (2, 1), size

    def test_alpha_blending(self, ms):
        m, params = ms
        x = jax.random.normal(RNG, (2, 3, 32, 32))
        full = m.apply(params, x, 1.0)
        half = m.apply(params, x, 0.0)
        mid = m.apply(params, x, 0.5)
        assert not np.allclose(np.asarray(full), np.asarray(half))
        assert np.all(np.isfinite(np.asarray(mid)))

    def test_alpha_one_matches_no_fadein(self, ms):
        m, params = ms
        x = jax.random.normal(RNG, (2, 3, 32, 32))
        a = m.apply(params, x, 1.0, fade_in=True)
        b = m.apply(params, x, 1.0, fade_in=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_stddev_group(self, rng):
        m = DiscriminatorMultiScale(max_size=16, stddev_group=4, channels_override=TINY)
        params = m.init(rng, jnp.zeros((4, 3, 8, 8)), method=m.init_all)
        x = jax.random.normal(rng, (4, 3, 16, 16))
        assert m.apply(params, x, 1.0).shape == (4, 1)

    def test_r1_grad_through_d(self, ms):
        """R1 needs grad-of-grad through the blur stack; both orders must be
        finite and nonzero."""
        m, params = ms
        x = jax.random.normal(RNG, (2, 3, 16, 16))

        def r1(params, x):
            g = jax.grad(lambda xx: jnp.sum(m.apply(params, xx, 1.0)))(x)
            return jnp.sum(g ** 2)

        val = r1(params, x)
        assert np.isfinite(float(val)) and float(val) > 0
        gp = jax.grad(r1)(params, x)
        total = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(gp))
        assert np.isfinite(total) and total > 0


class TestMultiScaleAux:
    def test_aux_split(self, msa):
        m, params = msa
        x = jax.random.normal(RNG, (4, 3, 16, 16))
        out = m.apply(params, x, 1.0, use_aux_disc=True)
        assert out.shape == (4, 1)
        out2 = m.apply(params, x[:2], 1.0, use_aux_disc=False)
        np.testing.assert_allclose(np.asarray(out[:2]), np.asarray(out2), atol=1e-5)

    def test_channel_tables(self):
        assert stylegan2_channels(2)[64] == 512
        assert aux_channels(2)[64] == 256
        assert stylegan2_channels(2)[4] == 512

    def test_diffaug_changes_output(self, rng):
        m = DiscriminatorMultiScaleAux(max_size=16, diffaug=True, channels_override=TINY)
        params = m.init(rng, jnp.zeros((2, 3, 8, 8)), method=m.init_all)
        x = jax.random.normal(rng, (2, 3, 16, 16))
        a = m.apply(params, x, 1.0, diffaug_key=rng)
        b = m.apply(params, x, 1.0, diffaug_key=jax.random.PRNGKey(7))
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestNHWCParity:
    """The NHWC prototype (docs/r256_step_analysis.md copy-tail item) must be
    bit-compatible with NCHW checkpoints: same params, same logits."""

    def test_logits_match_nchw(self, ms):
        m_nchw, params = ms
        m_nhwc = DiscriminatorMultiScale(
            max_size=64, channels_override=TINY, data_format="NHWC")
        x = jax.random.normal(jax.random.PRNGKey(3), (4, 3, 16, 16))
        for fade in (False, True):
            a = m_nchw.apply(params, x, 0.7, fade_in=fade)
            b = m_nhwc.apply(params, x, 0.7, fade_in=fade)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)

    def test_aux_and_grads_match(self, msa):
        m_nchw, params = msa
        m_nhwc = DiscriminatorMultiScaleAux(
            max_size=32, channels_override=TINY, data_format="NHWC")
        x = jax.random.normal(jax.random.PRNGKey(4), (4, 3, 16, 16))

        def loss(mod, xx):
            return jnp.mean(mod.apply(params, xx, 1.0, use_aux_disc=True) ** 2)

        la, ga = jax.value_and_grad(lambda xx: loss(m_nchw, xx))(x)
        lb, gb = jax.value_and_grad(lambda xx: loss(m_nhwc, xx))(x)
        np.testing.assert_allclose(float(la), float(lb), rtol=2e-5)
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(gb), rtol=2e-4, atol=2e-5)

    def test_stddev_path(self):
        m_nchw = DiscriminatorMultiScale(
            max_size=16, stddev_group=4, channels_override=TINY)
        params = m_nchw.init(RNG, jnp.zeros((4, 3, 8, 8)), method=m_nchw.init_all)
        m_nhwc = DiscriminatorMultiScale(
            max_size=16, stddev_group=4, channels_override=TINY,
            data_format="NHWC")
        x = jax.random.normal(jax.random.PRNGKey(5), (4, 3, 16, 16))
        a = m_nchw.apply(params, x, 1.0)
        b = m_nhwc.apply(params, x, 1.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)
