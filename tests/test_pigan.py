"""pi-GAN baseline family tests (reference: piGAN_lib/siren/siren.py,
piGAN_lib/generators/generators.py, piGAN_lib/discriminators/discriminators.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cips3d_tpu.models.generator import RenderOptions
from cips3d_tpu.models.pigan import (
    CustomMappingNetwork,
    ImplicitGenerator3d,
    ProgressiveDiscriminator,
    SpatialSirenBaseline,
)

OPTS = RenderOptions(img_size=8, num_steps=3)


class TestMappingNetwork:
    def test_split(self, rng):
        m = CustomMappingNetwork(map_hidden_dim=32, map_output_dim=3 * 16 * 2)
        z = jax.random.normal(rng, (2, 8))
        params = m.init(rng, z)
        f, p = m.apply(params, z)
        assert f.shape == (2, 48) and p.shape == (2, 48)


class TestSiren:
    @pytest.fixture(scope="class")
    def siren(self):
        net = SpatialSirenBaseline(z_dim=16, hidden_dim=16, n_layers=3)
        rng = jax.random.PRNGKey(0)
        pts = jax.random.normal(rng, (2, 10, 3)) * 0.05
        z = jax.random.normal(rng, (2, 16))
        dirs = jax.random.normal(rng, (2, 10, 3))
        params = net.init(rng, pts, z, dirs)
        return net, params, pts, z, dirs

    def test_output_shape_and_range(self, siren):
        net, params, pts, z, dirs = siren
        out = net.apply(params, pts, z, dirs)
        assert out.shape == (2, 10, 4)
        rgb = np.asarray(out[..., :3])
        assert rgb.min() >= 0 and rgb.max() <= 1  # sigmoid head

    def test_frequencies_path_matches_forward(self, siren):
        net, params, pts, z, dirs = siren
        full = net.apply(params, pts, z, dirs)
        freqs, phases = net.apply(params, z, method=lambda m, z: m.mapping_network(z))
        direct = net.apply(
            params, pts, freqs, phases, dirs, method=SpatialSirenBaseline.forward_with_frequencies
        )
        np.testing.assert_allclose(np.asarray(full), np.asarray(direct), atol=1e-6)


class TestImplicitGenerator:
    def test_forward(self, rng):
        gen = ImplicitGenerator3d(z_dim=16, hidden_dim=16)
        z = jax.random.normal(rng, (2, 16))
        params = gen.init(rng, z, rng, OPTS)
        imgs, pitch_yaw = gen.apply(params, z, rng, OPTS)
        assert imgs.shape == (2, 3, 8, 8)
        assert pitch_yaw.shape == (2, 2)
        arr = np.asarray(imgs)
        assert arr.min() >= -1 - 1e-5 and arr.max() <= 1 + 1e-5

    def test_differentiable(self, rng):
        gen = ImplicitGenerator3d(z_dim=8, hidden_dim=8)
        z = jax.random.normal(rng, (1, 8))
        params = gen.init(rng, z, rng, OPTS)

        def loss(p):
            imgs, _ = gen.apply(p, z, rng, OPTS)
            return jnp.sum(imgs ** 2)

        g = jax.grad(loss)(params)
        total = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
        assert np.isfinite(total) and total > 0


class TestProgressiveDiscriminator:
    @pytest.fixture(scope="class")
    def disc(self):
        m = ProgressiveDiscriminator()
        rng = jax.random.PRNGKey(0)
        params = m.init(rng, jnp.zeros((2, 3, 16, 16)), 1.0)
        return m, params

    def test_logit_shape(self, disc):
        m, params = disc
        out, latent, pos = m.apply(params, jax.random.normal(jax.random.PRNGKey(1), (2, 3, 16, 16)), 1.0)
        assert out.shape == (2, 1)
        assert latent is None and pos is None

    def test_alpha_fadein(self, disc):
        m, params = disc
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 16, 16))
        a, _, _ = m.apply(params, x, 1.0)
        b, _, _ = m.apply(params, x, 0.0)
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_encoder_variant(self, rng):
        m = ProgressiveDiscriminator(predict_encodings=True)
        x = jnp.zeros((2, 3, 8, 8))
        params = m.init(rng, x, 1.0)
        out, latent, pos = m.apply(params, x, 1.0)
        assert out.shape == (2, 1)
        assert latent.shape == (2, 256)
        assert pos.shape == (2, 2)
