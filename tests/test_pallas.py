"""Pallas kernel parity tests (interpret mode on CPU; compiled path is
exercised by bench.py on real TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cips3d_tpu.models.nerf_net import NeRFNetwork
from cips3d_tpu.ops.pallas.film_mlp import siren_forward_pallas


@pytest.fixture(scope="module")
def siren():
    net = NeRFNetwork(hidden_dim=32, hidden_layers=2, rgb_dim=8)
    rng = jax.random.PRNGKey(0)
    pts = jax.random.normal(rng, (2, 16, 3)) * 0.05
    styles = {
        k: jax.random.normal(jax.random.fold_in(rng, i), (2, 16))
        for i, k in enumerate(["nerf_w0", "nerf_w1", "nerf_rgb"])
    }
    params = net.init(rng, pts, styles)
    return net, params, pts, styles


class TestFilmMlpKernel:
    def test_matches_xla_path(self, siren):
        net, params, pts, styles = siren
        ref = net.apply(params, pts, styles)
        out = siren_forward_pallas(
            params["params"], pts, styles, tile=8, interpret=True
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_ragged_n_padding(self, siren):
        net, params, pts, styles = siren
        pts13 = pts[:, :13]
        ref = net.apply(params, pts13, styles)
        out = siren_forward_pallas(
            params["params"], pts13, styles, tile=8, interpret=True
        )
        assert out.shape == (2, 13, 9)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


class TestGeneratorPallasPath:
    def test_generator_forward_matches(self):
        """Full generator with use_pallas_siren=True must match the XLA path
        bit-for-bit up to float tolerance (same RNG)."""
        import dataclasses

        import jax
        import jax.numpy as jnp
        from cips3d_tpu.models.generator import GeneratorConfig, GeneratorNerfINR, RenderOptions, sample_zs

        cfg = GeneratorConfig(
            z_dim_nerf=16, z_dim_inr=32, nerf_hidden_dim=32, nerf_style_dim=16,
            nerf_mapping_layers=2, nerf_rgb_dim=8, inr_hidden_dim=32,
            inr_style_dim=32, inr_mapping_layers=2,
        )
        opts = RenderOptions(img_size=8, num_steps=3)
        key = jax.random.PRNGKey(0)
        zs = sample_zs(key, 1, cfg)
        ref_model = GeneratorNerfINR(cfg=cfg)
        params = ref_model.init(key, zs, key, opts)
        ref, _ = ref_model.apply(params, zs, key, opts)

        pal_model = GeneratorNerfINR(cfg=dataclasses.replace(cfg, use_pallas_siren=True))
        out, _ = pal_model.apply(params, zs, key, opts)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)
