"""Alt NeRF backbone tests (reference: exp/comm/models/nerf_network.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from cips3d_tpu.models.nerf_variants import (
    NeRFNetworkCLN,
    NeRFNetworkFreqPhase,
    NeRFNetworkSmall,
)


def _pts_styles(rng, style_dim, freq_phase=False, hidden=16):
    pts = jax.random.normal(rng, (2, 10, 3)) * 0.05
    d = {}
    for i, name in enumerate(("nerf_w0", "nerf_w1")):
        dim = 2 * hidden if freq_phase else style_dim
        d[name] = jax.random.normal(jax.random.fold_in(rng, i), (2, dim))
    d["nerf_rgb"] = jax.random.normal(
        jax.random.fold_in(rng, 9), (2, 2 * (hidden // 2) if freq_phase else style_dim)
    )
    return pts, d


class TestVariants:
    def test_cln_nerf(self, rng):
        net = NeRFNetworkCLN(hidden_dim=16, hidden_layers=2, rgb_dim=8)
        pts, styles = _pts_styles(rng, 12)
        params = net.init(rng, pts, styles)
        out = net.apply(params, pts, styles)
        assert out.shape == (2, 10, 9)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_freq_phase_nerf(self, rng):
        net = NeRFNetworkFreqPhase(hidden_dim=16, hidden_layers=2, rgb_dim=8)
        pts, styles = _pts_styles(rng, None, freq_phase=True, hidden=16)
        params = net.init(rng, pts, styles)
        out = net.apply(params, pts, styles)
        assert out.shape == (2, 10, 9)

    def test_freq_phase_with_pos_embed(self, rng):
        net = NeRFNetworkFreqPhase(hidden_dim=16, hidden_layers=2, rgb_dim=4, use_pos_embed=True)
        pts, styles = _pts_styles(rng, None, freq_phase=True, hidden=16)
        params = net.init(rng, pts, styles)
        out = net.apply(params, pts, styles)
        assert out.shape == (2, 10, 5)

    def test_small(self, rng):
        net = NeRFNetworkSmall(rgb_dim=8)
        pts = jax.random.normal(rng, (1, 6, 3))
        styles = {"nerf_w0": jax.random.normal(rng, (1, 16)),
                  "nerf_rgb": jax.random.normal(rng, (1, 16))}
        params = net.init(rng, pts, styles)
        assert net.apply(params, pts, styles).shape == (1, 6, 9)


class TestNeRFNetworkSigma:
    def test_forward_and_grads(self, rng):
        from cips3d_tpu.models.nerf_variants import NeRFNetworkSigma

        net = NeRFNetworkSigma(hidden_dim=16, hidden_layers=2, rgb_dim=8)
        pts = jax.random.normal(rng, (2, 10, 3)) * 0.1
        styles = {f"nerf_w{i}": jax.random.normal(jax.random.fold_in(rng, i), (2, 16))
                  for i in range(2)}
        params = net.init(rng, pts, styles)
        out = net.apply(params, pts, styles)
        assert out.shape == (2, 10, 9)
        # only the sigma path is style-conditioned: d(sigma)/d(style) != 0,
        # d(rgb)/d(style) == 0 (generator_nerf_inr_v16.py:519-530)
        def sigma_sum(s):
            return jnp.sum(net.apply(params, pts, s)[..., -1])

        def rgb_sum(s):
            return jnp.sum(net.apply(params, pts, s)[..., :-1])

        g_sigma = jax.grad(sigma_sum)(styles)
        g_rgb = jax.grad(rgb_sum)(styles)
        assert max(float(jnp.abs(v).max()) for v in g_sigma.values()) > 0
        assert max(float(jnp.abs(v).max()) for v in g_rgb.values()) == 0
