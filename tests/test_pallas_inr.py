"""Parity tests for the fused CIPS-INR decoder kernel (ops/pallas/inr_tile.py).

Must reproduce `CIPSNet.__call__` (pre_rgb_dim=3) — nine SinBlocks of two
modulated FCs, residual skip from block 4, ToRGB accumulation from block 3,
final tanh — with the modulation/demodulation split out per batch.  Runs in
Pallas interpret mode on the CPU simulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cips3d_tpu.models.cips_net import CIPSNet
from cips3d_tpu.ops.pallas.inr_tile import fused_inr_decode

B, N, IN0, D, STYLE = 2, 96, 16, 32, 24


@pytest.fixture(scope="module")
def setup():
    net = CIPSNet(hidden_dim=D, pre_rgb_dim=3, dtype=jnp.float32)
    styles = {
        k: jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(1), i), (B, STYLE))
        for i, k in enumerate(sorted(net.style_dims))
    }
    x = jax.random.normal(jax.random.PRNGKey(2), (B, N, IN0))
    params = net.init(jax.random.PRNGKey(0), x, styles)
    return net, params, styles, x


@pytest.mark.parametrize("img_size", [1024, 256, 32])
def test_forward_parity(setup, img_size):
    net, params, styles, x = setup
    ref = net.apply(params, x, styles, img_size=img_size)
    out = fused_inr_decode(
        params["params"], styles, x, img_size=img_size, tile=32,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_forward_parity_padded(setup):
    """N=96 with tile=64 pads to 128 and slices back."""
    net, params, styles, x = setup
    ref = net.apply(params, x, styles)
    out = fused_inr_decode(params["params"], styles, x, tile=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_small_img_size_rejected(setup):
    net, params, styles, x = setup
    with pytest.raises(ValueError, match="use the XLA CIPSNet path"):
        fused_inr_decode(params["params"], styles, x, img_size=8)


def test_generator_level_parity():
    """GeneratorNerfINR(fused_inr=True) == XLA on the same key (f32)."""
    from cips3d_tpu.models.generator import (
        GeneratorConfig, GeneratorNerfINR, RenderOptions, sample_zs,
    )

    kwargs = dict(
        z_dim_nerf=16, z_dim_inr=32, nerf_hidden_dim=16, nerf_style_dim=16,
        nerf_rgb_dim=8, nerf_mapping_layers=2, inr_hidden_dim=32,
        inr_style_dim=32, inr_mapping_layers=2,
    )
    opts = RenderOptions(img_size=8, num_steps=4)
    key = jax.random.PRNGKey(0)
    zs = sample_zs(key, 2, GeneratorConfig(**kwargs))

    imgs = {}
    for fused in (False, True):
        gen = GeneratorNerfINR(cfg=GeneratorConfig(fused_inr=fused, **kwargs))
        params = gen.init(jax.random.PRNGKey(1), zs, jax.random.PRNGKey(2), opts)
        img, _ = gen.apply(params, zs, jax.random.PRNGKey(3), opts)
        imgs[fused] = np.asarray(img)
    np.testing.assert_allclose(imgs[True], imgs[False], rtol=5e-4, atol=5e-5)
