"""Polynomial-sine inference knob (ops/fast_sin.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from cips3d_tpu.models.generator import GeneratorConfig, GeneratorNerfINR, RenderOptions, sample_zs
from cips3d_tpu.ops.fast_sin import fast_sin, fast_sin_grad

GCFG = GeneratorConfig(
    z_dim_nerf=16, z_dim_inr=32, nerf_hidden_dim=16, nerf_style_dim=16,
    nerf_mapping_layers=2, inr_hidden_dim=32, inr_style_dim=32, inr_mapping_layers=2,
)


def test_accuracy_over_siren_range():
    """Arguments in SIREN reach |gain*h + bias| ~ O(100); error must stay
    below one 8-bit pixel level (1/255 = 3.9e-3) with large margin."""
    x = jnp.linspace(-150.0, 150.0, 200001)
    err = np.abs(np.asarray(fast_sin(x)) - np.sin(np.asarray(x)))
    assert err.max() < 5e-5, err.max()


def test_bf16_matches_exact_sin():
    """f32 internals (round-4 fix): on bf16 inputs fast_sin must match
    jnp.sin-on-the-same-bf16-argument to within bf16 output rounding —
    NOT the 0.2 absolute error the old bf16-internal reduction produced
    (y - round(y) quantized to ULP(y)).  This is what makes fast_sin
    gradient-quality safe for bf16 training."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-150, 150, size=100000), jnp.bfloat16)
    arg = np.asarray(x, np.float64)          # the quantized argument
    exact = np.abs(np.asarray(jnp.sin(x), np.float64) - np.sin(arg)).max()
    fast = np.abs(np.asarray(fast_sin(x), np.float64) - np.sin(arg)).max()
    assert fast < 1.5 * max(exact, 2e-3), (fast, exact)
    # derivative path (used by the fused kernel's hand-written backward)
    g = np.abs(np.asarray(fast_sin_grad(x), np.float64) - np.cos(arg)).max()
    assert g < 5e-3, g
    # autodiff of fast_sin agrees with fast_sin_grad through the casts
    xs = x[:512].astype(jnp.float32)
    auto = jax.vmap(jax.grad(lambda v: fast_sin(v)))(xs)
    np.testing.assert_allclose(
        np.asarray(auto), np.asarray(fast_sin_grad(xs)), rtol=0, atol=1e-5)


def test_generator_output_close():
    """Full generator with fast_sin stays within a fraction of a pixel level
    of the exact-sine output."""
    key = jax.random.PRNGKey(0)
    model = GeneratorNerfINR(cfg=GCFG)
    fast = GeneratorNerfINR(cfg=GCFG.__class__(**{**GCFG.__dict__, "fast_sin": True}))
    zs = sample_zs(key, 2, GCFG)
    opts = RenderOptions(img_size=8, num_steps=3, h_stddev=0, v_stddev=0, nerf_noise=0.0)
    params = model.init(key, zs, key, opts)
    a = np.asarray(model.apply(params, zs, key, opts)[0])
    b = np.asarray(fast.apply(params, zs, key, opts)[0])
    assert np.abs(a - b).max() < 2e-3, np.abs(a - b).max()
