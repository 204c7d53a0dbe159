"""Parity tests for the fused ray-tile renderer (ops/pallas/ray_tile.py).

The kernel must reproduce the XLA NeRF stage of
`GeneratorNerfINR.points_forward` — coarse SIREN → resample weights →
inverse-CDF sample → fine SIREN → sort-free compositing — on the SAME key
(the wrapper mirrors the XLA path's key splits and draw shapes/dtypes).
Runs in Pallas interpret mode on the CPU simulation.
"""

import dataclasses

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from cips3d_tpu.core import volume as volume_lib
from cips3d_tpu.models.nerf_net import NeRFNetwork
from cips3d_tpu.ops.pallas.ray_tile import fused_ray_render

B, N, S, H, R = 2, 64, 12, 32, 16
STYLE = H


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    siren = NeRFNetwork(hidden_dim=H, hidden_layers=2, rgb_dim=R, dtype=jnp.float32)
    styles = {
        "nerf_w0": jax.random.normal(jax.random.PRNGKey(1), (B, STYLE)),
        "nerf_w1": jax.random.normal(jax.random.PRNGKey(2), (B, STYLE)),
        "nerf_rgb": jax.random.normal(jax.random.PRNGKey(3), (B, STYLE)),
    }
    params = siren.init(key, jnp.zeros((B, 8, 3)), styles)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    origins = jax.random.normal(k1, (B, N, 3)) * 0.05
    dirs_raw = jax.random.normal(k2, (B, N, 3)) + jnp.array([0.0, 0.0, -1.0])
    dirs = dirs_raw / jnp.linalg.norm(dirs_raw, axis=-1, keepdims=True)
    base = jnp.linspace(0.88, 1.12, S)
    jitter = jax.random.uniform(k3, (B, N, S)) * (0.24 / S)
    z_vals = jnp.sort(base[None, None, :] + jitter, axis=-1)[..., None]
    pts = origins[:, :, None, :] + dirs[:, :, None, :] * z_vals
    return siren, params, styles, pts, origins, dirs, z_vals


def xla_reference(siren, params, styles, pts, origins, dirs, z_vals, key,
                  noise_std=0.0, clamp_mode="relu", white_back=False,
                  last_back=False):
    """The exact XLA composition from `points_forward` (generator.py)."""
    b, n, s, _ = pts.shape
    k_pdf, k_nc, k_nf = jax.random.split(key, 3)
    rgb_c, sig_c = siren.apply(params, pts.reshape(b, n * s, 3), styles, split=True)
    rgb_c = rgb_c.reshape(b, n, s, -1)
    sig_c = sig_c.reshape(b, n, s, 1)
    fine_pts, fine_z = volume_lib.get_fine_points_from_sigma(
        k_pdf, sig_c, z_vals, clamp_mode=clamp_mode, noise_std=noise_std,
        num_steps=s, ray_origins=origins, ray_directions=dirs, noise_key=k_nc,
    )
    rgb_f, sig_f = siren.apply(params, fine_pts.reshape(b, n * s, 3), styles, split=True)
    all_rgb = jnp.concatenate([rgb_f.reshape(b, n, s, -1), rgb_c], axis=-2)
    all_sig = jnp.concatenate([sig_f.reshape(b, n, s, 1), sig_c], axis=-2)
    all_z = jnp.concatenate([fine_z, z_vals], axis=-2)
    fea, depth, _ = volume_lib.volume_render_unsorted(
        all_rgb, all_sig, all_z, noise_key=k_nf, noise_std=noise_std,
        white_back=white_back, last_back=last_back, clamp_mode=clamp_mode,
    )
    return fea, depth


@pytest.mark.parametrize("tile", [32, 64])
def test_forward_parity_f32(setup, tile):
    siren, params, styles, pts, origins, dirs, z_vals = setup
    key = jax.random.PRNGKey(11)
    ref_fea, ref_dep = xla_reference(siren, params, styles, pts, origins, dirs, z_vals, key)
    fea, dep = fused_ray_render(
        params["params"], styles, pts, origins, dirs, z_vals, key, tile=tile,
    )
    np.testing.assert_allclose(np.asarray(fea), np.asarray(ref_fea), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dep), np.asarray(ref_dep), rtol=2e-4, atol=2e-5)


def test_forward_parity_padded_tile(setup):
    """n=64 with tile=48: the ray axis pads to 96 and slices back."""
    siren, params, styles, pts, origins, dirs, z_vals = setup
    key = jax.random.PRNGKey(12)
    ref_fea, ref_dep = xla_reference(siren, params, styles, pts, origins, dirs, z_vals, key)
    fea, dep = fused_ray_render(
        params["params"], styles, pts, origins, dirs, z_vals, key, tile=48,
    )
    np.testing.assert_allclose(np.asarray(fea), np.asarray(ref_fea), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dep), np.asarray(ref_dep), rtol=2e-4, atol=2e-5)


def test_forward_parity_noise(setup):
    """Traced noise_std (the training schedule): draws must line up."""
    siren, params, styles, pts, origins, dirs, z_vals = setup
    key = jax.random.PRNGKey(13)
    ns = jnp.asarray(0.4, jnp.float32)  # traced scalar, like the schedule
    ref_fea, ref_dep = xla_reference(
        siren, params, styles, pts, origins, dirs, z_vals, key, noise_std=ns
    )
    fea, dep = fused_ray_render(
        params["params"], styles, pts, origins, dirs, z_vals, key,
        noise_std=ns, tile=32,
    )
    np.testing.assert_allclose(np.asarray(fea), np.asarray(ref_fea), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dep), np.asarray(ref_dep), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize(
    "kwargs",
    [dict(white_back=True), dict(last_back=True), dict(clamp_mode="softplus")],
    ids=["white_back", "last_back", "softplus"],
)
def test_forward_parity_variants(setup, kwargs):
    siren, params, styles, pts, origins, dirs, z_vals = setup
    key = jax.random.PRNGKey(14)
    ref_fea, ref_dep = xla_reference(
        siren, params, styles, pts, origins, dirs, z_vals, key, **kwargs
    )
    fea, dep = fused_ray_render(
        params["params"], styles, pts, origins, dirs, z_vals, key, tile=32, **kwargs
    )
    np.testing.assert_allclose(np.asarray(fea), np.asarray(ref_fea), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dep), np.asarray(ref_dep), rtol=2e-4, atol=2e-5)


def test_fast_sin_mode(setup):
    """fast_sin kernel vs fast_sin XLA path (same polynomial both sides)."""
    key = jax.random.PRNGKey(15)
    siren_fs = NeRFNetwork(hidden_dim=H, hidden_layers=2, rgb_dim=R,
                           fast_sin=True, dtype=jnp.float32)
    _, params, styles, pts, origins, dirs, z_vals = setup
    ref_fea, ref_dep = xla_reference(
        siren_fs, params, styles, pts, origins, dirs, z_vals, key
    )
    fea, dep = fused_ray_render(
        params["params"], styles, pts, origins, dirs, z_vals, key,
        tile=32, fast_sin=True,
    )
    np.testing.assert_allclose(np.asarray(fea), np.asarray(ref_fea), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dep), np.asarray(ref_dep), rtol=2e-4, atol=2e-5)


def _assert_grads_close(a, b, tol=1e-4, msg=""):
    """Gradient comparison normalized by the leaf's magnitude: elementwise
    rtol is meaningless on near-zero entries of leaves whose max |g| is 1e4
    (measured agreement of the two paths is ~1e-6 of max |g|)."""
    a, b = np.asarray(a), np.asarray(b)
    scale = np.abs(b).max() + 1.0
    err = np.abs(a - b).max() / scale
    assert err < tol, f"{msg}: normalized grad err {err:.3e} (scale {scale:.3e})"


@pytest.mark.parametrize("impl", ["jnp", "pallas", "pallas_residual"])
def test_grad_parity(setup, impl):
    """d(siren params), d(styles) through the fused path must match the XLA
    path (custom VJP; resample stop-gradient both sides) — for both the
    jax.vjp-of-jnp-mirror backward and the hand-written Pallas backward."""
    siren, params, styles, pts, origins, dirs, z_vals = setup
    key = jax.random.PRNGKey(21)

    def loss_fused(params, styles):
        fea, _ = fused_ray_render(
            params["params"], styles, pts, origins, dirs, z_vals, key,
            tile=32, tile_bwd=32, vjp_impl=impl,
        )
        return jnp.sum(fea * fea)

    def loss_xla(params, styles):
        fea, _ = xla_reference(siren, params, styles, pts, origins, dirs, z_vals, key)
        return jnp.sum(fea * fea)

    gp_f, gs_f = jax.grad(loss_fused, argnums=(0, 1))(params, styles)
    gp_x, gs_x = jax.grad(loss_xla, argnums=(0, 1))(params, styles)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(gp_f),
        jax.tree_util.tree_leaves_with_path(gp_x),
    ):
        _assert_grads_close(a, b, msg=jax.tree_util.keystr(path))
    for k in styles:
        _assert_grads_close(gs_f[k], gs_x[k], msg=k)


@pytest.mark.parametrize("impl", ["jnp", "pallas", "pallas_residual"])
def test_grad_parity_noise(setup, impl):
    """Gradients with the density-noise schedule active (traced noise_std)."""
    siren, params, styles, pts, origins, dirs, z_vals = setup
    key = jax.random.PRNGKey(22)
    ns = jnp.asarray(0.4, jnp.float32)

    def loss_fused(params):
        fea, _ = fused_ray_render(
            params["params"], styles, pts, origins, dirs, z_vals, key,
            noise_std=ns, tile=32, tile_bwd=32, vjp_impl=impl,
        )
        return jnp.sum(fea * fea)

    def loss_xla(params):
        fea, _ = xla_reference(
            siren, params, styles, pts, origins, dirs, z_vals, key, noise_std=ns
        )
        return jnp.sum(fea * fea)

    gp_f = jax.grad(loss_fused)(params)
    gp_x = jax.grad(loss_xla)(params)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(gp_f),
        jax.tree_util.tree_leaves_with_path(gp_x),
    ):
        _assert_grads_close(a, b, msg=jax.tree_util.keystr(path))


def test_generator_train_grads():
    """jax.grad through the full generator: fused_ray off == on, for both
    backward implementations selected via GeneratorConfig.fused_ray_vjp."""
    from cips3d_tpu.models.generator import (
        GeneratorConfig, GeneratorNerfINR, RenderOptions, sample_zs,
    )

    kwargs = dict(
        z_dim_nerf=16, z_dim_inr=32, nerf_hidden_dim=H, nerf_style_dim=H,
        nerf_rgb_dim=R, nerf_mapping_layers=2, inr_hidden_dim=32,
        inr_style_dim=32, inr_mapping_layers=2,
    )
    opts = RenderOptions(img_size=8, num_steps=6, nerf_noise=jnp.asarray(0.2))
    key = jax.random.PRNGKey(0)
    zs = sample_zs(key, 2, GeneratorConfig(**kwargs))

    grads = {}
    configs = {
        "xla": dict(fused_ray=False),
        "pallas": dict(fused_ray=True, fused_ray_vjp="pallas"),
        "residual": dict(fused_ray=True, fused_ray_vjp="pallas_residual"),
    }
    for name, extra in configs.items():
        gen = GeneratorNerfINR(cfg=GeneratorConfig(**extra, **kwargs))
        params = gen.init(jax.random.PRNGKey(1), zs, jax.random.PRNGKey(2), opts)

        def loss(p):
            img, aux = gen.apply(p, zs, jax.random.PRNGKey(3), opts,
                                 return_aux_img=True)
            return jnp.sum(img * img) + jnp.sum(aux * aux)

        grads[name] = jax.grad(loss)(params)
    for name in ("pallas", "residual"):
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(grads[name]),
            jax.tree_util.tree_leaves_with_path(grads["xla"]),
        ):
            _assert_grads_close(
                a, b, tol=3e-4, msg=f"{name}{jax.tree_util.keystr(path)}")


def test_generator_level_parity():
    """GeneratorNerfINR(fused_ray=True) == (False) on the same key (f32)."""
    from cips3d_tpu.models.generator import (
        GeneratorConfig, GeneratorNerfINR, RenderOptions, sample_zs,
    )

    kwargs = dict(
        z_dim_nerf=16, z_dim_inr=32, nerf_hidden_dim=H, nerf_style_dim=H,
        nerf_rgb_dim=R, nerf_mapping_layers=2, inr_hidden_dim=32,
        inr_style_dim=32, inr_mapping_layers=2,
    )
    opts = RenderOptions(img_size=8, num_steps=6)
    key = jax.random.PRNGKey(0)
    zs = sample_zs(key, 2, GeneratorConfig(**kwargs))

    imgs = {}
    for fused in (False, True):
        gen = GeneratorNerfINR(cfg=GeneratorConfig(fused_ray=fused, **kwargs))
        params = gen.init(jax.random.PRNGKey(1), zs, jax.random.PRNGKey(2), opts)
        img, aux = gen.apply(params, zs, jax.random.PRNGKey(3), opts)
        imgs[fused] = (np.asarray(img), np.asarray(aux))
    np.testing.assert_allclose(imgs[True][0], imgs[False][0], rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(imgs[True][1], imgs[False][1], rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize(
    "kwargs",
    [dict(white_back=True), dict(last_back=True), dict(clamp_mode="softplus"),
     dict(fast_sin=True)],
    ids=["white_back", "last_back", "softplus", "fast_sin"],
)
def test_grad_parity_variants_pallas_bwd(setup, kwargs):
    """Pallas backward vs jnp-mirror backward across the static variants
    (incl. fast_sin, whose backward uses the polynomial derivative)."""
    siren, params, styles, pts, origins, dirs, z_vals = setup
    key = jax.random.PRNGKey(23)

    def loss(params, impl):
        fea, _ = fused_ray_render(
            params["params"], styles, pts, origins, dirs, z_vals, key,
            tile=32, tile_bwd=32, vjp_impl=impl, **kwargs,
        )
        return jnp.sum(fea * fea)

    gj = jax.grad(lambda p: loss(p, "jnp"))(params)
    for impl in ("pallas", "pallas_residual"):
        gp = jax.grad(lambda p: loss(p, impl))(params)
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(gp),
            jax.tree_util.tree_leaves_with_path(gj),
        ):
            _assert_grads_close(a, b, msg=f"{impl}:{jax.tree_util.keystr(path)}")


def test_camera_grads_pallas_bwd(setup):
    """d(origins), d(dirs), d(pts) from the Pallas backward (the diffcam
    camera-optimization path) must match the jnp-mirror backward."""
    siren, params, styles, pts, origins, dirs, z_vals = setup
    key = jax.random.PRNGKey(24)

    def loss(p, o, d, impl):
        fea, _ = fused_ray_render(
            params["params"], styles, p, o, d, z_vals, key,
            tile=32, tile_bwd=32, vjp_impl=impl,
        )
        return jnp.sum(fea * fea)

    for argnum, name in [(0, "pts"), (1, "origins"), (2, "dirs")]:
        gb = jax.grad(lambda *a: loss(*a, "jnp"), argnums=argnum)(pts, origins, dirs)
        for impl in ("pallas", "pallas_residual"):
            ga = jax.grad(lambda *a: loss(*a, impl), argnums=argnum)(pts, origins, dirs)
            _assert_grads_close(ga, gb, msg=f"{impl}:{name}")


def _depth_setup(hidden_layers):
    """Siren + params + styles + rays for an arbitrary-depth SIREN."""
    key = jax.random.PRNGKey(0)
    siren = NeRFNetwork(
        hidden_dim=H, hidden_layers=hidden_layers, rgb_dim=R, dtype=jnp.float32
    )
    styles = {
        f"nerf_w{i}": jax.random.normal(jax.random.PRNGKey(1 + i), (B, STYLE))
        for i in range(hidden_layers)
    }
    styles["nerf_rgb"] = jax.random.normal(jax.random.PRNGKey(9), (B, STYLE))
    params = siren.init(key, jnp.zeros((B, 8, 3)), styles)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    origins = jax.random.normal(k1, (B, N, 3)) * 0.05
    dirs_raw = jax.random.normal(k2, (B, N, 3)) + jnp.array([0.0, 0.0, -1.0])
    dirs = dirs_raw / jnp.linalg.norm(dirs_raw, axis=-1, keepdims=True)
    base = jnp.linspace(0.88, 1.12, S)
    jitter = jax.random.uniform(k3, (B, N, S)) * (0.24 / S)
    z_vals = jnp.sort(base[None, None, :] + jitter, axis=-1)[..., None]
    pts = origins[:, :, None, :] + dirs[:, :, None, :] * z_vals
    return siren, params, styles, pts, origins, dirs, z_vals


@pytest.mark.parametrize("depth", [1, 3])
def test_forward_parity_depth(depth):
    """The kernel is depth-generic (round-4 generalization of the round-3
    film_0/film_1 hardcoding): forward parity at hidden_layers != 2."""
    siren, params, styles, pts, origins, dirs, z_vals = _depth_setup(depth)
    key = jax.random.PRNGKey(31)
    ref_fea, ref_dep = xla_reference(
        siren, params, styles, pts, origins, dirs, z_vals, key
    )
    fea, dep = fused_ray_render(
        params["params"], styles, pts, origins, dirs, z_vals, key, tile=32,
    )
    np.testing.assert_allclose(np.asarray(fea), np.asarray(ref_fea), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dep), np.asarray(ref_dep), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("impl", ["pallas", "pallas_residual"])
@pytest.mark.parametrize("depth", [1, 3])
def test_grad_parity_depth(depth, impl):
    """Both hand-written backwards at hidden_layers != 2 vs the XLA path."""
    siren, params, styles, pts, origins, dirs, z_vals = _depth_setup(depth)
    key = jax.random.PRNGKey(32)

    def loss_fused(params, styles):
        fea, _ = fused_ray_render(
            params["params"], styles, pts, origins, dirs, z_vals, key,
            tile=32, tile_bwd=32, vjp_impl=impl,
        )
        return jnp.sum(fea * fea)

    def loss_xla(params, styles):
        fea, _ = xla_reference(siren, params, styles, pts, origins, dirs, z_vals, key)
        return jnp.sum(fea * fea)

    gp_f, gs_f = jax.grad(loss_fused, argnums=(0, 1))(params, styles)
    gp_x, gs_x = jax.grad(loss_xla, argnums=(0, 1))(params, styles)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(gp_f),
        jax.tree_util.tree_leaves_with_path(gp_x),
    ):
        _assert_grads_close(a, b, msg=f"d{depth}:{jax.tree_util.keystr(path)}")
    for k in styles:
        _assert_grads_close(gs_f[k], gs_x[k], msg=f"d{depth}:{k}")


class TestConfigGates:
    """GeneratorConfig raises at construction when a fused kernel is
    requested outside its supported layout (round-3 verdict next #6) —
    previously the D-phase picker fell back silently and serving would
    KeyError inside extract_siren_weights."""

    def test_fused_ray_depth_generic(self):
        from cips3d_tpu.models.generator import GeneratorConfig

        # the ray-tile kernel is depth-generic as of round 4: any depth >= 1
        # constructs with fused_ray
        GeneratorConfig(fused_ray=True, nerf_hidden_layers=2)
        GeneratorConfig(fused_ray=True, nerf_hidden_layers=3)
        GeneratorConfig(fused_ray=True, nerf_hidden_layers=1)
        with pytest.raises(ValueError, match="nerf_hidden_layers"):
            GeneratorConfig(fused_ray=True, nerf_hidden_layers=0)

    def test_fused_inr_requires_pre_rgb_3(self):
        from cips3d_tpu.models.generator import GeneratorConfig

        with pytest.raises(ValueError, match="inr_pre_rgb_dim"):
            GeneratorConfig(fused_inr=True, inr_pre_rgb_dim=32)
        GeneratorConfig(fused_inr=True, inr_pre_rgb_dim=3)

    def test_fused_ray_vjp_validated(self):
        from cips3d_tpu.models.generator import GeneratorConfig

        with pytest.raises(ValueError, match="fused_ray_vjp"):
            GeneratorConfig(fused_ray_vjp="typo")

    def test_depth3_generator_step_constructs(self):
        """The auto-picker (train/step.py fused_dphase) now fuses a 3-layer
        SIREN under fast_sin (depth-generic kernel): build the step-fn for a
        tiny depth-3 config and check it constructs."""
        from cips3d_tpu.models.discriminator import DiscriminatorMultiScaleAux
        from cips3d_tpu.models.generator import (
            GeneratorConfig,
            GeneratorNerfINR,
            RenderOptions,
        )
        from cips3d_tpu.train.state import TrainConfig
        from cips3d_tpu.train.step import make_train_step

        gcfg = GeneratorConfig(
            fast_sin=True,
            nerf_hidden_layers=3,
            z_dim_nerf=16,
            z_dim_inr=32,
            nerf_hidden_dim=16,
            nerf_style_dim=16,
            nerf_mapping_layers=2,
            inr_hidden_dim=32,
            inr_style_dim=32,
            inr_mapping_layers=2,
        )
        gen = GeneratorNerfINR(cfg=gcfg)
        disc = DiscriminatorMultiScaleAux(
            max_size=16, channels_override={4: 16, 8: 16, 16: 16}
        )
        tcfg = TrainConfig(img_size=8, batch_size=1)
        step = make_train_step(gen, disc, tcfg, RenderOptions(img_size=8, num_steps=3), aux_reg=True)
        assert callable(step)
