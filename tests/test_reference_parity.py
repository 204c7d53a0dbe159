"""Parity against the ACTUAL reference torch modules (not hand-written twins).

Imports `/root/reference/exp/cips3d/models/generator.py` (the refactored
`GeneratorNerfINR`, line 1159) and
`/root/reference/exp/dev/nerf_inr/models/generator_nerf_inr_v16.py` (the
class the released checkpoints instantiate, line 1143) through the tl2 stub,
random-inits them with the FFHQ flagship config
(`exp/cips3d/configs/ffhq_exp.yaml:43-82`, `configs/web_demo.yaml:11-48`),
converts their state dicts with `utils/convert_torch.py`, and asserts
forward parity of

  * the dual mapping network (`generator.py:1796-1802`),
  * `points_forward` (coarse SIREN -> volume integration -> INR decode +
    aux head, `generator.py:1659-1762`) on identical world points, and
  * the `idx_grad` gather path (`generator.py:1692-1698`),

in fp32 at rtol ~1e-4.  Hierarchical resampling is excluded here because the
reference's `sample_pdf` draws torch RNG that cannot be keyed to match JAX;
its math has its own golden tests (tests/test_volume.py).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import tl2_stub  # noqa: E402

from cips3d_tpu.core import rays as rays_lib  # noqa: E402
from cips3d_tpu.models.generator import (  # noqa: E402
    GeneratorConfig,
    GeneratorNerfINR,
    RenderOptions,
)
from cips3d_tpu.utils.convert_torch import convert_generator_state_dict  # noqa: E402

NERF_CFG = dict(in_dim=3, hidden_dim=128, hidden_layers=2, rgb_dim=32, style_dim=128)
MAPPING_NERF_CFG = dict(z_dim=256, hidden_dim=128, base_layers=4, head_layers=0)
INR_CFG = dict(input_dim=32, style_dim=512, hidden_dim=512, pre_rgb_dim=3)
MAPPING_INR_CFG = dict(
    z_dim=512, hidden_dim=512, base_layers=8, head_layers=0, add_norm=True, norm_out=True
)
# v16 passes add_norm explicitly in its ctor; its yaml node only sets norm_out
MAPPING_INR_CFG_V16 = dict(
    z_dim=512, hidden_dim=512, base_layers=8, head_layers=0, norm_out=True
)

B, NPIX, NSTEPS = 2, 16, 6


def _to_t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def _build(ref_cls, mapping_inr_cfg):
    torch.manual_seed(0)
    g = ref_cls(
        z_dim=256,
        nerf_cfg=dict(NERF_CFG),
        mapping_nerf_cfg=dict(MAPPING_NERF_CFG),
        inr_cfg=dict(INR_CFG),
        mapping_inr_cfg=dict(mapping_inr_cfg),
        device="cpu",
    ).eval()
    sd = {k: v.detach().numpy() for k, v in g.state_dict().items()}
    params = convert_generator_state_dict(sd)
    return g, params


@pytest.fixture(scope="module")
def refactored():
    tl2_stub.install()
    from exp.cips3d.models import generator as ref_gen

    return _build(ref_gen.GeneratorNerfINR, MAPPING_INR_CFG)


@pytest.fixture(scope="module")
def v16():
    tl2_stub.install()
    from exp.dev.nerf_inr.models import generator_nerf_inr_v16 as ref_v16

    return _build(ref_v16.GeneratorNerfINR, MAPPING_INR_CFG_V16)


@pytest.fixture(scope="module")
def ours():
    return GeneratorNerfINR(cfg=GeneratorConfig())


@pytest.fixture(scope="module")
def world():
    opts = RenderOptions(img_size=4, num_steps=NSTEPS, hierarchical_sample=False)
    return rays_lib.get_world_points_and_direction(
        jax.random.PRNGKey(7),
        batch_size=B,
        num_steps=NSTEPS,
        img_size=4,
        fov=opts.fov,
        ray_start=opts.ray_start,
        ray_end=opts.ray_end,
        h_stddev=0.3,
        v_stddev=0.155,
        h_mean=opts.h_mean,
        v_mean=opts.v_mean,
        sample_dist="gaussian",
    )


def _zs():
    rng = np.random.default_rng(3)
    return (
        rng.standard_normal((B, 256)).astype(np.float32),
        rng.standard_normal((B, 512)).astype(np.float32),
    )


def _torch_styles(g, z_nerf, z_inr):
    with torch.no_grad():
        return g.mapping_network(_to_t(z_nerf), _to_t(z_inr))


def _torch_points_forward(g, styles_t, world, idx_grad=None, num_steps=NSTEPS):
    with torch.no_grad():
        inr, aux = g.points_forward(
            style_dict=styles_t,
            transformed_points=_to_t(world.points),
            transformed_ray_directions_expanded=_to_t(world.dirs_expanded),
            num_steps=num_steps,
            hierarchical_sample=False,
            z_vals=_to_t(world.z_vals),
            clamp_mode="relu",
            nerf_noise=0.0,
            transformed_ray_origins=_to_t(world.origins),
            transformed_ray_directions=_to_t(world.dirs),
            white_back=False,
            last_back=False,
            return_aux_img=True,
            idx_grad=None if idx_grad is None else torch.from_numpy(idx_grad),
        )
    return inr.numpy(), aux.numpy()


def _ours_points_forward(ours, params, styles_t, world, idx_grad=None):
    styles_j = {k: jnp.asarray(v.numpy()) for k, v in styles_t.items()}
    opts = RenderOptions(
        img_size=4, num_steps=NSTEPS, hierarchical_sample=False, nerf_noise=0.0
    )
    inr, aux = ours.apply(
        params,
        styles_j,
        world,
        opts,
        jax.random.PRNGKey(0),
        True,
        None if idx_grad is None else jnp.asarray(idx_grad),
        method=ours.points_forward,
    )
    return np.asarray(inr), np.asarray(aux)


class TestRefactoredGenerator:
    def test_mapping_parity(self, refactored, ours):
        g, params = refactored
        z_nerf, z_inr = _zs()
        styles_t = _torch_styles(g, z_nerf, z_inr)
        styles_j = ours.apply(
            params, jnp.asarray(z_nerf), jnp.asarray(z_inr), method=ours.mapping
        )
        assert set(styles_t) == set(styles_j)
        for k in styles_t:
            np.testing.assert_allclose(
                np.asarray(styles_j[k]), styles_t[k].numpy(), rtol=1e-4, atol=1e-5,
                err_msg=k,
            )

    def test_points_forward_parity(self, refactored, ours, world):
        g, params = refactored
        z_nerf, z_inr = _zs()
        styles_t = _torch_styles(g, z_nerf, z_inr)
        inr_t, aux_t = _torch_points_forward(g, styles_t, world)
        inr_j, aux_j = _ours_points_forward(ours, params, styles_t, world)
        np.testing.assert_allclose(inr_j, inr_t, rtol=1e-4, atol=2e-5)
        np.testing.assert_allclose(aux_j, aux_t, rtol=1e-4, atol=2e-5)

    def test_points_forward_idx_grad(self, refactored, ours, world):
        g, params = refactored
        z_nerf, z_inr = _zs()
        styles_t = _torch_styles(g, z_nerf, z_inr)
        idx = np.array([1, 3, 4, 9, 12], np.int64)
        inr_t, aux_t = _torch_points_forward(g, styles_t, world, idx_grad=idx)
        inr_j, aux_j = _ours_points_forward(ours, params, styles_t, world, idx_grad=idx)
        assert inr_j.shape == (B, len(idx), 3)
        np.testing.assert_allclose(inr_j, inr_t, rtol=1e-4, atol=2e-5)
        np.testing.assert_allclose(aux_j, aux_t, rtol=1e-4, atol=2e-5)


class TestV16Generator:
    """The released-checkpoint class (`configs/web_demo.yaml:12-14`): its
    state-dict layout and forward must both match our model after
    conversion."""

    def test_mapping_parity(self, v16, ours):
        g, params = v16
        z_nerf, z_inr = _zs()
        styles_t = _torch_styles(g, z_nerf, z_inr)
        styles_j = ours.apply(
            params, jnp.asarray(z_nerf), jnp.asarray(z_inr), method=ours.mapping
        )
        assert set(styles_t) == set(styles_j)
        for k in styles_t:
            np.testing.assert_allclose(
                np.asarray(styles_j[k]), styles_t[k].numpy(), rtol=1e-4, atol=1e-5,
                err_msg=k,
            )

    def test_points_forward_parity(self, v16, ours, world):
        g, params = v16
        z_nerf, z_inr = _zs()
        styles_t = _torch_styles(g, z_nerf, z_inr)
        inr_t, aux_t = _torch_points_forward(g, styles_t, world)
        inr_j, aux_j = _ours_points_forward(ours, params, styles_t, world)
        np.testing.assert_allclose(inr_j, inr_t, rtol=1e-4, atol=2e-5)
        np.testing.assert_allclose(aux_j, aux_t, rtol=1e-4, atol=2e-5)

    def test_state_dict_layouts_identical(self, refactored, v16):
        """The v16 and refactored state dicts share the exact key set and
        shapes — the converter provably covers both."""
        sd_a = {k: tuple(v.shape) for k, v in refactored[0].state_dict().items()}
        sd_b = {k: tuple(v.shape) for k, v in v16[0].state_dict().items()}
        assert sd_a == sd_b


class TestReverseConversion:
    """pytree → torch `.pth` (`utils/convert_torch.py::export_generator_state_dict`):
    models trained HERE must be loadable and numerically reproducible by the
    reference torch classes (VERDICT r2 next-#4)."""

    def test_round_trip_exact(self, refactored):
        """torch → pytree → torch is bit-exact on every tensor."""
        from cips3d_tpu.utils.convert_torch import export_generator_state_dict

        g, params = refactored
        sd_ref = {k: v.detach().numpy() for k, v in g.state_dict().items()}
        sd_out = export_generator_state_dict(params)
        assert set(sd_out) == set(sd_ref)
        for k in sd_ref:
            np.testing.assert_array_equal(sd_out[k], sd_ref[k], err_msg=k)

    @pytest.mark.parametrize("which", ["refactored", "v16"])
    def test_torch_reproduces_jax_forward(self, refactored, v16, ours, world, which):
        """A FRESH JAX-initialized model (never seen by torch) exports to a
        state dict both reference classes load with strict=True and then
        reproduce our mapping + points_forward at rtol 1e-4."""
        from cips3d_tpu.models.generator import RenderOptions as RO
        from cips3d_tpu.models.generator import sample_zs
        from cips3d_tpu.utils.convert_torch import export_generator_state_dict

        key = jax.random.PRNGKey(42)
        zs0 = sample_zs(key, 1, ours.cfg)
        params = ours.init(key, zs0, key, RO(img_size=4, num_steps=NSTEPS))
        sd = export_generator_state_dict(params)

        g_src = (refactored if which == "refactored" else v16)[0]
        g_new = type(g_src)(
            z_dim=256,
            nerf_cfg=dict(NERF_CFG),
            mapping_nerf_cfg=dict(MAPPING_NERF_CFG),
            inr_cfg=dict(INR_CFG),
            mapping_inr_cfg=dict(
                MAPPING_INR_CFG if which == "refactored" else MAPPING_INR_CFG_V16
            ),
            device="cpu",
        ).eval()
        missing, unexpected = g_new.load_state_dict(
            {k: torch.from_numpy(v) for k, v in sd.items()}, strict=True
        )
        assert not missing and not unexpected

        z_nerf, z_inr = _zs()
        styles_t = _torch_styles(g_new, z_nerf, z_inr)
        styles_j = ours.apply(
            params, jnp.asarray(z_nerf), jnp.asarray(z_inr), method=ours.mapping
        )
        for k in styles_t:
            np.testing.assert_allclose(
                np.asarray(styles_j[k]), styles_t[k].numpy(), rtol=1e-4, atol=1e-5,
                err_msg=k,
            )
        inr_t, aux_t = _torch_points_forward(g_new, styles_t, world)
        inr_j, aux_j = _ours_points_forward(ours, params, styles_t, world)
        np.testing.assert_allclose(inr_j, inr_t, rtol=1e-4, atol=2e-5)
        np.testing.assert_allclose(aux_j, aux_t, rtol=1e-4, atol=2e-5)

    def test_reference_ckpt_dir_layout(self, refactored, tmp_path):
        """export_reference_checkpoint_dir emits the dir-of-modules layout
        (`train.py:56-83`) and the files reload through the FORWARD
        converter unchanged."""
        from cips3d_tpu.utils.convert_torch import (
            convert_generator_checkpoint,
            export_reference_checkpoint_dir,
        )

        _, params = refactored
        out = tmp_path / "ckpt"
        export_reference_checkpoint_dir(str(out), G_ema=params, info_msg="step 0")
        assert (out / "G_ema_model.pth").exists() and (out / "info.txt").exists()
        back = convert_generator_checkpoint(str(out / "G_ema_model.pth"))
        flat_a = jax.tree_util.tree_leaves(params)
        flat_b = jax.tree_util.tree_leaves(back)
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
