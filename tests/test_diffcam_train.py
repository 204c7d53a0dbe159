"""Diffcam training-step test: three optimizers (G, D, camera) all move
(reference: exp/cips3d_inversion/scripts/train.py:300-520)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cips3d_tpu.models.camera import CamParams
from cips3d_tpu.models.discriminator import DiscriminatorMultiScaleAux
from cips3d_tpu.models.generator import GeneratorConfig
from cips3d_tpu.models.generator_diffcam import GeneratorDiffcam, NerfKwargs
from cips3d_tpu.train.diffcam_step import (
    DiffcamTrainConfig,
    init_diffcam_state,
    make_diffcam_train_step,
)

TINY = {r: 16 for r in (4, 8, 16, 32, 64, 128, 256, 512, 1024)}
GCFG = GeneratorConfig(
    z_dim_nerf=16, z_dim_inr=32, nerf_hidden_dim=16, nerf_style_dim=16,
    nerf_mapping_layers=2, inr_hidden_dim=32, inr_style_dim=32, inr_mapping_layers=2,
)


class TestDiffcamStep:
    def test_all_three_optimizers_move(self):
        gen = GeneratorDiffcam(cfg=GCFG)
        disc = DiscriminatorMultiScaleAux(max_size=16, channels_override=TINY)
        cam = CamParams(H0=8, W0=8)
        cfg = DiffcamTrainConfig(img_size=8, batch_size=2, grad_points=None, ema_start_itr=1)
        nk = NerfKwargs(n_samples=3, n_importance=3)
        key = jax.random.PRNGKey(0)
        state = init_diffcam_state(key, gen, disc, cam, cfg, nk)
        step_fn = jax.jit(make_diffcam_train_step(gen, disc, cam, cfg, nk))
        real = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 8, 8)) * 2 - 1
        new_state, m = step_fn(state, real, jax.random.PRNGKey(2))
        assert int(new_state.step) == 1
        for k in ("d_loss", "g_loss", "cam_total_norm"):
            assert np.isfinite(float(m[k])), k
        # camera params moved
        cam_diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), state.cam_params, new_state.cam_params
        )
        assert max(jax.tree_util.tree_leaves(cam_diff)) > 0
        assert float(m["cam_total_norm"]) > 0
