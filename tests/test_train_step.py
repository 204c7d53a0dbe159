"""End-to-end train-step tests on a tiny model (reference loop:
exp/cips3d/scripts/train.py:312-491)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cips3d_tpu.models.discriminator import DiscriminatorMultiScaleAux
from cips3d_tpu.models.generator import GeneratorConfig, GeneratorNerfINR, RenderOptions
from cips3d_tpu.train.state import TrainConfig, clip_and_guard
from cips3d_tpu.train.step import init_train_state, make_train_step

GCFG = GeneratorConfig(
    z_dim_nerf=16,
    z_dim_inr=32,
    nerf_hidden_dim=16,
    nerf_style_dim=16,
    nerf_mapping_layers=2,
    inr_hidden_dim=32,
    inr_style_dim=32,
    inr_mapping_layers=2,
)
OPTS = RenderOptions(img_size=8, num_steps=3)
TINY = {4: 16, 8: 16, 16: 16, 32: 16, 64: 16, 128: 16, 256: 16, 512: 16, 1024: 16}
TCFG = TrainConfig(img_size=8, batch_size=2, grad_points=None, ema_start_itr=1)


@pytest.fixture(scope="module")
def setup():
    gen = GeneratorNerfINR(cfg=GCFG)
    disc = DiscriminatorMultiScaleAux(max_size=16, channels_override=TINY)
    key = jax.random.PRNGKey(0)
    state = init_train_state(key, gen, disc, TCFG, OPTS)
    return gen, disc, state


class TestTrainStep:
    def test_single_step_updates_params(self, setup):
        gen, disc, state = setup
        step_fn = jax.jit(make_train_step(gen, disc, TCFG, OPTS, aux_reg=False))
        real = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 8, 8)) * 2 - 1
        new_state, metrics = step_fn(state, real, jax.random.PRNGKey(2))
        assert int(new_state.step) == 1
        for k in ("d_loss", "g_loss", "grad_penalty", "d_total_norm", "g_total_norm"):
            assert np.isfinite(float(metrics[k])), k
        # params actually moved
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), state.g_params, new_state.g_params
        )
        assert max(jax.tree_util.tree_leaves(diff)) > 0

    def test_aux_step(self, setup):
        gen, disc, state = setup
        step_fn = jax.jit(make_train_step(gen, disc, TCFG, OPTS, aux_reg=True))
        real = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 8, 8)) * 2 - 1
        new_state, metrics = step_fn(state, real, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["d_loss"]))
        # aux disc params must receive gradient signal
        aux_diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            state.d_params["params"]["aux_disc"],
            new_state.d_params["params"]["aux_disc"],
        )
        assert max(jax.tree_util.tree_leaves(aux_diff)) > 0

    def test_r1_penalty_positive(self, setup):
        gen, disc, state = setup
        step_fn = jax.jit(make_train_step(gen, disc, TCFG, OPTS, aux_reg=False))
        real = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 8, 8)) * 2 - 1
        _, metrics = step_fn(state, real, jax.random.PRNGKey(2))
        assert float(metrics["grad_penalty"]) > 0

    def test_no_r1_variant(self, setup):
        gen, disc, state = setup
        step_fn = jax.jit(
            make_train_step(gen, disc, TCFG, OPTS, aux_reg=False, d_regularize=False)
        )
        real = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 8, 8)) * 2 - 1
        _, metrics = step_fn(state, real, jax.random.PRNGKey(2))
        assert float(metrics["grad_penalty"]) == 0

    def test_two_steps_progress(self, setup):
        gen, disc, state = setup
        step_fn = jax.jit(make_train_step(gen, disc, TCFG, OPTS, aux_reg=False))
        real = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 8, 8)) * 2 - 1
        s1, m1 = step_fn(state, real, jax.random.PRNGKey(2))
        s2, m2 = step_fn(s1, real, jax.random.PRNGKey(3))
        assert int(s2.step) == 2
        assert np.isfinite(float(m2["d_loss"]))

    def test_ema_tracks_after_start(self, setup):
        """ema_start_itr=1 -> the second step lerps EMA toward G."""
        gen, disc, state = setup
        step_fn = jax.jit(make_train_step(gen, disc, TCFG, OPTS, aux_reg=False))
        real = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 8, 8)) * 2 - 1
        s1, _ = step_fn(state, real, jax.random.PRNGKey(2))
        # step 0: frozen (step < start_itr)
        d0 = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.ema_params, state.ema_params
        )
        assert max(jax.tree_util.tree_leaves(d0)) == 0
        s2, _ = step_fn(s1, real, jax.random.PRNGKey(3))
        d1 = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), s2.ema_params, s1.ema_params
        )
        assert max(jax.tree_util.tree_leaves(d1)) > 0

    def test_batch_split_accumulation(self, setup):
        gen, disc, state = setup
        cfg = dataclasses.replace(TCFG, batch_split=2)
        step_fn = jax.jit(make_train_step(gen, disc, cfg, OPTS, aux_reg=False))
        real = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 8, 8)) * 2 - 1
        new_state, metrics = step_fn(state, real, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["g_loss"]))


class TestClipGuard:
    def test_clip(self):
        g = {"w": jnp.ones(4) * 100.0}
        clipped, norm, finite = clip_and_guard(g, 1.0)
        assert bool(finite)
        np.testing.assert_allclose(float(norm), 200.0, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(clipped["w"]), np.ones(4) * 0.5, rtol=1e-4
        )

    def test_nan_guard(self):
        g = {"w": jnp.array([1.0, jnp.nan])}
        clipped, norm, finite = clip_and_guard(g, 1.0)
        assert not bool(finite)
        np.testing.assert_allclose(np.asarray(clipped["w"]), 0.0)

    def test_under_threshold_unchanged(self):
        g = {"w": jnp.ones(4) * 0.1}
        clipped, _, _ = clip_and_guard(g, 10.0)
        np.testing.assert_allclose(np.asarray(clipped["w"]), 0.1, rtol=1e-5)


def test_explicit_fused_dphase_depth0_raises():
    """An EXPLICIT fused_dphase=True on a depth-0 generator must raise (the
    fused ray-tile kernel has no depth-0 form) — only the auto-pick (None)
    may silently keep the XLA D-phase, else an A/B over this flag on such a
    config measures two identical programs."""
    gcfg = dataclasses.replace(GCFG, nerf_hidden_layers=0, fast_sin=True)
    gen = GeneratorNerfINR(cfg=gcfg)
    disc = DiscriminatorMultiScaleAux(max_size=16, channels_override=TINY)
    # auto (None): silently keeps XLA — must NOT raise
    make_train_step(gen, disc, TCFG, OPTS, aux_reg=False)
    with pytest.raises(ValueError, match="nerf_hidden_layers"):
        make_train_step(
            gen, disc, dataclasses.replace(TCFG, fused_dphase=True),
            OPTS, aux_reg=False,
        )


def test_fused_dphase_inr_matches():
    """TrainConfig.fused_dphase_inr routes the D-phase fake generation's INR
    decode through the fused Pallas kernel (forward-only — legal because the
    D-phase fakes are stop-gradient); the step must produce the same metrics
    as the XLA path on the same keys."""
    gen = GeneratorNerfINR(cfg=GCFG)
    disc = DiscriminatorMultiScaleAux(max_size=32, channels_override=TINY)
    opts = RenderOptions(img_size=32, num_steps=3)
    real = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 32, 32)) * 2 - 1
    metrics = {}
    for fused in (False, True):
        tcfg = dataclasses.replace(
            TCFG, img_size=32, fused_dphase_inr=fused
        )
        state = init_train_state(jax.random.PRNGKey(0), gen, disc, tcfg, opts)
        step_fn = jax.jit(make_train_step(gen, disc, tcfg, opts, aux_reg=False))
        _, metrics[fused] = step_fn(state, real, jax.random.PRNGKey(2))
    for k in ("d_loss", "g_loss", "d_logits_fake"):
        a, b = float(metrics[True][k]), float(metrics[False][k])
        assert np.isfinite(a), k
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-4, err_msg=k)
