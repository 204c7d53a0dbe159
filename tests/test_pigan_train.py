"""Legacy pi-GAN training-step tests: top-k GAN + identity penalty +
curriculum helpers (reference: exp/dev/nerf_inr/scripts/train_v16.py,
exp/dev/nerf_inr/curriculums.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cips3d_tpu.models.generator import RenderOptions
from cips3d_tpu.models.pigan import ImplicitGenerator3d, ProgressiveDiscriminator
from cips3d_tpu.train import curriculum as C
from cips3d_tpu.train.pigan_step import (
    PiGANTrainConfig,
    init_pigan_state,
    make_pigan_train_step,
    topk_logit_loss,
)

OPTS = RenderOptions(img_size=8, num_steps=3)


class TestTopK:
    def test_full_k_equals_mean(self):
        logits = jnp.array([[1.0], [2.0], [-1.0], [0.5]])
        # step=0 -> frac=1 -> k=4 -> equals the plain mean
        out = topk_logit_loss(logits, jnp.zeros(()), 2000, 0.5)
        np.testing.assert_allclose(
            float(out), float(jnp.mean(jax.nn.softplus(-logits))), rtol=1e-6
        )

    def test_floor_keeps_best_half(self):
        logits = jnp.array([[10.0], [10.0], [-10.0], [-10.0]])
        # huge step -> frac = topk_v = 0.5 -> k=2 -> only the two best logits
        out = topk_logit_loss(logits, jnp.asarray(1e9), 2000, 0.5)
        np.testing.assert_allclose(
            float(out), float(jax.nn.softplus(jnp.asarray(-10.0))), rtol=1e-5
        )


class TestCurriculum:
    def test_extract_metadata_stages(self):
        cur = {0: {"img_size": 32}, 100: {"img_size": 64}, "fov": 12}
        assert C.extract_metadata(cur, 0)["img_size"] == 32
        assert C.extract_metadata(cur, 99)["img_size"] == 32
        assert C.extract_metadata(cur, 100)["img_size"] == 64
        assert C.extract_metadata(cur, 100)["fov"] == 12

    def test_next_upsample(self):
        cur = {0: {"img_size": 32}, 100: {"img_size": 64}, 500: {"img_size": 64}}
        assert C.next_upsample_step(cur, 0) == 100
        assert C.next_upsample_step(cur, 100) == float("inf")

    def test_last_upsample(self):
        cur = {0: {"img_size": 32}, 100: {"img_size": 64}}
        assert C.last_upsample_step(cur, 150) == 100

    def test_builtin_curricula(self):
        md = C.extract_metadata(C.CELEBA, 0)
        assert md["img_size"] == 64 and md["fov"] == 12
        md = C.extract_metadata(C.CARLA, 60000)
        assert md["img_size"] == 128


class TestPiGANStep:
    @pytest.fixture(scope="class")
    def setup(self):
        gen = ImplicitGenerator3d(z_dim=16, hidden_dim=16)
        disc = ProgressiveDiscriminator(predict_encodings=True)
        cfg = PiGANTrainConfig(
            img_size=8, batch_size=2, r1_lambda=0.2, z_lambda=0.0, pos_lambda=15.0,
            ema_start_itr=1,
        )
        key = jax.random.PRNGKey(0)
        state = init_pigan_state(key, gen, disc, cfg, OPTS)
        return gen, disc, cfg, state

    def test_step(self, setup):
        gen, disc, cfg, state = setup
        step_fn = jax.jit(make_pigan_train_step(gen, disc, cfg, OPTS))
        real = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 8, 8)) * 2 - 1
        new_state, m = step_fn(state, real, jax.random.PRNGKey(2))
        assert int(new_state.step) == 1
        for k in ("d_loss", "g_loss", "grad_penalty", "identity_penalty"):
            assert np.isfinite(float(m[k])), k
        assert float(m["identity_penalty"]) > 0  # pos_lambda active
