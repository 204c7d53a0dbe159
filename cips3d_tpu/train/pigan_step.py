"""pi-GAN-style training step: top-k GAN + identity penalty.

Counterpart of the legacy curriculum loop
(`exp/dev/nerf_inr/scripts/train_v16.py:517-760`, original pi-GAN
`piGAN_lib/train.py`), whose extra features the refactored CIPS-3D loop
dropped (SURVEY §2.7):

  * **top-k GAN** (`train_v16.py:701-711`): keep only the top
    ceil(max(0.99^(step/topk_interval), topk_v) * n) generator logits in the
    G loss.  Dynamic k is a traced scalar; static shapes are kept by sorting
    the logits and masking with `arange(n) < k`.
  * **identity penalty** (`train_v16.py:619-634,713-725`): the encoder
    discriminator also predicts the latent and the camera position; MSE
    against the true z (weight ``z_lambda``) and the sampled pitch/yaw
    (weight ``pos_lambda``) is added to both D and G losses.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from cips3d_tpu.core.ema import ema_update
from cips3d_tpu.models.generator import RenderOptions
from cips3d_tpu.train import losses
from cips3d_tpu.train.state import TrainConfig, TrainState, clip_and_guard, make_optimizers


def topk_logit_loss(logits: jnp.ndarray, step, topk_interval: int, topk_v: float) -> jnp.ndarray:
    """mean softplus(-logits) over the top-k logits (`train_v16.py:701-711`).

    k = ceil(max(0.99^(step/interval), topk_v) * n), traced.
    """
    n = logits.shape[0]
    frac = jnp.maximum(0.99 ** (step / topk_interval), topk_v)
    k = jnp.ceil(frac * n)
    sorted_desc = -jnp.sort(-logits, axis=0)  # descending
    mask = (jnp.arange(n)[:, None] < k).astype(logits.dtype)
    return jnp.sum(jax.nn.softplus(-sorted_desc) * mask) / jnp.maximum(k, 1.0)


def identity_penalty(
    pred_latent, pred_position, z, positions, z_lambda: float, pos_lambda: float
) -> jnp.ndarray:
    """MSE(latent, z)*z_lambda + MSE(position, pitch_yaw)*pos_lambda
    (`train_v16.py:619-634`)."""
    pen = 0.0
    if z_lambda > 0 and pred_latent is not None:
        pen = pen + z_lambda * jnp.mean((pred_latent - z) ** 2)
    if pos_lambda > 0 and pred_position is not None:
        pen = pen + pos_lambda * jnp.mean((pred_position - positions) ** 2)
    return pen


@dataclasses.dataclass(frozen=True)
class PiGANTrainConfig(TrainConfig):
    """Extra knobs of the legacy loop (curriculum keys,
    `curriculums.py:85-120`)."""

    topk_interval: int = 2000
    topk_v: float = 0.6
    z_lambda: float = 0.0
    pos_lambda: float = 15.0


def make_pigan_train_step(
    generator,
    discriminator,
    cfg: PiGANTrainConfig,
    opts: RenderOptions,
):
    """One D+G+EMA step for ImplicitGenerator3d + ProgressiveDiscriminator
    (encoder variant when identity penalties are on)."""
    g_tx, d_tx = make_optimizers(cfg)

    def render_opts(step):
        from cips3d_tpu.train.schedules import nerf_noise_schedule

        return dataclasses.replace(
            opts, img_size=cfg.img_size,
            nerf_noise=nerf_noise_schedule(step, cfg.nerf_noise_disable),
        )

    def d_loss_fn(d_params, g_params, real_imgs, step, alpha, key):
        k_z, k_g = jax.random.split(key)
        z = jax.random.normal(k_z, (real_imgs.shape[0], generator.z_dim))
        fake_imgs, fake_pos = generator.apply(g_params, z, k_g, render_opts(step))
        fake_imgs = jax.lax.stop_gradient(fake_imgs)
        fake_pos = jax.lax.stop_gradient(fake_pos)

        def d_apply(x):
            return discriminator.apply(d_params, x, alpha)

        if cfg.r1_lambda > 0:
            penalty, r_out = losses.r1_penalty(
                lambda x: d_apply(x)[0], real_imgs, cfg.r1_lambda, cfg.d_reg_every
            )
            real_logits = r_out
        else:
            real_logits, _, _ = d_apply(real_imgs)
            penalty = jnp.zeros_like(real_logits)

        fake_logits, pred_latent, pred_position = d_apply(fake_imgs)
        id_pen = identity_penalty(
            pred_latent, pred_position, z, fake_pos, cfg.z_lambda, cfg.pos_lambda
        )
        loss = (
            jnp.mean(jax.nn.softplus(fake_logits))
            + jnp.mean(jax.nn.softplus(-real_logits))
            + jnp.mean(penalty)
            + id_pen
        )
        return loss, {
            "d_loss": loss,
            "grad_penalty": jnp.mean(penalty),
            "identity_penalty": jnp.asarray(id_pen),
        }

    def g_loss_fn(g_params, d_params, z, step, alpha, key):
        fake_imgs, fake_pos = generator.apply(g_params, z, key, render_opts(step))
        fake_logits, pred_latent, pred_position = discriminator.apply(
            d_params, fake_imgs.astype(jnp.float32), alpha
        )
        gan_loss = topk_logit_loss(fake_logits, step, cfg.topk_interval, cfg.topk_v) \
            if cfg.topk_v > 0 else jnp.mean(jax.nn.softplus(-fake_logits))
        id_pen = identity_penalty(
            pred_latent, pred_position, z, fake_pos, cfg.z_lambda, cfg.pos_lambda
        )
        loss = gan_loss + id_pen
        return loss, {"g_loss": loss}

    def step_fn(state: TrainState, real_imgs, key):
        from cips3d_tpu.train.schedules import alpha_schedule

        step = state.step
        # uint8 loader batches normalize on device (flagship convention)
        if real_imgs.dtype == jnp.uint8:
            real_imgs = real_imgs.astype(jnp.float32) / 127.5 - 1.0
        alpha = alpha_schedule(step, cfg.warmup_d, cfg.fade_steps)
        k_d, k_z, k_g = jax.random.split(key, 3)

        d_grads, d_metrics = jax.grad(d_loss_fn, has_aux=True)(
            state.d_params, state.g_params, real_imgs, step, alpha, k_d
        )
        d_grads, d_norm, d_finite = clip_and_guard(d_grads, cfg.grad_clip)
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = jax.tree_util.tree_map(jnp.add, state.d_params, d_updates)

        z = jax.random.normal(k_z, (real_imgs.shape[0], generator.z_dim))
        g_grads, g_metrics = jax.grad(g_loss_fn, has_aux=True)(
            state.g_params, d_params, z, step, alpha, k_g
        )
        g_grads, g_norm, g_finite = clip_and_guard(g_grads, cfg.grad_clip)
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = jax.tree_util.tree_map(jnp.add, state.g_params, g_updates)

        ema_params = ema_update(state.ema_params, g_params, step, cfg.ema_decay, cfg.ema_start_itr)
        new_state = state.replace(
            step=step + 1, g_params=g_params, d_params=d_params,
            g_opt=g_opt, d_opt=d_opt, ema_params=ema_params,
        )
        metrics: Dict[str, Any] = dict(d_metrics)
        metrics.update(g_metrics)
        metrics.update({
            "d_total_norm": d_norm, "g_total_norm": g_norm,
            "d_finite": d_finite.astype(jnp.float32),
            "g_finite": g_finite.astype(jnp.float32),
        })
        return new_state, metrics

    return step_fn


def init_pigan_state(key, generator, discriminator, cfg: PiGANTrainConfig, opts: RenderOptions):
    k_g, k_d, k_z = jax.random.split(key, 3)
    z = jax.random.normal(k_z, (2, generator.z_dim))
    g_params = generator.init(k_g, z, k_z, dataclasses.replace(opts, img_size=cfg.img_size))
    d_params = discriminator.init(
        k_d, jnp.zeros((2, 3, cfg.img_size, cfg.img_size)), 1.0
    )
    g_tx, d_tx = make_optimizers(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        d_params=d_params,
        g_opt=g_tx.init(g_params),
        d_opt=d_tx.init(d_params),
        ema_params=jax.tree_util.tree_map(jnp.copy, g_params),
    )
