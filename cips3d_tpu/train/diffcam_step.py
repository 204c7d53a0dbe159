"""Training step for the differentiable-camera (inversion) pipeline.

Counterpart of `exp/cips3d_inversion/scripts/train.py:300-520`: same
adversarial loop as the flagship (R1, aux option, EMA) but the generator
consumes rays from a learnable `CamParams` module trained by a THIRD Adam
optimizer (`cam_lr 1e-4`, `configs/ffhq_diffcam_exp.yaml:158`;
`scripts/train.py:327-329`); camera parameters are saved with the checkpoints
(`scripts/train.py:338-346`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import flax.struct
import jax
import jax.numpy as jnp
import optax

from cips3d_tpu.core.ema import ema_update
from cips3d_tpu.models.camera import CamParams
from cips3d_tpu.models.generator import sample_zs
from cips3d_tpu.models.generator_diffcam import GeneratorDiffcam, NerfKwargs
from cips3d_tpu.train import losses
from cips3d_tpu.train.schedules import alpha_schedule, nerf_noise_schedule
from cips3d_tpu.train.state import TrainConfig, clip_and_guard, make_optimizers


@dataclasses.dataclass(frozen=True)
class DiffcamTrainConfig(TrainConfig):
    cam_lr: float = 1e-4


class DiffcamTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    d_params: Any
    cam_params: Any
    g_opt: Any
    d_opt: Any
    cam_opt: Any
    ema_params: Any


def make_diffcam_train_step(
    generator: GeneratorDiffcam,
    discriminator,
    camera: CamParams,
    cfg: DiffcamTrainConfig,
    nerf_kwargs: NerfKwargs,
    aux_reg: bool = False,
):
    g_tx, d_tx = make_optimizers(cfg)
    cam_tx = optax.adam(cfg.cam_lr, b1=cfg.beta1, b2=cfg.beta2)
    H = W = cfg.img_size

    def nk(step):
        return dataclasses.replace(
            nerf_kwargs, raw_noise_std=nerf_noise_schedule(step, cfg.nerf_noise_disable)
        )

    def gen_fake(g_params, cam_params, zs, step, key, aux):
        k_cam, k_g = jax.random.split(key)
        rays_o, rays_d, _ = camera.apply(
            cam_params, k_cam, zs["z_nerf"].shape[0], H, W, method=camera.get_rays_random_pose
        )
        imgs, ret = generator.apply(
            g_params, zs, rays_o, rays_d, k_g, nk(step), return_aux_img=aux,
            method=generator.forward_rays,
        )
        if aux:
            imgs = jnp.concatenate([imgs, ret["aux_img"]], axis=0)
        return imgs

    def d_loss_fn(d_params, g_params, cam_params, real_imgs, step, alpha, key):
        k_z, k_f, k_da1, k_da2 = jax.random.split(key, 4)
        zs = sample_zs(k_z, real_imgs.shape[0], generator.cfg, cfg.z_dist)
        fake = jax.lax.stop_gradient(gen_fake(g_params, cam_params, zs, step, k_f, aux_reg))
        if aux_reg:
            real_imgs = jnp.concatenate([real_imgs, real_imgs], axis=0)

        def d_apply(x, k):
            return discriminator.apply(
                d_params, x, alpha, use_aux_disc=aux_reg, diffaug_key=k, fade_in=cfg.warmup_d
            )

        if cfg.r1_lambda > 0:
            penalty, real_logits = losses.r1_penalty(
                lambda x: d_apply(x, k_da1), real_imgs, cfg.r1_lambda, cfg.d_reg_every
            )
        else:
            real_logits = d_apply(real_imgs, k_da1)
            penalty = jnp.zeros_like(real_logits)
        fake_logits = d_apply(fake, k_da2)
        loss = jnp.mean(losses.d_logistic_loss(real_logits, fake_logits) + penalty)
        return loss, {"d_loss": loss, "grad_penalty": jnp.mean(penalty)}

    def g_loss_fn(gc_params, d_params, zs, step, alpha, key):
        g_params, cam_params = gc_params
        k_f, k_da = jax.random.split(key)
        fake = gen_fake(g_params, cam_params, zs, step, k_f, aux_reg)
        fake_logits = discriminator.apply(
            d_params, fake.astype(jnp.float32), alpha,
            use_aux_disc=aux_reg, diffaug_key=k_da, fade_in=cfg.warmup_d,
        )
        loss = jnp.mean(losses.g_nonsaturating_loss(fake_logits))
        return loss, {"g_loss": loss}

    def step_fn(state: DiffcamTrainState, real_imgs, key):
        step = state.step
        # uint8 loader batches normalize on device (`to_norm_tensor`
        # analogue, same convention as the flagship step)
        if real_imgs.dtype == jnp.uint8:
            real_imgs = real_imgs.astype(jnp.float32) / 127.5 - 1.0
        alpha = alpha_schedule(step, cfg.warmup_d, cfg.fade_steps)
        k_d, k_z, k_g = jax.random.split(key, 3)

        d_grads, d_metrics = jax.grad(d_loss_fn, has_aux=True)(
            state.d_params, state.g_params, state.cam_params, real_imgs, step, alpha, k_d
        )
        d_grads, d_norm, d_finite = clip_and_guard(d_grads, cfg.grad_clip)
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = jax.tree_util.tree_map(jnp.add, state.d_params, d_updates)

        zs = sample_zs(k_z, real_imgs.shape[0], generator.cfg, cfg.z_dist)
        (g_grads, cam_grads), g_metrics = jax.grad(g_loss_fn, has_aux=True)(
            (state.g_params, state.cam_params), d_params, zs, step, alpha, k_g
        )
        g_grads, g_norm, g_finite = clip_and_guard(g_grads, cfg.grad_clip)
        cam_grads, cam_norm, cam_finite = clip_and_guard(cam_grads, cfg.grad_clip)
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = jax.tree_util.tree_map(jnp.add, state.g_params, g_updates)
        cam_updates, cam_opt = cam_tx.update(cam_grads, state.cam_opt, state.cam_params)
        cam_params = jax.tree_util.tree_map(jnp.add, state.cam_params, cam_updates)

        ema_params = ema_update(state.ema_params, g_params, step, cfg.ema_decay, cfg.ema_start_itr)
        new_state = state.replace(
            step=step + 1, g_params=g_params, d_params=d_params, cam_params=cam_params,
            g_opt=g_opt, d_opt=d_opt, cam_opt=cam_opt, ema_params=ema_params,
        )
        metrics: Dict[str, Any] = dict(d_metrics)
        metrics.update(g_metrics)
        metrics.update({
            "d_total_norm": d_norm, "g_total_norm": g_norm, "cam_total_norm": cam_norm,
            # finite flags feed the host loop's *_crupted NaN-guard dumps
            # (`scripts/train.py:420-435` semantics); camera grads ride the
            # G phase, so a non-finite camera step reports as g_finite=0
            "d_finite": d_finite.astype(jnp.float32),
            "g_finite": (g_finite & cam_finite).astype(jnp.float32),
        })
        return new_state, metrics

    return step_fn


def init_diffcam_state(
    key, generator: GeneratorDiffcam, discriminator, camera: CamParams,
    cfg: DiffcamTrainConfig, nerf_kwargs: NerfKwargs,
) -> DiffcamTrainState:
    k_g, k_d, k_c, k_z = jax.random.split(key, 4)
    H = W = cfg.img_size
    cam_params = camera.init(k_c, k_c, 2, H, W, method=camera.get_rays_random_pose)
    rays_o, rays_d, _ = camera.apply(cam_params, k_c, 2, H, W, method=camera.get_rays_random_pose)
    zs = sample_zs(k_z, 2, generator.cfg, cfg.z_dist)
    g_params = generator.init(k_g, zs, rays_o, rays_d, k_z, nerf_kwargs, method=generator.forward_rays)
    d_params = discriminator.init(k_d, jnp.zeros((2, 3, 8, 8)), method=discriminator.init_all)
    g_tx, d_tx = make_optimizers(cfg)
    cam_tx = optax.adam(cfg.cam_lr, b1=cfg.beta1, b2=cfg.beta2)
    return DiffcamTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        d_params=d_params,
        cam_params=cam_params,
        g_opt=g_tx.init(g_params),
        d_opt=d_tx.init(d_params),
        cam_opt=cam_tx.init(cam_params),
        ema_params=jax.tree_util.tree_map(jnp.copy, g_params),
    )
