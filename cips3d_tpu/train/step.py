"""One adversarial training step (D phase + G phase + EMA), fully jittable.

Functional rewrite of the reference's hot loop
(`exp/cips3d/scripts/train.py:312-491`):

  D phase: sample z → G forward (no grad) → D(real) with R1 via `jax.grad`
  w.r.t. the images → D(fake) → softplus logistic loss → clip+NaN-guard →
  Adam.  With aux regularization the fake batch is [inr | aux] and real images
  are doubled (`train.py:377-381`), split half/half across main/aux D.

  G phase: fresh z → G forward with partial-grad pixels → D(fake) →
  softplus(-logits) → clip+NaN-guard → Adam → EMA.

Static configuration (aux_reg, d_regularize, batch_split, img_size) selects
the compiled variant; traced scalars (step, nerf_noise, alpha) flow through
the graph so schedules never retrigger compilation.

Gradient accumulation (`batch_split`, `train.py:346-378,445-466`) is a
`lax.scan` over microbatches summing gradients.

Multi-device: the step is written for `jit` under a `Mesh` with the batch
sharded over the 'data' axis and params replicated — XLA inserts the gradient
all-reduce over ICI (the reference's DDP allreduce, `train.py:235-236`).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from cips3d_tpu.core.ema import ema_update
from cips3d_tpu.models.generator import GeneratorNerfINR, RenderOptions, sample_zs
from cips3d_tpu.parallel import mesh as mesh_lib
from cips3d_tpu.train import losses
from cips3d_tpu.train.schedules import alpha_schedule, nerf_noise_schedule
from cips3d_tpu.train.state import TrainConfig, TrainState, clip_and_guard, make_optimizers


def _scan_microbatches(grad_fn, params, zs, keys, n_split):
    """Accumulate (grads, aux) over z microbatches with lax.scan."""
    if n_split <= 1:
        return grad_fn(params, zs, keys[0])

    def split_tree(t):
        return jax.tree_util.tree_map(
            lambda x: x.reshape((n_split, x.shape[0] // n_split) + x.shape[1:]), t
        )

    zs_s = split_tree(zs)

    def body(carry, inp):
        zs_i, key_i = inp
        grads_i, aux_i = grad_fn(params, zs_i, key_i)
        grads, aux = carry
        grads = jax.tree_util.tree_map(jnp.add, grads, grads_i)
        aux = jax.tree_util.tree_map(jnp.add, aux, aux_i)
        return (grads, aux), None

    g0, a0 = grad_fn(params, jax.tree_util.tree_map(lambda x: x[0], zs_s), keys[0])
    (grads, aux), _ = jax.lax.scan(
        body,
        (g0, a0),
        (jax.tree_util.tree_map(lambda x: x[1:], zs_s), keys[1:]),
    )
    inv = 1.0 / n_split
    return (
        jax.tree_util.tree_map(lambda g: g * inv, grads),
        jax.tree_util.tree_map(lambda a: a * inv, aux),
    )


def make_train_step(
    generator: GeneratorNerfINR,
    discriminator,
    cfg: TrainConfig,
    opts: RenderOptions,
    aux_reg: bool,
    d_regularize: bool = True,
):
    """Build the jittable step for one (aux_reg, d_regularize) variant.

    Returns step(state, real_imgs, key) -> (state, metrics).
    """
    g_tx, d_tx = make_optimizers(cfg)
    num_points = cfg.img_size ** 2
    # yaml stores the square root (`grad_points: 256` → 256² pixels,
    # `train.py:449-450`); partial-grad only kicks in when it caps the image.
    grad_points = cfg.grad_points ** 2 if cfg.grad_points else None
    use_grad_points = grad_points is not None and grad_points < num_points
    # forward_points chunking is an inference-memory device; in training the
    # reference only enables it at img_size >= 256 for the (no-grad) D-phase
    # G forward (`train.py:353-356`) — under jit the whole no-grad forward is
    # already materialization-free, so we run it unchunked.

    def render_opts(step):
        return dataclasses.replace(
            opts,
            img_size=cfg.img_size,
            nerf_noise=nerf_noise_schedule(step, cfg.nerf_noise_disable),
        )

    # D-phase fakes are generated under stop_gradient — no backward — so the
    # fused ray-tile kernel is a pure forward win where the forward wins:
    # with fast_sin (sin bound removed).  With exact sin both paths are
    # sin-bound and the kernel is a wash, so `auto` (None) keeps XLA.  Params
    # are identical between the two module configs (fused_ray is apply-only).
    fused_dphase = (
        generator.cfg.fast_sin if cfg.fused_dphase is None else cfg.fused_dphase
    )
    d_cfg_overrides = {}
    if fused_dphase and generator.cfg.nerf_hidden_layers >= 1:
        # depth guard mirrors the fused_dphase_inr envelope check below: the
        # ray-tile kernel requires >=1 hidden layer, and an auto-picked flag
        # must not raise about a knob the user never set (a depth-0 fast_sin
        # config silently keeps the XLA D-phase, as it did pre-auto-pick)
        d_cfg_overrides["fused_ray"] = True
    elif cfg.fused_dphase and generator.cfg.nerf_hidden_layers < 1:
        # EXPLICIT fused_dphase=true must not silently downgrade — only the
        # auto-pick (None) is allowed to fall back, else an A/B that flips
        # this flag on a depth-0 config measures two identical programs
        raise ValueError(
            "fused_dphase=True requires nerf_hidden_layers >= 1 (the fused "
            "ray-tile kernel has no depth-0 form); unset it (auto) or use "
            "the XLA D-phase"
        )
    if cfg.fused_dphase_inr and generator.cfg.inr_pre_rgb_dim == 3:
        # forward-only fused INR decode: fine here because the D-phase
        # fakes are stop-gradient (no backward reaches the kernel)
        d_cfg_overrides["fused_inr"] = True
    if d_cfg_overrides:
        generator_d = GeneratorNerfINR(
            cfg=dataclasses.replace(generator.cfg, **d_cfg_overrides),
            dtype=generator.dtype,
        )
    else:
        generator_d = generator

    def d_loss_fn(d_params, g_params, real_imgs, step, alpha, key):
        k_z, k_g, k_da1, k_da2 = jax.random.split(key, 4)
        zs = sample_zs(k_z, real_imgs.shape[0], generator.cfg, cfg.z_dist)
        ropts = render_opts(step)
        fake_imgs, _ = generator_d.apply(
            g_params, zs, k_g, ropts, return_aux_img=aux_reg
        )
        fake_imgs = jax.lax.stop_gradient(fake_imgs)
        if aux_reg:
            real_imgs = jnp.concatenate([real_imgs, real_imgs], axis=0)
        # 2-D mesh: D is batch-parallel over the JOINT (data, rays) axis —
        # the constraint (no-op on the 1-D path) makes XLA reshard G's
        # ray-sharded fakes with one all-to-all before the spatial convs.
        fake_imgs = mesh_lib.constrain_joint_batch(fake_imgs)
        real_imgs = mesh_lib.constrain_joint_batch(real_imgs)

        def d_apply(x, k):
            return discriminator.apply(
                d_params, x, alpha, use_aux_disc=aux_reg, diffaug_key=k, fade_in=cfg.warmup_d
            )

        if d_regularize and cfg.r1_lambda > 0:
            penalty, real_logits = losses.r1_penalty(
                lambda x: d_apply(x, k_da1), real_imgs, cfg.r1_lambda, cfg.d_reg_every
            )
        else:
            real_logits = d_apply(real_imgs, k_da1)
            penalty = jnp.zeros_like(real_logits)

        fake_logits = d_apply(fake_imgs, k_da2)
        loss = jnp.mean(losses.d_logistic_loss(real_logits, fake_logits) + penalty)
        metrics = {
            "d_loss": loss,
            "d_logits_real": jnp.mean(real_logits),
            "d_logits_fake": jnp.mean(fake_logits),
            # logits_norm diagnostic (`discriminator.py:571-576`)
            "d_logits_norm": jnp.sqrt(
                jnp.mean(jnp.concatenate([real_logits, fake_logits]) ** 2)
            ),
            "grad_penalty": jnp.mean(penalty),
        }
        return loss, metrics

    def g_loss_fn(g_params, d_params, zs, step, alpha, key):
        k_g, k_da = jax.random.split(key)
        ropts = render_opts(step)
        fake_imgs, _ = generator.apply(
            g_params,
            zs,
            k_g,
            ropts,
            return_aux_img=aux_reg,
            grad_points=grad_points if use_grad_points else None,
        )
        fake_logits = discriminator.apply(
            d_params,
            mesh_lib.constrain_joint_batch(fake_imgs.astype(jnp.float32)),
            alpha,
            use_aux_disc=aux_reg,
            diffaug_key=k_da,
            fade_in=cfg.warmup_d,
        )
        loss = jnp.mean(losses.g_nonsaturating_loss(fake_logits))
        return loss, {"g_loss": loss, "g_logits_fake": jnp.mean(fake_logits)}

    def step_fn(state: TrainState, real_imgs: jnp.ndarray, key: jax.Array):
        # uint8 batches normalize on device (`to_norm_tensor` analogue):
        # shipping u8 instead of host-normalized fp32 quarters the host→TPU
        # transfer (31 → 7.9 MB per 10-step r256 chunk through the tunnel)
        if real_imgs.dtype == jnp.uint8:
            real_imgs = real_imgs.astype(jnp.float32) / 127.5 - 1.0
        step = state.step
        alpha = alpha_schedule(step, cfg.warmup_d, cfg.fade_steps)
        k_d, k_gz, k_g = jax.random.split(key, 3)

        # ---------------- D phase ----------------
        # batch_split microbatches the D phase too (`train.py:346-378`): real
        # images are split along the batch axis; per-chunk mean losses are
        # averaged, so gradients match the unsplit computation.
        if cfg.batch_split > 1:
            d_keys = jax.random.split(k_d, cfg.batch_split)
            d_grads, d_metrics = _scan_microbatches(
                lambda p, imgs, k: jax.grad(d_loss_fn, has_aux=True)(
                    p, state.g_params, imgs, step, alpha, k
                ),
                state.d_params,
                real_imgs,
                d_keys,
                cfg.batch_split,
            )
        else:
            d_grads, d_metrics = jax.grad(d_loss_fn, has_aux=True)(
                state.d_params, state.g_params, real_imgs, step, alpha, k_d
            )
        d_grads, d_norm, d_finite = clip_and_guard(d_grads, cfg.grad_clip)
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = jax.tree_util.tree_map(jnp.add, state.d_params, d_updates)

        # ---------------- G phase ----------------
        bs = real_imgs.shape[0]
        zs = sample_zs(k_gz, bs, generator.cfg, cfg.z_dist)
        if cfg.batch_split > 1:
            keys = jax.random.split(k_g, cfg.batch_split)
            g_grads, g_metrics = _scan_microbatches(
                lambda p, z, k: jax.grad(g_loss_fn, has_aux=True)(
                    p, d_params, z, step, alpha, k
                ),
                state.g_params,
                zs,
                keys,
                cfg.batch_split,
            )
        else:
            g_grads, g_metrics = jax.grad(g_loss_fn, has_aux=True)(
                state.g_params, d_params, zs, step, alpha, k_g
            )
        g_grads, g_norm, g_finite = clip_and_guard(g_grads, cfg.grad_clip)
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = jax.tree_util.tree_map(jnp.add, state.g_params, g_updates)

        # ---------------- EMA ----------------
        ema_params = ema_update(
            state.ema_params, g_params, step, cfg.ema_decay, cfg.ema_start_itr
        )

        new_state = state.replace(
            step=step + 1,
            g_params=g_params,
            d_params=d_params,
            g_opt=g_opt,
            d_opt=d_opt,
            ema_params=ema_params,
        )
        metrics = dict(d_metrics)
        metrics.update(g_metrics)
        metrics.update(
            {
                "d_total_norm": d_norm,
                "g_total_norm": g_norm,
                # w_norm diagnostic (`discriminator.py:571-576`)
                "d_w_norm": jnp.sqrt(
                    sum(jnp.sum(jnp.square(x)) for x in jax.tree_util.tree_leaves(d_params))
                ),
                "d_finite": d_finite.astype(jnp.float32),
                "g_finite": g_finite.astype(jnp.float32),
                "alpha": alpha,
                "nerf_noise": nerf_noise_schedule(step, cfg.nerf_noise_disable),
            }
        )
        return new_state, metrics

    return step_fn


def init_train_state(
    key: jax.Array,
    generator: GeneratorNerfINR,
    discriminator,
    cfg: TrainConfig,
    opts: RenderOptions,
    sharding=None,
) -> TrainState:
    """Initialize G/D/EMA params and optimizer states.

    The whole init runs under ONE jit: eager init dispatches thousands of
    tiny ops, which is pathological through a remote-device tunnel (~15 min
    observed vs seconds jitted).  Pass ``sharding`` (e.g. replicated over the
    global mesh) to materialize the state directly with that layout — under
    multi-process SPMD every process computes the same program from the same
    key, so the result is consistently replicated without any broadcast.
    """
    g_tx, d_tx = make_optimizers(cfg)
    init_opts = dataclasses.replace(opts, img_size=cfg.img_size)

    @partial(jax.jit, out_shardings=sharding)
    def _init(key):
        k_g, k_d, k_z = jax.random.split(key, 3)
        zs = sample_zs(k_z, 2, generator.cfg, cfg.z_dist)
        g_params = generator.init(k_g, zs, k_z, init_opts)
        d_params = discriminator.init(
            k_d, jnp.zeros((2, 3, 8, 8)), method=discriminator.init_all
        )
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params,
            d_params=d_params,
            g_opt=g_tx.init(g_params),
            d_opt=d_tx.init(d_params),
            # real copies: EMA must not alias G's buffers (donation would see
            # the same buffer twice)
            ema_params=jax.tree_util.tree_map(jnp.copy, g_params),
        )

    return _init(key)
