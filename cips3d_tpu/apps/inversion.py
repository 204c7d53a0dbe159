"""GAN inversion: optimize latents to reconstruct a target image.

Counterpart of the Projector latent-optimization inversion
(`exp/cips3d/models/st_web.py:66-283`) and the script variants
(`exp/pigan/scripts/inverse_render.py`): starting from the mean style
(w-avg), optimize the style vectors (w-space) — or the z latents — with Adam
to minimize an image reconstruction loss under a fixed frontal camera.

Loss: multi-scale L2 (pixel + 2x/4x downsampled), a VGG/LPIPS-free perceptual
surrogate that works in a zero-egress environment; plug in a real LPIPS
extractor via ``percept_fn`` when weights are available.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cips3d_tpu.models.generator import GeneratorNerfINR, RenderOptions, sample_zs


def make_disc_percept_fn(disc_params, discriminator) -> Callable:
    """Discriminator-feature perceptual extractor for ``percept_fn``.

    The reference Projector uses a pretrained VGG16 perceptual loss
    (`st_web.py:66-283`); VGG weights are unavailable here, so we use the
    trained discriminator's own multi-scale ResBlock activations — an
    in-domain learned feature space.  LPIPS-style normalization: each scale's
    activations are channel-unit-normalized and weighted 1/sqrt(numel) so all
    scales contribute comparably; the result is one flat (b, K) vector so the
    generic ``percept_fn`` L2 hook applies unchanged.
    """

    def percept(img: jnp.ndarray) -> jnp.ndarray:
        feats = discriminator.apply(
            disc_params, img, method=discriminator.features
        )
        parts = []
        for f in feats:
            f = f / jnp.sqrt(jnp.sum(jnp.square(f), axis=1, keepdims=True) + 1e-8)
            flat = f.reshape(f.shape[0], -1)
            parts.append(flat / math.sqrt(flat.shape[-1]))
        return jnp.concatenate(parts, axis=-1)

    return percept


def multiscale_l2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Mean L2 over full + 1/2 + 1/4 resolutions."""
    loss = jnp.mean((a - b) ** 2)
    for s in (2, 4):
        sa = jax.image.resize(a, (a.shape[0], a.shape[1], a.shape[2] // s, a.shape[3] // s), "bilinear")
        sb = jax.image.resize(b, b.shape[:2] + (b.shape[2] // s, b.shape[3] // s), "bilinear")
        loss = loss + jnp.mean((sa - sb) ** 2)
    return loss


def project_image(
    params,
    generator: GeneratorNerfINR,
    target: np.ndarray,
    num_steps_opt: int = 200,
    lr: float = 0.05,
    img_size: int = 64,
    num_steps: int = 12,
    avg_samples: int = 2000,
    noise_scale: float = 0.05,
    percept_fn: Optional[Callable] = None,
    seed: int = 0,
    log_every: int = 50,
) -> Tuple[Dict[str, jnp.ndarray], np.ndarray, list]:
    """Optimize w-space styles to reconstruct ``target``
    (`st_web.py:66-283` Projector.project_image).

    Args:
      target: (3, H, W) float in [-1, 1].
    Returns (optimized style dict, final render (3,H,W), loss history).
    """
    key = jax.random.PRNGKey(seed)
    k_avg, k_noise, k_render = jax.random.split(key, 3)

    # start at w-avg (the Projector's w_avg init)
    avg_zs = sample_zs(k_avg, avg_samples, generator.cfg)
    styles = generator.apply(params, avg_zs["z_nerf"], avg_zs["z_inr"], method=generator.mapping)
    styles = {k2: jnp.mean(v, axis=0, keepdims=True) for k2, v in styles.items()}
    # small noise to break symmetry (w_std * noise_scale ramp analogue)
    styles = {
        k2: v + noise_scale * jax.random.normal(jax.random.fold_in(k_noise, i), v.shape)
        for i, (k2, v) in enumerate(styles.items())
    }

    opts = RenderOptions(
        img_size=img_size, num_steps=num_steps, h_stddev=0.0, v_stddev=0.0,
        h_mean=math.pi * 0.5, v_mean=math.pi * 0.5,
    )
    target_j = jnp.asarray(target)[None]

    from cips3d_tpu.core import rays as rays_lib

    def render(style_dict, k):
        world = rays_lib.get_world_points_and_direction(
            k, batch_size=1, num_steps=opts.num_steps, img_size=opts.img_size,
            fov=opts.fov, ray_start=opts.ray_start, ray_end=opts.ray_end,
            h_stddev=0.0, v_stddev=0.0, h_mean=opts.h_mean, v_mean=opts.v_mean,
            sample_dist="mean", perturb=False,
        )
        img_flat, _ = generator.apply(
            params, style_dict, world, opts, k, method=generator.points_forward
        )
        return img_flat.transpose(0, 2, 1).reshape(1, 3, img_size, img_size)

    def loss_fn(style_dict, k):
        img = render(style_dict, k)
        loss = multiscale_l2(img, target_j)
        if percept_fn is not None:
            loss = loss + jnp.mean((percept_fn(img) - percept_fn(target_j)) ** 2)
        return loss, img

    tx = optax.adam(lr)
    opt_state = tx.init(styles)

    @jax.jit
    def opt_step(style_dict, opt_state, k):
        (loss, img), grads = jax.value_and_grad(loss_fn, has_aux=True)(style_dict, k)
        updates, opt_state = tx.update(grads, opt_state, style_dict)
        style_dict = optax.apply_updates(style_dict, updates)
        return style_dict, opt_state, loss, img

    history = []
    img = None
    for i in range(num_steps_opt):
        styles, opt_state, loss, img = opt_step(styles, opt_state, jax.random.fold_in(k_render, i))
        if (i + 1) % log_every == 0:
            history.append(float(loss))
    return styles, np.asarray(img[0]), history
