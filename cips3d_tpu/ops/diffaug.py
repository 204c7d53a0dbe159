"""Differentiable augmentation (DiffAugment) with explicit keyed RNG.

JAX counterpart of `exp/cips3d/models/diffaug.py:10-85` (Zhao et al. 2020,
arXiv 2006.10738): color (brightness/saturation/contrast), integer translation
by up to 1/8 of the image, and cutout of ~1/5 — all differentiable w.r.t. the
image so D's gradients flow back to G through the augmented pipeline.

All shapes static; per-sample integer offsets are traced values handled with
`take_along_axis` index arithmetic (no dynamic shapes).
Input/output: NCHW.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rand_brightness(key, x):
    """x + U(-0.5, 0.5) per sample (`diffaug.py:31-33`)."""
    b = jax.random.uniform(key, (x.shape[0], 1, 1, 1), x.dtype) - 0.5
    return x + b


def rand_saturation(key, x):
    """(x - mean_c) * U(0, 2) + mean_c (`diffaug.py:36-39`)."""
    x_mean = x.mean(axis=1, keepdims=True)
    s = jax.random.uniform(key, (x.shape[0], 1, 1, 1), x.dtype) * 2.0
    return (x - x_mean) * s + x_mean


def rand_contrast(key, x):
    """(x - mean) * U(0.5, 1.5) + mean (`diffaug.py:42-45`)."""
    x_mean = x.mean(axis=(1, 2, 3), keepdims=True)
    c = jax.random.uniform(key, (x.shape[0], 1, 1, 1), x.dtype) + 0.5
    return (x - x_mean) * c + x_mean


def rand_translation(key, x, ratio=0.125):
    """Per-sample integer shift in [-H/8, H/8], zero-padded
    (`diffaug.py:48-62`)."""
    b, c, h, w = x.shape
    shift_h = int(h * ratio + 0.5)
    shift_w = int(w * ratio + 0.5)
    kh, kw = jax.random.split(key)
    th = jax.random.randint(kh, (b, 1, 1), -shift_h, shift_h + 1)
    tw = jax.random.randint(kw, (b, 1, 1), -shift_w, shift_w + 1)

    # Reference pads by 1 then clamps indices into [0, H+1]; out-of-range
    # shifts read the zero padding.
    x_pad = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    grid_h = jnp.clip(jnp.arange(h)[None, :, None] + th + 1, 0, h + 1)  # (b, h, 1)
    grid_w = jnp.clip(jnp.arange(w)[None, None, :] + tw + 1, 0, w + 1)  # (b, 1, w)

    # gather rows then cols
    out = jnp.take_along_axis(x_pad, jnp.broadcast_to(grid_h[:, None, :, :], (b, c, h, 1)), axis=2)
    out = jnp.take_along_axis(out, jnp.broadcast_to(grid_w[:, None, :, :], (b, c, h, w)), axis=3)
    return out


def rand_cutout(key, x, ratio=0.2):
    """Zero out a random (H/5, W/5)-ish box per sample (`diffaug.py:65-79`)."""
    b, c, h, w = x.shape
    cut_h = int(h * ratio + 0.5)
    cut_w = int(w * ratio + 0.5)
    kh, kw = jax.random.split(key)
    off_h = jax.random.randint(kh, (b, 1, 1), 0, h + (1 - cut_h % 2))
    off_w = jax.random.randint(kw, (b, 1, 1), 0, w + (1 - cut_w % 2))

    # Box-center semantics of the reference: covered rows are
    # clip(arange(cut) + off - cut//2, 0, h-1).
    rows = jnp.clip(jnp.arange(cut_h)[None, :, None] + off_h - cut_h // 2, 0, h - 1)  # (b, cut_h, 1)
    cols = jnp.clip(jnp.arange(cut_w)[None, None, :] + off_w - cut_w // 2, 0, w - 1)  # (b, 1, cut_w)

    mask = jnp.ones((b, h, w), x.dtype)
    bidx = jnp.arange(b)[:, None, None]
    mask = mask.at[
        jnp.broadcast_to(bidx, (b, cut_h, cut_w)),
        jnp.broadcast_to(rows, (b, cut_h, cut_w)),
        jnp.broadcast_to(cols, (b, cut_h, cut_w)),
    ].set(0.0)
    return x * mask[:, None, :, :]


_POLICY_FNS = {
    "color": (rand_brightness, rand_saturation, rand_contrast),
    "translation": (rand_translation,),
    "cutout": (rand_cutout,),
}


def diff_augment(key, x, policy: str = "color,translation,cutout"):
    """Apply the augmentation pipeline (`diffaug.py:10-28`)."""
    if not policy:
        return x
    for p in policy.split(","):
        for fn in _POLICY_FNS[p.strip()]:
            key, sub = jax.random.split(key)
            x = fn(sub, x)
    return x
