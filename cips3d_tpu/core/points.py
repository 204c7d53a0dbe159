"""Pixel-axis gather/scatter for partial-gradient rendering.

Counterparts of `exp/comm/comm_utils.py:240-338` (`gather_points`,
`scatter_points`, batched variants).  These implement the reference's
memory-scaling trick for high-resolution training: gradients flow through a
random subset of pixels; the rest are rendered under `stop_gradient` and
scatter-merged back into the full image
(`exp/cips3d/models/generator.py:1536-1657`).
"""

from __future__ import annotations

import jax.numpy as jnp


def gather_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather along the pixel axis (dim 1).

    points: (b, n, c) or (b, n, s, c); idx: (k,) shared across the batch
    (`comm_utils.py:262-282`).
    """
    return jnp.take(points, idx, axis=1)


def scatter_points(
    idx_grad: jnp.ndarray,
    points_grad: jnp.ndarray,
    idx_no_grad: jnp.ndarray,
    points_no_grad: jnp.ndarray,
    num_points: int,
) -> jnp.ndarray:
    """Merge grad/no-grad pixel subsets back into a dense (b, n, c) tensor
    (`comm_utils.py:240-259`).  Differentiable w.r.t. ``points_grad``.
    """
    b, _, c = points_grad.shape
    out = jnp.zeros((b, num_points, c), points_grad.dtype)
    out = out.at[:, idx_grad].set(points_grad)
    out = out.at[:, idx_no_grad].set(points_no_grad)
    return out


def batch_gather_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Per-sample gather: idx (b, k) (`comm_utils.py:320-338`)."""
    if points.ndim == 4:
        idx_e = idx[:, :, None, None]
        idx_e = jnp.broadcast_to(idx_e, (points.shape[0], idx.shape[1]) + points.shape[2:])
    elif points.ndim == 3:
        idx_e = jnp.broadcast_to(idx[:, :, None], (points.shape[0], idx.shape[1], points.shape[2]))
    else:
        raise ValueError(f"points must be rank 3 or 4, got {points.ndim}")
    return jnp.take_along_axis(points, idx_e, axis=1)


def batch_scatter_points(
    idx_grad: jnp.ndarray,
    points_grad: jnp.ndarray,
    idx_no_grad: jnp.ndarray,
    points_no_grad: jnp.ndarray,
    num_points: int,
) -> jnp.ndarray:
    """Per-sample scatter-merge: idx_* (b, k) (`comm_utils.py:285-318`)."""
    squeeze = False
    if points_grad.ndim == 2:
        points_grad = points_grad[..., None]
        points_no_grad = points_no_grad[..., None]
        squeeze = True
    b, _, c = points_grad.shape
    out = jnp.zeros((b, num_points, c), points_grad.dtype)
    bidx = jnp.arange(b)[:, None]
    out = out.at[bidx, idx_grad].set(points_grad)
    out = out.at[bidx, idx_no_grad].set(points_no_grad)
    if squeeze:
        out = out[..., 0]
    return out
