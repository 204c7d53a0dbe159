"""Fused bias + leaky-ReLU.

TPU replacement for the reference CUDA op
(`exp/comm/op/fused_bias_act_kernel.cu`, wrapper `exp/comm/op/fused_act.py`):
``out = leaky_relu(x + bias, slope) * scale`` with ``slope=0.2`` and
``scale=sqrt(2)`` (`fused_act.py:73-86`).  On TPU XLA fuses the bias add and
the select into the producing matmul/conv epilogue, so a plain jnp expression
*is* the fused kernel; it is differentiable to any order (the reference needed
hand-written double-backward for R1).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_SQRT2 = math.sqrt(2.0)


def fused_leaky_relu(
    x: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    negative_slope: float = 0.2,
    scale: float = _SQRT2,
    channel_axis: int = 1,
) -> jnp.ndarray:
    """``leaky_relu(x + bias) * scale``.

    ``bias`` has shape (C,); for NCHW inputs it broadcasts over the channel
    axis (dim 1 by default; pass ``channel_axis=-1`` for NHWC), matching
    `FusedLeakyReLU.forward` (`fused_act.py:38-48`).  For (..., C) inputs
    (linear layers) it broadcasts over the last axis.
    """
    if bias is not None:
        if x.ndim >= 3:
            ax = channel_axis % x.ndim
            shape = tuple(-1 if i == ax else 1 for i in range(x.ndim))
            x = x + bias.reshape(shape)
        else:
            x = x + bias
    return jax.nn.leaky_relu(x, negative_slope) * scale


def scaled_leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    """`ScaledLeakyReLU` (`exp/cips3d/models/discriminator.py:123-131`)."""
    return jax.nn.leaky_relu(x, negative_slope) * _SQRT2
