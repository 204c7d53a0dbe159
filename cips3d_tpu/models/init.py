"""Weight initializers matching the reference's torch init schemes.

GAN training dynamics are sensitive to these exact distributions (SURVEY.md
§7 "hard parts"), so each initializer reproduces the reference distribution,
transposed to flax's (in, out) kernel layout.

Reference init sites:
  * torch `nn.Linear` default: kaiming_uniform(a=sqrt(5)) on weight and
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) on bias — both reduce to
    U(-1/sqrt(fan_in), +1/sqrt(fan_in)).
  * `frequency_init(freq)`: U(-sqrt(6/fan_in)/freq, +sqrt(6/fan_in)/freq)
    on weight only (`exp/comm/models/film_layer.py:11-18`).
  * `kaiming_leaky_init`: N(0, sqrt(2/(1+0.2^2))/sqrt(fan_in)) on weight only
    (`exp/cips3d/models/multi_head_mapping.py:22-25`).
  * SinStyleMod weight: kaiming_normal(a=0.2, mode='fan_in') on a
    (in, out)-shaped tensor, where torch's fan_in convention reads dim 1 —
    i.e. the *out* dim (`exp/comm/models/mod_conv_fc.py:433-434`).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

LEAKY_GAIN = math.sqrt(2.0 / (1.0 + 0.2 ** 2))  # kaiming gain for a=0.2


def torch_linear_kernel(key, shape, dtype=jnp.float32):
    """Torch nn.Linear default weight init; shape (in, out)."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias(fan_in: int):
    """Torch nn.Linear default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def frequency_kernel(freq: float):
    """`frequency_init(freq)` (`film_layer.py:11-18`); shape (in, out)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        bound = math.sqrt(6.0 / fan_in) / freq
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_leaky_kernel(key, shape, dtype=jnp.float32):
    """kaiming_normal(a=0.2, fan_in) on an (in, out) kernel."""
    fan_in = shape[0]
    std = LEAKY_GAIN / math.sqrt(fan_in)
    return jax.random.normal(key, shape, dtype) * std


def kaiming_leaky_fanout_kernel(key, shape, dtype=jnp.float32):
    """kaiming_normal(a=0.2) where torch read the *out* dim as fan_in.

    Used for the SinStyleMod (in, out) weight: the reference calls
    `kaiming_normal_(weight[0], a=0.2, mode='fan_in')` on an (in, out) tensor,
    and torch's fan-in convention for 2D tensors is `size(1)` = out
    (`mod_conv_fc.py:433-434`).
    """
    fan = shape[1]
    std = LEAKY_GAIN / math.sqrt(fan)
    return jax.random.normal(key, shape, dtype) * std


def scaled_kernel(base_init, scale: float):
    """Apply a post-init scale (reference's `weight.data.mul_(s)` idiom,
    e.g. the FiLM gain/bias FCs at `film_layer.py:64-65`)."""

    def init(key, shape, dtype=jnp.float32):
        return base_init(key, shape, dtype) * scale

    return init


def normal_kernel(std: float = 1.0):
    """randn * std — StyleGAN2 equalized-lr raw weights."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std

    return init


def uniform_pm(bound_fn):
    """U(-b, b) with b computed from the kernel shape."""

    def init(key, shape, dtype=jnp.float32):
        b = bound_fn(shape)
        return jax.random.uniform(key, shape, dtype, -b, b)

    return init


def presin_kernel(key, shape, dtype=jnp.float32):
    """FiLMLayer_PreSin linear init: U(-sqrt(9/in), sqrt(9/in))
    (`film_layer.py:135`)."""
    fan_in = shape[0]
    bound = math.sqrt(9.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)
