"""Shared model layers (flax.linen).

TPU-native counterparts of the reference's layer zoo:
  * FiLM layers           — `exp/comm/models/film_layer.py`,
                            `exp/cips3d/models/generator.py:70-147`
  * SinStyleMod           — `exp/comm/models/mod_conv_fc.py:392-563`
  * EqualLinear/Conv      — `exp/comm/models/mod_conv_fc.py:290-381`,
                            `exp/cips3d/models/discriminator.py:20-131,254-288`
  * PixelNorm             — `exp/cips3d/models/multi_head_mapping.py:13-19`
  * UniformBoxWarp        — `exp/comm/models/nerf_network.py:39-45`
  * minibatch stddev      — `exp/cips3d/models/discriminator.py:375-386`

Design notes (TPU-first):
  * Parameters are stored fp32; ``dtype`` selects the computation precision
    (bf16 keeps the MXU fed; sensitive reductions stay fp32).
  * The style-modulated FC is algebraically refactored so the per-sample
    weight tensor (b, in, out) is never materialized:
        demod  = rsqrt((s+1)^2 @ W^2 + eps)        # (b, out)
        out    = ((x * (s+1)) @ W) * demod
    — two plain matmuls instead of a bmm over per-sample weights, identical
    math to `SinStyleMod.forward_bmm` (`mod_conv_fc.py:452-496`).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from cips3d_tpu.models import init as winit
from cips3d_tpu.ops.fused_act import fused_leaky_relu

Dtype = Any


class TorchLinear(nn.Module):
    """Linear layer with torch's (in, out) semantics and pluggable init.

    Kernel layout (in, out); defaults reproduce torch nn.Linear's init.
    """

    features: int
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        kinit = self.kernel_init or winit.torch_linear_kernel
        kernel = self.param("kernel", kinit, (in_dim, self.features), jnp.float32)
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            binit = self.bias_init or winit.torch_linear_bias(in_dim)
            bias = self.param("bias", binit, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class PixelNorm(nn.Module):
    """x * rsqrt(mean(x^2) + 1e-8) (`multi_head_mapping.py:13-19`)."""

    @nn.compact
    def __call__(self, x):
        return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + 1e-8)


class LayerNormTorch(nn.Module):
    """LayerNorm with torch defaults (eps=1e-5, affine)."""

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-5, dtype=x.dtype)(x)


def uniform_box_warp(coords: jnp.ndarray, sidelength: float = 0.24) -> jnp.ndarray:
    """Scale xyz into the SIREN's input box (`nerf_network.py:39-45`)."""
    return coords * (2.0 / sidelength)


class FiLMSineLayer(nn.Module):
    """FiLM-SIREN layer: ``sin(gain * Wx + bias)`` with per-style gain/bias.

    Counterpart of `film_layer.FiLMLayer` (`exp/comm/models/film_layer.py:41-116`):
      * linear weight: frequency_init(25) (bias keeps torch default)
      * gain = gain_fc(style) * 15 + 30; gain/bias FC weights scaled by 0.25
        post-init.
    """

    out_dim: int
    freq_init: float = 25.0
    gain_scale: float = 15.0
    gain_bias: float = 30.0
    # polynomial sine (ops/fast_sin.py) — max abs err 1.7e-5, below an
    # 8-bit pixel level.  Shipped flagship TRAINING default since round 5:
    # the f32-internal range-reduction fix closed the round-2 quality gap
    # and the 10k-step A/B now favors fast_sin on both quality and
    # throughput (docs/sin_ab_r4/REPORT.md).
    fast_sin: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, style):
        lin = TorchLinear(
            self.out_dim,
            kernel_init=winit.frequency_kernel(self.freq_init),
            dtype=self.dtype,
            name="linear",
        )
        gain_fc = TorchLinear(
            self.out_dim,
            kernel_init=winit.scaled_kernel(winit.torch_linear_kernel, 0.25),
            dtype=self.dtype,
            name="gain_fc",
        )
        bias_fc = TorchLinear(
            self.out_dim,
            kernel_init=winit.scaled_kernel(winit.torch_linear_kernel, 0.25),
            dtype=self.dtype,
            name="bias_fc",
        )
        gain = gain_fc(style) * self.gain_scale + self.gain_bias
        bias = bias_fc(style)
        if x.ndim == 3:
            gain = gain[:, None, :]
            bias = bias[:, None, :]
        if self.fast_sin:
            from cips3d_tpu.ops.fast_sin import fast_sin

            return fast_sin(gain * lin(x) + bias)
        return jnp.sin(gain * lin(x) + bias)


class FiLMLeakyLayer(nn.Module):
    """FiLM layer, leaky-ReLU flavor (`exp/cips3d/models/generator.py:70-147`):
    linear → RMS-normalize → lrelu((gain + 1) * x + bias); torch-default init,
    identity gain scale."""

    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, style):
        lin = TorchLinear(self.out_dim, dtype=self.dtype, name="linear")
        gain = TorchLinear(self.out_dim, dtype=self.dtype, name="gain_fc")(style)
        bias = TorchLinear(self.out_dim, dtype=self.dtype, name="bias_fc")(style)
        if x.ndim == 3:
            gain = gain[:, None, :]
            bias = bias[:, None, :]
        h = lin(x)
        h = h * jax.lax.rsqrt(jnp.mean(jnp.square(h), axis=-1, keepdims=True) + 1e-8)
        return jax.nn.leaky_relu((gain + 1.0) * h + bias, 0.2)


class SinStyleMod(nn.Module):
    """Style-modulated fully-connected layer (StyleGAN2 modulated 1x1 conv on
    flattened pixels) — `mod_conv_fc.SinStyleMod` (`mod_conv_fc.py:392-563`).

    x: (b, n, in) or (b, in); style: (b, style_dim).
    """

    out_channel: int
    demodulate: bool = True
    eps: float = 1e-8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, style):
        squeeze = x.ndim == 2
        if squeeze:
            x = x[:, None, :]
        in_channel = x.shape[-1]

        weight = self.param(
            "weight", winit.kaiming_leaky_fanout_kernel, (in_channel, self.out_channel), jnp.float32
        )
        mod = TorchLinear(
            in_channel, kernel_init=winit.kaiming_leaky_kernel, dtype=self.dtype, name="modulation"
        )
        s = mod(style) + 1.0  # (b, in)

        w = weight.astype(self.dtype)
        xs = x.astype(self.dtype) * s[:, None, :]
        out = jnp.einsum("bni,io->bno", xs, w, preferred_element_type=self.dtype)
        if self.demodulate:
            # sum_i (W_io * s_i)^2 = (s^2) @ (W^2): never materialize (b,in,out)
            denom = jnp.einsum(
                "bi,io->bo", jnp.square(s), jnp.square(w), preferred_element_type=jnp.float32
            )
            out = out * jax.lax.rsqrt(denom + self.eps)[:, None, :].astype(self.dtype)

        if squeeze:
            out = out[:, 0]
        return out


class ToRGB(nn.Module):
    """Per-block RGB head with skip accumulation
    (`exp/cips3d/models/generator.py:983-1006`); frequency_init(100) is
    applied by the parent CIPSNet (`generator.py:1085`)."""

    dim_rgb: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None):
        out = TorchLinear(
            self.dim_rgb,
            kernel_init=winit.frequency_kernel(100.0),
            dtype=self.dtype,
            name="linear",
        )(x)
        if skip is not None:
            out = out + skip
        return out


class EqualLinear(nn.Module):
    """Equalized-lr linear (`discriminator.py:254-288` / `mod_conv_fc.py:290-345`).

    weight ~ N(0, 1/lr_mul); forward scale = lr_mul/sqrt(in); bias starts at
    ``bias_init_value`` and is scaled by lr_mul.  ``activation`` applies the
    fused bias + leaky-relu (*sqrt(2)) path.
    """

    out_dim: int
    use_bias: bool = True
    bias_init_value: float = 0.0
    lr_mul: float = 1.0
    scale: Optional[float] = None
    norm_weight: bool = False
    activation: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        kernel = self.param(
            "kernel", winit.normal_kernel(1.0 / self.lr_mul), (in_dim, self.out_dim), jnp.float32
        )
        scale = self.scale if self.scale is not None else (1.0 / math.sqrt(in_dim)) * self.lr_mul
        w = kernel
        if self.norm_weight:
            demod = jax.lax.rsqrt(jnp.sum(jnp.square(w), axis=0, keepdims=True) + 1e-8)
            w = w * demod
        y = jnp.dot(x.astype(self.dtype), (w * scale).astype(self.dtype))
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda k, s, d=jnp.float32: jnp.full(s, self.bias_init_value, d),
                (self.out_dim,),
                jnp.float32,
            )
        if self.activation:
            y = fused_leaky_relu(y, (bias * self.lr_mul).astype(self.dtype) if bias is not None else None)
        elif bias is not None:
            y = y + (bias * self.lr_mul).astype(self.dtype)
        return y


class EqualConv2d(nn.Module):
    """Equalized-lr conv (`discriminator.py:20-54`).

    ``data_format`` selects the ACTIVATION layout only; the weight stays
    OIHW and the bias (C,), so checkpoints are layout-agnostic (the NHWC
    discriminator prototype loads NCHW-trained checkpoints unchanged).
    """

    out_channel: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    data_format: str = "NCHW"

    @nn.compact
    def __call__(self, x):
        nhwc = self.data_format == "NHWC"
        in_channel = x.shape[3 if nhwc else 1]
        k = self.kernel_size
        # OIHW, randn init, runtime scale 1/sqrt(in*k^2)
        weight = self.param(
            "weight", winit.normal_kernel(1.0), (self.out_channel, in_channel, k, k), jnp.float32
        )
        scale = 1.0 / math.sqrt(in_channel * k * k)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            (weight * scale).astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=(self.data_format, "OIHW", self.data_format),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.out_channel,), jnp.float32)
            b = bias.astype(self.dtype)
            y = y + (b[None, None, None, :] if nhwc else b[None, :, None, None])
        return y


class EqualConvTranspose2d(nn.Module):
    """Equalized-lr transposed conv, NCHW (`discriminator.py:85-120`).

    Matches torch `F.conv_transpose2d(x, w, stride, padding)` semantics.
    """

    out_channel: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    data_format: str = "NCHW"

    @nn.compact
    def __call__(self, x):
        nhwc = self.data_format == "NHWC"
        in_channel = x.shape[3 if nhwc else 1]
        k = self.kernel_size
        weight = self.param(
            "weight", winit.normal_kernel(1.0), (in_channel, self.out_channel, k, k), jnp.float32
        )
        scale = 1.0 / math.sqrt(in_channel * k * k)
        # conv_transpose(x, w, stride=s, padding=p) == conv_general_dilated with
        # lhs_dilation=s and padding (k-1-p) on both sides, kernel spatially
        # flipped with in/out swapped.
        w = jnp.transpose((weight * scale), (1, 0, 2, 3))[:, :, ::-1, ::-1]  # OIHW
        pad = k - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w.astype(self.dtype),
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=(self.data_format, "OIHW", self.data_format),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.out_channel,), jnp.float32)
            b = bias.astype(self.dtype)
            y = y + (b[None, None, None, :] if nhwc else b[None, :, None, None])
        return y


def minibatch_stddev(x: jnp.ndarray, group_size: int = 4, num_features: int = 1,
                     data_format: str = "NCHW") -> jnp.ndarray:
    """Append the minibatch-stddev channel (`discriminator.py:543-556`).

    x: (N, C, H, W) → (N, C+1, H, W).  Groups of ``min(N, group_size)``.
    NHWC inputs round-trip through NCHW (4x4 tensors at this point — cheap).
    """
    if data_format == "NHWC":
        y = minibatch_stddev(x.transpose(0, 3, 1, 2), group_size, num_features)
        return y.transpose(0, 2, 3, 1)
    n, c, h, w = x.shape
    g = min(n, group_size)
    grouped = x.reshape(g, -1, num_features, c // num_features, h, w)
    var = jnp.var(grouped.astype(jnp.float32), axis=0)  # biased (torch var(0, unbiased=False))
    std = jnp.sqrt(var + 1e-8)                # (m, feat, c/feat, h, w)
    std = jnp.mean(std, axis=(2, 3, 4))       # (m, feat)
    std = std[:, :, None, None]               # (m, feat, 1, 1)
    std = jnp.tile(std, (g, 1, h, w))         # (n, feat, h, w)
    return jnp.concatenate([x, std.astype(x.dtype)], axis=1)
