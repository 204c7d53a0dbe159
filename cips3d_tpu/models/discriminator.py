"""StyleGAN2 multi-scale discriminator (+ auxiliary discriminator).

Counterpart of `exp/cips3d/models/discriminator.py`:
  * `ConvLayer`      (`discriminator.py:134-222`): optional blur+stride-2 down
    or transposed-conv+blur up, fused bias+leaky-relu.
  * `ResBlock`       (`discriminator.py:224-252`): conv → conv(down) + 1x1
    skip, /sqrt(2); ``first_downsample`` moves the stride to conv1.
  * `Discriminator`  (`discriminator.py:291-402`): fixed-size StyleGAN2 D with
    minibatch-stddev.
  * `DiscriminatorMultiScale` (`discriminator.py:405-585`): per-resolution
    input convs with progressive alpha blending; optional DiffAug; optional
    stddev; space_linear + out_linear head.
  * `DiscriminatorMultiScaleAux` (`discriminator.py:588-664`): main + aux D;
    with ``use_aux_disc`` the batch is split half/half.

NCHW layout throughout.  All per-resolution heads/blocks are created in
``setup`` and materialized by ``init_all`` so checkpoints carry every stage's
parameters across the progressive schedule (the reference keeps them in
ModuleDicts for the same reason).  ``alpha`` is a traced scalar — the fade-in
schedule changes per step, so blending is arithmetic, not Python branching.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from cips3d_tpu.models.layers import (
    EqualConv2d,
    EqualConvTranspose2d,
    EqualLinear,
    minibatch_stddev,
)
from cips3d_tpu.ops.diffaug import diff_augment
from cips3d_tpu.ops.fused_act import fused_leaky_relu, scaled_leaky_relu
from cips3d_tpu.ops.upfirdn2d import blur_pad_down, blur_pad_up, make_kernel, upfirdn2d

BLUR_KERNEL = (1, 3, 3, 1)


def stylegan2_channels(channel_multiplier: int = 2) -> Dict[int, int]:
    """Channel table (`discriminator.py:312-322`)."""
    return {
        4: 512,
        8: 512,
        16: 512,
        32: 512,
        64: 256 * channel_multiplier,
        128: 128 * channel_multiplier,
        256: 64 * channel_multiplier,
        512: 32 * channel_multiplier,
        1024: 16 * channel_multiplier,
    }


def aux_channels(channel_multiplier: int = 2) -> Dict[int, int]:
    """Narrower table for the aux D (`discriminator.py:620-631`)."""
    return {
        4: 128 * channel_multiplier,
        8: 128 * channel_multiplier,
        16: 128 * channel_multiplier,
        32: 128 * channel_multiplier,
        64: 128 * channel_multiplier,
        128: 128 * channel_multiplier,
        256: 64 * channel_multiplier,
        512: 32 * channel_multiplier,
        1024: 16 * channel_multiplier,
    }


class ConvLayer(nn.Module):
    """Conv with optional blur-down / up-blur and fused activation.

    ``data_format`` (activation layout only — weights stay OIHW / (C,), so
    checkpoints are layout-agnostic) exists for the NHWC discriminator
    prototype (docs/r256_step_analysis.md copy-tail item)."""

    out_channel: int
    kernel_size: int
    downsample: bool = False
    upsample: bool = False
    use_bias: bool = True
    activate: bool = True
    dtype: Any = jnp.float32
    data_format: str = "NCHW"

    @nn.compact
    def __call__(self, x):
        kernel = make_kernel(BLUR_KERNEL)
        if self.downsample:
            pad = blur_pad_down(BLUR_KERNEL, self.kernel_size)
            x = upfirdn2d(x, kernel, pad=pad, data_format=self.data_format)
            x = EqualConv2d(
                self.out_channel,
                self.kernel_size,
                stride=2,
                padding=0,
                use_bias=self.use_bias and not self.activate,
                dtype=self.dtype,
                data_format=self.data_format,
                name="conv",
            )(x)
        elif self.upsample:
            x = EqualConvTranspose2d(
                self.out_channel,
                self.kernel_size,
                stride=2,
                padding=0,
                use_bias=self.use_bias and not self.activate,
                dtype=self.dtype,
                data_format=self.data_format,
                name="conv",
            )(x)
            pad = blur_pad_up(BLUR_KERNEL, self.kernel_size)
            x = upfirdn2d(x, kernel * 4.0, pad=pad, data_format=self.data_format)
        else:
            x = EqualConv2d(
                self.out_channel,
                self.kernel_size,
                stride=1,
                padding=(self.kernel_size - 1) // 2,
                use_bias=self.use_bias and not self.activate,
                dtype=self.dtype,
                data_format=self.data_format,
                name="conv",
            )(x)

        if self.activate:
            ch_ax = -1 if self.data_format == "NHWC" else 1
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros, (self.out_channel,), jnp.float32)
                x = fused_leaky_relu(x, bias.astype(x.dtype), channel_axis=ch_ax)
            else:
                x = scaled_leaky_relu(x)
        return x


class ResBlock(nn.Module):
    """Residual down block (`discriminator.py:224-252`)."""

    out_channel: int
    first_downsample: bool = False
    dtype: Any = jnp.float32
    data_format: str = "NCHW"

    @nn.compact
    def __call__(self, x):
        df = self.data_format
        in_channel = x.shape[3 if df == "NHWC" else 1]
        if self.first_downsample:
            out = ConvLayer(in_channel, 3, downsample=True, dtype=self.dtype,
                            data_format=df, name="conv1")(x)
            out = ConvLayer(self.out_channel, 3, dtype=self.dtype,
                            data_format=df, name="conv2")(out)
        else:
            out = ConvLayer(in_channel, 3, dtype=self.dtype,
                            data_format=df, name="conv1")(x)
            out = ConvLayer(self.out_channel, 3, downsample=True, dtype=self.dtype,
                            data_format=df, name="conv2")(out)
        skip = ConvLayer(
            self.out_channel, 1, downsample=True, activate=False, use_bias=False,
            dtype=self.dtype, data_format=df, name="skip",
        )(x)
        return (out + skip) / math.sqrt(2)


class Discriminator(nn.Module):
    """Fixed-size StyleGAN2 D (`discriminator.py:291-402`)."""

    size: int
    channel_multiplier: int = 2
    n_first_layers: int = 0
    stddev_group: int = 4
    channels_override: Optional[Dict[int, int]] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        channels = (
            {int(k): v for k, v in self.channels_override.items()}
            if self.channels_override
            else stylegan2_channels(self.channel_multiplier)
        )
        out = ConvLayer(channels[self.size], 1, dtype=self.dtype, name="conv_in")(x)
        for i in range(self.n_first_layers):
            out = ConvLayer(channels[self.size], 3, dtype=self.dtype, name=f"first_{i}")(out)
        log_size = int(math.log2(self.size))
        for i in range(log_size, 2, -1):
            out = ResBlock(channels[2 ** (i - 1)], dtype=self.dtype, name=f"res_{2 ** i}")(out)
        out = minibatch_stddev(out, self.stddev_group)
        out = ConvLayer(channels[4], 3, dtype=self.dtype, name="final_conv")(out)
        out = out.reshape(out.shape[0], -1)
        out = EqualLinear(channels[4], activation=True, dtype=self.dtype, name="final_linear_0")(out)
        out = EqualLinear(1, dtype=self.dtype, name="final_linear_1")(out)
        return out


class DiscriminatorMultiScale(nn.Module):
    """Multi-resolution D with progressive alpha blending
    (`discriminator.py:405-585`).

    The input resolution (static under jit) selects which input head and how
    many ResBlocks run; every head/block exists in the param tree so a single
    checkpoint spans all progressive stages.
    """

    diffaug: bool = False
    max_size: int = 1024
    channel_multiplier: int = 2
    first_downsample: bool = False
    stddev_group: int = 0
    use_aux_channels: bool = False
    channels_override: Optional[Dict[int, int]] = None
    dtype: Any = jnp.float32
    # "NHWC": run the conv stack channels-last INTERNALLY (input/weights/
    # checkpoints unchanged — one transpose at entry, one 4x4 transpose
    # before the flatten keeps final_linear weight order NCHW-compatible).
    # Prototype for the r256 copy tail, docs/r256_step_analysis.md.
    data_format: str = "NCHW"

    def setup(self):
        # custom channel table, mirroring the reference's ``channels`` kwarg
        # (`discriminator.py:417,440`)
        if self.channels_override is not None:
            # YAML/dotted-override configs produce string keys; normalize.
            channels = {int(k): v for k, v in self.channels_override.items()}
        else:
            channels = (
                aux_channels(2) if self.use_aux_channels else stylegan2_channels(self.channel_multiplier)
            )
        self._channels = channels
        conv_in = {}
        for res in channels:
            conv_in[str(res)] = ConvLayer(
                channels[res], 1, dtype=self.dtype,
                data_format=self.data_format, name=f"conv_in_{res}")
        self.conv_in = conv_in

        blocks = {}
        log_size = int(math.log2(self.max_size))
        for i in range(log_size, 2, -1):
            res = 2 ** i
            blocks[str(res)] = ResBlock(
                channels[res // 2], first_downsample=self.first_downsample,
                dtype=self.dtype, data_format=self.data_format, name=f"res_{res}",
            )
        self.blocks = blocks

        final_in = channels[4]
        self.final_conv = ConvLayer(
            final_in, 3, dtype=self.dtype,
            data_format=self.data_format, name="final_conv")
        self.space_linear = EqualLinear(final_in, activation=True, dtype=self.dtype, name="space_linear")
        self.out_linear = EqualLinear(1, dtype=self.dtype, name="out_linear")

    def __call__(
        self,
        x: jnp.ndarray,
        alpha=1.0,
        diffaug_key: Optional[jax.Array] = None,
        fade_in: bool = True,
    ) -> jnp.ndarray:
        from cips3d_tpu.utils import debug

        if self.diffaug and diffaug_key is not None:
            x = diff_augment(diffaug_key, x)

        size = x.shape[-1]
        log_size = int(math.log2(size))
        nhwc = self.data_format == "NHWC"
        if nhwc:  # one boundary transpose; the stack runs channels-last
            x = x.transpose(0, 2, 3, 1)

        debug.trace("disc.in", x)
        out = self.conv_in[str(size)](x)
        out = self.blocks[str(size)](out)
        debug.trace(f"disc.block_{size}", out)

        # Progressive fade-in: blend with the half-res input head
        # (`discriminator.py:524-532`).  Enabled statically by ``fade_in``
        # (the warmup_D stages); alpha itself is traced.
        if fade_in and size > 4:
            half = size // 2
            if nhwc:
                down = jax.image.resize(
                    x, (x.shape[0], half, half, x.shape[3]), method="bilinear")
            else:
                down = jax.image.resize(
                    x, (x.shape[0], x.shape[1], half, half), method="bilinear")
            down_out = self.conv_in[str(half)](down)
            out = alpha * out + (1.0 - alpha) * down_out

        for i in range(log_size - 1, 2, -1):
            out = self.blocks[str(2 ** i)](out)

        if self.stddev_group > 0:
            out = minibatch_stddev(out, self.stddev_group,
                                   data_format=self.data_format)
            # NOTE: with stddev the final conv sees C+1 inputs; flax infers
            # the in-dim lazily so this is consistent per-config.
        out = self.final_conv(out)
        if nhwc:  # 4x4 tensor: restore NCHW flatten order so space_linear
            # weights are bit-compatible with NCHW checkpoints
            out = out.transpose(0, 3, 1, 2)
        out = out.reshape(out.shape[0], -1)
        out = self.space_linear(out)
        out = self.out_linear(out)
        debug.trace("disc.logits", out)
        return out

    def features(self, x: jnp.ndarray, alpha=1.0, fade_in: bool = False):
        """Per-scale ResBlock activations, for the discriminator-feature
        perceptual loss (`apps/inversion.py::make_disc_percept_fn`; stands in
        for the VGG16 term of `st_web.py:66-283` in a zero-egress
        environment).  Returns the list of (b, c_i, h_i, w_i) activations
        from the input resolution down to 4x4 (activations follow
        ``data_format`` internally; both sides of the perceptual loss run
        the same module, so the layout cancels)."""
        size = x.shape[-1]
        log_size = int(math.log2(size))
        if self.data_format == "NHWC":
            x = x.transpose(0, 2, 3, 1)
        out = self.conv_in[str(size)](x)
        feats = []
        for i in range(log_size, 2, -1):
            out = self.blocks[str(2 ** i)](out)
            feats.append(out)
        return feats

    def init_all(self, x4: jnp.ndarray):
        """Touch every head/block once so init materializes the full tree.

        ``x4`` is a dummy (b, 3, H, W) input with H = W >= 8.  conv_in heads
        are 1x1 convs and blocks only halve the spatial dims, so tiny dummy
        inputs (8x8) suffice for every resolution's parameters — init never
        materializes a 1024x1024 tensor.
        """
        b = x4.shape[0]
        nhwc = self.data_format == "NHWC"
        xin = jnp.zeros((b, 8, 8, 3) if nhwc else (b, 3, 8, 8), x4.dtype)
        total = 0.0
        feats = None
        for res in sorted((int(r) for r in self.conv_in), reverse=True):
            h = self.conv_in[str(res)](xin)
            if str(res) in self.blocks:
                h = self.blocks[str(res)](h)
            total = total + jnp.sum(h)
            if res == 8:
                feats = h  # (b, channels[4], 4, 4)
        if self.stddev_group > 0:
            feats = minibatch_stddev(feats, self.stddev_group,
                                     data_format=self.data_format)
        h = self.final_conv(feats)
        if nhwc:
            h = h.transpose(0, 3, 1, 2)
        h = self.space_linear(h.reshape(b, -1))
        return self.out_linear(h) + 0.0 * total


class DiscriminatorMultiScaleAux(nn.Module):
    """Main + auxiliary discriminator (`discriminator.py:588-664`)."""

    diffaug: bool = False
    max_size: int = 1024
    channel_multiplier: int = 2
    first_downsample: bool = False
    stddev_group: int = 0
    channels_override: Optional[Dict[int, int]] = None
    dtype: Any = jnp.float32
    data_format: str = "NCHW"

    def setup(self):
        self.main_disc = DiscriminatorMultiScale(
            diffaug=self.diffaug,
            max_size=self.max_size,
            channel_multiplier=self.channel_multiplier,
            first_downsample=self.first_downsample,
            stddev_group=self.stddev_group,
            channels_override=self.channels_override,
            dtype=self.dtype,
            data_format=self.data_format,
        )
        self.aux_disc = DiscriminatorMultiScale(
            diffaug=self.diffaug,
            max_size=self.max_size,
            first_downsample=True,
            stddev_group=self.stddev_group,
            use_aux_channels=True,
            channels_override=self.channels_override,
            dtype=self.dtype,
            data_format=self.data_format,
        )

    def __call__(
        self,
        x: jnp.ndarray,
        alpha=1.0,
        use_aux_disc: bool = False,
        diffaug_key: Optional[jax.Array] = None,
        fade_in: bool = True,
    ) -> jnp.ndarray:
        """With ``use_aux_disc`` the first half of the batch goes to the main
        D and the second half (the NeRF aux images) to the aux D
        (`discriminator.py:654-660`)."""
        k1 = k2 = None
        if diffaug_key is not None:
            k1, k2 = jax.random.split(diffaug_key)
        if use_aux_disc:
            b = x.shape[0] // 2
            main_out = self.main_disc(x[:b], alpha, diffaug_key=k1, fade_in=fade_in)
            aux_out = self.aux_disc(x[b:], alpha, diffaug_key=k2, fade_in=fade_in)
            return jnp.concatenate([main_out, aux_out], axis=0)
        return self.main_disc(x, alpha, diffaug_key=k1, fade_in=fade_in)

    def features(self, x: jnp.ndarray, alpha=1.0, fade_in: bool = False):
        """Main-D per-scale activations (see DiscriminatorMultiScale.features)."""
        return self.main_disc.features(x, alpha, fade_in=fade_in)

    def init_all(self, x4: jnp.ndarray):
        return self.main_disc.init_all(x4) + self.aux_disc.init_all(x4)
