"""Legacy / auxiliary model components (dev variants, SURVEY §2.7).

Counterparts of:
  * `CLN` conditional LayerNorm (`exp/comm/models/cond_layer_norm.py:11-84`):
    normalize (no affine) then style-conditioned gain/bias.
  * `CLNLayer` (`exp/comm/models/inr_network.py:682-727`): Linear → CLN →
    LeakyReLU.
  * `INRNetwork` (`exp/comm/models/inr_network.py:30-128`): plain FiLM-sine
    stack + tanh RGB head.
  * `INRNetworkSkip` (`inr_network.py:157-290`): per-stage dual FiLM layers
    with StyleGAN2-ish channel schedule and ToRGB skip accumulation.
  * `PosEmbedding` (`exp/comm/comm_model_utils.py:10-52`): NeRF sinusoidal
    embedding (unused by the flagship but part of the inventory).
  * `FCNet` (`exp/comm/models/fc_net.py:17-94`): plain LeakyReLU MLP + tanh.
  * `ModulatedFCConv` (`exp/comm/models/mod_conv_fc.py:17-120`): the
    StyleGAN2 equalized-lr modulated FC (scale = 1/sqrt(fan_in), modulation
    through an EqualLinear with bias_init=1), the `SinStyleMod` sibling.
"""

from __future__ import annotations

import math
from typing import Any, Mapping, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cips3d_tpu.models import init as winit
from cips3d_tpu.models.layers import EqualLinear, FiLMSineLayer, TorchLinear


class CLN(nn.Module):
    """Conditional LayerNorm (`cond_layer_norm.py:11-84`)."""

    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style):
        in_dim = x.shape[-1]
        gain = TorchLinear(in_dim, dtype=self.dtype, name="gain_fc")(style) + 1.0
        bias = TorchLinear(in_dim, dtype=self.dtype, name="bias_fc")(style)
        if x.ndim == 3:
            gain, bias = gain[:, None, :], bias[:, None, :]
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        out = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return out * gain + bias


class CLNLayer(nn.Module):
    """Linear → CLN → LeakyReLU (`inr_network.py:682-727`)."""

    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style):
        x = TorchLinear(self.out_dim, dtype=self.dtype, name="linear")(x)
        x = CLN(dtype=self.dtype, name="cln")(x, style)
        return nn.leaky_relu(x, 0.2)


class INRNetwork(nn.Module):
    """FiLM-sine MLP decoder (`inr_network.py:30-128`).

    Style keys: ``{prefix}_w{i}``.
    """

    hidden_dim: int
    hidden_layers: int
    rgb_dim: int = 3
    name_prefix: str = "inr"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style_dict: Mapping[str, jnp.ndarray]):
        for i in range(self.hidden_layers):
            x = FiLMSineLayer(self.hidden_dim, dtype=self.dtype, name=f"film_{i}")(
                x, style_dict[f"{self.name_prefix}_w{i}"]
            )
        rgb = TorchLinear(self.rgb_dim, dtype=self.dtype, name="to_rgb")(x)
        return jnp.tanh(rgb)


#: channel schedule of INRNetwork_Skip (`inr_network.py:182-192`)
SKIP_CHANNELS = (512, 512, 512, 512, 512, 128, 64, 32, 16)


class INRNetworkSkip(nn.Module):
    """Dual-FiLM stages + ToRGB skip accumulation (`inr_network.py:157-290`).

    Style keys: ``{prefix}_w{i}_0`` / ``{prefix}_w{i}_1``.
    """

    hidden_layers: int
    dim_scale: float = 1.0
    rgb_dim: int = 3
    name_prefix: str = "inr"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style_dict: Mapping[str, jnp.ndarray]):
        rgb = None
        for i in range(self.hidden_layers):
            ch = int(SKIP_CHANNELS[i] * self.dim_scale)
            x = FiLMSineLayer(ch, dtype=self.dtype, name=f"film_{i}_0")(
                x, style_dict[f"{self.name_prefix}_w{i}_0"]
            )
            x = FiLMSineLayer(ch, dtype=self.dtype, name=f"film_{i}_1")(
                x, style_dict[f"{self.name_prefix}_w{i}_1"]
            )
            out = TorchLinear(
                self.rgb_dim,
                kernel_init=winit.frequency_kernel(100.0),
                dtype=self.dtype,
                name=f"to_rgb_{i}",
            )(x)
            rgb = out if rgb is None else rgb + out
        return jnp.tanh(rgb)


class PosEmbedding(nn.Module):
    """x → (x, sin(2^k x), cos(2^k x), ...) (`comm_model_utils.py:10-52`)."""

    max_logscale: int = 9
    n_freqs: int = 10
    logscale: bool = True
    multi_pi: bool = False

    @property
    def out_dim(self) -> int:
        return 3 + 3 * 2 * self.n_freqs

    def __call__(self, x):
        if self.logscale:
            freqs = 2.0 ** jnp.linspace(0, self.max_logscale, self.n_freqs)
        else:
            freqs = jnp.linspace(1, 2.0 ** self.max_logscale, self.n_freqs)
        if self.multi_pi:
            freqs = freqs * math.pi
        outs = [x]
        for f in freqs:
            outs.append(jnp.sin(f * x))
            outs.append(jnp.cos(f * x))
        return jnp.concatenate(outs, axis=-1)


class FCNet(nn.Module):
    """Plain MLP helper (`fc_net.py:17-94`): kaiming-leaky Linears + LReLU,
    tanh RGB head."""

    hidden_dim: int
    hidden_layers: int
    rgb_dim: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.hidden_layers):
            x = TorchLinear(
                self.hidden_dim, kernel_init=winit.kaiming_leaky_kernel,
                dtype=self.dtype, name=f"fc_{i}",
            )(x)
            x = nn.leaky_relu(x, 0.2)
        rgb = TorchLinear(self.rgb_dim, dtype=self.dtype, name="to_rgb")(x)
        return jnp.tanh(rgb)


class ModulatedFCConv(nn.Module):
    """StyleGAN2-style modulated FC with equalized lr
    (`mod_conv_fc.py:17-120`): weight scale 1/sqrt(in), modulation through an
    EqualLinear(bias_init=1); demodulation as in SinStyleMod."""

    out_channel: int
    demodulate: bool = True
    scale: Any = None
    eps: float = 1e-8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style):
        squeeze = x.ndim == 2
        if squeeze:
            x = x[:, None, :]
        in_channel = x.shape[-1]
        weight = self.param("weight", winit.normal_kernel(1.0), (in_channel, self.out_channel), jnp.float32)
        scale = self.scale if self.scale is not None else 1.0 / math.sqrt(in_channel)
        s = EqualLinear(
            in_channel, bias_init_value=1.0, scale=self.scale, dtype=self.dtype, name="modulation"
        )(style)  # (b, in); reference passes its own `scale` into the EqualLinear
        w = weight.astype(self.dtype) * scale
        xs = x.astype(self.dtype) * s[:, None, :]
        out = jnp.einsum("bni,io->bno", xs, w, preferred_element_type=self.dtype)
        if self.demodulate:
            denom = jnp.einsum(
                "bi,io->bo", jnp.square(s), jnp.square(w), preferred_element_type=jnp.float32
            )
            out = out * jax.lax.rsqrt(denom + self.eps)[:, None, :].astype(self.dtype)
        if squeeze:
            out = out[:, 0]
        return out


#: resolutions of INRNetwork_Skip_Prog (`inr_network.py:412-420`)
PROG_RESOLUTIONS = ("16", "32", "64", "128", "256", "512", "1024")


class INRNetworkSkipProg(nn.Module):
    """Progressive INR decoder with per-resolution early exit
    (`inr_network.py:389-502`): FiLM blocks keyed by resolution, per-block
    ToRGB (frequency_init(100)) accumulation, break at ``img_size``, tanh.

    Style keys: ``{prefix}_w{res}_0`` / ``{prefix}_w{res}_1``.
    """

    dim_scale: float = 1.0
    rgb_dim: int = 3
    name_prefix: str = "inr"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style_dict: Mapping[str, jnp.ndarray], img_size: int = 1024):
        import numpy as np

        stop = str(2 ** int(np.log2(img_size)))
        ch = int(256 * self.dim_scale)
        rgb = None
        for res in PROG_RESOLUTIONS:
            x_orig = x
            x = FiLMSineLayer(ch, dtype=self.dtype, name=f"film_{res}_0")(
                x, style_dict[f"{self.name_prefix}_w{res}_0"]
            )
            x = FiLMSineLayer(ch, dtype=self.dtype, name=f"film_{res}_1")(
                x, style_dict[f"{self.name_prefix}_w{res}_1"]
            )
            if x.shape[-1] == x_orig.shape[-1]:
                x = x + x_orig  # FiLMBlock skip (`inr_network.py:292-348`)
            out = TorchLinear(
                self.rgb_dim, kernel_init=winit.frequency_kernel(100.0),
                dtype=self.dtype, name=f"to_rgb_{res}",
            )(x)
            rgb = out if rgb is None else rgb + out
            if res == stop:
                break
        return jnp.tanh(rgb)


class CLNBlock(nn.Module):
    """Two (Linear → CLN → LeakyReLU) stages with optional residual skip
    (`inr_network.py:504-564`).  Style keys ``{prefix}_0`` / ``{prefix}_1``
    are supplied by the caller as explicit vectors."""

    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style0, style1, skip: bool = False):
        x_orig = x
        x = TorchLinear(self.out_dim, dtype=self.dtype, name="linear1")(x)
        x = CLN(dtype=self.dtype, name="cln1")(x, style0)
        x = nn.leaky_relu(x, 0.2)
        x = TorchLinear(self.out_dim, dtype=self.dtype, name="linear2")(x)
        x = CLN(dtype=self.dtype, name="cln2")(x, style1)
        out = nn.leaky_relu(x, 0.2)
        if skip and out.shape[-1] == x_orig.shape[-1]:
            out = out + x_orig
        return out


#: resolutions of INRNetwork_Skip_CLN (`inr_network.py:589-597`)
CLN_RESOLUTIONS = ("16", "32", "64", "128", "256", "512", "1024")


class INRNetworkSkipCLN(nn.Module):
    """CLN-conditioned progressive INR decoder (`inr_network.py:566-680`):
    CLNBlocks keyed by resolution (skip from res >= 128), per-block ToRGB
    (frequency_init(100)) accumulation from the first block, early exit at
    ``img_size``, tanh.

    Style keys: ``{prefix}_w{res}_0`` / ``{prefix}_w{res}_1``.
    """

    dim_scale: float = 1.0
    rgb_dim: int = 3
    name_prefix: str = "inr"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style_dict: Mapping[str, jnp.ndarray], img_size: int = 1024):
        import numpy as np

        stop = str(2 ** int(np.log2(img_size)))
        ch = int(256 * self.dim_scale)
        rgb = None
        for res in CLN_RESOLUTIONS:
            x = CLNBlock(ch, dtype=self.dtype, name=f"block_{res}")(
                x,
                style_dict[f"{self.name_prefix}_w{res}_0"],
                style_dict[f"{self.name_prefix}_w{res}_1"],
                skip=int(res) >= 128,
            )
            out = TorchLinear(
                self.rgb_dim, kernel_init=winit.frequency_kernel(100.0),
                dtype=self.dtype, name=f"to_rgb_{res}",
            )(x)
            rgb = out if rgb is None else rgb + out
            if res == stop:
                break
        return jnp.tanh(rgb)


#: resolutions of Linear_Skip_Prog (`inr_network.py:752-761`)
LINEAR_PROG_RESOLUTIONS = ("32", "64", "128", "256", "512", "1024")


class LinearSkipProg(nn.Module):
    """Style-free progressive decoder with a single CLN-conditioned input
    layer (`inr_network.py:728-858`): CLNLayer (style key ``{prefix}_w``) →
    per-resolution Linear(frequency_init(25)) + LeakyReLU blocks with ToRGB
    accumulation and early exit, tanh."""

    hidden_dim: int = 256
    rgb_dim: int = 3
    name_prefix: str = "linear"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style_dict: Mapping[str, jnp.ndarray], img_size: int = 1024):
        import numpy as np

        stop = str(2 ** int(np.log2(img_size)))
        x = CLNLayer(self.hidden_dim, dtype=self.dtype, name="cln_layer")(
            x, style_dict[f"{self.name_prefix}_w"]
        )
        rgb = None
        for res in LINEAR_PROG_RESOLUTIONS:
            x = TorchLinear(
                self.hidden_dim, kernel_init=winit.frequency_kernel(25.0),
                dtype=self.dtype, name=f"linear_{res}",
            )(x)
            x = nn.leaky_relu(x, 0.2)
            out = TorchLinear(self.rgb_dim, dtype=self.dtype, name=f"to_rgb_{res}")(x)
            rgb = out if rgb is None else rgb + out
            if res == stop:
                break
        return jnp.tanh(rgb)


class ModSinLayer(nn.Module):
    """Style-modulated normalization layer
    (`exp/cips3d/models/generator.py:747-820` ModSinLayer): RMS-normalize,
    then ``(gain_fc(style)+1) * x + bias_fc(style)`` and LeakyReLU.  Fixed
    ``freq``/``phase`` select the (commented-in) sine path variant
    (`ModSinLayer_NoBias`, `generator.py:822-890`): ``sin(freq*x+phase)*gain``.
    """

    use_sine: bool = False
    freq: float = 1.0
    phase: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style):
        in_dim = x.shape[-1]
        gain = TorchLinear(in_dim, dtype=self.dtype, name="gain_fc")(style) + 1.0
        if x.ndim == 3:
            gain = gain[:, None, :]
        if self.use_sine:
            return jnp.sin(self.freq * x + self.phase) * gain
        bias = TorchLinear(in_dim, dtype=self.dtype, name="bias_fc")(style)
        if x.ndim == 3:
            bias = bias[:, None, :]
        h = x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + 1e-8)
        return nn.leaky_relu(h * gain + bias, 0.2)
