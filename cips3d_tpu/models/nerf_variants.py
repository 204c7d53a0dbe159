"""Alternative NeRF backbone variants (dev zoo, SURVEY §2.7).

Counterparts of `exp/comm/models/nerf_network.py`:
  * `NeRFNetworkCLN` (`nerf_network.py:391-551`): FiLM-sine layers replaced
    by Linear → conditional-LayerNorm → LeakyReLU (`CLNLayer`,
    `nerf_network.py:345-389`); same sigma / rgb-feature head split.
  * `NeRFNetworkFreqPhase` (`nerf_network.py:55-240` NeRFNetwork): pi-GAN
    style API where one style vector per layer carries raw
    (frequency, phase) halves, frequencies scaled *15+30
    (`get_freq_phase`, `exp/cips3d/models/generator.py:347-352`); optional
    NeRF positional embedding of xyz.
  * `NeRFNetworkSmall` (`nerf_network.py` NeRFNetwork_Small): 1 hidden FiLM
    layer budget variant.
"""

from __future__ import annotations

from typing import Any, Mapping

import flax.linen as nn
import jax.numpy as jnp

from cips3d_tpu.models import init as winit
from cips3d_tpu.models.layers import TorchLinear, uniform_box_warp
from cips3d_tpu.models.legacy import CLNLayer, PosEmbedding
from cips3d_tpu.models.nerf_net import NeRFNetwork


class NeRFNetworkCLN(nn.Module):
    """CLN-conditioned NeRF backbone; style keys `{prefix}_w{i}` /
    `{prefix}_rgb` as in the FiLM version."""

    hidden_dim: int = 128
    hidden_layers: int = 2
    rgb_dim: int = 32
    box_sidelength: float = 0.24
    name_prefix: str = "nerf"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points: jnp.ndarray, style_dict: Mapping[str, jnp.ndarray]) -> jnp.ndarray:
        x = uniform_box_warp(points.astype(self.dtype), self.box_sidelength)
        for i in range(self.hidden_layers):
            x = CLNLayer(self.hidden_dim, dtype=self.dtype, name=f"cln_{i}")(
                x, style_dict[f"{self.name_prefix}_w{i}"].astype(self.dtype)
            )
        sigma = TorchLinear(1, dtype=self.dtype, name="sigma")(x)
        c = CLNLayer(self.hidden_dim // 2, dtype=self.dtype, name="color_cln")(
            x, style_dict[f"{self.name_prefix}_rgb"].astype(self.dtype)
        )
        rgb = TorchLinear(
            self.rgb_dim, kernel_init=winit.kaiming_leaky_kernel, dtype=self.dtype,
            name="color_linear",
        )(c)
        return jnp.concatenate([rgb, sigma], axis=-1)


class FreqPhaseFiLM(nn.Module):
    """sin(freq * Wx + phase) with the (freq, phase) halves packed in one
    style vector and freq = raw*15 + 30 (`generator.py:347-352`)."""

    out_dim: int
    freq_init: float = 25.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style):
        h = TorchLinear(
            self.out_dim, kernel_init=winit.frequency_kernel(self.freq_init),
            dtype=self.dtype, name="linear",
        )(x)
        freq_raw, phase = jnp.split(style, 2, axis=-1)
        freq = freq_raw * 15.0 + 30.0
        if x.ndim == 3:
            freq, phase = freq[:, None, :], phase[:, None, :]
        return jnp.sin(freq * h + phase)


class NeRFNetworkFreqPhase(nn.Module):
    """Freq/phase-styled backbone with optional positional embedding.

    Style keys `{prefix}_w{i}` (dim 2*hidden) and `{prefix}_rgb`
    (dim 2*(hidden//2))."""

    hidden_dim: int = 128
    hidden_layers: int = 2
    rgb_dim: int = 32
    use_pos_embed: bool = False
    box_sidelength: float = 0.24
    name_prefix: str = "nerf"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points, style_dict):
        x = uniform_box_warp(points.astype(self.dtype), self.box_sidelength)
        if self.use_pos_embed:
            x = PosEmbedding(max_logscale=9, n_freqs=10)(x)
        for i in range(self.hidden_layers):
            x = FreqPhaseFiLM(self.hidden_dim, dtype=self.dtype, name=f"film_{i}")(
                x, style_dict[f"{self.name_prefix}_w{i}"].astype(self.dtype)
            )
        sigma = TorchLinear(1, dtype=self.dtype, name="sigma")(x)
        c = FreqPhaseFiLM(self.hidden_dim // 2, dtype=self.dtype, name="color_film")(
            x, style_dict[f"{self.name_prefix}_rgb"].astype(self.dtype)
        )
        rgb = TorchLinear(
            self.rgb_dim, kernel_init=winit.kaiming_leaky_kernel, dtype=self.dtype,
            name="color_linear",
        )(c)
        return jnp.concatenate([rgb, sigma], axis=-1)


def NeRFNetworkSmall(**kwargs) -> NeRFNetwork:
    """1-hidden-layer budget variant (`NeRFNetwork_Small`)."""
    kwargs.setdefault("hidden_layers", 1)
    kwargs.setdefault("hidden_dim", 64)
    return NeRFNetwork(**kwargs)


def NeRFNetworkL(**kwargs) -> NeRFNetwork:
    """Wide-color variant (`exp/comm/models/nerf_network.py:264-343`
    NeRFNetworkL): identical to NeRFNetwork except the color FiLM layer keeps
    the full hidden width instead of hidden_dim // 2."""
    kwargs.setdefault("hidden_dim", 128)
    kwargs.setdefault("color_hidden_dim", kwargs["hidden_dim"])
    return NeRFNetwork(**kwargs)


class LinearSinAct(nn.Module):
    """Linear → sin (`generator_nerf_inr_v16.py:54-68`)."""

    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return jnp.sin(TorchLinear(self.out_dim, dtype=self.dtype, name="linear")(x))


class NeRFNetworkSigma(nn.Module):
    """v16 dev variant (`generator_nerf_inr_v16.py:373-593`): only the sigma
    path is style-conditioned (FiLM-sine stack → Linear σ); the color branch
    is an *unconditioned* LinearSinAct on the warped input followed by a
    kaiming-leaky Linear to the rgb feature.  Style keys ``{prefix}_w{i}``
    only (no ``{prefix}_rgb``)."""

    hidden_dim: int = 128
    hidden_layers: int = 2
    rgb_dim: int = 3
    box_sidelength: float = 0.24
    name_prefix: str = "nerf"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points: jnp.ndarray, style_dict: Mapping[str, jnp.ndarray]) -> jnp.ndarray:
        from cips3d_tpu.models.layers import FiLMSineLayer

        warped = uniform_box_warp(points.astype(self.dtype), self.box_sidelength)
        x = warped
        for i in range(self.hidden_layers):
            x = FiLMSineLayer(self.hidden_dim, dtype=self.dtype, name=f"film_{i}")(
                x, style_dict[f"{self.name_prefix}_w{i}"].astype(self.dtype)
            )
        sigma = TorchLinear(1, dtype=self.dtype, name="sigma")(x)
        c = LinearSinAct(self.hidden_dim // 2, dtype=self.dtype, name="color_sine")(warped)
        rgb = TorchLinear(
            self.rgb_dim, kernel_init=winit.kaiming_leaky_kernel, dtype=self.dtype,
            name="color_linear",
        )(c)
        return jnp.concatenate([rgb, sigma], axis=-1)
