"""pi-GAN baseline model family.

Counterparts of the vendored pi-GAN (`piGAN_lib/`):
  * `PiGANFiLMLayer` / `CustomMappingNetwork` (`piGAN_lib/siren/siren.py:48-95`):
    one mapping MLP emits (L+1)*hidden*2 outputs split into per-layer
    frequencies/phases; freq = raw*15 + 30; last mapping weight *= 0.25.
  * `SpatialSirenBaseline` (= SPATIALSIRENBASELINE, `siren.py:160-218`;
    TALLSIREN is the same without the box warp): 8 FiLM layers → sigma head;
    color FiLM on [dirs, x] → sigmoid RGB.  frequency_init(25) everywhere,
    first layer U(-1/in, 1/in).
  * `ImplicitGenerator3d` (`piGAN_lib/generators/generators.py:12-96`):
    camera/ray sampling → coarse → hierarchical fine → sort-merge → volume
    render → pixels*2-1, reusing `cips3d_tpu.core` (identical math to the
    CIPS-3D path, dim_rgb=3).
  * `ProgressiveDiscriminator` / `ProgressiveEncoderDiscriminator`
    (`piGAN_lib/discriminators/discriminators.py:115-230`):
    CoordConv residual pyramid with alpha fade-in; the encoder variant also
    predicts latent + position (used by the identity penalty,
    `exp/dev/nerf_inr/scripts/train_v16.py:713-725`).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cips3d_tpu.core import rays as rays_lib
from cips3d_tpu.core import volume as volume_lib
from cips3d_tpu.models import init as winit
from cips3d_tpu.models.generator import RenderOptions
from cips3d_tpu.models.layers import TorchLinear, uniform_box_warp


def _first_layer_init(key, shape, dtype=jnp.float32):
    """first_layer_film_sine_init: U(-1/in, 1/in) (`siren.py:36-39`)."""
    bound = 1.0 / shape[0]
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class PiGANFiLMLayer(nn.Module):
    """sin(freq * Wx + phase) (`siren.py:85-95`)."""

    hidden_dim: int
    first_layer: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, freq, phase):
        kinit = _first_layer_init if self.first_layer else winit.frequency_kernel(25.0)
        h = TorchLinear(self.hidden_dim, kernel_init=kinit, dtype=self.dtype, name="layer")(x)
        if x.ndim == 3:
            freq, phase = freq[:, None, :], phase[:, None, :]
        return jnp.sin(freq * h + phase)


class CustomMappingNetwork(nn.Module):
    """z → (frequencies, phase_shifts) (`siren.py:48-75`)."""

    map_hidden_dim: int
    map_output_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        h = z.astype(self.dtype)
        for i in range(3):
            h = TorchLinear(
                self.map_hidden_dim, kernel_init=winit.kaiming_leaky_kernel,
                dtype=self.dtype, name=f"fc{i}",
            )(h)
            h = nn.leaky_relu(h, 0.2)
        out = TorchLinear(
            self.map_output_dim,
            kernel_init=winit.scaled_kernel(winit.kaiming_leaky_kernel, 0.25),
            dtype=self.dtype,
            name="fc_out",
        )(h)
        half = self.map_output_dim // 2
        return out[..., :half], out[..., half:]


class SpatialSirenBaseline(nn.Module):
    """The pi-GAN SIREN backbone (`siren.py:160-218`).

    ``use_box_warp=False`` gives TALLSIREN (`siren.py:97-149`)."""

    z_dim: int = 256
    hidden_dim: int = 256
    n_layers: int = 8
    use_box_warp: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.network = [
            PiGANFiLMLayer(self.hidden_dim, first_layer=(i == 0), dtype=self.dtype, name=f"film_{i}")
            for i in range(self.n_layers)
        ]
        self.final_layer = TorchLinear(
            1, kernel_init=winit.frequency_kernel(25.0), dtype=self.dtype, name="sigma"
        )
        self.color_layer_sine = PiGANFiLMLayer(self.hidden_dim, dtype=self.dtype, name="color_film")
        self.color_layer_linear = TorchLinear(
            3, kernel_init=winit.frequency_kernel(25.0), dtype=self.dtype, name="color_linear"
        )
        self.mapping_network = CustomMappingNetwork(
            256, (self.n_layers + 1) * self.hidden_dim * 2, dtype=self.dtype
        )

    def __call__(self, points, z, ray_directions):
        freqs, phases = self.mapping_network(z)
        return self.forward_with_frequencies(points, freqs, phases, ray_directions)

    def forward_with_frequencies(self, points, frequencies, phase_shifts, ray_directions):
        """(b, n, 3) points + (b, n, 3) dirs → (b, n, 4) rgb+sigma
        (`siren.py:200-218`)."""
        frequencies = frequencies * 15.0 + 30.0
        x = uniform_box_warp(points.astype(self.dtype)) if self.use_box_warp else points.astype(self.dtype)
        h = self.hidden_dim
        for i, layer in enumerate(self.network):
            x = layer(x, frequencies[..., i * h:(i + 1) * h], phase_shifts[..., i * h:(i + 1) * h])
        sigma = self.final_layer(x)
        c = self.color_layer_sine(
            jnp.concatenate([ray_directions.astype(self.dtype), x], axis=-1),
            frequencies[..., -h:],
            phase_shifts[..., -h:],
        )
        rgb = jax.nn.sigmoid(self.color_layer_linear(c))
        return jnp.concatenate([rgb, sigma], axis=-1)


class ImplicitGenerator3d(nn.Module):
    """pi-GAN generator: SIREN + volume rendering
    (`generators.py:12-96`)."""

    z_dim: int = 256
    hidden_dim: int = 256
    use_box_warp: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.siren = SpatialSirenBaseline(
            z_dim=self.z_dim, hidden_dim=self.hidden_dim, use_box_warp=self.use_box_warp,
            dtype=self.dtype,
        )

    def mapping(self, z):
        return self.siren.mapping_network(z)

    def __call__(
        self,
        z: jnp.ndarray,
        key: jax.Array,
        opts: RenderOptions,
        freqs_phases: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (imgs (b, 3, H, W) in [-1, 1], pitch_yaw (b, 2))."""
        b = z.shape[0]
        k_rays, k_pdf, k_n1, k_n2 = jax.random.split(key, 4)
        world = rays_lib.get_world_points_and_direction(
            k_rays, batch_size=b, num_steps=opts.num_steps, img_size=opts.img_size,
            fov=opts.fov, ray_start=opts.ray_start, ray_end=opts.ray_end,
            h_stddev=opts.h_stddev, v_stddev=opts.v_stddev, h_mean=opts.h_mean,
            v_mean=opts.v_mean, sample_dist=opts.sample_dist,
            lock_view_dependence=opts.lock_view_dependence,
        )
        n, s = world.points.shape[1], opts.num_steps
        if freqs_phases is None:
            freqs, phases = self.siren.mapping_network(z)
        else:
            freqs, phases = freqs_phases

        def siren_eval(pts):
            return self.siren.forward_with_frequencies(
                pts.reshape(b, n * s, 3), freqs, phases,
                world.dirs_expanded.reshape(b, n * s, 3),
            ).reshape(b, n, s, 4)

        coarse = siren_eval(world.points)
        if opts.hierarchical_sample:
            fine_pts, fine_z = volume_lib.get_fine_points(
                k_pdf, coarse, world.z_vals, dim_rgb=3, clamp_mode=opts.clamp_mode,
                noise_std=opts.nerf_noise, num_steps=s,
                ray_origins=world.origins, ray_directions=world.dirs, noise_key=k_n1,
            )
            fine = siren_eval(fine_pts)
            # sort-free compositing over the [fine, coarse] concat (same
            # stable order as the reference's sort — see volume_render_unsorted)
            all_out = jnp.concatenate([fine, coarse], axis=-2)
            all_z = jnp.concatenate([fine_z, world.z_vals], axis=-2)
            pixels, _, _ = volume_lib.volume_render_unsorted(
                all_out[..., :3], all_out[..., 3:], all_z,
                noise_key=k_n2, noise_std=opts.nerf_noise,
                white_back=opts.white_back, last_back=opts.last_back,
                clamp_mode=opts.clamp_mode,
            )
        else:
            pixels, _, _ = volume_lib.volume_render(
                coarse, world.z_vals, noise_key=k_n2, noise_std=opts.nerf_noise,
                dim_rgb=3, white_back=opts.white_back, last_back=opts.last_back,
                clamp_mode=opts.clamp_mode,
            )
        h = w = opts.img_size
        imgs = pixels.transpose(0, 2, 1).reshape(b, 3, h, w) * 2.0 - 1.0
        return imgs, jnp.concatenate([world.pitch, world.yaw], axis=-1)


# --------------------------------------------------------------------- #
# discriminators


class CoordConv(nn.Module):
    """Conv2d with normalized coordinate channels appended
    (`discriminators.py:33-87`)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, c, hh, ww = x.shape
        yy = jnp.linspace(-1.0, 1.0, hh, dtype=x.dtype)
        xx = jnp.linspace(-1.0, 1.0, ww, dtype=x.dtype)
        yc = jnp.broadcast_to(yy[None, None, :, None], (b, 1, hh, ww))
        xc = jnp.broadcast_to(xx[None, None, None, :], (b, 1, hh, ww))
        # reference AddCoords orders (xx over H after transpose, yy over W)
        x = jnp.concatenate([x, yc, xc], axis=1)
        p = self.kernel_size // 2
        w = self.param(
            "weight",
            lambda k, s: _torch_conv_init(k, s),
            (self.out_channels, c + 2, self.kernel_size, self.kernel_size),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return y + bias.astype(y.dtype)[None, :, None, None]


def _torch_conv_init(key, shape, dtype=jnp.float32):
    """torch Conv2d default: kaiming_uniform(a=sqrt(5)) → U(-1/sqrt(fan), ..)."""
    fan_in = shape[1] * shape[2] * shape[3]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class ResidualCoordConvBlock(nn.Module):
    """(`discriminators.py:89-113`)"""

    planes: int
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inplanes = x.shape[1]
        y = CoordConv(self.planes, dtype=self.dtype, name="conv1")(x)
        y = nn.leaky_relu(y, 0.2)
        y = CoordConv(self.planes, dtype=self.dtype, name="conv2")(y)
        y = nn.leaky_relu(y, 0.2)
        identity = x
        if self.downsample:
            y = nn.avg_pool(y.transpose(0, 2, 3, 1), (2, 2), (2, 2)).transpose(0, 3, 1, 2)
            identity = nn.avg_pool(
                identity.transpose(0, 2, 3, 1), (2, 2), (2, 2)
            ).transpose(0, 3, 1, 2)
        if inplanes != self.planes:
            w = self.param(
                "proj_weight", _torch_conv_init, (self.planes, inplanes, 1, 1)
            )
            pb = self.param("proj_bias", nn.initializers.zeros, (self.planes,), jnp.float32)
            identity = jax.lax.conv_general_dilated(
                identity.astype(self.dtype), w.astype(self.dtype), (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            ) + pb.astype(self.dtype)[None, :, None, None]
        return (y + identity) / math.sqrt(2)


_PIGAN_PLANES = (16, 32, 64, 128, 256, 400, 400, 400, 400)
_PIGAN_OUT = (32, 64, 128, 256, 400, 400, 400, 400)


class ProgressiveDiscriminator(nn.Module):
    """CoordConv progressive D (`discriminators.py:115-162`).

    ``predict_encodings`` gives the Encoder variant: the final conv emits
    1 + 256 + 2 channels (logit, latent, position) (`discriminators.py:163-230`).
    """

    predict_encodings: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.blocks = [
            ResidualCoordConvBlock(_PIGAN_OUT[i], downsample=True, dtype=self.dtype, name=f"block_{i}")
            for i in range(8)
        ]
        self.from_rgb = [
            nn.Conv(
                _PIGAN_PLANES[i], (1, 1), dtype=self.dtype,
                kernel_init=lambda k, s, d=jnp.float32: _torch_conv_init(
                    k, (s[3], s[2], s[0], s[1]), d
                ).transpose(2, 3, 1, 0),
                name=f"from_rgb_{i}",
            )
            for i in range(9)
        ]
        out_ch = (1 + 256 + 2) if self.predict_encodings else 1
        self.final = nn.Conv(
            out_ch, (2, 2), padding="VALID", dtype=self.dtype, name="final"
        )

    def __call__(self, x, alpha=1.0):
        size = x.shape[-1]
        start = {2: 8, 4: 7, 8: 6, 16: 5, 32: 4, 64: 3, 128: 2, 256: 1, 512: 0}[size]

        def rgb(i, img):
            h = self.from_rgb[i](img.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
            return nn.leaky_relu(h, 0.2)

        h = rgb(start, x)
        for i, blk in enumerate(self.blocks[start:]):
            if i == 1:
                half = size // 2
                down = jax.image.resize(x, (x.shape[0], x.shape[1], half, half), "nearest")
                h = alpha * h + (1 - alpha) * rgb(start + 1, down)
            h = blk(h)
        out = self.final(h.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
        out = out.reshape(out.shape[0], -1)
        if self.predict_encodings:
            return out[:, 0:1], out[:, 1:257], out[:, 257:259]
        return out[:, 0:1], None, None
