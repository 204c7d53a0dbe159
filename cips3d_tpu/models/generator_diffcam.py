"""Differentiable-camera generator (the CIPS-3D inversion pipeline's G).

Counterpart of `Generator_Diffcam`
(`exp/cips3d_inversion/models/generator.py:1294-1540`): instead of sampling
its own camera, the generator takes explicit world-space rays
``rays_o/rays_d (b, h, w, 3)`` (from a learnable `CamParams`) plus NeRF
kwargs ``{near, far, N_samples, N_importance, perturb, raw_noise_std}``, and
renders with the same SIREN → hierarchical resample → volume render → INR
stack as the flagship generator.  Gradients flow back through the rays to the
camera parameters (trained by a third Adam,
`exp/cips3d_inversion/scripts/train.py:327-329`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from cips3d_tpu.core import volume as volume_lib
from cips3d_tpu.models.generator import GeneratorConfig, GeneratorNerfINR


@dataclasses.dataclass(frozen=True)
class NerfKwargs:
    """Rendering options of the diffcam pipeline
    (`configs/ffhq_diffcam_exp.yaml:38-92` nerf_kwargs)."""

    near: float = 0.88
    far: float = 1.12
    n_samples: int = 12
    n_importance: int = 12
    perturb: bool = True
    clamp_mode: str = "relu"
    white_back: bool = False
    last_back: bool = False
    raw_noise_std: Any = 0.0


class GeneratorDiffcam(GeneratorNerfINR):
    """GeneratorNerfINR with an explicit-ray forward."""

    def forward_rays(
        self,
        zs: Mapping[str, jnp.ndarray],
        rays_o: jnp.ndarray,
        rays_d: jnp.ndarray,
        key: jax.Array,
        nerf_kwargs: NerfKwargs = NerfKwargs(),
        return_aux_img: bool = False,
        avg_styles: Optional[Mapping[str, jnp.ndarray]] = None,
        psi: float = 1.0,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """rays (b, h, w, 3) → (imgs (b, 3, h, w), ret_maps)."""
        from cips3d_tpu.models.generator import truncate_styles

        b, h, w, _ = rays_o.shape
        n = h * w
        rays_o_f = rays_o.reshape(b, n, 3)
        rays_d_f = rays_d.reshape(b, n, 3)

        style_dict = self.mapping(zs["z_nerf"], zs["z_inr"])
        if avg_styles is not None:
            style_dict = truncate_styles(style_dict, avg_styles, psi)

        k_perturb, k_pdf, k_n1, k_n2 = jax.random.split(key, 4)
        s = nerf_kwargs.n_samples
        z_vals = jnp.linspace(nerf_kwargs.near, nerf_kwargs.far, s, dtype=rays_o.dtype)
        z_vals = jnp.broadcast_to(z_vals[None, None, :, None], (b, n, s, 1))
        if nerf_kwargs.perturb:
            spacing = (nerf_kwargs.far - nerf_kwargs.near) / (s - 1)
            z_vals = z_vals + (
                jax.random.uniform(k_perturb, z_vals.shape, z_vals.dtype) - 0.5
            ) * spacing
        points = rays_o_f[:, :, None, :] + rays_d_f[:, :, None, :] * z_vals

        coarse = self.siren(points.reshape(b, n * s, 3), style_dict).reshape(b, n, s, -1)

        if nerf_kwargs.n_importance > 0:
            fine_pts, fine_z = volume_lib.get_fine_points(
                k_pdf, coarse, z_vals, dim_rgb=self.cfg.nerf_rgb_dim,
                clamp_mode=nerf_kwargs.clamp_mode, noise_std=nerf_kwargs.raw_noise_std,
                num_steps=nerf_kwargs.n_importance,
                ray_origins=rays_o_f, ray_directions=rays_d_f, noise_key=k_n1,
            )
            fine = self.siren(
                fine_pts.reshape(b, n * nerf_kwargs.n_importance, 3), style_dict
            ).reshape(b, n, nerf_kwargs.n_importance, -1)
            c = self.cfg.nerf_rgb_dim
            # sort-free compositing (volume_render_unsorted); weights are in
            # arrival order, but only their order-invariant sum is consumed
            all_out = jnp.concatenate([fine, coarse], axis=-2)
            all_z = jnp.concatenate([fine_z, z_vals], axis=-2)
            pixels_fea, depth, weights = volume_lib.volume_render_unsorted(
                all_out[..., :c], all_out[..., c:], all_z,
                noise_key=k_n2, noise_std=nerf_kwargs.raw_noise_std,
                white_back=nerf_kwargs.white_back,
                last_back=nerf_kwargs.last_back, clamp_mode=nerf_kwargs.clamp_mode,
            )
        else:
            pixels_fea, depth, weights = volume_lib.volume_render(
                coarse, z_vals, noise_key=k_n2, noise_std=nerf_kwargs.raw_noise_std,
                dim_rgb=self.cfg.nerf_rgb_dim, white_back=nerf_kwargs.white_back,
                last_back=nerf_kwargs.last_back, clamp_mode=nerf_kwargs.clamp_mode,
            )
        inr_img = self.inr_net(pixels_fea, style_dict)
        imgs = inr_img.transpose(0, 2, 1).reshape(b, 3, h, w)

        ret_maps: Dict[str, jnp.ndarray] = {
            "depth": depth.transpose(0, 2, 1).reshape(b, 1, h, w),
            "weights_sum": weights.sum(axis=2).transpose(0, 2, 1).reshape(b, 1, h, w),
        }
        # aux head always evaluated so the param tree is stable (cf.
        # GeneratorNerfINR.points_forward)
        aux = jnp.tanh(self.aux_to_rgb(pixels_fea))
        if return_aux_img:
            ret_maps["aux_img"] = aux.transpose(0, 2, 1).reshape(b, 3, h, w)
        return imgs, ret_maps
