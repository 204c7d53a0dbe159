"""Full NeRF+INR generator.

Counterpart of `GeneratorNerfINR` (`exp/cips3d/models/generator.py:1159-1951`)
and the freeze-NeRF variant (`generator.py:1954-2083`): dual latents
(z_nerf, z_inr) → two mapping networks → style dict; camera/ray sampling →
coarse SIREN eval → hierarchical resample → fine SIREN eval → merge-sort →
volume integration → 32-dim feature image → CIPS INR decoder (+ parallel aux
RGB head).

Functional design: the module is pure; all randomness arrives as one key that
is split into (camera/perturb, pdf, sigma-noise) streams.  Rendering options
travel in a `RenderOptions` dataclass whose fields are static except
``nerf_noise`` and ``psi`` (traced scalars — they change per training step and
must not retrigger compilation).

Partial-gradient training (`part_grad_forward`, `generator.py:1536-1657`)
renders a random pixel subset with gradients and the rest under
`stop_gradient`, scatter-merged — on TPU, `stop_gradient` lets XLA drop the
backward residuals for the no-grad branch, reproducing the reference's memory
win without a custom autograd split.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Mapping, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cips3d_tpu.core import points as points_lib
from cips3d_tpu.core import rays as rays_lib
from cips3d_tpu.core import volume as volume_lib
from cips3d_tpu.models import init as winit
from cips3d_tpu.models.cips_net import CIPS_RESOLUTIONS, CIPSNet
from cips3d_tpu.models.layers import TorchLinear
from cips3d_tpu.models.mapping import MultiHeadMappingNetwork
from cips3d_tpu.models.nerf_net import NeRFNetwork


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    """Architecture hyperparameters.

    Defaults reproduce the FFHQ flagship `G_cfg_3D2D`
    (`exp/cips3d/configs/ffhq_exp.yaml:44-82`).
    """

    z_dim_nerf: int = 256
    z_dim_inr: int = 512
    nerf_hidden_dim: int = 128
    nerf_hidden_layers: int = 2
    nerf_rgb_dim: int = 32
    nerf_style_dim: int = 128          # == nerf mapping hidden_dim (head_layers=0)
    nerf_mapping_layers: int = 4
    inr_hidden_dim: int = 512
    inr_style_dim: int = 512           # == inr mapping hidden_dim (head_layers=0)
    inr_mapping_layers: int = 8
    inr_pre_rgb_dim: int = 3
    freeze_nerf: bool = False          # GeneratorNerfINR_freeze_NeRF (`generator.py:1954`)
    # Polynomial sine in the SIREN (ops/fast_sin.py): ~1.7e-5 max abs error,
    # an inference-only speed knob for the sin-bound point MLP.
    fast_sin: bool = False
    # Fused ray-tile renderer (ops/pallas/ray_tile.py): the whole NeRF stage
    # — coarse SIREN → resample → fine SIREN → compositing — in one Pallas
    # kernel over VMEM-resident ray tiles (SURVEY §7.7), with a hand-written
    # Pallas backward (custom VJP) for training.  1.4-1.5x the XLA path on
    # r256 inference (88.9 vs 60.8 fps); ~even at r64 training (BENCH_NOTES).
    fused_ray: bool = False
    # Backward implementation for the fused ray-tile kernel: 'pallas'
    # (in-VMEM forward recompute — cheapest HBM traffic, 3x total sine
    # count so it wins under fast_sin) or 'pallas_residual' (the forward
    # saves hidden states/pre-activations, the backward consumes them —
    # XLA-parity 2x sine count, the exact-sin training variant).
    fused_ray_vjp: str = "pallas"
    # Fused CIPS-INR decoder (ops/pallas/inr_tile.py): the whole 9-block
    # modulated-FC chain per VMEM-resident pixel tile, modulation/demodulation
    # precomputed per batch.  FORWARD-ONLY (no VJP — autodiff raises):
    # serving path; training keeps the XLA INR.
    fused_inr: bool = False

    def __post_init__(self):
        # Loud architecture gates (round-3 verdict next #6): a fused kernel
        # requested outside its envelope must error at config time, not fall
        # back silently in one code path (train/step.py's auto-picker) and
        # KeyError in another.  The ray-tile kernel is depth-generic as of
        # round 4 (ops/pallas/ray_tile.py unrolls over hidden layers), so
        # fused_ray only needs a sane depth.
        if self.fused_ray and self.nerf_hidden_layers < 1:
            raise ValueError(
                "fused_ray=True requires nerf_hidden_layers >= 1; got "
                f"nerf_hidden_layers={self.nerf_hidden_layers}."
            )
        if self.fused_inr and self.inr_pre_rgb_dim != 3:
            raise ValueError(
                "fused_inr=True requires inr_pre_rgb_dim == 3 (the fused "
                "CIPS-INR kernel's to_rgb layout, ops/pallas/inr_tile.py); "
                f"got inr_pre_rgb_dim={self.inr_pre_rgb_dim}."
            )
        if self.fused_ray_vjp not in ("pallas", "pallas_residual", "jnp"):
            raise ValueError(
                "fused_ray_vjp must be one of 'pallas' (in-VMEM recompute "
                "backward), 'pallas_residual' (residual-passing backward) or "
                f"'jnp' (reference VJP); got {self.fused_ray_vjp!r}."
            )


@dataclasses.dataclass(frozen=True)
class RenderOptions:
    """Camera + volume-rendering options (reference `G_kwargs`,
    `exp/cips3d/configs/ffhq_exp.yaml:117-127`)."""

    img_size: int = 64
    fov: float = 12.0
    ray_start: float = 0.88
    ray_end: float = 1.12
    num_steps: int = 12
    h_stddev: float = 0.3
    v_stddev: float = 0.155
    h_mean: float = math.pi * 0.5
    v_mean: float = math.pi * 0.5
    hierarchical_sample: bool = True
    sample_dist: str = "gaussian"
    lock_view_dependence: bool = False
    clamp_mode: str = "relu"
    white_back: bool = False
    last_back: bool = False
    # dynamic (traced) values — pass jnp scalars during training:
    nerf_noise: Any = 0.0
    psi: Any = 1.0

    def static_fields(self):
        d = dataclasses.asdict(self)
        d.pop("nerf_noise")
        d.pop("psi")
        return d


class GeneratorNerfINR(nn.Module):
    """The flagship generator; apply with method= one of
    (`__call__`, `mapping`, `points_forward`, `forward_with_rays`)."""

    cfg: GeneratorConfig = GeneratorConfig()
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.siren = NeRFNetwork(
            hidden_dim=c.nerf_hidden_dim,
            hidden_layers=c.nerf_hidden_layers,
            rgb_dim=c.nerf_rgb_dim,
            fast_sin=c.fast_sin,
            dtype=self.dtype,
        )
        nerf_heads = {f"nerf_w{i}": c.nerf_style_dim for i in range(c.nerf_hidden_layers)}
        nerf_heads["nerf_rgb"] = c.nerf_style_dim
        self.mapping_network_nerf = MultiHeadMappingNetwork(
            hidden_dim=c.nerf_style_dim,
            base_layers=c.nerf_mapping_layers,
            head_layers=0,
            head_dim_dict=nerf_heads,
            dtype=self.dtype,
        )
        self.inr_net = CIPSNet(
            hidden_dim=c.inr_hidden_dim, pre_rgb_dim=c.inr_pre_rgb_dim, dtype=self.dtype
        )
        inr_heads = {}
        for res in CIPS_RESOLUTIONS:
            inr_heads[f"inr_w{res}_0"] = c.inr_style_dim
            inr_heads[f"inr_w{res}_1"] = c.inr_style_dim
        self.mapping_network_inr = MultiHeadMappingNetwork(
            hidden_dim=c.inr_style_dim,
            base_layers=c.inr_mapping_layers,
            head_layers=0,
            head_dim_dict=inr_heads,
            add_norm=True,
            norm_out=True,
            dtype=self.dtype,
        )
        # aux branch: Linear(rgb_dim → 3, frequency_init(25)) + tanh
        # (`generator.py:1204-1208`)
        self.aux_to_rgb = TorchLinear(
            3, kernel_init=winit.frequency_kernel(25.0), dtype=self.dtype
        )

    # ------------------------------------------------------------------ #
    # mapping

    def mapping(self, z_nerf: jnp.ndarray, z_inr: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Dual mapping (`generator.py:1796-1802`); with freeze_nerf the nerf
        styles are detached (`generator.py:1963-1970`)."""
        from cips3d_tpu.utils import debug

        nerf_styles = self.mapping_network_nerf(z_nerf)
        if self.cfg.freeze_nerf:
            nerf_styles = jax.tree_util.tree_map(jax.lax.stop_gradient, nerf_styles)
        style_dict = dict(nerf_styles)
        style_dict.update(self.mapping_network_inr(z_inr))
        debug.trace("mapping", **style_dict)
        return style_dict

    # ------------------------------------------------------------------ #
    # core point pipeline

    def points_forward(
        self,
        style_dict: Mapping[str, jnp.ndarray],
        world: rays_lib.WorldRays,
        opts: RenderOptions,
        key: jax.Array,
        return_aux_img: bool = True,
        idx_grad: Optional[jnp.ndarray] = None,
        return_depth: bool = False,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """Coarse→fine NeRF + INR decode for a set of rays
        (`generator.py:1659-1762`).

        world.* have pixel axis n; if ``idx_grad`` is given, only those pixels
        are rendered (gather, `generator.py:1692-1698`).

        Returns (inr_img (b, n', 3), aux_img (b, n', 3) or None); with
        ``return_depth`` additionally the expected ray depth (b, n', 1) —
        the depth_map the reference's staged/explicit-camera forwards expose
        (`exp/pigan/models/generators.py` returns (pixels, depth_map);
        `st_web.py:34,441`).
        """
        pts, dirs_exp, z_vals = world.points, world.dirs_expanded, world.z_vals
        origins, dirs = world.origins, world.dirs
        if idx_grad is not None:
            pts = points_lib.gather_points(pts, idx_grad)
            dirs_exp = points_lib.gather_points(dirs_exp, idx_grad)
            z_vals = points_lib.gather_points(z_vals, idx_grad)
            origins = points_lib.gather_points(origins, idx_grad)
            dirs = points_lib.gather_points(dirs, idx_grad)

        # 2-D (data x rays) training mesh: pin the pixel axis sharding here
        # and XLA propagates it through the (pointwise-per-ray) SIREN /
        # compositing / INR chain.  No-op outside a pixel_sharding_scope.
        from cips3d_tpu.parallel import mesh as mesh_lib

        if mesh_lib.pixel_scope_active():
            pts = mesh_lib.constrain_pixels(pts)
            dirs_exp = mesh_lib.constrain_pixels(dirs_exp)
            z_vals = mesh_lib.constrain_pixels(z_vals)
            origins = mesh_lib.constrain_pixels(origins)
            dirs = mesh_lib.constrain_pixels(dirs)

        b, n, s, _ = pts.shape

        from cips3d_tpu.utils import debug

        if (
            self.cfg.fused_ray
            and opts.hierarchical_sample
            and not self.is_initializing()
        ):
            # One Pallas kernel for the whole NeRF stage (ops/pallas/ray_tile
            # .py): identical key-split and draw shapes as the XLA path below,
            # so the two paths agree on the same key.
            from cips3d_tpu.ops.pallas.ray_tile import fused_ray_render

            pixels_fea, pixels_depth = fused_ray_render(
                self.siren.variables["params"], style_dict,
                pts, origins, dirs, z_vals, key,
                noise_std=opts.nerf_noise, clamp_mode=opts.clamp_mode,
                white_back=opts.white_back, last_back=opts.last_back,
                dtype=self.dtype, fast_sin=self.cfg.fast_sin,
                vjp_impl=self.cfg.fused_ray_vjp,
            )
            if self.cfg.freeze_nerf:
                pixels_fea = jax.lax.stop_gradient(pixels_fea)
                pixels_depth = jax.lax.stop_gradient(pixels_depth)
            return self._decode_pixels(
                pixels_fea, pixels_depth, style_dict, return_aux_img, return_depth
            )

        k_pdf, k_noise_coarse, k_noise_final = jax.random.split(key, 3)

        def siren_eval(p_flat):
            """→ (rgb (b, n·s, c), sigma (b, n·s, 1)) — rgb and sigma stay
            separate through the whole volume path (a packed (c+1)-channel
            tensor forces layout-conversion copies on TPU; ~20% of the r256
            step's copy time before the split)."""
            return self.siren(p_flat, style_dict, split=True)

        from cips3d_tpu.utils import debug

        debug.trace("points_forward.in", points=pts, dirs=dirs_exp, z_vals=z_vals)
        coarse_rgb, coarse_sigma = siren_eval(pts.reshape(b, n * s, 3))
        coarse_rgb = coarse_rgb.reshape(b, n, s, -1)
        coarse_sigma = coarse_sigma.reshape(b, n, s, 1)
        debug.trace("points_forward.coarse", coarse_rgb, coarse_sigma)

        if opts.hierarchical_sample:
            fine_pts, fine_z = volume_lib.get_fine_points_from_sigma(
                k_pdf,
                coarse_sigma,
                z_vals,
                clamp_mode=opts.clamp_mode,
                noise_std=opts.nerf_noise,
                num_steps=s,
                ray_origins=origins,
                ray_directions=dirs,
                noise_key=k_noise_coarse,
            )
            fine_rgb, fine_sigma = siren_eval(fine_pts.reshape(b, n * s, 3))
            # [fine, coarse] arrival order matches the reference's stable
            # sort tie-break (`generator.py:1733`); compositing is sort-free
            all_rgb = jnp.concatenate([fine_rgb.reshape(b, n, s, -1), coarse_rgb], axis=-2)
            all_sigma = jnp.concatenate([fine_sigma.reshape(b, n, s, 1), coarse_sigma], axis=-2)
            all_z = jnp.concatenate([fine_z, z_vals], axis=-2)
            render_fn = volume_lib.volume_render_unsorted
        else:
            all_rgb, all_sigma, all_z = coarse_rgb, coarse_sigma, z_vals
            render_fn = volume_lib.volume_render_split

        if self.cfg.freeze_nerf:
            # `GeneratorNerfINR_freeze_NeRF.points_forward` runs the whole
            # NeRF stack under no_grad (`generator.py:1972-2040`).
            all_rgb = jax.lax.stop_gradient(all_rgb)
            all_sigma = jax.lax.stop_gradient(all_sigma)
            all_z = jax.lax.stop_gradient(all_z)

        pixels_fea, pixels_depth, _ = render_fn(
            all_rgb,
            all_sigma,
            all_z,
            noise_key=k_noise_final,
            noise_std=opts.nerf_noise,
            white_back=opts.white_back,
            last_back=opts.last_back,
            clamp_mode=opts.clamp_mode,
        )
        if self.cfg.freeze_nerf:
            pixels_fea = jax.lax.stop_gradient(pixels_fea)
        return self._decode_pixels(
            pixels_fea, pixels_depth, style_dict, return_aux_img, return_depth
        )

    def _decode_pixels(
        self, pixels_fea, pixels_depth, style_dict, return_aux_img, return_depth
    ):
        """INR decode + aux head on composited ray features — the tail of
        `points_forward` shared by the XLA and fused-ray paths."""
        from cips3d_tpu.parallel import mesh as mesh_lib
        from cips3d_tpu.utils import debug

        debug.trace("points_forward.pixels_fea", pixels_fea)
        pixels_fea = mesh_lib.constrain_pixels(pixels_fea)
        # Training path runs all nine INR blocks regardless of img_size
        # (`generator.py:1754` passes no img_size).
        if (
            self.cfg.fused_inr
            and self.cfg.inr_pre_rgb_dim == 3
            and not self.is_initializing()
        ):
            from cips3d_tpu.ops.pallas.inr_tile import fused_inr_decode

            inr_img = fused_inr_decode(
                self.inr_net.variables["params"], style_dict, pixels_fea,
                dtype=self.dtype,
            )
        else:
            inr_img = self.inr_net(pixels_fea, style_dict)
        debug.trace("points_forward.inr_img", inr_img)

        # Always evaluate the (tiny) aux head so the param tree does not depend
        # on return_aux_img; callers drop it when unused.
        aux = self.aux_to_rgb(pixels_fea)
        if self.cfg.freeze_nerf:
            aux = jax.lax.stop_gradient(aux)
        aux_img = jnp.tanh(aux)
        if return_depth:
            return inr_img, aux_img, jax.lax.stop_gradient(pixels_depth)
        return inr_img, aux_img

    # ------------------------------------------------------------------ #
    # full forwards

    def _sample_world(self, key, batch_size, opts: RenderOptions, camera_pos=None,
                      camera_lookup=None, up_vector=None):
        return rays_lib.get_world_points_and_direction(
            key,
            batch_size=batch_size,
            num_steps=opts.num_steps,
            img_size=opts.img_size,
            fov=opts.fov,
            ray_start=opts.ray_start,
            ray_end=opts.ray_end,
            h_stddev=opts.h_stddev,
            v_stddev=opts.v_stddev,
            h_mean=opts.h_mean,
            v_mean=opts.v_mean,
            sample_dist=opts.sample_dist,
            lock_view_dependence=opts.lock_view_dependence,
            camera_pos=camera_pos,
            camera_lookup=camera_lookup,
            up_vector=up_vector,
        )

    def __call__(
        self,
        zs: Mapping[str, jnp.ndarray],
        key: jax.Array,
        opts: RenderOptions,
        return_aux_img: bool = False,
        grad_points: Optional[int] = None,
        avg_styles: Optional[Mapping[str, jnp.ndarray]] = None,
        camera_pos: Optional[jnp.ndarray] = None,
        camera_lookup: Optional[jnp.ndarray] = None,
        up_vector: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Generate images (`generator.py:1256-1370`).

        zs: {"z_nerf": (b, z_nerf), "z_inr": (b, z_inr)}.
        Truncation: if ``avg_styles`` is provided, styles are lerped toward it
        with factor ``opts.psi`` (`generator.py:1320-1323`).

        Returns (imgs (B, 3, H, W), pitch_yaw (B, 2)); B doubles when
        ``return_aux_img`` (aux batch appended, `generator.py:1526-1533`).
        """
        b = zs["z_nerf"].shape[0]
        k_rays, k_pts = jax.random.split(key)

        style_dict = self.mapping(zs["z_nerf"], zs["z_inr"])
        if avg_styles is not None:
            style_dict = truncate_styles(style_dict, avg_styles, opts.psi)

        world = self._sample_world(k_rays, b, opts, camera_pos, camera_lookup, up_vector)

        h = w = opts.img_size
        num_points = h * w
        if grad_points is not None and grad_points < num_points:
            k_perm, k_pts1, k_pts2 = jax.random.split(k_pts, 3)
            perm = jax.random.permutation(k_perm, num_points)
            idx_grad, idx_no_grad = perm[:grad_points], perm[grad_points:]
            inr_g, aux_g = self.points_forward(
                style_dict, world, opts, k_pts1, return_aux_img, idx_grad=idx_grad
            )
            inr_n, aux_n = self.points_forward(
                style_dict, world, opts, k_pts2, return_aux_img, idx_grad=idx_no_grad
            )
            inr_n = jax.lax.stop_gradient(inr_n)
            inr_img = points_lib.scatter_points(idx_grad, inr_g, idx_no_grad, inr_n, num_points)
            if return_aux_img:
                aux_n = jax.lax.stop_gradient(aux_n)
                aux_img = points_lib.scatter_points(idx_grad, aux_g, idx_no_grad, aux_n, num_points)
            else:
                aux_img = None
        else:
            inr_img, aux_img = self.points_forward(style_dict, world, opts, k_pts, return_aux_img)

        imgs = _to_nchw(inr_img, h, w)
        pitch_yaw = jnp.concatenate([world.pitch, world.yaw], axis=-1)
        if return_aux_img:
            imgs = jnp.concatenate([imgs, _to_nchw(aux_img, h, w)], axis=0)
            pitch_yaw = jnp.concatenate([pitch_yaw, pitch_yaw], axis=0)
        return imgs, pitch_yaw

    def forward_with_rays(
        self,
        style_dict: Mapping[str, jnp.ndarray],
        world: rays_lib.WorldRays,
        opts: RenderOptions,
        key: jax.Array,
        return_aux_img: bool = False,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """Render from precomputed styles + rays (building block for the
        chunked `forward_points` inference path and explicit-camera demos,
        `generator.py:1406-1473,1828-1951`)."""
        h = w = opts.img_size
        inr_img, aux_img = self.points_forward(style_dict, world, opts, key, return_aux_img)
        return _to_nchw(inr_img, h, w), (None if aux_img is None else _to_nchw(aux_img, h, w))


def _to_nchw(img_flat: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(b, h*w, c) → (b, c, h, w) (`generator.py:1518`)."""
    b, _, c = img_flat.shape
    return img_flat.transpose(0, 2, 1).reshape(b, c, h, w)


def truncate_styles(style_dict, avg_styles, psi):
    """avg + psi * (style - avg) (`generator_nerf_inr.py:770-783`)."""
    return {
        name: avg_styles[name] + psi * (style - avg_styles[name])
        for name, style in style_dict.items()
    }


def sample_zs(key, batch_size: int, cfg: GeneratorConfig, dist: str = "gaussian"):
    """Draw the dual latents (`generator.py:1764-1776`)."""
    k1, k2 = jax.random.split(key)
    if dist == "gaussian":
        z_nerf = jax.random.normal(k1, (batch_size, cfg.z_dim_nerf))
        z_inr = jax.random.normal(k2, (batch_size, cfg.z_dim_inr))
    elif dist == "uniform":
        z_nerf = jax.random.uniform(k1, (batch_size, cfg.z_dim_nerf)) * 2 - 1
        z_inr = jax.random.uniform(k2, (batch_size, cfg.z_dim_inr)) * 2 - 1
    else:
        raise ValueError(dist)
    return {"z_nerf": z_nerf, "z_inr": z_inr}


def generate_avg_styles(model, params, key, cfg: GeneratorConfig, num_samples: int = 10000):
    """Mean style vectors over ``num_samples`` random z draws
    (`generator.py:1804-1817`); used for truncation."""
    zs = sample_zs(key, num_samples, cfg)
    styles = model.apply(params, zs["z_nerf"], zs["z_inr"], method=model.mapping)
    return {name: jnp.mean(s, axis=0, keepdims=True) for name, s in styles.items()}
