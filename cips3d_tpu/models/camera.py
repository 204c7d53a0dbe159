"""Learnable / differentiable camera.

Counterpart of the tl2 `cam_params.CamParams` module used by the CIPS-3D
inversion pipeline (`exp/cips3d_inversion/scripts/train.py:33,310-314`,
generator-side ray API at
`exp/cips3d_inversion/models/generator.py:1294-1343,1360-1391`): a module of
learnable pinhole intrinsics (fx, fy in units of pixels, optimized in
log-scale softplus space) and optional learnable per-camera extrinsics
(axis-angle rotation + translation), producing world-space rays
``rays_o/rays_d (b, H, W, 3)`` for `GeneratorDiffcam`.

A third Adam optimizer trains these parameters alongside G and D
(`configs/ffhq_diffcam_exp.yaml:158`, `scripts/train.py:327-329`).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def axis_angle_to_matrix(aa: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Rodrigues: (b, 3) axis-angle → (b, 3, 3) rotation."""
    theta = jnp.linalg.norm(aa, axis=-1, keepdims=True)  # (b, 1)
    k = aa / jnp.maximum(theta, eps)  # unit axis
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    zero = jnp.zeros_like(kx)
    K = jnp.stack(
        [
            jnp.stack([zero, -kz, ky], -1),
            jnp.stack([kz, zero, -kx], -1),
            jnp.stack([-ky, kx, zero], -1),
        ],
        axis=-2,
    )  # (b, 3, 3)
    th = theta[..., None]
    eye = jnp.eye(3, dtype=aa.dtype)
    R = eye + jnp.sin(th) * K + (1 - jnp.cos(th)) * (K @ K)
    # theta ~ 0 → identity
    return jnp.where(th > eps, R, jnp.broadcast_to(eye, R.shape))


def pinhole_rays(
    rot: jnp.ndarray,      # (b, 3, 3) cam2world rotation
    trans: jnp.ndarray,    # (b, 3) camera origin
    focal_x: jnp.ndarray,  # scalar or (b,) in pixels
    focal_y: jnp.ndarray,
    H: int,
    W: int,
    cx: Optional[jnp.ndarray] = None,
    cy: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World-space rays for a pinhole camera (tl2 `cam_params.get_rays`
    analogue).  Returns rays_o, rays_d: (b, H, W, 3), dirs normalized;
    camera looks along -z."""
    b = rot.shape[0]
    cx = (W - 1) / 2.0 if cx is None else cx
    cy = (H - 1) / 2.0 if cy is None else cy
    i = jnp.arange(W, dtype=rot.dtype)
    j = jnp.arange(H, dtype=rot.dtype)
    ii = jnp.broadcast_to(i[None, :], (H, W))
    jj = jnp.broadcast_to(j[:, None], (H, W))
    fx = jnp.reshape(jnp.asarray(focal_x, rot.dtype), (-1, 1, 1))
    fy = jnp.reshape(jnp.asarray(focal_y, rot.dtype), (-1, 1, 1))
    dx = jnp.broadcast_to((ii[None] - cx) / fx, (b, H, W))
    dy = jnp.broadcast_to(-(jj[None] - cy) / fy, (b, H, W))
    dirs = jnp.stack([dx, dy, -jnp.ones((b, H, W), rot.dtype)], axis=-1)  # (b,H,W,3) cam space
    rays_d = jnp.einsum("bij,bhwj->bhwi", rot, dirs)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.broadcast_to(trans[:, None, None, :], rays_d.shape)
    return rays_o, rays_d


class CamParams(nn.Module):
    """Learnable intrinsics (+ optional learnable per-camera extrinsics).

    ``fov0`` seeds fx = fy = 0.5*W / tan(fov/2); intrinsics are stored as
    softplus-inverse so optimization keeps them positive.
    """

    H0: int = 64
    W0: int = 64
    fov0: float = 12.0
    num_cams: int = 0          # >0: learnable per-camera extrinsics
    learn_intrinsics: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        focal0 = 0.5 * self.W0 / math.tan(0.5 * math.radians(self.fov0))
        raw0 = math.log(math.exp(focal0) - 1.0) if focal0 < 30 else focal0
        init = lambda k, s, d=jnp.float32: jnp.full(s, raw0, d)
        if self.learn_intrinsics:
            self.fx_raw = self.param("fx_raw", init, (1,))
            self.fy_raw = self.param("fy_raw", init, (1,))
        else:
            self.fx_raw = jnp.full((1,), raw0)
            self.fy_raw = jnp.full((1,), raw0)
        if self.num_cams > 0:
            self.so3 = self.param(
                "so3", lambda k, s, d=jnp.float32: jnp.zeros(s, d), (self.num_cams, 3)
            )
            self.trans = self.param(
                "trans",
                lambda k, s, d=jnp.float32: jnp.tile(jnp.array([[0.0, 0.0, 1.0]], d), (self.num_cams, 1)),
                (self.num_cams, 3),
            )

    def intrinsics(self, H: Optional[int] = None, W: Optional[int] = None):
        """(fx, fy) scaled to the render resolution."""
        H, W = H or self.H0, W or self.W0
        fx = jax.nn.softplus(self.fx_raw) * (W / self.W0)
        fy = jax.nn.softplus(self.fy_raw) * (H / self.H0)
        return fx, fy

    def __call__(self, cam_idx: jnp.ndarray, H: int, W: int):
        """Rays for learnable cameras ``cam_idx`` (b,) → (rays_o, rays_d)."""
        rot = axis_angle_to_matrix(self.so3[cam_idx])
        trans = self.trans[cam_idx]
        fx, fy = self.intrinsics(H, W)
        return pinhole_rays(rot, trans, fx, fy, H, W)

    def get_rays_random_pose(
        self,
        key: jax.Array,
        bs: int,
        H: int,
        W: int,
        r: float = 1.0,
        h_stddev: float = 0.3,
        v_stddev: float = 0.155,
        h_mean: float = math.pi * 0.5,
        v_mean: float = math.pi * 0.5,
        mode: str = "gaussian",
    ):
        """Random sphere pose + learnable intrinsics
        (`scripts/train.py:310-314,445-449` get_rays_random_pose)."""
        from cips3d_tpu.core import rays as rays_lib

        origin, pitch, yaw = rays_lib.sample_camera_positions(
            key, bs=bs, r=r, horizontal_stddev=h_stddev, vertical_stddev=v_stddev,
            horizontal_mean=h_mean, vertical_mean=v_mean, mode=mode,
        )
        forward = rays_lib.normalize_vecs(-origin)
        c2w = rays_lib.create_cam2world_matrix(forward, origin)
        fx, fy = self.intrinsics(H, W)
        rays_o, rays_d = pinhole_rays(c2w[:, :3, :3], origin, fx, fy, H, W)
        return rays_o, rays_d, jnp.concatenate([pitch, yaw], axis=-1)
