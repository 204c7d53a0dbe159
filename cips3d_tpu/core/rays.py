"""Camera and ray math for the NeRF backbone.

Functional JAX counterparts of the reference's torch ray helpers
(`exp/comm/comm_utils.py:365-763`).  All randomness is explicit via
`jax.random` keys; every function is jit-safe (static shapes, no Python
branching on traced values).

Conventions (matching the reference):
  * The camera sits on a unit sphere, looking at the origin.
  * Pixel grid is NDC in [-1, 1]; y is flipped so row 0 is the top of the
    image (`comm_utils.py:390-395`).
  * `pitch` (phi) is the polar angle in [0, pi] measured from +y;
    `yaw` (theta) is the azimuth.  Camera position is
    (r sin(phi) cos(theta), r cos(phi), r sin(phi) sin(theta))
    (`comm_utils.py:530-533`).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


def normalize_vecs(v: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Normalize vectors along the last axis (`comm_utils.py:353-362`)."""
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    if eps:
        norm = jnp.maximum(norm, eps)
    return v / norm


def get_initial_rays_trig(
    num_steps: int,
    fov: float,
    resolution: Tuple[int, int],
    ray_start: float,
    ray_end: float,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample points / z-vals / ray dirs in *camera* space for a pixel grid.

    Counterpart of `comm_utils.get_initial_rays_trig` (`comm_utils.py:365-412`)
    without the batch dimension (the result is camera-independent, so we
    broadcast later instead of materializing per-batch copies).

    Returns:
      points:      (H*W, num_steps, 3) — dir * z for each depth step
      z_vals:      (H*W, num_steps, 1) — linspace(ray_start, ray_end)
      rays_d_cam:  (H*W, 3) — normalized pinhole directions
    """
    W, H = resolution
    # Pixel (i, j) -> x = -1 + 2j/(W-1), y = 1 - 2i/(H-1)   (y flipped).
    x = jnp.linspace(-1.0, 1.0, W, dtype=dtype)
    y = jnp.linspace(1.0, -1.0, H, dtype=dtype)
    xg = jnp.broadcast_to(x[None, :], (H, W)).reshape(-1)
    yg = jnp.broadcast_to(y[:, None], (H, W)).reshape(-1)
    z = -jnp.ones_like(xg) / math.tan((2 * math.pi * fov / 360.0) / 2.0)
    rays_d_cam = normalize_vecs(jnp.stack([xg, yg, z], axis=-1))  # (HW, 3)

    z_vals = jnp.linspace(ray_start, ray_end, num_steps, dtype=dtype)
    z_vals = jnp.broadcast_to(z_vals[None, :, None], (H * W, num_steps, 1))
    points = rays_d_cam[:, None, :] * z_vals  # (HW, S, 3)
    return points, z_vals, rays_d_cam


def perturb_points(
    key: jax.Array,
    points: jnp.ndarray,
    z_vals: jnp.ndarray,
    ray_directions: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stratified jitter of depth samples (`comm_utils.py:416-438`).

    offset ~ U(-0.5, 0.5) * (z_vals[1] - z_vals[0]) applied to both z_vals and
    the corresponding world-space points.

    Shapes: points (b, n, s, 3), z_vals (b, n, s, 1), ray_directions (b, n, 3).
    """
    spacing = z_vals[:, :, 1:2, :] - z_vals[:, :, 0:1, :]  # (b, n, 1, 1)
    offset = (jax.random.uniform(key, z_vals.shape, z_vals.dtype) - 0.5) * spacing
    z_vals = z_vals + offset
    points = points + offset * ray_directions[:, :, None, :]
    return points, z_vals


def _truncated_normal(key: jax.Array, shape, dtype=jnp.float32) -> jnp.ndarray:
    """Standard normal truncated to (-2, 2) (`comm_utils.py:441-448`)."""
    return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


#: Camera-distribution modes supported by :func:`sample_camera_positions`
#: (`comm_utils.py:476-526`).
CAMERA_MODES = (
    "uniform",
    "normal",
    "gaussian",
    "hybrid",
    "truncated_gaussian",
    "spherical_uniform",
    "mean",
)


def sample_camera_positions(
    key: jax.Array,
    bs: int,
    r: float = 1.0,
    horizontal_stddev: float = 1.0,
    vertical_stddev: float = 1.0,
    horizontal_mean: float = math.pi * 0.5,
    vertical_mean: float = math.pi * 0.5,
    mode: str = "normal",
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample camera positions on a sphere of radius ``r``.

    Counterpart of `comm_utils.sample_camera_positions`
    (`comm_utils.py:451-535`).  ``mode`` is static; the reference's
    Python-level coin flip in ``hybrid`` becomes a `lax.cond` on a Bernoulli
    draw so that one traced function covers both branches.

    Returns: (camera position (bs, 3), pitch (bs, 1), yaw (bs, 1)).
    """
    k_theta, k_phi, k_flip = jax.random.split(key, 3)

    def _uniform(kt, kp, h_scale=1.0, v_scale=1.0):
        theta = (jax.random.uniform(kt, (bs, 1), dtype) - 0.5) * 2 * horizontal_stddev * h_scale + horizontal_mean
        phi = (jax.random.uniform(kp, (bs, 1), dtype) - 0.5) * 2 * vertical_stddev * v_scale + vertical_mean
        return theta, phi

    def _normal(kt, kp):
        theta = jax.random.normal(kt, (bs, 1), dtype) * horizontal_stddev + horizontal_mean
        phi = jax.random.normal(kp, (bs, 1), dtype) * vertical_stddev + vertical_mean
        return theta, phi

    if mode == "uniform":
        theta, phi = _uniform(k_theta, k_phi)
    elif mode in ("normal", "gaussian"):
        theta, phi = _normal(k_theta, k_phi)
    elif mode == "hybrid":
        # Reference flips a Python coin per call (`comm_utils.py:493`); here the
        # coin is a traced Bernoulli so the sample stays inside jit.
        coin = jax.random.bernoulli(k_flip)
        theta_u, phi_u = _uniform(k_theta, k_phi, h_scale=2.0, v_scale=2.0)
        theta_n, phi_n = _normal(k_theta, k_phi)
        theta = jnp.where(coin, theta_u, theta_n)
        phi = jnp.where(coin, phi_u, phi_n)
    elif mode == "truncated_gaussian":
        theta = _truncated_normal(k_theta, (bs, 1), dtype) * horizontal_stddev + horizontal_mean
        phi = _truncated_normal(k_phi, (bs, 1), dtype) * vertical_stddev + vertical_mean
    elif mode == "spherical_uniform":
        theta = (jax.random.uniform(k_theta, (bs, 1), dtype) - 0.5) * 2 * horizontal_stddev + horizontal_mean
        v_stddev, v_mean = vertical_stddev / math.pi, vertical_mean / math.pi
        v = (jax.random.uniform(k_phi, (bs, 1), dtype) - 0.5) * 2 * v_stddev + v_mean
        v = jnp.clip(v, 1e-5, 1 - 1e-5)
        phi = jnp.arccos(1 - 2 * v)
    elif mode == "mean":
        theta = jnp.full((bs, 1), horizontal_mean, dtype)
        phi = jnp.full((bs, 1), vertical_mean, dtype)
    else:
        raise ValueError(f"unknown camera mode: {mode!r} (expected one of {CAMERA_MODES})")

    phi = jnp.clip(phi, 1e-5, math.pi - 1e-5)

    pos = jnp.concatenate(
        [
            r * jnp.sin(phi) * jnp.cos(theta),
            r * jnp.cos(phi),
            r * jnp.sin(phi) * jnp.sin(theta),
        ],
        axis=-1,
    )  # (bs, 3)
    return pos, phi, theta


def create_cam2world_matrix(
    forward_vector: jnp.ndarray,
    origin: jnp.ndarray,
    up_vector: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Look-at cam2world matrix (`comm_utils.py:538-581`).

    Args: forward_vector (b, 3) — direction the camera looks; origin (b, 3).
    Returns: (b, 4, 4) homogeneous transform.
    """
    forward_vector = normalize_vecs(forward_vector)
    if up_vector is None:
        up_vector = jnp.broadcast_to(
            jnp.array([0.0, 1.0, 0.0], forward_vector.dtype), forward_vector.shape
        )
    left_vector = normalize_vecs(jnp.cross(up_vector, forward_vector))
    up_vector = normalize_vecs(jnp.cross(forward_vector, left_vector))

    rot = jnp.stack([-left_vector, up_vector, -forward_vector], axis=-1)  # (b, 3, 3) columns
    b = forward_vector.shape[0]
    cam2world = jnp.tile(jnp.eye(4, dtype=forward_vector.dtype)[None], (b, 1, 1))
    cam2world = cam2world.at[:, :3, :3].set(rot)
    cam2world = cam2world.at[:, :3, 3].set(origin)
    return cam2world


class WorldRays(NamedTuple):
    """Output of :func:`get_world_points_and_direction`.

    Mirrors the tuple returned by `comm_utils.get_world_points_and_direction`
    (`comm_utils.py:760-763`) but keeps the (b, n, s, ...) factorization (the
    reference flattens points to (b, n*s, 3); our model code flattens at the
    MLP boundary instead).
    """

    points: jnp.ndarray          # (b, HW, S, 3) world-space sample points (perturbed)
    dirs_expanded: jnp.ndarray   # (b, HW, S, 3) ray dir per sample (or locked)
    origins: jnp.ndarray         # (b, HW, 3) ray origins
    dirs: jnp.ndarray            # (b, HW, 3) ray directions
    z_vals: jnp.ndarray          # (b, HW, S, 1) perturbed depths
    pitch: jnp.ndarray           # (b, 1)
    yaw: jnp.ndarray             # (b, 1)


def transform_sampled_points(
    key: jax.Array,
    points: jnp.ndarray,
    z_vals: jnp.ndarray,
    ray_directions: jnp.ndarray,
    h_stddev: float = 1.0,
    v_stddev: float = 1.0,
    h_mean: float = math.pi * 0.5,
    v_mean: float = math.pi * 0.5,
    mode: str = "normal",
    camera_pos: Optional[jnp.ndarray] = None,
    camera_lookup: Optional[jnp.ndarray] = None,
    up_vector: Optional[jnp.ndarray] = None,
    perturb: bool = True,
):
    """Perturb depths, sample a camera, and map camera-space rays to world.

    Counterpart of `comm_utils.transform_sampled_points`
    (`comm_utils.py:584-679`).

    Shapes: points (b, n, s, 3); z_vals (b, n, s, 1); ray_directions (b, n, 3).
    Returns (points, z_vals, dirs, origins, pitch, yaw) — all world-space.
    """
    bs, num_rays, num_steps, _ = points.shape
    k_perturb, k_cam = jax.random.split(key)

    if perturb:
        points, z_vals = perturb_points(k_perturb, points, z_vals, ray_directions)

    if camera_pos is None or camera_lookup is None:
        camera_origin, pitch, yaw = sample_camera_positions(
            k_cam,
            bs=bs,
            r=1.0,
            horizontal_stddev=h_stddev,
            vertical_stddev=v_stddev,
            horizontal_mean=h_mean,
            vertical_mean=v_mean,
            mode=mode,
            dtype=points.dtype,
        )
        forward_vector = normalize_vecs(-camera_origin)
    else:
        # camera_lookup is a view DIRECTION (trajectory builders produce
        # `lookup = -xyz`, `comm_utils.py:101`), not a look-at point.
        camera_origin = camera_pos
        pitch = yaw = jnp.zeros((bs, 1), points.dtype)
        forward_vector = normalize_vecs(camera_lookup)

    cam2world = create_cam2world_matrix(forward_vector, camera_origin, up_vector=up_vector)
    rot = cam2world[:, :3, :3]   # (b, 3, 3)
    trans = cam2world[:, :3, 3]  # (b, 3)

    # Rotate+translate points: x_w = R x_c + t   (the reference uses a 4x4 bmm
    # on homogeneous coords, `comm_utils.py:649-660`; identical result).
    transformed_points = jnp.einsum("bij,bnsj->bnsi", rot, points) + trans[:, None, None, :]
    transformed_ray_directions = jnp.einsum("bij,bnj->bni", rot, ray_directions)
    transformed_ray_origins = jnp.broadcast_to(trans[:, None, :], (bs, num_rays, 3))

    return transformed_points, z_vals, transformed_ray_directions, transformed_ray_origins, pitch, yaw


def get_world_points_and_direction(
    key: jax.Array,
    batch_size: int,
    num_steps: int,
    img_size: int,
    fov: float,
    ray_start: float,
    ray_end: float,
    h_stddev: float,
    v_stddev: float,
    h_mean: float,
    v_mean: float,
    sample_dist: str,
    lock_view_dependence: bool = False,
    camera_pos: Optional[jnp.ndarray] = None,
    camera_lookup: Optional[jnp.ndarray] = None,
    up_vector: Optional[jnp.ndarray] = None,
    perturb: bool = True,
    dtype=jnp.float32,
) -> WorldRays:
    """Generate world-space sample points and camera rays for a full image.

    Counterpart of `comm_utils.get_world_points_and_direction`
    (`comm_utils.py:682-763`).
    """
    points_cam, z_vals, rays_d_cam = get_initial_rays_trig(
        num_steps=num_steps,
        fov=fov,
        resolution=(img_size, img_size),
        ray_start=ray_start,
        ray_end=ray_end,
        dtype=dtype,
    )
    points_cam = jnp.broadcast_to(points_cam[None], (batch_size,) + points_cam.shape)
    z_vals = jnp.broadcast_to(z_vals[None], (batch_size,) + z_vals.shape)
    rays_d_cam = jnp.broadcast_to(rays_d_cam[None], (batch_size,) + rays_d_cam.shape)

    points, z_vals, dirs, origins, pitch, yaw = transform_sampled_points(
        key,
        points_cam,
        z_vals,
        rays_d_cam,
        h_stddev=h_stddev,
        v_stddev=v_stddev,
        h_mean=h_mean,
        v_mean=v_mean,
        mode=sample_dist,
        camera_pos=camera_pos,
        camera_lookup=camera_lookup,
        up_vector=up_vector,
        perturb=perturb,
    )

    dirs_expanded = jnp.broadcast_to(
        dirs[:, :, None, :], (batch_size, dirs.shape[1], num_steps, 3)
    )
    if lock_view_dependence:
        # Zero the dirs and set z = -1 (`comm_utils.py:754-756`).
        dirs_expanded = jnp.zeros_like(dirs_expanded).at[..., -1].set(-1.0)

    return WorldRays(
        points=points,
        dirs_expanded=dirs_expanded,
        origins=origins,
        dirs=dirs,
        z_vals=z_vals,
        pitch=pitch,
        yaw=yaw,
    )
