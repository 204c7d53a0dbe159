"""Rendering apps: multiview grids, trajectory videos, chunked big-image
inference.

Counterparts of:
  * pi-GAN multiview render (`exp/pigan/scripts/render_multiview_images.py:67-86`):
    fixed yaw sweep [-0.5,-0.25,0,0.25,0.5] + h_mean, psi=0.7, 2x ray-step
    multiplier, EMA generator, grid save;
  * trajectory video rendering (`exp/cips3d/models/st_web.py:289-486`,
    `scripts/web_demo.py:94-191`): frames along a circle/translate/yaw camera
    path with an optional fov ramp, rendered via the explicit-camera forward
    (`generator.py:1828-1951`);
  * `forward_points` chunked inference (`generator.py:1406-1473`): pixel-chunked
    no-grad rendering for large images, implemented as `lax.map` over ray
    chunks (rays are independent; VMEM-friendly).
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cips3d_tpu.core import rays as rays_lib
from cips3d_tpu.core import trajectories
from cips3d_tpu.eval.images import save_image_grid, to_uint8
from cips3d_tpu.models.generator import (
    GeneratorNerfINR,
    RenderOptions,
    sample_zs,
    truncate_styles,
)


def render_chunked(
    params,
    generator: GeneratorNerfINR,
    style_dict,
    opts: RenderOptions,
    key: jax.Array,
    forward_points: int = 256 ** 2,
    camera_pos: Optional[jnp.ndarray] = None,
    camera_lookup: Optional[jnp.ndarray] = None,
    up_vector: Optional[jnp.ndarray] = None,
    return_depth: bool = False,
) -> np.ndarray:
    """Host wrapper around :func:`render_chunked_traced` (numpy out)."""
    out = render_chunked_traced(
        params, generator, style_dict, opts, key, forward_points,
        camera_pos, camera_lookup, up_vector, return_depth,
    )
    if return_depth:
        return np.asarray(out[0]), np.asarray(out[1])
    return np.asarray(out)


def render_chunked_traced(
    params,
    generator: GeneratorNerfINR,
    style_dict,
    opts: RenderOptions,
    key: jax.Array,
    forward_points: int = 256 ** 2,
    camera_pos: Optional[jnp.ndarray] = None,
    camera_lookup: Optional[jnp.ndarray] = None,
    up_vector: Optional[jnp.ndarray] = None,
    return_depth: bool = False,
) -> jnp.ndarray:
    """Render one batch at ``opts.img_size`` in pixel chunks of
    ``forward_points`` (the `forward_points` staged-inference path,
    `generator.py:1406-1473`).  Jittable: the chunk loop is a `lax.map`, so
    only one chunk's activations are live at a time.

    Returns (b, 3, H, W) float images in [-1, 1]; with ``return_depth`` also
    the expected ray depth (b, 1, H, W) — the reference's staged forwards
    return (pixels, depth_map) pairs (`exp/pigan/models/generators.py`,
    `st_web.py:34`).

    ``camera_lookup`` is a view DIRECTION (the reference's trajectory
    builders produce ``lookup = -xyz``, `comm_utils.py:101`), not a look-at
    point — a zero vector normalizes to NaN.
    """
    h = w = opts.img_size
    num_points = h * w
    chunk = min(forward_points, num_points)
    while num_points % chunk:
        chunk -= 1
    n_chunks = num_points // chunk
    b = next(iter(style_dict.values())).shape[0]

    k_rays, k_pts = jax.random.split(key)
    world = rays_lib.get_world_points_and_direction(
        k_rays,
        batch_size=b,
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
        perturb=True,
    )

    def render_chunk(args):
        idx, k = args
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, idx * chunk, chunk, axis=1)
        sub = rays_lib.WorldRays(
            points=sl(world.points),
            dirs_expanded=sl(world.dirs_expanded),
            origins=sl(world.origins),
            dirs=sl(world.dirs),
            z_vals=sl(world.z_vals),
            pitch=world.pitch,
            yaw=world.yaw,
        )
        img, _, depth = generator.apply(
            params, style_dict, sub, opts, k, method=generator.points_forward,
            return_depth=True,
        )
        return img, depth  # (b, chunk, 3), (b, chunk, 1)

    keys = jax.random.split(k_pts, n_chunks)
    chunks, depths = jax.lax.map(render_chunk, (jnp.arange(n_chunks), keys))
    flat = jnp.transpose(chunks, (1, 0, 2, 3)).reshape(b, num_points, 3)
    img = flat.transpose(0, 2, 1).reshape(b, 3, h, w)
    if not return_depth:
        return img
    dflat = jnp.transpose(depths, (1, 0, 2, 3)).reshape(b, num_points, 1)
    return img, dflat.transpose(0, 2, 1).reshape(b, 1, h, w)


def render_sharded(
    params,
    generator: GeneratorNerfINR,
    style_dict,
    opts: RenderOptions,
    key: jax.Array,
    mesh,
    camera_pos: Optional[jnp.ndarray] = None,
    camera_lookup: Optional[jnp.ndarray] = None,
    up_vector: Optional[jnp.ndarray] = None,
    return_depth: bool = False,
):
    """Whole-image render with the PIXEL axis sharded over a device mesh —
    the ray-axis parallelism row of SURVEY §2.6: rays are embarrassingly
    parallel, so partitioning `points_forward` over pixels needs no
    collectives until the final host gather.  This is the multi-chip
    counterpart of `render_chunked` (which trades time for memory on ONE
    chip): a huge image (r512/r1024 demo sizes, `configs/web_demo.yaml:60`)
    is rendered in one pass with each chip holding 1/N of the rays.

    The pixel count must be divisible by the mesh's ray-sharding axis size
    (axis 'rays' if the mesh has one, else its first axis).

    Returns (b, 3, H, W) jnp images (with ``return_depth`` also (b,1,H,W)).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = "rays" if "rays" in mesh.axis_names else mesh.axis_names[0]
    n_shards = mesh.shape[axis]
    h = w = opts.img_size
    assert (h * w) % n_shards == 0, f"{h * w} pixels not divisible by {n_shards} shards"
    pixel_sharded = NamedSharding(mesh, P(None, axis))

    @jax.jit
    def _render(params, style_dict, key):
        k_rays, k_pts = jax.random.split(key)
        world = rays_lib.get_world_points_and_direction(
            k_rays,
            batch_size=next(iter(style_dict.values())).shape[0],
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
            perturb=True,
        )
        # constrain the pixel axis (dim 1) onto the mesh: everything from the
        # SIREN through the INR decode partitions ray-wise with no collectives
        shard = lambda x: jax.lax.with_sharding_constraint(x, pixel_sharded)
        world = rays_lib.WorldRays(
            points=shard(world.points),
            dirs_expanded=shard(world.dirs_expanded),
            origins=shard(world.origins),
            dirs=shard(world.dirs),
            z_vals=shard(world.z_vals),
            pitch=world.pitch,
            yaw=world.yaw,
        )
        img, _, depth = generator.apply(
            params, style_dict, world, opts, k_pts,
            method=generator.points_forward, return_depth=True,
        )
        b = img.shape[0]
        img = img.transpose(0, 2, 1).reshape(b, 3, h, w)
        depth = depth.transpose(0, 2, 1).reshape(b, 1, h, w)
        return img, depth

    # Trace under a batch-unsharded pixel scope so any fused Pallas kernels
    # (the serving defaults: fused_ray + fused_inr) are shard_map-wrapped —
    # GSPMD cannot auto-partition Mosaic custom calls on real multi-chip
    # TPU, so constraint-only sharding would fail to compile there
    # (parallel/mesh.pixel_shard_map).
    from cips3d_tpu.parallel.mesh import pixel_sharding_scope

    with pixel_sharding_scope(mesh, data_axis=None, rays_axis=axis), mesh:
        img, depth = _render(params, style_dict, key)
    if return_depth:
        return img, depth
    return img


def compute_styles(params, generator, zs, psi: float = 1.0, avg_key=None, avg_samples=2000):
    """Mapping + optional truncation (host helper)."""
    styles = generator.apply(params, zs["z_nerf"], zs["z_inr"], method=generator.mapping)
    if psi < 1.0:
        k = avg_key if avg_key is not None else jax.random.PRNGKey(0)
        avg_zs = sample_zs(k, avg_samples, generator.cfg)
        avg_styles = generator.apply(
            params, avg_zs["z_nerf"], avg_zs["z_inr"], method=generator.mapping
        )
        avg_styles = {k2: jnp.mean(v, 0, keepdims=True) for k2, v in avg_styles.items()}
        styles = truncate_styles(styles, avg_styles, psi)
    return styles


def render_multiview(
    params,
    generator: GeneratorNerfINR,
    out_path: str,
    seeds: Sequence[int] = (0, 1, 2, 3),
    yaw_offsets: Sequence[float] = (-0.5, -0.25, 0.0, 0.25, 0.5),
    img_size: int = 64,
    num_steps: int = 12,
    psi: float = 0.7,
    ray_step_multiplier: int = 2,
    fov: float = 12.0,
) -> np.ndarray:
    """pi-GAN's multiview grid (`render_multiview_images.py:67-86`): for each
    seed, render the same z at several yaws; save one grid row per seed."""
    base = RenderOptions(
        img_size=img_size,
        num_steps=num_steps * ray_step_multiplier,
        fov=fov,
        h_stddev=0.0,
        v_stddev=0.0,
        psi=psi,
    )
    rows = []
    for seed in seeds:
        zs = sample_zs(jax.random.PRNGKey(seed), 1, generator.cfg)
        styles = compute_styles(params, generator, zs, psi=psi)
        for off in yaw_offsets:
            opts = dataclasses.replace(base, h_mean=math.pi * 0.5 + off)
            img = render_chunked(
                params, generator, styles, opts, jax.random.PRNGKey(seed * 997 + 13)
            )
            rows.append(img[0])
    grid = np.stack(rows)
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        save_image_grid(grid, out_path, nrow=len(yaw_offsets))
    return grid


TRAJECTORY_MODES = ("circle", "circle_near_far", "yaw", "translate_circle_near_far", "translate_rotate")


def build_trajectory(mode: str, num_frames: int, periods: int = 2, alpha_pidiv: float = 15.0):
    """Camera path for a demo video (`st_web.py` trajectory_mode options).

    Returns (xyz, lookup, up or None) arrays of length >= num_frames.
    """
    alpha = math.pi / alpha_pidiv
    if mode in ("circle", "circle_near_far"):
        per_period = max(1, -(-num_frames // max(1, periods)))  # ceil
        xyz, lookup, _, _ = trajectories.get_circle_camera_pos_and_lookup(
            alpha=alpha, num_samples=per_period, periods=periods
        )
        return xyz, lookup, None
    if mode == "yaw":
        xyz, lookup, _, _ = trajectories.get_yaw_camera_pos_and_lookup(num_samples=num_frames)
        return xyz, lookup, None
    if mode == "translate_circle_near_far":
        xyz, lookup, _, _, _ = trajectories.get_translate_circle_camera_pos_and_lookup(
            num_samples_translate=num_frames // 3, alpha=alpha,
            num_samples=num_frames // max(1, periods), periods=periods,
        )
        return xyz, lookup, None
    if mode == "translate_rotate":
        xyz, lookup, up, _, _, _ = trajectories.get_translate_rotate(
            num_samples_translate=num_frames // 3, alpha=alpha,
            num_samples=num_frames, periods=1,
        )
        return xyz, lookup, up
    raise ValueError(f"unknown trajectory mode {mode!r}; options: {TRAJECTORY_MODES}")


def render_trajectory_video(
    params,
    generator: GeneratorNerfINR,
    out_dir: str,
    seed: int = 0,
    mode: str = "circle",
    num_frames: int = 30,
    img_size: int = 128,
    num_steps: int = 24,
    psi: float = 1.0,
    fov: float = 12.0,
    max_fov: Optional[float] = None,
    fps: int = 40,
    forward_points: int = 256 ** 2,
    depth: bool = False,
) -> list:
    """Render a camera-trajectory video for one seed
    (`st_web.py:289-486` / `web_demo.py:94-191`).  Saves PNG frames plus a
    video (mp4 when an ffmpeg backend exists, else self-contained MJPEG-AVI
    via `utils/video.py`); returns the frame file list."""
    os.makedirs(out_dir, exist_ok=True)
    xyz, lookup, up = build_trajectory(mode, num_frames)
    zs = sample_zs(jax.random.PRNGKey(seed), 1, generator.cfg)
    styles = compute_styles(params, generator, zs, psi=psi)

    # fov ramp for the *_near_far modes (`web_demo.py:110-127`)
    if max_fov is not None and mode.endswith("near_far"):
        half = len(xyz) // 2
        fovs = np.concatenate([np.linspace(fov, max_fov, half), np.linspace(max_fov, fov, len(xyz) - half)])
    else:
        fovs = np.full(len(xyz), fov)

    frames = []
    depth_frames = []
    for i in range(min(num_frames, len(xyz))):
        opts = RenderOptions(
            img_size=img_size, num_steps=num_steps, fov=float(fovs[i]),
            h_stddev=0.0, v_stddev=0.0, psi=psi,
        )
        out = render_chunked(
            params, generator, styles, opts, jax.random.PRNGKey(seed * 31 + i),
            forward_points=forward_points,
            camera_pos=jnp.asarray(xyz[i: i + 1]),
            camera_lookup=jnp.asarray(lookup[i: i + 1]),
            up_vector=jnp.asarray(up[i: i + 1]) if up is not None else None,
            return_depth=depth,
        )
        img, dmap = out if depth else (out, None)
        path = os.path.join(out_dir, f"frame_{i:04d}.png")
        from PIL import Image

        Image.fromarray(to_uint8(img[0])).save(path)
        frames.append(path)
        if depth:
            # 3-channel grayscale depth, normalized over the ray interval —
            # the reference expands depth_map to 3 channels (st_web.py:275)
            d = (np.asarray(dmap[0, 0]) - opts.ray_start) / (opts.ray_end - opts.ray_start)
            d8 = (np.clip(d, 0.0, 1.0) * 255).astype(np.uint8)
            dpath = os.path.join(out_dir, f"depth_{i:04d}.png")
            Image.fromarray(np.stack([d8] * 3, axis=-1)).save(dpath)
            depth_frames.append(dpath)

    _maybe_write_mp4(frames, os.path.join(out_dir, "video.mp4"), fps)
    if depth_frames:
        _maybe_write_mp4(depth_frames, os.path.join(out_dir, "depth.mp4"), fps)
    return frames


def _maybe_write_mp4(frames, out_path, fps):
    """Always produces a playable video: mp4 when an ffmpeg backend exists,
    else a self-contained MJPEG-AVI (`utils/video.py`)."""
    from PIL import Image

    from cips3d_tpu.utils.video import write_video

    return write_video(
        [np.asarray(Image.open(f).convert("RGB")) for f in frames], out_path, fps=fps
    )
