"""Latent (z/style) interpolation video.

Counterpart of `render_video_interpolation_web` + `FrequencyInterpolator`
(`exp/cips3d/models/st_web.py:49-64,933-1035`): for a list of seeds, lerp the
*style vectors* (frequency/phase analogue) between consecutive seeds while the
camera follows a 'front' (bobbing) or 'orbit' trajectory with a breathing fov,
rendering one frame per t.
"""

from __future__ import annotations

import math
import os
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cips3d_tpu.eval.images import to_uint8
from cips3d_tpu.models.generator import GeneratorNerfINR, RenderOptions, sample_zs


def build_camera_path(mode: str, num_frames: int, base_fov: float):
    """(t, pitch, yaw, fov) tuples (`st_web.py:978-995`)."""
    traj = []
    for t in np.linspace(0, 1, num_frames):
        if mode == "front":
            pitch = 0.2 * math.cos(t * 2 * math.pi) + math.pi / 2
            yaw = 0.4 * math.sin(t * 2 * math.pi) + math.pi / 2
            fov = base_fov + 5 + math.sin(t * 2 * math.pi) * 5
        elif mode == "orbit":
            pitch = 0.2 * math.cos(t * 2 * math.pi) + math.pi / 4
            yaw = t * 2 * math.pi
            fov = base_fov
        else:
            raise ValueError(f"unknown camera mode {mode!r} (front|orbit)")
        traj.append((float(t), float(pitch), float(yaw), float(fov)))
    return traj


def style_lerp(styles_a, styles_b, t: float):
    """FrequencyInterpolator.forward analogue (`st_web.py:49-64`)."""
    return {k: styles_a[k] * (1 - t) + styles_b[k] * t for k in styles_a}


def render_z_interpolation_video(
    params,
    generator: GeneratorNerfINR,
    out_dir: str,
    seeds: Sequence[int] = (0, 1, 2),
    num_frames: int = 24,
    img_size: int = 64,
    num_steps: int = 12,
    ray_step_multiplier: int = 1,
    psi: float = 0.7,
    camera_mode: str = "front",
    fov: float = 12.0,
    fps: int = 24,
    lock_view_dependence: bool = False,
) -> List[str]:
    """Render the seed-to-seed style interpolation video; returns frame paths."""
    from cips3d_tpu.apps.render import _maybe_write_mp4, compute_styles, render_chunked

    os.makedirs(out_dir, exist_ok=True)
    traj = build_camera_path(camera_mode, num_frames, fov)

    all_styles = []
    for seed in seeds:
        zs = sample_zs(jax.random.PRNGKey(seed), 1, generator.cfg)
        all_styles.append(compute_styles(params, generator, zs, psi=psi))

    frames = []
    idx = 0
    for i in range(len(seeds)):
        s_cur = all_styles[i]
        s_next = all_styles[(i + 1) % len(seeds)]
        for t, pitch, yaw, frame_fov in traj:
            styles = style_lerp(s_cur, s_next, t)
            opts = RenderOptions(
                img_size=img_size,
                num_steps=num_steps * ray_step_multiplier,
                fov=frame_fov,
                h_stddev=0.0,
                v_stddev=0.0,
                h_mean=yaw,
                v_mean=pitch,
                lock_view_dependence=lock_view_dependence,
                psi=psi,
            )
            img = render_chunked(
                params, generator, styles, opts, jax.random.PRNGKey(idx)
            )
            from PIL import Image

            path = os.path.join(out_dir, f"frame_{idx:05d}.png")
            Image.fromarray(to_uint8(img[0])).save(path)
            frames.append(path)
            idx += 1

    _maybe_write_mp4(frames, os.path.join(out_dir, "interp.mp4"), fps)
    return frames
