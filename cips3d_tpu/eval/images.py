"""Image dumping for FID evaluation and sampling.

Counterparts of:
  * `setup_evaluation` (`exp/cips3d/scripts/setup_evaluation.py:29-90`) —
    dump ≤N real images at img_size (no xflip) into ``fid/real``, sharded
    across hosts, cached across calls;
  * `gen_images` (`exp/cips3d/scripts/gen_images.py:30-72`) — EMA generator
    samples N fakes at psi=1 with chunked no-grad rendering, per-host
    interleaved naming;
  * `sample_images` (`exp/cips3d/scripts/sample_images.py:31-70`) — fixed-pose
    sample dump (h_mean = pi/2 + 0.15, stddev 0).
"""

from __future__ import annotations

import dataclasses
import math
import os
import shutil
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cips3d_tpu.models.generator import GeneratorNerfINR, RenderOptions, sample_zs

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def to_uint8(img: np.ndarray) -> np.ndarray:
    """(c, h, w) float [-1, 1] → (h, w, c) uint8."""
    img = np.clip((np.asarray(img, np.float32) + 1.0) * 127.5, 0, 255).astype(np.uint8)
    return img.transpose(1, 2, 0)


def setup_evaluation(
    dataset,
    real_dir: str,
    num_imgs: int,
    img_size: int,
    del_existing: bool = False,
    shard_index: int = 0,
    num_shards: int = 1,
) -> int:
    """Dump real images for FID; skips work when already populated
    (`setup_evaluation.py:49-60`)."""
    if del_existing and os.path.isdir(real_dir) and shard_index == 0:
        shutil.rmtree(real_dir)
    os.makedirs(real_dir, exist_ok=True)
    existing = len(os.listdir(real_dir))
    if existing >= num_imgs // max(1, num_shards):
        return existing
    count = 0
    for i in range(shard_index, min(num_imgs, len(dataset)), num_shards):
        img_chw, _ = dataset[i]
        img = img_chw.transpose(1, 2, 0)
        if img.shape[0] != img_size:
            img = np.asarray(
                Image.fromarray(img).resize((img_size, img_size), Image.LANCZOS), np.uint8
            )
        Image.fromarray(img).save(os.path.join(real_dir, f"real_{i:06d}.png"))
        count += 1
    return count


def make_eval_render_fn(
    generator: GeneratorNerfINR,
    opts: RenderOptions,
    batch_size: int,
    use_aux: bool = False,
    forward_points: Optional[int] = None,
):
    """jitted (params, zs, key) → uint8-ready images at psi=1, random pose
    (the gen_images protocol, `gen_images.py:47-62`).

    ``forward_points``: pixel-chunk size for staged rendering — the eval path
    of the reference always renders through `forward_points=256**2` chunks
    (`gen_images.py:60`); chunking caps activation memory at high
    resolutions (lax.map keeps one chunk live at a time)."""

    if forward_points is not None and forward_points < opts.img_size ** 2:
        from cips3d_tpu.apps.render import render_chunked_traced

        def render(params, zs, key):
            styles = generator.apply(
                params, zs["z_nerf"], zs["z_inr"], method=generator.mapping
            )
            return render_chunked_traced(
                params, generator, styles, opts, key, forward_points
            )

        return jax.jit(render)

    def render(params, zs, key):
        imgs, _ = generator.apply(params, zs, key, opts, return_aux_img=use_aux)
        return imgs

    return jax.jit(render)


def gen_images(
    params,
    generator: GeneratorNerfINR,
    fake_dir: str,
    num_imgs: int,
    img_size: int,
    batch_size: int = 16,
    num_steps: int = 12,
    opts: Optional[RenderOptions] = None,
    seed: int = 0,
    shard_index: int = 0,
    num_shards: int = 1,
    forward_points: Optional[int] = 256 ** 2,
) -> int:
    """Sample ``num_imgs`` images from (EMA) params into ``fake_dir``
    (`gen_images.py:30-72`): chunked no-grad rendering through
    ``forward_points``-pixel chunks when the image exceeds one chunk.
    Per-host interleaved naming: host k writes indices k, k+num_shards, ...
    (`gen_images.py:63`)."""
    os.makedirs(fake_dir, exist_ok=True)
    opts = dataclasses.replace(
        opts or RenderOptions(), img_size=img_size, num_steps=num_steps, psi=1.0
    )
    render = make_eval_render_fn(generator, opts, batch_size, forward_points=forward_points)
    key = jax.random.PRNGKey(seed)

    written = 0
    idx = shard_index
    n_local = (num_imgs - shard_index + num_shards - 1) // num_shards
    steps = (n_local + batch_size - 1) // batch_size
    for step in range(steps):
        k = jax.random.fold_in(key, shard_index * 100003 + step)
        kz, kr = jax.random.split(k)
        zs = sample_zs(kz, batch_size, generator.cfg)
        imgs = np.asarray(render(params, zs, kr))
        for i in range(imgs.shape[0]):
            if written >= n_local:
                break
            Image.fromarray(to_uint8(imgs[i])).save(
                os.path.join(fake_dir, f"fake_{idx:06d}.png")
            )
            idx += num_shards
            written += 1
    return written


def sample_images(
    params,
    generator: GeneratorNerfINR,
    out_dir: str,
    num_imgs: int,
    img_size: int,
    batch_size: int = 16,
    num_steps: int = 12,
    seed: int = 0,
) -> int:
    """Fixed-pose dumps (`sample_images.py:31-70`): h_mean = pi/2 + 0.15,
    zero stddev."""
    os.makedirs(out_dir, exist_ok=True)
    opts = RenderOptions(
        img_size=img_size,
        num_steps=num_steps,
        h_stddev=0.0,
        v_stddev=0.0,
        h_mean=math.pi * 0.5 + 0.15,
        psi=1.0,
    )
    render = make_eval_render_fn(generator, opts, batch_size)
    key = jax.random.PRNGKey(seed)
    written = 0
    for step in range((num_imgs + batch_size - 1) // batch_size):
        k = jax.random.fold_in(key, step)
        kz, kr = jax.random.split(k)
        zs = sample_zs(kz, batch_size, generator.cfg)
        imgs = np.asarray(render(params, zs, kr))
        for i in range(imgs.shape[0]):
            if written >= num_imgs:
                break
            Image.fromarray(to_uint8(imgs[i])).save(os.path.join(out_dir, f"{written:06d}.png"))
            written += 1
    return written


def save_image_grid(imgs: np.ndarray, path: str, nrow: Optional[int] = None) -> None:
    """(b, 3, h, w) [-1,1] → one PNG grid (torchvision save_image analogue,
    used by the fixed-z monitors, `train.py:86-150`)."""
    b, c, h, w = imgs.shape
    nrow = nrow or int(math.sqrt(b)) or 1
    ncol = (b + nrow - 1) // nrow
    grid = np.zeros((ncol * h, nrow * w, c), np.uint8)
    for i in range(b):
        r, col = divmod(i, nrow)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = to_uint8(imgs[i])
    Image.fromarray(grid).save(path)
