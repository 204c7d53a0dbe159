"""Model interpolation / INR layer swapping.

Counterpart of `inr_layer_swapping` (`exp/comm/comm_utils.py:28-51`) and the
web demo that uses it (`scripts/web_demo.py:30-193`): blend the INR decoder
parameters (per-resolution blocks + their ToRGB heads) of a source generator
toward a target generator by ``gamma`` — the "model interpolation" feature
that transfers e.g. FFHQ geometry with CartoonFaces texture.

In the pytree world this is a pure function over params — no module surgery.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Sequence

import jax
import numpy as np

from cips3d_tpu.eval.images import save_image_grid
from cips3d_tpu.models.generator import GeneratorNerfINR, RenderOptions, sample_zs


def inr_layer_swapping(source_params, target_params, gamma: float, layers: Sequence[str]):
    """Return source params with INR blocks ``layers`` (resolution names like
    "4", "8", ...) lerped toward the target by ``gamma``
    (`comm_utils.py:28-51`: p = p*(1-gamma) + target*gamma).

    Operates on full generator param pytrees (dict with
    params/inr_net/{block_<res>, to_rgb_<res>}).
    """
    out = jax.tree_util.tree_map(lambda x: x, source_params)
    src_inr = out["params"]["inr_net"]
    tgt_inr = target_params["params"]["inr_net"]
    prefixes = []
    for res in layers:
        prefixes.append(f"block_{res}")
        prefixes.append(f"to_rgb_{res}")
    for name in list(src_inr.keys()):
        if any(name == p for p in prefixes):
            src_inr[name] = jax.tree_util.tree_map(
                lambda a, b: a * (1.0 - gamma) + b * gamma, src_inr[name], tgt_inr[name]
            )
    return out


def model_interpolation_demo(
    source_params,
    target_params,
    generator: GeneratorNerfINR,
    out_dir: str,
    gamma: float = 1.0,
    swapped_layers: Sequence[str] = ("4", "8", "16", "32", "64", "128", "256", "512", "1024"),
    seeds: Sequence[int] = (0, 1),
    img_size: int = 64,
    num_steps: int = 12,
    yaw_offsets: Sequence[float] = (-0.3, 0.0, 0.3),
    psi: float = 1.0,
) -> np.ndarray:
    """Streamlit-free batch version of the web demo
    (`web_demo.py:84-191`): render source / target / swapped generators
    side-by-side over a small yaw sweep and save a grid per seed."""
    from cips3d_tpu.apps.render import compute_styles, render_chunked

    swapped = inr_layer_swapping(source_params, target_params, gamma, swapped_layers)
    os.makedirs(out_dir, exist_ok=True)
    all_rows = []
    for seed in seeds:
        zs = sample_zs(jax.random.PRNGKey(seed), 1, generator.cfg)
        row = []
        for params in (source_params, target_params, swapped):
            styles = compute_styles(params, generator, zs, psi=psi)
            for off in yaw_offsets:
                opts = RenderOptions(
                    img_size=img_size, num_steps=num_steps,
                    h_stddev=0.0, v_stddev=0.0, h_mean=math.pi * 0.5 + off, psi=psi,
                )
                img = render_chunked(
                    params, generator, styles, opts, jax.random.PRNGKey(seed + 7)
                )
                row.append(img[0])
        grid = np.stack(row)
        save_image_grid(grid, os.path.join(out_dir, f"interp_seed{seed}.png"), nrow=len(yaw_offsets))
        all_rows.append(grid)
    return np.concatenate(all_rows)
