"""Fused FiLM-SIREN point-MLP Pallas kernel.

The NeRF backbone evaluates `sin(gain * (x @ W + b) + bias)` chains over
B·H·W·2·S points per image (~1.6M point evals at r256 —
`SURVEY.md` §6).  As separate XLA matmuls every intermediate (n, hidden)
activation round-trips HBM; this kernel keeps a tile of points resident in
VMEM and runs the whole chain —

    warp → FiLM₀ → FiLM₁ → {sigma head, color FiLM → rgb head} → concat

— writing only the (n, rgb+1) output.  Weights + per-sample gain/bias vectors
are tiny (hidden ≤ 128) and live in VMEM for the whole grid.

Reference math: `exp/comm/models/film_layer.py:78-107` (FiLM sine layer),
`exp/cips3d/models/generator.py:151-340` (NeRFNetwork wiring).

Grid: (batch, n_tiles).  Forward-only: training uses the XLA path (which
jax.grad differentiates); this kernel accelerates inference/rendering.  A
custom-VJP training variant is the natural next step.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 1024


def _film_mlp_kernel(
    pts_ref,      # (1, T, 3)
    w0_ref,       # (3, H)
    b0_ref,       # (1, H)
    g0_ref,       # (1, H) gain for FiLM0 (already *15+30)
    f0_ref,       # (1, H) FiLM bias
    w1_ref,       # (H, H)
    b1_ref,       # (1, H)
    g1_ref,
    f1_ref,
    wc_ref,       # (H, C)
    bc_ref,       # (1, C)
    gc_ref,
    fc_ref,
    wr_ref,       # (C, R)
    br_ref,       # (1, R)
    ws_ref,       # (H, 1) sigma head — padded to (H, 8) lanes by caller
    bs_ref,       # (1, 8)
    out_ref,      # (1, T, R + 1)
    *,
    warp_scale: float,
    fast_sin: bool = False,
):
    if fast_sin:
        from cips3d_tpu.ops.fast_sin import fast_sin as _sin
    else:
        _sin = jnp.sin
    x = pts_ref[0] * warp_scale  # (T, 3)

    h = jnp.dot(x, w0_ref[:], preferred_element_type=jnp.float32) + b0_ref[0]
    h = _sin(g0_ref[0] * h + f0_ref[0])

    h = jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[0]
    h = _sin(g1_ref[0] * h + f1_ref[0])

    sigma = jnp.dot(h, ws_ref[:], preferred_element_type=jnp.float32) + bs_ref[0]  # (T, 8)

    c = jnp.dot(h, wc_ref[:], preferred_element_type=jnp.float32) + bc_ref[0]
    c = _sin(gc_ref[0] * c + fc_ref[0])

    rgb = jnp.dot(c, wr_ref[:], preferred_element_type=jnp.float32) + br_ref[0]  # (T, R)

    out_ref[0] = jnp.concatenate([rgb, sigma[:, :1]], axis=-1)


def film_mlp_forward(
    points: jnp.ndarray,          # (b, n, 3)
    weights: Dict[str, jnp.ndarray],
    films: Dict[str, jnp.ndarray],  # per-sample gain/bias: g0,f0,g1,f1,gc,fc — (b, dim)
    warp_scale: float = 2.0 / 0.24,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
    fast_sin: bool = False,
) -> jnp.ndarray:
    """Run the fused point MLP.  Returns (b, n, rgb_dim + 1).

    weights keys: w0 (3,H), b0 (H,), w1 (H,H), b1 (H,), wc (H,C), bc (C,),
    wr (C,R), br (R,), ws (H,1), bs (1,).
    """
    b, n, _ = points.shape
    H = weights["w0"].shape[1]
    C = weights["wc"].shape[1]
    R = weights["wr"].shape[1]

    pad = (-n) % tile
    if pad:
        points = jnp.pad(points, ((0, 0), (0, pad), (0, 0)))
    n_pad = n + pad
    n_tiles = n_pad // tile

    # pad sigma head to 8 lanes so the (T, 1) matmul tiles cleanly
    ws = jnp.pad(weights["ws"], ((0, 0), (0, 7)))
    bs = jnp.pad(weights["bs"].reshape(1, 1), ((0, 0), (0, 7)))

    row = lambda v: v.reshape(1, -1)

    def idx_pts(bi, ti):
        return (bi, ti, 0)

    def idx_batchvec(bi, ti):
        return (bi, 0)

    fixed = lambda *_: (0, 0)

    grid_spec = pl.GridSpec(
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, 3), idx_pts, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, H), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), idx_batchvec, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), idx_batchvec, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), idx_batchvec, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), idx_batchvec, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, C), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), idx_batchvec, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), idx_batchvec, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, R), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 8), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), fixed, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, R + 1), idx_pts, memory_space=pltpu.VMEM),
    )

    out = pl.pallas_call(
        functools.partial(_film_mlp_kernel, warp_scale=warp_scale, fast_sin=fast_sin),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, R + 1), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * (3 * H + H * H + H * C + C * R + H),
            bytes_accessed=b * n_pad * (3 + R + 1) * 4,
            transcendentals=b * n_pad * (2 * H + C),
        ),
    )(
        points,
        weights["w0"], row(weights["b0"]),
        films["g0"], films["f0"],
        weights["w1"], row(weights["b1"]),
        films["g1"], films["f1"],
        weights["wc"], row(weights["bc"]),
        films["gc"], films["fc"],
        weights["wr"], row(weights["br"]),
        ws, bs,
    )
    return out[:, :n]


def extract_siren_weights(siren_params: Mapping[str, Any]) -> Dict[str, jnp.ndarray]:
    """Pull the kernel's weight dict out of a NeRFNetwork param subtree
    (`cips3d_tpu.models.nerf_net.NeRFNetwork` with hidden_layers=2)."""
    p = siren_params
    return {
        "w0": p["film_0"]["linear"]["kernel"],
        "b0": p["film_0"]["linear"]["bias"],
        "w1": p["film_1"]["linear"]["kernel"],
        "b1": p["film_1"]["linear"]["bias"],
        "wc": p["color_film"]["linear"]["kernel"],
        "bc": p["color_film"]["linear"]["bias"],
        "wr": p["color_linear"]["kernel"],
        "br": p["color_linear"]["bias"],
        "ws": p["sigma"]["kernel"],
        "bs": p["sigma"]["bias"],
    }


def compute_films(
    siren_params: Mapping[str, Any],
    style_dict: Mapping[str, jnp.ndarray],
    gain_scale: float = 15.0,
    gain_bias: float = 30.0,
) -> Dict[str, jnp.ndarray]:
    """Per-sample FiLM gain/bias vectors from styles (the tiny style-FC
    matmuls run in XLA; only the big point loop goes through Pallas)."""
    p = siren_params

    def fc(layer, style):
        g = style @ layer["gain_fc"]["kernel"] + layer["gain_fc"]["bias"]
        f = style @ layer["bias_fc"]["kernel"] + layer["bias_fc"]["bias"]
        return g * gain_scale + gain_bias, f

    g0, f0 = fc(p["film_0"], style_dict["nerf_w0"])
    g1, f1 = fc(p["film_1"], style_dict["nerf_w1"])
    gc, fcb = fc(p["color_film"], style_dict["nerf_rgb"])
    return {"g0": g0, "f0": f0, "g1": g1, "f1": f1, "gc": gc, "fc": fcb}


def siren_forward_pallas(
    siren_params: Mapping[str, Any],
    points: jnp.ndarray,
    style_dict: Mapping[str, jnp.ndarray],
    warp_scale: float = 2.0 / 0.24,
    tile: int = DEFAULT_TILE,
    interpret: Optional[bool] = None,
    fast_sin: bool = False,
) -> jnp.ndarray:
    """Drop-in equivalent of `NeRFNetwork.__call__` (hidden_layers=2 fp32),
    returning (b, n, rgb_dim + 1).  interpret=None auto-selects interpreter
    mode off-TPU (CPU tests)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    weights = extract_siren_weights(siren_params)
    films = compute_films(siren_params, style_dict)
    return film_mlp_forward(points, weights, films, warp_scale, tile, interpret, fast_sin)
