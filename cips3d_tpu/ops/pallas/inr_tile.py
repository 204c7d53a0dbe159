"""Fused CIPS-INR decoder Pallas kernel (forward/serving path).

`CIPSNet` (`exp/cips3d/models/generator.py:1009-1155`) is a chain of up to
nine SinBlocks — two StyleGAN2-style modulated FCs each
(`mod_conv_fc.SinStyleMod`, `mod_conv_fc.py:392-563`) — plus per-block ToRGB
heads with skip accumulation.  At r256 serving this is ~0.6 TFLOP of
512x512 matmuls per frame and, on the XLA path, ~20 HBM round-trips of the
(n_pixels, 512) activation.

The kernel keeps a tile of pixels resident in VMEM through the WHOLE chain.
Key observation: the modulation is per-batch, not per-pixel —

    out = lrelu( demod ⊙ ((x ⊙ s) @ W) ),   s = mod(style)+1,
    demod = rsqrt((s^2) @ (W^2) + eps)

so `s` and `demod` are (b, dim) vectors computed OUTSIDE in XLA (18 tiny
matmuls), and the kernel body is: scale → matmul (MXU) → scale → lrelu,
eighteen times, plus the ToRGB accumulations.  All weights for the chain
(≤ 9.4 MB bf16 at hidden 512) stay in VMEM across the grid.

Forward-only by design: training keeps the XLA INR path (matmul-bound,
which XLA already runs near peak; the win here is serving-latency HBM
traffic).  The generator gates this to inference via
`GeneratorConfig.fused_inr` + `is_initializing`; autodiff through it raises
(no VJP) rather than silently degrading.

Matmul inputs run in the compute dtype with f32 accumulation; the lrelu and
scale chain stays f32 between matmuls (cast at each matmul input, like the
ray-tile kernel).
"""

from __future__ import annotations

import functools
from typing import Any, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cips3d_tpu.models.cips_net import CIPS_RESOLUTIONS

DEFAULT_TILE = 512


def _inr_tile_kernel(
    x_ref,      # (1, T, D)  f32 — input features, channel-padded to D
    s_ref,      # (b, L, D)  f32 — per-layer modulation vectors
    d_ref,      # (b, L, D)  f32 — per-layer demodulation vectors
    w_ref,      # (L, D, D)  mm  — stacked SinStyleMod weights
    wr_ref,     # (Lr, D, 8) mm  — stacked ToRGB weights (lane-padded)
    br_ref,     # (Lr, 8)    f32 — stacked ToRGB biases
    out_ref,    # (1, T, 8)  f32 — tanh(rgb), lanes 0..2 live
    *,
    n_blocks: int,
    first_rgb: int,      # ToRGB from this block index (reference: 3)
    first_skip: int,     # residual skip from this block index (reference: 4)
    mm_dtype,
):
    f32 = jnp.float32
    T = x_ref.shape[1]
    bi = pl.program_id(0)

    x = x_ref[0].astype(f32)                    # (T, D)
    rgb = jnp.zeros((T, 8), f32)
    for blk in range(n_blocks):
        x_orig = x
        for j in (0, 1):
            layer = 2 * blk + j
            s = s_ref[pl.ds(bi, 1), layer]      # (1, D)
            d = d_ref[pl.ds(bi, 1), layer]
            xs = (x * s).astype(mm_dtype)
            out = jnp.dot(xs, w_ref[layer], preferred_element_type=f32)
            x = jax.nn.leaky_relu(out * d, 0.2)
        if blk >= first_skip:
            x = x + x_orig                      # residual (generator.py:968)
        if blk >= first_rgb:
            # ToRGB skip accumulation (generator.py:983-1006)
            r = blk - first_rgb
            rgb = rgb + jnp.dot(
                x.astype(mm_dtype), wr_ref[r], preferred_element_type=f32
            ) + br_ref[pl.ds(r, 1), :]
    out_ref[0] = jnp.tanh(rgb)


def extract_inr_weights(inr_params: Mapping[str, Any], n_blocks: int):
    """Stack CIPSNet params into the kernel's (L, D, D)/(Lr, D, 8) arrays.

    Returns (w_all (L,D,D), mod_kernels (L,in,D? per-layer list), ...) — the
    per-layer modulation FCs keep their natural shapes for the outside-XLA
    style math; only the big mod weights are stacked.
    """
    blocks = [f"block_{CIPS_RESOLUTIONS[i]}" for i in range(n_blocks)]
    w, mods = [], []
    for b_ in blocks:
        for stage in ("mod1", "mod2"):
            p = inr_params[b_][stage]
            w.append(p["weight"])
            mods.append((p["modulation"]["kernel"], p["modulation"]["bias"]))
    D = w[-1].shape[1]
    w_all = jnp.stack([
        jnp.pad(wi, ((0, D - wi.shape[0]), (0, 0))) for wi in w
    ])  # first layer's (in0, D) zero-padded to (D, D)
    rgbs = [
        f"to_rgb_{CIPS_RESOLUTIONS[i]}" for i in range(3, n_blocks)
    ]
    wr = jnp.stack([
        jnp.pad(inr_params[r]["linear"]["kernel"], ((0, 0), (0, 8 - 3)))
        for r in rgbs
    ])
    br = jnp.stack([
        jnp.pad(inr_params[r]["linear"]["bias"], (0, 8 - 3)) for r in rgbs
    ])
    return w_all, mods, wr, br


def compute_inr_mods(mods, w_list_padded, style_dict, n_blocks,
                     name_prefix="inr", eps=1e-8):
    """Per-layer (s, demod) vectors — the outside-XLA half of SinStyleMod.

    s = mod(style) + 1 (zero-padded to D for the first layer); demod =
    rsqrt((s_true^2) @ (W_true^2) + eps) computed with the UNPADDED shapes
    so padding can't perturb it.
    """
    s_rows, d_rows = [], []
    li = 0
    for blk in range(n_blocks):
        res = CIPS_RESOLUTIONS[blk]
        for j in (0, 1):
            kern, bias = mods[li]
            style = style_dict[f"{name_prefix}_w{res}_{j}"]
            s = style @ kern + bias + 1.0                   # (b, in)
            w_pad = w_list_padded[li]                       # (D, D)
            in_dim = kern.shape[1]
            w_true = w_pad[:in_dim]                         # (in, D)
            denom = jnp.einsum(
                "bi,io->bo", jnp.square(s), jnp.square(w_true),
                preferred_element_type=jnp.float32,
            )
            d = jax.lax.rsqrt(denom + eps)                  # (b, D)
            D = w_pad.shape[0]
            if in_dim < D:
                s = jnp.pad(s, ((0, 0), (0, D - in_dim)))
            s_rows.append(s)
            d_rows.append(d)
            li += 1
    return jnp.stack(s_rows, 1).astype(jnp.float32), jnp.stack(d_rows, 1).astype(jnp.float32)


def fused_inr_decode(
    inr_params: Mapping[str, Any],
    style_dict: Mapping[str, jnp.ndarray],
    x: jnp.ndarray,                 # (b, n, in0) pixel features
    *,
    img_size: int = 1024,
    dtype: Any = jnp.float32,
    name_prefix: str = "inr",
    tile: int = DEFAULT_TILE,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Drop-in forward equivalent of `CIPSNet.__call__` for pre_rgb_dim=3:
    returns tanh(rgb) (b, n, 3).  Forward-only (no VJP)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    f32 = jnp.float32
    mm_dtype = jnp.bfloat16 if jnp.dtype(dtype) == jnp.dtype(jnp.bfloat16) else f32
    b, n, in0 = x.shape
    # resolution list is "4".."1024": img_size 2^k -> k-1 blocks
    n_blocks = min(int(np.log2(img_size)) - 1, len(CIPS_RESOLUTIONS))
    if n_blocks < 4:
        raise ValueError(
            f"fused_inr_decode needs >= 4 blocks (img_size >= 32); got "
            f"img_size={img_size} — use the XLA CIPSNet path"
        )
    w_all, mods, wr, br = extract_inr_weights(inr_params, n_blocks)
    s_all, d_all = compute_inr_mods(
        mods, list(w_all), style_dict, n_blocks, name_prefix
    )
    D = w_all.shape[-1]
    L = w_all.shape[0]
    Lr = wr.shape[0]

    xp = jnp.pad(x.astype(f32), ((0, 0), (0, 0), (0, D - in0)))

    def _call(xp, s_all, d_all, w_mm, wr_mm, br_f):
        # Shapes are shard-local under pixel_shard_map; tile-pad per shard.
        b_l, n_l, _ = xp.shape
        pad = (-n_l) % tile
        xq = jnp.pad(xp, ((0, 0), (0, pad), (0, 0)))
        n_pad = n_l + pad

        vspec = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        grid_spec = pl.GridSpec(
            grid=(b_l, n_pad // tile),
            in_specs=[
                vspec((1, tile, D), lambda bi, ti: (bi, ti, 0)),
                full, full,
                vspec((L, D, D), lambda *_: (0, 0, 0)),
                vspec((Lr, D, 8), lambda *_: (0, 0, 0)),
                full,
            ],
            out_specs=vspec((1, tile, 8), lambda bi, ti: (bi, ti, 0)),
        )
        out = pl.pallas_call(
            functools.partial(
                _inr_tile_kernel,
                n_blocks=n_blocks, first_rgb=3, first_skip=4,
                mm_dtype=mm_dtype,
            ),
            out_shape=jax.ShapeDtypeStruct((b_l, n_pad, 8), f32),
            grid_spec=grid_spec,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * b_l * n_pad * (L * D * D + Lr * D * 8),
                bytes_accessed=b_l * n_pad * (D + 8) * 4 + L * D * D * 2,
                transcendentals=b_l * n_pad * 8,
            ),
        )(xq, s_all, d_all, w_mm, wr_mm, br_f)
        return out[:, :n_l]

    # Multi-chip: Mosaic custom calls cannot be auto-partitioned by GSPMD —
    # wrap in shard_map under an active pixel-sharding scope (identity
    # otherwise).  Pointwise over pixels; mods are per-batch (b, L, D).
    from cips3d_tpu.parallel import mesh as mesh_lib

    call = mesh_lib.pixel_shard_map(
        _call, b, n,
        in_kinds=("bp", "b", "b", "rep", "rep", "rep"),
        out_kinds="bp",
    )
    out = call(xp, s_all, d_all, w_all.astype(mm_dtype), wr.astype(mm_dtype),
               br.astype(f32))
    return out[:, :, :3].astype(dtype)
