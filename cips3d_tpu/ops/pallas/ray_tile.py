"""Fused ray-tile renderer: the SURVEY §7.7 flagship Pallas kernel.

One kernel invocation per (batch, ray-tile) renders a tile of rays end to
end with every intermediate resident in VMEM:

    coarse FiLM-SIREN -> resample weights -> inverse-CDF importance sample
        -> fine FiLM-SIREN -> sort-free alpha compositing -> (feature, depth)

The XLA path materializes every (b, n·s, hidden) activation in HBM between
matmuls and re-loads it; here the only HBM traffic is the per-ray inputs
(points, z, randoms ≈ 50 floats/ray) and the (feature, depth) outputs.

Layout: the kernel is **s-major** — per-ray scalar tensors are (S, T) with
the T tile rays on the 128-wide lane axis (full VPU lane utilization for the
resample/compositing math; a ray-major (T, S) layout leaves 116 of 128 lanes
idle on every compositing op and measured 1.3x SLOWER than XLA).  The two
per-ray prefix scans (transmittance, CDF) become genuine (S, S) @ (S, T)
MXU matmuls against constant triangular masks.  Point tensors are
(S·T, channels) so the SIREN matmuls tile straight onto the MXU; the
s-major point order makes (S, T, C) <-> (S·T, C) reshapes pure
leading-dim merges (no relayout).

Reference semantics being fused (cited per stage in the kernel body):
  * FiLM-SIREN point MLP — `exp/comm/models/film_layer.py:78-107`,
    `exp/cips3d/models/generator.py:151-340` (NeRFNetwork);
  * hierarchical resample — `exp/pigan/pigan_utils.py:164-209` (sample_pdf),
    `exp/dev/nerf_inr/models/generator_nerf_inr.py:538-598`;
  * compositing — `exp/pigan/pigan_utils.py:212-273` (fancy_integration) via
    the repo's sort-free formulation (`core/volume.py volume_render_unsorted`);
  * the hot loop being replaced: `exp/cips3d/models/generator.py:1659-1762`.

Numerics: matmuls run with `mm_dtype` inputs (bf16 when the generator
computes in bf16) and f32 accumulation; FiLM pre-activations, sines, and ALL
depth/CDF/compositing math stay f32 (z spans [0.88, 1.12] — bf16 resolution
there is ~4e-3, unusable).  Random draws (importance-sample uniforms,
density noise) are made OUTSIDE with the same key splits / shapes / dtypes
as the XLA path, so with f32 compute the kernel reproduces
`GeneratorNerfINR.points_forward`'s NeRF stage on the same key to
float-associativity precision (tests/test_pallas_ray.py).

Batched contractions are expressed as broadcast-multiply + reduce (Mosaic
does not lower batched `dot_general`); 2-D `jnp.dot` is used wherever a
contraction can be phrased as a plain matmul.
"""

from __future__ import annotations

import functools
from typing import Any, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cips3d_tpu.ops.pallas.film_mlp import compute_films, extract_siren_weights

DEFAULT_TILE = 128


def _clamp(x, clamp_mode):
    if clamp_mode == "softplus":
        return jax.nn.softplus(x)
    if clamp_mode == "relu":
        return jax.nn.relu(x)
    raise ValueError(f"clamp_mode must be 'relu' or 'softplus', got {clamp_mode!r}")


def _ray_tile_kernel(
    # per-tile tensors (s-major: rays on lanes)
    pts_ref,   # (1, S, T, 3) f32 — coarse sample points (pre box-warp)
    org_ref,   # (1, T, 3)    f32 — ray origins
    dir_ref,   # (1, T, 3)    f32 — ray directions
    z_ref,     # (1, S, T)    f32 — coarse depths (sorted along S)
    u_ref,     # (1, S, T)    f32 — importance-sample uniforms
    nc_ref,    # (1, S, T)    f32 — resample density-noise draws
    nf_ref,    # (1, 2S, T)   f32 — final compositing density-noise draws
    ns_ref,    # (1, 1)       f32 SMEM — noise std (traced schedule scalar)
    # SIREN weights (replicated across the grid; mm_dtype)
    w0_ref, b0_ref, g0_ref, f0_ref,      # (3,H) (1,H) (1,H)/batch (1,H)/batch
    w1_ref, b1_ref, g1_ref, f1_ref,      # (H,H) ...
    wc_ref, bc_ref, gc_ref, fc_ref,      # (H,C) ...
    wr_ref, br_ref,                      # (C,R) (1,R)
    ws_ref, bs_ref,                      # (H,8) (1,8) — sigma head, lane-padded
    # outputs
    fea_ref,   # (1, T, R)  out dtype
    dep_ref,   # (1, 8, T)  f32 (depth broadcast across sublanes)
    *,
    S: int,
    warp_scale: float,
    clamp_mode: str,
    white_back: bool,
    last_back: bool,
    use_noise: bool,
    fast_sin: bool,
    mm_dtype,
):
    if fast_sin:
        from cips3d_tpu.ops.fast_sin import fast_sin as _sin
    else:
        _sin = jnp.sin
    f32 = jnp.float32
    T = z_ref.shape[2]
    noise_std = ns_ref[0, 0]

    def mlp(p_flat):
        """FiLM-SIREN point MLP (film_layer.py:78-107): (N, 3) ->
        rgb (N, R) f32, sigma (N, 8) f32 (lane-padded, col 0 live)."""
        x = (p_flat * warp_scale).astype(mm_dtype)  # UniformBoxWarp
        a0 = jnp.dot(x, w0_ref[:], preferred_element_type=f32) + b0_ref[0]
        h0 = _sin(g0_ref[0] * a0 + f0_ref[0])
        a1 = jnp.dot(h0.astype(mm_dtype), w1_ref[:], preferred_element_type=f32) + b1_ref[0]
        h1 = _sin(g1_ref[0] * a1 + f1_ref[0])
        h1m = h1.astype(mm_dtype)
        sig = jnp.dot(h1m, ws_ref[:], preferred_element_type=f32) + bs_ref[0]
        ac = jnp.dot(h1m, wc_ref[:], preferred_element_type=f32) + bc_ref[0]
        hc = _sin(gc_ref[0] * ac + fc_ref[0])
        rgb = jnp.dot(hc.astype(mm_dtype), wr_ref[:], preferred_element_type=f32) + br_ref[0]
        return rgb, sig

    # ---- coarse pass -----------------------------------------------------
    pts = pts_ref[0]                                    # (S, T, 3)
    rgb_c, sig_c8 = mlp(pts.reshape(S * T, 3))
    sig_c = sig_c8.reshape(S, T, 8)[..., 0]             # (S, T) f32
    z = z_ref[0]                                        # (S, T) f32, S-sorted

    # ---- resample weights (core/volume.py render_weights) ----------------
    deltas = jnp.concatenate(
        [z[1:] - z[:-1], jnp.full((1, T), 1e10, f32)], axis=0
    )
    sc = sig_c + nc_ref[0] * noise_std if use_noise else sig_c
    dens_c = _clamp(sc, clamp_mode)
    alpha_c = 1.0 - jnp.exp(-deltas * dens_c)
    # floor via maximum, never `+ eps` (BENCH_NOTES fix-1 gotcha)
    logx_c = jnp.log(jnp.maximum(1.0 - alpha_c, 1e-10))
    # T_i = exp(sum_{j<i} logx_j): strictly-lower-triangular mask @ logx
    ii = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    excl = (jj < ii).astype(f32)                        # [i, j] = j < i
    w_c = alpha_c * jnp.exp(jnp.dot(excl, logx_c, preferred_element_type=f32))

    # ---- inverse-CDF importance sample (pigan_utils.py:164-209) ----------
    wq = w_c + 1e-5                                     # get_fine_points' +1e-5
    inner = wq[1:-1] + 1e-5                             # sample_pdf's own eps
    pdf = inner / jnp.sum(inner, axis=0, keepdims=True)  # (S-2, T)
    nb = S - 2                                          # pdf bins
    cj = jax.lax.broadcasted_iota(jnp.int32, (nb + 1, nb), 0)
    ck = jax.lax.broadcasted_iota(jnp.int32, (nb + 1, nb), 1)
    cmask = (ck < cj).astype(f32)                       # [j, k] = k < j
    cdf = jnp.dot(cmask, pdf, preferred_element_type=f32)  # (S-1, T), row0 = 0
    z_mid = 0.5 * (z[:-1] + z[1:])                      # (S-1, T) bin edges
    u = u_ref[0]                                        # (S, T)
    inds = jnp.sum((cdf[None] < u[:, None, :]).astype(f32), axis=1)  # (S, T)
    below = jnp.maximum(inds - 1.0, 0.0)
    above = jnp.minimum(inds, float(nb))
    bins_i = jax.lax.broadcasted_iota(jnp.int32, (1, nb + 1, 1), 1).astype(f32)
    sel_b = (below[:, None, :] == bins_i).astype(f32)   # (S, S-1, T)
    sel_a = (above[:, None, :] == bins_i).astype(f32)
    cdf_b = jnp.sum(sel_b * cdf[None], axis=1)          # (S, T)
    cdf_a = jnp.sum(sel_a * cdf[None], axis=1)
    zm_b = jnp.sum(sel_b * z_mid[None], axis=1)
    zm_a = jnp.sum(sel_a * z_mid[None], axis=1)
    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    fine_z = zm_b + (u - cdf_b) / denom * (zm_a - zm_b)  # (S, T) unsorted

    # ---- fine pass -------------------------------------------------------
    org_t = org_ref[0]                                  # (T, 3)
    dir_t = dir_ref[0]
    fine_pts = org_t[None] + dir_t[None] * fine_z[..., None]  # (S, T, 3)
    rgb_f, sig_f8 = mlp(fine_pts.reshape(S * T, 3))
    sig_f = sig_f8.reshape(S, T, 8)[..., 0]

    # ---- sort-free compositing over [fine, coarse] arrival order ---------
    # (core/volume.py volume_render_unsorted; stable-sort tie-break of
    # generator.py:1732-1744 via the (equal & k<j) term)
    m = 2 * S
    z_all = jnp.concatenate([fine_z, z], axis=0)        # (m, T)
    sig_all = jnp.concatenate([sig_f, sig_c], axis=0)
    less = z_all[None, :, :] < z_all[:, None, :]        # [j, k, t]: z_k < z_j
    equal = z_all[None, :, :] == z_all[:, None, :]
    mj = jax.lax.broadcasted_iota(jnp.int32, (m, m, 1), 0)
    mk = jax.lax.broadcasted_iota(jnp.int32, (m, m, 1), 1)
    before = jnp.logical_or(less, jnp.logical_and(equal, mk < mj)).astype(f32)
    rank = jnp.sum(before, axis=1)                      # (m, T), exact ints

    if use_noise:
        sig_all = sig_all + nf_ref[0] * noise_std
    dens = _clamp(sig_all, clamp_mode)
    succ = (rank[:, None, :] + 1.0 == rank[None, :, :]).astype(f32)
    z_next = jnp.sum(succ * z_all[None], axis=1)        # (m, T)
    is_last = rank == float(m - 1)
    deltas_m = jnp.where(is_last, 1e10, z_next - z_all)
    alpha = 1.0 - jnp.exp(-deltas_m * dens)
    logx = jnp.log(jnp.maximum(1.0 - alpha, 1e-10))
    trans = jnp.exp(jnp.sum(before * logx[None], axis=1))
    w = alpha * trans                                   # (m, T)
    w_sum = jnp.sum(w, axis=0, keepdims=True)           # (1, T)
    if last_back:
        w = w + (1.0 - w_sum) * is_last.astype(f32)
    # fea[t, r] = sum_m w[m, t] * rgb_all[m, t, r]
    rgb_all = jnp.concatenate(
        [rgb_f.reshape(S, T, -1), rgb_c.reshape(S, T, -1)], axis=0
    )                                                   # (m, T, R)
    fea = jnp.sum(w[..., None] * rgb_all, axis=0)       # (T, R)
    depth = jnp.sum(w * z_all, axis=0, keepdims=True)   # (1, T)
    if white_back:
        fea = fea + 1.0 - jnp.swapaxes(w_sum, 0, 1)

    fea_ref[0] = fea.astype(fea_ref.dtype)
    dep_ref[0] = jnp.broadcast_to(depth, (8, T))


def fused_ray_render(
    siren_params: Mapping[str, Any],
    style_dict: Mapping[str, jnp.ndarray],
    pts: jnp.ndarray,       # (b, n, S, 3)
    origins: jnp.ndarray,   # (b, n, 3)
    dirs: jnp.ndarray,      # (b, n, 3)
    z_vals: jnp.ndarray,    # (b, n, S, 1)
    key: jax.Array,
    *,
    noise_std: Any = 0.0,
    clamp_mode: str = "relu",
    white_back: bool = False,
    last_back: bool = False,
    dtype: Any = jnp.float32,
    box_sidelength: float = 0.24,
    tile: int = DEFAULT_TILE,
    fast_sin: bool = False,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused NeRF stage of `GeneratorNerfINR.points_forward` (hierarchical
    path): returns (pixels_fea (b, n, R) in `dtype`, depth (b, n, 1) f32).

    `key` is the same key `points_forward` receives; it is split exactly like
    the XLA path (k_pdf, k_noise_coarse, k_noise_final) and the draws are
    made with the XLA path's shapes/dtypes, so results match on the same key.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, S, _ = pts.shape
    f32 = jnp.float32
    mm_dtype = jnp.bfloat16 if jnp.dtype(dtype) == jnp.dtype(jnp.bfloat16) else f32

    k_pdf, k_nc, k_nf = jax.random.split(key, 3)
    # draw-parity with the XLA path (volume.py sample_pdf / render_weights /
    # volume_render_unsorted draw shapes+dtypes)
    u = jax.random.uniform(k_pdf, (b * n, S), z_vals.dtype).reshape(b, n, S)
    use_noise = not (isinstance(noise_std, (int, float)) and noise_std == 0)
    if use_noise:
        nc = jax.random.normal(k_nc, (b, n, S, 1), dtype)[..., 0].astype(f32)
        nf = jax.random.normal(k_nf, (b, n, 2 * S, 1), dtype)[..., 0].astype(f32)
        ns = jnp.asarray(noise_std, f32).reshape(1, 1)
    else:
        nc = jnp.zeros((b, n, S), f32)
        nf = jnp.zeros((b, n, 2 * S), f32)
        ns = jnp.zeros((1, 1), f32)

    weights = extract_siren_weights(siren_params)
    films = compute_films(siren_params, style_dict)
    H = weights["w0"].shape[1]
    C = weights["wc"].shape[1]
    R = weights["wr"].shape[1]
    ws = jnp.pad(weights["ws"], ((0, 0), (0, 7)))
    bs = jnp.pad(weights["bs"].reshape(1, 1), ((0, 0), (0, 7)))

    pad = (-n) % tile
    def prep(x, smajor_ndim):
        """Pad the ray axis, then move it last for the s-major kernel layout."""
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))
        if smajor_ndim == 3:                    # (b, n, S)    -> (b, S, n)
            return jnp.swapaxes(x, 1, 2)
        if smajor_ndim == 4:                    # (b, n, S, 3) -> (b, S, n, 3)
            return jnp.swapaxes(x, 1, 2)
        return x                                # (b, n, 3) stays ray-major
    pts_p = prep(pts.astype(f32), 4)
    org_p = prep(origins.astype(f32), 2)
    dir_p = prep(dirs.astype(f32), 2)
    z_p = prep(z_vals[..., 0].astype(f32), 3)
    u_p = prep(u.astype(f32), 3)
    nc_p = prep(nc, 3)
    nf_p = prep(nf, 3)
    n_pad = n + pad
    n_tiles = n_pad // tile

    mm = lambda w: w.astype(mm_dtype)
    row32 = lambda v: v.reshape(1, -1).astype(f32)

    ray_idx = lambda bi, ti: (bi, ti, 0)            # (b, n_pad, 3) tensors
    smj_idx = lambda bi, ti: (bi, 0, ti)            # (b, S, n_pad) tensors
    smj_idx4 = lambda bi, ti: (bi, 0, ti, 0)        # (b, S, n_pad, 3)
    fixed = lambda *_: (0, 0)
    bvec = lambda bi, ti: (bi, 0)

    vspec = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=(b, n_tiles),
        in_specs=[
            vspec((1, S, tile, 3), smj_idx4),
            vspec((1, tile, 3), ray_idx),
            vspec((1, tile, 3), ray_idx),
            vspec((1, S, tile), smj_idx),
            vspec((1, S, tile), smj_idx),
            vspec((1, S, tile), smj_idx),
            vspec((1, 2 * S, tile), smj_idx),
            pl.BlockSpec((1, 1), fixed, memory_space=pltpu.SMEM),
            vspec((3, H), fixed), vspec((1, H), fixed),
            vspec((1, H), bvec), vspec((1, H), bvec),
            vspec((H, H), fixed), vspec((1, H), fixed),
            vspec((1, H), bvec), vspec((1, H), bvec),
            vspec((H, C), fixed), vspec((1, C), fixed),
            vspec((1, C), bvec), vspec((1, C), bvec),
            vspec((C, R), fixed), vspec((1, R), fixed),
            vspec((H, 8), fixed), vspec((1, 8), fixed),
        ],
        out_specs=[
            vspec((1, tile, R), ray_idx),
            vspec((1, 8, tile), smj_idx),
        ],
    )

    kernel = functools.partial(
        _ray_tile_kernel,
        S=S,
        warp_scale=2.0 / box_sidelength,
        clamp_mode=clamp_mode,
        white_back=white_back,
        last_back=last_back,
        use_noise=use_noise,
        fast_sin=fast_sin,
        mm_dtype=mm_dtype,
    )
    n_pts = b * n_pad * 2 * S
    fea, dep = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, R), dtype),
            jax.ShapeDtypeStruct((b, 8, n_pad), f32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pts * (3 * H + H * H + H * C + C * R + H)
            + 2 * b * n_pad * (2 * S) ** 2 * 4,
            bytes_accessed=b * n_pad * (S * 3 + 6 + 5 * S + 2 * S + R + 8) * 4,
            transcendentals=n_pts * (2 * H + C + 2),
        ),
    )(
        pts_p, org_p, dir_p, z_p, u_p, nc_p, nf_p, ns,
        mm(weights["w0"]), row32(weights["b0"]),
        films["g0"].astype(f32), films["f0"].astype(f32),
        mm(weights["w1"]), row32(weights["b1"]),
        films["g1"].astype(f32), films["f1"].astype(f32),
        mm(weights["wc"]), row32(weights["bc"]),
        films["gc"].astype(f32), films["fc"].astype(f32),
        mm(weights["wr"]), row32(weights["br"]),
        mm(ws), bs.astype(f32),
    )
    return fea[:, :n], jnp.swapaxes(dep[:, :1, :n], 1, 2)
