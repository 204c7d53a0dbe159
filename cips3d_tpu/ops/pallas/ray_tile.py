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

Depth-generic: the SIREN may have any number ``L >= 1`` of FiLM hidden
layers (`NeRFNetwork.hidden_layers` is configurable,
`exp/cips3d/models/generator.py:151-340`); the kernel unrolls a static
Python loop over the layers.  ``L`` is inferred from the param subtree
(`film_{i}` entries), so call sites need no changes.  The weight tuple
threaded through the custom VJP is flat — ``(w, b, gain, bias) * L`` then
the color/sigma tail — and every kernel/grid-spec below is built from the
same per-layer loop.

Reference semantics being fused (cited per stage in the kernel body):
  * FiLM-SIREN point MLP — `exp/comm/models/film_layer.py:78-107`,
    `exp/cips3d/models/generator.py:151-340` (NeRFNetwork);
  * hierarchical resample — `exp/pigan/pigan_utils.py:164-209` (sample_pdf),
    `exp/dev/nerf_inr/models/generator_nerf_inr.py:538-598`;
  * compositing — `exp/pigan/pigan_utils.py:212-273` (fancy_integration) via
    the repo's sort-free formulation (`core/volume.py volume_render_unsorted`);
  * the hot loop being replaced: `exp/cips3d/models/generator.py:1659-1762`.

Numerics: matmuls run with `mm_dtype` inputs (bf16 when the generator
computes in bf16) and f32 accumulation; sines compute in f32 (Mosaic has
no bf16 transcendentals — math.sin/roundeven on bf16 vectors fail to
legalize) with results cast to `mm_dtype`; ALL depth/CDF/compositing math
stays f32 (z spans [0.88, 1.12] — bf16 resolution there is ~4e-3,
unusable).  Random draws (importance-sample uniforms,
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

DEFAULT_TILE = 128


def num_hidden_layers(siren_params: Mapping[str, Any]) -> int:
    """Number of FiLM hidden layers in a NeRFNetwork param subtree."""
    return sum(1 for k in siren_params if str(k).startswith("film_"))


def extract_siren_weights(siren_params: Mapping[str, Any]) -> dict:
    """Pull the kernel's weight dict out of a NeRFNetwork param subtree
    (`cips3d_tpu.models.nerf_net.NeRFNetwork`, any ``hidden_layers``).
    Keys: ``w{i}``/``b{i}`` per hidden layer, ``wc/bc`` color FiLM,
    ``wr/br`` rgb head, ``ws/bs`` sigma head."""
    p = siren_params
    out = {}
    for i in range(num_hidden_layers(p)):
        out[f"w{i}"] = p[f"film_{i}"]["linear"]["kernel"]
        out[f"b{i}"] = p[f"film_{i}"]["linear"]["bias"]
    out["wc"] = p["color_film"]["linear"]["kernel"]
    out["bc"] = p["color_film"]["linear"]["bias"]
    out["wr"] = p["color_linear"]["kernel"]
    out["br"] = p["color_linear"]["bias"]
    out["ws"] = p["sigma"]["kernel"]
    out["bs"] = p["sigma"]["bias"]
    return out


def compute_films(
    siren_params: Mapping[str, Any],
    style_dict: Mapping[str, jnp.ndarray],
    gain_scale: float = 15.0,
    gain_bias: float = 30.0,
) -> dict:
    """Per-sample FiLM gain/bias vectors from styles (film_layer.py:78-107:
    gain = gain_fc(style)*15 + 30).  The tiny style-FC matmuls run in XLA —
    differentiably, so style gradients flow through them into the kernel's
    film cotangents."""
    p = siren_params

    def fc(layer, style):
        g = style @ layer["gain_fc"]["kernel"] + layer["gain_fc"]["bias"]
        f = style @ layer["bias_fc"]["kernel"] + layer["bias_fc"]["bias"]
        return g * gain_scale + gain_bias, f

    out = {}
    for i in range(num_hidden_layers(p)):
        gi, fi = fc(p[f"film_{i}"], style_dict[f"nerf_w{i}"])
        out[f"g{i}"] = gi
        out[f"f{i}"] = fi
    gc, fcb = fc(p["color_film"], style_dict["nerf_rgb"])
    out["gc"] = gc
    out["fc"] = fcb
    return out


def _clamp(x, clamp_mode):
    if clamp_mode == "softplus":
        return jax.nn.softplus(x)
    if clamp_mode == "relu":
        return jax.nn.relu(x)
    raise ValueError(f"clamp_mode must be 'relu' or 'softplus', got {clamp_mode!r}")


def _split_wt(wt):
    """Flat weight tuple -> (per-layer [(w, b, g, f)], tail 8-tuple)."""
    L = (len(wt) - 8) // 4
    layers = [tuple(wt[4 * i : 4 * i + 4]) for i in range(L)]
    return layers, tuple(wt[4 * L :])


def _ray_tile_kernel(
    # Positional refs, in order:
    #   pts  (1, S, T, 3) f32 — coarse sample points (pre box-warp)
    #   org  (1, T, 3)    f32 — ray origins
    #   dir  (1, T, 3)    f32 — ray directions
    #   z    (1, S, T)    f32 — coarse depths (sorted along S)
    #   u    (1, S, T)    f32 — importance-sample uniforms
    #   nc   (1, S, T)    f32 — resample density-noise draws
    #   nf   (1, 2S, T)   f32 — final compositing density-noise draws
    #   ns   (1, 1)       f32 SMEM — noise std (traced schedule scalar)
    # then per hidden layer i < L (replicated across the grid; mm_dtype):
    #   w_i (din,H)  b_i (1,H)  g_i (b,H)  f_i (b,H)      [din = 3 or H]
    # then the head tail:
    #   wc (H,C) bc (1,C) gc (b,C) fc (b,C)  wr (C,R) br (1,R)
    #   ws (H,8) bs (1,8)                                  [sigma lane-padded]
    # then outputs:
    #   fea (1, T, R) out dtype · dep (1, 8, T) f32 (broadcast sublanes)
    # then residual outputs (training fwd only — `with_residuals`):
    #   rh (1, 2, S·T, L·H) mm · ra (1, 2, S·T, L·H) f32
    #   rhc (1, 2, S·T, C) mm · rac (1, 2, S·T, C) f32   [pass 0=coarse, 1=fine]
    *refs,
    S: int,
    L: int,
    warp_scale: float,
    clamp_mode: str,
    white_back: bool,
    last_back: bool,
    use_noise: bool,
    fast_sin: bool,
    mm_dtype,
):
    pts_ref, org_ref, dir_ref, z_ref, u_ref, nc_ref, nf_ref, ns_ref = refs[:8]
    hrefs = [tuple(refs[8 + 4 * i : 12 + 4 * i]) for i in range(L)]
    (wc_ref, bc_ref, gc_ref, fc_ref, wr_ref, br_ref, ws_ref, bs_ref) = refs[
        8 + 4 * L : 16 + 4 * L
    ]
    fea_ref, dep_ref = refs[16 + 4 * L : 18 + 4 * L]
    res_refs = refs[18 + 4 * L :]
    if fast_sin:
        from cips3d_tpu.ops.fast_sin import fast_sin as _sin
    else:
        _sin = jnp.sin
    f32 = jnp.float32
    T = z_ref.shape[2]
    noise_std = ns_ref[0, 0]
    # Film refs hold the full (b, dim) array (a (1, dim) block would violate
    # the 8-sublane block constraint for b > 1); take this batch row here.
    bi = pl.program_id(0)
    film = lambda ref: ref[pl.ds(bi, 1), :]             # (1, dim)

    def mlp(p_flat):
        """FiLM-SIREN point MLP (film_layer.py:78-107): (N, 3) ->
        rgb (N, R) f32, sigma (N, 8) f32 (lane-padded, col 0 live), plus the
        pre-activations/hidden states the residual-passing backward saves."""
        h = (p_flat * warp_scale).astype(mm_dtype)  # UniformBoxWarp
        acts, hids = [], []
        # sines compute in f32 and cast to mm_dtype for the next matmul:
        # Mosaic cannot legalize bf16 transcendentals (math.sin/roundeven on
        # bf16 vectors fail), so f32 is both the fast and the only option
        for w_ref, b_ref, g_ref, f_ref in hrefs:
            a = jnp.dot(h, w_ref[:], preferred_element_type=f32) + b_ref[0]
            h = _sin(film(g_ref) * a + film(f_ref)).astype(mm_dtype)
            acts.append(a)
            hids.append(h)
        sig = jnp.dot(h, ws_ref[:], preferred_element_type=f32) + bs_ref[0]
        ac = jnp.dot(h, wc_ref[:], preferred_element_type=f32) + bc_ref[0]
        hcm = _sin(film(gc_ref) * ac + film(fc_ref)).astype(mm_dtype)
        rgb = jnp.dot(hcm, wr_ref[:], preferred_element_type=f32) + br_ref[0]
        return rgb, sig, dict(a=acts, h=hids, ac=ac, hcm=hcm)

    def save_residuals(pi, st):
        if not res_refs:
            return
        rh_ref, ra_ref, rhc_ref, rac_ref = res_refs
        rh_ref[0, pi] = jnp.concatenate(st["h"], axis=1)
        ra_ref[0, pi] = jnp.concatenate(st["a"], axis=1)
        rhc_ref[0, pi] = st["hcm"]
        rac_ref[0, pi] = st["ac"]

    # ---- coarse pass -----------------------------------------------------
    pts = pts_ref[0]                                    # (S, T, 3)
    rgb_c, sig_c8, st_c = mlp(pts.reshape(S * T, 3))
    save_residuals(0, st_c)
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
    rgb_f, sig_f8, st_f = mlp(fine_pts.reshape(S * T, 3))
    save_residuals(1, st_f)
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


def _jnp_core(
    wt, pts, org, dirs, z, u, nc, nf, ns,
    *, clamp_mode, white_back, last_back, use_noise, fast_sin, mm_dtype,
    warp_scale, out_dtype,
):
    """Pure-jnp mirror of the kernel math on full (b, n, ...) arrays — the
    numerical reference for the Pallas forward AND the backward: the custom
    VJP differentiates this with `jax.vjp`, which reproduces the XLA path's
    gradient semantics (stop-gradient through the hierarchical resample,
    `get_fine_points_from_sigma`'s torch.no_grad/.detach counterpart).

    wt: flat weight tuple — ``(w_i, b_i, g_i, f_i)`` per hidden layer, then
    ``(wc, bc, gc, fc, wr, br, ws, bs)`` — weights f32 as stored, films
    (b, dim) f32, ws lane-padded (H, 8).
    Tensors: pts (b,n,S,3), org/dirs (b,n,3), z/u/nc (b,n,S), nf (b,n,2S),
    ns (1,1) — all f32.
    """
    layers, (wc, bc, gc, fc, wr, br, ws, bs) = _split_wt(wt)
    if fast_sin:
        from cips3d_tpu.ops.fast_sin import fast_sin as _sin
    else:
        _sin = jnp.sin
    f32 = jnp.float32
    b, n, S, _ = pts.shape
    mm = lambda a: a.astype(mm_dtype)
    dot = functools.partial(jnp.einsum, preferred_element_type=f32)

    def mlp(p):  # (b, N, 3) -> rgb (b, N, R) f32, sigma (b, N) f32
        h = mm(p * warp_scale)
        for w_, b_, g_, f_ in layers:
            a = dot("bnk,kh->bnh", h, mm(w_)) + b_[0]
            h = mm(_sin(g_[:, None] * a + f_[:, None]))
        sig = dot("bnk,kh->bnh", h, mm(ws)) + bs[0]
        ac = dot("bnk,kh->bnh", h, mm(wc)) + bc[0]
        hc = _sin(gc[:, None] * ac + fc[:, None])
        rgb = dot("bnk,kh->bnh", mm(hc), mm(wr)) + br[0]
        return rgb, sig[..., 0]

    noise_std = ns[0, 0]
    rgb_c, sig_c = mlp(pts.reshape(b, n * S, 3))
    rgb_c = rgb_c.reshape(b, n, S, -1)
    sig_c = sig_c.reshape(b, n, S)

    def resample():
        deltas = jnp.concatenate(
            [z[..., 1:] - z[..., :-1], jnp.full_like(z[..., :1], 1e10)], -1
        )
        sc = sig_c + nc * noise_std if use_noise else sig_c
        alpha = 1.0 - jnp.exp(-deltas * _clamp(sc, clamp_mode))
        logx = jnp.log(jnp.maximum(1.0 - alpha, 1e-10))
        excl = jnp.triu(jnp.ones((S, S), f32), k=1)
        w_c = alpha * jnp.exp(dot("bns,st->bnt", logx, excl))
        inner = (w_c + 1e-5)[..., 1:-1] + 1e-5
        pdf = inner / jnp.sum(inner, axis=-1, keepdims=True)
        nb = S - 2
        cmask = (jnp.arange(nb)[:, None] < jnp.arange(nb + 1)[None, :]).astype(f32)
        cdf = dot("bns,st->bnt", pdf, cmask)                  # (b, n, S-1)
        z_mid = 0.5 * (z[..., :-1] + z[..., 1:])
        inds = jnp.sum((cdf[..., None, :] < u[..., :, None]).astype(f32), -1)
        below = jnp.maximum(inds - 1.0, 0.0)
        above = jnp.minimum(inds, float(nb))
        bins_i = jnp.arange(nb + 1, dtype=f32)
        sel_b = (below[..., None] == bins_i).astype(f32)      # (b, n, S, S-1)
        sel_a = (above[..., None] == bins_i).astype(f32)
        cdf_b = jnp.sum(sel_b * cdf[..., None, :], -1)
        cdf_a = jnp.sum(sel_a * cdf[..., None, :], -1)
        zm_b = jnp.sum(sel_b * z_mid[..., None, :], -1)
        zm_a = jnp.sum(sel_a * z_mid[..., None, :], -1)
        denom = cdf_a - cdf_b
        denom = jnp.where(denom < 1e-5, 1.0, denom)
        return zm_b + (u - cdf_b) / denom * (zm_a - zm_b)     # (b, n, S)

    # the reference resamples under torch.no_grad and detaches
    # (generator_nerf_inr.py:538-598)
    fine_z = jax.lax.stop_gradient(resample())
    fine_pts = jax.lax.stop_gradient(
        org[:, :, None] + dirs[:, :, None] * fine_z[..., None]
    )
    rgb_f, sig_f = mlp(fine_pts.reshape(b, n * S, 3))

    m = 2 * S
    z_all = jnp.concatenate([fine_z, z], -1)                  # (b, n, m)
    sig_all = jnp.concatenate([sig_f.reshape(b, n, S), sig_c], -1)
    rgb_all = jnp.concatenate([rgb_f.reshape(b, n, S, -1), rgb_c], -2)
    less = z_all[..., None, :] < z_all[..., :, None]
    equal = z_all[..., None, :] == z_all[..., :, None]
    tie = (jnp.arange(m)[None, :] < jnp.arange(m)[:, None])
    before = jnp.logical_or(less, jnp.logical_and(equal, tie)).astype(f32)
    rank = jnp.sum(before, -1)
    if use_noise:
        sig_all = sig_all + nf * noise_std
    dens = _clamp(sig_all, clamp_mode)
    succ = (rank[..., :, None] + 1.0 == rank[..., None, :]).astype(f32)
    z_next = jnp.sum(succ * z_all[..., None, :], -1)
    is_last = rank == float(m - 1)
    deltas_m = jnp.where(is_last, 1e10, z_next - z_all)
    alpha = 1.0 - jnp.exp(-deltas_m * dens)
    logx = jnp.log(jnp.maximum(1.0 - alpha, 1e-10))
    trans = jnp.exp(jnp.sum(before * logx[..., None, :], -1))
    w = alpha * trans
    w_sum = jnp.sum(w, -1, keepdims=True)
    if last_back:
        w = w + (1.0 - w_sum) * is_last.astype(f32)
    fea = jnp.sum(w[..., None] * rgb_all, -2)                 # (b, n, R)
    depth = jnp.sum(w * z_all, -1, keepdims=True)
    if white_back:
        fea = fea + 1.0 - w_sum
    return fea.astype(out_dtype), depth


def _ray_tile_bwd_kernel(
    # Positional refs: the forward inputs (same layouts/order as
    # _ray_tile_kernel — pts..ns, per-layer (w,b,g,f), head tail), then
    #   dfea (1, T, R) out dtype · ddep (1, 1, T) f32 cotangents,
    # then EITHER the gradient-output refs (recompute mode) OR 4 residual
    # input refs (rh, ra, rhc, rac — from the with_residuals forward)
    # followed by the same outputs (residual mode).  Gradient outputs:
    #   per layer (dw, db, dg, df), then dwc, dbc, dgc, dfc, dwr, dbr,
    #   dws, dbs (VMEM accumulators, wt order), dpts (per tile — COARSE
    #   points only; fine points are detached).
    *refs,
    S: int,
    L: int,
    warp_scale: float,
    clamp_mode: str,
    white_back: bool,
    last_back: bool,
    use_noise: bool,
    fast_sin: bool,
    mm_dtype,
):
    """Hand-written backward: recomputes the tile forward in VMEM (keeping
    pre-activations), then backpropagates compositing -> fine MLP -> coarse
    MLP, accumulating weight/film grads across the grid.  The hierarchical
    resample stays stop-gradient (reference `.detach()` semantics): coarse
    density receives gradient only through the final compositing, and the
    fine points are fully detached — so origins/dirs/z/u/noise get ZERO
    cotangents (matching the reference; camera gradients flow through the
    differentiable coarse `pts` input, which does get its exact grad)."""
    pts_ref, org_ref, dir_ref, z_ref, u_ref, nc_ref, nf_ref, ns_ref = refs[:8]
    hrefs = [tuple(refs[8 + 4 * i : 12 + 4 * i]) for i in range(L)]
    (wc_ref, bc_ref, gc_ref, fc_ref, wr_ref, br_ref, ws_ref, bs_ref) = refs[
        8 + 4 * L : 16 + 4 * L
    ]
    dfea_ref, ddep_ref = refs[16 + 4 * L : 18 + 4 * L]
    rest = refs[18 + 4 * L :]
    n_grad_out = 4 * L + 9      # per-layer grads + 8 head grads + dpts
    if len(rest) == n_grad_out + 4:  # residual mode: 4 inputs precede outputs
        rh_ref, ra_ref, rhc_ref, rac_ref = rest[:4]
        out_refs = rest[4:]
    else:
        rh_ref = ra_ref = rhc_ref = rac_ref = None
        out_refs = rest
    dh_refs = [tuple(out_refs[4 * i : 4 * i + 4]) for i in range(L)]
    (dwc_ref, dbc_ref, dgc_ref, dfc_ref,
     dwr_ref, dbr_ref, dws_ref, dbs_ref, dpts_ref) = out_refs[4 * L :]
    if fast_sin:
        from cips3d_tpu.ops.fast_sin import fast_sin as _sin
        from cips3d_tpu.ops.fast_sin import fast_sin_grad as _sin_grad
    else:
        _sin = jnp.sin
        _sin_grad = jnp.cos
    f32 = jnp.float32
    T = z_ref.shape[2]
    H = hrefs[0][0].shape[1]
    noise_std = ns_ref[0, 0]
    bi = pl.program_id(0)
    film = lambda ref: ref[pl.ds(bi, 1), :]

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        for quad in dh_refs:
            for ref in quad:
                ref[:] = jnp.zeros_like(ref)
        for ref in (dwc_ref, dbc_ref, dgc_ref, dfc_ref,
                    dwr_ref, dbr_ref, dws_ref, dbs_ref):
            ref[:] = jnp.zeros_like(ref)

    def mlp_fwd(p_flat):
        """Forward keeping pre-FiLM activations (a) and mm-cast layer
        inputs (x, h) — everything the backward needs, no extra sines."""
        h = (p_flat * warp_scale).astype(mm_dtype)
        x = h
        acts, hids = [], []
        for w_ref, b_ref, g_ref, f_ref in hrefs:
            a = jnp.dot(h, w_ref[:], preferred_element_type=f32) + b_ref[0]
            h = _sin(film(g_ref) * a + film(f_ref)).astype(mm_dtype)
            acts.append(a)
            hids.append(h)
        sig = jnp.dot(h, ws_ref[:], preferred_element_type=f32) + bs_ref[0]
        ac = jnp.dot(h, wc_ref[:], preferred_element_type=f32) + bc_ref[0]
        hcm = _sin(film(gc_ref) * ac + film(fc_ref)).astype(mm_dtype)
        rgb = jnp.dot(hcm, wr_ref[:], preferred_element_type=f32) + br_ref[0]
        return dict(x=x, a=acts, h=hids, ac=ac, hcm=hcm, sig=sig, rgb=rgb)

    rT = lambda a, b_: jax.lax.dot_general(  # a^T @ b over rows
        a, b_, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    bT = lambda a, w: jax.lax.dot_general(   # a @ w^T over cols
        a, w, (((1,), (1,)), ((), ())), preferred_element_type=f32)

    def mlp_bwd(s, d_rgb, d_sig1):
        """d_rgb (N, R) f32, d_sig1 (N, 1) f32 -> d_x (N, 3) f32 and
        accumulated weight/film grads."""
        mmc = lambda a: a.astype(mm_dtype)
        d_rgbm = mmc(d_rgb)
        dwr_ref[:] += rT(s["hcm"], d_rgbm)
        dbr_ref[:] += jnp.sum(d_rgb, axis=0, keepdims=True)
        d_hc = bT(d_rgbm, wr_ref[:])                      # (N, C)
        argc = film(gc_ref) * s["ac"] + film(fc_ref)
        d_argc = d_hc * _sin_grad(argc)
        dgc_ref[pl.ds(bi, 1), :] += jnp.sum(d_argc * s["ac"], axis=0, keepdims=True)
        dfc_ref[pl.ds(bi, 1), :] += jnp.sum(d_argc, axis=0, keepdims=True)
        d_ac = d_argc * film(gc_ref)
        N = d_sig1.shape[0]
        d_sig8 = jnp.concatenate(
            [d_sig1, jnp.zeros((N, 7), f32)], axis=1)     # lane-padded head
        d_acm = mmc(d_ac)
        d_sig8m = mmc(d_sig8)
        dwc_ref[:] += rT(s["h"][L - 1], d_acm)
        dbc_ref[:] += jnp.sum(d_ac, axis=0, keepdims=True)
        dws_ref[:] += rT(s["h"][L - 1], d_sig8m)
        dbs_ref[:] += jnp.sum(d_sig8, axis=0, keepdims=True)
        d_h = bT(d_acm, wc_ref[:]) + bT(d_sig8m, ws_ref[:])
        for i in reversed(range(L)):
            w_ref, _, g_ref, f_ref = hrefs[i]
            dw_ref, db_ref, dg_ref, df_ref = dh_refs[i]
            arg = film(g_ref) * s["a"][i] + film(f_ref)
            d_arg = d_h * _sin_grad(arg)
            dg_ref[pl.ds(bi, 1), :] += jnp.sum(
                d_arg * s["a"][i], axis=0, keepdims=True)
            df_ref[pl.ds(bi, 1), :] += jnp.sum(d_arg, axis=0, keepdims=True)
            d_a = d_arg * film(g_ref)
            d_am = mmc(d_a)
            inp = s["h"][i - 1] if i > 0 else s["x"]
            dw_ref[:] += rT(inp, d_am)
            db_ref[:] += jnp.sum(d_a, axis=0, keepdims=True)
            d_h = bT(d_am, w_ref[:])                      # (N, din)
        return d_h * warp_scale                           # (N, 3)

    # ---- recompute forward (mirrors _ray_tile_kernel exactly) ------------
    # In residual mode the MLP states come from the forward's saved
    # h/pre-activation tensors (no sine recompute); only the cheap
    # sigma/rgb head matmuls and the (sine-free) resample re-run.
    def load_state(pi, p_flat):
        hh = rh_ref[0, pi]                                # (S*T, L*H) mm
        aa = ra_ref[0, pi]                                # (S*T, L*H) f32
        hids = [hh[:, i * H : (i + 1) * H] for i in range(L)]
        acts = [aa[:, i * H : (i + 1) * H] for i in range(L)]
        h_last = hids[L - 1]
        hcm = rhc_ref[0, pi]
        return dict(
            x=(p_flat * warp_scale).astype(mm_dtype),
            a=acts, h=hids,
            ac=rac_ref[0, pi], hcm=hcm,
            sig=jnp.dot(h_last, ws_ref[:], preferred_element_type=f32) + bs_ref[0],
            rgb=jnp.dot(hcm, wr_ref[:], preferred_element_type=f32) + br_ref[0],
        )

    pts = pts_ref[0]
    p_flat_c = pts.reshape(S * T, 3)
    sc_state = mlp_fwd(p_flat_c) if rh_ref is None else load_state(0, p_flat_c)
    sig_c = sc_state["sig"].reshape(S, T, 8)[..., 0]
    rgb_c = sc_state["rgb"]
    z = z_ref[0]
    deltas = jnp.concatenate([z[1:] - z[:-1], jnp.full((1, T), 1e10, f32)], 0)
    scn = sig_c + nc_ref[0] * noise_std if use_noise else sig_c
    alpha_c = 1.0 - jnp.exp(-deltas * _clamp(scn, clamp_mode))
    logx_c = jnp.log(jnp.maximum(1.0 - alpha_c, 1e-10))
    ii = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    excl = (jj < ii).astype(f32)
    w_c = alpha_c * jnp.exp(jnp.dot(excl, logx_c, preferred_element_type=f32))
    inner = (w_c + 1e-5)[1:-1] + 1e-5
    pdf = inner / jnp.sum(inner, axis=0, keepdims=True)
    nb = S - 2
    cj = jax.lax.broadcasted_iota(jnp.int32, (nb + 1, nb), 0)
    ck = jax.lax.broadcasted_iota(jnp.int32, (nb + 1, nb), 1)
    cmask = (ck < cj).astype(f32)
    cdf = jnp.dot(cmask, pdf, preferred_element_type=f32)
    z_mid = 0.5 * (z[:-1] + z[1:])
    u = u_ref[0]
    inds = jnp.sum((cdf[None] < u[:, None, :]).astype(f32), axis=1)
    below = jnp.maximum(inds - 1.0, 0.0)
    above = jnp.minimum(inds, float(nb))
    bins_i = jax.lax.broadcasted_iota(jnp.int32, (1, nb + 1, 1), 1).astype(f32)
    sel_b = (below[:, None, :] == bins_i).astype(f32)
    sel_a = (above[:, None, :] == bins_i).astype(f32)
    cdf_b = jnp.sum(sel_b * cdf[None], axis=1)
    cdf_a = jnp.sum(sel_a * cdf[None], axis=1)
    zm_b = jnp.sum(sel_b * z_mid[None], axis=1)
    zm_a = jnp.sum(sel_a * z_mid[None], axis=1)
    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    fine_z = zm_b + (u - cdf_b) / denom * (zm_a - zm_b)
    fine_pts = org_ref[0][None] + dir_ref[0][None] * fine_z[..., None]
    p_flat_f = fine_pts.reshape(S * T, 3)
    sf_state = mlp_fwd(p_flat_f) if rh_ref is None else load_state(1, p_flat_f)
    sig_f = sf_state["sig"].reshape(S, T, 8)[..., 0]

    m = 2 * S
    z_all = jnp.concatenate([fine_z, z], axis=0)
    sig_all = jnp.concatenate([sig_f, sig_c], axis=0)
    less = z_all[None, :, :] < z_all[:, None, :]
    equal = z_all[None, :, :] == z_all[:, None, :]
    mj = jax.lax.broadcasted_iota(jnp.int32, (m, m, 1), 0)
    mk = jax.lax.broadcasted_iota(jnp.int32, (m, m, 1), 1)
    before = jnp.logical_or(less, jnp.logical_and(equal, mk < mj)).astype(f32)
    rank = jnp.sum(before, axis=1)
    if use_noise:
        sig_all = sig_all + nf_ref[0] * noise_std
    dens = _clamp(sig_all, clamp_mode)
    succ = (rank[:, None, :] + 1.0 == rank[None, :, :]).astype(f32)
    z_next = jnp.sum(succ * z_all[None], axis=1)
    is_last = rank == float(m - 1)
    deltas_m = jnp.where(is_last, 1e10, z_next - z_all)
    expd = jnp.exp(-deltas_m * dens)
    alpha = 1.0 - expd
    one_m_alpha = jnp.maximum(1.0 - alpha, 1e-10)
    logx = jnp.log(one_m_alpha)
    trans = jnp.exp(jnp.sum(before * logx[None], axis=1))
    w0_w = alpha * trans                                  # pre-last_back
    rgb_all = jnp.concatenate(
        [sf_state["rgb"].reshape(S, T, -1), rgb_c.reshape(S, T, -1)], axis=0
    )

    # ---- compositing backward -------------------------------------------
    d_fea = dfea_ref[0].astype(f32)                       # (T, R)
    d_dep = ddep_ref[0]                                   # (1, T)
    d_w1 = jnp.sum(rgb_all * d_fea[None], axis=2) + d_dep * z_all  # (m, T)
    d_wsum = jnp.zeros((1, T), f32)
    if white_back:
        d_wsum = d_wsum - jnp.swapaxes(
            jnp.sum(d_fea, axis=1, keepdims=True), 0, 1)
    d_w0 = d_w1
    if last_back:
        d_wsum = d_wsum - jnp.sum(
            d_w1 * is_last.astype(f32), axis=0, keepdims=True)
    d_w0 = d_w0 + d_wsum                                  # wsum = sum_m w0
    w_lb = w0_w
    if last_back:
        w_sum = jnp.sum(w0_w, axis=0, keepdims=True)
        w_lb = w0_w + (1.0 - w_sum) * is_last.astype(f32)
    d_rgb_all = w_lb[..., None] * d_fea[None]             # (m, T, R)
    d_alpha = d_w0 * trans
    d_acc = trans * (d_w0 * alpha)                        # d wrt sum(before*logx)
    d_logx = jnp.sum(before * d_acc[:, None, :], axis=0)  # (m, T)
    d_alpha = d_alpha + jnp.where(
        (1.0 - alpha) > 1e-10, -d_logx / one_m_alpha, 0.0)
    d_dens = d_alpha * deltas_m * expd
    if clamp_mode == "softplus":
        d_sig_all = d_dens * jax.nn.sigmoid(sig_all)
    else:
        d_sig_all = d_dens * (sig_all > 0).astype(f32)

    to_rows1 = lambda a: a[..., None].reshape(S * T, 1)   # (S, T) -> (N, 1)
    mlp_bwd(  # fine pass: weight/film grads only (fine points detached)
        sf_state,
        d_rgb_all[:S].reshape(S * T, -1),
        to_rows1(d_sig_all[:S]),
    )
    d_xc = mlp_bwd(
        sc_state,
        d_rgb_all[S:].reshape(S * T, -1),
        to_rows1(d_sig_all[S:]),
    )
    dpts_ref[0] = d_xc.reshape(S, T, 3)


def _weight_block_specs(layers, C, R, film_spec, vspec, fixed):
    """In-spec list for the weight tuple — per-layer (w, b, g, f) then the
    head tail — shared by the forward and backward grid specs."""
    specs = []
    for w_, _, _, _ in layers:
        specs += [
            vspec(w_.shape, fixed), vspec((1, w_.shape[1]), fixed),
            film_spec, film_spec,
        ]
    H = layers[-1][0].shape[1]
    specs += [
        vspec((H, C), fixed), vspec((1, C), fixed), film_spec, film_spec,
        vspec((C, R), fixed), vspec((1, R), fixed),
        vspec((H, 8), fixed), vspec((1, 8), fixed),
    ]
    return specs


def _cast_wt(wt, mm_dtype):
    """mm-cast the matmul weights (w_i, wc, wr, ws); films/biases stay f32."""
    layers, (wc, bc, gc, fc, wr, br, ws, bs) = _split_wt(wt)
    mm = lambda a: a.astype(mm_dtype)
    out = []
    for w_, b_, g_, f_ in layers:
        out += [mm(w_), b_, g_, f_]
    out += [mm(wc), bc, gc, fc, mm(wr), br, mm(ws), bs]
    return out


def _pallas_backward(
    wt, pts, org, dirs, z_sq, u, nc, nf, ns, d_fea, d_dep,
    *, tile, interpret, clamp_mode, white_back, last_back, use_noise,
    fast_sin, mm_dtype, warp_scale, out_dtype, residuals=None,
):
    """Invoke the backward kernel; returns (d_wt tuple, d_pts) in the
    unpadded ray-major layouts of the primal inputs.  ``residuals``
    (rh, ra, rhc, rac from the with_residuals forward) switches the kernel
    to residual mode — no MLP recompute, XLA-parity 2x total sine count."""
    layers, (wc, bc, gc, fc, wr, br, ws, bs) = _split_wt(wt)
    L = len(layers)
    b, n, S, _ = pts.shape
    f32 = jnp.float32
    H = layers[0][0].shape[1]
    C = wc.shape[1]
    R = wr.shape[1]

    pad = (-n) % tile
    def prep(x, smajor):
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))
        return jnp.swapaxes(x, 1, 2) if smajor else x
    pts_p = prep(pts, True)
    org_p = prep(org, False)
    dir_p = prep(dirs, False)
    z_p = prep(z_sq, True)
    u_p = prep(u, True)
    nc_p = prep(nc, True)
    nf_p = prep(nf, True)
    dfea_p = prep(d_fea, False)
    ddep_p = prep(d_dep, True)                            # (b, 1, n_pad)
    n_pad = n + pad
    n_tiles = n_pad // tile

    ray_idx = lambda bi, ti: (bi, ti, 0)
    smj_idx = lambda bi, ti: (bi, 0, ti)
    smj_idx4 = lambda bi, ti: (bi, 0, ti, 0)
    fixed = lambda *_: (0, 0)
    vspec = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    grad_out_specs = []
    grad_out_shape = []
    sds = jax.ShapeDtypeStruct
    for w_, _, _, _ in layers:
        grad_out_specs += [
            vspec(w_.shape, fixed), vspec((1, H), fixed), full, full,
        ]
        grad_out_shape += [
            sds(w_.shape, f32), sds((1, H), f32), sds((b, H), f32), sds((b, H), f32),
        ]
    grad_out_specs += [
        vspec((H, C), fixed), vspec((1, C), fixed), full, full,
        vspec((C, R), fixed), vspec((1, R), fixed),
        vspec((H, 8), fixed), vspec((1, 8), fixed),
        vspec((1, S, tile, 3), smj_idx4),
    ]
    grad_out_shape += [
        sds((H, C), f32), sds((1, C), f32), sds((b, C), f32), sds((b, C), f32),
        sds((C, R), f32), sds((1, R), f32),
        sds((H, 8), f32), sds((1, 8), f32),
        sds((b, S, n_pad, 3), f32),
    ]

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
        ]
        + _weight_block_specs(layers, C, R, full, vspec, fixed)
        + [
            vspec((1, tile, R), ray_idx),
            vspec((1, 1, tile), smj_idx),
        ] + ([
            vspec((1, 2, S * tile, L * H), lambda bi, ti: (bi, 0, ti, 0)),
            vspec((1, 2, S * tile, L * H), lambda bi, ti: (bi, 0, ti, 0)),
            vspec((1, 2, S * tile, C), lambda bi, ti: (bi, 0, ti, 0)),
            vspec((1, 2, S * tile, C), lambda bi, ti: (bi, 0, ti, 0)),
        ] if residuals is not None else []),
        out_specs=grad_out_specs,
    )
    kernel = functools.partial(
        _ray_tile_bwd_kernel,
        S=S, L=L, warp_scale=warp_scale, clamp_mode=clamp_mode,
        white_back=white_back, last_back=last_back, use_noise=use_noise,
        fast_sin=fast_sin, mm_dtype=mm_dtype,
    )
    outs = pl.pallas_call(
        kernel,
        out_shape=grad_out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
        # the recompute backward holds both passes' pre-activations plus the
        # compositing matrices (~19 MB at tile 128) — raise XLA's default
        # 16 MB scoped-vmem cap (physical VMEM is larger on v5e)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(
        pts_p, org_p, dir_p, z_p, u_p, nc_p, nf_p, ns,
        *_cast_wt(wt, mm_dtype),
        dfea_p, ddep_p,
        *(residuals if residuals is not None else ()),
    )
    d_wt = tuple(outs[:-1])
    d_pts = jnp.swapaxes(outs[-1], 1, 2)[:, :n]
    return d_wt, d_pts


@functools.lru_cache(maxsize=32)
def _make_core(
    tile, clamp_mode, white_back, last_back, use_noise, fast_sin,
    mm_name, out_name, interpret, warp_scale, vjp_impl, tile_bwd,
):
    """custom_vjp core: Pallas forward; backward per `vjp_impl` —
    'pallas' = the hand-written recompute kernel (_ray_tile_bwd_kernel),
    'pallas_residual' = the forward saves hidden states/pre-activations to
    HBM and the backward consumes them (no MLP recompute — XLA-parity 2x
    total sine count; the residual traffic is the trade, so this variant
    wins for exact-sin training while 'pallas' wins under fast_sin),
    'jnp' = `jax.vjp` of the jnp mirror (reference implementation, used to
    validate the kernels).  Cached per static configuration so jit tracing
    reuses one callable.  The SIREN depth is carried by the length of the
    weight tuple (4·L + 8 arrays), so one cached core serves every depth —
    tracing re-specializes per shape anyway."""
    mm_dtype = jnp.dtype(mm_name)
    out_dtype = jnp.dtype(out_name)
    statics = dict(
        clamp_mode=clamp_mode, white_back=white_back, last_back=last_back,
        use_noise=use_noise, fast_sin=fast_sin, mm_dtype=mm_dtype,
        warp_scale=warp_scale, out_dtype=out_dtype,
    )
    jcore = functools.partial(_jnp_core, **statics)

    def f(wt, pts, org, dirs, z, u, nc, nf, ns):
        return _pallas_forward(
            wt, pts, org, dirs, z, u, nc, nf, ns,
            tile=tile, interpret=interpret, **statics,
        )

    core = jax.custom_vjp(f)

    def fwd(*args):
        return f(*args), args

    def fwd_residual(*args):
        out, residuals = _pallas_forward(
            *args, tile=tile, interpret=interpret, with_residuals=True,
            **statics,
        )
        return out, (args, residuals)

    def bwd_jnp(res, cot):
        # Re-run the jnp mirror under jax.vjp: full, exact cotangents for
        # every input (resample stays stop-gradient, matching the reference).
        _, vjp_fn = jax.vjp(jcore, *res)
        return vjp_fn(cot)

    def bwd_pallas(res, cot):
        wt, pts, org, dirs, z, u, nc, nf, ns = res
        d_fea, d_dep = cot
        d_wt, d_pts = _pallas_backward(
            wt, pts, org, dirs, z, u, nc, nf, ns,
            d_fea.astype(out_dtype), d_dep.astype(jnp.float32),
            tile=tile_bwd, interpret=interpret, **statics,
        )
        # fine points are detached (reference .detach()): org/dirs/z/u/noise
        # cotangents are zero; camera grads flow through the coarse pts input
        zeros = jax.tree_util.tree_map(
            jnp.zeros_like, (org, dirs, z, u, nc, nf, ns))
        return (d_wt, d_pts) + zeros

    def bwd_residual(res, cot):
        args, residuals = res
        wt, pts, org, dirs, z, u, nc, nf, ns = args
        d_fea, d_dep = cot
        d_wt, d_pts = _pallas_backward(
            wt, pts, org, dirs, z, u, nc, nf, ns,
            d_fea.astype(out_dtype), d_dep.astype(jnp.float32),
            tile=tile, interpret=interpret, residuals=residuals, **statics,
        )
        zeros = jax.tree_util.tree_map(
            jnp.zeros_like, (org, dirs, z, u, nc, nf, ns))
        return (d_wt, d_pts) + zeros

    if vjp_impl == "jnp":
        core.defvjp(fwd, bwd_jnp)
    elif vjp_impl == "pallas_residual":
        # residual blocks are tiled by the FORWARD tile; the backward must
        # read them with the same tiling, so tile_bwd is ignored here
        core.defvjp(fwd_residual, bwd_residual)
    else:
        core.defvjp(fwd, bwd_pallas)
    return core


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
    tile_bwd: int = 128,    # ray-tile lane width: must be a multiple of 128
    fast_sin: bool = False,
    vjp_impl: str = "pallas",
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused NeRF stage of `GeneratorNerfINR.points_forward` (hierarchical
    path): returns (pixels_fea (b, n, R) in `dtype`, depth (b, n, 1) f32).

    `key` is the same key `points_forward` receives; it is split exactly like
    the XLA path (k_pdf, k_noise_coarse, k_noise_final) and the draws are
    made with the XLA path's shapes/dtypes, so results match on the same key.

    The SIREN depth is inferred from `siren_params` (its `film_{i}` entries)
    — any ``hidden_layers >= 1`` works; the kernels unroll over the layers.

    Differentiable: gradients flow to the SIREN params (through
    `extract_siren_weights`/`compute_films`) and to points/origins/dirs/z;
    the hierarchical resample is stop-gradient, matching the reference.
    Depth is returned as-is; the generator stop-gradients it.
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
    L = num_hidden_layers(siren_params)
    wt = []
    for i in range(L):
        wt += [
            weights[f"w{i}"].astype(f32),
            weights[f"b{i}"].reshape(1, -1).astype(f32),
            films[f"g{i}"].astype(f32),
            films[f"f{i}"].astype(f32),
        ]
    wt += [
        weights["wc"].astype(f32), weights["bc"].reshape(1, -1).astype(f32),
        films["gc"].astype(f32), films["fc"].astype(f32),
        weights["wr"].astype(f32), weights["br"].reshape(1, -1).astype(f32),
        jnp.pad(weights["ws"], ((0, 0), (0, 7))).astype(f32),
        jnp.pad(weights["bs"].reshape(1, 1), ((0, 0), (0, 7))).astype(f32),
    ]
    core = _make_core(
        tile, clamp_mode, white_back, last_back, use_noise, fast_sin,
        jnp.dtype(mm_dtype).name, jnp.dtype(dtype).name, interpret,
        2.0 / box_sidelength, vjp_impl, tile_bwd,
    )
    # Under a pixel-sharding scope (multi-chip training) the kernel must be
    # explicitly shard_map'ed: GSPMD cannot auto-partition Mosaic custom
    # calls on real TPU (found by the r512 8-chip AOT, tools/compile_r512.py).
    # The kernel is pointwise over (batch, ray) tiles, so this is a pure
    # grid split; weights stay replicated and their grads psum in the
    # shard_map transpose.  Identity when no scope is active.
    from cips3d_tpu.parallel import mesh as mesh_lib

    # wt layout (see construction above): per hidden layer (w, b, g, f) with
    # w/b replicated and the FiLM g/f per-batch (b, H); then wc, bc (rep),
    # gc, fc (batch), wr, br, ws, bs (rep).
    wt_kinds = tuple(
        ["rep", "rep", "b", "b"] * L
        + ["rep", "rep", "b", "b", "rep", "rep", "rep", "rep"]
    )
    core = mesh_lib.pixel_shard_map(
        core, b, n,
        in_kinds=(wt_kinds, "bp", "bp", "bp", "bp", "bp", "bp", "bp", "rep"),
        out_kinds=("bp", "bp"),
    )
    return core(
        tuple(wt), pts.astype(f32), origins.astype(f32), dirs.astype(f32),
        z_vals[..., 0].astype(f32), u.astype(f32), nc, nf, ns,
    )


def _pallas_forward(
    wt, pts, org, dirs, z_sq, u, nc, nf, ns,
    *, tile, interpret, clamp_mode, white_back, last_back, use_noise,
    fast_sin, mm_dtype, warp_scale, out_dtype, with_residuals=False,
):
    """Invoke the s-major ray-tile kernel on (b, n, ...) f32 arrays.

    ``with_residuals`` (training forward under the residual-passing VJP)
    additionally returns the per-pass hidden states / pre-activations
    (rh, ra, rhc, rac) so the backward kernel skips the MLP recompute —
    total sine count matches XLA's fwd+bwd (2x) instead of 3x."""
    layers, (wc, bc, gc, fc, wr, br, ws, bs) = _split_wt(wt)
    L = len(layers)
    b, n, S, _ = pts.shape
    f32 = jnp.float32
    H = layers[0][0].shape[1]
    C = wc.shape[1]
    R = wr.shape[1]
    dtype = out_dtype

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
    pts_p = prep(pts, 4)
    org_p = prep(org, 2)
    dir_p = prep(dirs, 2)
    z_p = prep(z_sq, 3)
    u_p = prep(u, 3)
    nc_p = prep(nc, 3)
    nf_p = prep(nf, 3)
    n_pad = n + pad
    n_tiles = n_pad // tile

    ray_idx = lambda bi, ti: (bi, ti, 0)            # (b, n_pad, 3) tensors
    smj_idx = lambda bi, ti: (bi, 0, ti)            # (b, S, n_pad) tensors
    smj_idx4 = lambda bi, ti: (bi, 0, ti, 0)        # (b, S, n_pad, 3)
    fixed = lambda *_: (0, 0)

    vspec = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    # films ride whole ((b, dim) is tiny); the kernel slices its batch row
    bvec_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
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
        ]
        + _weight_block_specs(layers, C, R, bvec_spec, vspec, fixed),
        out_specs=[
            vspec((1, tile, R), ray_idx),
            vspec((1, 8, tile), smj_idx),
        ] + ([
            vspec((1, 2, S * tile, L * H), lambda bi, ti: (bi, 0, ti, 0)),
            vspec((1, 2, S * tile, L * H), lambda bi, ti: (bi, 0, ti, 0)),
            vspec((1, 2, S * tile, C), lambda bi, ti: (bi, 0, ti, 0)),
            vspec((1, 2, S * tile, C), lambda bi, ti: (bi, 0, ti, 0)),
        ] if with_residuals else []),
    )

    kernel = functools.partial(
        _ray_tile_kernel,
        S=S,
        L=L,
        warp_scale=warp_scale,
        clamp_mode=clamp_mode,
        white_back=white_back,
        last_back=last_back,
        use_noise=use_noise,
        fast_sin=fast_sin,
        mm_dtype=mm_dtype,
    )
    n_pts = b * n_pad * 2 * S
    sds = jax.ShapeDtypeStruct
    out_shape = [
        sds((b, n_pad, R), dtype),
        sds((b, 8, n_pad), f32),
    ]
    if with_residuals:
        out_shape += [
            sds((b, 2, S * n_pad, L * H), mm_dtype),
            sds((b, 2, S * n_pad, L * H), f32),
            sds((b, 2, S * n_pad, C), mm_dtype),
            sds((b, 2, S * n_pad, C), f32),
        ]
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pts * (3 * H + (L - 1) * H * H + H * C + C * R + H)
            + 2 * b * n_pad * (2 * S) ** 2 * 4,
            bytes_accessed=b * n_pad * (S * 3 + 6 + 5 * S + 2 * S + R + 8) * 4,
            transcendentals=n_pts * (L * H + C + 2),
        ),
    )(
        pts_p, org_p, dir_p, z_p, u_p, nc_p, nf_p, ns,
        *_cast_wt(wt, mm_dtype),
    )
    fea, dep = outs[0], outs[1]
    result = (fea[:, :n], jnp.swapaxes(dep[:, :1, :n], 1, 2))
    if with_residuals:
        return result, tuple(outs[2:])
    return result
