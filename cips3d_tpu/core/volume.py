"""Volume rendering and hierarchical importance sampling.

Functional JAX counterparts of `exp/pigan/pigan_utils.py:164-273`
(`sample_pdf`, `fancy_integration`) and
`exp/dev/nerf_inr/models/generator_nerf_inr.py:538-598`
(`get_fine_points_and_direction`).

Everything is static-shaped and twice-differentiable where the reference needs
it (the R1 path never goes through here, but G's backward does).  The
coarse→fine resample is wrapped in `stop_gradient`, matching the reference's
`@torch.no_grad()` + `.detach()`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def volume_render(
    rgb_sigma: jnp.ndarray,
    z_vals: jnp.ndarray,
    noise_key: Optional[jax.Array] = None,
    noise_std: float = 0.5,
    dim_rgb: int = 3,
    last_back: bool = False,
    white_back: bool = False,
    clamp_mode: str = "relu",
    fill_mode: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NeRF alpha-compositing along rays (`pigan_utils.fancy_integration`,
    `pigan_utils.py:212-273`).

    Args:
      rgb_sigma: (b, n, s, dim_rgb + 1) — per-sample feature + density.
      z_vals:    (b, n, s, 1) — sorted sample depths.
      noise_key: RNG key for density noise; None (or noise_std == 0) disables.
      clamp_mode: 'relu' | 'softplus' density activation.
      last_back:  dump residual transmittance into the last sample's weight.
      white_back: composite onto white.
      fill_mode:  None | 'debug' (paint low-occupancy pixels red) | 'weight'.

    Returns:
      rgb:     (b, n, dim_rgb)
      depth:   (b, n, 1)
      weights: (b, n, s, 1)
    """
    return volume_render_split(
        rgb_sigma[..., :dim_rgb],
        rgb_sigma[..., dim_rgb:],
        z_vals,
        noise_key=noise_key,
        noise_std=noise_std,
        last_back=last_back,
        white_back=white_back,
        clamp_mode=clamp_mode,
        fill_mode=fill_mode,
    )


def render_weights(
    sigmas: jnp.ndarray,
    z_vals: jnp.ndarray,
    noise_key: Optional[jax.Array] = None,
    noise_std: float = 0.5,
    clamp_mode: str = "relu",
) -> jnp.ndarray:
    """Compositing weights (b, n, s, 1) from density alone — the rgb-free
    core of `volume_render` (hierarchical resampling needs only these)."""
    deltas = z_vals[:, :, 1:] - z_vals[:, :, :-1]
    delta_inf = jnp.full_like(deltas[:, :, :1], 1e10)
    deltas = jnp.concatenate([deltas, delta_inf], axis=-2)  # (b, n, s, 1)

    # noise_std may be a traced scalar (the nerf_noise schedule decays per
    # step, `exp/cips3d/scripts/train.py:327`); only the key gates statically.
    if noise_key is not None and not (isinstance(noise_std, (int, float)) and noise_std == 0):
        sigmas = sigmas + jax.random.normal(noise_key, sigmas.shape, sigmas.dtype) * noise_std

    if clamp_mode == "softplus":
        density = jax.nn.softplus(sigmas)
    elif clamp_mode == "relu":
        density = jax.nn.relu(sigmas)
    else:
        raise ValueError(f"clamp_mode must be 'relu' or 'softplus', got {clamp_mode!r}")

    alphas = 1.0 - jnp.exp(-deltas * density)  # (b, n, s, 1)
    # Transmittance: T_i = prod_{j<i} (1 - alpha_j + 1e-10), computed as
    # exp(logx @ U) with U strictly upper-triangular — one small matmul on
    # the MXU.  jnp.cumprod along the tiny s axis lowers to a chain of padded
    # shifts on a lane-1 layout that profiled at ~14 ms/step at r64 (round-2
    # TPU trace); this formulation removes it entirely.
    s = alphas.shape[2]
    # floor via maximum, NOT `+ 1e-10`: XLA reassociates `1.0 - a + eps` into
    # `(1.0 + eps) - a` whose folded constant rounds back to 1.0, yielding
    # log(0) = -inf on saturated rays (observed on TPU); max() also zeroes
    # the gradient where clamped instead of the 1/eps spike.
    logx = jnp.log(jnp.maximum(1.0 - alphas[..., 0], 1e-10))  # (b, n, s)
    excl = jnp.triu(jnp.ones((s, s), logx.dtype), k=1)       # [j, i] = 1 iff j < i
    transmittance = jnp.exp(jnp.einsum("bns,st->bnt", logx, excl))[..., None]
    return alphas * transmittance  # (b, n, s, 1)


def volume_render_split(
    rgbs: jnp.ndarray,
    sigmas: jnp.ndarray,
    z_vals: jnp.ndarray,
    noise_key: Optional[jax.Array] = None,
    noise_std: float = 0.5,
    last_back: bool = False,
    white_back: bool = False,
    clamp_mode: str = "relu",
    fill_mode: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """`volume_render` with rgb (b, n, s, c) and sigma (b, n, s, 1) kept as
    separate tensors — the hot path never concatenates them into a
    (c+1)-channel tensor (off-lane widths force layout copies on TPU; the
    slice back out of the packed tensor alone cost ~17 ms/step at r256)."""
    weights = render_weights(
        sigmas, z_vals, noise_key=noise_key, noise_std=noise_std, clamp_mode=clamp_mode
    )
    weights_sum = weights.sum(axis=2)  # (b, n, 1)

    if last_back:
        weights = weights.at[:, :, -1].add(1.0 - weights_sum)

    rgb_final = jnp.sum(weights * rgbs, axis=-2)    # (b, n, dim_rgb)
    depth_final = jnp.sum(weights * z_vals, axis=-2)  # (b, n, 1)

    if white_back:
        rgb_final = rgb_final + 1.0 - weights_sum

    if fill_mode == "debug":
        red = jnp.zeros_like(rgb_final).at[..., 0].set(1.0)
        rgb_final = jnp.where(weights_sum < 0.9, red, rgb_final)
    elif fill_mode == "weight":
        rgb_final = jnp.broadcast_to(weights_sum, rgb_final.shape)

    return rgb_final, depth_final, weights


def sample_pdf(
    key: Optional[jax.Array],
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_importance: int,
    det: bool = False,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Inverse-CDF importance sampling (`pigan_utils.sample_pdf`,
    `pigan_utils.py:164-209`).

    Args:
      bins:    (R, B) bin edges (mid-points of coarse z-vals).
      weights: (R, B - 1) unnormalized bin weights.
      n_importance: number of samples to draw per ray.
      det: deterministic (linspace) instead of uniform draws.

    Returns: samples (R, n_importance).
    """
    n_rays, n_bins_w = weights.shape
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    # inclusive prefix sum as a triangular matmul (see volume_render: small-
    # axis cumsum/cumprod lower poorly on TPU)
    incl = jnp.tril(jnp.ones((n_bins_w, n_bins_w), pdf.dtype)).T  # [j, i] = 1 iff j <= i
    cdf = pdf @ incl
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # (R, B)

    if det:
        u = jnp.linspace(0.0, 1.0, n_importance, dtype=bins.dtype)
        u = jnp.broadcast_to(u[None], (n_rays, n_importance))
    else:
        if key is None:
            raise ValueError("sample_pdf with det=False requires an RNG key")
        u = jax.random.uniform(key, (n_rays, n_importance), bins.dtype)

    # TPU-friendly searchsorted: the bin count is tiny (num_steps+1), so the
    # insertion index is just a count of cdf entries < u — a dense comparison
    # instead of a per-row binary search (gathers are slow on TPU).
    inds = jnp.sum(
        (cdf[:, None, :] < u[:, :, None]).astype(jnp.int32), axis=-1
    )  # (R, n_importance), == searchsorted(cdf, u, side='left')
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, n_bins_w)

    # one-hot selects lower to matmuls (MXU) instead of gathers
    n_bins = cdf.shape[-1]
    oh_below = jax.nn.one_hot(below, n_bins, dtype=cdf.dtype)  # (R, I, B)
    oh_above = jax.nn.one_hot(above, n_bins, dtype=cdf.dtype)
    cdf_below = jnp.einsum("rib,rb->ri", oh_below, cdf)
    cdf_above = jnp.einsum("rib,rb->ri", oh_above, cdf)
    bins_below = jnp.einsum("rib,rb->ri", oh_below, bins)
    bins_above = jnp.einsum("rib,rb->ri", oh_above, bins)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < eps, 1.0, denom)
    samples = bins_below + (u - cdf_below) / denom * (bins_above - bins_below)
    return samples


def get_fine_points(
    key: Optional[jax.Array],
    coarse_output: jnp.ndarray,
    z_vals: jnp.ndarray,
    dim_rgb: int,
    clamp_mode: str,
    noise_std: float,
    num_steps: int,
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    noise_key: Optional[jax.Array] = None,
    det: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Coarse→fine hierarchical resampling
    (`generator_nerf_inr.get_fine_points_and_direction`,
    `exp/dev/nerf_inr/models/generator_nerf_inr.py:538-598`).

    The whole computation is wrapped in `stop_gradient` (the reference runs it
    under `torch.no_grad()` and `.detach()`s the samples).

    Args:
      coarse_output: (b, n, s, dim_rgb + 1)
      z_vals:        (b, n, s, 1)
      ray_origins:   (b, n, 3)
      ray_directions:(b, n, 3)

    Returns:
      fine_points: (b, n, num_steps, 3)
      fine_z_vals: (b, n, num_steps, 1)
    """
    return get_fine_points_from_sigma(
        key,
        coarse_output[..., dim_rgb:],
        z_vals,
        clamp_mode=clamp_mode,
        noise_std=noise_std,
        num_steps=num_steps,
        ray_origins=ray_origins,
        ray_directions=ray_directions,
        noise_key=noise_key,
        det=det,
    )


def get_fine_points_from_sigma(
    key: Optional[jax.Array],
    sigmas: jnp.ndarray,
    z_vals: jnp.ndarray,
    clamp_mode: str,
    noise_std: float,
    num_steps: int,
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    noise_key: Optional[jax.Array] = None,
    det: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """`get_fine_points` taking only the density (b, n, s, 1): the resampling
    weights never depend on the rgb features, so the split hot path avoids
    slicing them out of a packed (c+1)-channel tensor."""
    b, n, s, _ = sigmas.shape

    def _resample(sigmas, z_vals, ray_origins, ray_directions):
        weights = render_weights(
            sigmas,
            z_vals,
            noise_key=noise_key,
            noise_std=noise_std,
            clamp_mode=clamp_mode,
        )
        w = weights.reshape(b * n, s) + 1e-5
        z = z_vals.reshape(b * n, s)
        z_mid = 0.5 * (z[:, :-1] + z[:, 1:])  # (bn, s-1)
        fine_z = sample_pdf(key, z_mid, w[:, 1:-1], num_steps, det=det)
        fine_z = fine_z.reshape(b, n, num_steps, 1)
        fine_points = ray_origins[:, :, None, :] + ray_directions[:, :, None, :] * fine_z
        return fine_points, fine_z

    fine_points, fine_z = _resample(sigmas, z_vals, ray_origins, ray_directions)
    return jax.lax.stop_gradient(fine_points), jax.lax.stop_gradient(fine_z)


def merge_sorted_samples(
    coarse_output: jnp.ndarray,
    coarse_z: jnp.ndarray,
    fine_output: jnp.ndarray,
    fine_z: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Concatenate fine+coarse samples and sort by depth
    (`exp/cips3d/models/generator.py:1732-1738`).

    The reference concatenates [fine, coarse] then argsorts z (stable, so
    ties keep fine first).  On TPU, sorting 2s ≈ 24 values per ray through
    `sort`+`gather` is slow; with such a tiny axis a rank-by-counting
    comparison matrix plus a one-hot permutation matmul (MXU) is much faster
    and exactly reproduces the stable order:

        rank_i = #{j : z_j < z_i} + #{j < i : z_j == z_i}
        sorted = onehot(rank)^T @ values

    Shapes: outputs (b, n, s, c), z (b, n, s, 1) → (b, n, 2s, ...).
    """
    all_outputs = jnp.concatenate([fine_output, coarse_output], axis=-2)
    all_z = jnp.concatenate([fine_z, coarse_z], axis=-2)  # (b, n, m, 1)
    m = all_z.shape[-2]

    z = all_z[..., 0]  # (b, n, m)
    less = (z[..., None, :] < z[..., :, None]).astype(jnp.int32)   # [i, j] = z_j < z_i
    equal = (z[..., None, :] == z[..., :, None]).astype(jnp.int32)
    tri = (jnp.arange(m)[None, :] < jnp.arange(m)[:, None]).astype(jnp.int32)  # j < i
    rank = jnp.sum(less, axis=-1) + jnp.sum(equal * tri, axis=-1)  # (b, n, m)

    perm = jax.nn.one_hot(rank, m, dtype=all_outputs.dtype)  # (b, n, m_src, m_dst)
    all_outputs = jnp.einsum("bnij,bnic->bnjc", perm, all_outputs)
    all_z = jnp.einsum("bnij,bnic->bnjc", perm.astype(all_z.dtype), all_z)
    return all_outputs, all_z


def volume_render_unsorted(
    rgbs: jnp.ndarray,
    sigmas: jnp.ndarray,
    z_vals: jnp.ndarray,
    noise_key: Optional[jax.Array] = None,
    noise_std: float = 0.5,
    last_back: bool = False,
    white_back: bool = False,
    clamp_mode: str = "relu",
    fill_mode: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sort-free alpha compositing over samples in ARBITRARY depth order.

    Replaces `merge_sorted_samples(_split)` + `volume_render(_split)` on the
    hierarchical path: compositing is permutation-invariant given the
    pairwise before/after relation, so instead of materializing sorted
    tensors through one-hot permutation matmuls we evaluate

        T_j      = exp(sum_k before[j,k] * log(1 - alpha_k))
        delta_j  = z_{succ(j)} - z_j          (succ = next sample in depth)
        rgb      = sum_j alpha_j T_j rgb_j

    where ``before[j,k] = [z_k < z_j or (z_k == z_j and k < j)]`` reproduces
    the reference's stable [fine, coarse] sort order
    (`generator.py:1732-1744` sort+gather+fancy_integration).  rgb features
    are never permuted (the (m x m) x (m x c) permutation matmul and its
    transpose dominated the merge cost), and per-sample scalars stay in
    arrival order end to end.

    Inputs: rgbs (b, n, m, c), sigmas/z_vals (b, n, m, 1), any m-order.
    Returns (rgb (b, n, c), depth (b, n, 1), weights (b, n, m, 1) — weights
    are in ARRIVAL order, not depth order).
    """
    f = rgbs.dtype
    # Integer-valued rank/successor arithmetic must be exact: in bf16 sums are
    # only exact for m <= 256 and silently corrupt beyond.  Run the ordering
    # machinery in float32 regardless of the compute dtype (the einsums are
    # tiny relative to the MLP matmuls).
    cf = jnp.float32 if jnp.dtype(f).itemsize < 4 else f
    z = z_vals[..., 0]
    m = z.shape[-1]

    less = z[..., None, :] < z[..., :, None]          # [j, k] = z_k < z_j
    equal = z[..., None, :] == z[..., :, None]
    tie = jnp.arange(m)[None, :] < jnp.arange(m)[:, None]  # k < j
    before = jnp.logical_or(less, jnp.logical_and(equal, tie)).astype(cf)
    rank = jnp.sum(before, axis=-1)                   # (b, n, m); exact in f32

    if noise_key is not None and not (isinstance(noise_std, (int, float)) and noise_std == 0):
        sigmas = sigmas + jax.random.normal(noise_key, sigmas.shape, sigmas.dtype) * noise_std
    if clamp_mode == "softplus":
        density = jax.nn.softplus(sigmas)
    elif clamp_mode == "relu":
        density = jax.nn.relu(sigmas)
    else:
        raise ValueError(f"clamp_mode must be 'relu' or 'softplus', got {clamp_mode!r}")

    # delta_j = z of the depth-successor minus z_j; the depth-last sample
    # gets the reference's 1e10 sentinel (`pigan_utils.py:228`)
    succ = (rank[..., :, None] + 1.0 == rank[..., None, :]).astype(cf)  # [j, k] = k is succ(j)
    z_f = z.astype(cf)
    z_next = jnp.einsum("bnjk,bnk->bnj", succ, z_f)
    is_last = rank == (m - 1)
    deltas = jnp.where(is_last, jnp.asarray(1e10, cf), z_next - z_f)[..., None].astype(f)

    alphas = 1.0 - jnp.exp(-deltas * density)         # (b, n, m, 1)
    # see volume_render: floor via maximum, never `+ eps`
    logx = jnp.log(jnp.maximum(1.0 - alphas[..., 0], 1e-10)).astype(cf)
    transmittance = jnp.exp(jnp.einsum("bnjk,bnk->bnj", before, logx)).astype(f)[..., None]
    weights = alphas * transmittance
    weights_sum = weights.sum(axis=2)                 # (b, n, 1)

    if last_back:
        weights = weights + (1.0 - weights_sum)[:, :, None, :] * is_last[..., None].astype(f)

    rgb_final = jnp.sum(weights * rgbs, axis=-2)
    depth_final = jnp.sum(weights * z_vals, axis=-2)

    if white_back:
        rgb_final = rgb_final + 1.0 - weights_sum
    if fill_mode == "debug":
        red = jnp.zeros_like(rgb_final).at[..., 0].set(1.0)
        rgb_final = jnp.where(weights_sum < 0.9, red, rgb_final)
    elif fill_mode == "weight":
        rgb_final = jnp.broadcast_to(weights_sum, rgb_final.shape)

    return rgb_final, depth_final, weights


