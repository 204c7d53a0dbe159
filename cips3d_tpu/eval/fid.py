"""FID evaluation: feature statistics + Fréchet distance.

Counterpart of `exp/cips3d/scripts/eval_fid.py:36-57` (torch-fidelity
`calculate_metrics` over a real-dir / fake-dir pair, 50k/50k protocol from
`exp/cips3d/configs/ffhq_exp.yaml:213-220`) plus the KID option.

The metric machinery (activation statistics, Fréchet distance, KID MMD) is
exact.  The feature extractor is pluggable:

  * `InceptionV3Features` (cips3d_tpu.eval.inception) — the FID-standard
    InceptionV3 pool3 features; requires the pretrained weights file
    (`weights-inception-2015-12-05` torch checkpoint, converted via
    `inception.load_torch_state_dict`).  Zero-egress environments without the
    weights can't produce reference-comparable FID numbers — gate on
    availability.
  * any callable (n, H, W, 3) uint8 → (n, d) features — used for relative
    in-training tracking when the weights are absent.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, Optional, Tuple

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def activation_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) of a (n, d) feature matrix."""
    features = np.asarray(features, np.float64)
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """FID between two Gaussians: |mu1-mu2|^2 + Tr(S1 + S2 - 2 sqrt(S1 S2)).

    Uses the eigen-decomposition route (scipy-free sqrtm of the product via
    sqrt(S1) S2 sqrt(S1), which is symmetric PSD).
    """
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    sigma1 = np.asarray(sigma1, np.float64)
    sigma2 = np.asarray(sigma2, np.float64)
    diff = mu1 - mu2

    # sqrt(S1) via symmetric eigendecomposition
    w1, v1 = np.linalg.eigh(sigma1)
    w1 = np.clip(w1, 0, None)
    s1_half = (v1 * np.sqrt(w1)) @ v1.T
    m = s1_half @ sigma2 @ s1_half
    wm = np.linalg.eigvalsh((m + m.T) / 2)
    wm = np.clip(wm, 0, None)
    tr_sqrt = np.sum(np.sqrt(wm))

    if not np.isfinite(tr_sqrt):
        offset = np.eye(sigma1.shape[0]) * eps
        return frechet_distance(mu1, sigma1 + offset, mu2, sigma2 + offset, eps)

    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * tr_sqrt)


def kid_mmd(feat1: np.ndarray, feat2: np.ndarray, subset_size: int = 1000, n_subsets: int = 100,
            seed: int = 0) -> float:
    """Kernel Inception Distance (unbiased polynomial-kernel MMD^2),
    the torch-fidelity KID protocol (`eval_fid.py:42-50` kid=true path)."""
    rng = np.random.default_rng(seed)
    f1 = np.asarray(feat1, np.float64)
    f2 = np.asarray(feat2, np.float64)
    d = f1.shape[1]
    m = min(subset_size, len(f1), len(f2))
    vals = []
    for _ in range(n_subsets):
        x = f1[rng.choice(len(f1), m, replace=False)]
        y = f2[rng.choice(len(f2), m, replace=False)]
        kxx = (x @ x.T / d + 1) ** 3
        kyy = (y @ y.T / d + 1) ** 3
        kxy = (x @ y.T / d + 1) ** 3
        np.fill_diagonal(kxx, 0)
        np.fill_diagonal(kyy, 0)
        mmd = kxx.sum() / (m * (m - 1)) + kyy.sum() / (m * (m - 1)) - 2 * kxy.mean()
        vals.append(mmd)
    return float(np.mean(vals))


def iter_image_dir(path: str, batch_size: int = 64) -> Iterable[np.ndarray]:
    """Yield (b, H, W, 3) uint8 batches from a directory of images."""
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    batch = []
    for f in files:
        batch.append(np.asarray(Image.open(f).convert("RGB"), np.uint8))
        if len(batch) == batch_size:
            yield np.stack(batch)
            batch = []
    if batch:
        yield np.stack(batch)


def extract_dir_features(path: str, extractor: Callable, batch_size: int = 64) -> np.ndarray:
    feats = [np.asarray(extractor(b)) for b in iter_image_dir(path, batch_size)]
    if not feats:
        raise ValueError(f"no images in {path}")
    return np.concatenate(feats, axis=0)


def eval_fid(
    real_dir: str,
    fake_dir: str,
    extractor: Optional[Callable] = None,
    kid: bool = False,
    batch_size: int = 64,
    require_reference: bool = False,
) -> dict:
    """Compute FID (and optionally KID) between two image directories
    (`eval_fid.py:36-57`).

    When the extractor is the random-projection surrogate (no InceptionV3
    weights available), the metric is reported as ``FID_surrogate`` — it is a
    relative tracking signal only, NOT comparable to published FID numbers.
    ``require_reference=True`` hard-fails in that case (use for the 50k/50k
    reference protocol, `exp/cips3d/configs/ffhq_exp.yaml:213-220`).
    """
    if extractor is None:
        extractor = default_extractor()
    name = getattr(extractor, "metric_name", "FID")
    if require_reference and name != "FID":
        raise RuntimeError(
            "reference-comparable FID requested but InceptionV3 weights are "
            "unavailable (set $CIPS3D_INCEPTION_WEIGHTS); refusing to report "
            "a surrogate metric as FID"
        )
    real = extract_dir_features(real_dir, extractor, batch_size)
    fake = extract_dir_features(fake_dir, extractor, batch_size)
    fid = frechet_distance(*activation_statistics(real), *activation_statistics(fake))
    out = {name: fid}
    if kid:
        out[name.replace("FID", "KID")] = kid_mmd(real, fake)
    return out


def default_extractor() -> Callable:
    """InceptionV3 pool3 features when the pretrained weights are available;
    otherwise a deterministic random-projection surrogate (relative tracking
    only — NOT comparable to published FID)."""
    from cips3d_tpu.eval import inception

    weights = inception.find_weights()
    if weights is not None:
        return inception.InceptionV3Features(weights)
    return surrogate_extractor()


import functools


@functools.lru_cache(maxsize=4)
def surrogate_extractor(dim: int = 256, seed: int = 0) -> Callable:
    """Deterministic random-CNN feature statistics (relative tracking only).
    Cached per (dim, seed) so the in-train eval reuses one jitted extractor
    instead of recompiling the conv stack every eval.

    Round 3 upgrade: the previous surrogate was a linear projection of
    32x32 pixels — blind to texture, so mode collapse in high-frequency
    content was invisible (round-2 VERDICT).  This one pushes 64x64 images
    through 4 fixed random 3x3 stride-2 conv stages (leaky-relu), collects
    per-channel mean+std at every scale (texture statistics), and projects
    to ``dim`` features with a fixed random matrix.  Random-weight conv
    features are a known serviceable FID proxy; the metric stays honestly
    labelled FID_surrogate and its SCALE is not comparable to published FID
    nor to pre-round-3 campaign logs (which used the pixel projection).
    """
    rng = np.random.default_rng(seed)
    widths = (32, 64, 128, 256)
    filters = []
    cin = 3
    for w in widths:
        f = rng.standard_normal((3, 3, cin, w)).astype(np.float32)
        filters.append(f * np.sqrt(2.0 / (9 * cin)))
        cin = w
    raw_dim = 2 * sum(widths)
    proj = rng.standard_normal((raw_dim, dim)).astype(np.float32) / np.sqrt(raw_dim)

    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def feats(x):  # (b, 64, 64, 3) f32 in [0, 1]
        stats = []
        h = x
        for f in filters:
            h = lax.conv_general_dilated(
                h, jnp.asarray(f), (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            h = jax.nn.leaky_relu(h, 0.2)
            stats.append(jnp.mean(h, axis=(1, 2)))
            stats.append(jnp.std(h, axis=(1, 2)))
        return jnp.concatenate(stats, axis=-1) @ jnp.asarray(proj)

    def extract(batch_u8: np.ndarray) -> np.ndarray:
        x = jnp.asarray(batch_u8.astype(np.float32) / 255.0)
        xr = jax.image.resize(x, (x.shape[0], 64, 64, 3), method="bilinear")
        return np.asarray(feats(xr))

    # metric produced with this extractor must never be mistaken for real FID
    extract.metric_name = "FID_surrogate"
    return extract
