"""Training state and optimizers.

Reference: `exp/cips3d/scripts/train.py:173-256` — Adam(betas=(0, 0.999),
wd=0), G lr 2e-4 / D lr 2e-3, grad-clip 10 with a NaN guard that zeroes the
gradients and continues (`train.py:420-435`), generator EMA (decay 0.999,
start_itr 1000).

The optimizer chain is torch-style: global-norm clip (coef = min(1,
max/(norm+1e-6))) happens *before* Adam; non-finite grads are replaced with
zeros so the step degenerates to a pure moment decay — the functional
equivalent of the reference's "zero grads, keep going" crash guard.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Hyperparameters of the adversarial loop
    (`exp/cips3d/configs/ffhq_exp.yaml:145-189`)."""

    img_size: int = 32
    batch_size: int = 4              # per-device
    batch_split: int = 1
    gen_lr: float = 2e-4
    disc_lr: float = 2e-3
    beta1: float = 0.0
    beta2: float = 0.999
    r1_lambda: float = 10.0
    d_reg_every: int = 1
    grad_clip: float = 10.0
    train_aux_img: bool = True
    update_aux_every: int = 1
    grad_points: Any = 256       # sqrt of the pixel cap (yaml `grad_points: 256`); None disables
    forward_points: Any = 256    # sqrt of the inference chunk size; None disables
    diffaug: bool = False
    warmup_d: bool = False
    fade_steps: int = 10000
    nerf_noise_disable: bool = False
    ema_decay: float = 0.999
    ema_start_itr: int = 1000
    total_iters: int = 200000
    z_dist: str = "gaussian"
    # Run the D-phase fake generation (stop-gradient, no backward) through
    # the fused ray-tile Pallas kernel regardless of the generator's
    # `fused_ray` training-path setting.  None = auto: on iff the generator
    # uses fast_sin — with the sin bound removed the kernel's fused forward
    # wins ~1.7x; with exact sin both paths are sin-bound and the kernel is
    # a wash (5.56 vs 5.39 ms at r64 scale, BENCH_NOTES round 3).
    fused_dphase: Any = None
    # Run the D-phase fake generation's INR decode through the fused
    # CIPS-INR Pallas kernel (ops/pallas/inr_tile.py — forward-only, which
    # is exactly what the stop-gradient D-phase forward needs).  On by
    # default since the round-4 clean A/B: r256 step 259.7 fused vs 274.2
    # XLA ms/step (-5.3%, docs/r3_campaign/r256_{dinr,base}.log) — the win
    # is the ~20 HBM round trips of the (pixels, 512) activation the XLA
    # chain pays; at r64 it is neutral (107.3 vs 107.1 imgs/s).  Silently
    # inert when `inr_pre_rgb_dim != 3` (kernel envelope, train/step.py).
    fused_dphase_inr: bool = True


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    ema_params: Any


def make_optimizers(cfg: TrainConfig) -> Tuple[optax.GradientTransformation, optax.GradientTransformation]:
    g_tx = optax.adam(cfg.gen_lr, b1=cfg.beta1, b2=cfg.beta2, eps=1e-8)
    d_tx = optax.adam(cfg.disc_lr, b1=cfg.beta1, b2=cfg.beta2, eps=1e-8)
    return g_tx, d_tx


def global_norm(grads) -> jnp.ndarray:
    return optax.global_norm(grads)


def clip_and_guard(grads, max_norm: float):
    """Torch-style clip_grad_norm_ + NaN guard.

    Returns (clipped grads, norm, is_finite).  Non-finite → zeros (the
    reference dumps a `*_crupted` checkpoint and zeroes grads,
    `train.py:420-435`; checkpoint dumping lives in the host loop).
    """
    norm = global_norm(grads)
    finite = jnp.isfinite(norm)
    coef = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    # select (not multiply): nan * 0 is still nan
    clipped = jax.tree_util.tree_map(
        lambda g: jnp.where(finite, g * coef, jnp.zeros_like(g)), grads
    )
    return clipped, norm, finite
