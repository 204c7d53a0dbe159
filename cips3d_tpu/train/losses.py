"""GAN losses: non-saturating logistic + R1 gradient penalty.

Reference: `exp/cips3d/scripts/train.py:387-409,465` — softplus logistic
losses; R1 = 0.5 * r1_lambda * d_reg_every * sum(grad^2) per sample, computed
by differentiating D w.r.t. the real images.  In JAX the double-backward
(penalty grads w.r.t. D's params) falls out of composing `jax.grad`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def d_logistic_loss(real_logits: jnp.ndarray, fake_logits: jnp.ndarray) -> jnp.ndarray:
    """softplus(D(fake)) + softplus(-D(real)), summed per-sample
    (`train.py:407-409`)."""
    return jax.nn.softplus(fake_logits) + jax.nn.softplus(-real_logits)


def g_nonsaturating_loss(fake_logits: jnp.ndarray) -> jnp.ndarray:
    """softplus(-D(G(z))) (`train.py:465`)."""
    return jax.nn.softplus(-fake_logits)


def r1_penalty(d_fn, real_imgs: jnp.ndarray, r1_lambda: float, d_reg_every: int = 1):
    """Per-sample R1 penalty (`train.py:387-401`).

    Args:
      d_fn: real_imgs -> logits (params closed over; differentiation w.r.t.
            params happens in the enclosing loss).
      real_imgs: (b, 3, h, w).

    Returns (penalty (b, 1), real_logits (b, 1)).
    """

    def _sum_logits(x):
        logits = d_fn(x)
        return jnp.sum(logits), logits

    grad_real, real_logits = jax.grad(_sum_logits, has_aux=True)(real_imgs)
    grad_sq = jnp.sum(jnp.square(grad_real.astype(jnp.float32)), axis=(1, 2, 3), keepdims=False)
    penalty = 0.5 * r1_lambda * d_reg_every * grad_sq[:, None] + 0.0 * real_logits
    return penalty, real_logits
