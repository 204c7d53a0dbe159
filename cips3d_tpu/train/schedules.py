"""Training schedules (traced-scalar friendly).

Reference: `exp/cips3d/scripts/train.py:324-338`.
"""

from __future__ import annotations

import jax.numpy as jnp


def nerf_noise_schedule(step, disable: bool = False):
    """max(0, 1 - step/5000) (`train.py:327`)."""
    if disable:
        return jnp.zeros(())
    return jnp.maximum(0.0, 1.0 - step / 5000.0)


def alpha_schedule(step, warmup_d: bool, fade_steps: int = 10000):
    """Progressive fade-in: min(1, step/fade_steps) when warmup_D
    (`train.py:330`)."""
    if not warmup_d:
        return jnp.ones(())
    return jnp.minimum(1.0, step / float(fade_steps))
