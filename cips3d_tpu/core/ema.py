"""Generator EMA as a pytree lerp.

Counterpart of the reference's state-dict EMA wrapper
(`exp/comm/comm_model_utils.py:53-121`): the EMA copy is initialized to the
source parameters and *frozen* until ``start_itr`` (the reference's
``update()`` early-returns before that step); afterwards it decays with
``ema = ema * decay + source * (1 - decay)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(ema_params, params, step, decay: float = 0.999, start_itr: int = 1000):
    """One EMA step. ``step`` may be a traced scalar; jit-safe.

    Matches `EMA.update` (`comm_model_utils.py:97-117`): no-op before
    ``start_itr``, lerp with ``decay`` afterwards.
    """
    do_update = step >= start_itr

    def _lerp(e, p):
        new = e * decay + p.astype(e.dtype) * (1.0 - decay)
        return jnp.where(do_update, new, e)

    return jax.tree_util.tree_map(_lerp, ema_params, params)


def ema_copy(params):
    """Fresh EMA state = deep copy of source (`comm_model_utils.py:79-95`).

    Real buffer copies — the EMA tree must not alias the source (jit buffer
    donation rejects the same buffer appearing twice).
    """
    return jax.tree_util.tree_map(jnp.copy, params)
