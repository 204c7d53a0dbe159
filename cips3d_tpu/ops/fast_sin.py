"""Range-reduced polynomial sine for SIREN inference.

The SIREN point MLP is sin-throughput bound on TPU (round-1 profiling:
~1e9 sin evals per r256 forward at ~25G sin/s saturates the VPU; tiling and
dtype don't move it).  XLA's `sin` pays for full-range argument reduction and
fp32 ULP accuracy; SIREN arguments are small (|gain*h + bias| ≲ 100) and the
consumer is an 8-bit image, so a cheap Cody-Waite-style reduction plus a
short odd polynomial is sufficient:

    y = x / 2pi;  r = y - round(y)  in [-0.5, 0.5];  sin(x) = P(r)

P is a least-squares odd polynomial of degree 9 on [-0.5, 0.5] with max
absolute error 1.7e-5 — far below one 8-bit quantization level (3.9e-3).
About 9 VPU ops per element vs the several dozen of the full-accuracy sin.

Used by the inference paths (`GeneratorConfig.fast_sin`,
`ops/pallas/ray_tile.py`); training keeps exact `jnp.sin`
(docs/sin_ab/REPORT.md: fast_sin converges ~10% worse at r64).
"""

from __future__ import annotations

import jax.numpy as jnp

_INV_2PI = 0.15915494309189535
# lstsq fit of sin(2*pi*r) on r in [-0.5, 0.5], odd powers 1..9 (see module
# docstring; max abs err 1.72e-5)
_C1 = 6.283088463027395
_C3 = -41.33324754221887
_C5 = 81.40008976706686
_C7 = -74.67588386951022
_C9 = 33.16809461334938


def fast_sin(x: jnp.ndarray) -> jnp.ndarray:
    """Approximate elementwise sine (see module docstring for error bounds)."""
    y = x * jnp.asarray(_INV_2PI, x.dtype)
    r = y - jnp.round(y)
    r2 = r * r
    p = jnp.asarray(_C9, x.dtype)
    p = p * r2 + jnp.asarray(_C7, x.dtype)
    p = p * r2 + jnp.asarray(_C5, x.dtype)
    p = p * r2 + jnp.asarray(_C3, x.dtype)
    p = p * r2 + jnp.asarray(_C1, x.dtype)
    return r * p


def fast_sin_grad(x: jnp.ndarray) -> jnp.ndarray:
    """d fast_sin / dx — the derivative of the polynomial itself (what
    jax.grad produces for `fast_sin`, NOT cos): with r = frac-reduced
    argument, fast_sin = r·p(r²), so
    d/dx = (1/2π)·(p(r²) + 2r²·p'(r²)).  Used by the fused ray-tile
    kernel's hand-written backward (ops/pallas/ray_tile.py) so its grads
    match autodiff of the fast_sin XLA path."""
    y = x * jnp.asarray(_INV_2PI, x.dtype)
    r = y - jnp.round(y)
    r2 = r * r
    p = jnp.asarray(_C9, x.dtype)
    p = p * r2 + jnp.asarray(_C7, x.dtype)
    p = p * r2 + jnp.asarray(_C5, x.dtype)
    p = p * r2 + jnp.asarray(_C3, x.dtype)
    p = p * r2 + jnp.asarray(_C1, x.dtype)
    dp = 4.0 * jnp.asarray(_C9, x.dtype)
    dp = dp * r2 + 3.0 * jnp.asarray(_C7, x.dtype)
    dp = dp * r2 + 2.0 * jnp.asarray(_C5, x.dtype)
    dp = dp * r2 + jnp.asarray(_C3, x.dtype)
    return jnp.asarray(_INV_2PI, x.dtype) * (p + 2.0 * r2 * dp)
