"""Range-reduced polynomial sine for the SIREN hot path.

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

**Internals always run in float32** regardless of the input dtype.  In a
bf16 compute path the reduction `y - round(y)` would otherwise quantize the
reduced argument to y's ULP (~0.03 at |y|≈16 → sine error up to 0.2 — a
1000x blowup over the polynomial's own error, measured round 4; this, not
the polynomial, caused the round-2 "fast_sin trains ~10% worse" A/B result).
With f32 internals the bf16-input error is 2.0e-3, identical to
`jnp.sin` on the same bf16 argument (tests/test_fast_sin.py), so the
approximation is gradient-quality safe for training as well as serving
(docs/sin_ab/REPORT.md round-4 addendum).

Used by `GeneratorConfig.fast_sin` and `ops/pallas/ray_tile.py` (whose
activations are already f32 in-kernel, so the upcast is a no-op there).
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

_F32 = jnp.float32


def fast_sin(x: jnp.ndarray) -> jnp.ndarray:
    """Approximate elementwise sine (see module docstring for error bounds).

    Computed in float32 internally; the result is cast back to ``x.dtype``.
    """
    y = x.astype(_F32) * _F32(_INV_2PI)
    r = y - jnp.round(y)
    r2 = r * r
    p = _F32(_C9)
    p = p * r2 + _F32(_C7)
    p = p * r2 + _F32(_C5)
    p = p * r2 + _F32(_C3)
    p = p * r2 + _F32(_C1)
    return (r * p).astype(x.dtype)


def fast_sin_grad(x: jnp.ndarray) -> jnp.ndarray:
    """d fast_sin / dx — the derivative of the polynomial itself (what
    jax.grad produces for `fast_sin`, NOT cos): with r = frac-reduced
    argument, fast_sin = r·p(r²), so
    d/dx = (1/2π)·(p(r²) + 2r²·p'(r²)).  Used by the fused ray-tile
    kernel's hand-written backward (ops/pallas/ray_tile.py) so its grads
    match autodiff of the fast_sin XLA path.  f32 internals, like
    `fast_sin`."""
    y = x.astype(_F32) * _F32(_INV_2PI)
    r = y - jnp.round(y)
    r2 = r * r
    p = _F32(_C9)
    p = p * r2 + _F32(_C7)
    p = p * r2 + _F32(_C5)
    p = p * r2 + _F32(_C3)
    p = p * r2 + _F32(_C1)
    dp = 4.0 * _F32(_C9)
    dp = dp * r2 + 3.0 * _F32(_C7)
    dp = dp * r2 + 2.0 * _F32(_C5)
    dp = dp * r2 + _F32(_C3)
    return (_F32(_INV_2PI) * (p + 2.0 * r2 * dp)).astype(x.dtype)
