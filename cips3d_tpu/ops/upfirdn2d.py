"""upfirdn2d — fused upsample → FIR filter → downsample, XLA-native.

TPU replacement for the reference CUDA kernel
(`exp/comm/op/upfirdn2d_kernel.cu`, wrapper `exp/comm/op/upfirdn2d.py`).  The
behavioral spec is the reference's pure-torch fallback `upfirdn2d_native`
(`exp/comm/op/upfirdn2d.py:152-186`): zero-stuff by ``up``, pad (possibly
negative), correlate with the flipped kernel, then stride-``down`` subsample.

On TPU one `lax.conv_general_dilated` expresses the whole thing: ``up`` is
``lhs_dilation``, ``down`` is ``window_strides``, and the (possibly negative)
padding goes into the conv padding config.  XLA lowers this to an MXU conv and
it is differentiable to any order — the reference needed a hand-written
double-backward (`upfirdn2d.py:18-141`) because R1 differentiates through the
discriminator's blur stack; here `jax.grad(jax.grad(...))` just works.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np
from jax import lax


def make_kernel(k: Union[Sequence[float], jnp.ndarray]) -> np.ndarray:
    """Build a normalized 2D FIR kernel from a 1D or 2D spec
    (`exp/cips3d/models/discriminator.py:57-65`).

    Returns a CONCRETE numpy array: FIR specs are static config, and keeping
    them concrete lets `upfirdn2d` pick the banded-matmul lowering (below).
    """
    k = np.asarray(k, np.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    k = k / np.sum(k)
    return k


def upfirdn2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up: int = 1,
    down: int = 1,
    pad: Tuple[int, int] = (0, 0),
    data_format: str = "NCHW",
) -> jnp.ndarray:
    """Apply upfirdn to an NCHW (or NHWC) tensor.

    Matches `upfirdn2d(input, kernel, up, down, pad)` from
    `exp/comm/op/upfirdn2d.py:144-149` (same pad on both axes).

    Output spatial size: ``(in * up + pad0 + pad1 - kh) // down + 1``.
    """
    return upfirdn2d_general(
        x, kernel, up, up, down, down, pad[0], pad[1], pad[0], pad[1],
        data_format=data_format,
    )


def upfirdn2d_general(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up_x: int,
    up_y: int,
    down_x: int,
    down_y: int,
    pad_x0: int,
    pad_x1: int,
    pad_y0: int,
    pad_y1: int,
    data_format: str = "NCHW",
) -> jnp.ndarray:
    """General form (spec: `upfirdn2d_native`, `exp/comm/op/upfirdn2d.py:152-186`).

    x: (N, C, H, W) or (N, H, W, C); kernel: (kh, kw) applied depthwise.
    """
    nhwc = data_format == "NHWC"
    if nhwc:
        n, h, w, c = x.shape
    else:
        n, c, h, w = x.shape
    kh, kw = kernel.shape

    # Fast path: the FIR spec is concrete and separable (every blur in the
    # model is outer(k1d, k1d)), so each axis is a small banded matrix and
    # the whole upfirdn becomes two dense matmuls — MXU-friendly, unlike a
    # C=1 convolution whose 1-wide contraction profiled ~10x off bandwidth
    # on TPU (round-2 trace).  Differentiable to any order for free.
    if isinstance(kernel, np.ndarray):
        u, s, vt = np.linalg.svd(kernel)
        if s[0] > 0 and (s[1:].max(initial=0.0) < 1e-6 * s[0]):
            ky = tuple((u[:, 0] * s[0]).tolist())
            kx = tuple(vt[0].tolist())
            my = _axis_matrix(h, ky, up_y, down_y, pad_y0, pad_y1)
            mx = _axis_matrix(w, kx, up_x, down_x, pad_x0, pad_x1)
            if nhwc:
                t = jnp.einsum(
                    "oh,nhwc->nowc", jnp.asarray(my, x.dtype), x,
                    preferred_element_type=jnp.float32,
                )
                out = jnp.einsum(
                    "nowc,pw->nopc", t.astype(x.dtype), jnp.asarray(mx, x.dtype),
                    preferred_element_type=jnp.float32,
                )
                return out.astype(x.dtype)
            t = jnp.einsum(
                "oh,nchw->ncow", jnp.asarray(my, x.dtype), x,
                preferred_element_type=jnp.float32,
            )
            out = jnp.einsum(
                "ncow,pw->ncop", t.astype(x.dtype), jnp.asarray(mx, x.dtype),
                preferred_element_type=jnp.float32,
            )
            return out.astype(x.dtype)

    if nhwc:  # non-separable NHWC: route through the NCHW conv path
        y = upfirdn2d_general(
            x.transpose(0, 3, 1, 2), kernel, up_x, up_y, down_x, down_y,
            pad_x0, pad_x1, pad_y0, pad_y1,
        )
        return y.transpose(0, 2, 3, 1)

    kernel = jnp.asarray(kernel, x.dtype)
    # Single-channel conv on (N*C, 1, H, W): the same FIR filter applies to
    # every channel, and folding channels into the batch avoids grouped
    # convolution (feature_group_count=C compiles poorly on some backends and
    # buys nothing here — the filter is shared).
    rhs = jnp.flip(kernel, (0, 1))[None, None]  # (1, 1, kh, kw)

    # XLA lhs_dilation inserts zeros only *between* elements (length
    # in*up - (up-1)); the spec zero-stuffs to in*up (trailing zeros), so the
    # missing up-1 zeros go into the high-side padding.
    out = lax.conv_general_dilated(
        x.reshape(n * c, 1, h, w),
        rhs,
        window_strides=(down_y, down_x),
        padding=((pad_y0, pad_y1 + up_y - 1), (pad_x0, pad_x1 + up_x - 1)),
        lhs_dilation=(up_y, up_x),
        rhs_dilation=(1, 1),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out.reshape(n, c, out.shape[2], out.shape[3])


@functools.lru_cache(maxsize=None)
def _axis_matrix(
    in_size: int, k1d: Tuple[float, ...], up: int, down: int, pad0: int, pad1: int
) -> np.ndarray:
    """(out, in) matrix of the 1-D upfirdn: zero-stuff by ``up`` (to in*up,
    trailing zeros included), pad, correlate with the flipped taps, stride by
    ``down`` — the `upfirdn2d_native` spec per axis."""
    ktap = len(k1d)
    kflip = k1d[::-1]
    out_size = (in_size * up + pad0 + pad1 - ktap) // down + 1
    m = np.zeros((out_size, in_size), np.float32)
    for o in range(out_size):
        for t in range(ktap):
            j = o * down + t - pad0
            if j < 0 or j >= in_size * up or j % up:
                continue
            m[o, j // up] += kflip[t]
    return m


def blur_pad_down(kernel_1d: Sequence[float], kernel_size: int, factor: int = 2) -> Tuple[int, int]:
    """Padding used before a stride-2 conv (`discriminator.py:153-158`)."""
    p = (len(kernel_1d) - factor) + (kernel_size - 1)
    return ((p + 1) // 2, p // 2)


def blur_pad_up(kernel_1d: Sequence[float], kernel_size: int, factor: int = 2) -> Tuple[int, int]:
    """Padding used after a stride-2 transposed conv (`discriminator.py:176-179`)."""
    p = (len(kernel_1d) - factor) - (kernel_size - 1)
    return ((p + 1) // 2 + factor - 1, p // 2 + 1)
