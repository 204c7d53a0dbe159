"""FID InceptionV3 feature extractor (JAX).

The reference computes FID with torch-fidelity's InceptionV3
(`weights-inception-2015-12-05`, wired at
`exp/cips3d/configs/ffhq_exp.yaml:16-20` and `exp/cips3d/scripts/eval_fid.py:36-57`).
This module implements that network's *FID variant* architecture in JAX
(BasicConv2d = conv(no bias) + BN(eps=1e-3) + relu; Mixed_5b..7c blocks; the
TF-ported variant's pooling quirks in 7b/7c), plus a converter from the torch
checkpoint's state dict.

Reference-comparable FID numbers require the pretrained weights file; this
zero-egress build environment has none, so `find_weights()` returns None and
callers fall back to `cips3d_tpu.eval.fid.surrogate_extractor`.  Point
``$CIPS3D_INCEPTION_WEIGHTS`` at the .pth to enable the real extractor.
"""

from __future__ import annotations

import glob
import os
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def find_weights() -> Optional[str]:
    env = os.environ.get("CIPS3D_INCEPTION_WEIGHTS")
    if env and os.path.exists(env):
        return env
    patterns = [
        os.path.expanduser("~/.cache/torch/hub/checkpoints/weights-inception-2015-12-05*.pth"),
        "cache_pretrained/weights-inception-2015-12-05*.pth",
        os.path.expanduser("~/.cache/torch/hub/checkpoints/pt_inception*.pth"),
    ]
    for p in patterns:
        hits = sorted(glob.glob(p))
        if hits:
            return hits[0]
    return None


# --------------------------------------------------------------------- #
# functional blocks — params are nested dicts {conv: (O,I,kh,kw), bn_*: (C,)}


def basic_conv(p: Dict, x: jnp.ndarray, stride=1, padding=0) -> jnp.ndarray:
    """conv(no bias) → BN(eps=1e-3, inference) → relu."""
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), padding, dimension_numbers=("NCHW", "OIHW", "NCHW")
    )
    scale = p["bn_g"] * jax.lax.rsqrt(p["bn_v"] + 1e-3)
    y = y * scale[None, :, None, None] + (p["bn_b"] - p["bn_m"] * scale)[None, :, None, None]
    return jax.nn.relu(y)


def _avg_pool(x, k=3, s=1, pad=1, count_include_pad=True):
    win = (1, 1, k, k)
    strides = (1, 1, s, s)
    pads = ((0, 0), (0, 0), (pad, pad), (pad, pad))
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, win, strides, pads)
    if count_include_pad:
        return summed / (k * k)
    ones = jnp.ones_like(x)
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, win, strides, pads)
    return summed / counts


def _max_pool(x, k=3, s=2, pad=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, s, s),
        ((0, 0), (0, 0), (pad, pad), (pad, pad)),
    )


def inception_a(p, x):
    b1 = basic_conv(p["branch1x1"], x)
    b5 = basic_conv(p["branch5x5_1"], x)
    b5 = basic_conv(p["branch5x5_2"], b5, padding=2)
    b3 = basic_conv(p["branch3x3dbl_1"], x)
    b3 = basic_conv(p["branch3x3dbl_2"], b3, padding=1)
    b3 = basic_conv(p["branch3x3dbl_3"], b3, padding=1)
    # FID variant: count_include_pad=False in the A-blocks' avg pool
    bp = basic_conv(p["branch_pool"], _avg_pool(x, count_include_pad=False))
    return jnp.concatenate([b1, b5, b3, bp], axis=1)


def inception_b(p, x):
    b3 = basic_conv(p["branch3x3"], x, stride=2)
    bd = basic_conv(p["branch3x3dbl_1"], x)
    bd = basic_conv(p["branch3x3dbl_2"], bd, padding=1)
    bd = basic_conv(p["branch3x3dbl_3"], bd, stride=2)
    bp = _max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=1)


def inception_c(p, x):
    b1 = basic_conv(p["branch1x1"], x)
    b7 = basic_conv(p["branch7x7_1"], x)
    b7 = basic_conv(p["branch7x7_2"], b7, padding=((0, 0), (3, 3)))
    b7 = basic_conv(p["branch7x7_3"], b7, padding=((3, 3), (0, 0)))
    bd = basic_conv(p["branch7x7dbl_1"], x)
    bd = basic_conv(p["branch7x7dbl_2"], bd, padding=((3, 3), (0, 0)))
    bd = basic_conv(p["branch7x7dbl_3"], bd, padding=((0, 0), (3, 3)))
    bd = basic_conv(p["branch7x7dbl_4"], bd, padding=((3, 3), (0, 0)))
    bd = basic_conv(p["branch7x7dbl_5"], bd, padding=((0, 0), (3, 3)))
    bp = basic_conv(p["branch_pool"], _avg_pool(x, count_include_pad=False))
    return jnp.concatenate([b1, b7, bd, bp], axis=1)


def inception_d(p, x):
    b3 = basic_conv(p["branch3x3_1"], x)
    b3 = basic_conv(p["branch3x3_2"], b3, stride=2)
    b7 = basic_conv(p["branch7x7x3_1"], x)
    b7 = basic_conv(p["branch7x7x3_2"], b7, padding=((0, 0), (3, 3)))
    b7 = basic_conv(p["branch7x7x3_3"], b7, padding=((3, 3), (0, 0)))
    b7 = basic_conv(p["branch7x7x3_4"], b7, stride=2)
    bp = _max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=1)


def inception_e(p, x, pool: str):
    """pool='avg' for Mixed_7b (E_1), 'max' for Mixed_7c (E_2) — the
    TF-ported FID variant's quirk."""
    b1 = basic_conv(p["branch1x1"], x)
    b3 = basic_conv(p["branch3x3_1"], x)
    b3a = basic_conv(p["branch3x3_2a"], b3, padding=((0, 0), (1, 1)))
    b3b = basic_conv(p["branch3x3_2b"], b3, padding=((1, 1), (0, 0)))
    b3 = jnp.concatenate([b3a, b3b], axis=1)
    bd = basic_conv(p["branch3x3dbl_1"], x)
    bd = basic_conv(p["branch3x3dbl_2"], bd, padding=1)
    bda = basic_conv(p["branch3x3dbl_3a"], bd, padding=((0, 0), (1, 1)))
    bdb = basic_conv(p["branch3x3dbl_3b"], bd, padding=((1, 1), (0, 0)))
    bd = jnp.concatenate([bda, bdb], axis=1)
    if pool == "avg":
        bp = _avg_pool(x, count_include_pad=False)
    else:
        bp = _max_pool(x, k=3, s=1, pad=1)
    bp = basic_conv(p["branch_pool"], bp)
    return jnp.concatenate([b1, b3, bd, bp], axis=1)


def inception_forward(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """(n, 3, 299, 299) in [-1, 1] → (n, 2048) pool3 features."""
    x = basic_conv(params["Conv2d_1a_3x3"], x, stride=2)
    x = basic_conv(params["Conv2d_2a_3x3"], x)
    x = basic_conv(params["Conv2d_2b_3x3"], x, padding=1)
    x = _max_pool(x)
    x = basic_conv(params["Conv2d_3b_1x1"], x)
    x = basic_conv(params["Conv2d_4a_3x3"], x)
    x = _max_pool(x)
    x = inception_a(params["Mixed_5b"], x)
    x = inception_a(params["Mixed_5c"], x)
    x = inception_a(params["Mixed_5d"], x)
    x = inception_b(params["Mixed_6a"], x)
    x = inception_c(params["Mixed_6b"], x)
    x = inception_c(params["Mixed_6c"], x)
    x = inception_c(params["Mixed_6d"], x)
    x = inception_c(params["Mixed_6e"], x)
    x = inception_d(params["Mixed_7a"], x)
    x = inception_e(params["Mixed_7b"], x, pool="avg")
    x = inception_e(params["Mixed_7c"], x, pool="max")
    x = jnp.mean(x, axis=(2, 3))  # global average pool → (n, 2048)
    return x


# --------------------------------------------------------------------- #
# weight conversion


def load_torch_state_dict(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


def convert_inception_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """torchvision/torch-fidelity InceptionV3 state dict → nested params."""
    out: Dict = {}
    names = {k.split(".")[0] for k in sd if "." in k}
    for mod in names:
        if mod.startswith(("fc", "AuxLogits")):
            continue
        if mod.startswith("Conv2d"):
            out[mod] = _conv_params(sd, mod)
        elif mod.startswith("Mixed"):
            branches = {k.split(".")[1] for k in sd if k.startswith(mod + ".")}
            out[mod] = {b: _conv_params(sd, f"{mod}.{b}") for b in branches}
    return out


def _conv_params(sd, prefix):
    return {
        "w": jnp.asarray(sd[f"{prefix}.conv.weight"]),
        "bn_g": jnp.asarray(sd[f"{prefix}.bn.weight"]),
        "bn_b": jnp.asarray(sd[f"{prefix}.bn.bias"]),
        "bn_m": jnp.asarray(sd[f"{prefix}.bn.running_mean"]),
        "bn_v": jnp.asarray(sd[f"{prefix}.bn.running_var"]),
    }


# --------------------------------------------------------------------- #
# random init (structural tests / smoke use only)

_INCEPTION_SPEC = None


def random_params(key) -> Dict:
    """Randomly-initialized params with the correct shapes (for structural
    tests; NOT a trained network)."""
    counter = [0]

    def conv(i, o, kh, kw=None):
        kw = kw or kh
        counter[0] += 1
        k = jax.random.fold_in(key, counter[0])
        return {
            "w": jax.random.normal(k, (o, i, kh, kw)) * 0.05,
            "bn_g": jnp.ones(o), "bn_b": jnp.zeros(o),
            "bn_m": jnp.zeros(o), "bn_v": jnp.ones(o),
        }

    def block_a(in_ch, pool_ch):
        return {
            "branch1x1": conv(in_ch, 64, 1),
            "branch5x5_1": conv(in_ch, 48, 1), "branch5x5_2": conv(48, 64, 5),
            "branch3x3dbl_1": conv(in_ch, 64, 1), "branch3x3dbl_2": conv(64, 96, 3),
            "branch3x3dbl_3": conv(96, 96, 3),
            "branch_pool": conv(in_ch, pool_ch, 1),
        }

    def block_c(in_ch, c7):
        return {
            "branch1x1": conv(in_ch, 192, 1),
            "branch7x7_1": conv(in_ch, c7, 1), "branch7x7_2": conv(c7, c7, 1, 7),
            "branch7x7_3": conv(c7, 192, 7, 1),
            "branch7x7dbl_1": conv(in_ch, c7, 1), "branch7x7dbl_2": conv(c7, c7, 7, 1),
            "branch7x7dbl_3": conv(c7, c7, 1, 7), "branch7x7dbl_4": conv(c7, c7, 7, 1),
            "branch7x7dbl_5": conv(c7, 192, 1, 7),
            "branch_pool": conv(in_ch, 192, 1),
        }

    def block_e(in_ch):
        return {
            "branch1x1": conv(in_ch, 320, 1),
            "branch3x3_1": conv(in_ch, 384, 1),
            "branch3x3_2a": conv(384, 384, 1, 3), "branch3x3_2b": conv(384, 384, 3, 1),
            "branch3x3dbl_1": conv(in_ch, 448, 1), "branch3x3dbl_2": conv(448, 384, 3),
            "branch3x3dbl_3a": conv(384, 384, 1, 3), "branch3x3dbl_3b": conv(384, 384, 3, 1),
            "branch_pool": conv(in_ch, 192, 1),
        }

    return {
        "Conv2d_1a_3x3": conv(3, 32, 3),
        "Conv2d_2a_3x3": conv(32, 32, 3),
        "Conv2d_2b_3x3": conv(32, 64, 3),
        "Conv2d_3b_1x1": conv(64, 80, 1),
        "Conv2d_4a_3x3": conv(80, 192, 3),
        "Mixed_5b": block_a(192, 32),
        "Mixed_5c": block_a(256, 64),
        "Mixed_5d": block_a(288, 64),
        "Mixed_6a": {
            "branch3x3": conv(288, 384, 3),
            "branch3x3dbl_1": conv(288, 64, 1), "branch3x3dbl_2": conv(64, 96, 3),
            "branch3x3dbl_3": conv(96, 96, 3),
        },
        "Mixed_6b": block_c(768, 128),
        "Mixed_6c": block_c(768, 160),
        "Mixed_6d": block_c(768, 160),
        "Mixed_6e": block_c(768, 192),
        "Mixed_7a": {
            "branch3x3_1": conv(768, 192, 1), "branch3x3_2": conv(192, 320, 3),
            "branch7x7x3_1": conv(768, 192, 1), "branch7x7x3_2": conv(192, 192, 1, 7),
            "branch7x7x3_3": conv(192, 192, 7, 1), "branch7x7x3_4": conv(192, 192, 3),
        },
        "Mixed_7b": block_e(1280),
        "Mixed_7c": block_e(2048),
    }


def tf1x_resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) interpolation matrix reproducing TF1's
    ``tf.image.resize_bilinear(align_corners=False)`` — the resize
    torch-fidelity uses (``interpolate_bilinear_2d_like_tensorflow1x``):
    src = dst * in/out (asymmetric, NOT half-pixel), floor + lerp, edge clamp.
    Bilinear resize is separable, so one matrix per spatial axis suffices.
    """
    m = np.zeros((out_size, in_size), np.float32)
    scale = in_size / out_size
    for i in range(out_size):
        src = i * scale
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        frac = src - lo
        m[i, lo] += 1.0 - frac
        m[i, hi] += frac
    return m


def tf1x_resize(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """TF1-style bilinear resize of (n, h, w, c) along the spatial axes."""
    mh = jnp.asarray(tf1x_resize_matrix(x.shape[1], out_h))
    mw = jnp.asarray(tf1x_resize_matrix(x.shape[2], out_w))
    return jnp.einsum("oh,nhwc,pw->nopc", mh, x, mw)


class InceptionV3Features:
    """Callable (n, H, W, 3) uint8 → (n, 2048) pool3 features.

    Preprocessing matches torch-fidelity's FeatureExtractorInceptionV3:
    float32 → TF1-style bilinear resize to 299×299 → (x - 128) / 128.
    """

    def __init__(self, weights_path: Optional[str] = None, params: Optional[Dict] = None,
                 batch_jit: bool = True):
        if params is None:
            if weights_path is None or not os.path.exists(weights_path):
                raise FileNotFoundError(weights_path)
            params = convert_inception_state_dict(load_torch_state_dict(weights_path))
        self.params = params
        self._fn = jax.jit(inception_forward) if batch_jit else inception_forward

    def __call__(self, batch_u8: np.ndarray) -> np.ndarray:
        x = jnp.asarray(batch_u8, jnp.float32)
        x = tf1x_resize(x, 299, 299)
        x = (x - 128.0) / 128.0
        x = x.transpose(0, 3, 1, 2)
        return np.asarray(self._fn(self.params, x))
