"""Multi-head style mapping network.

Counterpart of `exp/cips3d/models/multi_head_mapping.py:28-153`:
PixelNorm → ``base_layers`` x [Linear(kaiming-leaky) (+LayerNorm if add_norm)
→ LeakyReLU(0.2)] → per-head FC stacks (Identity when ``head_layers == 0``).
The last base layer gets an activation only when head layers exist; with
``norm_out`` and no heads an extra LayerNorm caps the base net.

In the flagship FFHQ config both mapping nets use ``head_layers: 0``
(`exp/cips3d/configs/ffhq_exp.yaml:62-81`), so every head shares the same
base feature.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import flax.linen as nn
import jax.numpy as jnp

from cips3d_tpu.models import init as winit
from cips3d_tpu.models.layers import EqualLinear, PixelNorm, TorchLinear


class MultiHeadMappingNetwork(nn.Module):
    """z → {head_name: style vector}."""

    hidden_dim: int
    base_layers: int
    head_layers: int
    head_dim_dict: Mapping[str, int]
    add_norm: bool = False
    norm_out: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        x = PixelNorm()(z.astype(self.dtype))
        for i in range(self.base_layers):
            x = TorchLinear(
                self.hidden_dim,
                kernel_init=winit.kaiming_leaky_kernel,
                dtype=self.dtype,
                name=f"base_{i}",
            )(x)
            if self.head_layers > 0 or i != self.base_layers - 1:
                if self.add_norm:
                    x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"base_norm_{i}")(x)
                x = nn.leaky_relu(x, 0.2)
        if self.base_layers > 0 and self.norm_out and self.head_layers <= 0:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_out")(x)

        out: Dict[str, jnp.ndarray] = {}
        for name, head_dim in self.head_dim_dict.items():
            if self.head_layers <= 0:
                out[name] = x
                continue
            h = x
            for i in range(self.head_layers):
                feat = head_dim if i == self.head_layers - 1 else self.hidden_dim
                h = TorchLinear(
                    feat,
                    kernel_init=winit.kaiming_leaky_kernel,
                    dtype=self.dtype,
                    name=f"head_{name}_{i}",
                )(h)
                if i != self.head_layers - 1:
                    h = nn.leaky_relu(h, 0.2)
                elif self.norm_out:
                    h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"head_norm_{name}")(h)
            out[name] = h
        return out


class MultiHeadMappingNetworkEqualLR(nn.Module):
    """Equalized-lr mapping variant (`exp/comm/models/multi_head_mapping.py:172-284`
    MultiHeadMappingNetwork_EqualLR): PixelNorm → base EqualLinear stack
    (lr_mul=``lr_mlp``, forward-scale override ``scale`` on base layers) →
    per-head EqualLinear stacks.  No LayerNorm options.

    With ``base_layers == 0`` the reference consumes one z per head
    (``z[idx]`` indexed, each pixel-normed); here z must then carry a leading
    axis of len(head_dim_dict)."""

    hidden_dim: int
    base_layers: int
    head_layers: int
    head_dim_dict: Mapping[str, int]
    lr_mlp: float = 1.0
    scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        if self.base_layers > 0:
            x = PixelNorm()(z.astype(self.dtype))
            for i in range(self.base_layers):
                # the reference forwards `scale` verbatim: its default 1.0
                # OVERRIDES EqualLinear's 1/sqrt(in)·lr_mul forward scale
                # (`multi_head_mapping.py:200-204`, `mod_conv_fc.py:319-322`)
                x = EqualLinear(
                    self.hidden_dim,
                    lr_mul=self.lr_mlp,
                    scale=self.scale,
                    dtype=self.dtype,
                    name=f"base_{i}",
                )(x)
                if self.head_layers > 0 or i != self.base_layers - 1:
                    x = nn.leaky_relu(x, 0.2)
            head_inputs = {name: x for name in self.head_dim_dict}
        else:
            # one z per head (`multi_head_mapping.py:273-276`)
            head_inputs = {
                name: PixelNorm()(z[idx].astype(self.dtype))
                for idx, name in enumerate(self.head_dim_dict)
            }

        out: Dict[str, jnp.ndarray] = {}
        for name, head_dim in self.head_dim_dict.items():
            h = head_inputs[name]
            for i in range(self.head_layers):
                feat = head_dim if i == self.head_layers - 1 else self.hidden_dim
                h = EqualLinear(
                    feat, lr_mul=self.lr_mlp, dtype=self.dtype, name=f"head_{name}_{i}"
                )(h)
                if i != self.head_layers - 1:
                    h = nn.leaky_relu(h, 0.2)
            out[name] = h
        return out
