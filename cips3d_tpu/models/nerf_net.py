"""FiLM-SIREN NeRF backbone.

Counterpart of `NeRFNetwork` (`exp/cips3d/models/generator.py:151-377`):
UniformBoxWarp(0.24) → 2 FiLM-SIREN hidden layers → sigma linear;
color branch: FiLM-SIREN (hidden → hidden/2) → linear(kaiming-leaky) → rgb_dim
feature.  Style keys: ``{prefix}_w{i}`` per hidden layer, ``{prefix}_rgb`` for
the color FiLM (`generator.py:213-243`).

This MLP is the hot loop (B·H·W·2·S point evals per image); it is expressed
as dense matmuls over a flattened point axis so XLA tiles it straight onto the
MXU.  The fused ray-tile Pallas kernel (`cips3d_tpu.ops.pallas.ray_tile`)
subsumes this module's math for the hierarchical rendering path.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import flax.linen as nn
import jax.numpy as jnp

from cips3d_tpu.models import init as winit
from cips3d_tpu.models.layers import FiLMSineLayer, TorchLinear, uniform_box_warp


class NeRFNetwork(nn.Module):
    """Style-modulated SIREN with a sigma head and an rgb-feature head."""

    hidden_dim: int = 128
    hidden_layers: int = 2
    rgb_dim: int = 32
    box_sidelength: float = 0.24
    name_prefix: str = "nerf"
    fast_sin: bool = False   # polynomial sine for inference (ops/fast_sin.py)
    # color FiLM width; None → hidden_dim // 2 (the L variant uses hidden_dim,
    # `exp/comm/models/nerf_network.py:264-343` NeRFNetworkL)
    color_hidden_dim: Optional[int] = None
    dtype: Any = jnp.float32

    @property
    def style_dims(self) -> Dict[str, str]:
        """Names of the style vectors this network consumes."""
        keys = {f"{self.name_prefix}_w{i}" for i in range(self.hidden_layers)}
        keys.add(f"{self.name_prefix}_rgb")
        return keys

    @nn.compact
    def __call__(
        self, points: jnp.ndarray, style_dict: Mapping[str, jnp.ndarray], split: bool = False
    ) -> jnp.ndarray:
        """points (b, n, 3) → (b, n, rgb_dim + 1) feature+sigma.

        ``split=True`` returns ``(rgb, sigma)`` uncatenated instead — the hot
        path uses this to avoid materializing the (rgb_dim+1)-channel tensor,
        whose off-lane width forces layout-conversion copies on TPU (the
        concat + downstream re-slice profiled at ~20% of the r256 train
        step's copy time)."""
        x = uniform_box_warp(points.astype(self.dtype), self.box_sidelength)
        for i in range(self.hidden_layers):
            x = FiLMSineLayer(self.hidden_dim, fast_sin=self.fast_sin, dtype=self.dtype, name=f"film_{i}")(
                x, style_dict[f"{self.name_prefix}_w{i}"].astype(self.dtype)
            )
        sigma = TorchLinear(1, dtype=self.dtype, name="sigma")(x)

        color_dim = self.color_hidden_dim if self.color_hidden_dim is not None else self.hidden_dim // 2
        c = FiLMSineLayer(color_dim, fast_sin=self.fast_sin, dtype=self.dtype, name="color_film")(
            x, style_dict[f"{self.name_prefix}_rgb"].astype(self.dtype)
        )
        rgb = TorchLinear(
            self.rgb_dim, kernel_init=winit.kaiming_leaky_kernel, dtype=self.dtype, name="color_linear"
        )(c)
        if split:
            return rgb, sigma
        return jnp.concatenate([rgb, sigma], axis=-1)
