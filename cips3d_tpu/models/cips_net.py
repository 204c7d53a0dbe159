"""CIPS-style per-pixel INR decoder.

Counterpart of `CIPSNet` (`exp/cips3d/models/generator.py:1009-1155`):
nine `SinBlock`s keyed "4".."1024", all at ``hidden_dim``; each block is two
(SinStyleMod + LeakyReLU) stages with a residual skip from block index >= 4;
a per-block ToRGB (frequency_init(100)) accumulates RGB from index >= 3; the
loop early-exits at ``img_size`` (progressive growth for free,
`generator.py:1146-1147`); final optional Linear + Tanh.

Style keys: ``{prefix}_w{res}_0`` / ``{prefix}_w{res}_1`` per block.
"""

from __future__ import annotations

from typing import Any, Mapping, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from cips3d_tpu.models import init as winit
from cips3d_tpu.models.layers import SinStyleMod, ToRGB, TorchLinear

#: resolutions covered by the decoder blocks (`generator.py:1044-1054`)
CIPS_RESOLUTIONS: Tuple[str, ...] = ("4", "8", "16", "32", "64", "128", "256", "512", "1024")


class SinBlock(nn.Module):
    """Two modulated-FC stages with optional residual skip
    (`generator.py:893-974`)."""

    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style0, style1, skip: bool = False):
        x_orig = x
        x = SinStyleMod(self.out_dim, dtype=self.dtype, name="mod1")(x, style0)
        x = nn.leaky_relu(x, 0.2)
        x = SinStyleMod(self.out_dim, dtype=self.dtype, name="mod2")(x, style1)
        out = nn.leaky_relu(x, 0.2)
        if skip and out.shape[-1] == x_orig.shape[-1]:
            out = out + x_orig
        return out


class CIPSNet(nn.Module):
    """Feature image (b, n, input_dim) + styles → RGB (b, n, 3)."""

    hidden_dim: int = 512
    pre_rgb_dim: int = 3
    name_prefix: str = "inr"
    dtype: Any = jnp.float32

    @property
    def style_dims(self):
        keys = set()
        for res in CIPS_RESOLUTIONS:
            keys.add(f"{self.name_prefix}_w{res}_0")
            keys.add(f"{self.name_prefix}_w{res}_1")
        return keys

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        style_dict: Mapping[str, jnp.ndarray],
        img_size: int = 1024,
    ) -> jnp.ndarray:
        """``img_size`` is static; blocks beyond it are skipped
        (`generator.py:1146-1147`).  NOTE: the reference's training path calls
        the decoder without img_size, i.e. all nine blocks run regardless of
        the rendered resolution (`generator.py:1754`); pass img_size=1024 for
        that behavior.
        """
        stop = str(2 ** int(np.log2(img_size)))
        rgb = None
        for idx, res in enumerate(CIPS_RESOLUTIONS):
            x = SinBlock(self.hidden_dim, dtype=self.dtype, name=f"block_{res}")(
                x,
                style_dict[f"{self.name_prefix}_w{res}_0"].astype(self.dtype),
                style_dict[f"{self.name_prefix}_w{res}_1"].astype(self.dtype),
                skip=idx >= 4,
            )
            if idx >= 3:
                rgb = ToRGB(self.pre_rgb_dim, dtype=self.dtype, name=f"to_rgb_{res}")(x, skip=rgb)
            if res == stop:
                break

        if self.pre_rgb_dim > 3:
            rgb = TorchLinear(
                3, kernel_init=winit.frequency_kernel(100.0), dtype=self.dtype, name="out_linear"
            )(rgb)
        return jnp.tanh(rgb)
