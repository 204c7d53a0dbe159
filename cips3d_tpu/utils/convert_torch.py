"""Convert reference torch checkpoints (.pth) into our parameter pytrees.

The reference ships G_ema checkpoints (FFHQ_r256 / AFHQ_r256 / CartoonFaces,
README.md:98-100) saved as module state-dicts of `GeneratorNerfINR`
(`exp/cips3d/models/generator.py:1159`; the released checkpoints use the v16
class, `exp/dev/nerf_inr/models/generator_nerf_inr_v16.py:1143-1207`, whose
state-dict key layout is IDENTICAL — same `siren.network.{i}`,
`inr_net.network.{res}.mod{1,2}`, `inr_net.to_rbgs.{res}`, mapping
`base_net.{seq}` and `aux_to_rbg.0` names — so this converter covers both).  This module maps those
state-dict names onto our flax param tree so released weights can be loaded
for output-comparable validation.

Key layout differences handled here:
  * torch Linear weight (out, in)  →  flax kernel (in, out): transpose;
  * SinStyleMod weight (1, in, out) →  (in, out): squeeze;
  * LayerNorm weight/bias → scale/bias;
  * module paths:
      siren.network.{i}.linear/gain_fc/bias_fc → siren/film_{i}/...
      siren.final_layer                        → siren/sigma
      siren.color_layer_sine                   → siren/color_film
      siren.color_layer_linear.0               → siren/color_linear
      mapping_network_nerf.base_net.{2k}       → mapping_network_nerf/base_k
      mapping_network_inr.base_net.*           → (linear/norm interleave, see
                                                  `multi_head_mapping.py:62-83`)
      inr_net.network.{res}.mod{1,2}           → inr_net/block_{res}/mod{1,2}
      inr_net.to_rgbs.{res}.linear             → inr_net/to_rgb_{res}/linear
      aux_to_rbg.0                             → aux_to_rgb
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd and not any(
        k.startswith(("siren", "inr_net")) for k in sd
    ):
        sd = sd["state_dict"]
    return {k: v.detach().numpy() for k, v in sd.items() if hasattr(v, "detach")}


def _linear(dst: dict, name: str, sd: dict, src: str):
    dst[name] = {"kernel": sd[f"{src}.weight"].T.copy()}
    if f"{src}.bias" in sd:
        dst[name]["bias"] = sd[f"{src}.bias"].copy()


def _layernorm(dst: dict, name: str, sd: dict, src: str):
    dst[name] = {"scale": sd[f"{src}.weight"].copy(), "bias": sd[f"{src}.bias"].copy()}


def _film(dst: dict, name: str, sd: dict, src: str):
    block = {}
    _linear(block, "linear", sd, f"{src}.linear")
    _linear(block, "gain_fc", sd, f"{src}.gain_fc")
    _linear(block, "bias_fc", sd, f"{src}.bias_fc")
    dst[name] = block


def _sinstylemod(dst: dict, name: str, sd: dict, src: str):
    block = {"weight": sd[f"{src}.weight"][0].copy()}  # (1, in, out) → (in, out)
    mod = {}
    _linear(mod, "modulation", sd, f"{src}.modulation")
    block["modulation"] = mod["modulation"]
    dst[name] = block


def _mapping(sd: dict, prefix: str, base_layers: int, add_norm: bool, norm_out: bool) -> dict:
    """Rebuild the base_net Sequential index mapping
    (`multi_head_mapping.py:62-83`): per layer i: Linear [, LayerNorm], LReLU
    — except the last layer (head_layers=0) gets neither; with norm_out an
    extra LayerNorm is appended at the end."""
    out: dict = {}
    seq = 0
    for i in range(base_layers):
        _linear(out, f"base_{i}", sd, f"{prefix}.base_net.{seq}")
        seq += 1
        last = i == base_layers - 1
        if not last:
            if add_norm:
                _layernorm(out, f"base_norm_{i}", sd, f"{prefix}.base_net.{seq}")
                seq += 1
            seq += 1  # LeakyReLU has no params
    if norm_out:
        _layernorm(out, "norm_out", sd, f"{prefix}.base_net.{seq}")
    return out


def convert_generator_state_dict(
    sd: Dict[str, np.ndarray],
    nerf_hidden_layers: int = 2,
    nerf_mapping_layers: int = 4,
    inr_mapping_layers: int = 8,
) -> dict:
    """torch GeneratorNerfINR state dict → flax params dict
    ({"params": {...}}) for `cips3d_tpu.models.generator.GeneratorNerfINR`."""
    p: dict = {}

    # SIREN backbone
    siren: dict = {}
    for i in range(nerf_hidden_layers):
        _film(siren, f"film_{i}", sd, f"siren.network.{i}")
    _linear(siren, "sigma", sd, "siren.final_layer")
    _film(siren, "color_film", sd, "siren.color_layer_sine")
    _linear(siren, "color_linear", sd, "siren.color_layer_linear.0")
    p["siren"] = siren

    # mapping nets
    p["mapping_network_nerf"] = _mapping(
        sd, "mapping_network_nerf", nerf_mapping_layers, add_norm=False, norm_out=False
    )
    p["mapping_network_inr"] = _mapping(
        sd, "mapping_network_inr", inr_mapping_layers, add_norm=True, norm_out=True
    )

    # INR decoder
    inr: dict = {}
    resolutions = sorted(
        {k.split(".")[2] for k in sd if k.startswith("inr_net.network.")}, key=int
    )
    # some dev variants spell the RGB heads "to_rbgs"
    rgb_attr = "to_rgbs" if any(k.startswith("inr_net.to_rgbs.") for k in sd) else "to_rbgs"
    for res in resolutions:
        block: dict = {}
        _sinstylemod(block, "mod1", sd, f"inr_net.network.{res}.mod1")
        _sinstylemod(block, "mod2", sd, f"inr_net.network.{res}.mod2")
        inr[f"block_{res}"] = block
        rgb: dict = {}
        _linear(rgb, "linear", sd, f"inr_net.{rgb_attr}.{res}.linear")
        inr[f"to_rgb_{res}"] = rgb
    if "inr_net.tanh.0.weight" in sd:
        _linear(inr, "out_linear", sd, "inr_net.tanh.0")
    p["inr_net"] = inr

    # aux head ("rbg" typo is the reference's)
    _linear(p, "aux_to_rgb", sd, "aux_to_rbg.0")

    return {"params": p}


def convert_generator_checkpoint(path: str, **kwargs) -> dict:
    return convert_generator_state_dict(load_torch_checkpoint(path), **kwargs)
