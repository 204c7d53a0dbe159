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


# ---------------------------------------------------------------------------
# Reverse direction: flax pytree → torch state dict / reference ckpt layout.
# Makes parity bidirectional: models trained here can be validated (and
# served) by any torch environment holding the reference code, without
# network egress on this side (`exp/cips3d/scripts/train.py:56-83` checkpoint
# layout; the v16 class `generator_nerf_inr_v16.py:1143-1207` is what the
# released checkpoints instantiate).


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _rev_linear(dst: dict, src_tree: dict, name: str):
    dst[f"{name}.weight"] = _np(src_tree["kernel"]).T.copy()
    if "bias" in src_tree:
        dst[f"{name}.bias"] = _np(src_tree["bias"]).copy()


def _rev_layernorm(dst: dict, src_tree: dict, name: str):
    dst[f"{name}.weight"] = _np(src_tree["scale"]).copy()
    dst[f"{name}.bias"] = _np(src_tree["bias"]).copy()


def _rev_film(dst: dict, src_tree: dict, name: str):
    _rev_linear(dst, src_tree["linear"], f"{name}.linear")
    _rev_linear(dst, src_tree["gain_fc"], f"{name}.gain_fc")
    _rev_linear(dst, src_tree["bias_fc"], f"{name}.bias_fc")


def _rev_sinstylemod(dst: dict, src_tree: dict, name: str):
    w = _np(src_tree["weight"])
    dst[f"{name}.weight"] = w[None].copy()  # (in,out) → (1,in,out)
    _rev_linear(dst, src_tree["modulation"], f"{name}.modulation")
    # the reference SinStyleMod registers a LayerNorm that its forward never
    # touches (`mod_conv_fc.py:445`, all uses commented out); strict
    # state-dict loading still requires the keys — emit the identity affine
    dst[f"{name}.norm.weight"] = np.ones((w.shape[0],), np.float32)
    dst[f"{name}.norm.bias"] = np.zeros((w.shape[0],), np.float32)


def _rev_mapping(tree: dict, prefix: str) -> Dict[str, np.ndarray]:
    """Inverse of `_mapping`: rebuild torch Sequential slot indices.  The
    layer count and add_norm/norm_out flags are inferred from the tree."""
    out: Dict[str, np.ndarray] = {}
    base_layers = sum(1 for k in tree if k.startswith("base_") and not k.startswith("base_norm"))
    add_norm = "base_norm_0" in tree
    seq = 0
    for i in range(base_layers):
        _rev_linear(out, tree[f"base_{i}"], f"{prefix}.base_net.{seq}")
        seq += 1
        if i != base_layers - 1:
            if add_norm:
                _rev_layernorm(out, tree[f"base_norm_{i}"], f"{prefix}.base_net.{seq}")
                seq += 1
            seq += 1  # LeakyReLU slot
    if "norm_out" in tree:
        _rev_layernorm(out, tree["norm_out"], f"{prefix}.base_net.{seq}")
    return out


def export_generator_state_dict(params: dict, rgb_attr: str = "to_rgbs") -> Dict[str, np.ndarray]:
    """flax params ({"params": {...}} or the inner dict) → torch
    GeneratorNerfINR state dict (numpy values).

    ``rgb_attr``: both the refactored and the v16 released-checkpoint class
    name the CIPSNet RGB heads ``to_rgbs`` (`generator.py:1084`,
    `generator_nerf_inr_v16.py`); some dev INR variants spell it ``to_rbgs``.
    Inverse of `convert_generator_state_dict`; round-trip parity is asserted
    against the imported torch classes in tests/test_reference_parity.py.
    """
    p = params.get("params", params)
    sd: Dict[str, np.ndarray] = {}

    siren = p["siren"]
    films = sorted(
        (k for k in siren if k.startswith("film_")), key=lambda k: int(k.split("_")[1])
    )
    for i, k in enumerate(films):
        _rev_film(sd, siren[k], f"siren.network.{i}")
    _rev_linear(sd, siren["sigma"], "siren.final_layer")
    _rev_film(sd, siren["color_film"], "siren.color_layer_sine")
    _rev_linear(sd, siren["color_linear"], "siren.color_layer_linear.0")

    sd.update(_rev_mapping(p["mapping_network_nerf"], "mapping_network_nerf"))
    sd.update(_rev_mapping(p["mapping_network_inr"], "mapping_network_inr"))

    inr = p["inr_net"]
    for k in inr:
        if k.startswith("block_"):
            res = k[len("block_"):]
            _rev_sinstylemod(sd, inr[k]["mod1"], f"inr_net.network.{res}.mod1")
            _rev_sinstylemod(sd, inr[k]["mod2"], f"inr_net.network.{res}.mod2")
        elif k.startswith("to_rgb_"):
            res = k[len("to_rgb_"):]
            _rev_linear(sd, inr[k]["linear"], f"inr_net.{rgb_attr}.{res}.linear")
    # torch materializes ToRGB heads for EVERY block, but forward only uses
    # them from to_rgb_start=3 (`generator.py:1139-1144`); our flax model
    # never creates the dead low-res heads — emit zero-filled placeholders so
    # strict state-dict loading succeeds
    for k in inr:
        if k.startswith("block_") and f"to_rgb_{k[len('block_'):]}" not in inr:
            res = k[len("block_"):]
            hidden = _np(inr[k]["mod1"]["weight"]).shape[1]
            out_dim = 3
            for other in inr:
                if other.startswith("to_rgb_"):
                    out_dim = _np(inr[other]["linear"]["kernel"]).shape[1]
                    break
            sd[f"inr_net.{rgb_attr}.{res}.linear.weight"] = np.zeros(
                (out_dim, hidden), np.float32
            )
            sd[f"inr_net.{rgb_attr}.{res}.linear.bias"] = np.zeros((out_dim,), np.float32)
    if "out_linear" in inr:
        _rev_linear(sd, inr["out_linear"], "inr_net.tanh.0")

    _rev_linear(sd, p["aux_to_rgb"], "aux_to_rbg.0")
    return sd


def save_torch_checkpoint(sd: Dict[str, np.ndarray], path: str):
    """Write a state dict as a torch ``.pth`` the reference can load."""
    import torch

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, path)


def export_reference_checkpoint_dir(
    out_dir: str,
    G_ema: dict,
    generator: dict | None = None,
    info_msg: str = "",
    **extra_models: dict,
):
    """Emit the reference's directory-of-modules checkpoint layout
    (`exp/cips3d/scripts/train.py:56-83` / tl2 ``save_models``): one
    ``<name>_model.pth`` state-dict file per module plus an info message.
    ``G_ema``/``generator`` are flax param trees; ``extra_models`` lets
    callers add pre-built torch state dicts (e.g. a discriminator)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    save_torch_checkpoint(
        export_generator_state_dict(G_ema), os.path.join(out_dir, "G_ema_model.pth")
    )
    if generator is not None:
        save_torch_checkpoint(
            export_generator_state_dict(generator),
            os.path.join(out_dir, "generator_model.pth"),
        )
    for name, sd in extra_models.items():
        save_torch_checkpoint(sd, os.path.join(out_dir, f"{name}_model.pth"))
    with open(os.path.join(out_dir, "info.txt"), "w") as f:
        f.write(info_msg + "\n")
