"""Numerical parity vs torch: build small torch modules implementing the
published layer math (FiLM-SIREN, modulated FC, mapping net), convert their
state dicts with cips3d_tpu.utils.convert_torch, and compare forwards.

This validates both the converter's name/layout mapping and our layers'
numerics (reference semantics: exp/comm/models/film_layer.py:41-116,
exp/comm/models/mod_conv_fc.py:392-496,
exp/cips3d/models/multi_head_mapping.py:28-153).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cips3d_tpu.models.cips_net import CIPS_RESOLUTIONS  # noqa: E402
from cips3d_tpu.models.generator import GeneratorConfig, GeneratorNerfINR  # noqa: E402
from cips3d_tpu.utils.convert_torch import convert_generator_state_dict  # noqa: E402

HID = 16
STY = 16
INR_HID = 24
INR_STY = 24
RGB_DIM = 8


class TorchFiLM(tnn.Module):
    """film_layer.FiLMLayer: sin((g*15+30) * Wx + b)."""

    def __init__(self, in_dim, out_dim, style_dim):
        super().__init__()
        self.linear = tnn.Linear(in_dim, out_dim)
        self.gain_fc = tnn.Linear(style_dim, out_dim)
        self.bias_fc = tnn.Linear(style_dim, out_dim)

    def forward(self, x, style):
        gain = self.gain_fc(style) * 15 + 30
        bias = self.bias_fc(style)
        if x.dim() == 3:
            gain, bias = gain[:, None], bias[:, None]
        return torch.sin(gain * self.linear(x) + bias)


class TorchSinStyleMod(tnn.Module):
    """mod_conv_fc.SinStyleMod bmm path with demodulation."""

    def __init__(self, in_c, out_c, style_dim):
        super().__init__()
        self.weight = tnn.Parameter(torch.randn(1, in_c, out_c))
        self.modulation = tnn.Linear(style_dim, in_c)
        self.out_c = out_c

    def forward(self, x, style):
        b = x.shape[0]
        s = self.modulation(style).view(b, -1, 1)
        w = self.weight * (s + 1)
        demod = torch.rsqrt(w.pow(2).sum(1) + 1e-8)
        w = w * demod.view(b, 1, self.out_c)
        return torch.bmm(x, w)


class TorchGenerator(tnn.Module):
    """Minimal torch twin of our GeneratorNerfINR param layout (tiny dims)."""

    def __init__(self):
        super().__init__()
        # siren
        self.siren = tnn.Module()
        self.siren.network = tnn.ModuleList([TorchFiLM(3, HID, STY), TorchFiLM(HID, HID, STY)])
        self.siren.final_layer = tnn.Linear(HID, 1)
        self.siren.color_layer_sine = TorchFiLM(HID, HID // 2, STY)
        self.siren.color_layer_linear = tnn.Sequential(tnn.Linear(HID // 2, RGB_DIM))
        # nerf mapping: 2 base layers, no norms
        self.mapping_network_nerf = tnn.Module()
        self.mapping_network_nerf.base_net = tnn.Sequential(
            tnn.Linear(8, STY), tnn.LeakyReLU(0.2), tnn.Linear(STY, STY)
        )
        # inr mapping: 2 base layers, add_norm + norm_out
        self.mapping_network_inr = tnn.Module()
        self.mapping_network_inr.base_net = tnn.Sequential(
            tnn.Linear(12, INR_STY), tnn.LayerNorm(INR_STY), tnn.LeakyReLU(0.2),
            tnn.Linear(INR_STY, INR_STY), tnn.LayerNorm(INR_STY),
        )
        # inr net
        self.inr_net = tnn.Module()
        self.inr_net.network = tnn.ModuleDict()
        self.inr_net.to_rgbs = tnn.ModuleDict()
        in_dim = RGB_DIM
        for res in CIPS_RESOLUTIONS:
            blk = tnn.Module()
            blk.mod1 = TorchSinStyleMod(in_dim, INR_HID, INR_STY)
            blk.mod2 = TorchSinStyleMod(INR_HID, INR_HID, INR_STY)
            self.inr_net.network[res] = blk
            rgb = tnn.Module()
            rgb.linear = tnn.Linear(INR_HID, 3)
            self.inr_net.to_rgbs[res] = rgb
            in_dim = INR_HID
        self.aux_to_rbg = tnn.Sequential(tnn.Linear(RGB_DIM, 3), tnn.Tanh())


GCFG = GeneratorConfig(
    z_dim_nerf=8,
    z_dim_inr=12,
    nerf_hidden_dim=HID,
    nerf_style_dim=STY,
    nerf_mapping_layers=2,
    nerf_rgb_dim=RGB_DIM,
    inr_hidden_dim=INR_HID,
    inr_style_dim=INR_STY,
    inr_mapping_layers=2,
    inr_pre_rgb_dim=3,
)


@pytest.fixture(scope="module")
def converted():
    torch.manual_seed(0)
    tg = TorchGenerator().eval()
    sd = {k: v.detach().numpy() for k, v in tg.state_dict().items()}
    params = convert_generator_state_dict(
        sd, nerf_hidden_layers=2, nerf_mapping_layers=2, inr_mapping_layers=2
    )
    params = jax.tree_util.tree_map(jnp.asarray, params)
    model = GeneratorNerfINR(cfg=GCFG)
    return tg, params, model


class TestConversionParity:
    def test_siren_forward_matches(self, converted):
        tg, params, model = converted
        pts = np.random.default_rng(0).standard_normal((2, 6, 3)).astype(np.float32) * 0.05
        style = np.random.default_rng(1).standard_normal((2, STY)).astype(np.float32)

        with torch.no_grad():
            x = torch.from_numpy(pts) * (2 / 0.24)
            for layer in tg.siren.network:
                x = layer(x, torch.from_numpy(style))
            sigma = tg.siren.final_layer(x)
            c = tg.siren.color_layer_sine(x, torch.from_numpy(style))
            rgb = tg.siren.color_layer_linear(c)
            ref = torch.cat([rgb, sigma], -1).numpy()

        styles = {"nerf_w0": jnp.asarray(style), "nerf_w1": jnp.asarray(style),
                  "nerf_rgb": jnp.asarray(style)}
        out = model.apply(
            params, jnp.asarray(pts), styles, method=lambda m, p, s: m.siren(p, s)
        )
        np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4)

    def test_mapping_forward_matches(self, converted):
        tg, params, model = converted
        z_nerf = np.random.default_rng(2).standard_normal((3, 8)).astype(np.float32)
        z_inr = np.random.default_rng(3).standard_normal((3, 12)).astype(np.float32)

        with torch.no_grad():
            zn = torch.from_numpy(z_nerf)
            zn = zn * torch.rsqrt(torch.mean(zn ** 2, dim=1, keepdim=True) + 1e-8)
            ref_nerf = tg.mapping_network_nerf.base_net(zn).numpy()
            zi = torch.from_numpy(z_inr)
            zi = zi * torch.rsqrt(torch.mean(zi ** 2, dim=1, keepdim=True) + 1e-8)
            ref_inr = tg.mapping_network_inr.base_net(zi).numpy()

        styles = model.apply(params, jnp.asarray(z_nerf), jnp.asarray(z_inr), method=model.mapping)
        np.testing.assert_allclose(np.asarray(styles["nerf_w0"]), ref_nerf, atol=1e-4)
        np.testing.assert_allclose(np.asarray(styles["inr_w4_0"]), ref_inr, atol=1e-4)

    def test_inr_forward_matches(self, converted):
        tg, params, model = converted
        feat = np.random.default_rng(4).standard_normal((2, 5, RGB_DIM)).astype(np.float32)
        style = np.random.default_rng(5).standard_normal((2, INR_STY)).astype(np.float32)

        with torch.no_grad():
            x = torch.from_numpy(feat)
            st = torch.from_numpy(style)
            rgb = 0
            for idx, res in enumerate(CIPS_RESOLUTIONS):
                blk = tg.inr_net.network[res]
                x_orig = x
                x = torch.nn.functional.leaky_relu(blk.mod1(x, st), 0.2)
                x = torch.nn.functional.leaky_relu(blk.mod2(x, st), 0.2)
                if idx >= 4 and x.shape[-1] == x_orig.shape[-1]:
                    x = x + x_orig
                if idx >= 3:
                    rgb = tg.inr_net.to_rgbs[res].linear(x) + (rgb if idx > 3 else 0)
            ref = torch.tanh(rgb).numpy()

        styles = {}
        for res in CIPS_RESOLUTIONS:
            styles[f"inr_w{res}_0"] = jnp.asarray(style)
            styles[f"inr_w{res}_1"] = jnp.asarray(style)
        out = model.apply(
            params, jnp.asarray(feat), styles, 1024,
            method=lambda m, f, s, i: m.inr_net(f, s, i),
        )
        np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4)

    def test_aux_head_matches(self, converted):
        tg, params, model = converted
        feat = np.random.default_rng(6).standard_normal((2, 4, RGB_DIM)).astype(np.float32)
        with torch.no_grad():
            ref = tg.aux_to_rbg(torch.from_numpy(feat)).numpy()
        out = model.apply(
            params, jnp.asarray(feat), method=lambda m, f: jnp.tanh(m.aux_to_rgb(f))
        )
        np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4)
