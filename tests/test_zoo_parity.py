"""Parity for the round-3 model-zoo tail against the ACTUAL torch reference:

  * `NeRFNetworkL` (`exp/comm/models/nerf_network.py:264-343`) — wide-color
    FiLM backbone — vs `cips3d_tpu.models.nerf_variants.NeRFNetworkL`.
  * `MultiHeadMappingNetwork_EqualLR` (`exp/comm/models/multi_head_mapping.py:172-284`)
    vs `cips3d_tpu.models.mapping.MultiHeadMappingNetworkEqualLR`.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import tl2_stub  # noqa: E402

from cips3d_tpu.models.mapping import MultiHeadMappingNetworkEqualLR  # noqa: E402
from cips3d_tpu.models.nerf_variants import NeRFNetworkL  # noqa: E402
from cips3d_tpu.utils.convert_torch import _film, _linear  # noqa: E402


def _np(x):
    return x.detach().numpy()


class TestNeRFNetworkLParity:
    def test_forward_parity(self):
        tl2_stub.install()
        from exp.comm.models import nerf_network as ref_nn

        torch.manual_seed(0)
        ref = ref_nn.NeRFNetworkL(
            in_dim=3, hidden_dim=32, rgb_dim=8, style_dim=16, hidden_layers=2
        ).eval()
        sd = {k: _np(v) for k, v in ref.state_dict().items()}

        params: dict = {}
        _film(params, "film_0", sd, "network.0")
        _film(params, "film_1", sd, "network.1")
        _linear(params, "sigma", sd, "final_layer")
        _film(params, "color_film", sd, "color_layer_sine")
        _linear(params, "color_linear", sd, "color_layer_linear.0")

        ours = NeRFNetworkL(hidden_dim=32, hidden_layers=2, rgb_dim=8)
        # the L variant's color FiLM keeps full hidden width
        assert ours.color_hidden_dim == 32

        rng = np.random.default_rng(0)
        pts = rng.standard_normal((2, 10, 3)).astype(np.float32) * 0.05
        styles = {
            "nerf_w0": rng.standard_normal((2, 16)).astype(np.float32),
            "nerf_w1": rng.standard_normal((2, 16)).astype(np.float32),
            "nerf_rgb": rng.standard_normal((2, 16)).astype(np.float32),
        }
        with torch.no_grad():
            ref_out = ref(
                torch.from_numpy(pts),
                {k: torch.from_numpy(v) for k, v in styles.items()},
                ray_directions=None,
            ).numpy()

        out = ours.apply(
            {"params": params}, jnp.asarray(pts), {k: jnp.asarray(v) for k, v in styles.items()}
        )
        np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-4, atol=1e-5)


class TestMappingEqualLRParity:
    @pytest.mark.parametrize(
        "base_layers,head_layers,lr_mlp,scale",
        [(3, 0, 0.01, 1.0), (2, 2, 1.0, 1.0), (2, 1, 0.01, 0.25)],
    )
    def test_forward_parity(self, base_layers, head_layers, lr_mlp, scale):
        tl2_stub.install()
        from exp.comm.models import multi_head_mapping as ref_mhm

        head_dim_dict = {"w_a": 8, "w_b": 12}
        torch.manual_seed(1)
        ref = ref_mhm.MultiHeadMappingNetwork_EqualLR(
            z_dim=16,
            hidden_dim=32,
            base_layers=base_layers,
            head_layers=head_layers,
            head_dim_dict=dict(head_dim_dict),
            lr_mlp=lr_mlp,
            scale=scale,
        ).eval()
        sd = {k: _np(v) for k, v in ref.state_dict().items()}

        params: dict = {}
        # base_net_elr Sequential: EqualLinear [, LeakyReLU] per layer; the
        # activation is skipped after the last layer when head_layers == 0
        seq = 0
        for i in range(base_layers):
            params[f"base_{i}"] = {
                "kernel": sd[f"base_net_elr.{seq}.weight"].T.copy(),
                "bias": sd[f"base_net_elr.{seq}.bias"].copy(),
            }
            seq += 1
            if head_layers > 0 or i != base_layers - 1:
                seq += 1  # LeakyReLU
        for name in head_dim_dict:
            for i in range(head_layers):
                src = f"{name}.{2 * i}"  # EqualLinear at even slots
                params[f"head_{name}_{i}"] = {
                    "kernel": sd[f"{src}.weight"].T.copy(),
                    "bias": sd[f"{src}.bias"].copy(),
                }

        ours = MultiHeadMappingNetworkEqualLR(
            hidden_dim=32,
            base_layers=base_layers,
            head_layers=head_layers,
            head_dim_dict=head_dim_dict,
            lr_mlp=lr_mlp,
            scale=scale,
        )
        rng = np.random.default_rng(2)
        z = rng.standard_normal((4, 16)).astype(np.float32)
        with torch.no_grad():
            ref_out = {k: v.numpy() for k, v in ref(torch.from_numpy(z)).items()}
        out = ours.apply({"params": params}, jnp.asarray(z))
        assert set(out) == set(ref_out)
        for k in ref_out:
            np.testing.assert_allclose(
                np.asarray(out[k]), ref_out[k], rtol=1e-4, atol=1e-5, err_msg=k
            )
