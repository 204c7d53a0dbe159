"""Legacy model zoo tests (reference: exp/comm/models/{cond_layer_norm,
inr_network,fc_net,mod_conv_fc}.py, exp/comm/comm_model_utils.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from cips3d_tpu.models.legacy import (
    CLN,
    CLNLayer,
    FCNet,
    INRNetwork,
    INRNetworkSkip,
    ModulatedFCConv,
    PosEmbedding,
)


class TestCLN:
    def test_normalization_and_style(self, rng):
        m = CLN()
        x = jax.random.normal(rng, (2, 5, 8)) * 3 + 1
        style = jax.random.normal(rng, (2, 4))
        params = m.init(rng, x, style)
        out = m.apply(params, x, style)
        assert out.shape == x.shape
        # with zero style-fc params at init? gain_fc has torch init (nonzero);
        # instead check: replacing style params with zeros gives plain LN
        zeroed = jax.tree_util.tree_map(jnp.zeros_like, params)
        out0 = np.asarray(m.apply(zeroed, x, style))
        np.testing.assert_allclose(out0.mean(-1), 0.0, atol=1e-5)
        np.testing.assert_allclose(out0.var(-1), 1.0, atol=1e-3)

    def test_cln_layer(self, rng):
        m = CLNLayer(16)
        x = jax.random.normal(rng, (2, 5, 8))
        style = jax.random.normal(rng, (2, 4))
        params = m.init(rng, x, style)
        assert m.apply(params, x, style).shape == (2, 5, 16)


class TestINRNetworks:
    def test_inr_network(self, rng):
        m = INRNetwork(hidden_dim=16, hidden_layers=3, rgb_dim=3)
        x = jax.random.normal(rng, (2, 7, 32))
        styles = {f"inr_w{i}": jax.random.normal(jax.random.fold_in(rng, i), (2, 8)) for i in range(3)}
        params = m.init(rng, x, styles)
        out = np.asarray(m.apply(params, x, styles))
        assert out.shape == (2, 7, 3)
        assert out.min() >= -1 and out.max() <= 1

    def test_inr_network_skip(self, rng):
        m = INRNetworkSkip(hidden_layers=3, dim_scale=1 / 32)
        x = jax.random.normal(rng, (1, 5, 32))
        styles = {}
        for i in range(3):
            styles[f"inr_w{i}_0"] = jax.random.normal(jax.random.fold_in(rng, 2 * i), (1, 8))
            styles[f"inr_w{i}_1"] = jax.random.normal(jax.random.fold_in(rng, 2 * i + 1), (1, 8))
        params = m.init(rng, x, styles)
        out = m.apply(params, x, styles)
        assert out.shape == (1, 5, 3)


class TestMisc:
    def test_pos_embedding(self, rng):
        m = PosEmbedding(max_logscale=3, n_freqs=4)
        x = jax.random.normal(rng, (5, 3))
        out = m(x)
        assert out.shape == (5, m.out_dim) == (5, 27)
        np.testing.assert_allclose(np.asarray(out[:, :3]), np.asarray(x))
        np.testing.assert_allclose(np.asarray(out[:, 3:6]), np.sin(np.asarray(x)), atol=1e-6)

    def test_fcnet(self, rng):
        m = FCNet(hidden_dim=16, hidden_layers=2)
        x = jax.random.normal(rng, (2, 4, 8))
        params = m.init(rng, x)
        out = np.asarray(m.apply(params, x))
        assert out.shape == (2, 4, 3)
        assert np.abs(out).max() <= 1

    def test_modulated_fc_conv(self, rng):
        m = ModulatedFCConv(out_channel=12)
        x = jax.random.normal(rng, (2, 6, 8))
        style = jax.random.normal(rng, (2, 4))
        params = m.init(rng, x, style)
        out = m.apply(params, x, style)
        assert out.shape == (2, 6, 12)
        # demodulation: per-sample effective weight has ~unit column norms ->
        # output scale comparable to input scale
        assert np.asarray(jnp.std(out)) < 10


class TestModSinLayer:
    def test_norm_path(self, rng):
        from cips3d_tpu.models.legacy import ModSinLayer

        m = ModSinLayer()
        x = jax.random.normal(rng, (2, 5, 8)) * 3
        style = jax.random.normal(rng, (2, 4))
        params = m.init(rng, x, style)
        out = m.apply(params, x, style)
        assert out.shape == x.shape

    def test_sine_path(self, rng):
        from cips3d_tpu.models.legacy import ModSinLayer

        m = ModSinLayer(use_sine=True, freq=2.0)
        x = jax.random.normal(rng, (2, 5, 8))
        style = jax.random.normal(rng, (2, 4))
        params = m.init(rng, x, style)
        out = np.asarray(m.apply(params, x, style))
        assert np.all(np.isfinite(out))


class TestCLNINRVariants:
    def test_inr_skip_cln_early_exit(self, rng):
        from cips3d_tpu.models.legacy import CLN_RESOLUTIONS, INRNetworkSkipCLN

        net = INRNetworkSkipCLN(dim_scale=1 / 16)  # ch 16
        x = jax.random.normal(rng, (2, 9, 8))
        styles = {}
        for res in CLN_RESOLUTIONS:
            styles[f"inr_w{res}_0"] = jax.random.normal(jax.random.fold_in(rng, 2 * int(res)), (2, 12))
            styles[f"inr_w{res}_1"] = jax.random.normal(jax.random.fold_in(rng, 2 * int(res) + 1), (2, 12))
        params = net.init(rng, x, styles)
        out_full = net.apply(params, x, styles)
        assert out_full.shape == (2, 9, 3)
        assert np.all(np.abs(np.asarray(out_full)) <= 1.0)
        # early exit at 64 uses only the first 3 blocks
        out_64 = net.apply(params, x, styles, img_size=64)
        assert not np.allclose(np.asarray(out_64), np.asarray(out_full))

    def test_linear_skip_prog(self, rng):
        from cips3d_tpu.models.legacy import LinearSkipProg

        net = LinearSkipProg(hidden_dim=16)
        x = jax.random.normal(rng, (2, 9, 8))
        styles = {"linear_w": jax.random.normal(rng, (2, 12))}
        params = net.init(rng, x, styles)
        out = net.apply(params, x, styles, img_size=256)
        assert out.shape == (2, 9, 3)
        # single CLN input layer is the only style dependence
        g = jax.grad(lambda s: float_sum(net.apply(params, x, s)))(styles)
        assert float(jnp.abs(g["linear_w"]).max()) > 0

    def test_cln_block_skip(self, rng):
        from cips3d_tpu.models.legacy import CLNBlock

        blk = CLNBlock(8)
        x = jax.random.normal(rng, (2, 5, 8))
        s0 = jax.random.normal(rng, (2, 6))
        s1 = jax.random.normal(jax.random.fold_in(rng, 1), (2, 6))
        params = blk.init(rng, x, s0, s1)
        no_skip = blk.apply(params, x, s0, s1, skip=False)
        with_skip = blk.apply(params, x, s0, s1, skip=True)
        np.testing.assert_allclose(
            np.asarray(with_skip), np.asarray(no_skip + x), rtol=1e-5, atol=1e-6
        )


def float_sum(x):
    return jnp.sum(x)
