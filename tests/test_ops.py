"""Tests for cips3d_tpu.ops — upfirdn2d (vs an independent torch oracle),
fused activation, and DiffAugment.

upfirdn2d spec: exp/comm/op/upfirdn2d.py:152-186 (zero-stuff by `up`, pad,
correlate with flipped kernel, subsample by `down`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cips3d_tpu.ops import diffaug as DA
from cips3d_tpu.ops.fused_act import fused_leaky_relu, scaled_leaky_relu
from cips3d_tpu.ops.upfirdn2d import make_kernel, upfirdn2d, upfirdn2d_general


def _torch_upfirdn(x, k, up, down, pad):
    """Independent oracle using torch (CPU): explicit zero-stuff + pad +
    conv2d with flipped kernel + stride subsample."""
    import torch
    import torch.nn.functional as F

    xt = torch.from_numpy(np.asarray(x, np.float32))
    kt = torch.from_numpy(np.asarray(k, np.float32))
    n, c, h, w = xt.shape
    # zero-stuff
    out = torch.zeros(n, c, h * up, w * up)
    out[:, :, ::up, ::up] = xt
    # pad (support negative = crop)
    p0, p1 = pad
    out = F.pad(out, [max(p0, 0), max(p1, 0), max(p0, 0), max(p1, 0)])
    if p0 < 0 or p1 < 0:
        out = out[:, :, max(-p0, 0): out.shape[2] - max(-p1, 0), max(-p0, 0): out.shape[3] - max(-p1, 0)]
    w_ = torch.flip(kt, [0, 1])[None, None].repeat(c, 1, 1, 1)
    out = F.conv2d(out, w_, groups=c)
    return out[:, :, ::down, ::down].numpy()


class TestUpfirdn2d:
    @pytest.mark.parametrize(
        "up,down,pad",
        [(1, 1, (2, 1)), (1, 2, (2, 2)), (2, 1, (2, 1)), (1, 1, (0, 0)), (2, 2, (3, 1))],
    )
    def test_matches_torch_oracle(self, rng, up, down, pad):
        x = jax.random.normal(rng, (2, 3, 8, 8))
        k = make_kernel([1, 3, 3, 1])
        out = upfirdn2d(x, k, up=up, down=down, pad=pad)
        ref = _torch_upfirdn(np.asarray(x), np.asarray(k), up, down, pad)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_negative_padding(self, rng):
        x = jax.random.normal(rng, (1, 2, 10, 10))
        k = make_kernel([1, 2, 1])
        out = upfirdn2d_general(x, k, 1, 1, 1, 1, -1, -1, -1, -1)
        ref = _torch_upfirdn(np.asarray(x), np.asarray(k), 1, 1, (-1, -1))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_identity_kernel(self, rng):
        x = jax.random.normal(rng, (1, 1, 5, 5))
        k = jnp.array([[1.0]])
        out = upfirdn2d(x, k, pad=(0, 0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_double_differentiable(self, rng):
        """R1 needs grad-of-grad through the blur stack (SURVEY §7 hard parts)."""
        x = jax.random.normal(rng, (1, 1, 6, 6))
        k = make_kernel([1, 3, 3, 1])

        def f(x):
            return jnp.sum(upfirdn2d(x, k, down=2, pad=(2, 1)) ** 2)

        def gnorm(x):
            g = jax.grad(f)(x)
            return jnp.sum(g ** 2)

        gg = jax.grad(gnorm)(x)
        assert np.all(np.isfinite(np.asarray(gg)))
        assert float(jnp.sum(jnp.abs(gg))) > 0

    def test_make_kernel_normalized(self):
        k = make_kernel([1, 3, 3, 1])
        assert k.shape == (4, 4)
        np.testing.assert_allclose(float(jnp.sum(k)), 1.0, atol=1e-6)
        # separable outer product: k[i,j] = v[i]*v[j]/sum^2
        v = np.array([1, 3, 3, 1], np.float32)
        expected = np.outer(v, v) / np.outer(v, v).sum()
        np.testing.assert_allclose(np.asarray(k), expected, atol=1e-6)


class TestFusedAct:
    def test_values(self):
        x = jnp.array([[-1.0, 2.0]])
        b = jnp.array([0.5, -0.5])
        out = fused_leaky_relu(x, b)
        exp = np.array([[-0.5 * 0.2, 1.5]]) * np.sqrt(2)
        np.testing.assert_allclose(np.asarray(out), exp, atol=1e-6)

    def test_nchw_bias_broadcast(self, rng):
        x = jax.random.normal(rng, (2, 3, 4, 4))
        b = jnp.array([1.0, -1.0, 0.0])
        out = fused_leaky_relu(x, b)
        ref = fused_leaky_relu(x + b[None, :, None, None])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_scaled_lrelu(self):
        x = jnp.array([-1.0, 1.0])
        np.testing.assert_allclose(
            np.asarray(scaled_leaky_relu(x)), [-0.2 * np.sqrt(2), np.sqrt(2)], atol=1e-6
        )

    def test_twice_differentiable(self, rng):
        x = jax.random.normal(rng, (4,))
        b = jnp.zeros(4)
        gg = jax.grad(lambda x: jnp.sum(jax.grad(lambda y: jnp.sum(fused_leaky_relu(y, b) ** 2))(x) ** 2))(x)
        assert np.all(np.isfinite(np.asarray(gg)))


class TestDiffAug:
    def test_shapes_preserved(self, rng):
        x = jax.random.uniform(rng, (4, 3, 16, 16)) * 2 - 1
        out = DA.diff_augment(rng, x)
        assert out.shape == x.shape
        assert np.all(np.isfinite(np.asarray(out)))

    def test_differentiable(self, rng):
        x = jax.random.uniform(rng, (2, 3, 8, 8))
        g = jax.grad(lambda x: jnp.sum(DA.diff_augment(rng, x) ** 2))(x)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.sum(jnp.abs(g))) > 0

    def test_translation_zero_shift_possible(self, rng):
        """With shift range including 0, some key gives identity; check the
        mechanics: manually zero shift == original."""
        x = jax.random.uniform(rng, (1, 1, 8, 8))
        # monkey-test internal: translation with ratio tiny -> shift 0or1
        out = DA.rand_translation(rng, x, ratio=0.0)
        # ratio 0 -> shift_x = shift_y = 0 -> randint(0, 1) = 0 -> identity
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_cutout_zeroes_box(self, rng):
        x = jnp.ones((2, 3, 16, 16))
        out = np.asarray(DA.rand_cutout(rng, x, ratio=0.5))
        # cutout of ratio .5 -> 8x8 box of zeros per sample (possibly clipped)
        for i in range(2):
            zeros = (out[i, 0] == 0).sum()
            assert 0 < zeros <= 64

    def test_color_mean_shift_bounded(self, rng):
        x = jnp.zeros((8, 3, 4, 4))
        out = np.asarray(DA.rand_brightness(rng, x))
        assert np.abs(out).max() <= 0.5

    def test_empty_policy_identity(self, rng):
        x = jax.random.uniform(rng, (1, 3, 4, 4))
        np.testing.assert_allclose(np.asarray(DA.diff_augment(rng, x, policy="")), np.asarray(x))

    # ---- equivalence of the matmul/range forms vs the original gather / ----
    # ---- scatter formulations (same keys -> identical draws)            ----

    @staticmethod
    def _translation_gather(key, x, ratio=0.125):
        """The pre-round-3 take_along_axis formulation (oracle)."""
        b, c, h, w = x.shape
        shift_h = int(h * ratio + 0.5)
        shift_w = int(w * ratio + 0.5)
        kh, kw = jax.random.split(key)
        th = jax.random.randint(kh, (b, 1, 1), -shift_h, shift_h + 1)
        tw = jax.random.randint(kw, (b, 1, 1), -shift_w, shift_w + 1)
        x_pad = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
        grid_h = jnp.clip(jnp.arange(h)[None, :, None] + th + 1, 0, h + 1)
        grid_w = jnp.clip(jnp.arange(w)[None, None, :] + tw + 1, 0, w + 1)
        out = jnp.take_along_axis(
            x_pad, jnp.broadcast_to(grid_h[:, None, :, :], (b, c, h, 1)), axis=2)
        out = jnp.take_along_axis(
            out, jnp.broadcast_to(grid_w[:, None, :, :], (b, c, h, w)), axis=3)
        return out

    @staticmethod
    def _cutout_scatter(key, x, ratio=0.2):
        """The pre-round-3 scatter-mask formulation (oracle)."""
        b, c, h, w = x.shape
        cut_h = int(h * ratio + 0.5)
        cut_w = int(w * ratio + 0.5)
        kh, kw = jax.random.split(key)
        off_h = jax.random.randint(kh, (b, 1, 1), 0, h + (1 - cut_h % 2))
        off_w = jax.random.randint(kw, (b, 1, 1), 0, w + (1 - cut_w % 2))
        rows = jnp.clip(jnp.arange(cut_h)[None, :, None] + off_h - cut_h // 2, 0, h - 1)
        cols = jnp.clip(jnp.arange(cut_w)[None, None, :] + off_w - cut_w // 2, 0, w - 1)
        mask = jnp.ones((b, h, w), x.dtype)
        bidx = jnp.arange(b)[:, None, None]
        mask = mask.at[
            jnp.broadcast_to(bidx, (b, cut_h, cut_w)),
            jnp.broadcast_to(rows, (b, cut_h, cut_w)),
            jnp.broadcast_to(cols, (b, cut_h, cut_w)),
        ].set(0.0)
        return x * mask[:, None, :, :]

    def test_translation_matches_gather_form(self, rng):
        for i, (shape, ratio) in enumerate(
            [((8, 3, 16, 16), 0.125), ((4, 3, 17, 17), 0.125), ((2, 1, 8, 8), 0.5)]
        ):
            key = jax.random.fold_in(rng, i)
            kx, ka = jax.random.split(key)
            x = jax.random.uniform(kx, shape) * 2 - 1
            np.testing.assert_allclose(
                np.asarray(DA.rand_translation(ka, x, ratio=ratio)),
                np.asarray(self._translation_gather(ka, x, ratio=ratio)),
                atol=1e-6,
            )

    def test_cutout_matches_scatter_form(self, rng):
        for i, (shape, ratio) in enumerate(
            [((8, 3, 16, 16), 0.2), ((4, 3, 17, 17), 0.3), ((2, 1, 8, 8), 0.5)]
        ):
            key = jax.random.fold_in(rng, i)
            kx, ka = jax.random.split(key)
            x = jax.random.uniform(kx, shape) + 0.5
            np.testing.assert_allclose(
                np.asarray(DA.rand_cutout(ka, x, ratio=ratio)),
                np.asarray(self._cutout_scatter(ka, x, ratio=ratio)),
                atol=1e-6,
            )
