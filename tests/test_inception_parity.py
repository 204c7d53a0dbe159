"""Numerical validation of the FID InceptionV3 port against a torch twin.

torch-fidelity's FeatureExtractorInceptionV3 (the network behind the
reference's FID protocol, `exp/cips3d/scripts/eval_fid.py:36-57`) is
reproduced here as a random-weights torch model with the torch-fidelity
state-dict naming and the FID-variant semantics (BN eps 1e-3,
count_include_pad=False avg pools in A/C/E1, max-pool branch in E2, TF1-style
asymmetric bilinear input resize, (x-128)/128 scaling).  The twin's state
dict flows through `convert_inception_state_dict`, and pool3 features must
match — this validates the architecture, the converter and the preprocessing
in one pass, so that dropping in the real `weights-inception-2015-12-05`
checkpoint yields reference-comparable FID.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from cips3d_tpu.eval.inception import (  # noqa: E402
    InceptionV3Features,
    convert_inception_state_dict,
    inception_forward,
    tf1x_resize,
    tf1x_resize_matrix,
)


class BasicConv2d(nn.Module):
    def __init__(self, i, o, **kw):
        super().__init__()
        self.conv = nn.Conv2d(i, o, bias=False, **kw)
        self.bn = nn.BatchNorm2d(o, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class FIDInceptionA(nn.Module):
    def __init__(self, in_ch, pool_ch):
        super().__init__()
        self.branch1x1 = BasicConv2d(in_ch, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(in_ch, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(in_ch, pool_ch, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(
            F.avg_pool2d(x, kernel_size=3, stride=1, padding=1, count_include_pad=False)
        )
        return torch.cat([b1, b5, bd, bp], 1)


class InceptionB(nn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3 = BasicConv2d(in_ch, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = F.max_pool2d(x, kernel_size=3, stride=2)
        return torch.cat([b3, bd, bp], 1)


class FIDInceptionC(nn.Module):
    def __init__(self, in_ch, c7):
        super().__init__()
        self.branch1x1 = BasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = BasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(
            self.branch7x7dbl_4(
                self.branch7x7dbl_3(self.branch7x7dbl_2(self.branch7x7dbl_1(x)))
            )
        )
        bp = self.branch_pool(
            F.avg_pool2d(x, kernel_size=3, stride=1, padding=1, count_include_pad=False)
        )
        return torch.cat([b1, b7, bd, bp], 1)


class InceptionD(nn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(in_ch, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(
            self.branch7x7x3_3(self.branch7x7x3_2(self.branch7x7x3_1(x)))
        )
        bp = F.max_pool2d(x, kernel_size=3, stride=2)
        return torch.cat([b3, b7, bp], 1)


class FIDInceptionE(nn.Module):
    """pool='avg' (Mixed_7b / E_1, count_include_pad=False) or 'max'
    (Mixed_7c / E_2) — torch-fidelity's FID quirk."""

    def __init__(self, in_ch, pool):
        super().__init__()
        self.pool = pool
        self.branch1x1 = BasicConv2d(in_ch, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(in_ch, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(in_ch, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = BasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.pool == "avg":
            bp = F.avg_pool2d(x, kernel_size=3, stride=1, padding=1, count_include_pad=False)
        else:
            bp = F.max_pool2d(x, kernel_size=3, stride=1, padding=1)
        bp = self.branch_pool(bp)
        return torch.cat([b1, b3, bd, bp], 1)


class InceptionTwin(nn.Module):
    """Pool3 feature extractor with torch-fidelity naming and semantics."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = FIDInceptionA(192, 32)
        self.Mixed_5c = FIDInceptionA(256, 64)
        self.Mixed_5d = FIDInceptionA(288, 64)
        self.Mixed_6a = InceptionB(288)
        self.Mixed_6b = FIDInceptionC(768, 128)
        self.Mixed_6c = FIDInceptionC(768, 160)
        self.Mixed_6d = FIDInceptionC(768, 160)
        self.Mixed_6e = FIDInceptionC(768, 192)
        self.Mixed_7a = InceptionD(768)
        self.Mixed_7b = FIDInceptionE(1280, pool="avg")
        self.Mixed_7c = FIDInceptionE(2048, pool="max")

    def forward(self, x):
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, kernel_size=3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, kernel_size=3, stride=2)
        for name in (
            "Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b", "Mixed_6c",
            "Mixed_6d", "Mixed_6e", "Mixed_7a", "Mixed_7b", "Mixed_7c",
        ):
            x = getattr(self, name)(x)
        return x.mean(dim=(2, 3))


def _randomize_bn(m):
    """Random running stats + affine params so BN inference math is actually
    exercised (fresh BN would be an identity up to eps)."""
    g = torch.Generator().manual_seed(0)
    for mod in m.modules():
        if isinstance(mod, nn.BatchNorm2d):
            with torch.no_grad():
                mod.running_mean.uniform_(-0.2, 0.2, generator=g)
                mod.running_var.uniform_(0.5, 1.5, generator=g)
                mod.weight.uniform_(0.5, 1.5, generator=g)
                mod.bias.uniform_(-0.2, 0.2, generator=g)


@pytest.fixture(scope="module")
def twin():
    torch.manual_seed(0)
    m = InceptionTwin().eval()
    _randomize_bn(m)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params = convert_inception_state_dict(sd)
    return m, params


@pytest.mark.slow
class TestInceptionNumericalParity:
    def test_pool3_features_match(self, twin):
        m, params = twin
        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 3, 299, 299)).astype(np.float32) * 0.5
        with torch.no_grad():
            feat_t = m(torch.from_numpy(x)).numpy()
        feat_j = np.asarray(inception_forward(params, x))
        assert feat_j.shape == (2, 2048)
        np.testing.assert_allclose(feat_j, feat_t, rtol=1e-3, atol=1e-4)

    def test_full_extractor_pipeline(self, twin):
        """uint8 images through InceptionV3Features vs the torch-fidelity
        pipeline (TF1x resize then (x-128)/128)."""
        m, params = twin
        rng = np.random.default_rng(2)
        imgs = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
        extractor = InceptionV3Features(params=params, batch_jit=False)
        feat_j = extractor(imgs)

        x = torch.from_numpy(imgs.astype(np.float32))
        mh = torch.from_numpy(tf1x_resize_matrix(64, 299))
        x = torch.einsum("oh,nhwc,pw->nopc", mh, x, mh)
        x = (x - 128.0) / 128.0
        with torch.no_grad():
            feat_t = m(x.permute(0, 3, 1, 2)).numpy()
        np.testing.assert_allclose(feat_j, feat_t, rtol=1e-3, atol=1e-4)


class TestTF1xResize:
    def test_matches_naive_formula(self):
        """src = dst * in/out, floor + lerp, edge clamp (TF1
        resize_bilinear(align_corners=False) — what torch-fidelity's
        interpolate_bilinear_2d_like_tensorflow1x computes)."""
        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, 5, 7, 2)).astype(np.float32)
        out_h, out_w = 11, 3

        def naive(img):
            h, w = img.shape
            out = np.zeros((out_h, out_w), np.float32)
            for i in range(out_h):
                for j in range(out_w):
                    sy, sx = i * h / out_h, j * w / out_w
                    y0, x0 = int(np.floor(sy)), int(np.floor(sx))
                    y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                    fy, fx = sy - y0, sx - x0
                    top = img[y0, x0] * (1 - fx) + img[y0, x1] * fx
                    bot = img[y1, x0] * (1 - fx) + img[y1, x1] * fx
                    out[i, j] = top * (1 - fy) + bot * fy
            return out

        got = np.asarray(tf1x_resize(x, out_h, out_w))
        for c in range(2):
            np.testing.assert_allclose(
                got[0, :, :, c], naive(x[0, :, :, c]), rtol=1e-5, atol=1e-6
            )

    def test_identity_when_same_size(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((1, 8, 8, 1)).astype(np.float32)
        np.testing.assert_allclose(np.asarray(tf1x_resize(x, 8, 8)), x, atol=1e-6)
