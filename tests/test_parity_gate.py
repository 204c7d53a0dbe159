"""tools/parity_gate.py — the preflight must (a) print an actionable
manifest with nothing present, and (b) run the real validations unattended
when artifacts exist (here: synthesized stand-ins at tiny scale)."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
sys.path.insert(0, os.path.dirname(__file__))

import parity_gate  # noqa: E402


class TestProbeAndManifest:
    def test_dry_run_names_all_missing(self, capsys, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)  # nothing present here
        monkeypatch.delenv("CIPS3D_INCEPTION_WEIGHTS", raising=False)
        rc = parity_gate.main(["--dry-run"])
        out = capsys.readouterr().out
        assert rc == 1
        assert "FFHQ data:        MISSING" in out
        assert "weights-inception-2015-12-05-6726825d.pth" in out
        assert "train_ffhq_high-20220105_143314_190" in out
        assert "torch-fidelity/releases" in out


class TestCheckpointCheck:
    def test_converts_and_validates_random_v16(self, tmp_path, capsys):
        """A random-init v16 checkpoint (the released format) passes
        conversion + torch-forward validation + reverse round-trip."""
        import tl2_stub

        tl2_stub.install()
        from exp.dev.nerf_inr.models import generator_nerf_inr_v16 as ref_v16

        torch.manual_seed(0)
        g = ref_v16.GeneratorNerfINR(
            z_dim=256,
            nerf_cfg=dict(in_dim=3, hidden_dim=128, hidden_layers=2,
                          rgb_dim=32, style_dim=128),
            mapping_nerf_cfg=dict(z_dim=256, hidden_dim=128, base_layers=4,
                                  head_layers=0),
            inr_cfg=dict(input_dim=32, style_dim=512, hidden_dim=512,
                         pre_rgb_dim=3),
            mapping_inr_cfg=dict(z_dim=512, hidden_dim=512, base_layers=8,
                                 head_layers=0, norm_out=True),
            device="cpu",
        )
        ckpt = tmp_path / "G_ema.pth"
        torch.save(g.state_dict(), str(ckpt))

        assert parity_gate.check_checkpoint(str(ckpt))
        out = capsys.readouterr().out
        assert "reverse round-trip: exact" in out
        assert "mapping max abs err" in out and "OK" in out


class TestDataCheck:
    def test_zip_probe(self, tmp_path, capsys, monkeypatch):
        from cips3d_tpu.data.zip_dataset import write_stylegan_zip

        rng = np.random.default_rng(0)
        zp = tmp_path / "ffhq_256.zip"
        write_stylegan_zip(
            str(zp), [rng.integers(0, 255, (16, 16, 3), dtype=np.uint8) for _ in range(4)]
        )
        assert parity_gate.check_data(str(zp))
        out = capsys.readouterr().out
        assert "4 images at 16x16" in out

    def test_probe_flag_overrides(self, tmp_path):
        from cips3d_tpu.data.zip_dataset import write_stylegan_zip

        rng = np.random.default_rng(0)
        zp = tmp_path / "d.zip"
        write_stylegan_zip(
            str(zp), [rng.integers(0, 255, (8, 8, 3), dtype=np.uint8) for _ in range(2)]
        )
        ns = parity_gate.argparse.Namespace(data=str(zp), inception=None, ckpt=None)
        data, _, _ = parity_gate.probe(ns)
        assert data == str(zp)


@pytest.mark.slow
def test_self_test_end_to_end(tmp_path):
    """--self-test runs every gate stage — dataset check, Inception weights
    load + feature probe, checkpoint conversion + torch-class forward
    validation, and the N/N FID protocol — on synthesized artifacts
    (round-3 verdict next #8: prove the gate runs its protocol, not just
    its probes).  Its first real run caught a latent NHWC/NCHW bug in
    check_inception."""
    rc = parity_gate.main([
        "--self-test",
        "--outdir", str(tmp_path / "gate"),
        "--num-images", "8",
        "--img-size", "32",
        "--num-steps", "3",
        "--batch-size", "4",
    ])
    assert rc == 0
    # the FID protocol actually dumped and scored images
    assert len(list((tmp_path / "gate" / "fid" / "real").glob("*.png"))) == 8
    assert len(list((tmp_path / "gate" / "fid" / "fake").glob("*.png"))) == 8
