"""tools/collect_shipped_confirm.py: score a fabricated confirmation leg
against fabricated committed A/B curves and check the pre-registered gate
logic (PASS iff shipped last-5-mean beats the exact leg)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_curve(path, pairs):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for s, v in pairs:
            f.write(f"{s}: {v}\n")


def _run(root, out, ab):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "collect_shipped_confirm.py"),
         str(root), str(out), "--stage", "train_r64", "--ab-dir", str(ab)],
        capture_output=True, text=True, cwd=REPO,
    )


def _fabricate(tmp_path, shipped_level):
    """Build campaign root + ab dir; shipped curve converges to
    ``shipped_level`` while fast=0.03 and exact=0.05."""
    root = tmp_path / "campaign"
    ab = tmp_path / "ab"
    tdir = root / "shipped" / "train_r64" / "textdir"
    steps = list(range(500, 5001, 500))
    _write_curve(
        str(tdir / "eval.FID_surrogate.FID_surrogate.log"),
        [(s, shipped_level + 1.0 / s) for s in steps],
    )
    _write_curve(
        str(tdir / "train.speed.imgs_per_sec.log"),
        [(s, 120.0) for s in steps],
    )
    _write_curve(str(ab / "fid_fast.log"), [(s, 0.03 + 1.0 / s) for s in steps])
    _write_curve(str(ab / "fid_exact.log"), [(s, 0.05 + 1.0 / s) for s in steps])
    return root, ab


def test_missing_exact_curve_is_fatal(tmp_path):
    """A missing exact-leg curve must hard-fail: exiting 0 without it would
    report collector success with the pre-registered gate silently
    unapplied (SUMMARY.json written with no gate_pass key)."""
    root, ab = _fabricate(tmp_path, shipped_level=0.032)
    os.remove(str(ab / "fid_exact.log"))
    r = _run(root, tmp_path / "docs_out", ab)
    assert r.returncode != 0
    assert "fid_exact.log" in (r.stderr + r.stdout)


def test_gate_pass(tmp_path):
    root, ab = _fabricate(tmp_path, shipped_level=0.032)
    out = tmp_path / "docs_out"
    r = _run(root, out, ab)
    assert r.returncode == 0, r.stderr
    summary = json.loads((out / "SUMMARY.json").read_text())
    assert summary["gate_pass"] is True
    assert summary["gate_margin"] > 0
    assert summary["shipped"]["imgs_per_sec_median"] == 120.0
    assert summary["pointwise_diff_shipped_minus_fast"]["n_shared_evals"] == 10
    assert (out / "FID_surrogate_confirm.png").exists()
    assert (out / "fid_shipped.log").exists()


def test_gate_fail(tmp_path):
    root, ab = _fabricate(tmp_path, shipped_level=0.08)
    out = tmp_path / "docs_out"
    r = _run(root, out, ab)
    assert r.returncode == 0, r.stderr
    summary = json.loads((out / "SUMMARY.json").read_text())
    assert summary["gate_pass"] is False


def test_missing_leg_errors(tmp_path):
    r = _run(tmp_path / "empty", tmp_path / "out", tmp_path / "ab")
    assert r.returncode != 0
    assert "incomplete" in (r.stderr + r.stdout)
