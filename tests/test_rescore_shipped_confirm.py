"""tools/rescore_shipped_confirm.py: score a fabricated shipped leg under
several extractor seeds and gate against a fabricated stored sin-A/B
rescore.  Covers `rescore_sin_ab.score_leg` (archived-dump scoring) too."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_images(path, n, seed, like_real=False):
    from PIL import Image

    os.makedirs(path, exist_ok=True)
    rng = np.random.RandomState(seed)
    for i in range(n):
        if like_real:
            # smooth gradient + small noise: "real" distribution
            base = np.linspace(0, 255, 32, dtype=np.float32)
            img = np.broadcast_to(base[None, :, None], (32, 32, 3)).copy()
            img += rng.normal(0, 8, img.shape)
        else:
            img = rng.uniform(0, 255, (32, 32, 3))
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
            os.path.join(path, f"img_{i:04d}.png"))


@pytest.mark.slow
def test_per_seed_gate(tmp_path):
    leg = tmp_path / "campaign" / "shipped" / "train_r64" / "fid"
    # real dir: gradient images; fakes converge toward the real distribution
    _write_images(str(leg / "real"), 12, seed=0, like_real=True)
    _write_images(str(leg / "fake_step000100"), 12, seed=1, like_real=False)
    _write_images(str(leg / "fake_step000200"), 12, seed=2, like_real=True)

    # stored A/B rescore with an exact leg the shipped leg must beat and a
    # fast leg for context; steps need not match the shipped leg's
    ab = {
        "curves": {
            nm: {str(s): {str(seed): base + 1.0 / s for seed in (0, 1)}
                 for s in (100, 200)}
            for nm, base in (("exact", 1e9), ("fast", 1e-9))
        }
    }
    ab_path = tmp_path / "ab.json"
    ab_path.write_text(json.dumps(ab))

    out = tmp_path / "docs_out"
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "tools", "rescore_shipped_confirm.py"),
         str(tmp_path / "campaign"), str(out), "--stage", "train_r64",
         "--seeds", "0", "1", "--last-n", "2",
         "--ab-rescore", str(ab_path)],
        capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr
    res = json.loads((out / "RESCORE_SEEDS.json").read_text())
    assert res["n_evals"] == 2
    assert set(res["per_seed"]) == {"0", "1"}
    for seed in ("0", "1"):
        ps = res["per_seed"][seed]
        # vs the 1e9 exact leg every real score passes; margin positive
        assert ps["gate_pass"] is True
        assert ps["gate_margin"] > 0
        # vs the ~0 fast leg the shipped score is worse -> positive diff
        assert ps["shipped_minus_fast"] > 0
    assert res["gate_pass_all_seeds"] is True
    # the fake_step000200 dump matches the real distribution, so its FID
    # must be far below the noise dump's, under every seed
    curves = res["curves_shipped"]
    for seed in ("0", "1"):
        assert curves["200"][seed] < curves["100"][seed]
