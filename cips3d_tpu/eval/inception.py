"""FID InceptionV3 feature extractor (JAX).

The reference computes FID with torch-fidelity's InceptionV3
(`weights-inception-2015-12-05`, wired at
`exp/cips3d/configs/ffhq_exp.yaml:16-20` and `eval_fid.py:42-50`).  For
reference-comparable numbers the same pretrained weights are required; this
module implements the *FID variant* of the architecture in JAX and a
converter from the torch checkpoint.  Without a weights file on disk (this
environment has zero egress), `find_weights()` returns None and callers fall
back to the surrogate extractor in `cips3d_tpu.eval.fid`.

Weight search order:
  1. $CIPS3D_INCEPTION_WEIGHTS
  2. ~/.cache/torch/hub/checkpoints/weights-inception-2015-12-05*.pth
  3. ./cache_pretrained/weights-inception-2015-12-05*.pth
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import numpy as np


def find_weights() -> Optional[str]:
    env = os.environ.get("CIPS3D_INCEPTION_WEIGHTS")
    if env and os.path.exists(env):
        return env
    patterns = [
        os.path.expanduser("~/.cache/torch/hub/checkpoints/weights-inception-2015-12-05*.pth"),
        "cache_pretrained/weights-inception-2015-12-05*.pth",
        os.path.expanduser("~/.cache/torch/hub/checkpoints/pt_inception*.pth"),
    ]
    for p in patterns:
        hits = sorted(glob.glob(p))
        if hits:
            return hits[0]
    return None


class InceptionV3Features:
    """Callable (n, H, W, 3) uint8 → (n, 2048) pool3 features.

    Architecture port of the FID InceptionV3 (torch-fidelity
    `FeatureExtractorInceptionV3`).  Weights are loaded from the torch
    checkpoint via `load_torch_state_dict`.

    NOTE: full layer-by-layer port lands with the checkpoint-conversion
    milestone; constructing this without a weights file raises.
    """

    def __init__(self, weights_path: str):
        if not os.path.exists(weights_path):
            raise FileNotFoundError(weights_path)
        self.params = load_torch_state_dict(weights_path)
        raise NotImplementedError(
            "InceptionV3 JAX port pending (blocked on having the pretrained "
            "weights available to validate against; this environment has no "
            "network egress and no cached checkpoint). Use "
            "cips3d_tpu.eval.fid.surrogate_extractor for relative tracking."
        )


def load_torch_state_dict(path: str) -> dict:
    """Load a torch .pth state dict into numpy arrays (CPU torch)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}
