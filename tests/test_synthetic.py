"""Procedural multi-view dataset tests (data/synthetic.py)."""

import math

import numpy as np

from cips3d_tpu.data.synthetic import make_blob_dataset, render_scene, sample_scene
from cips3d_tpu.data.zip_dataset import ZipImageDataset


def test_render_deterministic_shape():
    scene = sample_scene(np.random.default_rng(0))
    a = render_scene(scene, math.pi / 2, math.pi / 2, 32)
    b = render_scene(scene, math.pi / 2, math.pi / 2, 32)
    assert a.shape == (32, 32, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)


def test_pose_correlated_appearance():
    """Views of the same identity differ with yaw; the object is visible
    (not all background) and centered-ish."""
    scene = sample_scene(np.random.default_rng(1))
    front = render_scene(scene, math.pi / 2, math.pi / 2, 32)
    side = render_scene(scene, math.pi / 2 + 0.5, math.pi / 2, 32)
    assert np.abs(front.astype(int) - side.astype(int)).mean() > 2.0
    # center pixel hits the sphere in the front view (object inside 0.24 box)
    c = front[14:18, 14:18].astype(float).mean(axis=(0, 1))
    bg = front[0, 0].astype(float)
    assert np.abs(c - bg).max() > 10


def test_identities_differ():
    rng = np.random.default_rng(2)
    a = render_scene(sample_scene(rng), math.pi / 2, math.pi / 2, 32)
    b = render_scene(sample_scene(rng), math.pi / 2, math.pi / 2, 32)
    assert np.abs(a.astype(int) - b.astype(int)).mean() > 2.0


def test_zip_roundtrip(tmp_path):
    p = str(tmp_path / "blobs.zip")
    make_blob_dataset(p, 6, img_size=16, seed=0)
    ds = ZipImageDataset(p)
    assert len(ds) == 6
    img, _ = ds[0]
    assert img.shape == (3, 16, 16) and img.dtype == np.uint8
