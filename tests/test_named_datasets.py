"""Named pi-GAN dataset loaders (`exp/pigan/datasets.py:26-152`)."""

import numpy as np
import pytest
from PIL import Image

from cips3d_tpu.data.named_datasets import (
    Carla,
    Cats,
    CelebA,
    FFHQ,
    get_dataset,
    read_image_list,
)


def _write_images(tmp_path, n, size, ext="png"):
    paths = []
    rng = np.random.default_rng(0)
    for i in range(n):
        arr = rng.integers(0, 256, (size[0], size[1], 3), dtype=np.uint8)
        p = tmp_path / f"img_{i}.{ext}"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    return paths


def _write_list(tmp_path, paths):
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join(paths) + "\n")
    return str(lst)


class TestFFHQ:
    def test_resize_and_flip_doubling(self, tmp_path):
        paths = _write_images(tmp_path, 3, (40, 40))
        ds = FFHQ(img_size=16, image_list_file=_write_list(tmp_path, paths))
        assert len(ds) == 6  # hflip doubles
        img, label = ds[0]
        assert img.shape == (3, 16, 16) and img.dtype == np.uint8 and label == 0
        base, _ = ds[1]
        flipped, _ = ds[1 + 3]
        np.testing.assert_array_equal(flipped, base[:, :, ::-1])

    def test_relative_paths_resolve(self, tmp_path):
        _write_images(tmp_path, 2, (16, 16))
        lst = tmp_path / "rel.txt"
        lst.write_text("img_0.png\nimg_1.png\n")
        assert len(read_image_list(str(lst))) == 2
        ds = FFHQ(img_size=16, image_list_file=str(lst), horizontal_flip=False)
        assert len(ds) == 2 and ds[0][0].shape == (3, 16, 16)


class TestCelebA:
    def test_crop_chain(self, tmp_path):
        # 178x218 portrait (the real img_align_celeba geometry): shorter side
        # 178 → 320 keeps aspect (320x392), center-crop 256, resize img_size
        paths = _write_images(tmp_path, 2, (218, 178), ext="jpg")
        ds = CelebA(img_size=32, image_list_file=_write_list(tmp_path, paths))
        img, _ = ds[0]
        assert img.shape == (3, 32, 32)

    def test_center_crop_content(self, tmp_path):
        # a 512x640 image whose center 256-block (after shorter-side-320
        # resize = exact 2x downscale) is constant → crop must be constant
        arr = np.zeros((640, 512, 3), np.uint8)
        arr[64:576, :, :] = 200  # center 512 rows after 2x downscale → 256
        p = tmp_path / "c.png"
        Image.fromarray(arr).save(p)
        ds = CelebA(img_size=256, image_list_file=_write_list(tmp_path, [str(p)]))
        img, _ = ds[0]
        assert img.shape == (3, 256, 256)
        assert int(img.min()) >= 190  # constant center region survives crop


class TestGlobs:
    def test_cats_glob_and_flip(self, tmp_path):
        _write_images(tmp_path, 2, (20, 20), ext="jpg")
        ds = Cats(img_size=16, source=str(tmp_path))
        assert len(ds) == 4  # hflip
        assert ds[0][0].shape == (3, 16, 16)

    def test_carla_no_flip(self, tmp_path):
        _write_images(tmp_path, 3, (20, 20), ext="png")
        ds = Carla(img_size=16, source=str(tmp_path))
        assert len(ds) == 3  # no flip
        assert ds[2][0].shape == (3, 16, 16)

    def test_missing_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            Cats(img_size=16, source=str(tmp_path / "empty"))


class TestFactoryAndLoader:
    def test_get_dataset(self, tmp_path):
        _write_images(tmp_path, 2, (16, 16), ext="png")
        ds = get_dataset("Carla", img_size=16, source=str(tmp_path))
        assert isinstance(ds, Carla)
        with pytest.raises(ValueError):
            get_dataset("Nope", img_size=16)

    def test_dataloader_integration(self, tmp_path):
        from cips3d_tpu.data.zip_dataset import DataLoader

        _write_images(tmp_path, 4, (16, 16), ext="jpg")
        ds = Cats(img_size=16, source=str(tmp_path))
        loader = DataLoader(ds, batch_size=2, num_workers=1, prefetch=1)
        imgs, labels = next(loader)
        loader.close()
        assert imgs.shape == (2, 3, 16, 16) and imgs.dtype == np.uint8
        assert labels.shape == (2,)
