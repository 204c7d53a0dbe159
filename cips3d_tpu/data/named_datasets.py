"""Named pi-GAN dataset loaders: FFHQ / CelebA / Cats / Carla.

Counterparts of `exp/pigan/datasets.py:26-152` adapted to this framework's
loader convention (`data/zip_dataset.py`): ``__getitem__`` returns
``(CHW uint8, label)`` and normalization to [-1, 1] happens on device.  The
reference's ``RandomHorizontalFlip(p=0.5)`` becomes xflip dataset doubling
(distribution-equivalent under shuffling, and deterministic per index — the
StyleGAN-zip convention this repo uses everywhere).

Per-dataset transforms (faithful to `datasets.py`):
  * FFHQ (`datasets.py:26-79`): image-list file; bilinear resize to img_size;
    hflip on by default.
  * CelebA (`datasets.py:82-114`): image-list file; shorter-side resize 320
    (bilinear) → center-crop 256 → NEAREST resize to img_size; hflip.
  * Cats (`datasets.py:115-132`): folder/glob of jpgs; NEAREST resize; hflip.
  * Carla (`datasets.py:134-152`): folder/glob of pngs; NEAREST resize;
    no flip.

Paths are explicit arguments (the reference hardcodes absolute home-dir
globs); ``get_dataset`` mirrors `datasets.py:155` name-based construction.
"""

from __future__ import annotations

import glob as globlib
import os
from typing import List, Optional, Tuple

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def read_image_list(path: str) -> List[str]:
    """One image path per line; relative paths resolve against the file's
    directory (tl2 `read_image_list_from_files` analogue)."""
    base = os.path.dirname(path)
    out = []
    with open(path) as f:
        for line in f:
            p = line.strip().split()[0] if line.strip() else ""
            if not p:
                continue
            out.append(p if os.path.isabs(p) else os.path.join(base, p))
    return out


def _resize(arr: np.ndarray, size: Tuple[int, int], interp) -> np.ndarray:
    return np.asarray(Image.fromarray(arr).resize((size[1], size[0]), interp), np.uint8)


def _resize_shorter(arr: np.ndarray, target: int) -> np.ndarray:
    """torchvision Resize(int): shorter side → target, keep aspect."""
    h, w = arr.shape[:2]
    if h <= w:
        size = (target, max(1, round(w * target / h)))
    else:
        size = (max(1, round(h * target / w)), target)
    return _resize(arr, size, Image.BILINEAR)


def _center_crop(arr: np.ndarray, size: int) -> np.ndarray:
    h, w = arr.shape[:2]
    top = (h - size) // 2
    left = (w - size) // 2
    return arr[top : top + size, left : left + size]


class _FileListDataset:
    """Base: file list + per-image transform; xflip doubling for hflip."""

    def __init__(self, files: List[str], img_size: int, hflip: bool):
        if not files:
            raise FileNotFoundError(
                "Can't find data; make sure you specify the path to your dataset"
            )
        self.files = files
        self.img_size = img_size
        self.hflip = hflip

    def __len__(self) -> int:
        return len(self.files) * (2 if self.hflip else 1)

    def _load(self, path: str) -> np.ndarray:
        return np.asarray(Image.open(path).convert("RGB"), np.uint8)

    def _transform(self, arr: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, int]:
        base = len(self.files)
        flip = self.hflip and idx >= base
        arr = self._transform(self._load(self.files[idx % base]))
        if flip:
            arr = arr[:, ::-1]
        return arr.transpose(2, 0, 1), 0  # CHW u8

    @property
    def resolution(self) -> int:
        return self.img_size


class FFHQ(_FileListDataset):
    """`datasets.py:26-79`: image-list file, bilinear resize."""

    def __init__(self, img_size: int, image_list_file: str, horizontal_flip: bool = True):
        super().__init__(read_image_list(image_list_file), img_size, horizontal_flip)

    def _transform(self, arr: np.ndarray) -> np.ndarray:
        if arr.shape[:2] != (self.img_size,) * 2:
            arr = _resize(arr, (self.img_size, self.img_size), Image.BILINEAR)
        return arr


class CelebA(_FileListDataset):
    """`datasets.py:82-114`: shorter-side 320 → center-crop 256 → nearest
    resize to img_size."""

    def __init__(self, img_size: int, image_list_file: str, horizontal_flip: bool = True):
        super().__init__(read_image_list(image_list_file), img_size, horizontal_flip)

    def _transform(self, arr: np.ndarray) -> np.ndarray:
        arr = _center_crop(_resize_shorter(arr, 320), 256)
        if arr.shape[:2] != (self.img_size,) * 2:
            arr = _resize(arr, (self.img_size, self.img_size), Image.NEAREST)
        return arr


class _GlobDataset(_FileListDataset):
    def __init__(self, img_size: int, source: str, pattern: str, hflip: bool):
        if os.path.isdir(source):
            files = sorted(globlib.glob(os.path.join(source, pattern)))
        else:
            files = sorted(globlib.glob(source))
        super().__init__(files, img_size, hflip)

    def _transform(self, arr: np.ndarray) -> np.ndarray:
        if arr.shape[:2] != (self.img_size,) * 2:
            arr = _resize(arr, (self.img_size, self.img_size), Image.NEAREST)
        return arr


class Cats(_GlobDataset):
    """`datasets.py:115-132`: jpg folder, nearest resize, hflip."""

    def __init__(self, img_size: int, source: str):
        super().__init__(img_size, source, "*.jpg", hflip=True)


class Carla(_GlobDataset):
    """`datasets.py:134-152`: png folder, nearest resize, NO flip."""

    def __init__(self, img_size: int, source: str):
        super().__init__(img_size, source, "*.png", hflip=False)


_DATASETS = {"FFHQ": FFHQ, "CelebA": CelebA, "Cats": Cats, "Carla": Carla}


def get_dataset(name: str, img_size: int, **kwargs):
    """Name-based construction (`datasets.py:155-156`); the result plugs into
    `cips3d_tpu.data.zip_dataset.DataLoader` for sharded batch iteration."""
    try:
        cls = _DATASETS[name]
    except KeyError:
        raise ValueError(f"unknown dataset {name!r}; have {sorted(_DATASETS)}")
    return cls(img_size=img_size, **kwargs)
