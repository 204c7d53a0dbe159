"""Dataset conversion tool: various sources → StyleGAN-format image zip.

Counterpart of `scripts/dataset_tool.py` (reference CLI `convert_dataset`,
`dataset_tool.py:398-550`): sources are an image folder, an existing zip, an
LMDB database, CIFAR-10 / MNIST archives, or a text file listing image paths;
transforms are center-crop, center-crop-wide, and zero/mirror padding to
square (`dataset_tool.py:220-318`); output is a zip of PNGs plus
``dataset.json`` labels.

Usage:
  python -m cips3d_tpu.data.dataset_tool --source DIR_OR_FILE --dest out.zip \
      [--resolution 256] [--transform center-crop|center-crop-wide|pad-zero|pad-mirror]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import zipfile
from typing import Iterator, Optional, Tuple

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp", ".ppm", ".tif", ".tiff")


# --------------------------------------------------------------------- #
# sources — yield (HWC uint8 array, label or None)

def _iter_folder(path: str) -> Iterator[Tuple[np.ndarray, Optional[int]]]:
    files = []
    for root, _, names in os.walk(path):
        for n in sorted(names):
            if n.lower().endswith(IMAGE_EXTS):
                files.append(os.path.join(root, n))
    files.sort()
    for f in files:
        yield np.asarray(Image.open(f).convert("RGB"), np.uint8), None


def _iter_zip(path: str) -> Iterator[Tuple[np.ndarray, Optional[int]]]:
    with zipfile.ZipFile(path) as zf:
        labels = {}
        if "dataset.json" in zf.namelist():
            meta = json.loads(zf.read("dataset.json"))
            labels = dict(meta.get("labels") or [])
        for n in sorted(zf.namelist()):
            if n.lower().endswith(IMAGE_EXTS):
                img = Image.open(io.BytesIO(zf.read(n))).convert("RGB")
                yield np.asarray(img, np.uint8), labels.get(n)


def _iter_image_list(path: str) -> Iterator[Tuple[np.ndarray, Optional[int]]]:
    """Text file with one image path per line (the reference's FFHQ list
    format, `exp/pigan/datasets.py:26-60`)."""
    base = os.path.dirname(path)
    with open(path) as f:
        for line in f:
            p = line.strip().split()[0] if line.strip() else ""
            if not p:
                continue
            if not os.path.isabs(p):
                p = os.path.join(base, p)
            yield np.asarray(Image.open(p).convert("RGB"), np.uint8), None


def _iter_cifar10(path: str) -> Iterator[Tuple[np.ndarray, Optional[int]]]:
    """cifar-10-python.tar.gz batches → images+labels."""
    import pickle
    import tarfile

    with tarfile.open(path) as tar:
        for name in sorted(tar.getnames()):
            if "data_batch" not in name and "test_batch" not in name:
                continue
            member = tar.extractfile(name)
            d = pickle.load(member, encoding="latin1")
            data = d["data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
            for img, label in zip(data, d["labels"]):
                yield np.ascontiguousarray(img, np.uint8), int(label)


def _iter_mnist(path: str) -> Iterator[Tuple[np.ndarray, Optional[int]]]:
    """mnist idx (train-images-idx3-ubyte.gz + labels alongside)."""
    import gzip

    with gzip.open(path, "rb") as f:
        data = np.frombuffer(f.read(), np.uint8, offset=16)
    images = data.reshape(-1, 28, 28)
    labels_path = path.replace("images-idx3", "labels-idx1")
    labels = None
    if os.path.exists(labels_path):
        with gzip.open(labels_path, "rb") as f:
            labels = np.frombuffer(f.read(), np.uint8, offset=8)
    for i, img in enumerate(images):
        rgb = np.stack([img] * 3, axis=-1)
        yield rgb, (int(labels[i]) if labels is not None else None)


def _iter_lmdb(path: str) -> Iterator[Tuple[np.ndarray, Optional[int]]]:  # pragma: no cover
    try:
        import lmdb  # not in the base image; gate gracefully
    except ImportError as e:
        raise RuntimeError("lmdb is not available in this environment") from e
    with lmdb.open(path, readonly=True, lock=False).begin() as txn:
        for _, value in txn.cursor():
            try:
                img = Image.open(io.BytesIO(value)).convert("RGB")
            except Exception:
                continue
            yield np.asarray(img, np.uint8), None


def open_source(source: str):
    if os.path.isdir(source):
        return _iter_folder(source)
    low = source.lower()
    if low.endswith(".zip"):
        return _iter_zip(source)
    if low.endswith(".txt"):
        return _iter_image_list(source)
    if "cifar-10" in low and low.endswith((".tar.gz", ".tgz")):
        return _iter_cifar10(source)
    if "idx3-ubyte" in low:
        return _iter_mnist(source)
    if os.path.isdir(source) or low.endswith(".mdb") or os.path.exists(os.path.join(source, "data.mdb")):
        return _iter_lmdb(source)
    raise ValueError(f"unrecognized source: {source}")


# --------------------------------------------------------------------- #
# transforms (`dataset_tool.py:220-318`)

def center_crop(img: np.ndarray, res: int) -> np.ndarray:
    h, w = img.shape[:2]
    s = min(h, w)
    y0, x0 = (h - s) // 2, (w - s) // 2
    img = img[y0: y0 + s, x0: x0 + s]
    return np.asarray(Image.fromarray(img).resize((res, res), Image.LANCZOS), np.uint8)


def center_crop_wide(img: np.ndarray, res: int) -> np.ndarray:
    """Crop to 2:1 wide aspect then pad to square (reference's wide mode)."""
    h, w = img.shape[:2]
    if w < res:
        return center_crop(img, res)
    im = Image.fromarray(img)
    ratio = res / w
    im = im.resize((res, max(1, round(h * ratio))), Image.LANCZOS)
    arr = np.asarray(im, np.uint8)
    hh = arr.shape[0]
    if hh > res:
        y0 = (hh - res) // 2
        arr = arr[y0: y0 + res]
    elif hh < res:
        pad = res - hh
        arr = np.pad(arr, ((pad // 2, pad - pad // 2), (0, 0), (0, 0)))
    return arr


def pad_to_square(img: np.ndarray, res: int, mode: str = "constant") -> np.ndarray:
    h, w = img.shape[:2]
    s = max(h, w)
    ph, pw = s - h, s - w
    img = np.pad(
        img,
        ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)),
        mode="reflect" if mode == "mirror" else "constant",
    )
    return np.asarray(Image.fromarray(img).resize((res, res), Image.LANCZOS), np.uint8)


def make_transform(name: Optional[str], resolution: Optional[int]):
    if resolution is None:
        return lambda img: img
    if name in (None, "scale"):
        return lambda img: np.asarray(
            Image.fromarray(img).resize((resolution, resolution), Image.LANCZOS), np.uint8
        )
    if name == "center-crop":
        return lambda img: center_crop(img, resolution)
    if name == "center-crop-wide":
        return lambda img: center_crop_wide(img, resolution)
    if name == "pad-zero":
        return lambda img: pad_to_square(img, resolution, "constant")
    if name == "pad-mirror":
        return lambda img: pad_to_square(img, resolution, "mirror")
    raise ValueError(f"unknown transform {name!r}")


# --------------------------------------------------------------------- #

def convert_dataset(
    source: str,
    dest: str,
    resolution: Optional[int] = None,
    transform: Optional[str] = None,
    max_images: Optional[int] = None,
    fmt: str = "png",
) -> int:
    """Convert ``source`` into a StyleGAN zip at ``dest``; returns the image
    count (`dataset_tool.py:398-550`)."""
    tf = make_transform(transform, resolution)
    count = 0
    labels = []
    have_labels = False
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_STORED) as zf:
        for img, label in open_source(source):
            if max_images is not None and count >= max_images:
                break
            img = tf(img)
            name = f"img{count:08d}.{fmt}"
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format=fmt.upper())
            zf.writestr(name, buf.getvalue())
            if label is not None:
                have_labels = True
            labels.append([name, int(label) if label is not None else 0])
            count += 1
        if have_labels:
            zf.writestr("dataset.json", json.dumps({"labels": labels}))
    return count


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", required=True)
    p.add_argument("--dest", required=True)
    p.add_argument("--resolution", type=int, default=None)
    p.add_argument(
        "--transform",
        choices=["scale", "center-crop", "center-crop-wide", "pad-zero", "pad-mirror"],
        default=None,
    )
    p.add_argument("--max-images", type=int, default=None)
    args = p.parse_args(argv)
    n = convert_dataset(args.source, args.dest, args.resolution, args.transform, args.max_images)
    print(f"wrote {n} images to {args.dest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
