"""StyleGAN-zip image dataset + host-side loader.

Native replacement for the external tl2 dataset the reference trains from
(`tl2.proj.pytorch.examples.dataset_stylegan3.dataset.ImageFolderDataset_of_stylegan`,
wired at `exp/cips3d/scripts/train.py:31,299-305` with config
`exp/cips3d/configs/ffhq_exp.yaml:103-114`): a zip of PNG/JPG images plus an
optional ``dataset.json`` with labels; options ``xflip`` (doubles the dataset
with mirrored copies), ``resize_resolution``, and ``max_size``.

Loader design (TPU-first): the host pipeline decodes and resizes with PIL in
a small thread pool, assembles NCHW uint8 batches, and normalizes to [-1, 1]
on device (`to_norm_tensor` analogue).  Multi-host: each process reads its
``jax.process_index()``-strided shard (the DistributedSampler analogue,
`exp/pigan/datasets.py:168-192`).
"""

from __future__ import annotations

import json
import os
import queue
import sys
import threading
import zipfile
from typing import Iterator, List, Optional, Tuple

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


class ZipImageDataset:
    """Random-access view over a StyleGAN-format image zip."""

    def __init__(
        self,
        path: str,
        resize_resolution: Optional[int] = None,
        xflip: bool = False,
        max_size: Optional[int] = None,
        use_labels: bool = False,
        use_native: bool = True,
        cache_decoded: bool = False,
    ):
        self.path = path
        self.resize_resolution = resize_resolution
        self.xflip = xflip
        self.use_labels = use_labels
        self.cache_decoded = cache_decoded
        self._cache: Optional[np.memmap] = None
        self._cache_done: Optional[np.memmap] = None
        self._local = threading.local()

        # optional native C++ reader (zip parse + PNG decode); PIL fallback
        self._native = None
        self._native_idx = {}
        if use_native:
            try:
                from cips3d_tpu.native import NativeZipReader

                self._native = NativeZipReader(path)
                self._native_idx = {n: i for i, n in enumerate(self._native.names)}
            except Exception:
                self._native = None

        with zipfile.ZipFile(path) as zf:
            names = [n for n in zf.namelist() if n.lower().endswith(IMAGE_EXTS)]
            names.sort()
            self._labels = None
            if use_labels and "dataset.json" in zf.namelist():
                meta = json.loads(zf.read("dataset.json"))
                label_map = dict(meta.get("labels") or [])
                self._labels = [label_map.get(n, 0) for n in names]
        if max_size is not None:
            names = names[:max_size]
            if self._labels:
                self._labels = self._labels[:max_size]
        self._names = names
        self._base_len = len(names)
        if self._base_len == 0:
            raise ValueError(f"no images found in {path}")

    def __len__(self) -> int:
        return self._base_len * (2 if self.xflip else 1)

    @property
    def resolution(self) -> int:
        img = self[0][0]
        return img.shape[-1]

    def _zf(self) -> zipfile.ZipFile:
        # one open zip handle per reader thread
        if not hasattr(self._local, "zf"):
            self._local.zf = zipfile.ZipFile(self.path)
        return self._local.zf

    _cache_lock = threading.Lock()

    def _ensure_cache(self, res: int):
        if self._cache is not None:
            return
        with self._cache_lock:
            if self._cache is not None:
                return
            base = f"{self.path}.decoded_{res}"
            shape = (self._base_len, res, res, 3)
            data_p, done_p = base + ".npy", base + ".done.npy"

            def _open_existing():
                cache = np.lib.format.open_memmap(data_p, mode="r+")
                assert cache.shape == shape
                done = np.lib.format.open_memmap(done_p, mode="r+")
                assert done.shape == (self._base_len,)
                return cache, done

            try:
                cache, done = _open_existing()
            except (FileNotFoundError, AssertionError, ValueError):
                # Cross-process-safe creation: never truncate a path another
                # process may have mapped (open_memmap mode='w+' on the live
                # path zeroes pages whose done flags still read 1).  Build
                # fresh inodes under temp names and atomically rename into
                # place; an flock serializes concurrent creators.
                import fcntl

                with open(base + ".lock", "w") as lk:
                    fcntl.flock(lk, fcntl.LOCK_EX)
                    try:
                        cache, done = _open_existing()
                    except (FileNotFoundError, AssertionError, ValueError):
                        tmp = f"{base}.tmp{os.getpid()}"
                        c = np.lib.format.open_memmap(
                            tmp + ".npy", mode="w+", dtype=np.uint8, shape=shape
                        )
                        d = np.lib.format.open_memmap(
                            tmp + ".done.npy", mode="w+", dtype=np.uint8,
                            shape=(self._base_len,),
                        )
                        c.flush()
                        d.flush()
                        del c, d
                        os.replace(tmp + ".npy", data_p)
                        os.replace(tmp + ".done.npy", done_p)
                        cache, done = _open_existing()
            self._cache_done = done
            self._cache = cache

    def _decode(self, base_idx: int) -> np.ndarray:
        """Decode one image (native PNG reader, PIL fallback) + resize → HWC u8."""
        name = self._names[base_idx]
        arr = None
        if self._native is not None and name.lower().endswith(".png"):
            nidx = self._native_idx.get(name)
            if nidx is not None:
                try:
                    arr = self._native.read_image(nidx)  # HWC RGB8
                except IOError:
                    arr = None  # unsupported PNG flavor → PIL fallback
        if arr is None:
            import io

            data = self._zf().read(name)
            arr = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"), np.uint8)

        if self.resize_resolution and arr.shape[:2] != (self.resize_resolution,) * 2:
            img = Image.fromarray(arr).resize(
                (self.resize_resolution, self.resize_resolution), Image.LANCZOS
            )
            arr = np.asarray(img, np.uint8)
        return arr

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, int]:
        """Returns (CHW uint8 image, label)."""
        flip = self.xflip and idx >= self._base_len
        base_idx = idx % self._base_len

        if self.cache_decoded:
            # decode-once cache: PNG decode dominates the host pipeline at
            # high resolution (the r256 live loop ran 8.7 imgs/s decode-bound
            # vs 14.7 imgs/s pure step rate), and every epoch re-decodes the
            # same images — memoize decoded+resized pixels in a uint8 memmap
            # beside the zip.  Racing fills are benign (same bytes).
            arr0 = self._decode(base_idx) if self._cache is None else None
            if arr0 is not None:
                self._ensure_cache(arr0.shape[0])
                self._cache[base_idx] = arr0
                self._cache_done[base_idx] = 1
                arr = arr0
            elif self._cache_done[base_idx]:
                arr = np.asarray(self._cache[base_idx])
            else:
                arr = self._decode(base_idx)
                self._cache[base_idx] = arr
                self._cache_done[base_idx] = 1
        else:
            arr = self._decode(base_idx)

        if flip:
            arr = arr[:, ::-1]
        arr = arr.transpose(2, 0, 1)  # CHW
        label = self._labels[base_idx] if self._labels else 0
        return arr, label


def to_norm_tensor(batch_u8: np.ndarray) -> np.ndarray:
    """uint8 [0,255] → float32 [-1, 1] (tl2 `to_norm_tensor` analogue)."""
    return batch_u8.astype(np.float32) / 127.5 - 1.0


class DataLoader:
    """Infinite shuffled batch iterator with background prefetch.

    Per-host sharding: with ``num_shards`` processes, shard ``shard_index``
    reads indices ``i * num_shards + shard_index`` of each epoch permutation
    (DistributedSampler semantics).
    """

    def __init__(
        self,
        dataset: ZipImageDataset,
        batch_size: int,
        seed: int = 0,
        shard_index: int = 0,
        num_shards: int = 1,
        num_workers: int = 4,
        prefetch: int = 4,
        shuffle: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.num_workers = max(1, num_workers)
        self.shuffle = shuffle
        self._queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    def _index_stream(self) -> Iterator[int]:
        rng = np.random.default_rng(self.seed)
        n = len(self.dataset)
        while True:
            order = rng.permutation(n) if self.shuffle else np.arange(n)
            for i in range(self.shard_index, n, self.num_shards):
                yield int(order[i])

    def _producer(self):
        from concurrent.futures import ThreadPoolExecutor

        stream = self._index_stream()
        with ThreadPoolExecutor(self.num_workers) as pool:
            while not self._stop.is_set():
                idxs = [next(stream) for _ in range(self.batch_size)]
                try:
                    items = list(pool.map(self.dataset.__getitem__, idxs))
                except BaseException as e:
                    # Interpreter/loader shutdown marks executors closed
                    # ("cannot schedule new futures after shutdown") — the
                    # consumer is gone, just stop.  Anything else is a real
                    # decode/reader failure: stash it so __next__ can raise
                    # instead of blocking forever on an empty queue.
                    if (
                        self._stop.is_set()
                        or sys.is_finalizing()
                        or "after shutdown" in str(e)
                    ):
                        return
                    self._error = e
                    return
                imgs = np.stack([it[0] for it in items])
                labels = np.array([it[1] for it in items], np.int32)
                while not self._stop.is_set():
                    try:
                        self._queue.put((imgs, labels), timeout=1)
                        break
                    except queue.Full:  # consumer slow or gone; re-check stop
                        continue

    def __iter__(self):
        return self

    def __next__(self) -> Tuple[np.ndarray, np.ndarray]:
        while True:
            try:
                return self._queue.get(timeout=1)
            except queue.Empty:
                if self._error is not None:
                    raise RuntimeError(
                        "DataLoader producer thread failed"
                    ) from self._error
                if not self._thread.is_alive() and self._queue.empty():
                    raise RuntimeError("DataLoader producer thread exited")

    def close(self):
        self._stop.set()
        # drain so a producer blocked in put() can observe the stop flag,
        # then join it — otherwise a daemon producer racing interpreter
        # shutdown dies in ThreadPoolExecutor.submit
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=10)


def write_stylegan_zip(
    out_path: str,
    images: List[np.ndarray],
    labels: Optional[List[int]] = None,
    fmt: str = "png",
):
    """Write HWC uint8 images into a StyleGAN-format zip (+ dataset.json)."""
    import io

    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_STORED) as zf:
        names = []
        for i, arr in enumerate(images):
            name = f"img{i:08d}.{fmt}"
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format=fmt.upper())
            zf.writestr(name, buf.getvalue())
            names.append(name)
        if labels is not None:
            meta = {"labels": [[n, int(l)] for n, l in zip(names, labels)]}
            zf.writestr("dataset.json", json.dumps(meta))
