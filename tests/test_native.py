"""Native C++ zip/PNG loader tests: pixel-exact parity with PIL."""

import io
import zipfile

import numpy as np
import pytest

from cips3d_tpu.data.zip_dataset import ZipImageDataset, write_stylegan_zip

native = pytest.importorskip("cips3d_tpu.native")


@pytest.fixture(scope="module")
def lib_ok():
    if native.get_lib() is None:
        pytest.skip("native zipreader could not be built")
    return True


def _write_zip(path, imgs, fmt="png", compress=zipfile.ZIP_STORED):
    from PIL import Image

    with zipfile.ZipFile(path, "w", compress) as zf:
        for i, arr in enumerate(imgs):
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format=fmt.upper())
            zf.writestr(f"img{i:04d}.{fmt}", buf.getvalue())


class TestNativeReader:
    def test_names_and_raw(self, tmp_path, lib_ok):
        rng = np.random.default_rng(0)
        imgs = [rng.integers(0, 255, (12, 10, 3), dtype=np.uint8) for _ in range(3)]
        p = str(tmp_path / "a.zip")
        _write_zip(p, imgs)
        r = native.NativeZipReader(p)
        assert len(r) == 3
        assert r.names[0] == "img0000.png"
        raw = r.read_raw(0)
        assert raw[:8] == b"\x89PNG\r\n\x1a\n"
        r.close()

    @pytest.mark.parametrize("compress", [zipfile.ZIP_STORED, zipfile.ZIP_DEFLATED])
    def test_png_decode_matches_pil(self, tmp_path, lib_ok, compress):
        from PIL import Image

        rng = np.random.default_rng(1)
        imgs = [rng.integers(0, 255, (16, 16, 3), dtype=np.uint8) for _ in range(2)]
        p = str(tmp_path / "b.zip")
        _write_zip(p, imgs, compress=compress)
        r = native.NativeZipReader(p)
        for i, ref in enumerate(imgs):
            out = r.read_image(i)
            np.testing.assert_array_equal(out, ref)
        r.close()

    def test_grayscale_and_rgba(self, tmp_path, lib_ok):
        from PIL import Image

        gray = np.random.default_rng(2).integers(0, 255, (8, 8), dtype=np.uint8)
        rgba = np.random.default_rng(3).integers(0, 255, (8, 8, 4), dtype=np.uint8)
        with zipfile.ZipFile(str(tmp_path / "c.zip"), "w") as zf:
            for name, arr, mode in (("g.png", gray, "L"), ("a.png", rgba, "RGBA")):
                buf = io.BytesIO()
                Image.fromarray(arr, mode).save(buf, format="PNG")
                zf.writestr(name, buf.getvalue())
        r = native.NativeZipReader(str(tmp_path / "c.zip"))
        names = {n: i for i, n in enumerate(r.names)}
        g = r.read_image(names["g.png"])
        np.testing.assert_array_equal(g[..., 0], gray)
        np.testing.assert_array_equal(g[..., 1], gray)
        a = r.read_image(names["a.png"])
        np.testing.assert_array_equal(a, rgba[..., :3])
        r.close()

    def test_dataset_uses_native_path(self, tmp_path, lib_ok):
        rng = np.random.default_rng(4)
        imgs = [rng.integers(0, 255, (8, 8, 3), dtype=np.uint8) for _ in range(4)]
        p = str(tmp_path / "d.zip")
        write_stylegan_zip(p, imgs)
        ds = ZipImageDataset(p, use_native=True)
        assert ds._native is not None
        for i in range(4):
            np.testing.assert_array_equal(ds[i][0], imgs[i].transpose(2, 0, 1))
        # parity with the PIL path
        ds_pil = ZipImageDataset(p, use_native=False)
        for i in range(4):
            np.testing.assert_array_equal(ds[i][0], ds_pil[i][0])
