"""Tests for config system, checkpointing, textlogger, dataset zip +
dataset_tool (no device compute — fast)."""

import os
import textwrap

import numpy as np
import pytest

from cips3d_tpu.config import (
    apply_dotted_overrides,
    build_model,
    deep_merge,
    register,
    resolve_command,
)
from cips3d_tpu.data.dataset_tool import center_crop, convert_dataset, pad_to_square
from cips3d_tpu.data.zip_dataset import DataLoader, ZipImageDataset, to_norm_tensor, write_stylegan_zip
from cips3d_tpu.utils.checkpoint import CheckpointManager, load_pytree_like, save_pytree
from cips3d_tpu.utils.textlogger import TextLogger, read_log


@pytest.fixture
def yaml_file(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text(
        textwrap.dedent(
            """
            base_node:
              lr: 0.001
              model:
                hidden: 128
                layers: 2
            child:
              base: base_node
              lr: 0.01
              model:
                layers: 4
            grandchild:
              base: child
              extra: true
            """
        )
    )
    return str(p)


class TestConfig:
    def test_inheritance(self, yaml_file):
        cfg = resolve_command(yaml_file, "child")
        assert cfg.lr == 0.01
        assert cfg.model.hidden == 128  # inherited
        assert cfg.model.layers == 4    # overridden

    def test_chained_inheritance(self, yaml_file):
        cfg = resolve_command(yaml_file, "grandchild")
        assert cfg.extra is True
        assert cfg.lr == 0.01
        assert cfg.model.hidden == 128

    def test_dotted_overrides(self, yaml_file):
        cfg = resolve_command(yaml_file, "child", opts=["model.hidden", "64", "lr", "1e-5"])
        assert cfg.model.hidden == 64
        assert cfg.lr == 1e-5

    def test_deep_merge_no_mutation(self):
        a = {"x": {"y": 1}}
        b = {"x": {"z": 2}}
        out = deep_merge(a, b)
        assert out == {"x": {"y": 1, "z": 2}}
        assert a == {"x": {"y": 1}}

    def test_registry(self):
        @register("test.dummy")
        def build(a=1, b=2):
            return (a, b)

        from cips3d_tpu.config import Config

        out = build_model(Config.wrap({"name": "test.dummy", "a": 5}), b=9)
        assert out == (5, 9)


class TestCheckpoint:
    def test_pytree_roundtrip(self, tmp_path):
        tree = {"a": {"b": np.arange(6, dtype=np.float32).reshape(2, 3)}, "c": np.ones(4)}
        p = str(tmp_path / "t.npz")
        save_pytree(p, tree)
        back = load_pytree_like(p, tree)
        np.testing.assert_allclose(back["a"]["b"], tree["a"]["b"])
        np.testing.assert_allclose(back["c"], tree["c"])

    def test_manager_trees(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
        mods = {"generator": {"w": np.ones(3)}}
        mgr.save_snapshot("resume", mods, state={"step": 5, "best_fid": 20.0}, info_msg="hi")
        assert mgr.has_snapshot("resume")
        out = mgr.load_snapshot("resume", mods)
        np.testing.assert_allclose(out["generator"]["w"], 1.0)
        assert mgr.load_state("resume")["step"] == 5

    def test_backup_rotation(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
        mods = {"m": {"w": np.zeros(1)}}
        for i in range(4):
            mgr.save_backup(mods, state={"step": i})
        dirs = sorted(d for d in os.listdir(mgr.ckpt_dir) if d.startswith("ckpt_"))
        assert len(dirs) == 2
        assert dirs == ["ckpt_00000002", "ckpt_00000003"]

    def test_shape_mismatch_raises(self, tmp_path):
        p = str(tmp_path / "t.npz")
        save_pytree(p, {"w": np.ones(3)})
        with pytest.raises(ValueError):
            load_pytree_like(p, {"w": np.ones(4)})


class TestTextLogger:
    def test_roundtrip(self, tmp_path):
        tl = TextLogger(str(tmp_path / "textdir"))
        tl.log_dict({"lr": {"G_lr": 2e-4}, "loss": {"d": 1.5}}, prefix="train", step=10)
        tl.log_dict({"lr": {"G_lr": 1e-4}, "loss": {"d": 1.2}}, prefix="train", step=20)
        tl.close()
        steps, values = read_log(str(tmp_path / "textdir" / "train.lr.G_lr.log"))
        assert steps == [10, 20]
        np.testing.assert_allclose(values, [2e-4, 1e-4])


def _rand_imgs(n, res=16, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 255, (res, res, 3), dtype=np.uint8) for _ in range(n)]


class TestZipDataset:
    def test_roundtrip(self, tmp_path):
        p = str(tmp_path / "d.zip")
        imgs = _rand_imgs(5)
        write_stylegan_zip(p, imgs, labels=[0, 1, 0, 1, 2])
        ds = ZipImageDataset(p, use_labels=True)
        assert len(ds) == 5
        img, label = ds[1]
        assert img.shape == (3, 16, 16)
        np.testing.assert_array_equal(img, imgs[1].transpose(2, 0, 1))
        assert label == 1

    def test_xflip_doubles(self, tmp_path):
        p = str(tmp_path / "d.zip")
        imgs = _rand_imgs(3)
        write_stylegan_zip(p, imgs)
        ds = ZipImageDataset(p, xflip=True)
        assert len(ds) == 6
        orig, _ = ds[0]
        flipped, _ = ds[3]
        np.testing.assert_array_equal(flipped, orig[:, :, ::-1])

    def test_resize(self, tmp_path):
        p = str(tmp_path / "d.zip")
        write_stylegan_zip(p, _rand_imgs(2, res=32))
        ds = ZipImageDataset(p, resize_resolution=16)
        img, _ = ds[0]
        assert img.shape == (3, 16, 16)

    def test_cache_decoded(self, tmp_path):
        import os

        p = str(tmp_path / "d.zip")
        imgs = _rand_imgs(4, res=16)
        write_stylegan_zip(p, imgs)
        ds = ZipImageDataset(p, xflip=True, cache_decoded=True)
        # first pass populates; values identical to the uncached dataset
        ref = ZipImageDataset(p, xflip=True)
        for i in range(len(ds)):
            np.testing.assert_array_equal(ds[i][0], ref[i][0])
        cache_file = p + ".decoded_16.npy"
        assert os.path.exists(cache_file)
        assert np.all(np.asarray(ds._cache_done) == 1)
        # a fresh instance reuses the populated memmap (flags persisted)
        ds2 = ZipImageDataset(p, xflip=True, cache_decoded=True)
        np.testing.assert_array_equal(ds2[1][0], ref[1][0])
        np.testing.assert_array_equal(ds2[5][0], ref[5][0])  # xflip half

    def test_cache_decoded_with_resize(self, tmp_path):
        p = str(tmp_path / "d.zip")
        write_stylegan_zip(p, _rand_imgs(2, res=32))
        ds = ZipImageDataset(p, resize_resolution=16, cache_decoded=True)
        ref = ZipImageDataset(p, resize_resolution=16)
        np.testing.assert_array_equal(ds[0][0], ref[0][0])
        np.testing.assert_array_equal(ds[0][0], ref[0][0])  # cached re-read

    def test_loader_batches_and_sharding(self, tmp_path):
        p = str(tmp_path / "d.zip")
        write_stylegan_zip(p, _rand_imgs(8))
        dl = DataLoader(ZipImageDataset(p), batch_size=4, num_workers=2)
        imgs, labels = next(dl)
        assert imgs.shape == (4, 3, 16, 16) and imgs.dtype == np.uint8
        norm = to_norm_tensor(imgs)
        assert norm.min() >= -1 and norm.max() <= 1
        dl.close()

        dl0 = DataLoader(ZipImageDataset(p), batch_size=4, shard_index=0, num_shards=2, shuffle=False)
        b0, _ = next(dl0)
        dl0.close()
        # shard 0 with no shuffle reads even indices
        np.testing.assert_array_equal(b0[0], ZipImageDataset(p)[0][0])
        np.testing.assert_array_equal(b0[1], ZipImageDataset(p)[2][0])


class TestDatasetTool:
    def test_folder_to_zip(self, tmp_path):
        from PIL import Image

        src = tmp_path / "imgs"
        src.mkdir()
        for i, arr in enumerate(_rand_imgs(3, res=20)):
            Image.fromarray(arr).save(src / f"{i}.png")
        dest = str(tmp_path / "out.zip")
        n = convert_dataset(str(src), dest, resolution=16, transform="center-crop")
        assert n == 3
        ds = ZipImageDataset(dest)
        assert ds[0][0].shape == (3, 16, 16)

    def test_zip_to_zip_identity(self, tmp_path):
        src = str(tmp_path / "src.zip")
        write_stylegan_zip(src, _rand_imgs(2))
        dest = str(tmp_path / "dst.zip")
        assert convert_dataset(src, dest) == 2

    def test_center_crop_nonsquare(self):
        img = np.zeros((10, 20, 3), np.uint8)
        img[:, 5:15] = 255
        out = center_crop(img, 8)
        assert out.shape == (8, 8, 3)
        assert out.mean() > 200  # crop took the center band

    def test_pad_to_square(self):
        img = np.ones((10, 20, 3), np.uint8) * 255
        out = pad_to_square(img, 16, "constant")
        assert out.shape == (16, 16, 3)

    def test_image_list_source(self, tmp_path):
        from PIL import Image

        d = tmp_path / "imgs"
        d.mkdir()
        paths = []
        for i, arr in enumerate(_rand_imgs(2, res=8)):
            p = d / f"{i}.png"
            Image.fromarray(arr).save(p)
            paths.append(str(p))
        lst = tmp_path / "list.txt"
        lst.write_text("\n".join(paths))
        dest = str(tmp_path / "o.zip")
        assert convert_dataset(str(lst), dest) == 2


class TestModelRegistry:
    def test_build_generator_from_node(self):
        import cips3d_tpu.models.registry  # noqa: F401  (registers builders)
        from cips3d_tpu.config import Config, build_model

        node = Config.wrap({
            "name": "cips3d_tpu.models.GeneratorNerfINR",
            "z_dim_nerf": 16, "nerf_hidden_dim": 16, "nerf_style_dim": 16,
        })
        model = build_model(node)
        assert model.cfg.z_dim_nerf == 16
        assert model.cfg.freeze_nerf is False

        node["name"] = "cips3d_tpu.models.GeneratorNerfINR_freeze_NeRF"
        model = build_model(node)
        assert model.cfg.freeze_nerf is True

    def test_build_discriminator_from_node(self):
        import cips3d_tpu.models.registry  # noqa: F401
        from cips3d_tpu.config import Config, build_model

        node = Config.wrap({
            "name": "cips3d_tpu.models.DiscriminatorMultiScaleAux",
            "max_size": 64, "diffaug": True,
        })
        model = build_model(node)
        assert model.max_size == 64 and model.diffaug is True
