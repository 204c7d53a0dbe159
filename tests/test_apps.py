"""Smoke tests for the apps layer: multiview grid, trajectory video frames,
model interpolation, z-interpolation, shape extraction (.mrc), inversion.

References: exp/pigan/scripts/render_multiview_images.py, scripts/web_demo.py,
exp/cips3d/models/st_web.py, exp/pigan/scripts/extract_shapes.py.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cips3d_tpu.models.generator import GeneratorConfig, GeneratorNerfINR, RenderOptions, sample_zs

GCFG = GeneratorConfig(
    z_dim_nerf=16, z_dim_inr=32, nerf_hidden_dim=16, nerf_style_dim=16,
    nerf_mapping_layers=2, inr_hidden_dim=32, inr_style_dim=32, inr_mapping_layers=2,
)


@pytest.fixture(scope="module")
def gen():
    model = GeneratorNerfINR(cfg=GCFG)
    key = jax.random.PRNGKey(0)
    zs = sample_zs(key, 1, GCFG)
    params = model.init(key, zs, key, RenderOptions(img_size=8, num_steps=3))
    return model, params


class TestRenderApps:
    def test_render_chunked_matches_unchunked_shape(self, gen):
        from cips3d_tpu.apps.render import compute_styles, render_chunked

        model, params = gen
        zs = sample_zs(jax.random.PRNGKey(1), 1, GCFG)
        styles = compute_styles(params, model, zs, psi=1.0)
        opts = RenderOptions(img_size=8, num_steps=3, h_stddev=0, v_stddev=0)
        img = render_chunked(params, model, styles, opts, jax.random.PRNGKey(2), forward_points=16)
        assert img.shape == (1, 3, 8, 8)
        assert np.all(np.isfinite(img))

    def test_multiview_grid(self, gen, tmp_path):
        from cips3d_tpu.apps.render import render_multiview

        model, params = gen
        out = str(tmp_path / "grid.png")
        grid = render_multiview(
            params, model, out, seeds=(0,), yaw_offsets=(-0.3, 0.3),
            img_size=8, num_steps=3, ray_step_multiplier=1, psi=0.7,
        )
        assert grid.shape == (2, 3, 8, 8)
        assert os.path.exists(out)

    def test_trajectory_video(self, gen, tmp_path):
        from cips3d_tpu.apps.render import render_trajectory_video

        model, params = gen
        frames = render_trajectory_video(
            params, model, str(tmp_path / "vid"), seed=0, mode="circle",
            num_frames=3, img_size=8, num_steps=3,
        )
        assert len(frames) == 3
        assert all(os.path.exists(f) for f in frames)
        # a playable video is always produced (MJPEG-AVI without ffmpeg)
        assert os.path.exists(str(tmp_path / "vid/video.avi")) or os.path.exists(
            str(tmp_path / "vid/video.mp4")
        )

    def test_trajectory_video_depth(self, gen, tmp_path):
        from cips3d_tpu.apps.render import render_trajectory_video

        model, params = gen
        render_trajectory_video(
            params, model, str(tmp_path / "vid"), seed=0, mode="yaw",
            num_frames=2, img_size=8, num_steps=3, depth=True,
        )
        for i in range(2):
            assert os.path.exists(str(tmp_path / f"vid/depth_{i:04d}.png"))
        assert os.path.exists(str(tmp_path / "vid/depth.avi")) or os.path.exists(
            str(tmp_path / "vid/depth.mp4")
        )

    def test_render_chunked_depth(self, gen):
        """Depth output: finite, inside the ray interval, and background rays
        (near-zero density at init) integrate to a plausible expected depth."""
        from cips3d_tpu.apps.render import compute_styles, render_chunked

        model, params = gen
        zs = sample_zs(jax.random.PRNGKey(1), 1, GCFG)
        styles = compute_styles(params, model, zs, psi=1.0)
        opts = RenderOptions(img_size=8, num_steps=3, h_stddev=0, v_stddev=0)
        img, depth = render_chunked(
            params, model, styles, opts, jax.random.PRNGKey(2),
            forward_points=16, return_depth=True,
        )
        assert img.shape == (1, 3, 8, 8)
        assert depth.shape == (1, 1, 8, 8)
        assert np.all(np.isfinite(depth))
        # expected depth = sum(w * z) with sum(w) <= 1, z perturbed by up to
        # one bin width (core/rays.py::perturb_points) -> bounded accordingly
        bin_w = (opts.ray_end - opts.ray_start) / opts.num_steps
        assert float(depth.max()) <= opts.ray_end + bin_w + 1e-4
        assert float(depth.min()) >= 0.0

    def test_render_chunked_explicit_camera_finite(self, gen):
        """Regression: camera_lookup is a view DIRECTION (`comm_utils.py:101`
        builds `lookup = -xyz`); passing a look-at *point* of zeros once
        normalized to NaN and produced uniform-gray frames."""
        from cips3d_tpu.apps.render import compute_styles, render_chunked

        model, params = gen
        zs = sample_zs(jax.random.PRNGKey(1), 1, GCFG)
        styles = compute_styles(params, model, zs, psi=1.0)
        opts = RenderOptions(img_size=8, num_steps=3, h_stddev=0, v_stddev=0)
        pos = np.array([[0.3, 0.1, 0.94]])
        img = render_chunked(
            params, model, styles, opts, jax.random.PRNGKey(2),
            forward_points=32,
            camera_pos=jnp.asarray(pos), camera_lookup=jnp.asarray(-pos),
        )
        assert np.all(np.isfinite(img))

    def test_z_interpolation(self, gen, tmp_path):
        from cips3d_tpu.apps.z_interpolation import render_z_interpolation_video

        model, params = gen
        frames = render_z_interpolation_video(
            params, model, str(tmp_path / "zi"), seeds=(0, 1), num_frames=2,
            img_size=8, num_steps=3,
        )
        assert len(frames) == 4  # 2 seeds x 2 frames


class TestInterpolation:
    def test_layer_swapping_blends(self, gen):
        from cips3d_tpu.apps.interpolation import inr_layer_swapping

        model, params_a = gen
        params_b = jax.tree_util.tree_map(lambda x: x + 1.0, params_a)
        swapped = inr_layer_swapping(params_a, params_b, gamma=0.5, layers=("4",))
        a4 = params_a["params"]["inr_net"]["block_4"]["mod1"]["weight"]
        s4 = swapped["params"]["inr_net"]["block_4"]["mod1"]["weight"]
        np.testing.assert_allclose(np.asarray(s4), np.asarray(a4) + 0.5, atol=1e-6)
        # non-swapped layer unchanged
        a8 = params_a["params"]["inr_net"]["block_8"]["mod1"]["weight"]
        s8 = swapped["params"]["inr_net"]["block_8"]["mod1"]["weight"]
        np.testing.assert_allclose(np.asarray(s8), np.asarray(a8))


class TestShapes:
    def test_mrc_roundtrip(self, tmp_path):
        from cips3d_tpu.apps.shapes import read_mrc, write_mrc

        vol = np.random.default_rng(0).standard_normal((4, 5, 6)).astype(np.float32)
        p = str(tmp_path / "v.mrc")
        write_mrc(p, vol)
        back = read_mrc(p)
        np.testing.assert_allclose(back, vol)
        # header sanity
        with open(p, "rb") as f:
            header = f.read(1024)
        assert header[208:212] == b"MAP "

    def test_extract_shape(self, gen, tmp_path):
        from cips3d_tpu.apps.shapes import extract_shape

        model, params = gen
        p = str(tmp_path / "s.mrc")
        vol = extract_shape(params, model, p, n=8, psi=1.0)
        assert vol.shape == (8, 8, 8)
        assert os.path.exists(p)
        assert np.all(np.isfinite(vol))


class TestInversion:
    def test_project_reduces_loss(self, gen):
        from cips3d_tpu.apps.inversion import project_image

        model, params = gen
        # target: an actual render of a known z (so the optimum exists)
        zs = sample_zs(jax.random.PRNGKey(5), 1, GCFG)
        opts = RenderOptions(img_size=8, num_steps=3, h_stddev=0, v_stddev=0, sample_dist="mean")
        target, _ = model.apply(params, zs, jax.random.PRNGKey(6), opts)
        styles, img, history = project_image(
            params, model, np.asarray(target[0]), num_steps_opt=30, lr=0.05,
            img_size=8, num_steps=3, avg_samples=64, log_every=10,
        )
        assert img.shape == (3, 8, 8)
        assert len(history) == 3
        assert history[-1] <= history[0]

    def test_project_with_disc_percept(self, gen):
        """Discriminator-feature perceptual term (VGG16 stand-in,
        `st_web.py:66-283`) plugs into percept_fn and still optimizes."""
        from cips3d_tpu.apps.inversion import make_disc_percept_fn, project_image
        from cips3d_tpu.models.discriminator import DiscriminatorMultiScale

        model, params = gen
        disc = DiscriminatorMultiScale(
            max_size=8, channels_override={4: 8, 8: 8}, stddev_group=0
        )
        dummy = jnp.zeros((1, 3, 8, 8))
        dparams = disc.init(jax.random.PRNGKey(0), dummy, method=disc.init_all)
        percept = make_disc_percept_fn(dparams, disc)
        feats = percept(dummy)
        assert feats.ndim == 2 and feats.shape[0] == 1

        zs = sample_zs(jax.random.PRNGKey(5), 1, GCFG)
        opts = RenderOptions(img_size=8, num_steps=3, h_stddev=0, v_stddev=0, sample_dist="mean")
        target, _ = model.apply(params, zs, jax.random.PRNGKey(6), opts)
        _, img, history = project_image(
            params, model, np.asarray(target[0]), num_steps_opt=20, lr=0.05,
            img_size=8, num_steps=3, avg_samples=64, log_every=10,
            percept_fn=percept,
        )
        assert img.shape == (3, 8, 8)
        assert history[-1] <= history[0]


class TestChunkedEvalPath:
    def test_gen_images_chunked(self, gen, tmp_path):
        """gen_images routes through forward_points chunking when the image
        exceeds one chunk (`gen_images.py:60`)."""
        from cips3d_tpu.eval.images import gen_images

        model, params = gen
        out = str(tmp_path / "fakes")
        n = gen_images(
            params, model, out, 3, img_size=8, batch_size=2, num_steps=3,
            forward_points=16,  # 8*8=64 pixels -> 4 chunks
        )
        assert n == 3
        files = sorted(os.listdir(out))
        assert len(files) == 3
        from PIL import Image

        img = np.asarray(Image.open(os.path.join(out, files[0])))
        assert img.shape == (8, 8, 3)
