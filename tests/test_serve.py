"""Render-server tests: resident-params service + HTTP endpoints.

Counterpart of the reference's long-lived streamlit demo process
(`exp/cips3d/models/st_web.py`); ours is a stdlib HTTP server around one
jitted explicit-camera render function (`cips3d_tpu/apps/serve.py`).
"""

import http.client
import io
import json
import threading

import jax
import numpy as np
import pytest

from cips3d_tpu.models.generator import GeneratorConfig, GeneratorNerfINR, RenderOptions, sample_zs

GCFG = GeneratorConfig(
    z_dim_nerf=16, z_dim_inr=32, nerf_hidden_dim=16, nerf_style_dim=16,
    nerf_mapping_layers=2, inr_hidden_dim=32, inr_style_dim=32, inr_mapping_layers=2,
)


@pytest.fixture(scope="module")
def service():
    """Two same-architecture models in one service (the web demo's
    FFHQ/AFHQ/Cartoon dropdown, `exp/cips3d/configs/web_demo.yaml:12-14`)."""
    from cips3d_tpu.apps.serve import RenderService

    model = GeneratorNerfINR(cfg=GCFG)
    opts = RenderOptions(img_size=8, num_steps=3)
    params = {
        name: model.init(jax.random.PRNGKey(s), sample_zs(jax.random.PRNGKey(s), 1, GCFG),
                         jax.random.PRNGKey(s), opts)
        for name, s in (("ffhq", 0), ("afhq", 7))
    }
    return RenderService(model, params, img_size=8, num_steps=3, forward_points=32)


class TestRenderService:
    def test_frame(self, service):
        f = service.frame(seed=0)
        assert f.shape == (8, 8, 3) and f.dtype == np.uint8
        # regression: a zero camera_lookup once normalized to NaN -> uniform
        # gray frames; real frames have spatial variation
        assert f.std() > 0

    def test_depth_frame(self, service):
        d = service.frame(seed=0, depth=True)
        assert d.shape == (8, 8, 3)
        assert (d[..., 0] == d[..., 1]).all()  # grayscale depth

    def test_pose_changes_frame(self, service):
        a = service.frame(seed=0, yaw=np.pi / 2 - 0.4)
        b = service.frame(seed=0, yaw=np.pi / 2 + 0.4)
        assert not np.array_equal(a, b)

    def test_style_cache(self, service):
        service.frame(seed=3, psi=0.5)
        service.frame(seed=3, psi=0.5)
        assert ("ffhq", 3, 0.5) in service._styles_cache

    def test_model_switch(self, service):
        """Different checkpoints render different frames; unknown -> KeyError."""
        a = service.frame(seed=0, model="ffhq")
        b = service.frame(seed=0, model="afhq")
        assert not np.array_equal(a, b)
        assert service.default_model == "ffhq"
        with pytest.raises(KeyError, match="afhq"):
            service.frame(seed=0, model="nope")


class TestHttpServer:
    @pytest.fixture(scope="class")
    def server(self, service):
        from cips3d_tpu.apps.serve import serve

        httpd = serve(service, host="127.0.0.1", port=0)  # ephemeral port
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        yield httpd.server_address
        httpd.shutdown()

    def _get(self, addr, path):
        conn = http.client.HTTPConnection(*addr, timeout=120)
        conn.request("GET", path)
        r = conn.getresponse()
        body = r.read()
        conn.close()
        return r.status, r.getheader("Content-Type"), body

    def test_healthz(self, server):
        status, ctype, body = self._get(server, "/healthz")
        assert status == 200 and ctype == "application/json"
        info = json.loads(body)
        assert info["ok"] and info["devices"] >= 1
        assert info["models"] == ["afhq", "ffhq"]

    def test_models_endpoint(self, server):
        status, ctype, body = self._get(server, "/models")
        assert status == 200 and ctype == "application/json"
        info = json.loads(body)
        assert info["models"] == ["ffhq", "afhq"] and info["default"] == "ffhq"

    def test_render_model_param(self, server):
        status, ctype, _ = self._get(server, "/render?seed=1&model=afhq")
        assert status == 200 and ctype == "image/jpeg"
        status, ctype, body = self._get(server, "/render?seed=1&model=nope")
        assert status == 404 and "available" in json.loads(body)["error"]

    def test_index(self, server):
        status, ctype, body = self._get(server, "/")
        assert status == 200 and ctype == "text/html"
        assert b"/render?seed=" in body

    def test_render_jpeg(self, server):
        status, ctype, body = self._get(server, "/render?seed=1&yaw=1.2&pitch=1.6")
        assert status == 200 and ctype == "image/jpeg"
        from PIL import Image

        img = Image.open(io.BytesIO(body))
        assert img.size == (8, 8)

    def test_render_depth(self, server):
        status, ctype, body = self._get(server, "/render?seed=1&depth=1")
        assert status == 200 and ctype == "image/jpeg"

    def test_404(self, server):
        status, _, _ = self._get(server, "/nope")
        assert status == 404

    def test_bad_param_is_400_json(self, server):
        status, ctype, _ = self._get(server, "/render?seed=abc")
        assert status == 400 and ctype == "application/json"
