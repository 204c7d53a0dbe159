"""Long-lived render server: params stay device-resident, frames on demand.

The reference serves its interactive demo through a streamlit process that
keeps the generator loaded (`exp/cips3d/models/st_web.py`,
`scripts/web_demo.py`); each rerun re-renders from resident weights.  This
is the production-serving counterpart for the TPU build: a stdlib HTTP
server holding (params, styles-cache, one compiled explicit-camera render
function) — after the first request everything is jit-cached, so a frame
costs one device dispatch instead of a CLI cold start.

Endpoints:
  GET /                 — interactive page (drag to look around; fetches frames live)
  GET /render?seed=0&yaw=1.57&pitch=1.57&psi=0.7[&depth=1][&model=name]  — one JPEG frame
  GET /models           — available model names + the default (JSON)
  GET /healthz          — liveness + device info (JSON)

Multiple checkpoints can be served from one process (the web demo's model
dropdown across the released FFHQ/AFHQ/Cartoon checkpoints,
`exp/cips3d/configs/web_demo.yaml:12-14` + `scripts/web_demo.py`): repeat
``--ckpt name=path``.  All models share one GeneratorConfig, so one compiled
render program serves every model — params are a traced argument and
switching costs nothing.

Usage:
  python -m cips3d_tpu.apps.serve --ckpt results/.../ckptdir/best_fid \
      --img-size 128 --port 8000 [--config cfg.yaml]
  python -m cips3d_tpu.apps.serve --ckpt ffhq=...:/best_fid \
      --ckpt afhq=.../best_fid --ckpt cartoon=.../best_fid
"""

from __future__ import annotations

import argparse
import json
import math
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import jax
import jax.numpy as jnp
import numpy as np

from cips3d_tpu.eval.images import to_uint8
from cips3d_tpu.models.generator import GeneratorNerfINR, RenderOptions, sample_zs
from cips3d_tpu.utils.video import encode_jpeg

_INDEX = """<!doctype html>
<html><head><meta charset="utf-8"><title>cips3d_tpu live</title>
<style>
  body { background:#111; color:#ddd; font:14px system-ui, sans-serif;
         display:flex; flex-direction:column; align-items:center; gap:12px;
         padding:24px; }
  #view { width:384px; height:384px; cursor:grab; border-radius:8px; }
  .row { display:flex; gap:8px; } #hud { color:#888; }
  button { background:#333; color:#ddd; border:1px solid #555;
           border-radius:6px; padding:6px 12px; cursor:pointer; }
  button.on { background:#4a6; color:#fff; }
</style></head><body>
<h3>cips3d_tpu &mdash; live render server</h3>
<img id="view" draggable="false">
<div id="hud"></div>
<div class="row" id="models"></div>
<div class="row">
  <button onclick="seed=Math.max(0,seed-1);load()">&minus; seed</button>
  <button onclick="seed+=1;load()">+ seed</button>
  <button id="dep" onclick="depth=1-depth;this.classList.toggle('on',!!depth);load()">depth</button>
</div>
<script>
let seed = 0, yaw = Math.PI/2, pitch = Math.PI/2, depth = 0, inflight = false, queued = false;
let model = '';
const view = document.getElementById('view'), hud = document.getElementById('hud');
fetch('/models').then(r => r.json()).then(m => {
  model = m.default;
  if (m.models.length < 2) return;
  const row = document.getElementById('models');
  for (const name of m.models) {
    const b = document.createElement('button');
    b.textContent = name;
    b.classList.toggle('on', name === model);
    b.onclick = () => {
      model = name;
      for (const c of row.children) c.classList.toggle('on', c === b);
      load();
    };
    row.appendChild(b);
  }
});
function load() {
  if (inflight) { queued = true; return; }
  inflight = true;
  const url = `/render?seed=${seed}&yaw=${yaw.toFixed(3)}&pitch=${pitch.toFixed(3)}&depth=${depth}` +
              (model ? `&model=${encodeURIComponent(model)}` : '');
  const img = new Image();
  img.onload = () => { view.src = img.src; inflight = false;
                       if (queued) { queued = false; load(); } };
  img.src = url;
  hud.textContent = `seed ${seed} | yaw ${yaw.toFixed(2)} | pitch ${pitch.toFixed(2)}`;
}
let drag = null;
view.addEventListener('pointerdown', e => {
  drag = {x: e.clientX, y: e.clientY, yaw, pitch};
  view.setPointerCapture(e.pointerId);
});
view.addEventListener('pointermove', e => {
  if (!drag) return;
  yaw   = Math.min(Math.PI/2+0.6, Math.max(Math.PI/2-0.6, drag.yaw   + (e.clientX-drag.x)/250));
  pitch = Math.min(Math.PI/2+0.3, Math.max(Math.PI/2-0.3, drag.pitch - (e.clientY-drag.y)/250));
  load();
});
view.addEventListener('pointerup', () => drag = null);
load();
</script></body></html>
"""


class RenderService:
    """Holds the generator + one jitted render fn; thread-safe frame renders.

    The explicit-camera position is a traced argument, so every pose reuses
    one compiled program; styles are cached per (model, seed, psi).

    ``params`` is either one pytree (single model, name "default") or a dict
    of ``{name: pytree}`` — every model must share the generator
    architecture, so the one jitted render program serves them all.
    """

    def __init__(self, generator: GeneratorNerfINR, params, img_size: int = 128,
                 num_steps: int = 24, fov: float = 12.0,
                 forward_points: int = 256 ** 2, radius: float = 1.0):
        from cips3d_tpu.apps.render import compute_styles, render_chunked_traced

        self.generator = generator
        self.models = dict(params) if isinstance(params, dict) else {"default": params}
        if not self.models:
            raise ValueError("need at least one model")
        self.default_model = next(iter(self.models))
        self.params = self.models[self.default_model]
        self.opts = RenderOptions(
            img_size=img_size, num_steps=num_steps, fov=fov,
            h_stddev=0.0, v_stddev=0.0,
        )
        self.radius = radius
        self._compute_styles = compute_styles
        self._styles_cache = {}
        self._lock = threading.Lock()  # one chip; serialize dispatches

        def render(params, styles, cam_pos, key):
            # camera_lookup is a view DIRECTION (reference: lookup = -xyz,
            # comm_utils.py:101); -cam_pos looks at the scene origin
            return render_chunked_traced(
                params, generator, styles, self.opts, key, forward_points,
                cam_pos, -cam_pos, None, True,
            )

        self._render = jax.jit(render)

    def styles(self, seed: int, psi: float, model: Optional[str] = None):
        model = model or self.default_model
        k = (model, int(seed), round(float(psi), 4))
        if k not in self._styles_cache:
            zs = sample_zs(jax.random.PRNGKey(int(seed)), 1, self.generator.cfg)
            self._styles_cache[k] = self._compute_styles(
                self.models[model], self.generator, zs, psi=float(psi)
            )
        return self._styles_cache[k]

    def frame(self, seed: int = 0, yaw: float = math.pi / 2,
              pitch: float = math.pi / 2, psi: float = 0.7,
              depth: bool = False, model: Optional[str] = None) -> np.ndarray:
        """Render one (H, W, 3) uint8 frame."""
        model = model or self.default_model
        if model not in self.models:
            raise KeyError(
                f"unknown model {model!r}; available: {sorted(self.models)}"
            )
        pos = self.radius * np.array(
            [
                math.sin(pitch) * math.cos(yaw),
                math.cos(pitch),
                math.sin(pitch) * math.sin(yaw),
            ]
        )
        with self._lock:
            styles = self.styles(seed, psi, model)
            img, dmap = self._render(
                self.models[model], styles, jnp.asarray(pos[None]),
                jax.random.PRNGKey(int(seed)),
            )
        if depth:
            d = (np.asarray(dmap[0, 0]) - self.opts.ray_start) / (
                self.opts.ray_end - self.opts.ray_start
            )
            d8 = (np.clip(d, 0.0, 1.0) * 255).astype(np.uint8)
            return np.stack([d8] * 3, axis=-1)
        return to_uint8(np.asarray(img[0]))


def make_handler(service: RenderService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                self._send(200, _INDEX.encode(), "text/html")
            elif url.path == "/healthz":
                info = {
                    "ok": True,
                    "backend": jax.default_backend(),
                    "devices": len(jax.devices()),
                    "img_size": service.opts.img_size,
                    "models": sorted(service.models),
                }
                self._send(200, json.dumps(info).encode(), "application/json")
            elif url.path == "/models":
                body = json.dumps({
                    "models": list(service.models),
                    "default": service.default_model,
                })
                self._send(200, body.encode(), "application/json")
            elif url.path == "/render":
                q = parse_qs(url.query)

                def f(name, default, cast=float):
                    return cast(q[name][0]) if name in q else default

                try:
                    kwargs = dict(
                        seed=f("seed", 0, int),
                        yaw=f("yaw", math.pi / 2),
                        pitch=f("pitch", math.pi / 2),
                        psi=f("psi", 0.7),
                        depth=bool(f("depth", 0, int)),
                        model=f("model", None, str),
                    )
                except ValueError as e:  # uncastable query param
                    self._send(400, json.dumps({"error": str(e)}).encode(),
                               "application/json")
                    return
                try:
                    frame = service.frame(**kwargs)
                except KeyError as e:  # unknown model
                    self._send(404, json.dumps({"error": str(e)}).encode(),
                               "application/json")
                    return
                except Exception as e:  # surface render errors as 500 JSON
                    self._send(500, json.dumps({"error": str(e)}).encode(),
                               "application/json")
                    return
                self._send(200, encode_jpeg(frame, quality=90), "image/jpeg")
            else:
                self._send(404, b"not found", "text/plain")

    return Handler


def serve(service: RenderService, host: str = "127.0.0.1", port: int = 8000):
    httpd = ThreadingHTTPServer((host, port), make_handler(service))
    return httpd


def main(argv=None):
    from cips3d_tpu.models.generator import GeneratorConfig
    from cips3d_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True, action="append",
                   help="snapshot dir, or NAME=DIR; repeat to serve several "
                        "models (same architecture) from one process")
    p.add_argument("--module", default="G_ema")
    p.add_argument("--config", default=None)
    p.add_argument("--command", default=None)
    p.add_argument("--img-size", type=int, default=128)
    p.add_argument("--num-steps", type=int, default=24)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--exact", action="store_true",
                   help="serve with exact sin and the XLA render path "
                        "(default: fused ray-tile kernel + fast_sin — the "
                        "validated serving config, 88.9 fps r256/chip)")
    args = p.parse_args(argv)

    gen_cfg = GeneratorConfig()
    if args.config:
        from cips3d_tpu.config.config import resolve_command

        cfg = resolve_command(args.config, args.command or "train_base")
        gen_cfg = GeneratorConfig(**cfg.generator.to_dict())
    if not args.exact:
        import dataclasses

        gen_cfg = dataclasses.replace(
            gen_cfg, fused_ray=True, fused_inr=True, fast_sin=True
        )
    from cips3d_tpu.eval.cli import load_generator

    import os

    models = {}
    for i, spec in enumerate(args.ckpt):
        name, _, path = spec.rpartition("=")
        if not name:
            path = spec
            # derive a name from the experiment dir (…/<exp>/ckptdir/<snap>)
            name = os.path.basename(os.path.dirname(os.path.dirname(path))) \
                if len(args.ckpt) > 1 else "default"
        if name in models:
            name = f"{name}_{i}"
        gen, models[name] = load_generator(path, gen_cfg, args.module)
    service = RenderService(gen, models, img_size=args.img_size,
                            num_steps=args.num_steps)
    print("warming up (first compile)...", flush=True)
    service.frame()  # compile before accepting traffic
    httpd = serve(service, args.host, args.port)
    print(f"serving on http://{args.host}:{args.port}", flush=True)
    httpd.serve_forever()


if __name__ == "__main__":
    main()
