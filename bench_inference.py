"""Secondary benchmark: r256 novel-view inference fps/chip.

BASELINE.json north-star: ≥30 fps/chip at r256 (num_steps 12, hierarchical,
full INR decode).  Prints one JSON line (not the driver metric — that's
bench.py's train throughput; run this manually for the serving number).

BENCH_AB=1 measures the shipped fused serving path (fused ray-tile + fused
INR + fast_sin) AND the pure-XLA path in the SAME process — same tunnel
session, same params — eliminating the ±3% cross-session variance
(BENCH_NOTES.md) from the comparison that sets the serving default.  The
JSON line then carries both: value = fused fps, ``xla_fps`` = XLA fps.
"""

import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def build_renderer(img_size, num_steps, frames, fast_sin, fused_ray, fused_inr):
    from cips3d_tpu.core import rays as rays_lib
    from cips3d_tpu.models.generator import (
        GeneratorConfig,
        GeneratorNerfINR,
        RenderOptions,
    )

    cfg = GeneratorConfig(fast_sin=fast_sin, fused_ray=fused_ray, fused_inr=fused_inr)
    gen = GeneratorNerfINR(cfg=cfg, dtype=jnp.bfloat16)
    opts = RenderOptions(img_size=img_size, num_steps=num_steps, h_stddev=0.0, v_stddev=0.0)

    def render_frame(params, styles, key):
        world = rays_lib.get_world_points_and_direction(
            key, 1, num_steps, img_size, opts.fov, opts.ray_start, opts.ray_end,
            0.0, 0.0, opts.h_mean, opts.v_mean, "gaussian",
        )
        img, _ = gen.apply(params, styles, world, opts, key, method=gen.forward_with_rays)
        return img

    def run_frames(params, styles, key):
        def body(c, i):
            img = render_frame(params, styles, jax.random.fold_in(key, i))
            return c + jnp.sum(jnp.abs(img).astype(jnp.float32)), None

        tot, _ = jax.lax.scan(body, 0.0, jnp.arange(frames))
        return tot

    return gen, opts, jax.jit(run_frames)


def measure(jf, params, styles, frames, tag):
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    float(jf(params, styles, key))  # host readback forces completion
    print(f"[{tag}] compile+first: {time.time() - t0:.1f}s", file=sys.stderr)
    n_calls = 3
    t0 = time.time()
    acc = 0.0
    for i in range(n_calls):
        acc += float(jf(params, styles, jax.random.PRNGKey(1 + i)))
    dt = time.time() - t0
    fps = frames * n_calls / dt
    print(f"[{tag}] checksum {acc:.3f}  {fps:.2f} fps", file=sys.stderr)
    return fps


def main(img_size=256, num_steps=12, frames=16):
    from cips3d_tpu.models.generator import sample_zs

    ab = os.environ.get("BENCH_AB", "0") == "1"
    # polynomial sine (max abs err 1.7e-5 — invisible at 8-bit) is the
    # serving default; BENCH_FAST_SIN=0 for exact-sin numbers
    fast_sin = os.environ.get("BENCH_FAST_SIN", "1") == "1"
    # Round 3: the fused ray-tile kernel (ops/pallas/ray_tile.py) renders the
    # whole NeRF stage per VMEM-resident ray tile — 88.9 vs 60.8 fps against
    # the tuned XLA path, same session — and is the serving default;
    # BENCH_FUSED=0 for the XLA path.
    fused_ray = os.environ.get("BENCH_FUSED", "1") == "1"
    # fused CIPS-INR decoder kernel (ops/pallas/inr_tile.py); BENCH_FUSED_INR=0
    # for the XLA INR
    fused_inr = os.environ.get("BENCH_FUSED_INR", "1") == "1"

    gen, opts, jf = build_renderer(img_size, num_steps, frames, fast_sin, fused_ray, fused_inr)
    key = jax.random.PRNGKey(0)
    zs = sample_zs(key, 1, gen.cfg)
    # params depend only on shapes, not on the kernel-routing flags, so one
    # init serves every configuration in AB mode
    params = gen.init(key, zs, key, dataclasses.replace(opts, img_size=32, num_steps=num_steps))
    styles = gen.apply(params, zs["z_nerf"], zs["z_inr"], method=gen.mapping)

    fps = measure(jf, params, styles, frames, "fused" if fused_ray or fused_inr else "xla")
    extra = {}
    if ab:
        # XLA leg keeps fast_sin so the A/B isolates the Pallas kernels, not
        # the sine implementation (XLA exact-sin would be sin-bound and slower)
        _, _, jf_xla = build_renderer(img_size, num_steps, frames, fast_sin, False, False)
        extra["xla_fps"] = round(measure(jf_xla, params, styles, frames, "xla"), 2)
        extra["same_session"] = True

    print(
        json.dumps(
            {
                "metric": f"novel_view_fps_per_chip_r{img_size}",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / 30.0, 2),
                **extra,
            }
        )
    )


if __name__ == "__main__":
    # optional: img_size [num_steps [frames]] positional overrides
    main(*(int(a) for a in sys.argv[1:4]))
