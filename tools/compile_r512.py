"""Compile (and optionally run) the r512 training step against the real
TPU chip — VERDICT r4 next #3: replace docs/r512_memory_budget.md's
arithmetic with compiler-reported memory.

Two probes:

1. **Single-chip share** (default): the `train_r512` 2-D layout puts
   262,144 G pixels on each device (global batch 4 per data shard, pixel
   axis over 4 ray shards: 4 x 512^2 / 4), and one r512 image per device
   through D (global D batch 8 over 8 chips... the joint reshard gives
   each chip batch 1).  A single-chip step at batch_size=1 with the full
   512^2 pixel axis IS that per-chip working set (modulo collectives,
   which add buffers of activation size, not a new scale).  We AOT-lower,
   compile against the v5e, print `memory_analysis()`, and optionally run
   real steps (--run N).

2. **8-device AOT** (--topology): best-effort deviceless compile of the
   true 2-D-mesh program via jax.experimental.topologies; prints the same
   analysis per device.  May be unsupported by the tunnel's PJRT plugin.

Config matches `configs/ffhq.yaml train_r512`: freeze_nerf, no aux,
diffaug, warmup_d, grad_points 256, fast_sin (round-5 default).
Reference scale anchor: the r512 demo, web_demo.yaml:60-84.

Usage:
    python tools/compile_r512.py [--run 4] [--topology] [--json OUT]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def report_memory(compiled):
    try:
        ma = compiled.memory_analysis()
        out = {
            "argument_MiB": round(ma.argument_size_in_bytes / 2**20, 1),
            "output_MiB": round(ma.output_size_in_bytes / 2**20, 1),
            "temp_MiB": round(ma.temp_size_in_bytes / 2**20, 1),
            "alias_MiB": round(
                getattr(ma, "alias_size_in_bytes", 0) / 2**20, 1),
            "generated_code_MiB": round(
                ma.generated_code_size_in_bytes / 2**20, 1),
        }
        # donated state aliases into outputs, so live peak ~ args + temp
        out["peak_args_plus_temp_MiB"] = round(
            out["argument_MiB"] + out["temp_MiB"], 1)
        return out
    except Exception as e:  # varies per backend
        return {"error": f"memory_analysis unavailable: {e}"}


def build(batch):
    from cips3d_tpu.models.discriminator import DiscriminatorMultiScaleAux
    from cips3d_tpu.models.generator import (
        GeneratorConfig, GeneratorNerfINR, RenderOptions)
    from cips3d_tpu.train.state import TrainConfig

    gcfg = GeneratorConfig(freeze_nerf=True, fast_sin=True)
    gen = GeneratorNerfINR(cfg=gcfg, dtype=jnp.bfloat16)
    disc = DiscriminatorMultiScaleAux(
        max_size=1024, channel_multiplier=2, diffaug=True, dtype=jnp.bfloat16)
    tcfg = TrainConfig(
        img_size=512, batch_size=batch, grad_points=256, forward_points=256,
        train_aux_img=False, diffaug=True, warmup_d=True,
        nerf_noise_disable=True, gen_lr=1e-4, disc_lr=5e-4,
    )
    opts = RenderOptions(img_size=512, num_steps=12)
    return gen, disc, tcfg, opts


def single_chip(run_steps, out):
    from cips3d_tpu.train.step import init_train_state, make_train_step

    gen, disc, tcfg, opts = build(batch=1)
    key = jax.random.PRNGKey(0)
    print("initializing (batch 1, r512)...", file=sys.stderr)
    state = init_train_state(key, gen, disc, tcfg, opts)
    step_fn = make_train_step(gen, disc, tcfg, opts, aux_reg=False)
    jitted = jax.jit(step_fn, donate_argnums=(0,))
    real = jax.ShapeDtypeStruct((1, 3, 512, 512), jnp.uint8)

    print("lowering + compiling r512 step on the real chip...", file=sys.stderr)
    t0 = time.time()
    compiled = jitted.lower(state, real, key).compile()
    out["compile_s"] = round(time.time() - t0, 1)
    out["single_chip_share"] = report_memory(compiled)
    print(json.dumps(out["single_chip_share"]), file=sys.stderr)

    if run_steps:
        import numpy as np

        real_np = jnp.asarray(
            (np.random.default_rng(0).integers(0, 255, (1, 3, 512, 512))
             ).astype("uint8"))
        print(f"running {run_steps} real steps...", file=sys.stderr)
        t0 = time.time()
        state, m = compiled(state, real_np, key)
        first = time.time() - t0
        _ = float(m["d_loss"])
        t0 = time.time()
        for i in range(run_steps - 1):
            state, m = compiled(state, real_np, jax.random.fold_in(key, i))
            _ = float(m["d_loss"])
        dt = time.time() - t0
        out["first_step_s"] = round(first, 2)
        out["steps_per_s"] = round((run_steps - 1) / dt, 3) if run_steps > 1 else None
        out["ms_per_step"] = round(dt / (run_steps - 1) * 1000, 1) if run_steps > 1 else None
        out["d_loss_finite"] = bool(jnp.isfinite(m["d_loss"]))
        print(f"steps: first {first:.1f}s, then {out['ms_per_step']} ms/step "
              f"(incl. per-dispatch tunnel overhead)", file=sys.stderr)


def topology_aot(out):
    """Deviceless AOT of the true 8-chip 2-D-mesh program (best-effort)."""
    from jax.experimental import topologies

    from cips3d_tpu.parallel.mesh import (
        pixel_sharding_scope, replicated, batch_spec)
    from cips3d_tpu.train.step import init_train_state, make_train_step
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    topo = None
    errs = []
    for name in ("v5e:2x4", "v5litepod-8", "v4:2x2x1"):
        try:
            topo = topologies.get_topology_desc(name, "tpu")
            out.setdefault("topology_aot", {})["topology"] = name
            break
        except Exception as e:
            errs.append(f"{name}: {e}")
    if topo is None:
        out["topology_aot"] = {"error": " / ".join(errs)}
        return
    devs = topo.devices
    import numpy as np

    n = len(devs)
    mesh = Mesh(np.array(devs).reshape(2, n // 2), ("data", "rays"))
    gen, disc, tcfg, opts = build(batch=4)
    key = jax.random.PRNGKey(0)
    # abstract-init the state on CPU, then lower with shardings
    import functools

    from cips3d_tpu.train.step import init_train_state as init_fn
    state_shape = jax.eval_shape(
        functools.partial(init_fn, generator=gen, discriminator=disc,
                          cfg=tcfg, opts=opts), key)
    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(("data", "rays")))
    state_sds = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=rep),
        state_shape)
    real = jax.ShapeDtypeStruct((8, 3, 512, 512), jnp.uint8, sharding=data)
    key_sds = jax.ShapeDtypeStruct(key.shape, key.dtype, sharding=rep)
    with pixel_sharding_scope(mesh):
        step_fn = make_train_step(gen, disc, tcfg, opts, aux_reg=False)
        jitted = jax.jit(step_fn, donate_argnums=(0,),
                         in_shardings=(rep, data, rep),
                         out_shardings=(rep, rep))
        with mesh:
            compiled = jitted.lower(state_sds, real, key_sds).compile()
    out.setdefault("topology_aot", {}).update(report_memory(compiled))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run", type=int, default=0, help="run N real steps")
    p.add_argument("--topology", action="store_true")
    p.add_argument("--topology-only", action="store_true",
                   help="skip the single-chip probe; merge into --json if it exists")
    p.add_argument("--json", default="")
    args = p.parse_args()

    out = {"devices": str(jax.devices())}
    if args.topology_only:
        args.topology = True
        if args.json and os.path.exists(args.json):
            with open(args.json) as f:
                out = json.load(f)
    else:
        single_chip(args.run, out)
    if args.topology:
        try:
            topology_aot(out)
        except Exception as e:  # best-effort: keep the single-chip numbers
            out["topology_aot"] = {"error": repr(e)}
    print(json.dumps(out, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
