"""Capture a jax.profiler trace of the flagship train step on the current
backend (TPU) and print a device-time summary.

Usage:
    python tools/profile_step.py [--img-size 64] [--batch 4] [--steps 10] \
        [--out /tmp/step_profile]

The summary aggregates XLA op self-times from the trace's trace.json.gz so no
TensorBoard is needed (round-2 perf work: VERDICT item 5 — find where the
91ms-vs-35ms composition overhead lives).
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img-size", type=int, default=64)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--out", default="/tmp/step_profile")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--fast-sin", action="store_true",
                   help="profile the bench configuration (polynomial sine)")
    p.add_argument("--stage-r256", action="store_true",
                   help="profile the shipped r256 training stage instead of "
                        "the flagship config: freeze-NeRF + diffaug + "
                        "warmup_d, aux off (configs/ffhq.yaml train_r256)")
    args = p.parse_args()

    from cips3d_tpu.models.discriminator import DiscriminatorMultiScaleAux
    from cips3d_tpu.models.generator import GeneratorConfig, GeneratorNerfINR, RenderOptions
    from cips3d_tpu.train.state import TrainConfig
    from cips3d_tpu.train.step import init_train_state, make_train_step

    if args.stage_r256:
        args.img_size = 256
        gcfg = GeneratorConfig(freeze_nerf=True, fast_sin=True)
        tcfg = TrainConfig(
            img_size=256, batch_size=args.batch, gen_lr=1e-4, disc_lr=5e-4,
            train_aux_img=False, diffaug=True, warmup_d=True,
            nerf_noise_disable=True,
        )
        aux_reg = False
    else:
        gcfg = GeneratorConfig(fast_sin=args.fast_sin)
        tcfg = TrainConfig(img_size=args.img_size, batch_size=args.batch)
        aux_reg = True
    opts = RenderOptions(img_size=args.img_size, num_steps=12)
    gen = GeneratorNerfINR(cfg=gcfg, dtype=jnp.bfloat16)
    disc = DiscriminatorMultiScaleAux(max_size=1024, dtype=jnp.bfloat16)

    key = jax.random.PRNGKey(0)
    print("init...", file=sys.stderr)
    state = init_train_state(key, gen, disc, tcfg, opts)
    step_fn = jax.jit(make_train_step(gen, disc, tcfg, opts, aux_reg=aux_reg),
                      donate_argnums=(0,))
    real = jax.random.uniform(key, (args.batch, 3, args.img_size, args.img_size)) * 2 - 1

    print("compile...", file=sys.stderr)
    state, m = step_fn(state, real, key)
    _ = float(m["d_loss"])
    t0 = time.time()
    for i in range(5):
        state, m = step_fn(state, real, jax.random.fold_in(key, i))
    _ = float(m["d_loss"])
    print(f"steady-state: {(time.time()-t0)/5*1000:.1f} ms/step", file=sys.stderr)

    jax.profiler.start_trace(args.out)
    for i in range(args.steps):
        state, m = step_fn(state, real, jax.random.fold_in(key, 100 + i))
    _ = float(m["d_loss"])
    jax.profiler.stop_trace()
    print(f"trace written to {args.out}", file=sys.stderr)

    from tools.trace_summary import summarize

    summarize(args.out, top=args.top, n_steps=args.steps)


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
