"""Same-process A/B of the NHWC discriminator path at the r256 training
stage — VERDICT r4 next #7 (prototype-or-reject with a measured number).

The ``data_format`` flag is activation-layout only (weights stay OIHW, so
the SAME params drive both legs).  Both step programs are compiled in ONE
process and timed in alternating order (A B B A B A ...) so tunnel/session
drift cancels; each timed unit is a K-step `lax.scan` with a forced scalar
readback (block_until_ready lies through the tunnel, BENCH_NOTES.md).

Accept gate (VERDICT r4 #7): flip the default iff NHWC wins >= 10 ms/step
(~4% of the 260 ms r256 step) with test parity (tests/test_discriminator.py
already proves logits/grads parity on CPU).

Usage:  python tools/measure_nhwc_ab.py [batch] [K] [n_calls]
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def build_leg(data_format, gen, tcfg, opts, aux):
    from cips3d_tpu.models.discriminator import DiscriminatorMultiScaleAux
    from cips3d_tpu.train.step import make_train_step

    disc = DiscriminatorMultiScaleAux(
        max_size=1024, dtype=jnp.bfloat16, data_format=data_format)
    step_fn = make_train_step(gen, disc, tcfg, opts, aux_reg=aux)

    def run_k(state, real, key, K):
        def body(carry, i):
            st, _ = carry
            st, metrics = step_fn(st, real, jax.random.fold_in(key, i))
            return (st, metrics["d_loss"]), None

        (state, last), _ = jax.lax.scan(
            body, (state, jnp.zeros(())), jnp.arange(K))
        return state, last

    return jax.jit(run_k, static_argnums=(3,), donate_argnums=(0,))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_calls = int(sys.argv[3]) if len(sys.argv) > 3 else 6

    from cips3d_tpu.models.discriminator import DiscriminatorMultiScaleAux
    from cips3d_tpu.models.generator import (
        GeneratorConfig, GeneratorNerfINR, RenderOptions)
    from cips3d_tpu.train.state import TrainConfig
    from cips3d_tpu.train.step import init_train_state

    img_size = 256
    gcfg = GeneratorConfig(freeze_nerf=True, fast_sin=True)
    opts = RenderOptions(img_size=img_size, num_steps=12)
    tcfg = TrainConfig(
        img_size=img_size, batch_size=batch, gen_lr=1e-4, disc_lr=5e-4,
        train_aux_img=False, diffaug=True, warmup_d=True,
        nerf_noise_disable=True,
    )
    gen = GeneratorNerfINR(cfg=gcfg, dtype=jnp.bfloat16)

    key = jax.random.PRNGKey(0)
    print("initializing (params shared across legs)...", file=sys.stderr)
    # params are layout-independent; init once with the NCHW module
    disc0 = DiscriminatorMultiScaleAux(max_size=1024, dtype=jnp.bfloat16)
    state = init_train_state(key, gen, disc0, tcfg, opts)
    real = jax.random.uniform(key, (batch, 3, img_size, img_size)) * 2 - 1

    legs = {}
    for df in ("NCHW", "NHWC"):
        print(f"compiling {df} leg...", file=sys.stderr)
        run_k = build_leg(df, gen, tcfg, opts, aux=False)
        st = jax.tree_util.tree_map(jnp.array, state)  # private donatable copy
        t0 = time.time()
        st, loss = run_k(st, real, key, K)
        print(f"  compile+first {K}: {time.time() - t0:.1f}s "
              f"d_loss={float(loss):.4f}", file=sys.stderr)
        legs[df] = {"run": run_k, "state": st, "times": []}

    order = ["NCHW", "NHWC"]
    seq = []
    for i in range(n_calls):  # ABBA ABBA ... cancels linear drift
        seq.extend(order if i % 2 == 0 else order[::-1])
    for j, df in enumerate(seq):
        leg = legs[df]
        t0 = time.time()
        leg["state"], loss = leg["run"](
            leg["state"], real, jax.random.fold_in(key, j), K)
        _ = float(loss)  # forced readback
        dt = (time.time() - t0) / K * 1000
        leg["times"].append(dt)
        print(f"  [{j}] {df}: {dt:.1f} ms/step", file=sys.stderr)

    out = {"batch": batch, "K": K}
    for df in order:
        ts = legs[df]["times"]
        out[df] = {
            "ms_per_step_median": round(statistics.median(ts), 1),
            "ms_per_step_mean": round(statistics.mean(ts), 1),
            "all": [round(t, 1) for t in ts],
        }
    delta = out["NCHW"]["ms_per_step_median"] - out["NHWC"]["ms_per_step_median"]
    out["nhwc_wins_ms"] = round(delta, 1)
    out["verdict"] = ("flip" if delta >= 10.0 else "reject")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
