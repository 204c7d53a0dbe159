"""Measure the r256 training-stage step on the TPU (freeze-NeRF + diffaug +
warmup_d — the train_ffhq_high analogue) before launching the progressive
campaign: confirms the stage fits HBM at batch 4 and records its step time.

Usage:  python tools/measure_r256_step.py [batch] [batch_split] [aux]

``aux`` (0/1, default 0) doubles the D batches with aux images.  The shipped
r256 stage runs aux OFF (`configs/ffhq.yaml` train_r256 `train_aux_img:
false`, matching `ffhq_exp.yaml:192-210`); aux=1 exists to probe the
scan+aux+r256 combination, which hits an XLA scheduling cliff (~655 ms/step
vs 288 ms/step device time for the identical single-dispatch step — see
BENCH_NOTES.md round-2 second pass).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    batch_split = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    aux = bool(int(sys.argv[3])) if len(sys.argv) > 3 else False

    from cips3d_tpu.models.discriminator import DiscriminatorMultiScaleAux
    from cips3d_tpu.models.generator import GeneratorConfig, GeneratorNerfINR, RenderOptions
    from cips3d_tpu.train.state import TrainConfig
    from cips3d_tpu.train.step import init_train_state, make_train_step

    img_size = 256
    gcfg = GeneratorConfig(freeze_nerf=True, fast_sin=True)
    opts = RenderOptions(img_size=img_size, num_steps=12)
    tcfg = TrainConfig(
        img_size=img_size,
        batch_size=batch,
        batch_split=batch_split,
        gen_lr=1e-4,
        disc_lr=5e-4,
        train_aux_img=False,
        diffaug=True,
        warmup_d=True,
        nerf_noise_disable=True,
        # BENCH_DPHASE_INR=0: force the XLA D-phase INR decode (default
        # matches the shipped TrainConfig default: fused, round-4 A/B win)
        fused_dphase_inr=os.environ.get("BENCH_DPHASE_INR", "1") == "1",
    )

    gen = GeneratorNerfINR(cfg=gcfg, dtype=jnp.bfloat16)
    disc = DiscriminatorMultiScaleAux(max_size=1024, dtype=jnp.bfloat16)

    key = jax.random.PRNGKey(0)
    print("initializing...", file=sys.stderr)
    state = init_train_state(key, gen, disc, tcfg, opts)
    step_fn = make_train_step(gen, disc, tcfg, opts, aux_reg=aux)

    real = jax.random.uniform(key, (batch, 3, img_size, img_size)) * 2 - 1

    K = 10

    def run_k(state, real, key):
        def body(carry, i):
            st, _ = carry
            st, metrics = step_fn(st, real, jax.random.fold_in(key, i))
            return (st, metrics["d_loss"]), None

        (state, last), _ = jax.lax.scan(body, (state, jnp.zeros(())), jnp.arange(K))
        return state, last

    run_k = jax.jit(run_k, donate_argnums=(0,))

    print("compiling...", file=sys.stderr)
    t0 = time.time()
    state, loss = run_k(state, real, key)
    print(f"compile+first {K}: {time.time() - t0:.1f}s d_loss={float(loss):.4f}", file=sys.stderr)

    t0 = time.time()
    n_calls = 3
    for i in range(n_calls):
        state, loss = run_k(state, real, jax.random.fold_in(key, i))
        _ = float(loss)  # forced readback: block_until_ready lies via tunnel
    dt = time.time() - t0
    steps = K * n_calls
    print(
        f"r256 b{batch} split{batch_split} aux{int(aux)}: {dt / steps * 1000:.1f} ms/step = "
        f"{steps * batch / dt:.2f} imgs/s"
    )


if __name__ == "__main__":
    main()
