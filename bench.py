"""Benchmark: flagship r64 adversarial train step, images/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference trains FFHQ r64 for 200k iters at batch 4/GPU on
8 GPUs in "about 2 days or less" (README.md:201-202) →
200000 * 32 / 172800 s ≈ 37.0 imgs/s on 8 GPUs ≈ 4.63 imgs/s per GPU.
``vs_baseline`` is per-chip throughput relative to that per-GPU number.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_IMGS_PER_SEC_PER_CHIP = 200000 * 32 / (2 * 86400) / 8  # ≈ 4.63


def main():
    from cips3d_tpu.models.discriminator import DiscriminatorMultiScaleAux
    from cips3d_tpu.models.generator import GeneratorConfig, GeneratorNerfINR, RenderOptions
    from cips3d_tpu.train.state import TrainConfig
    from cips3d_tpu.train.step import init_train_state, make_train_step

    img_size = 64
    batch = 4

    import os

    # fast_sin (polynomial sine, max abs err 1.7e-5) is part of the benched
    # training configuration: a 4k-step synthetic campaign reproduces the
    # exact-sin FID trend (docs/campaign_r32/POSTMORTEM.md).  BENCH_FAST_SIN=0
    # for exact-sin numbers.
    gcfg = GeneratorConfig(
        fast_sin=os.environ.get("BENCH_FAST_SIN", "1") == "1",
        # BENCH_FUSED=1 routes the G phase (fwd+bwd) through the fused
        # ray-tile kernel too; default off — its recompute backward makes
        # G-phase fused a wash-to-slight-loss, while the D phase picks the
        # kernel automatically under fast_sin (TrainConfig.fused_dphase).
        fused_ray=os.environ.get("BENCH_FUSED", "0") == "1",
        # BENCH_VJP=pallas_residual selects the residual-passing backward
        # (forward saves hidden states/pre-activations; XLA-parity 2x sine
        # count) instead of the in-VMEM recompute backward.
        fused_ray_vjp=os.environ.get("BENCH_VJP", "pallas"),
    )
    opts = RenderOptions(img_size=img_size, num_steps=12)
    tcfg = TrainConfig(
        img_size=img_size,
        batch_size=batch,
        # BENCH_DPHASE_INR=1 routes the D-phase fake INR decode through the
        # fused CIPS-INR kernel (forward-only; candidate HBM-traffic win).
        fused_dphase_inr=os.environ.get("BENCH_DPHASE_INR", "0") == "1",
    )

    gen = GeneratorNerfINR(cfg=gcfg, dtype=jnp.bfloat16)
    disc = DiscriminatorMultiScaleAux(max_size=1024, dtype=jnp.bfloat16)

    key = jax.random.PRNGKey(0)
    print("initializing...", file=sys.stderr)
    state = init_train_state(key, gen, disc, tcfg, opts)
    step_fn = make_train_step(gen, disc, tcfg, opts, aux_reg=True)

    real = jax.random.uniform(key, (batch, 3, img_size, img_size)) * 2 - 1

    # Device-side multi-step loop: lax.scan over K steps inside ONE
    # executable.  This measures true chip throughput — per-dispatch host
    # round-trips (large through the dev tunnel) are amortized away, which is
    # also how a production loop would run (device-prefetched batches).
    K = 50

    def run_k(state, real, key):
        def body(carry, i):
            st, _ = carry
            st, metrics = step_fn(st, real, jax.random.fold_in(key, i))
            return (st, metrics["d_loss"]), None

        (state, last_loss), _ = jax.lax.scan(
            body, (state, jnp.zeros(())), jnp.arange(K)
        )
        return state, last_loss

    run_k = jax.jit(run_k, donate_argnums=(0,))

    print("compiling...", file=sys.stderr)
    t0 = time.time()
    state, loss = run_k(state, real, key)
    print(f"compile+first {K} steps: {time.time() - t0:.1f}s  d_loss={float(loss):.4f}", file=sys.stderr)

    # time with an explicit host readback per call — block_until_ready can
    # return early through the dev tunnel's relay
    n_calls = 4
    t0 = time.time()
    for i in range(n_calls):
        state, loss = run_k(state, real, jax.random.fold_in(key, i))
        _ = float(loss)
    dt = time.time() - t0

    n_steps = K * n_calls
    imgs_per_sec = n_steps * batch / dt
    print(f"{n_steps} steps in {dt:.2f}s  d_loss={float(loss):.4f}", file=sys.stderr)

    # Real-data sanity phase (not the driver metric): loader -> normalize ->
    # device put -> per-step dispatch, on the synthetic zip when present.
    # Quantifies input-pipeline overhead vs the pure-chip number above.
    try:
        bench_with_input_pipeline(gen, disc, tcfg, opts, step_fn, state, img_size, batch)
    except Exception as e:  # never fail the driver metric
        print(f"input-pipeline phase skipped: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "train_imgs_per_sec_per_chip_r64",
                "value": round(imgs_per_sec, 2),
                "unit": "imgs/s",
                "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC_PER_CHIP, 2),
            }
        )
    )


def bench_with_input_pipeline(gen, disc, tcfg, opts, step_fn, state, img_size, batch,
                              n_steps=100):
    import os

    data = os.environ.get("CIPS3D_BENCH_DATA", "datasets/blobs_64.zip")
    if not os.path.exists(data):
        print(f"input-pipeline phase: no dataset at {data}", file=sys.stderr)
        return
    from cips3d_tpu.data.zip_dataset import DataLoader, ZipImageDataset

    ds = ZipImageDataset(data, resize_resolution=img_size, xflip=True)
    loader = DataLoader(ds, batch_size=batch, num_workers=2)
    fn = jax.jit(step_fn, donate_argnums=(0,))
    key = jax.random.PRNGKey(1)
    # warmup (compile of the single-step variant)
    imgs, _ = next(loader)
    state, metrics = fn(state, jnp.asarray(imgs), key)  # u8: normalized on device
    _ = float(metrics["d_loss"])
    t0 = time.time()
    for i in range(n_steps):
        imgs, _ = next(loader)
        state, metrics = fn(state, jnp.asarray(imgs), jax.random.fold_in(key, i))
    _ = float(metrics["d_loss"])
    dt = time.time() - t0
    loader.close()
    print(
        f"real-data pipeline: {n_steps} steps in {dt:.2f}s = "
        f"{n_steps * batch / dt:.1f} imgs/s (incl. loader + per-step dispatch)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
