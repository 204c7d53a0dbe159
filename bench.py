"""Benchmark: flagship r64 adversarial train step, images/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
``value`` is the fast_sin configuration — since round 5 this IS the shipped
FFHQ-recipe default (sin A/B v2, docs/sin_ab_r4/REPORT.md: fixed fast_sin
wins both quality and +30% throughput, rank-stable over 3 extractor seeds);
``exact_sin_imgs_per_sec`` reports the exact-``jnp.sin`` alternate (paired
with its winning fused residual-VJP G-phase) in the same session, and
``loader_imgs_per_sec`` the real-data pipeline (zip loader -> normalize ->
per-step dispatch).  Setting BENCH_FAST_SIN explicitly (the campaign
scripts do) measures that single configuration only, preserving the
per-phase campaign semantics.

Baseline: the reference trains FFHQ r64 for 200k iters at batch 4/GPU on
8 GPUs in "about 2 days or less" (README.md:201-202) →
200000 * 32 / 172800 s ≈ 37.0 imgs/s on 8 GPUs ≈ 4.63 imgs/s per GPU.
``vs_baseline`` is per-chip throughput relative to that per-GPU number.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_IMGS_PER_SEC_PER_CHIP = 200000 * 32 / (2 * 86400) / 8  # ≈ 4.63

IMG_SIZE = 64
# BENCH_BATCH: probe other batch sizes (the driver series is batch 4; the
# sin-A/B training config runs batch 8 — kernel perf is tile/grid-shaped,
# so batch generalization must be measured, not assumed).
BATCH = int(os.environ.get("BENCH_BATCH", "4"))


def build(fast_sin: bool, fused_ray=None, fused_ray_vjp=None):
    """Construct (gen, disc, tcfg, opts) for one benchmark configuration."""
    from cips3d_tpu.models.discriminator import DiscriminatorMultiScaleAux
    from cips3d_tpu.models.generator import GeneratorConfig, GeneratorNerfINR, RenderOptions
    from cips3d_tpu.train.state import TrainConfig

    gcfg = GeneratorConfig(
        fast_sin=fast_sin,
        # BENCH_FUSED=1 routes the G phase (fwd+bwd) through the fused
        # ray-tile kernel too; env default off (the fast_sin driver series
        # keeps the XLA G-phase: t_fast_resid 104.9 < t_fast_xla 107.1),
        # while the D phase picks the kernel automatically under fast_sin
        # (TrainConfig.fused_dphase).  Explicit args override the env for
        # the driver's exact-sin leg, which measures the SHIPPED FFHQ-recipe
        # config (fused residual VJP — the round-4 campaign measured it at
        # 83.97 vs 79.70 imgs/s XLA, same session).
        fused_ray=(os.environ.get("BENCH_FUSED", "0") == "1"
                   if fused_ray is None else fused_ray),
        # BENCH_VJP=pallas_residual selects the residual-passing backward
        # (forward saves hidden states/pre-activations; XLA-parity 2x sine
        # count) instead of the in-VMEM recompute backward.
        fused_ray_vjp=(os.environ.get("BENCH_VJP", "pallas")
                       if fused_ray_vjp is None else fused_ray_vjp),
    )
    opts = RenderOptions(img_size=IMG_SIZE, num_steps=12)
    tcfg = TrainConfig(
        img_size=IMG_SIZE,
        batch_size=BATCH,
        # BENCH_DPHASE_INR=0 forces the XLA D-phase INR decode; default
        # matches the shipped TrainConfig default (fused, round-4 A/B win).
        fused_dphase_inr=os.environ.get("BENCH_DPHASE_INR", "1") == "1",
        # BENCH_DPHASE=0/1 forces the D-phase fused ray-tile kernel off/on;
        # unset keeps the shipped auto-picker (on iff fast_sin).
        fused_dphase=(None if "BENCH_DPHASE" not in os.environ
                      else os.environ["BENCH_DPHASE"] == "1"),
    )
    gen = GeneratorNerfINR(cfg=gcfg, dtype=jnp.bfloat16)
    disc = DiscriminatorMultiScaleAux(max_size=1024, dtype=jnp.bfloat16)
    return gen, disc, tcfg, opts


def measure(fast_sin: bool, n_calls: int = 4, K: int = 50, **build_kw):
    """Compile + time the K-step scanned train loop; returns
    (imgs_per_sec, state, step_fn) — state is valid post-donation for the
    loader phase."""
    from cips3d_tpu.train.step import init_train_state, make_train_step

    gen, disc, tcfg, opts = build(fast_sin, **build_kw)
    key = jax.random.PRNGKey(0)
    print(f"[fast_sin={int(fast_sin)}] initializing...", file=sys.stderr)
    state = init_train_state(key, gen, disc, tcfg, opts)
    step_fn = make_train_step(gen, disc, tcfg, opts, aux_reg=True)

    real = jax.random.uniform(key, (BATCH, 3, IMG_SIZE, IMG_SIZE)) * 2 - 1

    # Device-side multi-step loop: lax.scan over K steps inside ONE
    # executable.  This measures true chip throughput — per-dispatch host
    # round-trips (large through the dev tunnel) are amortized away, which is
    # also how a production loop would run (device-prefetched batches).
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

    print(f"[fast_sin={int(fast_sin)}] compiling...", file=sys.stderr)
    t0 = time.time()
    state, loss = run_k(state, real, key)
    print(
        f"[fast_sin={int(fast_sin)}] compile+first {K} steps: "
        f"{time.time() - t0:.1f}s  d_loss={float(loss):.4f}",
        file=sys.stderr,
    )

    # time with an explicit host readback per call — block_until_ready can
    # return early through the dev tunnel's relay
    t0 = time.time()
    for i in range(n_calls):
        state, loss = run_k(state, real, jax.random.fold_in(key, i))
        _ = float(loss)
    dt = time.time() - t0

    n_steps = K * n_calls
    imgs_per_sec = n_steps * BATCH / dt
    print(
        f"[fast_sin={int(fast_sin)}] {n_steps} steps in {dt:.2f}s = "
        f"{imgs_per_sec:.2f} imgs/s  d_loss={float(loss):.4f}",
        file=sys.stderr,
    )
    return imgs_per_sec, state, step_fn


def main():
    forced = os.environ.get("BENCH_FAST_SIN")
    extra = {}
    if forced is not None:
        # Campaign mode: one explicitly-requested configuration, nothing else
        # (each campaign phase is its own process; see tools/run_r4_campaign.sh).
        imgs_per_sec, state, step_fn = measure(forced == "1")
    else:
        # Driver mode: the shipped flagship config (fast_sin since round 5)
        # + the exact-sin alternate in the same session, so both sine modes
        # remain first-class round artifacts (VERDICT r3 next #3).
        imgs_per_sec, state, step_fn = measure(True)
        try:
            # the exact-sin alternate in ITS winning G-phase pairing
            # (fused ray-tile kernel, residual VJP — docs/r3_campaign)
            exact, _, _ = measure(
                False, n_calls=2, fused_ray=True, fused_ray_vjp="pallas_residual"
            )
            extra["exact_sin_imgs_per_sec"] = round(exact, 2)
        except Exception as e:  # never fail the driver metric
            print(f"exact-sin phase skipped: {e}", file=sys.stderr)

    # Real-data sanity phase (not the headline): loader -> normalize ->
    # device put -> per-step dispatch.  Regenerates the synthetic zip when
    # absent so the loader-regression canary always runs.
    try:
        loader_ips = bench_with_input_pipeline(step_fn, state)
        if loader_ips is not None:
            extra["loader_imgs_per_sec"] = round(loader_ips, 1)
    except Exception as e:  # never fail the driver metric
        print(f"input-pipeline phase skipped: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "train_imgs_per_sec_per_chip_r64",
                "value": round(imgs_per_sec, 2),
                "unit": "imgs/s",
                "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC_PER_CHIP, 2),
                **extra,
            }
        )
    )


def bench_with_input_pipeline(step_fn, state, n_steps=100):
    data = os.environ.get("CIPS3D_BENCH_DATA", "datasets/blobs_64.zip")
    if not os.path.exists(data):
        # datasets/ is gitignored; the round-3 driver artifact silently lost
        # this phase when the zip vanished between rounds.  Deterministic
        # regeneration (same seed as the r2 campaign) keeps the canary alive.
        print(f"input-pipeline phase: regenerating {data}...", file=sys.stderr)
        from cips3d_tpu.data.synthetic import make_blob_dataset

        os.makedirs(os.path.dirname(data) or ".", exist_ok=True)
        tmp = data + ".tmp"
        make_blob_dataset(tmp, num_images=2000, img_size=IMG_SIZE, seed=1)
        os.replace(tmp, data)
    from cips3d_tpu.data.zip_dataset import DataLoader, ZipImageDataset

    ds = ZipImageDataset(data, resize_resolution=IMG_SIZE, xflip=True)
    loader = DataLoader(ds, batch_size=BATCH, num_workers=2)
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
    ips = n_steps * BATCH / dt
    print(
        f"real-data pipeline: {n_steps} steps in {dt:.2f}s = "
        f"{ips:.1f} imgs/s (incl. loader + per-step dispatch)",
        file=sys.stderr,
    )
    return ips


if __name__ == "__main__":
    main()
