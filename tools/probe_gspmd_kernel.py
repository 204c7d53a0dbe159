"""Localize the fused-D-phase slowdown: same step program, plain jit vs
GSPMD-sharded jit (the loop's shard_chunk_train_step path) on the real chip.

Round-4 observation: the sin-A/B fast leg (real loop, 1-device mesh,
fused_dphase auto->on) ran 6.4 img/s while bench.py (plain jit, same batch 8,
same kernel) ran 146 img/s, and the loop with the kernel forced off ran
121-136 img/s.  The only structural difference is jit-with-shardings
(cips3d_tpu/parallel/mesh.py::shard_chunk_train_step) vs plain jit.  This
probe times the identical K-step scanned chunk both ways, kernel on and off:

    python tools/probe_gspmd_kernel.py          # on the tunnel chip

Expected: if GSPMD x Mosaic-custom-call is the culprit, (sharded, kernel on)
reproduces the ~20x; the other three cells are fast.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import bench
from cips3d_tpu.parallel.mesh import (
    batch_spec,
    make_mesh,
    replicated,
    shard_chunk_train_step,
)
from cips3d_tpu.train.step import init_train_state, make_train_step

K = 20
N_CALLS = 2


def build_chunk(fused_dphase):
    os.environ["BENCH_DPHASE"] = "1" if fused_dphase else "0"
    gen, disc, tcfg, opts = bench.build(fast_sin=True)
    key = jax.random.PRNGKey(0)
    state = init_train_state(key, gen, disc, tcfg, opts)
    raw = make_train_step(gen, disc, tcfg, opts, aux_reg=True)

    def chunk_fn(st, reals, ck):
        keys = jax.random.split(ck, K)

        def body(carry, inp):
            real_i, key_i = inp
            st2, metrics = raw(carry, real_i, key_i)
            return st2, metrics["d_loss"]

        return jax.lax.scan(body, st, (reals, keys))

    return state, chunk_fn


def time_chunk(label, jitted, state, reals, key):
    t0 = time.time()
    state, loss = jitted(state, reals, key)
    _ = float(loss[-1])
    print(f"[{label}] compile+first: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    for i in range(N_CALLS):
        state, loss = jitted(state, reals, jax.random.fold_in(key, i))
        _ = float(loss[-1])
    dt = time.time() - t0
    sps = K * N_CALLS / dt
    print(
        f"[{label}] {K * N_CALLS} steps in {dt:.2f}s = "
        f"{sps * bench.BATCH:.1f} imgs/s ({dt / (K * N_CALLS) * 1e3:.1f} ms/step)",
        flush=True,
    )
    return dt / (K * N_CALLS)


def main():
    os.environ.setdefault("BENCH_BATCH", "8")
    bench.BATCH = int(os.environ["BENCH_BATCH"])
    key = jax.random.PRNGKey(1)
    reals = (
        jax.random.uniform(key, (K, bench.BATCH, 3, bench.IMG_SIZE, bench.IMG_SIZE))
        * 2
        - 1
    ).astype(jnp.float32)
    mesh = make_mesh()
    print(f"mesh: {mesh}", flush=True)
    results = {}
    for fused in (False, True):
        state, chunk_fn = build_chunk(fused)
        plain = jax.jit(chunk_fn, donate_argnums=(0,))
        results[(fused, "plain")] = time_chunk(
            f"kernel={int(fused)} plain-jit", plain, state, reals, key
        )
        state, chunk_fn = build_chunk(fused)
        rep = replicated(mesh)
        data = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, *batch_spec(mesh))
        )
        sharded = jax.jit(
            chunk_fn,
            in_shardings=(rep, data, rep),
            out_shardings=(rep, rep),
            donate_argnums=(0,),
        )
        results[(fused, "gspmd")] = time_chunk(
            f"kernel={int(fused)} gspmd-jit", sharded, state, reals, key
        )
    print("\nms/step:")
    for k, v in results.items():
        print(f"  kernel={int(k[0])} {k[1]}: {v * 1e3:.1f}")


if __name__ == "__main__":
    main()
