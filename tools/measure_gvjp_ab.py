"""Same-process A/B/C of the G-phase VJP under fast_sin — the data-selected
lever from docs/mfu.md: r64 fast_sin training is the one HBM-saturated
program, and the in-VMEM-recompute backward (`fused_ray_vjp: pallas`) was
never measured under fast_sin (its round-3 loss was under exact sin, where
the 3x-sine recompute tax was real; with polynomial sines that tax shrinks
~5x while the residual stream's HBM traffic stays).

Legs (all fast_sin, exact flagship bench config via bench.build):
  xla      — fused_ray=False               (shipped default, t_fast_xla)
  pallas   — fused_ray + in-VMEM recompute backward
  residual — fused_ray + residual-passing backward (t_fast_resid 104.9, r4)

All three programs are compiled in ONE process and timed in cycled order
(ABC CBA ABC ...) so tunnel/session drift cancels; each timed unit is a
K-step `lax.scan` with a forced scalar readback (BENCH_NOTES.md).

Usage:  python tools/measure_gvjp_ab.py [K] [n_cycles] [--json out.json]
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

LEGS = {
    "xla": dict(fused_ray=False, fused_ray_vjp="pallas"),
    "pallas": dict(fused_ray=True, fused_ray_vjp="pallas"),
    "residual": dict(fused_ray=True, fused_ray_vjp="pallas_residual"),
}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    K = int(args[0]) if args else 50
    n_cycles = int(args[1]) if len(args) > 1 else 4
    json_out = ""
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]

    import bench
    from cips3d_tpu.train.step import init_train_state, make_train_step

    key = jax.random.PRNGKey(0)
    real = jax.random.uniform(
        key, (bench.BATCH, 3, bench.IMG_SIZE, bench.IMG_SIZE)) * 2 - 1

    legs = {}
    for name, kw in LEGS.items():
        gen, disc, tcfg, opts = bench.build(fast_sin=True, **kw)
        print(f"[{name}] initializing + compiling...", file=sys.stderr)
        state = init_train_state(key, gen, disc, tcfg, opts)
        step_fn = make_train_step(gen, disc, tcfg, opts, aux_reg=True)

        def run_k(state, real, key, step_fn=step_fn):
            def body(carry, i):
                st, _ = carry
                st, metrics = step_fn(st, real, jax.random.fold_in(key, i))
                return (st, metrics["d_loss"]), None

            (state, last), _ = jax.lax.scan(
                body, (state, jnp.zeros(())), jnp.arange(K))
            return state, last

        run_k = jax.jit(run_k, donate_argnums=(0,))
        t0 = time.time()
        state, loss = run_k(state, real, key)
        print(f"[{name}] compile+first {K}: {time.time() - t0:.1f}s "
              f"d_loss={float(loss):.4f}", file=sys.stderr)
        legs[name] = {"run": run_k, "state": state, "rates": []}

    order = list(LEGS)
    seq = []
    for i in range(n_cycles):
        seq.extend(order if i % 2 == 0 else order[::-1])
    for j, name in enumerate(seq):
        leg = legs[name]
        t0 = time.time()
        leg["state"], loss = leg["run"](
            leg["state"], real, jax.random.fold_in(key, j))
        _ = float(loss)  # forced readback
        rate = K * bench.BATCH / (time.time() - t0)
        leg["rates"].append(rate)
        print(f"  [{j}] {name}: {rate:.2f} imgs/s", file=sys.stderr)

    out = {"K": K, "batch": bench.BATCH, "img_size": bench.IMG_SIZE}
    for name in order:
        rs = legs[name]["rates"]
        out[name] = {
            "imgs_per_sec_median": round(statistics.median(rs), 2),
            "all": [round(r, 2) for r in rs],
        }
    best = max(order, key=lambda n: out[n]["imgs_per_sec_median"])
    out["best"] = best
    out["best_vs_xla_pct"] = round(
        100 * (out[best]["imgs_per_sec_median"]
               / out["xla"]["imgs_per_sec_median"] - 1), 2)
    print(json.dumps(out, indent=2))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
