"""Root-cause evidence for the scan+aux+r256 XLA cliff (BENCH_NOTES round-2
second pass): the identical aux train step runs ~288 ms/step as a single
dispatch but ~655 ms/step inside a 10-step `lax.scan`.

This tool compiles BOTH programs (no timing — it works even when the tunnel
is too flaky to measure) and prints what differs:
  - `memory_analysis()` peaks (HBM pressure forcing worse schedules?)
  - instruction-category counts from the optimized HLO (`copy`, `fusion`,
    `convolution`, `all-reduce`, ...) — a copy-count blowup in the scan body
    means donation/aliasing of the big activation buffers failed inside
    `lax.scan`'s while-loop carry.

Usage:  python tools/analyze_scan_aux.py [img_size] [batch] [K]
        (defaults 256 4 10 — the cliff configuration; use img_size 64 to
        confirm the small-activation case shows no blowup)
"""

import collections
import os
import re
import sys

import jax

if os.environ.get("CIPS3D_CPU") == "1":
    # local-CPU mode for smoke tests: must override the sitecustomize's
    # jax_platforms config BEFORE any jax operation (CLAUDE.md — the config
    # value beats the JAX_PLATFORMS env var)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def instr_histogram(hlo_text: str):
    """Count optimized-HLO instructions by opcode (rough textual parse)."""
    hist = collections.Counter()
    bytes_by_op = collections.Counter()
    shape_re = re.compile(r"(\w[\w-]*)\(")  # opcode before '('
    for line in hlo_text.splitlines():
        line = line.strip()
        # lines look like: [ROOT] %name = f32[4,33,65536]{...} opcode(...), ...
        # or, for tuple-shaped ops: %name = (f32[...]{...}, ...) opcode(...)
        m = re.match(
            r"(?:ROOT )?%?[\w.\-]+ = (\([^)]*\)|\S+) ([\w-]+)\(", line
        )
        if not m:
            continue
        shape, op = m.groups()
        hist[op] += 1
        nums = re.findall(r"\[([\d,]*)\]", shape)
        if nums:
            n = 1
            for d in nums[0].split(","):
                if d:
                    n *= int(d)
            bits = 16 if ("bf16" in shape or "f16" in shape) else 32
            if "s8" in shape or "u8" in shape or "pred" in shape:
                bits = 8
            bytes_by_op[op] += n * bits // 8
    return hist, bytes_by_op


def report(name, compiled):
    print(f"--- {name} ---")
    try:
        ma = compiled.memory_analysis()
        print(
            f"  argument {ma.argument_size_in_bytes/2**20:.0f} MiB, "
            f"output {ma.output_size_in_bytes/2**20:.0f} MiB, "
            f"temp {ma.temp_size_in_bytes/2**20:.0f} MiB, "
            f"peak temp+args "
            f"{(ma.temp_size_in_bytes+ma.argument_size_in_bytes)/2**20:.0f} MiB"
        )
    except Exception as e:  # memory_analysis availability varies per backend
        print(f"  memory_analysis unavailable: {e}")
    texts = compiled.as_text()
    hist, byts = instr_histogram(texts)
    total = sum(hist.values())
    print(f"  {total} instructions; top opcodes:")
    for op, n in hist.most_common(12):
        print(f"    {op:<22} {n:>6}   ~{byts[op]/2**20:>8.1f} MiB outputs")
    return hist, byts


def main():
    img_size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from cips3d_tpu.models.discriminator import DiscriminatorMultiScaleAux
    from cips3d_tpu.models.generator import (
        GeneratorConfig, GeneratorNerfINR, RenderOptions,
    )
    from cips3d_tpu.train.state import TrainConfig
    from cips3d_tpu.train.step import init_train_state, make_train_step

    # identical configuration to `tools/measure_r256_step.py [batch] 1 1`,
    # the program that exhibits the cliff
    gcfg = GeneratorConfig(freeze_nerf=img_size >= 256, fast_sin=True)
    opts = RenderOptions(img_size=img_size, num_steps=12)
    tcfg = TrainConfig(
        img_size=img_size, batch_size=batch, gen_lr=1e-4, disc_lr=5e-4,
        train_aux_img=False, diffaug=img_size >= 256, warmup_d=img_size >= 256,
        nerf_noise_disable=True,
    )
    gen = GeneratorNerfINR(cfg=gcfg, dtype=jnp.bfloat16)
    disc = DiscriminatorMultiScaleAux(max_size=1024, dtype=jnp.bfloat16)

    key = jax.random.PRNGKey(0)
    print("init...", file=sys.stderr)
    state = init_train_state(key, gen, disc, tcfg, opts)
    step_fn = make_train_step(gen, disc, tcfg, opts, aux_reg=True)
    real = jax.random.uniform(key, (batch, 3, img_size, img_size)) * 2 - 1

    single = jax.jit(step_fn, donate_argnums=(0,))

    def scanned(state, real, key):
        def body(carry, i):
            st, _ = carry
            st, metrics = step_fn(st, real, jax.random.fold_in(key, i))
            return (st, metrics["d_loss"]), None

        (state, last), _ = jax.lax.scan(body, (state, jnp.zeros(())), jnp.arange(K))
        return state, last

    scan_jit = jax.jit(scanned, donate_argnums=(0,))

    print("compiling single-step...", file=sys.stderr)
    c1 = single.lower(state, real, key).compile()
    h1, _ = report(f"single step r{img_size} b{batch} aux", c1)
    print(f"compiling {K}-step scan...", file=sys.stderr)
    c2 = scan_jit.lower(state, real, key).compile()
    h2, _ = report(f"{K}-step scan r{img_size} b{batch} aux", c2)

    print("--- per-step opcode delta (scan/K vs single) ---")
    ops = sorted(set(h1) | set(h2))
    for op in ops:
        a, b = h1.get(op, 0), h2.get(op, 0) / K
        if b > a * 1.15 + 2:
            print(f"  {op:<22} single {a:>6}  scan/step {b:>8.1f}   <-- blowup")
    print("done")


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
