"""Host training driver: config → models → state → data → steps → eval/ckpt.

Functional rewrite of `exp/cips3d/scripts/train.py:209-578`:
  * build G/D from config, init or resume/finetune state;
  * per-step: D phase + G phase + EMA inside ONE jitted step (two compiled
    variants cover the aux/no-aux schedule, `train.py:338`);
  * every ``log_every``: flush scalar metrics to the textlogger
    (`train.py:493-511`);
  * every ``eval_every``: dump reals (cached) + EMA fakes, compute FID, track
    best, write best/backup/resume checkpoint trees (`train.py:515-575`);
  * fixed-z image monitors incl. EMA/truncation/tilt/mirror probes
    (`train.py:86-150`);
  * NaN guard: non-finite grad steps are skipped inside the jitted step; the
    host dumps a ``{G,D}_crupted`` snapshot when it sees one
    (`train.py:420-435`).

Multi-device: one process drives the whole mesh (pjit-style SPMD); batch is
sharded over 'data', params replicated (the DDP analogue).
"""

from __future__ import annotations

import contextlib
import dataclasses
import functools
import math
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cips3d_tpu.core.ema import ema_update  # noqa: F401  (re-export convenience)
from cips3d_tpu.data.zip_dataset import DataLoader, ZipImageDataset
from cips3d_tpu.eval.fid import eval_fid
from cips3d_tpu.eval.images import gen_images, save_image_grid, setup_evaluation
from cips3d_tpu.models.discriminator import DiscriminatorMultiScaleAux
from cips3d_tpu.models.generator import (
    GeneratorConfig,
    GeneratorNerfINR,
    RenderOptions,
    sample_zs,
)
from cips3d_tpu.parallel.mesh import (
    make_mesh,
    pixel_sharding_scope,
    replicated,
    shard_batch,
    shard_chunk_batch,
    shard_chunk_train_step,
    shard_train_step,
)
from cips3d_tpu.train.state import TrainConfig, TrainState
from cips3d_tpu.train.step import init_train_state, make_train_step
from cips3d_tpu.utils.checkpoint import CheckpointManager
from cips3d_tpu.utils.textlogger import TextLogger


@dataclasses.dataclass
class LoopConfig:
    """Host-loop settings (`exp/cips3d/configs/ffhq_exp.yaml:145-189`)."""

    outdir: str = "results/run"
    data_path: str = ""
    seed: int = 1234
    log_every: int = 10
    eval_every: int = 500
    num_images_real_eval: int = 2048
    num_images_gen_eval: int = 2048
    eval_batch_size: int = 16
    fixed_z_bs: int = 16
    del_fid_real_images: bool = True
    num_workers: int = 4
    xflip: bool = True
    # memoize decoded+resized pixels in a uint8 memmap beside the zip —
    # PNG decode dominates the host pipeline at high res (see zip_dataset)
    cache_decoded: bool = False
    max_to_keep: int = 3
    debug: bool = False
    # observability (SURVEY §5 tracing row): print per-module shapes at trace
    # time (the forward_verbose analogue) / capture a jax.profiler trace of N
    # steady-state steps into <outdir>/profile
    debug_shapes: bool = False
    profile_steps: int = 0
    # steps per device dispatch: a lax.scan chunk amortizes the per-step
    # host round-trip (~0.3 s/step through the remote-TPU tunnel; measured
    # 588 vs 286 ms/step at r256).  Chunking engages only when the per-step
    # (aux_reg, d_regularize) schedule is constant; 1 disables it.
    dispatch_chunk: int = 10
    # Archive each eval's generated-image dump to fid/fake_step{N} instead of
    # letting the next eval overwrite it.  Keeps the raw samples a surrogate
    # metric was computed from, so a later metric change can re-score the
    # whole campaign (round-3 verdict next #4: the texture-extractor change
    # orphaned every earlier campaign's numbers because the images were gone).
    archive_eval_images: bool = False
    # 2-D (data x rays) training mesh: shard the generator's pixel axis over
    # `ray_shards` devices (SURVEY §2.6 ray-parallel row; needed for r512
    # where one image's sample tensor overflows a single chip's HBM — see
    # docs/r512_memory_budget.md).  Devices split as
    # (n_devices // ray_shards) data x ray_shards rays; the discriminator
    # stays batch-parallel over all devices (one all-to-all reshard of the
    # fake batch).  1 disables (plain 1-D data-parallel mesh).
    ray_shards: int = 1


@functools.lru_cache(maxsize=4)
def _monitor_render_fn(generator):
    """One jitted monitor-render fn per generator, cached across evals
    (a fresh `jax.jit(lambda ...)` per call would recompile every time —
    expensive through the remote-TPU tunnel).  RenderOptions is a frozen
    dataclass, so it rides along as a static arg."""

    def fn(p, z, k, o):
        imgs, _ = generator.apply(p, z, k, o, return_aux_img=True)
        return imgs

    return jax.jit(fn, static_argnames="o")


def save_monitor_images(
    generator, params, ema_params, fixed_zs, opts: RenderOptions, out_dir: str
):
    """Fixed-z grids: G, EMA, truncation psi=0.7, tilted, mirror-symmetry
    probe (`train.py:86-150`).

    The z batch is rendered in sub-batches capped at 8·256² pixels — a
    whole-image r256 forward of all 16 fixed z's needs ~27 GB of HBM temps
    (learned from the progressive campaign's monitor OOM); 8 images at r256
    is the eval-proven size."""
    os.makedirs(out_dir, exist_ok=True)
    key = jax.random.PRNGKey(0)
    base = dataclasses.replace(opts, h_stddev=0.0, v_stddev=0.0)
    render_fn = _monitor_render_fn(generator)
    mb_cap = max(1, (8 * 256 ** 2) // (opts.img_size ** 2))

    def render(p, o, z=fixed_zs):
        n = z["z_nerf"].shape[0]
        mb = min(n, mb_cap)
        outs = []
        for i in range(0, n, mb):
            sub = {k2: v[i : i + mb] for k2, v in z.items()}
            outs.append(np.asarray(render_fn(p, sub, key, o)))
        return np.concatenate(outs) if len(outs) > 1 else outs[0]

    bs = fixed_zs["z_nerf"].shape[0]
    nrow = max(1, int(math.sqrt(bs)))
    save_image_grid(render(params, base), f"{out_dir}/0Gz.jpg", nrow)
    save_image_grid(render(ema_params, base), f"{out_dir}/0Gz_ema.jpg", nrow)

    tilted = dataclasses.replace(base, h_mean=math.pi * 0.5 + 0.5)
    save_image_grid(render(params, tilted), f"{out_dir}/0Gz_tilted.jpg", nrow)
    save_image_grid(render(ema_params, tilted), f"{out_dir}/0Gz_tilted_ema.jpg", nrow)

    # mirror-symmetry probe: yaw 1.44 vs 1.70 (`train.py:130-148`)
    sub = {k: v[: min(8, bs)] for k, v in fixed_zs.items()}
    f1 = render(ema_params, dataclasses.replace(base, h_mean=1.44), sub)
    f2 = render(ema_params, dataclasses.replace(base, h_mean=1.70), sub)
    save_image_grid(np.concatenate([f1, f2], axis=0), f"{out_dir}/0G_flip_ema.jpg", len(sub["z_nerf"]))


def _refuse_sealed_outdir(outdir: str) -> None:
    """Refuse to write into a sealed campaign tree (round-3 verdict next #7).

    Campaign scripts call `seal_results` (tools/campaign_lib.sh) when a
    measurement campaign completes, dropping a CAMPAIGN_SEALED marker at the
    results root; once that exists the evidence is append-never.  The
    sin-A/B incident (docs/sin_ab/REPORT.md "Provenance note") was a stray
    relaunch overwriting a finished run's best_fid/resume trees — this check
    makes that a hard error instead.  Walks outdir and its ancestors so a
    stage dir under a sealed campaign root is also refused.
    """
    d = os.path.abspath(outdir)
    while True:
        marker = os.path.join(d, "CAMPAIGN_SEALED")
        if os.path.exists(marker):
            raise RuntimeError(
                f"outdir {outdir!r} is inside a sealed campaign tree "
                f"({marker} exists). Completed campaign evidence is "
                "write-protected; choose a fresh outdir (or deliberately "
                "remove the marker if you really mean to discard the "
                "evidence)."
            )
        parent = os.path.dirname(d)
        if parent == d:
            return
        d = parent


def train(
    gen_cfg: GeneratorConfig,
    train_cfg: TrainConfig,
    opts: RenderOptions,
    loop_cfg: LoopConfig,
    disc_kwargs: Optional[dict] = None,
    resume: bool = False,
    finetune_dir: Optional[str] = None,
    load_nerf_ema: bool = False,
    reset_best_fid: bool = False,
    n_devices: Optional[int] = None,
):
    """Run the adversarial loop.  Returns the final TrainState."""
    outdir = loop_cfg.outdir
    _refuse_sealed_outdir(outdir)
    os.makedirs(outdir, exist_ok=True)
    if loop_cfg.debug_shapes:
        from cips3d_tpu.utils import debug

        debug.enable(True)
    textlogger = TextLogger(os.path.join(outdir, "textdir"))
    ckpt_mgr = CheckpointManager(os.path.join(outdir, "ckptdir"), loop_cfg.max_to_keep)

    generator = GeneratorNerfINR(cfg=gen_cfg)
    discriminator = DiscriminatorMultiScaleAux(**(disc_kwargs or {}))

    key = jax.random.PRNGKey(loop_cfg.seed)
    key, k_init, k_fixed = jax.random.split(key, 3)
    ray_shards = max(1, int(loop_cfg.ray_shards))
    if ray_shards > 1:
        total_dev = n_devices or len(jax.devices())
        if total_dev % ray_shards:
            raise ValueError(
                f"ray_shards={ray_shards} must divide device count {total_dev}"
            )
        mesh = make_mesh(
            total_dev,
            axis_names=("data", "rays"),
            shape=(total_dev // ray_shards, ray_shards),
        )
    else:
        mesh = make_mesh(n_devices)
    state = init_train_state(
        k_init, generator, discriminator, train_cfg, opts, sharding=replicated(mesh)
    )

    start_state = {"step": 0, "best_fid": float("inf"), "cur_fid": float("inf")}
    module_refs = {
        "generator": state.g_params,
        "G_ema": state.ema_params,
        "discriminator": state.d_params,
    }
    if resume and ckpt_mgr.has_snapshot("resume"):
        loaded = ckpt_mgr.load_snapshot("resume", module_refs)
        state = state.replace(
            g_params=loaded["generator"],
            ema_params=loaded["G_ema"],
            d_params=loaded["discriminator"],
        )
        # Exact resume: the resume tree also carries both Adam states (mu/nu
        # moments + step count) — restoring params alone silently resets the
        # optimizers, which perturbs training right where a crash/preemption
        # retry resumes (found by the round-4 sin-A/B campaign retry logic).
        # Older resume trees predate the opt npz files; they still load,
        # moments start fresh (the previous behavior).
        rdir = os.path.join(ckpt_mgr.ckpt_dir, "resume")
        opt_refs = {
            nm: ref
            for nm, ref in (("g_opt", state.g_opt), ("d_opt", state.d_opt))
            if os.path.exists(os.path.join(rdir, f"{nm}.npz"))
        }
        if opt_refs:
            state = state.replace(**ckpt_mgr.load_snapshot("resume", opt_refs))
        start_state.update(ckpt_mgr.load_state("resume"))
        # numpy (uncommitted) so the re-sharding jit below can place it on the
        # global mesh under multi-process
        state = state.replace(step=np.asarray(start_state["step"], np.int32))
        # Decorrelate the RNG chain from the run's own early steps: the loop
        # key restarts from PRNGKey(seed), so without this a resume at step N
        # would replay the step-0.. noise/camera/z draws.
        key = jax.random.fold_in(key, int(start_state["step"]))
    elif finetune_dir:
        # weights only, step restarts (`train.py:262-271`)
        print(f"loading finetune weights from {finetune_dir}", flush=True)
        mgr2 = CheckpointManager(os.path.dirname(finetune_dir))
        loaded = mgr2.load_snapshot(os.path.basename(finetune_dir), module_refs)
        state = state.replace(
            g_params=loaded["generator"],
            ema_params=loaded["G_ema"],
            d_params=loaded["discriminator"],
        )
    if load_nerf_ema:
        state = state.replace(g_params=_copy_nerf_from_ema(state.g_params, state.ema_params))
    if reset_best_fid:
        start_state["best_fid"] = float("inf")

    fixed_zs = sample_zs(k_fixed, 4 if loop_cfg.debug else loop_cfg.fixed_z_bs, gen_cfg)

    # data: the loader yields this PROCESS's shard of the global batch
    # (DistributedSampler semantics, `train.py:301-304`)
    n_dev = mesh.devices.size
    # 2-D mesh: G's image batch is data-parallel only (pixels ride 'rays'),
    # so the global batch scales with the data axis, not the device count.
    global_batch = train_cfg.batch_size * (n_dev // ray_shards)
    if global_batch % n_dev:
        raise ValueError(
            f"batch_size={train_cfg.batch_size} must be divisible by "
            f"ray_shards={ray_shards} (D shards the batch over all devices)"
        )
    local_batch = global_batch // jax.process_count()
    dataset = ZipImageDataset(
        loop_cfg.data_path,
        resize_resolution=train_cfg.img_size,
        xflip=loop_cfg.xflip,
        cache_decoded=loop_cfg.cache_decoded,
    )
    loader = DataLoader(
        dataset,
        batch_size=local_batch,
        # offset by the resumed step so a resumed run draws a fresh shuffle
        # instead of replaying the epoch-0 order it already consumed
        # (identical across processes: step comes from the checkpoint)
        seed=loop_cfg.seed + int(start_state["step"]),
        shard_index=jax.process_index(),
        num_shards=jax.process_count(),
        num_workers=loop_cfg.num_workers,
    )

    # compiled variants cover the (aux, lazy-R1) schedule (`train.py:338,387`);
    # built lazily so a d_reg_every=1 run compiles only what it uses
    step_fns = {}

    def get_step_fn(aux_reg: bool, d_regularize: bool):
        k = (aux_reg, d_regularize)
        if k not in step_fns:
            fn = make_train_step(
                generator, discriminator, train_cfg, opts,
                aux_reg=aux_reg, d_regularize=d_regularize,
            )
            step_fns[k] = shard_train_step(fn, mesh)
        return step_fns[k]

    with contextlib.ExitStack() as _scope:
        _scope.enter_context(mesh)
        if ray_shards > 1:
            # activates the constrain_pixels/constrain_joint_batch
            # annotations inside every generator/step trace below
            _scope.enter_context(pixel_sharding_scope(mesh))
        elif mesh.devices.size > 1:
            # MULTI-chip 1-D data-parallel training must ALSO trace under
            # the scope: the scope is what routes the fused Pallas kernels
            # through `pixel_shard_map`, and on real multi-chip TPU GSPMD
            # cannot partition a Mosaic custom call at all ("Mosaic kernels
            # cannot be automatically partitioned — wrap in shard_map").
            # With the shipped defaults (fast_sin ⇒ fused D-phase ray-tile
            # + fused_dphase_inr) an unscoped multi-chip trace therefore
            # fails to compile on hardware — invisible on the CPU sim,
            # where interpret-mode Pallas lowers to partitionable XLA ops
            # (same 1-D form as `__graft_entry__.dryrun_multichip`).  On a
            # single device GSPMD never partitions, so the scope stays off
            # and the single-chip program remains exactly the measured one.
            _scope.enter_context(pixel_sharding_scope(mesh, rays_axis=None))
        if resume or finetune_dir or load_nerf_ema:
            # loaded host arrays (numpy, identical on every process) re-enter
            # the replicated layout through jit
            state = jax.jit(lambda s: s, out_shardings=replicated(mesh))(state)

        start = start_state["step"]
        total = 2 if loop_cfg.debug else train_cfg.total_iters
        t_last = time.time()
        profiling = False
        profile_start = start + 2 if total - start > loop_cfg.profile_steps + 2 else start

        # Chunked dispatch (one lax.scan of K steps per device round-trip)
        # engages only when the per-step (aux_reg, d_regularize) schedule is
        # constant across steps — true for the shipped stage configs (aux
        # every step or off, R1 every step).  Chunking shifts which
        # jax.random keys feed which step (one split per chunk instead of per
        # step) — runs are deterministic per seed but not bit-identical to
        # chunk=1 runs.
        aux_always = train_cfg.train_aux_img and train_cfg.update_aux_every == 1
        schedule_const = train_cfg.d_reg_every == 1 and (
            aux_always or not train_cfg.train_aux_img
        )
        chunk_k = max(1, int(loop_cfg.dispatch_chunk))
        use_chunks = (
            chunk_k > 1
            and schedule_const
            and not loop_cfg.debug
            and not loop_cfg.profile_steps
        )
        chunk_fn_cache = {}

        def get_chunk_fn(k_steps):
            if k_steps not in chunk_fn_cache:
                raw = make_train_step(
                    generator, discriminator, train_cfg, opts,
                    aux_reg=aux_always, d_regularize=True,
                )

                def chunk_fn(st, reals, ck):
                    keys = jax.random.split(ck, k_steps)

                    def body(carry, inp):
                        real_i, key_i = inp
                        return raw(carry, real_i, key_i)

                    return jax.lax.scan(body, st, (reals, keys))

                chunk_fn_cache[k_steps] = shard_chunk_train_step(chunk_fn, mesh)
            return chunk_fn_cache[k_steps]

        # Multi-process: AOT-compile the programs the loop will dispatch
        # first, then rendezvous through the coordination service before any
        # collective executes.  Without this, a host whose compile cache is
        # cold (cache keys are per-host: the serialized executable binds that
        # host's devices) arrives at the first gradient all-reduce minutes
        # after a warm host — past the CPU backend's 30 s Gloo context-init
        # window.  Compilation itself runs no collectives, so it is safe
        # before the barrier.
        if jax.process_count() > 1:
            from cips3d_tpu.parallel.mesh import batch_spec

            img = train_cfg.img_size
            bspec = batch_spec(mesh)
            rb = jax.ShapeDtypeStruct(
                (global_batch, 3, img, img), jnp.uint8,
                sharding=jax.sharding.NamedSharding(mesh, bspec),
            )
            aux0 = train_cfg.train_aux_img and (start % train_cfg.update_aux_every == 0)
            dreg0 = (start % train_cfg.d_reg_every) == 0
            get_step_fn(aux0, dreg0).lower(state, rb, key).compile()
            if use_chunks:
                rbk = jax.ShapeDtypeStruct(
                    (chunk_k,) + rb.shape, jnp.uint8,
                    sharding=jax.sharding.NamedSharding(
                        mesh, jax.sharding.PartitionSpec(None, *bspec)
                    ),
                )
                get_chunk_fn(chunk_k).lower(state, rbk, key).compile()
            from cips3d_tpu.parallel.mesh import host_barrier

            host_barrier(f"cips3d_pre_loop_{start}")

        # Metrics of dispatch N are inspected while dispatch N+1 executes: by
        # then they have materialized, so device_get does not stall the
        # pipeline.  Non-finite steps dump a *_crupted snapshot on every
        # occurrence (`train.py:420-435`); under chunking the dumped state is
        # the post-chunk state (the in-step guard already zeroed the bad
        # gradients).
        pending = None  # (base_step, n_steps, metrics)

        def process_pending(p):
            nonlocal t_last
            if p is None:
                return
            base, k, metrics = p
            m = jax.device_get(metrics)

            def at(v, j):
                return float(v[j]) if k > 1 else float(v)

            # One wall-clock sample per dispatch: k steps ran since the
            # previous process_pending.  Several log boundaries can fall
            # inside one chunk (log_every < k); they must all report the
            # chunk-averaged rate, not time-since-previous-log-line (which
            # is microseconds for all but the first).
            now = time.time()
            imgs_per_sec = global_batch * k / max(now - t_last, 1e-9)
            t_last = now

            for j in range(k):
                if not (at(m["d_finite"], j) > 0):
                    _dump_crupted(ckpt_mgr, state, "D_crupted", start_state)
                if not (at(m["g_finite"], j) > 0):
                    _dump_crupted(ckpt_mgr, state, "G_crupted", start_state)
                if (base + j + 1) % loop_cfg.log_every == 0 or loop_cfg.debug:
                    mj = {name: at(v, j) for name, v in m.items()}
                    summary = {name: {name: v} for name, v in mj.items()}
                    summary["lr"] = {"G_lr": train_cfg.gen_lr, "D_lr": train_cfg.disc_lr}
                    summary["speed"] = {"imgs_per_sec": imgs_per_sec}
                    textlogger.log_dict(summary, prefix="train", step=base + j + 1)
                    print(
                        f"step {base + j + 1}: d_loss={mj['d_loss']:.4f} "
                        f"g_loss={mj['g_loss']:.4f} gp={mj['grad_penalty']:.4f} "
                        f"{summary['speed']['imgs_per_sec']:.1f} img/s",
                        flush=True,
                    )

        # CIPS3D_LOOP_TIMING=1: print per-phase host timings for each chunk
        # (data/put/dispatch/pending) — attributes live-loop vs pure-step gaps
        timing = os.environ.get("CIPS3D_LOOP_TIMING", "") == "1"

        step = start
        while step < total:
            # a chunk must not straddle an in-loop eval boundary (eval after
            # step s when (s+1) % eval_every == 0) or the step-0 eval
            next_eval = ((step + 1 + loop_cfg.eval_every - 1) // loop_cfg.eval_every) \
                * loop_cfg.eval_every - 1
            k_max = 1 if step == 0 else min(next_eval - step + 1, total - step)
            k = chunk_k if (use_chunks and k_max >= chunk_k) else 1

            t_iter = time.time()
            key, k_step = jax.random.split(key)
            if k > 1:
                # raw uint8: normalization happens on device in the step
                batches = [next(loader)[0] for _ in range(k)]
                t_data = time.time()
                reals = shard_chunk_batch(np.stack(batches), mesh)
                t_put = time.time()
                state, metrics = get_chunk_fn(k)(state, reals, k_step)
                if timing:
                    t_disp = time.time()
                    print(
                        f"[timing] chunk@{step}: data {t_data - t_iter:.3f}s "
                        f"put {t_put - t_data:.3f}s dispatch {t_disp - t_put:.3f}s",
                        flush=True,
                    )
            else:
                imgs_u8, _ = next(loader)
                real = shard_batch(imgs_u8, mesh)

                # profiler window: skip the (compile) warmup steps when the
                # run is long enough, else trace from the first step
                if loop_cfg.profile_steps and step == profile_start:
                    jax.profiler.start_trace(os.path.join(outdir, "profile"))
                    profiling = True

                aux_reg = train_cfg.train_aux_img and (
                    step % train_cfg.update_aux_every == 0
                )
                # lazy R1 (`train.py:387`): regularize every d_reg_every steps
                d_reg = (step % train_cfg.d_reg_every) == 0
                state, metrics = get_step_fn(aux_reg, d_reg)(state, real, k_step)

                if profiling and step >= profile_start + loop_cfg.profile_steps - 1:
                    jax.tree_util.tree_map(lambda x: x.block_until_ready(), metrics)
                    jax.profiler.stop_trace()
                    profiling = False
                    print(f"profiler trace written to {outdir}/profile", flush=True)

            t_pp = time.time()
            process_pending(pending)
            if timing:
                print(f"[timing] pending {time.time() - t_pp:.3f}s", flush=True)
            pending = (step, k, metrics)

            step += k
            start_state["step"] = step
            if step - k == 0 or step % loop_cfg.eval_every == 0 or loop_cfg.debug:
                process_pending(pending)
                pending = None
                _run_eval_and_checkpoint(
                    generator,
                    state,
                    fixed_zs,
                    opts,
                    train_cfg,
                    loop_cfg,
                    dataset,
                    ckpt_mgr,
                    textlogger,
                    start_state,
                )
                # keep eval/ckpt wall time out of the next speed sample
                t_last = time.time()

        process_pending(pending)
        pending = None
        if profiling:
            jax.profiler.stop_trace()

        # Final eval + checkpoint when total_iters is not a multiple of
        # eval_every — otherwise the last (total % eval_every) steps would
        # never reach the resume/best trees (e.g. the r256 stage trains 1200
        # iters with eval_every 500 and would lose 200 steps of progress).
        if total > start and total % loop_cfg.eval_every != 0 and not loop_cfg.debug:
            start_state["step"] = total
            _run_eval_and_checkpoint(
                generator, state, fixed_zs, opts, train_cfg, loop_cfg,
                dataset, ckpt_mgr, textlogger, start_state,
            )

    loader.close()
    textlogger.close()
    return state


def _copy_nerf_from_ema(g_params, ema_params):
    """`load_nerf_ema`: seed siren + nerf mapping + aux head from EMA
    (`generator.py:1957-1961`)."""
    out = jax.tree_util.tree_map(lambda x: x, g_params)
    p = out["params"]
    e = ema_params["params"]
    for mod in ("siren", "mapping_network_nerf", "aux_to_rgb"):
        if mod in p and mod in e:
            p[mod] = jax.tree_util.tree_map(lambda x: x, e[mod])
    return out


def _dump_crupted(ckpt_mgr, state, name, host_state):
    ckpt_mgr.save_snapshot(
        name,
        {
            "generator": jax.device_get(state.g_params),
            "G_ema": jax.device_get(state.ema_params),
            "discriminator": jax.device_get(state.d_params),
        },
        state={k: v for k, v in host_state.items()},
        info_msg=f"non-finite gradients at step {host_state['step']}",
    )


def _run_eval_and_checkpoint(
    generator, state, fixed_zs, opts, train_cfg, loop_cfg, dataset, ckpt_mgr, textlogger, host_state
):
    # eval/monitor renders are per-host work fetched with np.asarray; they
    # must not trace under the 2-D training mesh's pixel scope (their
    # outputs would span other processes' devices — see
    # mesh.pixel_sharding_suspended)
    from cips3d_tpu.parallel import mesh as mesh_lib

    with mesh_lib.pixel_sharding_suspended():
        return _run_eval_and_checkpoint_inner(
            generator, state, fixed_zs, opts, train_cfg, loop_cfg, dataset,
            ckpt_mgr, textlogger, host_state,
        )


def _run_eval_and_checkpoint_inner(
    generator, state, fixed_zs, opts, train_cfg, loop_cfg, dataset, ckpt_mgr, textlogger, host_state
):
    img_size = train_cfg.img_size
    n_eval = 16 if loop_cfg.debug else loop_cfg.num_images_real_eval
    n_gen = 16 if loop_cfg.debug else loop_cfg.num_images_gen_eval
    real_dir = os.path.join(loop_cfg.outdir, "fid/real")
    fake_dir = os.path.join(loop_cfg.outdir, "fid/fake")

    setup_evaluation(
        dataset.__class__(dataset.path, resize_resolution=None, xflip=False),
        real_dir,
        n_eval,
        img_size,
        del_existing=loop_cfg.del_fid_real_images,
        shard_index=jax.process_index(),
        num_shards=jax.process_count(),
    )
    loop_cfg.del_fid_real_images = False

    ema_host = jax.device_get(state.ema_params)
    gen_images(
        ema_host,
        generator,
        fake_dir,
        n_gen,
        img_size,
        batch_size=loop_cfg.eval_batch_size,
        num_steps=opts.num_steps,
        opts=opts,
        shard_index=jax.process_index(),
        num_shards=jax.process_count(),
        # yaml stores the sqrt (`forward_points: 256` -> 256^2-pixel chunks,
        # `gen_images.py:60`)
        forward_points=(train_cfg.forward_points ** 2 if train_cfg.forward_points else None),
    )

    if jax.process_count() > 1:
        # all shards must be on disk before rank 0 computes FID / checkpoints
        # (the reference's d2_synchronize barriers, `train.py:526,537,575`)
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("fid_images_written")

    if jax.process_index() == 0:
        metric_dict = eval_fid(real_dir, fake_dir)
        # the key is "FID" with real InceptionV3 weights, "FID_surrogate"
        # with the fallback extractor — log files carry the honest name
        fid_name = next(k for k in metric_dict if k.startswith("FID"))
        fid_val = metric_dict[fid_name]
        step = host_state["step"]
        textlogger.log_dict({fid_name: {fid_name: fid_val}}, prefix="eval", step=step)
        host_state["cur_fid"] = fid_val
        print(f"step {step}: {fid_name}={fid_val:.3f}", flush=True)

        if loop_cfg.archive_eval_images:
            # copy (not move): other processes write straight into fake_dir
            # at the next eval, so the live dir must stay untouched
            import shutil

            shutil.copytree(
                fake_dir,
                os.path.join(loop_cfg.outdir, "fid", f"fake_step{step:06d}"),
                dirs_exist_ok=True,
            )

        modules = {
            "generator": jax.device_get(state.g_params),
            "G_ema": ema_host,
            "discriminator": jax.device_get(state.d_params),
        }
        info = (
            f"step: {step}\ncur_fid: {host_state['cur_fid']}\n"
            f"best_fid: {host_state['best_fid']}"
        )
        if host_state["best_fid"] > fid_val:
            host_state["best_fid"] = fid_val
            ckpt_mgr.save_snapshot("best_fid", modules, dict(host_state), info)
        ckpt_mgr.save_backup(modules, dict(host_state), info)
        # only the resume tree carries optimizer state (2x params of extra
        # disk per tree is wasted on best_fid/backups, which exist for
        # weights-only finetune/eval — `train.py:262-271` semantics)
        ckpt_mgr.save_snapshot(
            "resume",
            dict(
                modules,
                g_opt=jax.device_get(state.g_opt),
                d_opt=jax.device_get(state.d_opt),
            ),
            dict(host_state),
            info,
        )
        try:
            save_monitor_images(
                generator,
                modules["generator"],
                modules["G_ema"],
                fixed_zs,
                dataclasses.replace(opts, img_size=img_size),
                os.path.join(ckpt_mgr.ckpt_dir, "resume"),
            )
            host_state["monitor_failures"] = 0
        except Exception as e:  # monitors must never kill training …
            # … but a one-line print hid the r256 monitor OOM for a whole
            # campaign (round-2 postmortem).  Count consecutive failures,
            # persist the count in the checkpointed host_state, write a
            # loud marker file next to the checkpoints, and escalate to a
            # hard error once it is clearly systematic.
            n_fail = int(host_state.get("monitor_failures", 0)) + 1
            host_state["monitor_failures"] = n_fail
            import traceback

            marker = os.path.join(ckpt_mgr.ckpt_dir, "MONITOR_FAILURES.log")
            with open(marker, "a") as f:
                f.write(f"step {step} (consecutive #{n_fail}):\n")
                f.write(traceback.format_exc() + "\n")
            print(
                f"monitor images FAILED at step {step} "
                f"(consecutive #{n_fail}, details in {marker}): {e}",
                flush=True,
            )
            if n_fail >= 3:
                raise RuntimeError(
                    f"monitor images failed {n_fail} evals in a row — this "
                    f"is systematic, not transient; see {marker}"
                ) from e
