"""Host training drivers for the two variant pipelines: diffcam (inversion)
and the pi-GAN baseline.

The flagship driver (`train/loop.py`) is specialized to GeneratorNerfINR's
implicit-camera forward; these pipelines differ in state shape (a third Adam
optimizer + learnable camera for diffcam), step construction, and eval/
monitor rendering — but share the entire host protocol: sealed-outdir guard,
textlogger, checkpoint trees (best_fid / backups / exact resume), NaN-guard
crupted dumps, FID eval with archived dumps, fixed-z monitors with failure
escalation, scan-chunked dispatch, and the 1-D data-parallel mesh.

``run_variant_loop`` implements that protocol once over a small
``Pipeline`` interface; ``DiffcamPipeline`` / ``PiGANPipeline`` bind it to
the two model stacks.

Reference drivers being matched:
  * diffcam: `exp/cips3d_inversion/scripts/train.py:300-520` — three Adam
    optimizers (G/D/cam, `build_optimizer`), `cam_param` saved in EVERY
    checkpoint tree (`model_dict`, train.py:338-346), eval/best_fid cadence
    identical to the flagship.
  * pi-GAN: `piGAN_lib/train.py` and the v16 loop
    `exp/dev/nerf_inr/scripts/train_v16.py:384-760` — top-k GAN + identity
    penalty steps (train/pigan_step.py), curriculum-keyed stages expressed
    here as YAML stage nodes (configs/pigan.yaml), fixed-z monitors, EMA.
"""

from __future__ import annotations

import contextlib
import dataclasses
import math
import os
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cips3d_tpu.data.zip_dataset import DataLoader, ZipImageDataset
from cips3d_tpu.eval.fid import eval_fid
from cips3d_tpu.eval.images import save_image_grid, setup_evaluation, to_uint8
from cips3d_tpu.parallel.mesh import (
    make_mesh,
    replicated,
    shard_batch,
    shard_chunk_batch,
    shard_chunk_train_step,
    shard_train_step,
)
from cips3d_tpu.train.loop import LoopConfig, _refuse_sealed_outdir
from cips3d_tpu.utils.checkpoint import CheckpointManager
from cips3d_tpu.utils.textlogger import TextLogger

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


class Pipeline:
    """What a variant pipeline provides to the shared host loop.

    ``train_cfg`` must expose the flagship schedule fields the loop reads
    (img_size, batch_size, total_iters, train_aux_img, update_aux_every,
    gen_lr, disc_lr) — both variant TrainConfigs subclass the flagship's.
    """

    name: str = "variant"
    train_cfg: Any = None

    def init_state(self, key):
        raise NotImplementedError

    def make_step(self, aux_reg: bool) -> Callable:
        raise NotImplementedError

    def module_refs(self, state) -> Dict[str, Any]:
        """name -> param tree, for every checkpoint tree (incl. camera)."""
        raise NotImplementedError

    def opt_refs(self, state) -> Dict[str, Any]:
        """name -> optimizer state, resume tree only."""
        raise NotImplementedError

    def load_modules(self, state, loaded: Dict[str, Any]):
        raise NotImplementedError

    def load_opts(self, state, loaded: Dict[str, Any]):
        raise NotImplementedError

    def gen_eval_images(self, state, fake_dir: str, num_imgs: int,
                        batch_size: int, seed: int = 0,
                        shard_index: int = 0, num_shards: int = 1) -> None:
        raise NotImplementedError

    def save_monitors(self, state, out_dir: str) -> None:
        raise NotImplementedError


def _save_batch_pngs(imgs_nchw, fake_dir, start_idx, num_shards, written, n_local):
    idx = start_idx
    for i in range(imgs_nchw.shape[0]):
        if written >= n_local:
            break
        Image.fromarray(to_uint8(imgs_nchw[i])).save(
            os.path.join(fake_dir, f"fake_{idx:06d}.png")
        )
        idx += num_shards
        written += 1
    return idx, written


class DiffcamPipeline(Pipeline):
    """GeneratorDiffcam + learnable CamParams + third Adam
    (`exp/cips3d_inversion/scripts/train.py:300-346`)."""

    name = "diffcam"

    def __init__(self, generator, discriminator, camera, train_cfg, nerf_kwargs):
        self.generator = generator
        self.discriminator = discriminator
        self.camera = camera
        self.train_cfg = train_cfg
        self.nerf_kwargs = nerf_kwargs
        self._render_jit = None

    def init_state(self, key):
        from cips3d_tpu.train.diffcam_step import init_diffcam_state

        return init_diffcam_state(
            key, self.generator, self.discriminator, self.camera,
            self.train_cfg, self.nerf_kwargs,
        )

    def make_step(self, aux_reg: bool):
        from cips3d_tpu.train.diffcam_step import make_diffcam_train_step

        return make_diffcam_train_step(
            self.generator, self.discriminator, self.camera,
            self.train_cfg, self.nerf_kwargs, aux_reg=aux_reg,
        )

    def module_refs(self, state):
        # `cam_param` in every tree: `scripts/train.py:338-346` model_dict
        return {
            "cam_param": state.cam_params,
            "generator": state.g_params,
            "G_ema": state.ema_params,
            "discriminator": state.d_params,
        }

    def opt_refs(self, state):
        return {"g_opt": state.g_opt, "d_opt": state.d_opt, "cam_opt": state.cam_opt}

    def load_modules(self, state, loaded):
        return state.replace(
            cam_params=loaded["cam_param"],
            g_params=loaded["generator"],
            ema_params=loaded["G_ema"],
            d_params=loaded["discriminator"],
        )

    def load_opts(self, state, loaded):
        return state.replace(**loaded)

    def _render(self, g_params, cam_params, zs, key, h_mean, h_stddev, v_stddev):
        H = W = self.train_cfg.img_size
        k_cam, k_g = jax.random.split(key)
        rays_o, rays_d, _ = self.camera.apply(
            cam_params, k_cam, zs["z_nerf"].shape[0], H, W,
            h_mean=h_mean, h_stddev=h_stddev, v_stddev=v_stddev,
            method=self.camera.get_rays_random_pose,
        )
        nk = dataclasses.replace(self.nerf_kwargs, raw_noise_std=0.0)
        imgs, _ = self.generator.apply(
            g_params, zs, rays_o, rays_d, k_g, nk,
            method=self.generator.forward_rays,
        )
        return imgs

    def _render_fn(self):
        if self._render_jit is None:
            self._render_jit = jax.jit(self._render, static_argnames=(
                "h_mean", "h_stddev", "v_stddev"))
        return self._render_jit

    def gen_eval_images(self, state, fake_dir, num_imgs, batch_size,
                        seed=0, shard_index=0, num_shards=1):
        from cips3d_tpu.models.generator import sample_zs

        os.makedirs(fake_dir, exist_ok=True)
        render = self._render_fn()
        key = jax.random.PRNGKey(seed)
        written, idx = 0, shard_index
        n_local = (num_imgs - shard_index + num_shards - 1) // num_shards
        for step in range((n_local + batch_size - 1) // batch_size):
            k = jax.random.fold_in(key, shard_index * 100003 + step)
            kz, kr = jax.random.split(k)
            zs = sample_zs(kz, batch_size, self.generator.cfg)
            imgs = np.asarray(render(
                state.ema_params, state.cam_params, zs, kr,
                h_mean=math.pi * 0.5, h_stddev=0.3, v_stddev=0.155,
            ))
            idx, written = _save_batch_pngs(
                imgs, fake_dir, idx, num_shards, written, n_local)

    def save_monitors(self, state, out_dir):
        from cips3d_tpu.models.generator import sample_zs

        os.makedirs(out_dir, exist_ok=True)
        render = self._render_fn()
        fixed = sample_zs(jax.random.PRNGKey(0), 4, self.generator.cfg)
        key = jax.random.PRNGKey(0)

        def grid(params, cam, h_mean, path):
            imgs = np.asarray(render(
                params, cam, fixed, key, h_mean=h_mean, h_stddev=0.0, v_stddev=0.0))
            save_image_grid(imgs, path, nrow=2)

        grid(state.g_params, state.cam_params, math.pi * 0.5, f"{out_dir}/0Gz.jpg")
        grid(state.ema_params, state.cam_params, math.pi * 0.5, f"{out_dir}/0Gz_ema.jpg")
        grid(state.ema_params, state.cam_params, math.pi * 0.5 + 0.5,
             f"{out_dir}/0Gz_tilted_ema.jpg")


class PiGANPipeline(Pipeline):
    """ImplicitGenerator3d + ProgressiveDiscriminator with the legacy loop's
    top-k GAN + identity penalty (`exp/dev/nerf_inr/scripts/train_v16.py:384`,
    `piGAN_lib/train.py`)."""

    name = "pigan"

    def __init__(self, generator, discriminator, train_cfg, opts):
        self.generator = generator
        self.discriminator = discriminator
        self.train_cfg = train_cfg
        self.opts = opts
        self._render_jit = None

    def init_state(self, key):
        from cips3d_tpu.train.pigan_step import init_pigan_state

        return init_pigan_state(
            key, self.generator, self.discriminator, self.train_cfg, self.opts)

    def make_step(self, aux_reg: bool):
        from cips3d_tpu.train.pigan_step import make_pigan_train_step

        # pi-GAN has no aux-image branch; aux_reg is ignored
        return make_pigan_train_step(
            self.generator, self.discriminator, self.train_cfg, self.opts)

    def module_refs(self, state):
        return {
            "generator": state.g_params,
            "G_ema": state.ema_params,
            "discriminator": state.d_params,
        }

    def opt_refs(self, state):
        return {"g_opt": state.g_opt, "d_opt": state.d_opt}

    def load_modules(self, state, loaded):
        return state.replace(
            g_params=loaded["generator"],
            ema_params=loaded["G_ema"],
            d_params=loaded["discriminator"],
        )

    def load_opts(self, state, loaded):
        return state.replace(**loaded)

    def _render_fn(self):
        if self._render_jit is None:
            def render(params, z, key, opts):
                imgs, _ = self.generator.apply(params, z, key, opts)
                return imgs

            self._render_jit = jax.jit(render, static_argnames="opts")
        return self._render_jit

    def _eval_opts(self, **over):
        return dataclasses.replace(
            self.opts, img_size=self.train_cfg.img_size, nerf_noise=0.0, **over)

    def gen_eval_images(self, state, fake_dir, num_imgs, batch_size,
                        seed=0, shard_index=0, num_shards=1):
        os.makedirs(fake_dir, exist_ok=True)
        render = self._render_fn()
        opts = self._eval_opts()
        key = jax.random.PRNGKey(seed)
        written, idx = 0, shard_index
        n_local = (num_imgs - shard_index + num_shards - 1) // num_shards
        for step in range((n_local + batch_size - 1) // batch_size):
            k = jax.random.fold_in(key, shard_index * 100003 + step)
            kz, kr = jax.random.split(k)
            z = jax.random.normal(kz, (batch_size, self.generator.z_dim))
            imgs = np.asarray(render(state.ema_params, z, kr, opts))
            idx, written = _save_batch_pngs(
                imgs, fake_dir, idx, num_shards, written, n_local)

    def save_monitors(self, state, out_dir):
        os.makedirs(out_dir, exist_ok=True)
        render = self._render_fn()
        z = jax.random.normal(jax.random.PRNGKey(0), (4, self.generator.z_dim))
        key = jax.random.PRNGKey(0)
        base = self._eval_opts(h_stddev=0.0, v_stddev=0.0)
        tilted = dataclasses.replace(base, h_mean=math.pi * 0.5 + 0.5)
        save_image_grid(np.asarray(render(state.g_params, z, key, base)),
                        f"{out_dir}/0Gz.jpg", nrow=2)
        save_image_grid(np.asarray(render(state.ema_params, z, key, base)),
                        f"{out_dir}/0Gz_ema.jpg", nrow=2)
        save_image_grid(np.asarray(render(state.ema_params, z, key, tilted)),
                        f"{out_dir}/0Gz_tilted_ema.jpg", nrow=2)


def run_variant_loop(
    pipeline: Pipeline,
    loop_cfg: LoopConfig,
    resume: bool = False,
    finetune_dir: Optional[str] = None,
    reset_best_fid: bool = False,
    n_devices: Optional[int] = None,
):
    """The shared host protocol over a Pipeline.  Returns the final state.

    Mirrors `train/loop.py train()` (itself `exp/cips3d/scripts/train.py:
    209-578`) minus the flagship-only machinery (2-D rays mesh, multi-process
    AOT barrier — variants are 1-D data-parallel, single- or multi-process
    via the same loader sharding).
    """
    cfg = pipeline.train_cfg
    outdir = loop_cfg.outdir
    _refuse_sealed_outdir(outdir)
    os.makedirs(outdir, exist_ok=True)
    textlogger = TextLogger(os.path.join(outdir, "textdir"))
    ckpt_mgr = CheckpointManager(os.path.join(outdir, "ckptdir"), loop_cfg.max_to_keep)

    key = jax.random.PRNGKey(loop_cfg.seed)
    key, k_init = jax.random.split(key)
    mesh = make_mesh(n_devices)
    state = pipeline.init_state(k_init)

    host_state = {"step": 0, "best_fid": float("inf"), "cur_fid": float("inf")}
    if resume and ckpt_mgr.has_snapshot("resume"):
        state = pipeline.load_modules(
            state, ckpt_mgr.load_snapshot("resume", pipeline.module_refs(state)))
        # exact resume: every optimizer's moments ride the resume tree
        # (diffcam: g/d/cam — `scripts/train.py:327-346`); older trees
        # without the npz files still load, moments start fresh
        rdir = os.path.join(ckpt_mgr.ckpt_dir, "resume")
        opt_refs = {
            nm: ref for nm, ref in pipeline.opt_refs(state).items()
            if os.path.exists(os.path.join(rdir, f"{nm}.npz"))
        }
        if opt_refs:
            state = pipeline.load_opts(state, ckpt_mgr.load_snapshot("resume", opt_refs))
        host_state.update(ckpt_mgr.load_state("resume"))
        state = state.replace(step=np.asarray(host_state["step"], np.int32))
        key = jax.random.fold_in(key, int(host_state["step"]))
    elif finetune_dir:
        print(f"loading finetune weights from {finetune_dir}", flush=True)
        mgr2 = CheckpointManager(os.path.dirname(finetune_dir))
        state = pipeline.load_modules(
            state, mgr2.load_snapshot(os.path.basename(finetune_dir),
                                      pipeline.module_refs(state)))
    if reset_best_fid:
        host_state["best_fid"] = float("inf")

    n_dev = mesh.devices.size
    global_batch = cfg.batch_size * n_dev
    local_batch = global_batch // jax.process_count()
    dataset = ZipImageDataset(
        loop_cfg.data_path,
        resize_resolution=cfg.img_size,
        xflip=loop_cfg.xflip,
        cache_decoded=loop_cfg.cache_decoded,
    )
    loader = DataLoader(
        dataset,
        batch_size=local_batch,
        seed=loop_cfg.seed + int(host_state["step"]),
        shard_index=jax.process_index(),
        num_shards=jax.process_count(),
        num_workers=loop_cfg.num_workers,
    )

    step_fns = {}

    def get_step_fn(aux_reg: bool):
        if aux_reg not in step_fns:
            step_fns[aux_reg] = shard_train_step(pipeline.make_step(aux_reg), mesh)
        return step_fns[aux_reg]

    # scan-chunked dispatch (amortizes the remote-tunnel per-step round trip,
    # see loop.py) engages when the aux schedule is constant across steps
    aux_always = cfg.train_aux_img and cfg.update_aux_every == 1
    schedule_const = aux_always or not cfg.train_aux_img
    chunk_k = max(1, int(loop_cfg.dispatch_chunk))
    use_chunks = chunk_k > 1 and schedule_const and not loop_cfg.debug
    chunk_fn_cache = {}

    def get_chunk_fn(k_steps):
        if k_steps not in chunk_fn_cache:
            raw = pipeline.make_step(aux_always)

            def chunk_fn(st, reals, ck):
                keys = jax.random.split(ck, k_steps)
                return jax.lax.scan(lambda c, inp: raw(c, *inp), st, (reals, keys))

            chunk_fn_cache[k_steps] = shard_chunk_train_step(chunk_fn, mesh)
        return chunk_fn_cache[k_steps]

    def dump_crupted(name):
        ckpt_mgr.save_snapshot(
            name,
            jax.device_get(pipeline.module_refs(state)),
            state=dict(host_state),
            info_msg=f"non-finite gradients at step {host_state['step']}",
        )

    with mesh:
        if resume or finetune_dir:
            state = jax.jit(lambda s: s, out_shardings=replicated(mesh))(state)

        start = host_state["step"]
        total = 2 if loop_cfg.debug else cfg.total_iters
        t_last = time.time()
        pending = None  # (base_step, n_steps, metrics)

        def process_pending(p):
            nonlocal t_last
            if p is None:
                return
            base, k, metrics = p
            m = jax.device_get(metrics)

            def at(v, j):
                return float(v[j]) if k > 1 else float(v)

            now = time.time()
            imgs_per_sec = global_batch * k / max(now - t_last, 1e-9)
            t_last = now
            for j in range(k):
                if "d_finite" in m and not (at(m["d_finite"], j) > 0):
                    dump_crupted("D_crupted")
                if "g_finite" in m and not (at(m["g_finite"], j) > 0):
                    dump_crupted("G_crupted")
                if (base + j + 1) % loop_cfg.log_every == 0 or loop_cfg.debug:
                    mj = {name: at(v, j) for name, v in m.items()}
                    summary = {name: {name: v} for name, v in mj.items()}
                    summary["lr"] = {"G_lr": cfg.gen_lr, "D_lr": cfg.disc_lr}
                    summary["speed"] = {"imgs_per_sec": imgs_per_sec}
                    textlogger.log_dict(summary, prefix="train", step=base + j + 1)
                    print(
                        f"step {base + j + 1}: d_loss={mj['d_loss']:.4f} "
                        f"g_loss={mj['g_loss']:.4f} {imgs_per_sec:.1f} img/s",
                        flush=True,
                    )

        def eval_and_checkpoint():
            img_size = cfg.img_size
            n_eval = 16 if loop_cfg.debug else loop_cfg.num_images_real_eval
            n_gen = 16 if loop_cfg.debug else loop_cfg.num_images_gen_eval
            real_dir = os.path.join(outdir, "fid/real")
            fake_dir = os.path.join(outdir, "fid/fake")
            setup_evaluation(
                dataset.__class__(dataset.path, resize_resolution=None, xflip=False),
                real_dir, n_eval, img_size,
                del_existing=loop_cfg.del_fid_real_images,
                shard_index=jax.process_index(), num_shards=jax.process_count(),
            )
            loop_cfg.del_fid_real_images = False
            pipeline.gen_eval_images(
                state, fake_dir, n_gen,
                batch_size=(4 if loop_cfg.debug else loop_cfg.eval_batch_size),
                shard_index=jax.process_index(), num_shards=jax.process_count(),
            )
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices("fid_images_written")
            if jax.process_index() != 0:
                return
            metric_dict = eval_fid(real_dir, fake_dir)
            fid_name = next(kk for kk in metric_dict if kk.startswith("FID"))
            fid_val = metric_dict[fid_name]
            step = host_state["step"]
            textlogger.log_dict({fid_name: {fid_name: fid_val}}, prefix="eval", step=step)
            host_state["cur_fid"] = fid_val
            print(f"step {step}: {fid_name}={fid_val:.3f}", flush=True)
            if loop_cfg.archive_eval_images:
                import shutil

                shutil.copytree(
                    fake_dir, os.path.join(outdir, "fid", f"fake_step{step:06d}"),
                    dirs_exist_ok=True,
                )
            modules = jax.device_get(pipeline.module_refs(state))
            info = (
                f"step: {step}\ncur_fid: {host_state['cur_fid']}\n"
                f"best_fid: {host_state['best_fid']}"
            )
            if host_state["best_fid"] > fid_val:
                host_state["best_fid"] = fid_val
                ckpt_mgr.save_snapshot("best_fid", modules, dict(host_state), info)
            ckpt_mgr.save_backup(modules, dict(host_state), info)
            ckpt_mgr.save_snapshot(
                "resume",
                dict(modules, **jax.device_get(pipeline.opt_refs(state))),
                dict(host_state), info,
            )
            try:
                pipeline.save_monitors(state, os.path.join(ckpt_mgr.ckpt_dir, "resume"))
                host_state["monitor_failures"] = 0
            except Exception as e:  # monitor failures escalate after 3 in a row
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
                        f"monitor images failed {n_fail} evals in a row; see {marker}"
                    ) from e

        step = start
        while step < total:
            next_eval = ((step + 1 + loop_cfg.eval_every - 1) // loop_cfg.eval_every) \
                * loop_cfg.eval_every - 1
            k_max = 1 if step == 0 else min(next_eval - step + 1, total - step)
            k = chunk_k if (use_chunks and k_max >= chunk_k) else 1

            key, k_step = jax.random.split(key)
            if k > 1:
                batches = [next(loader)[0] for _ in range(k)]
                reals = shard_chunk_batch(np.stack(batches), mesh)
                state, metrics = get_chunk_fn(k)(state, reals, k_step)
            else:
                imgs_u8, _ = next(loader)
                real = shard_batch(imgs_u8, mesh)
                aux_reg = cfg.train_aux_img and (step % cfg.update_aux_every == 0)
                state, metrics = get_step_fn(aux_reg)(state, real, k_step)

            process_pending(pending)
            pending = (step, k, metrics)
            step += k
            host_state["step"] = step
            if step - k == 0 or step % loop_cfg.eval_every == 0 or loop_cfg.debug:
                process_pending(pending)
                pending = None
                eval_and_checkpoint()
                t_last = time.time()

        process_pending(pending)
        if total > start and total % loop_cfg.eval_every != 0 and not loop_cfg.debug:
            host_state["step"] = total
            eval_and_checkpoint()

    loader.close()
    textlogger.close()
    return state


# ---------------------------------------------------------------------------
# config-node -> pipeline builders (used by train/cli.py)

def build_diffcam_pipeline(cfg) -> DiffcamPipeline:
    """Resolve a YAML command node into a DiffcamPipeline
    (`configs/ffhq_diffcam_exp.yaml:144-190` train_ffhq node)."""
    from cips3d_tpu.models.camera import CamParams
    from cips3d_tpu.models.discriminator import DiscriminatorMultiScaleAux
    from cips3d_tpu.models.generator import GeneratorConfig
    from cips3d_tpu.models.generator_diffcam import GeneratorDiffcam, NerfKwargs
    from cips3d_tpu.train.diffcam_step import DiffcamTrainConfig

    gen_cfg = GeneratorConfig(**cfg.generator.to_dict())
    tc_fields = set(DiffcamTrainConfig.__dataclass_fields__)
    train_cfg = DiffcamTrainConfig(
        **{k: v for k, v in cfg.to_dict().items() if k in tc_fields})
    nk_fields = set(NerfKwargs.__dataclass_fields__)
    nk = NerfKwargs(**{k: v for k, v in cfg.get("nerf_kwargs", {}).items()
                       if k in nk_fields})
    cam_kwargs = dict(cfg.get("cam", {}))
    cam_kwargs.setdefault("H0", cfg.img_size)
    cam_kwargs.setdefault("W0", cfg.img_size)
    return DiffcamPipeline(
        generator=GeneratorDiffcam(cfg=gen_cfg),
        discriminator=DiscriminatorMultiScaleAux(**cfg.discriminator.to_dict()),
        camera=CamParams(**cam_kwargs),
        train_cfg=train_cfg,
        nerf_kwargs=nk,
    )


def build_pigan_pipeline(cfg) -> PiGANPipeline:
    """Resolve a YAML command node into a PiGANPipeline (curriculum keys
    `exp/dev/nerf_inr/curriculums.py:85-120` expressed as node fields)."""
    from cips3d_tpu.models.generator import RenderOptions
    from cips3d_tpu.models.pigan import ImplicitGenerator3d, ProgressiveDiscriminator
    from cips3d_tpu.train.pigan_step import PiGANTrainConfig

    tc_fields = set(PiGANTrainConfig.__dataclass_fields__)
    train_cfg = PiGANTrainConfig(
        **{k: v for k, v in cfg.to_dict().items() if k in tc_fields})
    r = cfg.render.to_dict()
    hierarchical = r.pop("hierarchical_sample", True)
    opts = RenderOptions(
        img_size=cfg.img_size, hierarchical_sample=hierarchical, **r)
    return PiGANPipeline(
        generator=ImplicitGenerator3d(**cfg.generator.to_dict()),
        discriminator=ProgressiveDiscriminator(**cfg.discriminator.to_dict()),
        train_cfg=train_cfg,
        opts=opts,
    )
