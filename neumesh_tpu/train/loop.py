"""Training loop (reference train.py:201-482), TPU-first.

One jitted train step contains ray sampling, the full render pipeline, all
losses, and the optax update; the device mesh shards the per-ray pipeline
(parallel/mesh.py). Periodic full-image validation, time-based latest
checkpointing (i_save seconds), step-based backups (i_backup), interrupt-safe
save, and resume — matching the reference's auxiliary behaviour (SURVEY §5).
"""
from __future__ import annotations

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import backup_sources, save_yaml
from ..dataio import get_data
from ..models import build_framework
from ..parallel import (BATCH_AXIS, dist, get_global_mesh, make_global_batch,
                        ray_sharder)
from ..utils.checkpoints import CheckpointIO
from ..utils.logger import Logger
from ..utils.print_fn import log
from .optimizers import current_lr, get_optimizer
from .pretrain import maybe_pretrain_siren


def _tree_add(params, updates):
    return jax.tree.map(lambda p, u: p + u, params, updates)


def build_train_step(trainer, opt, render_kwargs_train, N_rays, H, W,
                     mesh=None, painting: bool = False,
                     matmul_precision: str = "default"):
    """matmul_precision: f32 MXU precision of every matmul traced inside
    the loss (forward AND the derived backward; see
    nn.f32_matmul_precision). The CUDA reference never trains at true
    f32 (torch 1.8 on Ampere runs TF32 matmuls by default; "highest"
    was 63% of the v5e training step), so the default here is "default"
    (bf16 inputs, f32 accumulation — standard TPU mixed precision),
    validated by retraining the gate scene end-to-end at each tier:
    trained-at-default scores volume_f32 29.27 / surface 34.66 vs the
    trained-at-highest 27.96 / 32.72 baseline, all quality gates green
    (round-5 precision retrains). "high" = bf16x3 (f32-equivalent
    passes); "highest" opts back into exact f32."""
    constraint = ray_sharder(mesh, batched=True)
    from ..nn import f32_matmul_precision

    def loss_fn(params, model_input, ground_truth, key, teacher_params):
        with f32_matmul_precision(matmul_precision):
            return _loss_fn(params, model_input, ground_truth, key,
                            teacher_params)

    def _loss_fn(params, model_input, ground_truth, key, teacher_params):
        if painting:
            ret = trainer.render_and_loss_painting(
                params, model_input, ground_truth, key, render_kwargs_train,
                teacher_params=teacher_params)
        else:
            ret = trainer.render_and_loss(
                params, model_input, ground_truth, key, render_kwargs_train,
                N_rays=N_rays, H=H, W=W, teacher_params=teacher_params,
                ray_constraint=constraint)
        scalars = {k: v for k, v in ret["losses"].items()}
        scalars["psnr"] = ret["extras"]["psnr"]
        for k, v in ret["extras"].get("scalars", {}).items():
            scalars[k] = v
        return ret["losses"]["total"], scalars

    mesh_grid = getattr(trainer.model, "mesh_grid", None)

    # donate params/opt_state: the update is written in place instead of
    # allocating fresh trees each step (params + Adam state are ~3x the
    # vertex-feature tables in HBM); every caller reassigns the returns
    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, model_input, ground_truth, key,
                   teacher_params, grad_mask=None, mesh_bufs=None):
        # large mesh tables arrive as ARGUMENTS (not baked constants) so
        # the serialized program stays small and mesh-independent
        # (MeshGrid.device_buffers)
        if mesh_grid is not None and mesh_bufs is not None:
            with mesh_grid.bound_buffers(mesh_bufs):
                (total, scalars), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, model_input,
                                           ground_truth, key,
                                           teacher_params)
        else:
            (total, scalars), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, model_input, ground_truth,
                                       key, teacher_params)
        if grad_mask is not None:
            grads = jax.tree.map(lambda g, m: g * m, grads, grad_mask)
        # global grad norm (reference utils/train_util.py:6-17 analog)
        scalars = dict(scalars)
        scalars["grad_norm"] = jnp.sqrt(sum(
            jnp.sum(g * g) for g in jax.tree_util.tree_leaves(grads)))
        updates, opt_state = opt.update(grads, opt_state, params)
        params = _tree_add(params, updates)
        return params, opt_state, total, scalars

    return train_step


def validate(model, params, renderer, val_dataset, view_idx, key,
             render_kwargs_test, logger: Logger, it: int,
             calc_normal: bool = True):
    """Full-image validation render (reference train.py:32-99)."""
    from ..ops.rays import get_rays

    _, sample, gt = val_dataset[view_idx]
    H, W = val_dataset.H, val_dataset.W
    intr = jnp.asarray(sample["intrinsics"])
    c2w = jnp.asarray(sample["c2w"])
    ro, rd, _ = get_rays(c2w, intr, H, W)
    kwargs = {k: v for k, v in render_kwargs_test.items()
              if k not in ("batched",)}
    kwargs["calc_normal"] = calc_normal
    rgb, depth, extras = renderer(
        params, ro, rd, key=key, detailed_output=False, **kwargs)
    rgb_im = np.asarray(rgb).reshape(H, W, 3)
    depth_im = np.asarray(depth).reshape(H, W)
    acc_im = np.asarray(extras["mask_volume"]).reshape(H, W)
    logger.add_imgs(rgb_im, "val/predicted_rgb", it)
    logger.add_imgs(np.asarray(gt["rgb"]).reshape(H, W, 3), "val/gt_rgb", it)
    dmax = depth_im.max() + 1e-9
    logger.add_imgs(np.stack([depth_im / dmax] * 3, -1), "val/pred_depth", it)
    logger.add_imgs(np.stack([np.clip(acc_im, 0, 1)] * 3, -1),
                    "val/pred_mask", it)
    if "normals_volume" in extras:
        n_im = np.asarray(extras["normals_volume"]).reshape(H, W, 3)
        logger.add_imgs(n_im / 2.0 + 0.5, "val/pred_normals", it)
    mse = float(np.mean((rgb_im.reshape(-1, 3)
                         - np.asarray(gt["rgb"])) ** 2))
    psnr = -10.0 * np.log10(mse + 1e-12)
    logger.add("validation", "psnr", psnr, it)
    return psnr


def main_function(args):
    seed = dist.init_env(args)
    exp_dir = os.path.join(args.training.log_root_dir, args.expname)
    args.training.exp_dir = exp_dir

    # aux subsystems (SURVEY §5): NaN checking + profiler trace, by flag
    if args.training.get("debug_nans", False):
        jax.config.update("jax_debug_nans", True)
    profile_dir = args.training.get("profile_dir", None)
    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    logger = Logger(
        log_dir=exp_dir,
        img_dir=os.path.join(exp_dir, "imgs"),
        monitoring=args.training.get("monitoring", "none"),
        monitoring_dir=os.path.join(exp_dir, "events"))

    if dist.is_master():
        backup_sources(os.path.join(exp_dir, "backup"))
        save_yaml(args, os.path.join(exp_dir, "config.yaml"))

    # ---- data
    train_dataset, val_dataset = get_data(
        args, return_val=True,
        val_downscale=args.data.get("val_downscale", 4.0))
    H, W = train_dataset.H, train_dataset.W

    # ---- framework
    key = jax.random.PRNGKey(seed)
    key, k_model = jax.random.split(key)
    (model, params, trainer, render_kwargs_train, render_kwargs_test,
     renderer) = build_framework(args, args.model.framework, key=k_model)
    teacher_params = getattr(trainer, "teacher_params", None)

    log.info(f"=> Experiment: {args.expname} | H,W=({H},{W}) | "
             f"devices={jax.device_count()}")

    # ---- SIREN pretrain hook (reference train.py:316-324)
    params = maybe_pretrain_siren(args, model, params, logger)

    # ---- optimizer; under multi-process DP each update advances the
    # global iteration by world_size, and the schedule is evaluated at the
    # global it (reference train.py:196,442)
    world = dist.process_count()
    opt = get_optimizer(args, params, step_scale=world)
    opt_state = opt.init(params)

    # ---- checkpoints / resume (reference train.py:281-314)
    ckpt_io = CheckpointIO(os.path.join(exp_dir, "ckpts"))
    it = 0
    ckpt_file = args.training.get("ckpt_file", None)
    if ckpt_file is None or ckpt_file == "None":
        ckpt_file = ckpt_io.latest_path()
    if ckpt_file is not None and os.path.exists(str(ckpt_file)):
        log.info(f"=> Loading checkpoint {ckpt_file}")
        loaded = ckpt_io.load_file(
            str(ckpt_file), model_template=params,
            ignore_keys=args.training.get("ckpt_ignore_keys", None) or None,
            only_use_keys=args.training.get("ckpt_only_use_keys", None)
            or None)
        params = loaded["model"]
        if "global_step" in loaded:
            it = int(np.asarray(loaded["global_step"]))
        if "optimizer" in loaded and not args.training.get(
                "ckpt_ignore_keys", None):
            try:
                from ..utils.checkpoints import restore_into
                opt_state = restore_into(opt_state, loaded["optimizer"])
            except Exception as e:
                log.warning(f"optimizer state not restored: {e}")

    # ---- device mesh: 2-D ('batch' = processes, 'data' = local devices).
    # Multi-process training REQUIRES it (global-batch assembly below);
    # single-process multi-device uses the same mesh with a trivial batch
    # axis (the reference's nn.DataParallel ray scatter).
    use_mesh = args.training.get("use_device_mesh", True)
    multihost = world > 1
    mesh = get_global_mesh() if (
        multihost or (use_mesh and jax.device_count() > 1)) else None
    train_step = build_train_step(
        trainer, opt, render_kwargs_train, args.data.N_rays, H, W,
        mesh=mesh,
        matmul_precision=args.training.get("matmul_precision", "default"))
    mg = getattr(model, "mesh_grid", None)
    mesh_bufs = mg.device_buffers() if mg is not None else None
    if multihost and mesh_bufs is not None:
        # mesh tables must be GLOBAL (replicated) arrays too: every leaf
        # of a global-mesh jitted step's inputs needs a global sharding
        from ..parallel import replicate
        mesh_bufs = replicate(mesh, mesh_bufs)
    if multihost:
        from ..parallel import replicate
        params = replicate(mesh, params)
        opt_state = replicate(mesh, opt_state)
        if teacher_params is not None:
            teacher_params = replicate(mesh, teacher_params)

    num_iters = args.training.num_iters
    # intervals are divided by world_size (reference train.py:210-213);
    # `it` advances by world_size per update (reference train.py:196,442)
    i_val = args.training.get("i_val", 500)
    i_backup = args.training.get("i_backup", 50000)
    if multihost:
        i_val = i_val // world if i_val > 0 else i_val
        i_backup = i_backup // world if i_backup > 0 else i_backup
    i_save_sec = args.training.get("i_save", 900)
    i_log = args.training.get("i_log", 20)
    batch_size = args.data.get("batch_size", 1) or 1

    # the SAME host rng on every process: the epoch image order is shared,
    # each process takes its rank's stride of every global batch (the
    # reference's DistributedSampler, train.py:244-252) — and rng draws
    # stay aligned across processes (val view choice)
    data_rng = np.random.default_rng(seed)
    t_last_save = time.time()
    t0 = time.time()
    t_last_log, it_last_log = time.time(), 0

    def save(name, final=False):
        if not dist.is_master():
            return
        ckpt_io.save(name, model=params, optimizer=opt_state,
                     global_step=it, epoch_idx=0)
        logger.flush()

    if multihost and len(train_dataset) < batch_size * world:
        raise ValueError(
            f"dataset has {len(train_dataset)} images < batch_size x "
            f"world_size = {batch_size}x{world}; shrink batch_size or "
            f"world size")
    rank = dist.process_index()

    def due(interval, it_before, it_after):
        """Interval crossing check — robust when `it` advances by
        world_size (exact-multiple checks can skip)."""
        return interval > 0 and (
            it_before // interval != it_after // interval)

    try:
        while it < num_iters:
            for batch in train_dataset.epoch_batches(
                    batch_size * world, data_rng):
                if it >= num_iters:
                    break
                _, model_input, ground_truth = batch
                if multihost:
                    # this rank's stride of the shared global image order
                    sl = slice(rank * batch_size, (rank + 1) * batch_size)
                    model_input = {k: v[sl] for k, v in model_input.items()}
                    ground_truth = {k: v[sl]
                                    for k, v in ground_truth.items()}
                    # process-local slices -> ONE global array per leaf,
                    # batch axis sharded over the process mesh axis
                    model_input = make_global_batch(mesh, model_input)
                    ground_truth = make_global_batch(mesh, ground_truth)
                else:
                    model_input = {k: jnp.asarray(v)
                                   for k, v in model_input.items()}
                    ground_truth = {k: jnp.asarray(v)
                                    for k, v in ground_truth.items()}

                if due(i_val, it - world, it):
                    # rng/key draws happen on EVERY process (streams must
                    # stay aligned); the render itself is master-only
                    key, k_val = jax.random.split(key)
                    view_idx = int(data_rng.integers(len(val_dataset)))
                    if dist.is_master():
                        psnr = validate(
                            model, params, renderer, val_dataset,
                            view_idx=view_idx,
                            key=k_val,
                            render_kwargs_test=render_kwargs_test,
                            logger=logger, it=it,
                            calc_normal=render_kwargs_train.get(
                                "calc_normal", False))
                        log.info(f"[val] it {it}: psnr {psnr:.2f}")

                key, k_step = jax.random.split(key)
                params, opt_state, total, scalars = train_step(
                    params, opt_state, model_input, ground_truth, k_step,
                    teacher_params, mesh_bufs=mesh_bufs)
                it_prev, it = it, it + world

                if due(i_log, it_prev, it):
                    total_f = float(total)  # device sync
                    now = time.time()
                    dt_it = (now - t_last_log) / max(it - it_last_log, 1)
                    t_last_log, it_last_log = now, it
                    rays_s = (args.data.N_rays * batch_size
                              / max(dt_it, 1e-9))
                    log.info(
                        f"it {it}/{num_iters} loss {total_f:.4f} psnr "
                        f"{float(scalars['psnr']):.2f} "
                        f"({dt_it * 1e3:.1f} ms/it, {rays_s:,.0f} rays/s)")
                    logger.add("learning_rates", "whole", current_lr(args, it),
                               it)
                    for k, v in scalars.items():
                        logger.add("losses" if k.startswith("loss") or
                                   k == "total" else "extras", k,
                                   float(v), it)

                if time.time() - t_last_save > i_save_sec:
                    save("latest.ckpt")
                    t_last_save = time.time()
                if due(i_backup, it_prev, it):
                    save(f"{it:08d}.ckpt")
    except KeyboardInterrupt:
        log.info("=> KeyboardInterrupt: saving latest and exiting")
        save("latest.ckpt")
        logger.flush()
        return params

    save("latest.ckpt")
    save(f"final_{it:08d}.ckpt", final=True)
    logger.flush()
    if profile_dir:
        jax.profiler.stop_trace()
    log.info(f"=> Training done in {time.time() - t0:.1f}s "
             f"({it} iterations)")
    return params
