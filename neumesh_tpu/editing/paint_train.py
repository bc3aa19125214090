"""Texture painting fine-tune (reference editing/paint.py).

Freezes the geometry (ln_s, geometry_features, geometry MLP, indicator) and
fine-tunes only the color codes of vertices touched by the paint rays
(found by host-side ray casting, reference paint.py:34-52); the gradient
mask (reference's register_hook, paint.py:315-324) is a pytree of 0/1
multipliers applied inside the jitted train step. Paint rays render with
random view directions (view-independence trick), background rays keep
distillation.
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import load_yaml, save_yaml
from ..dataio import get_data
from ..models import build_framework
from ..train.loop import build_train_step
from ..train.optimizers import get_optimizer
from ..utils.checkpoints import CheckpointIO
from ..utils.logger import Logger
from ..utils.print_fn import log


def get_optimized_features(mesh_grid, rays_o: np.ndarray,
                           rays_d: np.ndarray, batch_size: int = 4096):
    """Vertex ids of triangles hit by paint rays
    (reference paint.py:34-52)."""
    hit_vertices = []
    for i in range(0, len(rays_o), batch_size):
        t_hit, tri_ids = mesh_grid.cast_ray(
            rays_o[i:i + batch_size], rays_d[i:i + batch_size])
        miss = ~np.isfinite(t_hit)
        if miss.sum():
            log.warning(f"{int(miss.sum())} paint rays do not hit the mesh")
        tri_ids = tri_ids[~miss]
        tris = np.asarray(mesh_grid.mesh.triangles)[tri_ids.reshape(-1)]
        hit_vertices.append(tris.reshape(-1))
    if not hit_vertices:
        return np.zeros(0, np.int64)
    return np.unique(np.concatenate(hit_vertices))


def make_grad_mask(params, optimized_indices: np.ndarray):
    """Zero-mask for every leaf except color_features rows of painted
    vertices."""
    mask = jax.tree.map(lambda x: jnp.zeros((), x.dtype), params)
    vmask = np.zeros((params["color_features"].shape[0], 1), np.float32)
    vmask[np.asarray(optimized_indices, np.int64)] = 1.0
    mask["color_features"] = jnp.asarray(vmask)
    return mask


def update_paint_config(paint_config: dict, cli_args=None):
    """Overlay the paint JSON onto the main training config
    (reference paint.py:531-555)."""
    main_config = load_yaml(paint_config["main_config"])
    main_config.expname = (main_config.expname + "_"
                          + paint_config["paint_name"])
    main_config.data.split = "entire"
    main_config.data.data_dir = paint_config["paint_dir"]
    main_config.data.batch_size = paint_config.get("batch_size", 512)
    main_config.data.setdefault("paint_dataset", True)
    main_config.training.exp_dir = os.path.join(
        main_config.training.log_root_dir, main_config.expname)
    main_config.training.ckpt_file = paint_config["ckpt_path"]
    main_config.training.num_iters = paint_config["num_iters"]
    main_config.training.i_val = paint_config.get("i_val", 1000)
    main_config.training.lr = paint_config.get("lr", 1e-2)
    main_config.training.loss_weights["distill_density"] = 1.0
    main_config.training.loss_weights["distill_color"] = 1.0
    main_config.training.loss_weights["indicator_reg"] = 1.0
    main_config.training.loss_weights["img"] = 1.0
    main_config.training.loss_weights["mask"] = 0.0
    for k, v in paint_config.items():
        main_config[k] = v
    if cli_args is not None:
        for k, v in vars(cli_args).items():
            if k != "config":
                main_config[k] = v
    return main_config


def main_function(args):
    exp_dir = args.training.exp_dir
    logger = Logger(log_dir=exp_dir,
                    monitoring=args.training.get("monitoring", "none"))
    os.makedirs(exp_dir, exist_ok=True)
    save_yaml(args, os.path.join(exp_dir, "config.yaml"))

    dataset = get_data(args)  # PaintDataset (paint_dataset=True)
    img_dataset = dataset.img_dataset

    key = jax.random.PRNGKey(42)
    key, k_model = jax.random.split(key)
    (model, params, trainer, render_kwargs_train, render_kwargs_test,
     renderer) = build_framework(args, args.model.framework, key=k_model)
    teacher_params = getattr(trainer, "teacher_params", None)
    assert teacher_params is not None, (
        "painting requires the teacher (distillation on bg rays)")

    # load the main checkpoint (model only)
    ckpt_io = CheckpointIO(os.path.join(exp_dir, "ckpts"))
    ckpt_file = args.training.ckpt_file
    log.info(f"=> Loading main ckpt {ckpt_file}")
    loaded = ckpt_io.load_file(str(ckpt_file), model_template=params)
    params = loaded["model"]

    # paintable vertices via host ray casting
    log.info("=> Finding paintable vertices (ray casting)")
    optimized_indices = get_optimized_features(
        model.mesh_grid, dataset.rays_o_paint, dataset.rays_d_paint)
    log.info(f"=> {len(optimized_indices)} paintable vertices")
    grad_mask = make_grad_mask(params, optimized_indices)

    opt = get_optimizer(args, params)
    opt_state = opt.init(params)

    train_step = build_train_step(
        trainer, opt, render_kwargs_train, args.data.N_rays,
        img_dataset.H, img_dataset.W, painting=True)

    num_iters = args.training.num_iters
    batch_size = args.data.batch_size
    data_rng = np.random.default_rng(0)
    it = 0
    t0 = time.time()
    while it < num_iters:
        for batch in dataset.epoch_batches(batch_size, data_rng):
            if it >= num_iters:
                break
            _, model_input, ground_truth = batch
            model_input = {k: jnp.asarray(v) for k, v in model_input.items()}
            ground_truth = {k: jnp.asarray(v)
                            for k, v in ground_truth.items()}
            key, k_step = jax.random.split(key)
            params, opt_state, total, scalars = train_step(
                params, opt_state, model_input, ground_truth, k_step,
                teacher_params, grad_mask=grad_mask,
                mesh_bufs=model.mesh_grid.device_buffers())
            it += 1
            if it % args.training.get("i_log", 20) == 0:
                log.info(f"it {it}/{num_iters} loss {float(total):.4f} "
                         f"psnr {float(scalars['psnr']):.2f}")
                for k, v in scalars.items():
                    logger.add("losses", k, float(v), it)

    ckpt_io.save(f"final_{it:08d}.ckpt", model=params, optimizer=opt_state,
                 global_step=it, epoch_idx=0)
    logger.flush()
    log.info(f"=> Painting done in {time.time() - t0:.1f}s")
    return params
