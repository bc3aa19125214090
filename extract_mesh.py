"""Mesh extraction CLI (reference extract_mesh.py).

Dense N^3 SDF grid evaluated on device (vmapped + chunked), isosurface
extracted on host (marching tetrahedra by default, or --method mc for
classic marching cubes with the PyMCubes-comparable vertex set; C++
native or numpy either way), vertex colors
queried at vertices with view direction = -vertex normal, written as PLY +
bbox JSON (reference extract_mesh.py:95-183).
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from neumesh_tpu.config import create_args_parser, load_config
from neumesh_tpu.mesh.marching_cubes import extract_isosurface
from neumesh_tpu.mesh.triangle_mesh import save_ply
from neumesh_tpu.models import build_framework
from neumesh_tpu.utils.checkpoints import CheckpointIO, sorted_ckpts
from neumesh_tpu.utils.print_fn import log


def evaluate_grid_sdf(model, params, N, x_range, y_range, z_range,
                      chunk=65536):
    x = np.linspace(x_range[0], x_range[1], N)
    y = np.linspace(y_range[0], y_range[1], N)
    z = np.linspace(z_range[0], z_range[1], N)
    X, Y, Z = np.meshgrid(x, y, z, indexing="ij")
    xyz = np.stack([X, Y, Z], -1).reshape(-1, 3).astype(np.float32)

    @jax.jit
    def sdf_chunk(pts):
        return model.forward_density_only(params, pts)

    out = []
    for i in range(0, len(xyz), chunk):
        pts = xyz[i:i + chunk]
        pad = chunk - len(pts)
        if pad:
            pts = np.pad(pts, ((0, pad), (0, 0)))
        sdf = np.asarray(sdf_chunk(jnp.asarray(pts)))
        out.append(sdf[:chunk - pad] if pad else sdf)
    return np.concatenate(out).reshape(N, N, N)


def evaluate_vertex_colors(model, params, vertices, normals, chunk=65536):
    @jax.jit
    def color_chunk(pts, dirs):
        _, rgb = model.forward(params, pts, dirs)
        return rgb

    verts = np.asarray(vertices, np.float32)
    dirs = -np.asarray(normals, np.float32)
    out = []
    for i in range(0, len(verts), chunk):
        p = verts[i:i + chunk]
        d = dirs[i:i + chunk]
        pad = chunk - len(p)
        if pad:
            p = np.pad(p, ((0, pad), (0, 0)))
            d = np.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        rgb = np.asarray(color_chunk(jnp.asarray(p), jnp.asarray(d)))
        out.append(rgb[:chunk - pad] if pad else rgb)
    return np.concatenate(out)


def extract_mesh(model, params, N_grid, x_range, y_range, z_range, sdf_th,
                 chunk, scale_factor, output_dir, obj_id, method="mt"):
    log.info("Predicting occupancy ...")
    sdf = evaluate_grid_sdf(model, params, N_grid, x_range, y_range, z_range,
                            chunk)
    log.info("Extracting mesh ...")
    spacing = ((x_range[1] - x_range[0]) / (N_grid - 1),
               (y_range[1] - y_range[0]) / (N_grid - 1),
               (z_range[1] - z_range[0]) / (N_grid - 1))
    origin = (x_range[0], y_range[0], z_range[0])
    mesh = extract_isosurface(sdf, sdf_th, origin, spacing,
                              method=method)
    mesh.vertices = mesh.vertices * scale_factor
    log.info(f"  {mesh.n_vertices} vertices, {mesh.n_triangles} triangles")

    log.info("Predicting color ...")
    normals = mesh.compute_vertex_normals()
    colors = evaluate_vertex_colors(model, params, mesh.vertices, normals,
                                    chunk)
    mesh.vertex_colors = np.clip(np.asarray(colors, np.float64), 0, 1)

    os.makedirs(output_dir, exist_ok=True)
    out_path = os.path.join(output_dir, f"extracted_{obj_id}.ply")
    save_ply(mesh, out_path)
    log.info(f"=> Saved {out_path}")

    min_bound = mesh.vertices.min(0)
    max_bound = mesh.vertices.max(0)
    with open(os.path.join(output_dir, f"bbox_{obj_id}.json"), "wt") as f:
        json.dump({
            "max_bound": max_bound.tolist(),
            "min_bound": min_bound.tolist(),
            "size": (max_bound - min_bound).tolist(),
        }, f, indent=4)
    return mesh


def create_extract_args(parser: argparse.ArgumentParser):
    parser.add_argument("--ckpt_path", type=str, default=None)
    parser.add_argument("--N_grid", type=int, default=256)
    parser.add_argument("--sdf_th", type=float, default=0.0)
    parser.add_argument("--chunk", type=int, default=65536)
    parser.add_argument("--scale_factor", type=float, default=1.0)
    parser.add_argument("--x_range", type=float, nargs=2, default=[-1.0, 1.0])
    parser.add_argument("--y_range", type=float, nargs=2, default=[-1.0, 1.0])
    parser.add_argument("--z_range", type=float, nargs=2, default=[-1.0, 1.0])
    parser.add_argument("--output_dir", type=str, default="out")
    parser.add_argument("--obj_id", type=str, default="0")
    parser.add_argument("--method", type=str, default="mt",
                        choices=("mt", "mc"),
                        help="isosurface extractor: marching tetrahedra "
                             "(default; watertight, ~2x triangles) or "
                             "classic marching cubes (the "
                             "PyMCubes-comparable vertex set, reference "
                             "extract_mesh.py:139)")
    return parser


if __name__ == "__main__":
    parser = create_args_parser()
    parser = create_extract_args(parser)
    args, unknown = parser.parse_known_args()
    config = load_config(args, unknown)

    model, params, *_ = build_framework(config, config.model.framework)
    ckpt_path = config.get("ckpt_path", None)
    if ckpt_path is None:
        ckpts = sorted_ckpts(os.path.join(config.training.exp_dir, "ckpts"))
        assert ckpts, "no checkpoint found; pass --ckpt_path"
        ckpt_path = ckpts[-1]
    log.info(f"=> Use ckpt: {ckpt_path}")
    io = CheckpointIO(os.path.dirname(str(ckpt_path)) or ".")
    loaded = io.load_file(str(ckpt_path))
    state = loaded.get("model", loaded)
    if any("weight_v" in str(k) for k in state):
        from neumesh_tpu.utils.torch_ckpt import neus_state_dict_to_params
        params = neus_state_dict_to_params(state, model)
    else:
        from neumesh_tpu.utils.checkpoints import restore_into
        params = restore_into(params, state)

    extract_mesh(model, params, config.N_grid,
                 tuple(config.x_range), tuple(config.y_range),
                 tuple(config.z_range), config.sdf_th, config.chunk,
                 config.scale_factor, config.output_dir, config.obj_id,
                 method=config.get("method", "mt"))
