"""Micro-timings for the render pipeline's non-MLP suspects: sorts,
top_k, sample_pdf, gathers, and the upsample loop as a whole.

Usage: python -u tools/profile_micro.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    cache_dir = os.path.join(os.path.expanduser("~"), ".cache",
                             "neumesh_tpu_jax")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    from neumesh_tpu.dataio.synthetic import icosphere_mesh
    from neumesh_tpu.mesh import MeshGrid
    from neumesh_tpu.models.neumesh.model import NeuMesh
    from neumesh_tpu.ops.rays import near_far_from_sphere, sample_pdf

    def timeit(name, fn, *args, iters=20):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:46s} {dt:9.2f} ms")
        return dt

    mesh = icosphere_mesh(radius=0.5, subdivisions=5)
    mesh_grid = MeshGrid(mesh, distance_method="grid")
    model = NeuMesh(
        mesh_grid, D_density=3, D_color=4, W=256, geometry_dim=32,
        color_dim=32, multires_view=4, multires_d=8, multires_fg=2,
        multires_ft=2, enable_nablas_input=True,
        learn_indicator_weight=True, speed_factor=10.0)
    params = model.init(jax.random.PRNGKey(0))

    R = 4096
    key = jax.random.PRNGKey(1)
    rays_o = jnp.tile(jnp.array([[0.0, 0.0, -2.5]], jnp.float32), (R, 1))
    ang = jax.random.uniform(key, (R, 2), minval=-0.2, maxval=0.2)
    rays_d = jnp.concatenate([ang, jnp.ones((R, 1))], -1)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    near, far = near_far_from_sphere(rays_o, rays_d, r=1.0)
    print(f"backend={jax.default_backend()}")

    # ---- raw sorts at ctx-build shapes
    ids = jax.random.randint(key, (R, 192), 0, 10242, jnp.int32)
    timeit("sort int32 (4096,192)", jax.jit(lambda a: jnp.sort(a, -1)), ids)
    d2 = jax.random.uniform(key, (R, 192))
    timeit("top_k 96-of-192 f32",
           jax.jit(lambda a: jax.lax.top_k(a, 96)[1]), d2)
    timeit("argsort f32 (4096,128)",
           jax.jit(lambda a: jnp.argsort(a, -1)),
           jax.random.uniform(key, (R, 128)))
    d2s = jax.random.uniform(key, (R, 128, 96))
    timeit("top_k 8-of-96 f32 (4096,128,96)",
           jax.jit(lambda a: jax.lax.top_k(-a, 8)[0]), d2s)

    # ---- sample_pdf at upsample shapes (bins grow 64->112)
    bins = jnp.sort(jax.random.uniform(key, (R, 112)), -1)
    w = jax.random.uniform(key, (R, 111)) + 0.01
    timeit("sample_pdf 16 of (4096,112)",
           jax.jit(lambda b, w: sample_pdf(b, w, 16, det=True)), bins, w)

    # ---- feature gathers at ctx shapes
    idg = jax.random.randint(key, (R, 96), 0, 10242, jnp.int32)
    geo = params["geometry_features"]
    timeit("gather (4096,96,32) from (10242,32)",
           jax.jit(lambda f, i: f[i]), geo, idg)
    cand = mesh_grid.grid.cand_idx
    flat = jax.random.randint(key, (R, 16), 0, cand.shape[0], jnp.int32)
    timeit("gather cand_idx (4096,16,24)",
           jax.jit(lambda c, f: c[f]), cand, flat)

    # ---- the full upsample loop (stop-gradient region), isolated
    from neumesh_tpu.ops.alpha import alpha_to_w, cdf_Phi_s

    bound = model.bind_rays(params, rays_o, rays_d, near, far, n_probes=8)
    ctx = bound.ctx

    @jax.jit
    def upsample(params, d_coarse):
        _d = d_coarse
        _xyz = rays_o[..., None, :] + _d[..., None] * rays_d[..., None, :]
        _sdf = bound.forward_density_only(params, _xyz)
        for i in range(4):
            prev_sdf, next_sdf = _sdf[..., :-1], _sdf[..., 1:]
            prev_z, next_z = _d[..., :-1], _d[..., 1:]
            mid_sdf = (prev_sdf + next_sdf) * 0.5
            dot_val = (next_sdf - prev_sdf) / (next_z - prev_z + 1e-5)
            prev_dot_val = jnp.concatenate(
                [jnp.zeros_like(dot_val[..., :1]), dot_val[..., :-1]], -1)
            dot_val = jnp.clip(jnp.minimum(prev_dot_val, dot_val), -10., 0.)
            dist = next_z - prev_z
            prev_cdf = cdf_Phi_s(mid_sdf - dot_val * dist * 0.5, 256 * 2**i)
            next_cdf = cdf_Phi_s(mid_sdf + dot_val * dist * 0.5, 256 * 2**i)
            alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)
            _w = alpha_to_w(alpha)
            d_fine = sample_pdf(_d, _w, 16, det=True)
            _d = jnp.concatenate([_d, d_fine], axis=-1)
            pts_fine = (rays_o[..., None, :]
                        + d_fine[..., None] * rays_d[..., None, :])
            sdf_fine = bound.forward_density_only(params, pts_fine)
            _sdf = jnp.concatenate([_sdf, sdf_fine], axis=-1)
            sort_idx = jnp.argsort(_d, axis=-1)
            _d = jnp.take_along_axis(_d, sort_idx, axis=-1)
            _sdf = jnp.take_along_axis(_sdf, sort_idx, axis=-1)
        return _d

    t_lin = jnp.linspace(0.0, 1.0, 64)
    d_coarse = near * (1 - t_lin) + far * t_lin
    timeit("upsample loop total (64 + 4x16)", upsample, params, d_coarse)

    # ---- ctx build sub-stages
    grid = mesh_grid.grid
    dims = jnp.asarray(grid.dims)

    @jax.jit
    def ctx_probe_gather(ro, rd, near, far):
        t = jnp.linspace(0.0, 1.0, 8)
        z = near + (far - near) * t
        probes = ro[:, None, :] + z[..., None] * rd[:, None, :]
        cell = jnp.floor((probes - grid.origin) * grid.inv_h).astype(
            jnp.int32)
        cell = jnp.clip(cell, 0, dims - 1)
        flat = (cell[..., 0] * dims[1] + cell[..., 1]) * dims[2] \
            + cell[..., 2]
        return grid.cell_candidates(flat).reshape(R, -1)

    ids_real = ctx_probe_gather(rays_o, rays_d, near, far)
    timeit("ctx: probe+gather cand lists", ctx_probe_gather,
           rays_o, rays_d, near, far)
    timeit("ctx: sort+dedup ids (4096,192)",
           jax.jit(lambda i: jnp.sort(i, -1)), ids_real)

    @jax.jit
    def ctx_compact(ids, ro, rd, near, far):
        ids = jnp.sort(ids, axis=-1)
        dup = jnp.concatenate(
            [jnp.zeros((R, 1), bool), ids[:, 1:] == ids[:, :-1]], -1)
        ids = jnp.where(dup, 10242, ids)
        verts_all = jnp.concatenate(
            [mesh_grid.vertices, jnp.full((1, 3), 1e9, jnp.float32)], 0)
        vp = verts_all[ids]
        ov = vp - ro[:, None, :]
        t_c = jnp.clip(jnp.einsum("rcd,rd->rc", ov, rd), near, far)
        seg = ro[:, None, :] + t_c[..., None] * rd[:, None, :]
        d2_seg = jnp.sum((vp - seg) ** 2, -1)
        _, keep = jax.lax.top_k(-d2_seg, 96)
        return jnp.take_along_axis(ids, keep, axis=-1)

    timeit("ctx: sort+dedup+rank+topk full", ctx_compact,
           ids_real, rays_o, rays_d, near, far)


if __name__ == "__main__":
    main()
