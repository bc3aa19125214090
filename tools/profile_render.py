"""Stage-by-stage timing of the NeuMesh render pipeline on the bench
workload (bench.py shapes). Run solo on the TPU; prints one line per stage.

Usage: python -u tools/profile_render.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax_block(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax_block(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:42s} {dt:9.2f} ms")
    return dt


def jax_block(x):
    import jax
    jax.block_until_ready(x)


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
    from neumesh_tpu.models.neumesh.model import candidate_bounded_near_far
    from neumesh_tpu.ops.rays import near_far_from_sphere
    from neumesh_tpu.render.volume import volume_render_rays

    mesh = icosphere_mesh(radius=0.5, subdivisions=5)
    mesh_grid = MeshGrid(mesh, distance_method="grid")
    model = NeuMesh(
        mesh_grid, D_density=3, D_color=4, W=256, geometry_dim=32,
        color_dim=32, multires_view=4, multires_d=8, multires_fg=2,
        multires_ft=2, enable_nablas_input=True,
        learn_indicator_weight=True, speed_factor=10.0)
    params = model.init(jax.random.PRNGKey(0))

    R, S = 4096, 128
    key = jax.random.PRNGKey(1)
    rays_o = jnp.tile(jnp.array([[0.0, 0.0, -2.5]], jnp.float32), (R, 1))
    ang = jax.random.uniform(key, (R, 2), minval=-0.2, maxval=0.2)
    rays_d = jnp.concatenate([ang, jnp.ones((R, 1))], -1)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    near, far = near_far_from_sphere(rays_o, rays_d, r=1.0)

    print(f"backend={jax.default_backend()} R={R} S={S} "
          f"C=96 verts={mesh_grid.get_number_of_vertices()}")

    # ---- full render (bench workload)
    @jax.jit
    def full(params, ro, rd):
        return volume_render_rays(
            model, params, ro, rd, jax.random.PRNGKey(0),
            detailed_output=False, perturb=False, bounded_near_far=True,
            N_samples=64, N_importance=64, N_upsample_iters=4)["rgb"]

    t_full = timeit("full render", full, params, rays_o, rays_d)

    # ---- stage A: pre-ctx (16 probes, no features) + near/far
    @jax.jit
    def stage_nearfar(params, ro, rd, near, far):
        ctx = model.make_ray_context(params, ro, rd, near, far,
                                     n_probes=16, with_features=False)
        return candidate_bounded_near_far(ctx, ro, rd, near, far)

    timeit("A: pre-ctx(16) + near/far", stage_nearfar,
           params, rays_o, rays_d, near, far)

    # ---- stage B: ctx build (8 probes, with features)
    @jax.jit
    def stage_ctx(params, ro, rd, near, far):
        return model.make_ray_context(params, ro, rd, near, far, n_probes=8)

    ctx = stage_ctx(params, rays_o, rays_d, near, far)
    timeit("B: ctx build (8 probes, features)", stage_ctx,
           params, rays_o, rays_d, near, far)

    xyz = rays_o[:, None, :] + jnp.linspace(0.3, 0.7, S)[None, :, None] \
        * rays_d[:, None, :]

    # ---- stage C: distance parts only (d2 + top8 + h) at (R, S)
    @jax.jit
    def stage_dist(params, ctx, xyz):
        return model._ctx_distance_parts(params, ctx, xyz)

    ds, W = stage_dist(params, ctx, xyz)
    timeit(f"C: _ctx_distance_parts ({R}x{S})", stage_dist, params, ctx, xyz)

    # ---- stage D: density MLP from (ds, W) at (R, S)
    @jax.jit
    def stage_dens(params, ctx, ds, W):
        return model._ctx_density(params, ctx, ds, W)[0]

    timeit(f"D: feature-einsum + density MLP", stage_dens, params, ctx, ds, W)

    # ---- stage E: full density-only query at (R, S)
    @jax.jit
    def stage_do(params, ctx, xyz):
        ds, W = model._ctx_distance_parts(params, ctx, xyz)
        return model._ctx_density(params, ctx, ds, W)[0]

    t_do = timeit(f"E: density-only ({R}x{S})", stage_do, params, ctx, xyz)

    # ---- stage F: density + nabla at (R, S)
    @jax.jit
    def stage_dn(params, ctx, xyz):
        d, n, _, _, _ = model._ctx_density_and_nabla(params, ctx, xyz)
        return d, n

    timeit(f"F: density+nabla ({R}x{S})", stage_dn, params, ctx, xyz)

    # ---- stage G: full forward (density+nabla+color) at (R, S)
    dirs = jnp.broadcast_to(rays_d[:, None, :], xyz.shape)

    @jax.jit
    def stage_fwd(params, ctx, xyz, dirs):
        d, n, d_emb, W, _ = model._ctx_density_and_nabla(params, ctx, xyz)
        c = model._ctx_color(params, ctx, d_emb, dirs, W, n)
        return d, c

    timeit(f"G: forward w/ color ({R}x{S})", stage_fwd,
           params, ctx, xyz, dirs)

    # ---- how the full render decomposes (density-only evals dominate):
    # upsample: 64 + 4x16 evals (5 calls on growing S), final: S=128
    # density-only + S=127 forward. Estimate:
    print(f"\nfull render {t_full:.1f} ms; one {R}x{S} density-only pass "
          f"{t_do:.1f} ms")


if __name__ == "__main__":
    main()
