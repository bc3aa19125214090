"""Compare implementations of the candidate-field inner ops at large and
small sample counts (the upsample loop evaluates S=16 slices; batched
per-ray einsums pad catastrophically on the MXU there).

Usage: python -u tools/profile_ctxvariants.py
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
    from neumesh_tpu.ops.rays import near_far_from_sphere

    def timeit(name, fn, *args, iters=20):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:52s} {dt:9.2f} ms")
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
    bound = model.bind_rays(params, rays_o, rays_d, near, far, n_probes=8)
    ctx = bound.ctx
    print(f"backend={jax.default_backend()} C={ctx['pts'].shape[1]}")

    def make_xyz(S):
        return rays_o[:, None, :] + jnp.linspace(0.3, 0.7, S)[None, :, None] \
            * rays_d[:, None, :]

    # ---- variant A: current einsum path
    def dens_einsum(params, ctx, xyz):
        ds, W = model._ctx_distance_parts(params, ctx, xyz)
        return model._ctx_density(params, ctx, ds, W)[0]

    # ---- variant B: K=3 contractions as broadcast mul-add (VPU), feature
    # matmul unchanged
    def dist_bcast(params, ctx, xyz, K=8):
        w1 = model.forward_indicator_weight(params)
        xx = jnp.sum(xyz * xyz, axis=-1)
        pts = ctx["pts"]
        xv = (xyz[..., 0:1] * pts[:, None, :, 0]
              + xyz[..., 1:2] * pts[:, None, :, 1]
              + xyz[..., 2:3] * pts[:, None, :, 2])
        d2 = jnp.maximum(xx[..., None] + ctx["pp"][:, None, :] - 2 * xv, 0.0)
        d2_sg = jax.lax.stop_gradient(d2)
        neg_k, _ = jax.lax.top_k(-d2_sg, K)
        thresh = -neg_k[..., -1:]
        mask = d2_sg <= thresh
        w_raw = mask * (1.0 / (jnp.sqrt(d2_sg) + 1e-7))
        W = w_raw / jnp.sum(w_raw, axis=-1, keepdims=True)
        W = jax.lax.stop_gradient(W)
        d = jnp.sqrt(jnp.maximum(d2, 1e-20))
        ind = ctx["ind"]
        xn = (xyz[..., 0:1] * ind[:, None, :, 0]
              + xyz[..., 1:2] * ind[:, None, :, 1]
              + xyz[..., 2:3] * ind[:, None, :, 2])
        per_c = (w1 * (xn - ctx["vn"][:, None, :]) + d * d * d) / (w1 + d)
        ds = jnp.sum(W * per_c, axis=-1, keepdims=True)
        return ds, W

    def dens_bcast(params, ctx, xyz):
        ds, W = dist_bcast(params, ctx, xyz)
        return model._ctx_density(params, ctx, ds, W)[0]

    # ---- variant C: broadcast d2 + top-8 gather for features (no (C) matmul)
    def dens_gather(params, ctx, xyz, K=8):
        w1 = model.forward_indicator_weight(params)
        xx = jnp.sum(xyz * xyz, axis=-1)
        pts = ctx["pts"]
        xv = (xyz[..., 0:1] * pts[:, None, :, 0]
              + xyz[..., 1:2] * pts[:, None, :, 1]
              + xyz[..., 2:3] * pts[:, None, :, 2])
        d2 = jnp.maximum(xx[..., None] + ctx["pp"][:, None, :] - 2 * xv, 0.0)
        neg_k, kidx = jax.lax.top_k(-jax.lax.stop_gradient(d2), K)
        dk = jnp.sqrt(jnp.maximum(-neg_k, 1e-20))         # (R, S, K)
        wk = 1.0 / (dk + 1e-7)
        wk = jax.lax.stop_gradient(wk / jnp.sum(wk, -1, keepdims=True))
        # gather per-ray neighbour rows: (R, S, K, ·)
        nbr_pts = jnp.take_along_axis(
            pts[:, None], kidx[..., None], axis=2)
        nbr_ind = jnp.take_along_axis(
            ctx["ind"][:, None], kidx[..., None], axis=2)
        dirv = xyz[..., None, :] - nbr_pts
        w2 = jnp.sqrt(jnp.sum(dirv * dirv, -1, keepdims=True) + 1e-20)
        mid = (nbr_ind * w1 + dirv * w2) / (w1 + w2)
        ds = jnp.sum(wk[..., None] * jnp.sum(dirv * mid, -1, keepdims=True),
                     -2)
        fg = jnp.sum(jnp.take_along_axis(
            ctx["geo"][:, None], kidx[..., None], axis=2)
            * wk[..., None], -2)
        return model._density_from_interp(params, ds, fg)[0]

    for S in (128, 16):
        xyz = make_xyz(S)
        fA = jax.jit(dens_einsum)
        fB = jax.jit(dens_bcast)
        fC = jax.jit(dens_gather)
        a = fA(params, ctx, xyz)
        b = fB(params, ctx, xyz)
        c = fC(params, ctx, xyz)
        import numpy as np
        print(f"S={S}: max|A-B|={float(jnp.max(jnp.abs(a - b))):.2e} "
              f"max|A-C|={float(jnp.max(jnp.abs(a - c))):.2e}")
        timeit(f"A einsum density-only      S={S}", fA, params, ctx, xyz)
        timeit(f"B broadcast-K3 density     S={S}", fB, params, ctx, xyz)
        timeit(f"C bcast+top8-gather        S={S}", fC, params, ctx, xyz)


if __name__ == "__main__":
    main()
