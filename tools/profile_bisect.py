"""Trustworthy micro-timings: chained varying inputs (defeats any
identical-execution shortcuts) + bandwidth calibration + bisecting the
fixed per-pass cost of the ctx density path at small S.

Usage: python -u tools/profile_bisect.py
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

    def timeit_chain(name, fn, x0, *rest, iters=30):
        """fn(x, *rest) -> same-shaped x-like output fed back as input."""
        x = fn(x0, *rest)
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        for _ in range(iters):
            x = fn(x, *rest)
        jax.block_until_ready(x)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:56s} {dt:9.3f} ms")
        return dt

    R = 4096
    key = jax.random.PRNGKey(1)
    print(f"backend={jax.default_backend()}")

    # ---- bandwidth calibration: elementwise on 200MB, chained
    big = jax.random.uniform(key, (R, 128, 96))

    timeit_chain("calib: x*1.0001+1e-7 on (4096,128,96) [200MB]",
                 jax.jit(lambda x: x * 1.0001 + 1e-7), big)

    # ---- top_k with chained input
    def topk_chain(x):
        v, _ = jax.lax.top_k(-x, 8)
        # feed something same-shaped back, dependent on the result
        return x * 0.9999 + v[..., -1:] * 1e-6

    timeit_chain("top_k 8-of-96 on (4096,128,96), chained",
                 jax.jit(topk_chain), big)

    def topk16_chain(x):
        v, _ = jax.lax.top_k(-x, 8)
        return x * 0.9999 + v[..., -1:] * 1e-6

    small = jax.random.uniform(key, (R, 16, 96))
    timeit_chain("top_k 8-of-96 on (4096, 16,96), chained",
                 jax.jit(topk16_chain), small)

    # ---- iterative 8-pass min alternative (XLA)
    def minloop_chain(x):
        cur = x
        thr = None
        for _ in range(8):
            thr = jnp.min(cur, axis=-1, keepdims=True)
            cur = jnp.where(cur <= thr, jnp.inf, cur)
        return x * 0.9999 + thr * 1e-6

    timeit_chain("8-pass min-loop on (4096,128,96), chained",
                 jax.jit(minloop_chain), big)

    # ---- argsort chained
    def argsort_chain(x):
        i = jnp.argsort(x, -1)
        return x * 0.9999 + i[..., :1] * 1e-9

    d128 = jax.random.uniform(key, (R, 128))
    timeit_chain("argsort (4096,128), chained", jax.jit(argsort_chain), d128)

    # ---- model-path bisect at S=16 and S=128
    mesh = icosphere_mesh(radius=0.5, subdivisions=5)
    mesh_grid = MeshGrid(mesh, distance_method="grid")
    model = NeuMesh(
        mesh_grid, D_density=3, D_color=4, W=256, geometry_dim=32,
        color_dim=32, multires_view=4, multires_d=8, multires_fg=2,
        multires_ft=2, enable_nablas_input=True,
        learn_indicator_weight=True, speed_factor=10.0)
    params = model.init(jax.random.PRNGKey(0))
    rays_o = jnp.tile(jnp.array([[0.0, 0.0, -2.5]], jnp.float32), (R, 1))
    ang = jax.random.uniform(key, (R, 2), minval=-0.2, maxval=0.2)
    rays_d = jnp.concatenate([ang, jnp.ones((R, 1))], -1)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    near, far = near_far_from_sphere(rays_o, rays_d, r=1.0)
    bound = model.bind_rays(params, rays_o, rays_d, near, far, n_probes=8)
    ctx = bound.ctx

    for S in (16, 128):
        xyz0 = rays_o[:, None, :] + jnp.linspace(0.3, 0.7, S)[None, :, None] \
            * rays_d[:, None, :]

        # 1. d2 chain only (no top_k, no h): xv + d2
        def d2_only(xyz, ctx):
            xx = jnp.sum(xyz * xyz, axis=-1)
            xv = jnp.einsum("rsd,rcd->rsc", xyz, ctx["pts"],
                            preferred_element_type=jnp.float32)
            d2 = jnp.maximum(xx[..., None] + ctx["pp"][:, None, :] - 2 * xv,
                             0.0)
            return xyz * 0.9999 + jnp.min(d2, -1, keepdims=True) * 1e-6

        timeit_chain(f"S={S}: d2 chain only", jax.jit(d2_only), xyz0, ctx)

        # 2. d2 + top_k + W
        def d2_topk(xyz, ctx):
            xx = jnp.sum(xyz * xyz, axis=-1)
            xv = jnp.einsum("rsd,rcd->rsc", xyz, ctx["pts"],
                            preferred_element_type=jnp.float32)
            d2 = jnp.maximum(xx[..., None] + ctx["pp"][:, None, :] - 2 * xv,
                             0.0)
            neg_k, _ = jax.lax.top_k(-d2, 8)
            thresh = -neg_k[..., -1:]
            w_raw = (d2 <= thresh) * (1.0 / (jnp.sqrt(d2) + 1e-7))
            W = w_raw / jnp.sum(w_raw, -1, keepdims=True)
            return xyz * 0.9999 + jnp.max(W, -1, keepdims=True) * 1e-6

        timeit_chain(f"S={S}: d2 + top_k + W", jax.jit(d2_topk), xyz0, ctx)

        # 3. full dist parts (adds h)
        def distp(xyz, ctx):
            ds, W = model._ctx_distance_parts(params, ctx, xyz)
            return xyz * 0.9999 + ds * 1e-6

        timeit_chain(f"S={S}: full _ctx_distance_parts", jax.jit(distp),
                     xyz0, ctx)

        # 4. MLP only (ds, W fixed)
        ds0, W0 = jax.jit(model._ctx_distance_parts)(params, ctx, xyz0)

        def mlponly(ds, ctx, W):
            dens, _ = model._ctx_density(params, ctx, ds, W)
            return ds * 0.9999 + dens * 1e-6

        timeit_chain(f"S={S}: fg-einsum + density MLP", jax.jit(mlponly),
                     ds0, ctx, W0)

        # 5. density MLP from fixed fg (no einsum)
        fg0 = jnp.einsum("rsc,rcf->rsf", W0, ctx["geo"])

        def mlpfromfg(ds, fg):
            dens, _ = model._density_from_interp(params, ds, fg)
            return ds * 0.9999 + dens * 1e-6

        timeit_chain(f"S={S}: density MLP only (fg fixed)",
                     jax.jit(mlpfromfg), ds0, fg0)

        # 6. fg einsum only
        def fgonly(W, geo):
            fg = jnp.einsum("rsc,rcf->rsf", W, geo,
                            preferred_element_type=jnp.float32)
            return W * 0.9999 + fg[..., :1] * 1e-6

        timeit_chain(f"S={S}: fg einsum only", jax.jit(fgonly), W0,
                     ctx["geo"])


if __name__ == "__main__":
    main()
