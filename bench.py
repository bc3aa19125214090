"""Render-throughput benchmark (driver-run; prints ONE JSON line).

Metric: Mrays/s volume-rendering the flagship NeuMesh model (full reference
workload shape: 64 coarse + 4x16 upsample samples/ray, 256 bounded-near-far
probes/ray, midpoint color pass — reference models/renderer.py:124-131,
BASELINE.md). North star: 20 Mrays/s (BASELINE.json), so
vs_baseline = mrays / 20.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import os

    import jax
    # persistent compile cache: repeated bench runs (and the driver's) skip
    # the multi-minute XLA compile of the full render program
    cache_dir = os.path.join(os.path.expanduser("~"), ".cache",
                             "neumesh_tpu_jax")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
    import jax.numpy as jnp
    from neumesh_tpu.dataio.synthetic import icosphere_mesh
    from neumesh_tpu.mesh import MeshGrid
    from neumesh_tpu.models.neumesh.model import NeuMesh
    from neumesh_tpu.render.volume import volume_render_rays

    # flagship-config NeuMesh on a realistic-density scaffold, in the
    # bf16 serving mode (MLP/feature chain bf16, geometry/kNN f32 —
    # measured at parity: -0.04 dB eval PSNR vs f32, see README)
    mesh = icosphere_mesh(radius=0.5, subdivisions=5)  # 10k verts, uniform
    mesh_grid = MeshGrid(mesh, distance_method="grid")
    model = NeuMesh(
        mesh_grid, D_density=3, D_color=4, W=256, geometry_dim=32,
        color_dim=32, multires_view=4, multires_d=8, multires_fg=2,
        multires_ft=2, enable_nablas_input=True,
        learn_indicator_weight=True, speed_factor=10.0,
        compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))

    n_rays = 4096

    @jax.jit
    def render(params, rays_o, rays_d):
        ret = volume_render_rays(
            model, params, rays_o, rays_d, jax.random.PRNGKey(0),
            detailed_output=False, perturb=False, bounded_near_far=True,
            N_samples=64, N_importance=64, N_upsample_iters=4,
            reuse_upsample_sdf=True)
        return ret["rgb"]

    key = jax.random.PRNGKey(1)
    rays_o = jnp.tile(jnp.array([[0.0, 0.0, -2.5]], jnp.float32),
                      (n_rays, 1))
    ang = jax.random.uniform(key, (n_rays, 2), minval=-0.2, maxval=0.2)
    rays_d = jnp.concatenate([ang, jnp.ones((n_rays, 1))], -1)

    # warmup / compile
    render(params, rays_o, rays_d).block_until_ready()

    # block once after the loop: per-iteration blocking would add a host
    # sync round-trip per render (tens of ms on tunneled TPU setups) that
    # is not part of device throughput
    iters = 10
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = render(params, rays_o, rays_d)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    mrays = n_rays * iters / dt / 1e6
    print(json.dumps({
        "metric": "render_throughput",
        "value": round(mrays, 4),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 20.0, 4),
    }))


if __name__ == "__main__":
    main()
