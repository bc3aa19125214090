"""Render-throughput benchmark (driver-run; prints ONE JSON line).

Headline metric: Mrays/s surface-rendering the flagship NeuMesh model
(root finding on the mesh-distance proxy + secant refinement on the true
density + one color query per ray; `render.py --render_mode surface`),
65536 coherent camera rays, bf16 serving mode, fused Pallas field kernel
with tile-shared candidate caches. Accuracy gate:
tests/test_surface_render.py::test_fast_config_depth_accuracy pins this
configuration to sub-millimeter surface localisation.

The same line also reports the full NeuS-style volume path (64 coarse +
4x16 upsample samples/ray + midpoint color pass — reference
models/renderer.py:124-131) as `volume_mrays`: the volume path is
FLOP-bound at ~200 MFLOPs/ray, so its ceiling on one v5e chip is ~1
Mrays/s at 100% MXU; surface mode reaches production throughput by doing
~40 evals/ray instead of ~255 (BASELINE.md north star: 20 Mrays/s on
v5e-8).
"""
from __future__ import annotations

import json
import time


def main():
    import os

    import jax
    # persistent compile cache: repeated bench runs (and the driver's) skip
    # the multi-minute XLA compile of the full render programs
    cache_dir = os.path.join(os.path.expanduser("~"), ".cache",
                             "neumesh_tpu_jax")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tools.bench_sweep import build, rays

    from neumesh_tpu.render.ray_casting import surface_render
    from neumesh_tpu.render.volume import volume_render_rays

    model, params = build(use_pallas=True, sblk=512)

    # ---- headline: surface mode, 65536 coherent rays grouped into
    # 8x16 pixel blocks (the tile-shared candidate caches need compact
    # ray bundles; quality-gated on the trained synthetic scene at
    # +0.2 dB vs the bf16 volume path, tools/quality_gate.py)
    n_surf = 65536
    o_s, d_s = rays(n_surf)
    from neumesh_tpu.ops.rays import block_order_indices
    side = int(n_surf ** 0.5)
    perm, _ = block_order_indices(side, side, 8, 16)
    o_s, d_s = o_s[perm], d_s[perm]

    @jax.jit
    def render_surface(params, o, d):
        c, dep, _ = surface_render(
            model, params, o, d, ray_tile=128, scan_mode="distance",
            tile_max_candidates=256,
            ray_casting_cfgs={"N_steps": 24, "N_secant_steps": 6})
        return c

    render_surface(params, o_s, d_s).block_until_ready()
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = render_surface(params, o_s, d_s)
    out.block_until_ready()
    surf_mrays = n_surf * iters / (time.perf_counter() - t0) / 1e6

    # ---- secondary: full volume path, 16384 rays, tiled contexts
    n_vol = 16384
    o_v, d_v = rays(n_vol)

    @jax.jit
    def render_volume(params, o, d):
        ret = volume_render_rays(
            model, params, o, d, jax.random.PRNGKey(0),
            detailed_output=False, perturb=False, bounded_near_far=True,
            N_samples=64, N_importance=64, N_upsample_iters=4,
            reuse_upsample_sdf=True, ray_tile=16)
        return ret["rgb"]

    render_volume(params, o_v, d_v).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = render_volume(params, o_v, d_v)
    out.block_until_ready()
    vol_mrays = n_vol * iters / (time.perf_counter() - t0) / 1e6

    print(json.dumps({
        "metric": "surface_render_throughput",
        "value": round(surf_mrays, 4),
        "unit": "Mrays/s",
        "vs_baseline": round(surf_mrays / 20.0, 4),
        "volume_mrays": round(vol_mrays, 4),
    }))


if __name__ == "__main__":
    main()
