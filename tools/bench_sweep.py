"""Batch-size / path sweep of the volume-render throughput (VERDICT #6)."""
import os, sys, time, json
import jax, jax.numpy as jnp
cache_dir = os.path.expanduser('~/.cache/neumesh_tpu_jax')
jax.config.update('jax_compilation_cache_dir', cache_dir)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from neumesh_tpu.dataio.synthetic import icosphere_mesh
from neumesh_tpu.mesh import MeshGrid
from neumesh_tpu.models.neumesh.model import NeuMesh
from neumesh_tpu.render.volume import volume_render_rays

def build(use_pallas, sblk=256, subdivisions=5, **model_kw):
    """subdivisions=5 -> 10,242 vertices (round-2 config);
    subdivisions=7 -> 163,842 vertices (production scale, VERDICT r2 #3).
    model_kw: extra NeuMesh knobs (scan_candidates, tile_kp_per_probe,
    f32_layers, ...)."""
    mesh = icosphere_mesh(radius=0.5, subdivisions=subdivisions)
    mg = MeshGrid(mesh, distance_method='grid')
    model = NeuMesh(
        mg, D_density=3, D_color=4, W=256, geometry_dim=32,
        color_dim=32, multires_view=4, multires_d=8, multires_fg=2,
        multires_ft=2, enable_nablas_input=True,
        learn_indicator_weight=True, speed_factor=10.0,
        compute_dtype=jnp.bfloat16, use_pallas=use_pallas,
        pallas_sample_block=sblk, **model_kw)
    params = model.init(jax.random.PRNGKey(0))
    return model, params

def rays(n):
    """Coherent camera-grid rays (scanline order), the workload tiled ray
    contexts serve in practice; sqrt(n) x sqrt(n) image of the sphere."""
    import numpy as _np
    side = int(_np.sqrt(n))
    assert side * side == n, "n must be a square for the image grid"
    ang = _np.linspace(-0.2, 0.2, side, dtype=_np.float32)
    ay, ax = _np.meshgrid(ang, ang, indexing="ij")
    rays_o = jnp.tile(jnp.array([[0.0, 0.0, -2.5]], jnp.float32), (n, 1))
    rays_d = jnp.asarray(
        _np.stack([ax.ravel(), ay.ravel(), _np.ones(n, _np.float32)], -1))
    return rays_o, rays_d

def bench(model, params, n, iters=10, tile=0, blocks=None, **render_kw):
    mg = model.mesh_grid

    @jax.jit
    def render(params, o, d, mesh_bufs):
        with mg.bound_buffers(mesh_bufs):
            return volume_render_rays(
                model, params, o, d, jax.random.PRNGKey(0),
                detailed_output=False, perturb=False,
                bounded_near_far=True, N_samples=64, N_importance=64,
                N_upsample_iters=4, reuse_upsample_sdf=True,
                ray_tile=tile, **render_kw)['rgb']
    o, d = rays(n)
    if blocks is not None:
        from neumesh_tpu.ops.rays import block_order_indices
        side = int(n ** 0.5)
        perm, _ = block_order_indices(side, side, *blocks)
        o, d = o[perm], d[perm]
    bufs = mg.device_buffers()
    render(params, o, d, bufs).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = render(params, o, d, bufs)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    return n * iters / dt / 1e6

if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--pallas", type=int, default=1)
    ap.add_argument("--tile", type=int, default=0)
    ap.add_argument("--sizes", default="4096,16384,65536")
    ap.add_argument("--sblk", type=int, default=256)
    args = ap.parse_args()
    model, params = build(bool(args.pallas), args.sblk)
    for n in [int(x) for x in args.sizes.split(",")]:
        mr = bench(model, params, n, tile=args.tile)
        print(json.dumps({"path": "pallas" if args.pallas else "xla",
                          "tile": args.tile, "sblk": args.sblk,
                          "n_rays": n,
                          "mrays": round(mr, 4)}), flush=True)
