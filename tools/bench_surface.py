"""Surface-mode throughput sweep."""
import os, sys, time, json
import jax, jax.numpy as jnp, numpy as np
cache_dir = os.path.expanduser('~/.cache/neumesh_tpu_jax')
jax.config.update('jax_compilation_cache_dir', cache_dir)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.bench_sweep import build, rays
from neumesh_tpu.render.ray_casting import surface_render

if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--pallas", type=int, default=1)
    ap.add_argument("--tile", type=int, default=64)
    ap.add_argument("--sblk", type=int, default=512)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--scan", default="distance")
    ap.add_argument("--secant", type=int, default=8)
    ap.add_argument("--cmax", type=int, default=0)
    ap.add_argument("--n", type=int, default=65536)
    args = ap.parse_args()
    model, params = build(bool(args.pallas), args.sblk)
    o, d = rays(args.n)
    # group rays into compact pixel blocks: 1-D scanline tiles span a
    # whole image row, whose candidate union overflows the shared cache
    side = int(np.sqrt(args.n))
    if args.tile > 1:
        from neumesh_tpu.ops.rays import block_order_indices
        bh = max(1, int(np.sqrt(args.tile // 2)))
        bw = args.tile // bh
        while side % bh or side % bw:
            bh //= 2
            bw = args.tile // bh
        perm, _ = block_order_indices(side, side, bh, bw)
        o, d = o[perm], d[perm]

    @jax.jit
    def render(params, o, d):
        c, dep, ex = surface_render(
            model, params, o, d, ray_tile=args.tile, scan_mode=args.scan,
            tile_max_candidates=args.cmax or None,
            ray_casting_cfgs={"N_steps": args.steps,
                              "N_secant_steps": args.secant})
        return c, dep

    c, dep = render(params, o, d)
    c.block_until_ready()
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        c, dep = render(params, o, d)
    c.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "mode": "surface", "scan": args.scan, "tile": args.tile,
        "steps": args.steps, "n_rays": args.n,
        "mrays": round(args.n / dt / 1e6, 4)}), flush=True)
