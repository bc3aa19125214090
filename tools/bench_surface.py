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
    ap.add_argument("--n", type=int, default=65536)
    args = ap.parse_args()
    model, params = build(bool(args.pallas), args.sblk)
    o, d = rays(args.n)

    @jax.jit
    def render(params, o, d):
        c, dep, ex = surface_render(
            model, params, o, d, ray_tile=args.tile, scan_mode=args.scan,
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
