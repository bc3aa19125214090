"""Device-trace surface_render; aggregate device time by source line.

Mirrors the bench.py headline configuration (pixel-block ray ordering,
distance scan + fused secant). Usage (all positional, defaults in
brackets):
    python tools/trace_surface.py [tile=128] [steps=24] [n=65536]
        [scan=distance] [subdiv=5] [secant=6] [scan_candidates=0]
        [tile_kp_per_probe=0] [max_candidates=256] [sblk=512]
        [scan_knn_k=0] [tile_cell_budget=0] [secant_frozen_knn=0]
        [secant_tiles_per_program=1]
"""
import glob, gzip, json, os, sys, collections, time
import jax, jax.numpy as jnp
cache_dir = os.path.expanduser('~/.cache/neumesh_tpu_jax')
jax.config.update('jax_compilation_cache_dir', cache_dir)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.bench_sweep import build, rays
from neumesh_tpu.render.ray_casting import surface_render
from neumesh_tpu.ops.rays import block_order_indices

tile = int(sys.argv[1]) if len(sys.argv) > 1 else 128
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 24
n = int(sys.argv[3]) if len(sys.argv) > 3 else 65536
scan = sys.argv[4] if len(sys.argv) > 4 else "distance"
subdiv = int(sys.argv[5]) if len(sys.argv) > 5 else 5
secant = int(sys.argv[6]) if len(sys.argv) > 6 else 6
scan_c = int(sys.argv[7]) if len(sys.argv) > 7 else 0
kp = int(sys.argv[8]) if len(sys.argv) > 8 else 0
max_cand = int(sys.argv[9]) if len(sys.argv) > 9 else 256
sblk = int(sys.argv[10]) if len(sys.argv) > 10 else 512
scan_k = int(sys.argv[11]) if len(sys.argv) > 11 else 0
cb = int(sys.argv[12]) if len(sys.argv) > 12 else 0
frozen = int(sys.argv[13]) if len(sys.argv) > 13 else 0
stpp = int(sys.argv[14]) if len(sys.argv) > 14 else 1

model, params = build(True, sblk, subdivisions=subdiv,
                      scan_candidates=scan_c, tile_kp_per_probe=kp,
                      f32_layers=('d0', 'dh', 'c0', 'ch'),
                      secant_full_precision=False, scan_knn_k=scan_k,
                      tile_cell_budget=cb, secant_frozen_knn=bool(frozen),
                      secant_tiles_per_program=stpp)
o, d = rays(n)
side = int(n ** 0.5)
perm, _ = block_order_indices(side, side, 8, 16)
o, d = o[perm], d[perm]
mg = model.mesh_grid

@jax.jit
def render(params, o, d, bufs):
    with mg.bound_buffers(bufs):
        c, dep, ex = surface_render(
            model, params, o, d, ray_tile=tile, scan_mode=scan,
            tile_max_candidates=max_cand,
            ray_casting_cfgs={"N_steps": steps, "N_secant_steps": secant})
    return c

bufs = mg.device_buffers()
render(params, o, d, bufs).block_until_ready()
t0=time.perf_counter()
for _ in range(5):
    out = render(params, o, d, bufs)
out.block_until_ready()
wall=(time.perf_counter()-t0)/5
print(f"wall: {wall*1000:.1f} ms, {n/wall/1e6:.4f} Mrays/s", flush=True)

trace_dir = "/tmp/jaxtrace_s"
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
render(params, o, d, bufs).block_until_ready()
jax.profiler.stop_trace()

files = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
ev = []
for f in files:
    with gzip.open(f) as fh:
        data = json.load(fh)
    pid_dev = [p["pid"] for p in data.get("traceEvents", []) if p.get("ph")=="M"
               and p.get("name")=="process_name"
               and "TPU" in str(p.get("args",{}).get("name",""))]
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("pid") in pid_dev:
            ev.append(e)
agg = collections.Counter()
total = 0.0
for e in ev:
    src = e.get("args", {}).get("source", e.get("name", "?"))
    if "pallas" in str(src):
        # split pallas_call lines by kernel name (field_fused_<want>,
        # secant, locate all share a few call sites)
        src = f"{src} [{str(e.get('name', ''))[:46]}]"
    agg[src] += e.get("dur", 0)
    total += e.get("dur", 0)
print(f"total device us: {total:.0f}")
for src, dur in agg.most_common(25):
    print(f"{dur/1e3:9.2f} ms  {dur/max(total,1)*100:5.1f}%  {src}")
