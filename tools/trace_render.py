"""Device-trace the fused render and aggregate device time by source line
(axon profiling recipe: parse vm.trace.json.gz directly)."""
import glob, gzip, json, os, sys, collections
import jax, jax.numpy as jnp
cache_dir = os.path.expanduser('~/.cache/neumesh_tpu_jax')
jax.config.update('jax_compilation_cache_dir', cache_dir)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.bench_sweep import build, rays
from neumesh_tpu.render.volume import volume_render_rays
import time

tile = int(sys.argv[1]) if len(sys.argv) > 1 else 8
sblk = int(sys.argv[2]) if len(sys.argv) > 2 else 512
n = int(sys.argv[3]) if len(sys.argv) > 3 else 16384
use_pallas = int(sys.argv[4]) if len(sys.argv) > 4 else 1
subdiv = int(sys.argv[5]) if len(sys.argv) > 5 else 5
kp = int(sys.argv[6]) if len(sys.argv) > 6 else 0
bh = int(sys.argv[7]) if len(sys.argv) > 7 else 0
bw = int(sys.argv[8]) if len(sys.argv) > 8 else 0
topk = int(sys.argv[9]) if len(sys.argv) > 9 else 0
cb = int(sys.argv[10]) if len(sys.argv) > 10 else 0

model, params = build(bool(use_pallas), sblk, subdivisions=subdiv,
                      tile_kp_per_probe=kp, tile_cell_budget=cb)
o, d = rays(n)
if bh:
    from neumesh_tpu.ops.rays import block_order_indices
    side = int(n ** 0.5)
    perm, _ = block_order_indices(side, side, bh, bw)
    o, d = o[perm], d[perm]

@jax.jit
def render(params, o, d):
    return volume_render_rays(model, params, o, d, jax.random.PRNGKey(0),
        detailed_output=False, perturb=False, bounded_near_far=True,
        N_samples=64, N_importance=64, N_upsample_iters=4,
        reuse_upsample_sdf=True, ray_tile=tile,
        color_topk=topk)['rgb']

render(params, o, d).block_until_ready()
t0=time.perf_counter()
for _ in range(5):
    out = render(params, o, d)
out.block_until_ready()
wall=(time.perf_counter()-t0)/5
print(f"wall per iter: {wall*1000:.1f} ms, {n/wall/1e6:.4f} Mrays/s")

trace_dir = "/tmp/jaxtrace"
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
render(params, o, d).block_until_ready()
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
flops_by = collections.Counter()
bytes_by = collections.Counter()
total = 0.0
top = 0.0
for e in ev:
    args = e.get("args", {})
    src = args.get("source", e.get("name", "?"))
    if "pallas" in str(src):
        src = f"{src} [{str(e.get('name', ''))[:46]}]"
    dur = e.get("dur", 0)
    agg[src] += dur
    total += dur
    # the jit_render parent event spans the frame; children carry
    # model_flops/bytes_accessed
    if str(e.get("name", "")).startswith("jit_render"):
        top = max(top, dur)
        continue
    try:
        flops_by[src] += float(args.get("model_flops", 0) or 0)
    except (TypeError, ValueError):
        pass
    try:
        bytes_by[src] += float(args.get("bytes_accessed", 0) or 0)
    except (TypeError, ValueError):
        pass
print(f"total device us: {total:.0f}")
for src, dur in agg.most_common(18):
    print(f"{dur/1e3:9.2f} ms  {dur/max(total,1)*100:5.1f}%  {src}")
gf = sum(flops_by.values())
gb = sum(bytes_by.values())
frame_s = (top or total / 2) / 1e6
print(f"\nframe: {frame_s*1e3:.2f} ms   model_flops: {gf/1e9:.1f} GFLOP "
      f"-> {gf/max(frame_s,1e-9)/1e12:.1f} TFLOP/s   "
      f"bytes: {gb/1e9:.2f} GB -> {gb/max(frame_s,1e-9)/1e9:.0f} GB/s")
print("top flops sources:")
for src, fl in flops_by.most_common(6):
    dur = agg[src]
    print(f"  {fl/1e9:8.1f} GFLOP  {dur/1e3:8.2f} ms  "
          f"{fl/max(dur*1e-6,1e-9)/1e12:6.1f} TFLOP/s  {src}")
print("top bytes sources:")
for src, b in bytes_by.most_common(6):
    dur = agg[src]
    print(f"  {b/1e9:8.2f} GB     {dur/1e3:8.2f} ms  "
          f"{b/max(dur*1e-6,1e-9)/1e9:6.0f} GB/s   {src}")
