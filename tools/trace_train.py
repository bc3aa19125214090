"""Device-trace one flagship training step and aggregate device time by
source line (VERDICT r3 #5: a trace-backed statement of where train time
goes). Uses the same build as tools/bench_train.py.

    python tools/trace_train.py [subdivisions]
"""
import collections
import glob
import gzip
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

cache_dir = os.path.expanduser("~/.cache/neumesh_tpu_jax")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neumesh_tpu.config import ConfigDict  # noqa: E402
from neumesh_tpu.train.loop import build_train_step  # noqa: E402
from neumesh_tpu.train.optimizers import get_optimizer  # noqa: E402
from tools.bench_train import N_RAYS, build  # noqa: E402

subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 7
import os as _os0
model, params, trainer, teacher_params = build(
    subdiv, student_dtype=_os0.environ.get("TRACE_STUDENT_DTYPE") or None,
    teacher_dtype=_os0.environ.get("TRACE_TEACHER_DTYPE") or None)
cfg = ConfigDict({"training": {
    "lr": 5e-4, "num_iters": 200000,
    "scheduler": {"type": "warmupcosine", "warmup_steps": 1500}}})
opt = get_optimizer(cfg, params)
opt_state = opt.init(params)
render_kwargs_train = dict(
    perturb=True, white_bkgd=False, obj_bounding_radius=1.0,
    N_samples=64, N_importance=64, N_upsample_iters=4,
    bounded_near_far=True)
H = W = 128
import os as _os
train_step = build_train_step(trainer, opt, render_kwargs_train,
                              N_RAYS, H, W,
                              matmul_precision=_os.environ.get(
                                  "TRACE_PRECISION", "high"))
focal = 160.0
intr = jnp.asarray([[[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]]],
                   jnp.float32)
c2w = jnp.asarray([[[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, -1, 2.5],
                    [0, 0, 0, 1]]], jnp.float32)
rng = np.random.default_rng(0)
model_input = {"intrinsics": intr, "c2w": c2w,
               "object_mask": jnp.ones((1, H * W), bool)}
gt = {"rgb": jnp.asarray(rng.random((1, H * W, 3), np.float32))}
bufs = model.mesh_grid.device_buffers()


def step(p, s, k):
    return train_step(p, s, model_input, gt, k, teacher_params,
                      mesh_bufs=bufs)


p, s, total, _ = step(params, opt_state, jax.random.PRNGKey(0))
total.block_until_ready()
t0 = time.perf_counter()
for i in range(10):
    p, s, total, _ = step(p, s, jax.random.PRNGKey(i))
total.block_until_ready()
wall = (time.perf_counter() - t0) / 10
print(f"wall per iter: {wall*1e3:.1f} ms, {1/wall:.1f} it/s")

trace_dir = "/tmp/jaxtrace_train"
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
p, s, total, _ = step(p, s, jax.random.PRNGKey(99))
total.block_until_ready()
jax.profiler.stop_trace()

files = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
ev = []
for f in files:
    with gzip.open(f) as fh:
        data = json.load(fh)
    pid_dev = [pr["pid"] for pr in data.get("traceEvents", [])
               if pr.get("ph") == "M" and pr.get("name") == "process_name"
               and "TPU" in str(pr.get("args", {}).get("name", ""))]
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("pid") in pid_dev:
            ev.append(e)
agg = collections.Counter()
total_us = 0.0
for e in ev:
    name = str(e.get("name", ""))
    if name.startswith("jit_train_step"):
        continue
    src = e.get("args", {}).get("source", name)
    agg[src] += e.get("dur", 0)
    total_us += e.get("dur", 0)
print(f"total device us: {total_us:.0f}")
for src, dur in agg.most_common(24):
    print(f"{dur/1e3:9.2f} ms  {dur/max(total_us,1)*100:5.1f}%  {src}")
