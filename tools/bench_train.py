"""Training-step throughput at the reference schedule shape (VERDICT r3 #5).

Flagship NeuMesh distillation step — 512 rays/iter, 64 coarse + 4x16
upsample samples, mesh-bounded near/far, eikonal + full teacher
distillation + indicator regulariser, Adam + warmup-cosine — exactly the
shape of the reference's 200k-iteration schedule
(/root/reference/configs/neumesh_dtu_scan63.yaml:43, train.py:379),
through the SAME build_train_step the real train loop jits.

    python tools/bench_train.py [--subdivisions 7] [--iters 30]

Prints one JSON line {train_iters_per_s, ms_per_iter, train_mrays_per_s,
n_vertices}.
"""
import argparse
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
from neumesh_tpu.dataio.synthetic import icosphere_mesh  # noqa: E402
from neumesh_tpu.mesh import MeshGrid  # noqa: E402
from neumesh_tpu.models.neumesh.model import NeuMesh  # noqa: E402
from neumesh_tpu.models.neus.model import NeuS  # noqa: E402
from neumesh_tpu.train.loop import build_train_step  # noqa: E402
from neumesh_tpu.train.optimizers import get_optimizer  # noqa: E402
from neumesh_tpu.train.trainer import Trainer  # noqa: E402

N_RAYS = 512
SAMPLES_PER_RAY = 128  # 64 coarse + 4x16 upsample (final eval count)


def build(subdivisions: int, student_dtype=None, teacher_dtype=None):
    mesh = icosphere_mesh(radius=0.5, subdivisions=subdivisions)
    mg = MeshGrid(mesh, distance_method="grid")
    extra = {}
    if student_dtype:
        # mixed-precision student: bf16 activations with the serving
        # mode's selective-f32 first/head layers (gate-validated forward)
        extra = dict(compute_dtype=student_dtype,
                     f32_layers=("d0", "dh", "c0", "ch"))
    model = NeuMesh(
        mg, D_density=3, D_color=4, W=256, geometry_dim=32, color_dim=32,
        multires_view=4, multires_d=8, multires_fg=2, multires_ft=2,
        enable_nablas_input=True, learn_indicator_weight=True,
        speed_factor=10.0, **extra)
    params = model.init(jax.random.PRNGKey(0))

    # W=256 teacher at the reference NeuS shape (D=8, skips=[4],
    # /root/reference/models/frameworks/neus/__init__.py:34-58)
    teacher = NeuS(
        variance_init=0.05, speed_factor=10.0,
        surface_cfg=dict(D=8, W=256, skips=[4], embed_multires=6,
                         radius_init=0.5),
        radiance_cfg=dict(D=4, W=256, embed_multires=-1,
                          embed_multires_view=4))
    teacher_params = teacher.init(jax.random.PRNGKey(1))

    trainer = Trainer(model, loss_weights={
        "img": 1.0, "mask": 0.1, "eikonal": 0.1, "distill_density": 1.0,
        "distill_color": 1.0, "indicator_reg": 0.001},
        teacher_model=teacher, teacher_dtype=teacher_dtype)
    return model, params, trainer, teacher_params


def measure(subdivisions: int = 7, iters: int = 30,
            matmul_precision: str = "default", student_dtype=None,
            teacher_dtype=None) -> dict:
    model, params, trainer, teacher_params = build(
        subdivisions, student_dtype=student_dtype,
        teacher_dtype=teacher_dtype)

    cfg = ConfigDict({"training": {
        "lr": 5e-4, "num_iters": 200000,
        "scheduler": {"type": "warmupcosine", "warmup_steps": 1500},
    }})
    opt = get_optimizer(cfg, params)
    opt_state = opt.init(params)

    render_kwargs_train = dict(
        perturb=True, white_bkgd=False, obj_bounding_radius=1.0,
        N_samples=64, N_importance=64, N_upsample_iters=4,
        bounded_near_far=True)
    H = W = 128
    train_step = build_train_step(trainer, opt, render_kwargs_train,
                                  N_RAYS, H, W,
                                  matmul_precision=matmul_precision)

    # one synthetic camera batch (batch_size=1, the reference default)
    focal = 160.0
    intr = jnp.asarray([[[focal, 0, W / 2], [0, focal, H / 2],
                         [0, 0, 1]]], jnp.float32)
    c2w = jnp.asarray([[[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, -1, 2.5],
                        [0, 0, 0, 1]]], jnp.float32)
    rng = np.random.default_rng(0)
    model_input = {"intrinsics": intr, "c2w": c2w,
                   "object_mask": jnp.ones((1, H * W), bool)}
    gt = {"rgb": jnp.asarray(rng.random((1, H * W, 3), np.float32))}
    bufs = model.mesh_grid.device_buffers()

    def run(n, params, opt_state):
        key = jax.random.PRNGKey(42)
        for i in range(n):
            key, k = jax.random.split(key)
            params, opt_state, total, _ = train_step(
                params, opt_state, model_input, gt, k, teacher_params,
                mesh_bufs=bufs)
        return params, opt_state, total

    # warmup/compile
    p, s, total = run(2, params, opt_state)
    total.block_until_ready()
    t0 = time.perf_counter()
    p, s, total = run(iters, p, s)
    total.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    return {
        "train_iters_per_s": round(1.0 / dt, 2),
        "ms_per_iter": round(dt * 1e3, 2),
        "train_mrays_per_s": round(N_RAYS / dt / 1e6, 4),
        "train_msamples_per_s": round(N_RAYS * SAMPLES_PER_RAY / dt / 1e6,
                                      2),
        "n_vertices": model.num_vertices,
        "loss": float(total),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdivisions", type=int, default=7)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--precision", default="default",
                    help="f32 matmul precision of the traced loss "
                         "(nn.f32_matmul_precision)")
    ap.add_argument("--student-dtype", default=None,
                    help="mixed-precision student (e.g. bfloat16): "
                         "compute_dtype + serving f32_layers")
    ap.add_argument("--teacher-dtype", default=None,
                    help="no-grad distill teacher compute dtype "
                         "(e.g. bfloat16)")
    args = ap.parse_args()
    print(json.dumps(measure(args.subdivisions, args.iters,
                             args.precision, args.student_dtype,
                             args.teacher_dtype)))


if __name__ == "__main__":
    main()
