"""End-to-end product pipeline on a synthetic scene (SURVEY §4 strategy):
train a tiny NeuS teacher -> extract the prior mesh -> distill a NeuMesh
student with teacher supervision -> render. Exercises the real train loop
(main_function), checkpointing, the builders, and both model families.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from neumesh_tpu.config import ConfigDict
from neumesh_tpu.dataio.synthetic import generate_sphere_scene


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    generate_sphere_scene(str(d / "scene"), n_views=6, H=36, W=36)
    return d


def neus_config(workdir):
    return ConfigDict({
        "expname": "neus_sphere",
        "device_ids": [0],
        "data": {
            "type": "DTU", "data_dir": str(workdir / "scene"),
            "downscale": 1, "N_rays": 72, "batch_size": 1,
            "val_downscale": 4.0, "val_rayschunk": 256,
            "obj_bounding_radius": 1.0,
        },
        "model": {
            "framework": "NeuS", "obj_bounding_radius": 1.0,
            "W_geometry_feature": 64,
            "variance_init": 0.05,
            "surface": {"D": 3, "W": 64, "skips": [], "embed_multires": 4,
                        "radius_init": 0.6},
            "radiance": {"D": 2, "W": 64, "embed_multires": -1,
                         "embed_multires_view": 2},
            "N_upsample_iters": 2, "N_samples": 24,
        },
        "training": {
            "speed_factor": 10.0, "lr": 5e-3, "num_iters": 120,
            "scheduler": {"type": "warmupcosine", "warmup_steps": 20},
            "loss_weights": {"img": 1.0, "mask": 0.5, "eikonal": 0.1},
            "log_root_dir": str(workdir / "logs"),
            "i_val": -1, "i_backup": -1, "i_save": 10000, "i_log": 50,
            "monitoring": "none", "use_device_mesh": False,
        },
    })


@pytest.fixture(scope="module")
def trained_neus(workdir):
    from neumesh_tpu.train.loop import main_function

    args = neus_config(workdir)
    # render kwargs flow through builder; shrink sampling for CPU speed
    params = main_function(args)
    return args, params


def test_neus_training_produces_checkpoint_and_converges(trained_neus,
                                                         workdir):
    args, params = trained_neus
    ckpt = workdir / "logs" / "neus_sphere" / "ckpts" / "latest.ckpt"
    assert ckpt.exists()
    # render one low-res view and compare to GT
    import jax
    import jax.numpy as jnp
    from neumesh_tpu.dataio import get_data
    from neumesh_tpu.models import build_framework
    from neumesh_tpu.ops.rays import get_rays

    model, _, trainer, rkt, rkw_test, renderer = build_framework(
        args, "NeuS")
    ds = get_data(args, downscale=2.0)
    _, sample, gt = ds[0]
    ro, rd, _ = get_rays(jnp.asarray(sample["c2w"]),
                         jnp.asarray(sample["intrinsics"]), ds.H, ds.W)
    rgb, depth, _ = renderer(
        params, ro, rd, key=jax.random.PRNGKey(0),
        detailed_output=False, perturb=False,
        N_samples=24, N_importance=24, N_upsample_iters=2,
        rayschunk=512)
    mse = float(np.mean((np.asarray(rgb) - gt["rgb"]) ** 2))
    psnr = -10 * np.log10(mse)
    assert psnr > 18, f"NeuS did not converge: psnr={psnr:.2f}"


@pytest.fixture(scope="module")
def prior_mesh(trained_neus, workdir):
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from extract_mesh import extract_mesh
    from neumesh_tpu.models import build_framework

    args, params = trained_neus
    model, *_ = build_framework(args, "NeuS")
    mesh = extract_mesh(
        model, params, N_grid=56, x_range=(-0.8, 0.8), y_range=(-0.8, 0.8),
        z_range=(-0.8, 0.8), sdf_th=0.0, chunk=16384, scale_factor=1.0,
        output_dir=str(workdir / "mesh"), obj_id="0")
    return mesh


def test_extracted_mesh_is_spherelike(prior_mesh):
    radii = np.linalg.norm(prior_mesh.vertices, axis=-1)
    assert prior_mesh.n_vertices > 300
    assert abs(np.median(radii) - 0.5) < 0.1, np.median(radii)
    assert radii.std() < 0.08
    assert prior_mesh.vertex_colors is not None


def test_neumesh_distillation_and_render(trained_neus, prior_mesh, workdir):
    from neumesh_tpu.train.loop import main_function

    neus_args, _ = trained_neus
    args = ConfigDict({
        "expname": "neumesh_sphere",
        "device_ids": [0],
        "data": dict(neus_args.data.to_dict()),
        "model": {
            "framework": "NeuMesh",
            "prior_mesh": str(workdir / "mesh" / "extracted_0.ply"),
            "distance_method": "grid",
            "D_density": 2, "D_color": 2, "W": 64,
            "geometry_dim": 8, "color_dim": 8,
            "multires_d": 4, "multires_fg": 1, "multires_ft": 1,
            "multires_view": 2,
            "bounded_near_far": True, "enable_nablas_input": True,
            "learn_indicator_weight": True,
            "N_upsample_iters": 2,
        },
        "training": {
            "speed_factor": 10.0, "lr": 5e-3, "num_iters": 64,
            "scheduler": {"type": "warmupcosine", "warmup_steps": 10},
            "loss_weights": {"img": 1.0, "mask": 0.1, "eikonal": 0.1,
                             "distill_density": 1.0, "distill_color": 1.0,
                             "indicator_reg": 0.001},
            "teacher_config": str(workdir / "logs" / "neus_sphere"
                                  / "config.yaml"),
            "teacher_ckpt": str(workdir / "logs" / "neus_sphere" / "ckpts"
                                / "latest.ckpt"),
            "log_root_dir": str(workdir / "logs"),
            "i_val": -1, "i_backup": -1, "i_save": 10000, "i_log": 20,
            "monitoring": "none", "use_device_mesh": False,
        },
    })
    args.model["N_samples"] = 16
    params = main_function(args)

    # student must load teacher's ln_s and render finite images
    import jax
    import jax.numpy as jnp
    from neumesh_tpu.dataio import get_data
    from neumesh_tpu.models import build_framework
    from neumesh_tpu.ops.rays import get_rays

    model, _, trainer, _, _, renderer = build_framework(args, "NeuMesh")
    ds = get_data(args, downscale=2.0)
    _, sample, gt = ds[1]
    ro, rd, _ = get_rays(jnp.asarray(sample["c2w"]),
                         jnp.asarray(sample["intrinsics"]), ds.H, ds.W)
    rgb, depth, extras = renderer(
        params, ro, rd, key=jax.random.PRNGKey(0), detailed_output=False,
        perturb=False, N_samples=16, N_importance=16, N_upsample_iters=2,
        bounded_near_far=True, rayschunk=512)
    rgb = np.asarray(rgb)
    assert np.isfinite(rgb).all()
    mse = float(np.mean((rgb - gt["rgb"]) ** 2))
    psnr = -10 * np.log10(mse)
    # distilled student on a tiny budget: just demand better than trivial
    assert psnr > 12, f"NeuMesh distillation failed: psnr={psnr:.2f}"
    # mask should concentrate on the object. The background bound is loose:
    # at a tiny training budget the outcome is chaotically sensitive to
    # f32 summation order (e.g. split first-layer matmuls; the ADVICE-r2
    # switch from double-angle to exact sin/cos embeddings moved 40-iter
    # background mass from ~0.32 to 0.48 with object PSNR unchanged), so
    # the budget is 64 iters — enough for the mask term to settle across
    # numerically-equivalent implementations (full-scale training reaches
    # ~35 dB regardless).
    acc = np.asarray(extras["mask_volume"])
    gt_mask = np.asarray(sample["object_mask"])
    assert acc[gt_mask].mean() > 0.5
    assert acc[~gt_mask].mean() < 0.4
