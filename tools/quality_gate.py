"""End-to-end quality gate on the synthetic scene (TPU, ~10-15 min).

Trains the full product pipeline — NeuS teacher -> extracted mesh ->
NeuMesh distillation — through the real train loop, then scores held-out
views four ways:

  volume_f32     volume render, f32 XLA path          (the parity mode)
  volume_bf16    volume render, bf16 fused Pallas path (the serving mode)
  surface_f32    surface mode, f32 precision at the SAME structural
                 config as serving (steps/secant/kp) — the precision
                 parity anchor
  surface_fast   surface mode, throughput configuration (bench.py's
                 distance-proxy scan + density secant, tile=128)

and prints one JSON line with PSNRs and the deltas the serving modes are
gated on (volume bf16 within 0.1 dB of f32; surface_fast within 0.1 dB
of surface_f32 — precision only, anchor shares the structure — and
within 1 dB of volume on GT, the structural bound: surface rendering is
a different integral, so parity with GT, not with the volume image, is
the meaningful comparison).

    python tools/quality_gate.py [--iters 3000] [--workdir /tmp/qgate]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def neus_config(workdir, iters):
    from neumesh_tpu.config import ConfigDict

    return ConfigDict({
        "expname": "qgate_neus",
        "device_ids": [0],
        "data": {
            "type": "DTU", "data_dir": os.path.join(workdir, "scene"),
            "downscale": 1, "N_rays": 512, "batch_size": 1,
            "val_downscale": 4.0, "val_rayschunk": 1024,
            "obj_bounding_radius": 1.0,
        },
        "model": {
            "framework": "NeuS", "obj_bounding_radius": 1.0,
            "W_geometry_feature": 256,
            "variance_init": 0.05,
            "surface": {"D": 4, "W": 128, "skips": [], "embed_multires": 6,
                        "radius_init": 0.6},
            "radiance": {"D": 2, "W": 128, "embed_multires": -1,
                         "embed_multires_view": 4},
            "N_upsample_iters": 4, "N_samples": 64, "N_importance": 64,
        },
        "training": {
            "speed_factor": 10.0, "lr": 5e-4, "num_iters": iters,
            "scheduler": {"type": "warmupcosine", "warmup_steps": 200},
            "loss_weights": {"img": 1.0, "mask": 0.5, "eikonal": 0.1},
            "log_root_dir": os.path.join(workdir, "logs"),
            "i_val": -1, "i_backup": -1, "i_save": 10000, "i_log": 500,
            "monitoring": "none", "use_device_mesh": False,
        },
    })


def neumesh_config(workdir, iters, mesh_path, neus_dir):
    from neumesh_tpu.config import ConfigDict

    return ConfigDict({
        "expname": "qgate_neumesh",
        "device_ids": [0],
        "data": {
            "type": "DTU", "data_dir": os.path.join(workdir, "scene"),
            "downscale": 1, "N_rays": 512, "batch_size": 1,
            "val_downscale": 4.0, "val_rayschunk": 1024,
            "obj_bounding_radius": 1.0,
        },
        "model": {
            "framework": "NeuMesh", "prior_mesh": mesh_path,
            "distance_method": "grid",
            "D_density": 3, "D_color": 4, "W": 256,
            "geometry_dim": 32, "color_dim": 32,
            "multires_d": 8, "multires_fg": 2, "multires_ft": 2,
            "multires_view": 4,
            "bounded_near_far": True, "enable_nablas_input": True,
            "learn_indicator_weight": True,
            "N_upsample_iters": 4, "N_samples": 64, "N_importance": 64,
        },
        "training": {
            "speed_factor": 10.0, "lr": 5e-4, "num_iters": iters,
            "scheduler": {"type": "warmupcosine", "warmup_steps": 200},
            "loss_weights": {"img": 1.0, "mask": 0.1, "eikonal": 0.1,
                             "distill_density": 1.0, "distill_color": 1.0,
                             "indicator_reg": 0.001},
            "teacher_config": os.path.join(neus_dir, "config.yaml"),
            "teacher_ckpt": os.path.join(neus_dir, "ckpts", "latest.ckpt"),
            "log_root_dir": os.path.join(workdir, "logs"),
            "i_val": -1, "i_backup": -1, "i_save": 10000, "i_log": 500,
            "monitoring": "none", "use_device_mesh": False,
        },
    })


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--workdir", default=None,
                    help="default /tmp/qgate (sphere) / "
                         "/tmp/qgate_<scene> otherwise")
    ap.add_argument("--scene", default="sphere",
                    choices=["sphere", "torus"],
                    help="gate scene: 'sphere' (convex, single-crossing) "
                         "or 'torus' (torus + offset sphere: "
                         "multi-crossing, self-occluding — VERDICT r4 #1; "
                         "every serving gate must pass on BOTH)")
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse checkpoints already in workdir")
    ap.add_argument("--modes",
                    default="volume_f32,volume_bf16,surface_f32,"
                            "surface_fast",
                    help="which configurations to (re-)render; omitted "
                         "ones carry their scores forward from the "
                         "workdir's existing quality_gate.json (fast "
                         "knob-sweep iteration — a FULL default run is "
                         "still required for the committed artifact)")
    ap.add_argument("--secant-full-precision", action="store_true",
                    help="keep the f32_layers overrides inside the "
                         "secant refinement (serving default drops "
                         "them: roots tolerate bf16)")
    ap.add_argument("--f32-layers", default="d0,dh,c0,ch",
                    help="comma-separated selective-f32 layer tags for "
                         "the benchmarked serving config (see "
                         "NeuMesh.f32_layers; empty = plain bf16)")
    ap.add_argument("--surface-steps", type=int, default=16,
                    help="N_steps of the distance-proxy scan in the "
                         "surface configs (serving AND its f32 parity "
                         "anchor share the structural config; the gated "
                         "delta isolates precision)")
    ap.add_argument("--surface-secant", type=int, default=3,
                    help="N_secant_steps of the surface configs "
                         "(bench.py serving default)")
    ap.add_argument("--serving-kp", type=int, default=8,
                    help="tile_kp_per_probe of the surface models")
    ap.add_argument("--scan-knn-k", type=int, default=1,
                    help="reduced-k kNN for the scan distance proxy "
                         "(NeuMesh.scan_knn_k; 0 = full k=8; 1 is the "
                         "bench.py serving default). Applied to serving "
                         "AND the f32 anchor (structural knob)")
    ap.add_argument("--secant-frozen-knn", action="store_true",
                    help="freeze the secant's per-ray top-k selection "
                         "at the bracket midpoint "
                         "(NeuMesh.secant_frozen_knn; opt-in — gated "
                         "-0.045 dB but a throughput wash at 3 secant "
                         "iters). Applied to the SERVING config only — "
                         "the f32 anchor keeps per-eval re-selection, "
                         "so the gated delta includes the approximation")
    ap.add_argument("--no-secant-rebracket", action="store_true",
                    help="skip the density re-bracket of the proxy scan "
                         "(NeuMesh.secant_rebracket=False); the secant "
                         "starts from the proxy bracket")
    ap.add_argument("--surface-shade-composite", type=int, default=0,
                    help="micro-composite shading of the surface configs: "
                         "N root-anchored sample depths alpha-composited "
                         "instead of one color query at the root (0 = "
                         "point shade). Point shading loses ~2 dB vs the "
                         "integrated color on the multi-crossing torus "
                         "scene; applied to serving AND the f32 anchor "
                         "(structural knob)")
    ap.add_argument("--surface-shade-topk", type=int, default=0,
                    help="color_topk of the surface micro-composite "
                         "(0 = color at every midpoint)")
    ap.add_argument("--surface-shade-win-frac", type=float, default=0.5,
                    help="win_frac of the surface micro-composite depths")
    ap.add_argument("--surface-tile", type=int, default=128,
                    help="rays per shared tile context of the surface "
                         "configs (bench.py serving default)")
    ap.add_argument("--surface-blocks", type=int, nargs=2,
                    default=(8, 16),
                    help="pixel-block shape feeding the tiles")
    ap.add_argument("--tile-cell-budget", type=int, default=64,
                    help="cell-level pre-rank budget of the tile context "
                         "build (NeuMesh.tile_cell_budget; 0 = off). "
                         "Applied to serving AND the f32 anchor. 64 (not "
                         "32): on the multi-crossing torus scene a "
                         "128-ray tile's 8x16 pixel block needs more "
                         "pre-ranked cells — 32 costs the volume serving "
                         "path 1.4 dB there (round-5 probe) for <2% "
                         "throughput")
    ap.add_argument("--scan-candidates", type=int, default=0,
                    help="nearest-prefix candidate budget for scan + "
                         "secant (NeuMesh.scan_candidates; 0 = full). "
                         "Applied to serving AND the f32 anchor")
    ap.add_argument("--volume-root-anchored", type=int, default=1,
                    help="root-anchored volume serving (1 = on, the "
                         "bench.py VOL default — ADVICE r4: the gate "
                         "default must score the structure bench.py "
                         "times; 0 = hierarchical): locate the first "
                         "density crossing (proxy scan + fused secant) "
                         "and place --volume-n-fine concentrated samples "
                         "instead of the 64+4x16 hierarchical structure. "
                         "Applied to volume_bf16 ONLY — volume_f32 keeps "
                         "the reference structure, so the gated delta "
                         "includes the structural approximation")
    ap.add_argument("--volume-n-fine", type=int, default=8,
                    help="samples per ray of the root-anchored volume "
                         "serving path")
    ap.add_argument("--volume-root-steps", type=int, default=16,
                    help="proxy-scan steps of the root-anchored path")
    ap.add_argument("--volume-root-secant", type=int, default=3,
                    help="secant iterations of the root-anchored path")
    ap.add_argument("--volume-win-frac", type=float, default=0.25,
                    help="fraction of root-anchored samples in the dense "
                         "window around the root")
    ap.add_argument("--volume-topk", type=int, default=4,
                    help="color_topk of the volume serving config")
    ap.add_argument("--volume-tile", type=int, default=128,
                    help="rays per shared tile context of the volume "
                         "serving config (bench.py VOL ray_tile)")
    ap.add_argument("--volume-max-candidates", type=int, default=128,
                    help="ranked tile-context candidate cap of the volume "
                         "serving config (0 = uncapped; bench.py VOL "
                         "tile_max_candidates)")
    ap.add_argument("--eval-candidates", type=int, default=0,
                    help="nearest-prefix candidate budget of the fused "
                         "density/color sample evals "
                         "(NeuMesh.eval_candidates; 0 = full set). "
                         "Applied to the volume serving config only")
    ap.add_argument("--secant-tiles-per-program", type=int, default=4,
                    help="tiles batched per fused-secant program "
                         "(NeuMesh.secant_tiles_per_program; row-exact — "
                         "grouped == ungrouped — carried so the gate "
                         "config IS the bench config)")
    ap.add_argument("--train-matmul-precision", default=None,
                    help="override training.matmul_precision of the gate "
                         "trainings (default: the train loop's own "
                         "default; see build_train_step); for "
                         "precision-vs-quality experiments in a fresh "
                         "--workdir")
    ap.add_argument("--train-student-dtype", default=None,
                    help="train the NeuMesh distillation with this "
                         "student compute dtype (bfloat16 = mixed "
                         "precision: bf16 activations, selective-f32 "
                         "first/head layers matching the serving config; "
                         "params stay f32). Eval configs are unaffected")
    ap.add_argument("--train-teacher-dtype", default=None,
                    help="run the no-grad distillation teacher at this "
                         "compute dtype during NeuMesh training "
                         "(training.teacher_dtype)")
    ap.add_argument("--n-grid", type=int, default=96,
                    help="marching-tetrahedra grid for the prior mesh "
                         "(denser scaffolds inflate the candidate tables "
                         "baked into the jitted train step; the remote "
                         "compile helper caps program uploads)")
    args = ap.parse_args()
    workdir = args.workdir or (
        "/tmp/qgate" if args.scene == "sphere"
        else f"/tmp/qgate_{args.scene}")

    import jax
    cache_dir = os.path.expanduser("~/.cache/neumesh_tpu_jax")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp

    from neumesh_tpu.dataio import get_data
    from neumesh_tpu.dataio.synthetic import (generate_sphere_scene,
                                              generate_torus_scene)
    from neumesh_tpu.models import build_framework
    from neumesh_tpu.ops.metrics import psnr as psnr_fn
    from neumesh_tpu.ops.rays import get_rays
    from neumesh_tpu.train.loop import main_function

    scene = os.path.join(workdir, "scene")
    if not os.path.exists(os.path.join(scene, "cameras.npz")):
        print(f"=> generating {args.scene} scene (20 views, 128x128)")
        gen = (generate_sphere_scene if args.scene == "sphere"
               else generate_torus_scene)
        gen(scene, n_views=20, H=128, W=128, focal=160.0)

    neus_dir = os.path.join(workdir, "logs", "qgate_neus")
    mesh_path = os.path.join(workdir, "mesh", "extracted_0.ply")
    nm_dir = os.path.join(workdir, "logs", "qgate_neumesh")

    ncfg = neus_config(workdir, args.iters)
    if args.train_matmul_precision:
        ncfg.training["matmul_precision"] = args.train_matmul_precision
    if not (args.skip_train
            and os.path.exists(os.path.join(nm_dir, "ckpts", "latest.ckpt"))):
        if os.path.exists(os.path.join(neus_dir, "ckpts", "latest.ckpt")):
            print("=> NeuS teacher checkpoint exists; skipping")
        else:
            print(f"=> training NeuS teacher ({args.iters} iters)")
            main_function(ncfg)

        print("=> extracting prior mesh")
        from extract_mesh import extract_mesh
        model_t, *_ = build_framework(ncfg, "NeuS")
        from neumesh_tpu.utils.checkpoints import load_checkpoint, \
            restore_into
        _, params_t, *_ = build_framework(ncfg, "NeuS")
        ck = load_checkpoint(os.path.join(neus_dir, "ckpts", "latest.ckpt"))
        params_t = restore_into(params_t, ck["model"])
        extract_mesh(model_t, params_t, N_grid=args.n_grid,
                     x_range=(-0.75, 0.75), y_range=(-0.75, 0.75),
                     z_range=(-0.75, 0.75), sdf_th=0.0, chunk=65536,
                     scale_factor=1.0, output_dir=os.path.join(
                         workdir, "mesh"), obj_id="0")

        print(f"=> distilling NeuMesh ({args.iters} iters)")
        mcfg_train = neumesh_config(workdir, args.iters, mesh_path,
                                    neus_dir)
        if args.train_matmul_precision:
            mcfg_train.training["matmul_precision"] = \
                args.train_matmul_precision
        if args.train_student_dtype:
            mcfg_train.model["compute_dtype"] = args.train_student_dtype
            mcfg_train.model["f32_layers"] = ("d0", "dh", "c0", "ch")
        if args.train_teacher_dtype:
            mcfg_train.training["teacher_dtype"] = args.train_teacher_dtype
        main_function(mcfg_train)

    # ---- evaluation on 4 held-out-ish views
    mcfg = neumesh_config(workdir, args.iters, mesh_path, neus_dir)
    from neumesh_tpu.utils.checkpoints import load_checkpoint, restore_into
    results = {}
    views = [1, 6, 11, 16]

    renders = {}

    from neumesh_tpu.ops.lpips import load_lpips_weights, lpips as lpips_fn
    from neumesh_tpu.ops.metrics import ssim as ssim_fn
    lpips_w = load_lpips_weights()

    def eval_renders(render_one, tag):
        psnrs, ssims, lpipss = [], [], []
        imgs = []
        ds = get_data(mcfg, downscale=1)
        for vi in views:
            _, sample, gt = ds[vi]
            ro, rd, _ = get_rays(jnp.asarray(sample["c2w"]),
                                 jnp.asarray(sample["intrinsics"]),
                                 ds.H, ds.W)
            rgb = render_one(ro, rd)
            imgs.append(np.asarray(rgb))
            gt_rgb = np.asarray(gt["rgb"])
            p = float(psnr_fn(jnp.asarray(rgb), jnp.asarray(gt_rgb)))
            psnrs.append(p)
            pred_hw = np.asarray(rgb).reshape(ds.H, ds.W, 3)
            gt_hw = gt_rgb.reshape(ds.H, ds.W, 3)
            ssims.append(float(ssim_fn(
                jnp.asarray(pred_hw.transpose(2, 0, 1)),
                jnp.asarray(gt_hw.transpose(2, 0, 1)))))
            if lpips_w is not None:
                lpipss.append(float(np.asarray(
                    lpips_fn(lpips_w, pred_hw, gt_hw))))
        renders[tag] = imgs
        results[tag] = round(float(np.mean(psnrs)), 3)
        results[tag + "_ssim"] = round(float(np.mean(ssims)), 4)
        if lpipss:
            results[tag + "_lpips"] = round(float(np.mean(lpipss)), 4)
        print(f"{tag}: mean PSNR {results[tag]:.2f} dB "
              f"SSIM {results[tag + '_ssim']:.4f} "
              f"({[round(p, 2) for p in psnrs]})")

    def image_vs_image(tag_a, tag_b, carry_key=None):
        """Mean PSNR of tag_a's renders against tag_b's renders
        (image-vs-image, not vs GT — VERDICT r3 #3). When either side
        was skipped via --modes, the previous JSON's value carries."""
        if tag_a not in renders or tag_b not in renders:
            return prev.get(carry_key)
        ps = [float(psnr_fn(jnp.asarray(a), jnp.asarray(b)))
              for a, b in zip(renders[tag_a], renders[tag_b])]
        return round(float(np.mean(ps)), 3)

    from neumesh_tpu.render.ray_casting import surface_render
    from neumesh_tpu.render.volume import volume_render_rays

    def make_model(use_pallas, dtype, f32_layers=(), kp=12,
                   eval_candidates=0, serving=False):
        """All knobs flow through the config dict (VERDICT r4 #6: no
        object mutation after build — the lockstep test parses configs
        statically, and a mutated attribute can silently diverge between
        gate and bench)."""
        cfg = neumesh_config(workdir, args.iters, mesh_path, neus_dir)
        cfg.model["use_pallas"] = use_pallas
        if use_pallas:
            # the bench.py serving knobs (sweep_surface_knobs 'fast')
            cfg.model["tile_kp_per_probe"] = kp
            cfg.model["pallas_sample_block"] = 1024
            if args.scan_knn_k:
                cfg.model["scan_knn_k"] = args.scan_knn_k
            if args.scan_candidates:
                cfg.model["scan_candidates"] = args.scan_candidates
            if args.tile_cell_budget:
                cfg.model["tile_cell_budget"] = args.tile_cell_budget
            if args.no_secant_rebracket:
                cfg.model["secant_rebracket"] = False
            cfg.model["secant_tiles_per_program"] = \
                args.secant_tiles_per_program
            if eval_candidates:
                cfg.model["eval_candidates"] = eval_candidates
        if serving:
            cfg.model["secant_full_precision"] = \
                bool(args.secant_full_precision)
            cfg.model["secant_frozen_knn"] = bool(args.secant_frozen_knn)
        if dtype == "bf16":
            cfg.model["compute_dtype"] = "bfloat16"
        if f32_layers:
            cfg.model["f32_layers"] = tuple(f32_layers)
        model, params, *_ = build_framework(cfg, "NeuMesh")
        ck = load_checkpoint(os.path.join(nm_dir, "ckpts", "latest.ckpt"))
        params = restore_into(params, ck["model"])
        return model, params

    def volume_one(model, params, tile=16, blocks=None, color_topk=0,
                   root_anchored=False, max_cand=None):
        perm = inv = None
        if blocks is not None:
            from neumesh_tpu.ops.rays import block_order_indices
            ds0 = get_data(mcfg, downscale=1)
            perm, inv = block_order_indices(ds0.H, ds0.W, *blocks)

        @jax.jit
        def r(ro, rd):
            if perm is not None:
                ro, rd = ro[perm], rd[perm]
            out = volume_render_rays(
                model, params, ro, rd, jax.random.PRNGKey(0),
                detailed_output=False, perturb=False,
                bounded_near_far=True, N_samples=64, N_importance=64,
                N_upsample_iters=4, reuse_upsample_sdf=True,
                ray_tile=tile, tile_max_candidates=max_cand,
                color_topk=color_topk,
                root_anchored=root_anchored,
                root_steps=args.volume_root_steps,
                root_secant=args.volume_root_secant,
                root_n_fine=args.volume_n_fine,
                root_win_frac=args.volume_win_frac)["rgb"]
            return out if inv is None else out[inv]
        return r

    def surface_one(model, params, steps=24, secant=4):
        from neumesh_tpu.ops.rays import block_order_indices
        ds0 = get_data(mcfg, downscale=1)
        bh, bw = args.surface_blocks
        perm, inv = block_order_indices(ds0.H, ds0.W, bh, bw)

        @jax.jit
        def r(ro, rd):
            # pixel-block tiling: compact ray bundles per shared cache
            # (the bench.py headline configuration)
            c, _, _ = surface_render(
                model, params, ro[perm], rd[perm],
                ray_tile=args.surface_tile,
                scan_mode="distance", tile_max_candidates=128,
                shade_composite=args.surface_shade_composite,
                shade_topk=args.surface_shade_topk,
                shade_win_frac=args.surface_shade_win_frac,
                ray_casting_cfgs={"N_steps": steps,
                                  "N_secant_steps": secant})
            return c[inv]
        return r

    serving_f32_layers = tuple(
        t for t in (args.f32_layers or "").split(",") if t)

    modes = set(args.modes.split(","))
    prev = {}
    prev_path = os.path.join(workdir, "quality_gate.json")
    if os.path.exists(prev_path):
        with open(prev_path) as f:
            prev = json.load(f)

    def carry(tag):
        """Carry a skipped mode's scores from the previous gate JSON."""
        assert tag in prev, (
            f"--modes skipped {tag} but {prev_path} has no prior score")
        for k in (tag, tag + "_ssim", tag + "_lpips"):
            if k in prev:
                results[k] = prev[k]
        print(f"{tag}: carried {results[tag]:.2f} dB from {prev_path}")

    if "volume_f32" in modes:
        m32, p32 = make_model(False, "f32")
        eval_renders(volume_one(m32, p32), "volume_f32")
    else:
        carry("volume_f32")
    # the volume SERVING config (bench.py volume_mrays): bf16 fused
    # kernels, tile=64 contexts over 8x8 pixel blocks
    if "volume_bf16" in modes:
        m16, p16 = make_model(True, "bf16",
                              eval_candidates=args.eval_candidates)
        vol_blocks = (8, 16) if args.volume_tile >= 128 else (8, 8)
        eval_renders(volume_one(m16, p16, tile=args.volume_tile,
                                blocks=vol_blocks,
                                color_topk=args.volume_topk,
                                root_anchored=bool(
                                    args.volume_root_anchored),
                                max_cand=(args.volume_max_candidates
                                          or None)),
                     "volume_bf16")
    else:
        carry("volume_bf16")
    # surface-mode parity anchor: the f32 fused-kernel surface render at
    # the SAME structural config (steps/secant/kp) as the serving mode —
    # the gated delta then isolates precision (bf16 + selective-f32)
    # only. Structural quality (scan resolution, candidate budget) is
    # gated separately: gate_surface scores serving against the volume
    # path on GT, and tests/test_surface_render.py pins sub-millimeter
    # depth accuracy for the serving configuration.
    if "surface_f32" in modes:
        mp32, pp32 = make_model(True, "f32", kp=args.serving_kp)
        eval_renders(surface_one(mp32, pp32, steps=args.surface_steps,
                                 secant=args.surface_secant),
                     "surface_f32")
    else:
        carry("surface_f32")
    # the BENCHMARKED serving config: bf16 + selective-f32 layers,
    # low-precision secant unless --secant-full-precision
    if "surface_fast" in modes:
        msrv, psrv = make_model(True, "bf16", serving_f32_layers,
                                kp=args.serving_kp, serving=True)
        eval_renders(surface_one(msrv, psrv, steps=args.surface_steps,
                                 secant=args.surface_secant),
                     "surface_fast")
    else:
        carry("surface_fast")
    results["surface_steps"] = args.surface_steps
    results["surface_secant"] = args.surface_secant
    results["surface_shade_composite"] = args.surface_shade_composite
    if args.surface_shade_composite:
        results["surface_shade_topk"] = args.surface_shade_topk
        results["surface_shade_win_frac"] = args.surface_shade_win_frac
    results["serving_kp"] = args.serving_kp
    if args.scan_knn_k:
        results["scan_knn_k"] = args.scan_knn_k
    if args.scan_candidates:
        results["scan_candidates"] = args.scan_candidates
    if args.tile_cell_budget:
        results["tile_cell_budget"] = args.tile_cell_budget
    if args.surface_tile != 128:
        results["surface_tile"] = args.surface_tile
    if args.no_secant_rebracket:
        results["secant_rebracket"] = False
    if args.secant_frozen_knn:
        results["secant_frozen_knn"] = True

    results["scene"] = args.scene
    if args.secant_tiles_per_program != 1:
        results["secant_tiles_per_program"] = args.secant_tiles_per_program
    if args.volume_root_anchored:
        results["volume_root_anchored"] = True
        results["volume_n_fine"] = args.volume_n_fine
        results["volume_root_steps"] = args.volume_root_steps
        results["volume_root_secant"] = args.volume_root_secant
        results["volume_win_frac"] = args.volume_win_frac
    results["volume_topk"] = args.volume_topk
    results["volume_tile"] = args.volume_tile
    results["volume_max_candidates"] = args.volume_max_candidates
    if args.eval_candidates:
        results["eval_candidates"] = args.eval_candidates

    results["serving_f32_layers"] = list(serving_f32_layers)
    # image-vs-image PSNRs (VERDICT r3 #3): how far each serving mode's
    # IMAGE is from the f32 reference-structure volume render
    results["volume_serving_vs_f32_img"] = image_vs_image(
        "volume_bf16", "volume_f32", "volume_serving_vs_f32_img")
    results["surface_vs_volume_img"] = image_vs_image(
        "surface_fast", "volume_f32", "surface_vs_volume_img")
    results["bf16_delta_db"] = round(
        results["volume_bf16"] - results["volume_f32"], 3)
    results["surface_serving_delta_db"] = round(
        results["surface_fast"] - results["surface_f32"], 3)
    results["surface_delta_db"] = round(
        results["surface_fast"] - results["volume_bf16"], 3)
    # Gates (north star: parity within +-0.1 dB):
    #   gate_bf16    — the benchmarked serving config must match its own
    #                  f32 parity mode within 0.1 dB (selective-f32
    #                  layers close the plain-bf16 ~0.26 dB gap)
    #   gate_surface — surface mode must not lose >1 dB vs the volume
    #                  serving path on GT PSNR
    results["gate_bf16"] = bool(
        abs(results["surface_serving_delta_db"]) <= 0.1)
    results["gate_surface"] = bool(results["surface_delta_db"] >= -1.0)
    #   gate_volume  — the benchmarked volume serving config (bf16 fused
    #                  kernels + any structural knobs: color_topk,
    #                  root-anchored sampling, eval_candidates) must stay
    #                  within 0.1 dB of the reference-structure f32
    #                  volume render on GT PSNR
    results["gate_volume"] = bool(
        results["volume_bf16"] - results["volume_f32"] >= -0.1)
    print(json.dumps(results))
    with open(os.path.join(workdir, "quality_gate.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
