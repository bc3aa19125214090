"""Quality evaluation CLI: render dataset views from a checkpoint and
report PSNR/SSIM per view (the reference computed these offline against
released val splits; BASELINE.md parity plan).

Usage:
    python eval.py --config logs/<exp>/config.yaml [--views 0,5,10]
        [--downscale 2] [--val_names path/to/val_names.txt]
"""
from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from neumesh_tpu.config import create_args_parser, load_config
from neumesh_tpu.dataio import get_data
from neumesh_tpu.models import build_framework
from neumesh_tpu.ops.metrics import psnr as psnr_fn, ssim as ssim_fn
from neumesh_tpu.ops.rays import get_rays
from neumesh_tpu.utils.checkpoints import CheckpointIO, sorted_ckpts
from neumesh_tpu.utils.print_fn import log


def main_function(args):
    model, params, _, _, render_kwargs_test, render_fn = build_framework(
        args, args.model.framework)

    ckpt_file = args.get("load_pt", None)
    if ckpt_file is None:
        ckpts = sorted_ckpts(os.path.join(args.training.exp_dir, "ckpts"))
        assert ckpts, "no checkpoint found; pass --load_pt"
        ckpt_file = ckpts[-1]
    log.info(f"=> Use ckpt: {ckpt_file}")
    io = CheckpointIO(os.path.dirname(str(ckpt_file)) or ".")
    loaded = io.load_file(str(ckpt_file))
    state = loaded.get("model", loaded)
    if any("weight_v" in str(k) for k in state):
        from neumesh_tpu.utils.torch_ckpt import (
            neumesh_state_dict_to_params, neus_state_dict_to_params)
        params = (neumesh_state_dict_to_params(state, model)
                  if "geometry_features" in state
                  else neus_state_dict_to_params(state, model))
    else:
        from neumesh_tpu.utils.checkpoints import restore_into
        params = restore_into(params, state)

    dataset = get_data(args, downscale=args.downscale)
    H, W = dataset.H, dataset.W

    if args.get("views", None):
        views = [int(x) for x in str(args.views).split(",") if x != ""]
    elif args.get("val_names", None):
        # reference-style val split: file of image basenames (README.md:32)
        with open(args.val_names) as f:
            names = {os.path.splitext(line.strip())[0]
                     for line in f if line.strip()}
        from neumesh_tpu.dataio.dtu import glob_imgs
        paths = glob_imgs(os.path.join(args.data.data_dir, "image"))
        views = [i for i, p in enumerate(paths)
                 if os.path.splitext(os.path.basename(p))[0] in names]
        assert views, "no dataset views matched val_names"
    else:
        views = list(range(len(dataset)))

    kwargs = {k: v for k, v in render_kwargs_test.items()
              if k not in ("batched",)}
    kwargs["rayschunk"] = args.rayschunk
    kwargs["perturb"] = False
    # inference: reuse the up-sampling loop's SDF evals (identical values,
    # one fewer density pass; see volume_render_rays)
    kwargs["reuse_upsample_sdf"] = True

    # LPIPS when the standard weight files are supplied (ops/lpips.py;
    # offline runs skip the metric)
    from neumesh_tpu.ops.lpips import load_lpips_weights, lpips as lpips_fn
    lpips_w = load_lpips_weights()
    if lpips_w is None:
        log.info("LPIPS weights not found "
                 "(set NEUMESH_LPIPS_VGG/NEUMESH_LPIPS_LIN); skipping")

    # --save_renders <dir>: dump each predicted view as <basename>.png —
    # produces a reference-render directory consumable by
    # tools/parity_eval.py --ref_renders (the DTU-day pipeline, rehearsed
    # in tests/test_parity_cli.py)
    save_dir = args.get("save_renders", None)
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        from neumesh_tpu.dataio.dtu import glob_imgs
        paths = glob_imgs(os.path.join(args.data.data_dir, "image"))
        name_of = {i: os.path.splitext(os.path.basename(p))[0]
                   for i, p in enumerate(paths)}

    rows = []
    for vi in views:
        _, sample, gt = dataset[vi]
        ro, rd, _ = get_rays(jnp.asarray(sample["c2w"]),
                             jnp.asarray(sample["intrinsics"]), H, W)
        rgb, _, _ = render_fn(params, ro, rd, key=jax.random.PRNGKey(0),
                              detailed_output=False, **kwargs)
        pred = np.asarray(rgb).reshape(H, W, 3)
        if save_dir:
            import imageio.v2 as imageio
            imageio.imwrite(
                os.path.join(save_dir, f"{name_of.get(vi, vi)}.png"),
                (np.clip(pred, 0, 1) * 255.0).astype(np.uint8))
        ref = np.asarray(gt["rgb"]).reshape(H, W, 3)
        p = float(psnr_fn(jnp.asarray(pred), jnp.asarray(ref)))
        s = float(ssim_fn(jnp.asarray(pred.transpose(2, 0, 1)),
                          jnp.asarray(ref.transpose(2, 0, 1))))
        row = {"view": int(vi), "psnr": round(p, 3), "ssim": round(s, 4)}
        if lpips_w is not None:
            row["lpips"] = round(float(np.asarray(
                lpips_fn(lpips_w, pred, ref))), 4)
        rows.append(row)
        log.info(f"view {vi}: psnr {p:.2f} ssim {s:.4f}"
                 + (f" lpips {row['lpips']:.4f}" if lpips_w is not None
                    else ""))

    summary = {
        "views": rows,
        "mean_psnr": round(float(np.mean([r["psnr"] for r in rows])), 3),
        "mean_ssim": round(float(np.mean([r["ssim"] for r in rows])), 4),
    }
    if rows and "lpips" in rows[0]:
        summary["mean_lpips"] = round(
            float(np.mean([r["lpips"] for r in rows])), 4)
    out = args.get("out_json", None)
    if out:
        with open(out, "w") as f:
            json.dump(summary, f, indent=2)
    print(json.dumps({"mean_psnr": summary["mean_psnr"],
                      "mean_ssim": summary["mean_ssim"],
                      "n_views": len(rows)}))
    return summary


if __name__ == "__main__":
    parser = create_args_parser()
    parser.add_argument("--load_pt", type=str, default=None)
    parser.add_argument("--downscale", type=float, default=1)
    parser.add_argument("--rayschunk", type=int, default=4096)
    parser.add_argument("--views", type=str, default=None)
    parser.add_argument("--val_names", type=str, default=None)
    parser.add_argument("--out_json", type=str, default=None)
    parser.add_argument(
        "--save_renders", type=str, default=None,
        help="directory to dump predicted views as <basename>.png "
             "(consumable by tools/parity_eval.py --ref_renders)")
    args, unknown = parser.parse_known_args()
    config = load_config(args, unknown)
    main_function(config)
