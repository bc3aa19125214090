"""Reference-checkpoint parity table (BASELINE.md measurement plan).

One command that produces the parity table the moment DTU data and the
released reference checkpoints are available:

    python tools/parity_eval.py --config <neumesh config.yaml> \
        --load_pt <released latest.pt> \
        --val_names <scene>/val_names.txt \
        [--ref_renders <dir of reference-rendered val views>] \
        [--out_json parity_scan63.json]

- Renders every val view from the (auto-converted) checkpoint and scores
  PSNR/SSIM against the dataset ground truth (reference README.md:32's
  released val splits; eval.py does the heavy lifting, including the
  torch state_dict -> native conversion via utils/torch_ckpt.py).
- If --ref_renders holds the reference implementation's renders of the
  same views (PNG files whose basenames match the dataset image names),
  also scores the reference against GT and our renders against the
  reference's, and prints the per-view parity deltas the ±0.1 dB gate
  (BASELINE.md) is judged on.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_image(path, H, W):
    import imageio.v2 as imageio

    img = np.asarray(imageio.imread(path), np.float64)
    if img.shape[0] != H or img.shape[1] != W:
        raise ValueError(
            f"{path}: reference render is {img.shape[:2]}, dataset views "
            f"are {(H, W)} — render the reference at the same scale")
    return (img[..., :3] / 255.0).astype(np.float32)


def main():
    from neumesh_tpu.config import create_args_parser, load_config

    import eval as eval_cli

    parser = create_args_parser()
    parser.add_argument("--load_pt", type=str, default=None)
    parser.add_argument("--downscale", type=float, default=1)
    parser.add_argument("--rayschunk", type=int, default=4096)
    parser.add_argument("--views", type=str, default=None)
    parser.add_argument("--val_names", type=str, default=None)
    parser.add_argument("--ref_renders", type=str, default=None)
    parser.add_argument("--out_json", type=str, default=None)
    args, unknown = parser.parse_known_args()
    config = load_config(args, unknown)

    out_json = config.pop("out_json", None)
    ref_dir = config.pop("ref_renders", None)
    summary = eval_cli.main_function(config)

    table = {"ours_vs_gt": summary}
    if ref_dir:
        import jax.numpy as jnp

        from neumesh_tpu.dataio import get_data
        from neumesh_tpu.ops.metrics import psnr as psnr_fn

        dataset = get_data(config, downscale=config.downscale)
        from neumesh_tpu.dataio.dtu import glob_imgs
        paths = glob_imgs(os.path.join(config.data.data_dir, "image"))
        name_of = {i: os.path.splitext(os.path.basename(p))[0]
                   for i, p in enumerate(paths)}
        ref_files = {os.path.splitext(f)[0]: os.path.join(ref_dir, f)
                     for f in os.listdir(ref_dir)}

        rows = []
        for row in summary["views"]:
            vi = row["view"]
            name = name_of.get(vi)
            if name not in ref_files:
                print(f"[parity] no reference render for view {vi} "
                      f"({name}); skipping")
                continue
            _, _, gt = dataset[vi]
            H, W = dataset.H, dataset.W
            ref_img = load_image(ref_files[name], H, W)
            gt_img = np.asarray(gt["rgb"]).reshape(H, W, 3)
            ref_psnr = float(psnr_fn(jnp.asarray(ref_img),
                                     jnp.asarray(gt_img)))
            rows.append({
                "view": vi, "name": name,
                "psnr_ours": row["psnr"],
                "psnr_ref": round(ref_psnr, 3),
                "delta_db": round(row["psnr"] - ref_psnr, 3),
            })
        deltas = [r["delta_db"] for r in rows]
        table["parity"] = {
            "views": rows,
            "mean_delta_db": round(float(np.mean(deltas)), 3) if rows
            else None,
            "within_0p1_db": bool(rows and abs(np.mean(deltas)) <= 0.1),
        }
        print("view  name            ours    ref     delta")
        for r in rows:
            print(f"{r['view']:<5} {r['name']:<15} {r['psnr_ours']:<7} "
                  f"{r['psnr_ref']:<7} {r['delta_db']:+.3f}")
        if rows:
            print(f"mean delta: {table['parity']['mean_delta_db']:+.3f} dB "
                  f"(gate: ±0.1 dB)")

    if out_json:
        with open(out_json, "w") as f:
            json.dump(table, f, indent=2)
    return table


if __name__ == "__main__":
    main()
