"""Mesh alignment tool (file-driven replacement for the reference's
interactive Open3D picking GUI, reference tools/interactive_mesh_algnment.py).

Given a correspondence file (JSON list of [main_vertex_id, ref_vertex_id],
>= 3 pairs), estimates the similarity transform T_r_m (Umeyama with scaling
+ point-to-point ICP refinement) and writes T_r_m + corr back into the
editing config — the same persistence the reference GUI performs
(editing/render_texture_swapping.py:63-69).
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neumesh_tpu.editing.align import estimate_transform_from_corr
from neumesh_tpu.mesh.triangle_mesh import load_mesh

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--main_mesh", type=str, required=True)
    parser.add_argument("--ref_mesh", type=str, required=True)
    parser.add_argument("--corr", type=str, required=True,
                        help="JSON file: [[main_id, ref_id], ...]")
    parser.add_argument("--out_config", type=str, default=None,
                        help="editing config JSON to update in place")
    parser.add_argument("--pair_index", type=int, default=0,
                        help="which editing pair in the config to set")
    parser.add_argument("--icp_threshold", type=float, default=0.03)
    parser.add_argument("--no_refine", action="store_true")
    args = parser.parse_args()

    main_mesh = load_mesh(args.main_mesh)
    ref_mesh = load_mesh(args.ref_mesh)
    with open(args.corr) as f:
        corr = np.asarray(json.load(f), np.int64)
    assert len(corr) >= 3, "need at least 3 correspondences"

    T = estimate_transform_from_corr(
        np.asarray(main_mesh.vertices), np.asarray(ref_mesh.vertices), corr,
        threshold=args.icp_threshold, refine=not args.no_refine)
    print("T_r_m =")
    print(np.array2string(T, precision=6))

    if args.out_config:
        with open(args.out_config) as f:
            data = json.load(f)
        data.setdefault("T_r_m", [])
        data.setdefault("corr", [])
        while len(data["T_r_m"]) <= args.pair_index:
            data["T_r_m"].append(None)
            data["corr"].append(None)
        data["T_r_m"][args.pair_index] = T.tolist()
        data["corr"][args.pair_index] = corr.tolist()
        with open(args.out_config, "w") as f:
            json.dump(data, f, indent=2)
        print(f"updated {args.out_config}")
