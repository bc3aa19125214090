"""Texture swapping CLI (reference editing/render_texture_swapping.py).

Config: JSON with main_config/main_ckpt/main_mask_mesh, ref_config[...]/
ref_ckpt[...]/ref_mask_mesh[...], and persisted `T_r_m` + `corr`
(the TPU build is file-driven; use tools/mesh_alignment.py to estimate
T_r_m from correspondences).
"""
import argparse
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neumesh_tpu.config import ConfigDict
from neumesh_tpu.editing.swap import TextureSwappingRender
from render import create_render_args

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--use_arap", action="store_true", default=False)
    parser.add_argument("--Kc", default=4, type=int)
    parser.add_argument("--fix_indicator", action="store_true", default=False)
    create_render_args(parser)
    args, unknown = parser.parse_known_args()
    with open(args.config) as f:
        config_dict = json.load(f)
    # CLI wins only when explicitly set (don't clobber JSON values with
    # argparse None defaults)
    for k, v in vars(args).items():
        if v is not None or k not in config_dict:
            config_dict[k] = v
    config = ConfigDict(config_dict)
    TextureSwappingRender().forward(config)
