"""Texture filling CLI (reference editing/render_texture_filling.py)."""
import argparse
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neumesh_tpu.config import ConfigDict
from neumesh_tpu.editing.fill import TextureFillingRender
from render import create_render_args

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--Kc", default=4, type=int)
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
    TextureFillingRender().forward(config)
