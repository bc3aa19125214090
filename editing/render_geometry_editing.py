"""Geometry editing CLI (reference editing/render_geometry_editing.py):
render a NeuMesh checkpoint on a deformed mesh scaffold (made offline, e.g.
in Blender), rotating indicator vectors by the old->new normal rotation."""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neumesh_tpu.config import ConfigDict, load_yaml
from neumesh_tpu.editing.geometry import deform_model
from neumesh_tpu.editing.renderer_base import load_neumesh_from_config
from neumesh_tpu.mesh.triangle_mesh import load_mesh
from neumesh_tpu.utils.checkpoints import sorted_ckpts
from neumesh_tpu.utils.print_fn import log
from render import create_render_args, render_function


def main_function(args):
    main_args = load_yaml(args.main_config)
    if args.get("background", None) is not None:
        main_args.model.white_bkgd = args.background == 1

    ckpt_file = args.get("load_pt", None)
    if ckpt_file is None:
        ckpt_file = sorted_ckpts(
            os.path.join(main_args.training.log_root_dir, main_args.expname,
                         "ckpts"))[-1]
    log.info("=> Use ckpt: " + str(ckpt_file))
    model, params, main_args, render_kwargs_test = load_neumesh_from_config(
        args.main_config, str(ckpt_file))

    deformed_mesh = load_mesh(args.deformed_mesh)
    params = deform_model(deformed_mesh, model, params,
                          fix_indicator=args.get("fix_indicator", False))

    from neumesh_tpu.render.volume import SingleRenderer
    renderer = SingleRenderer(model)
    for k, v in dict(main_args).items():
        if k not in args:
            args[k] = v
    render_function(args, model, params, render_kwargs_test, renderer)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
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
    main_function(config)
