"""TextureEditableNeuMesh: the editing model wrapper
(reference editing/texture_neumesh/texture_neumesh.py:7-122).

Satisfies the model protocol, so the standard volume renderer drives it
unmodified: geometry/SDF always from the main model; color is a per-sample
blend — paint weight = sum of kNN weights whose vertex is edit-masked,
unpaint weight the complement; the edit region queries the REF color MLP
with the transferred ``edit_color_features``, with view dirs and nablas
rotated into the ref frame by T_r_m.

TPU notes: the reference's boolean gathers (texture_neumesh.py:96-115)
become jnp.where masking — ref color is computed for every sample and
blended, keeping shapes static (cost is bounded by the small color MLP).
"""
from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp


class TextureEditableNeuMesh:
    def __init__(
        self,
        main_model,
        ref_models: List,
        main_editing_masks,           # (R, N_main) bool
        T_r_m_list: Optional[list] = None,
    ):
        self.main_model = main_model
        self.ref_models = ref_models
        self.main_editing_masks = jnp.asarray(main_editing_masks)
        if T_r_m_list is not None:
            T = jnp.asarray(T_r_m_list, jnp.float32)  # (R, 4, 4)
            self.rot_s_m = T[:, :3, :3]
            self.t_s_m = T[:, :3, 3]
        else:
            self.rot_s_m = None
        self.enable_nablas_input = main_model.enable_nablas_input
        self.mesh_grid = main_model.mesh_grid  # protocol compat

    # ---- protocol delegation ------------------------------------------------
    def compute_distance(self, params, xyz, K: int = 8):
        return self.main_model.compute_distance(params["main"], xyz, K)

    def forward_s(self, params):
        return self.main_model.forward_s(params["main"])

    def forward_density_only(self, params, xyz):
        return self.main_model.forward_density_only(params["main"], xyz)

    def forward_with_nablas(self, params, xyz):
        return self.main_model.forward_with_nablas(params["main"], xyz)

    # ---- blended color ------------------------------------------------------
    def forward(self, params, xyz, view_dirs):
        main = self.main_model
        mp = params["main"]

        ds, indices, weights = main.compute_distance(mp, xyz)
        if main.enable_nablas_input:
            sdf, nabla, d_emb = main._density_and_nabla(
                mp, xyz, indices, weights)
        else:
            sdf, d_emb = main._density_from_parts(mp, ds, indices, weights)
            nabla = None
        sdf = sdf[..., 0]

        colors = main._color_from_parts(
            mp, d_emb, view_dirs, indices, weights, nabla)

        blend_color = colors
        for i, ref_model in enumerate(self.ref_models):
            mask = self.main_editing_masks[i]       # (N_main,) bool
            m_at = mask[indices].astype(weights.dtype)  # (..., K)
            paint_w = jnp.sum(weights * m_at, axis=-1)
            unpaint_w = jnp.sum(weights * (1.0 - m_at), axis=-1)
            paint_region = paint_w > 0
            sum_w = paint_w + unpaint_w
            paint_w = paint_w / sum_w
            unpaint_w = unpaint_w / sum_w

            ref_weights = weights * m_at
            ref_weights = ref_weights / (
                jnp.sum(ref_weights, axis=-1, keepdims=True) + 1e-8)

            if self.rot_s_m is not None:
                R = self.rot_s_m[i]
                ref_dir = view_dirs @ R.T
                ref_nabla = nabla @ R.T if nabla is not None else None
            else:
                ref_dir = view_dirs
                ref_nabla = nabla

            ref_color = ref_model.forward_color(
                params["refs"][i], ds, ref_dir,
                params["edit_color_features"][i],
                indices, ref_weights, nabla=ref_nabla)

            mixed = (blend_color * unpaint_w[..., None]
                     + ref_color * paint_w[..., None])
            blend_color = jnp.where(paint_region[..., None], mixed,
                                    blend_color)

        return sdf, blend_color


def make_editable_params(main_params, ref_params_list, edit_color_features):
    return {
        "main": main_params,
        "refs": list(ref_params_list),
        "edit_color_features": [jnp.asarray(f, jnp.float32)
                                for f in edit_color_features],
    }
