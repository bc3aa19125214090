"""Texture swapping (reference editing/render_texture_swapping.py).

Editing mask = vertices with non-black color in a mask mesh; alignment from
persisted correspondences (Umeyama + ICP, align.py) instead of the GUI;
optional ARAP warp of the ref mesh onto the main; transfer = main masked
vertices -> T_r_m -> Kc=4 kNN among ref masked vertices -> inverse-distance
weighted average of ref color_features written into edit_color_features.
"""
from __future__ import annotations

import numpy as np

from ..mesh.triangle_mesh import TriangleMesh, load_mesh
from ..utils.print_fn import log
from .align import estimate_transform_from_corr
from .editable import EditingParams
from .renderer_base import TextureEditableRenderer


def _knn(query, points, k):
    try:
        from ..cpp import native
        if native.available():
            return native.KDTree(points).query(query, k=k)
    except Exception:
        pass
    from scipy import spatial
    return spatial.cKDTree(points).query(query, k=k)


def deform_ref_mesh_arap(main_pts_in_ref, corr_ref_ids, ref_mesh:
                         TriangleMesh, ref_mask, max_iter: int = 20):
    """ARAP-warp the ref mesh so corr vertices land on the transformed main
    correspondences; unedited + isolated vertices stay fixed
    (reference render_texture_swapping.py:37-60)."""
    ref_mesh.remove_duplicated_triangles()
    isolated = ref_mesh.isolated_vertex_mask()
    static_ids = np.where(~ref_mask | isolated)[0]
    handle_ids = np.asarray(corr_ref_ids, np.int64)
    cids = np.concatenate([static_ids, handle_ids])
    cpos = np.concatenate([ref_mesh.vertices[static_ids], main_pts_in_ref])
    from ..cpp import native
    if native.available():
        new_v = native.arap(ref_mesh.vertices, ref_mesh.triangles, cids,
                            cpos, max_iter=max_iter)
    else:
        log.warning("native ARAP unavailable; applying constraints only")
        new_v = ref_mesh.vertices.copy()
        new_v[cids] = cpos
    ref_mesh.vertices = new_v
    ref_mesh.compute_vertex_normals()
    return ref_mesh


def align_mesh(main_mesh, main_editing_mask, ref_mesh, ref_editing_mask,
               T_r_m=None, corr=None, use_arap=False):
    """(reference render_texture_swapping.py:72-102). Returns
    (T_r_m, corr, possibly-deformed ref mesh)."""
    assert corr is not None, (
        "No correspondences: the TPU build is file-driven — provide `corr` "
        "(and optionally `T_r_m`) in the editing config")
    corr = np.asarray(corr, np.int64)
    if T_r_m is None:
        T_r_m = estimate_transform_from_corr(
            np.asarray(main_mesh.vertices), np.asarray(ref_mesh.vertices),
            corr)
    else:
        T_r_m = np.asarray(T_r_m, np.float64)

    if use_arap:
        pt1 = np.asarray(main_mesh.vertices)[corr[:, 0]]
        pt1_trans = pt1 @ T_r_m[:3, :3].T + T_r_m[:3, 3]
        ref_mesh = deform_ref_mesh_arap(
            pt1_trans, corr[:, 1], ref_mesh, ref_editing_mask)
    return T_r_m, corr, ref_mesh


class TextureSwappingRender(TextureEditableRenderer):
    def read_editing_mask(self, mask_path, mesh):
        mask_mesh = load_mesh(mask_path)
        assert mask_mesh.vertex_colors is not None, (
            f"{mask_path}: mask mesh has no vertex colors")
        mask = np.sum(np.asarray(mask_mesh.vertex_colors), axis=-1) != 0
        return EditingParams(mask)

    def transfer_texture_features(self, args, main_primitive,
                                  ref_primitives):
        T_r_m_list = []
        for i in range(len(ref_primitives)):
            main_editing_params = main_primitive.get_editing_params(i)
            ref_primitive = ref_primitives[i]
            ref_editing_params = ref_primitive.get_editing_params(0)

            cfg_T = args.get("T_r_m", [])
            cfg_corr = args.get("corr", [])
            T_r_m, corr, ref_mesh_deformed = align_mesh(
                main_primitive.get_mesh(),
                main_editing_params.get_editing_mask(),
                ref_primitive.get_mesh(),
                ref_editing_params.get_editing_mask(),
                T_r_m=cfg_T[i] if len(cfg_T) > i else None,
                corr=cfg_corr[i] if len(cfg_corr) > i else None,
                use_arap=args.get("use_arap", False))
            if args.get("use_arap", False):
                ref_primitive.update_mesh_grid(ref_mesh_deformed)

            self.transfer(main_primitive, main_editing_params,
                          ref_primitive, ref_editing_params,
                          np.asarray(T_r_m), Kc=args.get("Kc", 4))
            T_r_m_list.append(np.asarray(T_r_m))
        return np.stack(T_r_m_list)

    def transfer(self, main_primitive, main_params, ref_primitive,
                 ref_params, T_r_m, Kc: int = 4):
        weights, ref_feat_indices, main_feat_indices = \
            self.compute_transition_weights(
                main_primitive.get_mesh_vertices(), main_params,
                ref_primitive.get_mesh_vertices(), ref_params, T_r_m, Kc)
        ref_feat = np.asarray(
            ref_primitive.params["color_features"])[ref_feat_indices]
        new_main_feat = np.sum(weights[..., None] * ref_feat, axis=-2)
        main_primitive.edit_color_features[main_feat_indices] = new_main_feat
        log.info(f"[swap] transferred {len(main_feat_indices)} vertex codes")

    @staticmethod
    def compute_transition_weights(main_vertices, main_params, ref_vertices,
                                   ref_params, T_r_m, Kc):
        """(reference render_texture_swapping.py:203-229)."""
        main_mask = main_params.get_editing_mask()
        ref_mask = ref_params.get_editing_mask()
        main_idx = np.where(main_mask)[0]
        ref_idx = np.where(ref_mask)[0]

        main_pts = main_vertices[main_mask]
        ref_pts = ref_vertices[ref_mask]
        main_trans = main_pts @ T_r_m[:3, :3].T + T_r_m[:3, 3]

        distance, nbr = _knn(main_trans, ref_pts.reshape(-1, 3), Kc)
        neighbours_in_ref = ref_idx[nbr]

        w = 1.0 / (distance + 1e-8)
        w = w / np.sum(w, axis=-1, keepdims=True)
        return w.astype(np.float32), neighbours_in_ref, main_idx
