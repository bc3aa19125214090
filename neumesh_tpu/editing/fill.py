"""Texture filling (reference editing/render_texture_filling.py): tile a
reference uv texture pattern over the main mesh's uv domain and transfer
color codes via Kc-NN search in uv space."""
from __future__ import annotations

import numpy as np

from ..mesh.triangle_mesh import load_mesh
from ..utils.print_fn import log
from .editable import EditingParams
from .renderer_base import TextureEditableRenderer


def _knn(query, points, k):
    try:
        from ..cpp import native
        if native.available():
            # KDTree is 3D; embed 2D uv with zero z
            q3 = np.concatenate([query, np.zeros((len(query), 1))], -1)
            p3 = np.concatenate([points, np.zeros((len(points), 1))], -1)
            return native.KDTree(p3).query(q3, k=k)
    except Exception:
        pass
    from scipy import spatial
    return spatial.cKDTree(points).query(query, k=k)


def _exact_nn(v1: np.ndarray, v2: np.ndarray, EPS=1e-6):
    """closest vertex of v2 for each vertex of v1; asserts the meshes are
    aligned (reference render_texture_filling.py:17-30)."""
    try:
        from ..cpp import native
        if native.available():
            d, nbr = native.KDTree(v2).query(v1, k=1)
            d, nbr = d[:, 0], nbr[:, 0]
        else:
            raise ImportError
    except Exception:
        from scipy import spatial
        d, nbr = spatial.cKDTree(v2).query(v1, k=1)
    assert np.all(d < EPS), (
        f"[Error] Misalignment between meshes (max {d.max()}, mean "
        f"{d.mean()}) — ensure the mask mesh matches the model mesh")
    return nbr


class TextureFillingRender(TextureEditableRenderer):
    def read_editing_mask(self, mask_path, mesh):
        """Mask = model vertices whose exact-match mask-mesh vertex touches a
        triangle with nonzero uv; collects the (uv, model vertex) chart
        (reference render_texture_filling.py:71-95).

        The TPU build reads uv charts from the PLY's per-vertex s/t
        properties (Blender export) instead of Open3D triangle_uvs."""
        mask_mesh = load_mesh(mask_path)
        assert mask_mesh.vertex_uvs is not None, (
            f"{mask_path}: mask mesh has no per-vertex uv (s/t) properties")
        model_v = np.asarray(mesh.vertices, np.float64)
        mask_v = np.asarray(mask_mesh.vertices, np.float64)
        neighbors_in_maskmesh = _exact_nn(model_v, mask_v)

        uvs = np.asarray(mask_mesh.vertex_uvs, np.float64)
        has_uv = np.linalg.norm(uvs, axis=-1) > 1e-8
        mask = has_uv[neighbors_in_maskmesh]

        model_idx = np.where(mask)[0]
        model_uv = uvs[neighbors_in_maskmesh[model_idx]]
        return EditingParams(mask, model_uv.copy(), model_idx)

    def transfer_texture_features(self, args, main_primitive,
                                  ref_primitives):
        steps = args.get("step", [1] * len(ref_primitives))
        for i in range(len(ref_primitives)):
            main_editing_params = main_primitive.get_editing_params(i)
            ref_primitive = ref_primitives[i]
            ref_editing_params = ref_primitive.get_editing_params(0)

            main_editing_params.clamp_and_normalize_params()
            ref_editing_params.clamp_and_normalize_params()

            self.transfer(main_primitive, main_editing_params,
                          ref_primitive, ref_editing_params,
                          steps=steps[i], Kc=args.get("Kc", 4))
        return None  # no rigid transform for uv filling

    def transfer(self, main_primitive, main_params, ref_primitive,
                 ref_params, steps=1, Kc=4):
        weights, ref_feat_indices, main_feat_indices = \
            self.compute_transition_weights(main_params, ref_params, steps,
                                            Kc)
        ref_feat = np.asarray(
            ref_primitive.params["color_features"])[ref_feat_indices]
        new_main_feat = np.sum(weights[..., None] * ref_feat, axis=-2)
        main_primitive.edit_color_features[main_feat_indices] = new_main_feat
        log.info(f"[fill] transferred {len(main_feat_indices)} vertex codes")

    @staticmethod
    def compute_transition_weights(main_params, ref_params, steps, Kc):
        """Tile the ref uv pattern `steps` times across the main uv domain
        (reference render_texture_filling.py:156-176)."""
        mainuv_size = main_params.get_size_of_uv()
        refuv_size = ref_params.get_size_of_uv()
        dimension = int(np.argmax(refuv_size))
        ref_scale = mainuv_size[dimension] / (steps * refuv_size[dimension])
        kernel_size = refuv_size * ref_scale
        coord = main_params.get_uv() / kernel_size
        coord_in_kernel = ((coord - np.int32(coord)) * kernel_size) \
            / ref_scale

        distance, nbr = _knn(coord_in_kernel,
                             ref_params.get_uv().reshape(-1, 2), Kc)
        w = 1.0 / (distance + 1e-8)
        w = w / np.sum(w, axis=-1, keepdims=True)
        return (w.astype(np.float32),
                ref_params.get_vertex_ind_of_uv()[nbr],
                main_params.get_vertex_ind_of_uv())
