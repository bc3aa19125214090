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

    # ---- ray-context fast path ----------------------------------------------
    def make_ray_context(self, params, rays_o, rays_d, near, far, **kw):
        """Bounds-only delegation for the renderer's near/far pre-pass."""
        return self.main_model.make_ray_context(
            params["main"], rays_o, rays_d, near, far, **kw)

    def bind_rays(self, params, rays_o, rays_d, near, far,
                  n_probes: int = 8, with_features: bool = True):
        """Ray-bound view: geometry + base color from the main model's
        candidate cache; edit masks and transferred color features are
        gathered into the SAME per-ray cache, so the paint/unpaint blend
        (reference texture_neumesh.py:96-115) runs as batched matmuls."""
        bound = self.main_model.bind_rays(
            params["main"], rays_o, rays_d, near, far, n_probes,
            with_features=with_features)
        if bound is None:
            return None
        return RayBoundTextureEditable(self, bound, params)

    def bind_rays_tiled(self, params, rays_o, rays_d, near, far,
                        tile: int, n_probes: int = 0,
                        max_candidates=None, with_features: bool = True):
        """Tile-shared binding for the HEADLINE surface serving path
        (VERDICT r2 #7): the main model's tile contexts + fused kernels
        drive the scan/secant (geometry is untouched by texture edits),
        and the edit-mask/edit-feature caches ride the same tile ids for
        the blended color query. Returns (bound, near, far) or None."""
        tb = self.main_model.bind_rays_tiled(
            params["main"], rays_o, rays_d, near, far, tile=tile,
            n_probes=n_probes, max_candidates=max_candidates,
            with_features=with_features)
        if tb is None:
            return None
        bound, near_b, far_b = tb
        return RayBoundTextureEditable(self, bound, params), near_b, far_b


class RayBoundTextureEditable:
    def __init__(self, editable: TextureEditableNeuMesh, bound, params):
        self.editable = editable
        self.bound = bound              # Ray/TileBoundNeuMesh (main)
        self.mesh_grid = editable.mesh_grid
        self.enable_nablas_input = editable.enable_nablas_input
        # surface_render probes `model.model.use_pallas` to choose the
        # fused-secant refinement; geometry comes from the main model
        self.model = bound.model
        main = editable.main_model
        ids = bound.ctx["ids"]                  # (R, C)
        n_verts = main.num_vertices
        # per-ray caches of the editing inputs (sentinel row appended)
        self._masks = []                        # (R, C) float
        self._efeat = []                        # (R, C, Fc)
        for i in range(len(editable.ref_models)):
            mask_ext = jnp.concatenate(
                [editable.main_editing_masks[i].astype(jnp.float32),
                 jnp.zeros((1,), jnp.float32)], axis=0)
            self._masks.append(mask_ext[ids])
            ef = params["edit_color_features"][i]
            ef_ext = jnp.concatenate(
                [ef, jnp.zeros((1, ef.shape[-1]), ef.dtype)], axis=0)
            self._efeat.append(ef_ext[ids])

    # ---- protocol delegation (geometry unchanged by texture edits)
    def forward_s(self, params):
        return self.bound.forward_s(params["main"])

    def compute_distance(self, params, xyz, K: int = 8):
        return self.bound.compute_distance(params["main"], xyz, K)

    def forward_density_only(self, params, xyz):
        return self.bound.forward_density_only(params["main"], xyz)

    def forward_with_nablas(self, params, xyz):
        return self.bound.forward_with_nablas(params["main"], xyz)

    def fused_secant(self, params, rays_o, rays_d, d_low, d_high,
                     f_low, f_high, n_iters: int = 6,
                     logit_tau: float = 0.0, d_low_w=None, d_high_w=None):
        """Secant refinement runs entirely on the main model's geometry
        (texture edits never move the surface)."""
        return self.bound.fused_secant(
            params["main"], rays_o, rays_d, d_low, d_high, f_low, f_high,
            n_iters=n_iters, logit_tau=logit_tau, d_low_w=d_low_w,
            d_high_w=d_high_w)

    def fused_locate(self, params, rays_o, rays_d, near, far,
                     n_steps: int = 24, n_secant: int = 6,
                     logit_tau: float = 0.0):
        """Surface root location on the main model's geometry."""
        return self.bound.fused_locate(
            params["main"], rays_o, rays_d, near, far,
            n_steps=n_steps, n_secant=n_secant, logit_tau=logit_tau)

    def forward(self, params, xyz, view_dirs):
        ed = self.editable
        main = ed.main_model
        mp = params["main"]
        b = self.bound
        x = b._flat(xyz)
        v = b._flat(view_dirs)

        if main.enable_nablas_input:
            density, nabla, d_emb, W, ft = main._ctx_density_and_nabla(
                mp, b.ctx, x, with_ft=True)
        else:
            ds, W = main._ctx_distance_parts(mp, b.ctx, x)
            feats = main._ctx_interp_feats(b.ctx, W)
            density, d_emb = main._density_from_interp(
                mp, ds, feats[..., :main.geometry_dim])
            ft = feats[..., main.geometry_dim:]
            nabla = None
        sdf = density[..., 0]
        blend_color = main._color_from_interp(mp, d_emb, v, ft, nabla)

        for i, ref_model in enumerate(ed.ref_models):
            m_at = self._masks[i]                       # (R, C)
            Wm = W * m_at[:, None, :]                   # (R, S, C)
            paint_w = jnp.sum(Wm, axis=-1)              # (R, S)
            paint_region = paint_w > 0
            # weights sum to 1, so unpaint share is the complement
            W_ref = Wm / (jnp.sum(Wm, axis=-1, keepdims=True) + 1e-8)

            if ed.rot_s_m is not None:
                R = ed.rot_s_m[i]
                ref_dir = v @ R.T
                ref_nabla = nabla @ R.T if nabla is not None else None
            else:
                ref_dir = v
                ref_nabla = nabla

            dt = ref_model.compute_dtype
            Wr = W_ref if dt is None else W_ref.astype(dt)
            ef = self._efeat[i] if dt is None else self._efeat[i].astype(dt)
            ft_ref = jnp.einsum("rsc,rcf->rsf", Wr, ef,
                                preferred_element_type=jnp.float32)
            ref_color = ref_model._color_from_interp(
                params["refs"][i], d_emb, ref_dir, ft_ref, ref_nabla)

            mixed = (blend_color * (1.0 - paint_w)[..., None]
                     + ref_color * paint_w[..., None])
            blend_color = jnp.where(paint_region[..., None], mixed,
                                    blend_color)

        return b._unflat(sdf), b._unflat(blend_color)


def make_editable_params(main_params, ref_params_list, edit_color_features):
    return {
        "main": main_params,
        "refs": list(ref_params_list),
        "edit_color_features": [jnp.asarray(f, jnp.float32)
                                for f in edit_color_features],
    }
