"""NeuMesh model (reference models/frameworks/neumesh/neumesh.py:16-273).

Disentangled mesh-based field: per-vertex geometry/color feature codes +
learnable indicator vectors/weight on a fixed mesh scaffold, decoded by two
small MLPs. Geometry input is the kNN-interpolated signed distance; color
input is [nabla?, d_emb, view_emb, ft_emb].

TPU design notes:
  - the mesh scaffold (vertices, normals, kNN grid tables) lives on the
    model object as device arrays closed over by jit (constant across
    training); learnable indicator_vector / features / MLPs live in params.
  - nablas: kNN selection is non-differentiable (the reference's detach
    semantics, models/mesh_grid.py:121-122); the density depends on the
    query point only through the scalar interpolated distance h, so
    nabla = dDensity/dh * grad_x h — one scalar-tangent JVP through the MLP
    plus the analytic grad of h. Twice-differentiable for eikonal.
  - the ray-context fast path (bind_rays / RayBoundNeuMesh) replaces
    per-sample HBM gathers with per-ray candidate caches and batched
    matmuls — see the block comment above make_ray_context.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...mesh.grid import MeshGrid
from ...nn import (
    get_embedder,
    linear_init,
    maybe_wnorm_apply,
    maybe_wnorm_apply_parts,
    softplus100,
    wnorm_linear_init,
)
from ...ops import interp


class NeuMesh:
    def __init__(
        self,
        mesh_grid: MeshGrid,
        D_density: int = 3,
        D_color: int = 4,
        W: int = 256,
        geometry_dim: int = 32,
        color_dim: int = 32,
        multires_view: int = 4,
        multires_d: int = 8,
        multires_fg: int = 2,
        multires_ft: int = 2,
        enable_nablas_input: bool = False,
        input_view_dim: int = 3,
        input_d_dim: int = 1,
        ln_s: float = 0.2996,
        speed_factor: float = 1.0,
        learn_indicator_weight: bool = True,
        compute_dtype=None,
        use_pallas: bool = False,
        max_candidates: int = 96,
        pallas_sample_block: int = 256,
        f32_layers: tuple = (),
        scan_candidates: int = 0,
        tile_kp_per_probe: int = 0,
        use_fused_locate: bool = False,
        secant_full_precision: bool = True,
        secant_tiles_per_program: int = 1,
        scan_knn_k: int = 0,
        full_tiles_per_program: int = 1,
        tile_cell_budget: int = 0,
        secant_rebracket: bool = True,
        secant_frozen_knn: bool = False,
        eval_candidates: int = 0,
    ):
        self.mesh_grid = mesh_grid
        self.num_vertices = mesh_grid.get_number_of_vertices()
        self.D_density = D_density
        self.D_color = D_color
        self.W = W
        self.geometry_dim = geometry_dim
        self.color_dim = color_dim
        self.speed_factor = speed_factor
        self.ln_s_init = ln_s
        self.learn_indicator_weight = learn_indicator_weight
        self.enable_nablas_input = enable_nablas_input
        # optional low-precision matmul mode for MLPs + feature interp
        # (kNN/distance math always stays f32); None = full f32 parity
        self.compute_dtype = compute_dtype
        # fused Pallas candidate-field kernel for the ray-bound FORWARD
        # path (rendering/serving; training keeps the differentiable XLA
        # path) — see ops/pallas_kernels.py
        self.use_pallas = use_pallas
        # samples per fused-kernel program: the kernel's per-program cost
        # has a fixed component (grid step + DMA issue), so small blocks
        # at small ray batches leave the chip idle; large blocks need
        # VMEM for the (sblk, C) selection temporaries
        self.pallas_sample_block = pallas_sample_block
        # per-ray candidate cache size (ray-context compaction): smaller is
        # faster (every per-sample tensor scales with it) but weakens kNN
        # coverage for rays grazing dense regions
        self.max_candidates = max_candidates
        # selective-f32 serving: layer tags kept at f32 weights/passes
        # when compute_dtype is low precision (closes the bf16 parity
        # gap; see RayBoundNeuMesh._field_weights for the tag set)
        self.f32_layers = tuple(f32_layers)
        # surface-mode scan/secant candidate budget: when >0 and the
        # context is proximity-RANKED (tile contexts rank candidates by
        # distance to the tile's centroid segment before compaction),
        # the distance-proxy scan and secant refinement run against only
        # the first `scan_candidates` candidates — the nearest ones —
        # cutting the VPU-bound candidate math of the dominant kernels;
        # the re-bracket and final color query keep the full set.
        self.scan_candidates = scan_candidates
        # tile-context build budget: candidates taken per probe cell
        # (cell lists are sorted by distance from the cell center, so a
        # prefix keeps the nearest; 0 = the grid's full Kp). Every
        # ctx-build stage (gathers + both sorts) scales with it.
        self.tile_kp_per_probe = tile_kp_per_probe
        # opt-in single-program-per-tile surface root location
        # (pallas_kernels.surface_locate) — slower than the composed
        # scan+secant path at large ray batches on v5e; see
        # render/ray_casting.py for the measurement
        self.use_fused_locate = use_fused_locate
        # False: the secant refinement's density evals drop the
        # f32_layers overrides (root positions tolerate bf16; the final
        # sdf/rgb eval keeps the selective-f32 weights) — the f32 first
        # layer otherwise runs in EVERY secant iteration
        self.secant_full_precision = secant_full_precision
        # tiles batched per fused-secant kernel program: per-tile
        # candidate interpolation, ONE grouped density-MLP matmul per
        # iteration (bit-identical results; see
        # ops/pallas_kernels.py::_secant_kernel). Measured SLOWER than
        # the default on v5e at the production config (g4 2.11 / g8 2.06
        # vs g1 2.16 Mrays/s): the refinement is bound by the per-tile
        # VPU interp, not the MLP matmuls, and larger blocks hurt
        # double-buffering. Kept opt-in for small-tile configs where the
        # per-program fixed cost dominates.
        self.secant_tiles_per_program = secant_tiles_per_program
        # kNN size of the surface-scan DISTANCE PROXY only (0 = the
        # model's k=8). The sign-change scan just brackets the root —
        # any field with the same zero crossing works — and the top-k
        # selection passes are ~half the scan kernel's VPU cost, so a
        # smaller scan-only k (k=1 = nearest tangent plane) trades
        # bracket placement (re-anchored on the true density by the
        # half-step-widened re-bracket) for scan throughput. Density,
        # secant, and color interpolation always keep the model's k.
        self.scan_knn_k = scan_knn_k
        # tiles batched per program of the FINAL full-field launch
        # (ops/pallas_kernels.py::_field_kernel group): the surface
        # render's one-sample-per-ray eval runs T=128-row matmuls that
        # underutilize the MXU; rows are independent, so batching tiles
        # is bit-exact. Measured NEUTRAL-to-SLOWER on v5e at the
        # production config (g4 2.566 / g8 2.445 vs g1 2.570 Mrays/s):
        # like the secant group, per-program VMEM growth hurts
        # double-buffering more than the fatter matmuls help. Kept
        # opt-in for small-batch serving.
        self.full_tiles_per_program = full_tiles_per_program
        # cell-level pre-rank budget of the tile context build (see
        # make_tile_context): expand candidate lists only for the
        # `tile_cell_budget` unique cells nearest the tile's segment.
        # 0 = off (expand every probe's cell).
        self.tile_cell_budget = tile_cell_budget
        # False skips the density re-bracket of the proxy scan (the
        # secant then starts from the proxy bracket and its proxy f
        # values, self-correcting from the first density evaluation) —
        # one fewer in-kernel density pass per frame. Measured on v5e at
        # the production config: noRB + 4 iters = 3.46 vs 3.28 Mrays/s
        # but GT PSNR -0.26 dB on the gate scene (proxy-seeded brackets
        # occasionally clamp the root a half-step off) — NOT the serving
        # default; the GT budget is reserved for DTU parity.
        self.secant_rebracket = secant_rebracket
        # freeze the secant's per-ray top-k candidate selection at the
        # bracket midpoint (all refinement evals lie within ~one scan
        # step, so the 8-NN set is near-identical across them); the
        # per-eval interpolation chain then runs on k compacted columns
        # instead of all C candidates (ops/pallas_kernels.py::
        # _secant_kernel frozen). Opt-in: quality-gated at -0.045 dB
        # but a throughput WASH at the serving config's 3 secant iters
        # (the secant is too small a slice of the frame); may pay at
        # higher iteration counts.
        self.secant_frozen_knn = secant_frozen_knn
        # nearest-prefix candidate budget of the fused density/color
        # sample evaluations (the volume path's hot kernels): when >0 and
        # the tile context is proximity-RANKED, forward_density_only /
        # forward / forward_full on the fused route run against only the
        # first `eval_candidates` (nearest) candidates — every
        # per-sample VPU op and the feature matmul scale with C. The
        # volume samples lie ON the ranked segment, so the prefix keeps
        # the true 8-NN almost always; the scan/secant analog is
        # scan_candidates. Serving knob, quality-gated (volume_bf16).
        self.eval_candidates = eval_candidates

        # f32 (compute_dtype=None) is the parity/training mode: exact
        # per-frequency sin/cos. Low-precision serving enables the
        # double-angle recursion (~3e-5 abs at multires=8 — below the
        # bf16 cast error it accompanies; ADVICE r2).
        exact = compute_dtype is None
        self.embed_fn_d, self.input_ch_d = get_embedder(
            multires_d, input_dim=input_d_dim, exact=exact)
        self.embed_fn_view, self.input_ch_view = get_embedder(
            multires_view, input_dim=input_view_dim, exact=exact)
        self.embed_fn_fg, self.input_ch_fg = get_embedder(
            multires_fg, input_dim=geometry_dim, exact=exact)
        self.embed_fn_ft, self.input_ch_ft = get_embedder(
            multires_ft, input_dim=color_dim, exact=exact)

        self.input_ch_pts = self.input_ch_d + self.input_ch_fg
        self.input_ch_color = (self.input_ch_view + self.input_ch_ft
                               + self.input_ch_d)
        if enable_nablas_input:
            self.input_ch_color += 3

    # ------------------------------------------------------------------
    def init(self, key) -> dict:
        keys = iter(jax.random.split(key, self.D_density + self.D_color + 8))
        params = {
            "ln_s": jnp.asarray([self.ln_s_init], jnp.float32),
            "geometry_features": jax.random.normal(
                next(keys), (self.num_vertices, self.geometry_dim),
                jnp.float32),
            "color_features": jax.random.normal(
                next(keys), (self.num_vertices, self.color_dim), jnp.float32),
            "indicator_vector": self.mesh_grid.vertex_normals.astype(
                jnp.float32),
        }
        if self.learn_indicator_weight:
            params["indicator_weight_raw"] = jnp.asarray([-2.0], jnp.float32)

        # geometry MLP: D_density weight-norm hidden layers + density head
        # (reference neumesh.py:76-86,101)
        pts = [wnorm_linear_init(next(keys), self.input_ch_pts, self.W)]
        for _ in range(self.D_density - 1):
            pts.append(wnorm_linear_init(next(keys), self.W, self.W))
        params["pts_linears"] = pts
        params["density_linear"] = wnorm_linear_init(next(keys), self.W, 1)

        # color MLP: D_color plain layers + rgb head (reference :93-102)
        views = [linear_init(next(keys), self.input_ch_color, self.W)]
        for _ in range(self.D_color - 1):
            views.append(linear_init(next(keys), self.W, self.W))
        params["views_linears"] = views
        params["color_linear"] = linear_init(next(keys), self.W, 3)
        return params

    # ------------------------------------------------------------------
    def forward_s(self, params):
        return jnp.exp(params["ln_s"][0] * self.speed_factor)

    def forward_indicator_weight(self, params):
        if self.learn_indicator_weight:
            return jax.nn.sigmoid(params["indicator_weight_raw"][0])
        return 0.1

    def compute_distance(self, params, xyz, K: int = 8):
        """(ds (..., 1), indices (..., K), weights (..., K))
        (reference neumesh.py:262-273)."""
        return self.mesh_grid.compute_distance(
            xyz,
            indicator_vector=params["indicator_vector"],
            indicator_weight=self.forward_indicator_weight(params),
            K=K)

    # ------------------------------------------------------------------
    def _density_from_parts(self, params, ds, indices, weights):
        """Geometry MLP on (embedded distance, embedded interpolated
        geometry feature) (reference neumesh.py:204-221)."""
        d_emb = self.embed_fn_d(ds)
        fg = interp.interpolate_features(
            params["geometry_features"], indices, weights)
        fg_emb = self.embed_fn_fg(fg)
        h = softplus100(maybe_wnorm_apply_parts(
            params["pts_linears"][0], [d_emb, fg_emb]))
        for p in params["pts_linears"][1:]:
            h = softplus100(maybe_wnorm_apply(p, h))
        density = maybe_wnorm_apply(params["density_linear"], h)
        return density, d_emb

    def _color_from_parts(self, params, d_emb, view_dirs, indices, weights,
                          nabla: Optional[jnp.ndarray]):
        """Color MLP (reference neumesh.py:239-260)."""
        view_emb = self.embed_fn_view(view_dirs)
        parts = []
        if self.enable_nablas_input:
            parts.append(nabla)
        parts.append(d_emb)
        parts.append(view_emb)
        ft = interp.interpolate_features(
            params["color_features"], indices, weights)
        parts.append(self.embed_fn_ft(ft))
        h = jnp.maximum(maybe_wnorm_apply_parts(
            params["views_linears"][0], parts), 0.0)
        for p in params["views_linears"][1:]:
            h = jnp.maximum(maybe_wnorm_apply(p, h), 0.0)
        return jax.nn.sigmoid(maybe_wnorm_apply(params["color_linear"], h))

    # ------------------------------------------------------------------
    def _knn(self, params, xyz, K: int = 8):
        sq, idx = self.mesh_grid.knn(xyz, K)
        return interp.knn_weights(sq), idx

    def _density_and_nabla(self, params, xyz, indices, weights):
        """Density + d(density)/d(xyz) with fixed kNN selection,
        twice-differentiable (eikonal).

        Chain rule: the density depends on xyz ONLY through the scalar
        interpolated distance h (features use detached kNN weights), so
        nabla = dDensity/dh * grad_x h — one scalar-tangent JVP through the
        MLP plus the analytic grad of h, instead of per-point reverse
        passes (reference autograd.grad, neumesh.py:225-232)."""
        indices = jax.lax.stop_gradient(indices)
        weights = jax.lax.stop_gradient(weights)
        nbr_pts = self.mesh_grid.vertices[indices]
        nbr_ind = params["indicator_vector"][indices]
        w1 = self.forward_indicator_weight(params)
        ds, dh_dx = interp.interpolated_distance_and_grad(
            xyz, nbr_pts, nbr_ind, weights, w1)

        def dens_of_ds(d):
            return self._density_from_parts(params, d, indices, weights)

        (density, d_emb), (dD_dh, _) = jax.jvp(
            dens_of_ds, (ds,), (jnp.ones_like(ds),))
        nabla = dD_dh * dh_dx
        return density, nabla, d_emb

    # ------------------------------------------------------------------
    # model protocol
    def forward(self, params, xyz, view_dirs):
        """(sdf (...,), rgb (..., 3)) (reference neumesh.py:113-138)."""
        ds, indices, weights = self.compute_distance(params, xyz)
        if self.enable_nablas_input:
            density, nabla, d_emb = self._density_and_nabla(
                params, xyz, indices, weights)
        else:
            density, d_emb = self._density_from_parts(
                params, ds, indices, weights)
            nabla = None
        color = self._color_from_parts(
            params, d_emb, view_dirs, indices, weights, nabla)
        return density[..., 0], color

    def forward_density_only(self, params, xyz):
        ds, indices, weights = self.compute_distance(params, xyz)
        density, _ = self._density_from_parts(params, ds, indices, weights)
        return density[..., 0]

    def forward_with_nablas(self, params, xyz):
        weights, indices = self._knn(params, xyz)
        density, nabla, _ = self._density_and_nabla(
            params, xyz, indices, weights)
        return density[..., 0], nabla

    # ------------------------------------------------------------------
    # Ray-context fast path (TPU-first).
    #
    # The per-sample hot loop above gathers (K,3)/(K,F) rows from HBM for
    # every sample — hostile to the TPU memory system. Instead, we gather a
    # per-RAY candidate set ONCE (union of the candidate lists of a few
    # probe cells along the segment) and express kNN selection, the
    # interpolated distance, and feature interpolation over that set as
    # batched matmuls + elementwise math:
    #
    #   d2   = |x|^2 + |v_c|^2 - 2 x.v_c            (batched matmul)
    #   W    = stop_grad(top-8 mask * 1/d, normalised)   (R, S, C)
    #   h    = sum_c W_c (w1 (x.n_c - v_c.n_c) + d^3) / (w1 + d)
    #   f    = W @ features_ctx                      (batched matmul, MXU)
    #
    # using <x-v, (n w1 + (x-v) d)/(w1+d)> = (w1 (x.n - v.n) + d^3)/(w1+d).
    # No per-sample gathers; weights detached exactly as the reference
    # detaches its kNN results (models/mesh_grid.py:121-122).
    # ------------------------------------------------------------------

    def make_ray_context(self, params, rays_o, rays_d, near, far,
                         n_probes: int = 8, kp_per_probe=None,
                         with_features: bool = True, max_candidates=None,
                         for_bounds: bool = False):
        """Build the per-ray candidate cache. rays_o/d: (R, 3);
        near/far: (R, 1). Returns a dict of (R, C, ...) arrays or None when
        no candidate grid is available (brute mode).

        kp_per_probe (default: the grid's full Kp) can cap the candidates
        taken per probe cell (lists are sorted by distance from the cell
        center) — but slicing below the grid's validated Kp weakens the
        coverage guarantee; leave None unless profiling demands it.

        for_bounds=True returns only {"pts"} WITHOUT dedup/compaction —
        enough for candidate_bounded_near_far (min/max over candidates are
        unaffected by duplicates), skipping the sort + rank + top_k."""
        grid = self.mesh_grid.grid
        if grid is None:
            return None
        R = rays_o.shape[0]
        t = jnp.linspace(0.0, 1.0, n_probes)
        z = near + (far - near) * t                      # (R, P)
        probes = rays_o[:, None, :] + z[..., None] * rays_d[:, None, :]

        dims = jnp.asarray(grid.dims)
        cell = jnp.floor((probes - grid.origin) * grid.inv_h).astype(
            jnp.int32)
        cell = jnp.clip(cell, 0, dims - 1)
        flat = (cell[..., 0] * dims[1] + cell[..., 1]) * dims[2] \
            + cell[..., 2]                               # (R, P)
        # slice the candidate table BEFORE the row gather (see
        # make_tile_context): Kp/kp x fewer gather bytes
        kp = (min(kp_per_probe, grid.Kp) if kp_per_probe is not None
              else grid.Kp)
        cand = grid.cand_idx[:, :kp][grid.cell_row[flat]]  # (R, P, kp)
        ids = cand.reshape(R, -1)                        # (R, C)
        n_verts = self.num_vertices

        if for_bounds:
            verts_ext = jnp.concatenate(
                [self.mesh_grid.vertices,
                 jnp.full((1, 3), 1e9, jnp.float32)], axis=0)
            return {"pts": verts_ext[ids]}

        if max_candidates is None:
            max_candidates = self.max_candidates
        ids = jnp.sort(ids, axis=-1)
        dup = jnp.concatenate(
            [jnp.zeros((R, 1), bool), ids[:, 1:] == ids[:, :-1]], axis=-1)
        ids = jnp.where(dup, n_verts, ids)               # sentinel out dups

        # compact: adjacent probes share cells, so many slots are duplicate
        # sentinels; keep the max_candidates candidates CLOSEST to the ray
        # segment (cuts the (R, S, C) working set of every sample query)
        if max_candidates is not None and ids.shape[1] > max_candidates:
            verts_all = jnp.concatenate(
                [self.mesh_grid.vertices,
                 jnp.full((1, 3), 1e9, jnp.float32)], axis=0)
            vp = verts_all[ids]                          # (R, C, 3)
            # segment distance via |ov|^2 - (2 t - u) u (see
            # make_tile_context): no (R, C, 3) closest-point pass, exact
            # f32 broadcasts instead of a bf16-MXU einsum
            ov0 = vp[..., 0] - rays_o[:, None, 0]
            ov1 = vp[..., 1] - rays_o[:, None, 1]
            ov2 = vp[..., 2] - rays_o[:, None, 2]
            ovov = ov0 * ov0 + ov1 * ov1 + ov2 * ov2
            t_c = (ov0 * rays_d[:, None, 0] + ov1 * rays_d[:, None, 1]
                   + ov2 * rays_d[:, None, 2])
            u = jnp.clip(t_c, near, far)
            d2_seg = ovov - (2.0 * t_c - u) * u
            # sort ids WITH the distance keys (multi-operand sort) and
            # slice — top_k + take_along_axis gathers are ~5 GB/s on TPU
            _, ids = jax.lax.sort((d2_seg, ids), dimension=-1, num_keys=1)
            ids = ids[:, :max_candidates]

        return self._pack_ctx(params, ids, with_features)

    def _pack_ctx(self, params, ids, with_features: bool):
        """Gather the per-(ray|tile) candidate tables for compacted ids."""
        verts_ext = jnp.concatenate(
            [self.mesh_grid.vertices,
             jnp.full((1, 3), 1e9, jnp.float32)], axis=0)
        ind_ext = jnp.concatenate(
            [params["indicator_vector"],
             jnp.zeros((1, 3), jnp.float32)], axis=0)

        pts = verts_ext[ids]                             # (R, C, 3)
        ind = ind_ext[ids]                               # (R, C, 3)
        ctx = {
            "ids": ids,
            "pts": pts,
            "pp": jnp.sum(pts * pts, axis=-1),           # (R, C)
            "ind": ind,
            "vn": jnp.sum(pts * ind, axis=-1),           # (R, C)
        }
        if with_features:
            # one concatenated table -> one gather; forward passes consume
            # geometry+color features in a SINGLE batched matmul
            feat_ext = jnp.concatenate(
                [jnp.concatenate([params["geometry_features"],
                                  params["color_features"]], axis=-1),
                 jnp.zeros((1, self.geometry_dim + self.color_dim),
                           jnp.float32)], axis=0)
            ctx["feat"] = feat_ext[ids]                  # (R, C, Fg + Fc)
        return ctx

    # ------------------------------------------------------------------
    # Tile-shared ray contexts (TPU-first, render path).
    #
    # Coherent rays (image rendering) probe nearly identical grid cells,
    # so per-ray candidate caches are ~tile-x redundant: the HBM row
    # gathers that build them (the slowest primitive on TPU, ~5 GB/s
    # fusions) dominate the context build. Grouping `tile` consecutive
    # rays around ONE shared candidate set cuts the gather volume by the
    # tile factor, aligns the candidate axis to the 128-lane vector unit,
    # and turns per-ray feature interpolation into one real (T*S, C) @
    # (C, F) matmul per tile on the MXU. Probe depths are staggered
    # across the rays of a tile, so the union covers tile*n_probes
    # distinct depths of the [near, far] range — denser than the per-ray
    # path, which is why a single-phase bind (bounds from the same ctx)
    # is safe here.
    # ------------------------------------------------------------------

    def make_tile_context(self, params, rays_o, rays_d, near, far,
                          tile: int, n_probes: int = 16,
                          kp_per_probe=None, with_features: bool = True,
                          max_candidates=None):
        """Tile-shared candidate cache. rays_o/d: (R, 3) with consecutive
        rays grouped into tiles of `tile`; near/far: (R, 1). Returns a dict
        of (R//tile, C, ...) arrays or None in brute mode."""
        grid = self.mesh_grid.grid
        if grid is None:
            return None
        R = rays_o.shape[0]
        T = tile
        Rt = R // T
        n_verts = self.num_vertices
        if max_candidates is None:
            max_candidates = max(self.max_candidates, 128)

        # staggered probe depths: ray r of a tile probes at fractions
        # (p + r/T)/P, so the tile union covers T*P distinct depths
        r_in_tile = (jnp.arange(R) % T).astype(jnp.float32)
        t = (jnp.arange(n_probes, dtype=jnp.float32)[None, :]
             + r_in_tile[:, None] / T) / n_probes        # (R, P)
        z = near + (far - near) * t
        probes = rays_o[:, None, :] + z[..., None] * rays_d[:, None, :]

        dims = jnp.asarray(grid.dims)
        cell = jnp.floor((probes - grid.origin) * grid.inv_h).astype(
            jnp.int32)
        cell = jnp.clip(cell, 0, dims - 1)
        flat = (cell[..., 0] * dims[1] + cell[..., 1]) * dims[2] \
            + cell[..., 2]                               # (R, P)
        # slice the candidate table BEFORE the row gather: fetching full
        # Kp rows and slicing after pays Kp/kp x the gather bytes (the
        # slowest primitive on TPU)
        kp = (min(kp_per_probe, grid.Kp) if kp_per_probe is not None
              else grid.Kp)

        cb = self.tile_cell_budget
        if cb and cb < T * flat.shape[-1]:
            # cell-level pre-rank: a tile's T*P probes land in only a
            # handful of UNIQUE grid cells (coherent pixel-block rays),
            # so dedup + rank the CELLS by segment distance of their
            # centers first and expand only the `cb` nearest cells'
            # candidate lists — the downstream id-dedup sort, ranking
            # gather, and rank sort then run on cb*kp slots instead of
            # T*P*kp (8-16x smaller at the serving config). Duplicate
            # cells get an inf key; if a tile has fewer than cb unique
            # cells the dups re-enter, produce duplicate candidate ids,
            # and are sentineled by the id-dedup below.
            cells = flat.reshape(Rt, -1)                 # (Rt, T*P)
            cells = jnp.sort(cells, axis=-1)
            dupc = jnp.concatenate(
                [jnp.zeros((Rt, 1), bool), cells[:, 1:] == cells[:, :-1]],
                axis=-1)
            d12 = dims[1] * dims[2]
            c0 = cells // d12
            c1 = (cells // dims[2]) % dims[1]
            c2 = cells % dims[2]
            h = 1.0 / grid.inv_h
            ccx = grid.origin[0] + (c0.astype(jnp.float32) + 0.5) * h
            ccy = grid.origin[1] + (c1.astype(jnp.float32) + 0.5) * h
            ccz = grid.origin[2] + (c2.astype(jnp.float32) + 0.5) * h
            o_cc = jnp.mean(rays_o.reshape(Rt, T, 3), axis=1)
            d_cc = jnp.mean(rays_d.reshape(Rt, T, 3), axis=1)
            d_cc = d_cc / jnp.maximum(
                jnp.linalg.norm(d_cc, axis=-1, keepdims=True), 1e-12)
            nr_t = jnp.min(near.reshape(Rt, T), axis=1)[:, None]
            fr_t = jnp.max(far.reshape(Rt, T), axis=1)[:, None]
            ov0 = ccx - o_cc[:, None, 0]
            ov1 = ccy - o_cc[:, None, 1]
            ov2 = ccz - o_cc[:, None, 2]
            t_cc = (ov0 * d_cc[:, None, 0] + ov1 * d_cc[:, None, 1]
                    + ov2 * d_cc[:, None, 2])
            u_cc = jnp.clip(t_cc, nr_t, fr_t)
            d2c = (ov0 * ov0 + ov1 * ov1 + ov2 * ov2
                   - (2.0 * t_cc - u_cc) * u_cc)
            key = jnp.where(dupc, jnp.inf, d2c)
            _, cells_sel = jax.lax.sort((key, cells), dimension=-1,
                                        num_keys=1)
            flat = cells_sel[:, :cb]                     # (Rt, cb)

        cand = grid.cand_idx[:, :kp][grid.cell_row[flat]]
        ids = cand.reshape(Rt, -1)                       # (Rt, C0)

        ids = jnp.sort(ids, axis=-1)
        dup = jnp.concatenate(
            [jnp.zeros((Rt, 1), bool), ids[:, 1:] == ids[:, :-1]], axis=-1)
        ids = jnp.where(dup, n_verts, ids)               # sentinel out dups

        ranked = ids.shape[1] > max_candidates
        if ranked:
            # rank by distance to the tile's centroid segment
            o_c = jnp.mean(rays_o.reshape(Rt, T, 3), axis=1)     # (Rt, 3)
            d_c = jnp.mean(rays_d.reshape(Rt, T, 3), axis=1)
            d_c = d_c / jnp.maximum(
                jnp.linalg.norm(d_c, axis=-1, keepdims=True), 1e-12)
            near_t = jnp.min(near.reshape(Rt, T), axis=1)        # (Rt,)
            far_t = jnp.max(far.reshape(Rt, T), axis=1)

            verts_all = jnp.concatenate(
                [self.mesh_grid.vertices,
                 jnp.full((1, 3), 1e9, jnp.float32)], axis=0)
            vp = verts_all[ids]                          # (Rt, C0, 3)
            # segment distance without materialising the (Rt, C0, 3)
            # closest points: |ov - u d|^2 = |ov|^2 - 2 u (ov.d) + u^2
            # for unit d and u = clip(ov.d, near, far). Per-coordinate
            # VPU broadcasts (exact f32), not einsum (bf16 MXU default)
            ov0 = vp[..., 0] - o_c[:, None, 0]
            ov1 = vp[..., 1] - o_c[:, None, 1]
            ov2 = vp[..., 2] - o_c[:, None, 2]
            ovov = ov0 * ov0 + ov1 * ov1 + ov2 * ov2
            t_c = (ov0 * d_c[:, None, 0] + ov1 * d_c[:, None, 1]
                   + ov2 * d_c[:, None, 2])
            u = jnp.clip(t_c, near_t[:, None], far_t[:, None])
            d2_seg = ovov - (2.0 * t_c - u) * u
            _, ids = jax.lax.sort((d2_seg, ids), dimension=-1, num_keys=1)
            ids = ids[:, :max_candidates]

        ctx = self._pack_ctx(params, ids, with_features)
        # candidates stay in proximity order after the rank sort (no
        # re-sort by id) -> prefix slices are nearest-first, enabling the
        # scan_candidates fast path
        ctx["_ranked"] = ranked
        return ctx

    def bind_rays_tiled(self, params, rays_o, rays_d, near, far,
                        tile: int, n_probes: int = 0,
                        max_candidates=None, with_features: bool = True):
        """Single-phase tile binding: build ONE tile-shared candidate cache
        over [near, far], tighten near/far per ray from the same candidate
        geometry, and return (bound_model, near, far). Returns None when no
        grid exists, tile <= 1, or the ray count is not a tile multiple."""
        if self.mesh_grid.grid is None or tile <= 1:
            return None
        if not n_probes:
            # the tile union covers tile*n_probes staggered depths, so the
            # per-ray probe count can shrink as tiles grow; every ctx-build
            # stage (gathers, dedup sort, rank sort) scales with
            # tile*n_probes*Kp, and 256 union depths keep the probe
            # spacing far below a grid cell
            n_probes = int(min(16, max(2, 256 // tile)))
        prefix = rays_o.shape[:-1]
        ro = rays_o.reshape(-1, 3)
        rd = rays_d.reshape(-1, 3)
        if ro.shape[0] % tile:
            return None
        nr = near.reshape(-1, 1)
        fr = far.reshape(-1, 1)
        ctx = self.make_tile_context(
            params, ro, rd, nr, fr, tile, n_probes,
            kp_per_probe=self.tile_kp_per_probe or None,
            with_features=with_features, max_candidates=max_candidates)
        near_new, far_new = candidate_bounded_near_far_tiled(
            ctx, ro, rd, nr, fr, tile)
        return (TileBoundNeuMesh(self, ctx, prefix, tile),
                near_new.reshape(near.shape), far_new.reshape(far.shape))

    def _ctx_distance_parts(self, params, ctx, xyz, K: int = 8,
                            want_grad: bool = False):
        """xyz: (R, S, 3) -> (ds (R, S, 1), W (R, S, C) detached kNN
        weights[, dh (R, S, 3)]). ds is analytic in xyz/indicator params.

        want_grad=True additionally returns the closed-form spatial
        gradient of the interpolated distance,

            dh = A @ n + (sum_c B_c) x - B @ v,
            A_c = W_c w1 / (w1 + d_c)
            B_c = W_c (3 d_c^2 (w1 + d_c) - term_c) / ((w1 + d_c)^2 d_c)

        computed in the same forward sweep — much cheaper than a VJP
        re-pass over the (R, S, C) chain, and still differentiable w.r.t.
        params/xyz for the eikonal double-backward."""
        w1 = self.forward_indicator_weight(params)
        # NOTE: xv/xn are computed as per-coordinate VPU broadcasts, NOT
        # einsums. On TPU, f32 einsums run on the MXU with bf16 inputs by
        # default (JAX Precision.DEFAULT), and the resulting ~1e-2 absolute
        # error in x.v corrupts d2 = |x|^2 + |v|^2 - 2 x.v (a catastrophic
        # cancellation: d2 is ~1e-3 while the terms are ~4), flipping kNN
        # selection and occasionally producing near-zero d2 for candidates
        # ~0.05 away. The broadcast form is exact f32.
        x0, x1, x2 = xyz[..., 0:1], xyz[..., 1:2], xyz[..., 2:3]
        pts, ind = ctx["pts"], ctx["ind"]
        xv = (x0 * pts[:, None, :, 0] + x1 * pts[:, None, :, 1]
              + x2 * pts[:, None, :, 2])                 # (R, S, C)
        xx = jnp.sum(xyz * xyz, axis=-1)                 # (R, S)
        d2 = xx[..., None] + ctx["pp"][:, None, :] - 2.0 * xv
        d2 = jnp.maximum(d2, 0.0)

        # K-th-smallest threshold via K masked-min passes: ~2.7x faster on
        # TPU than lax.top_k's sort-based lowering at (R, S, C) shapes.
        # A tiny index-proportional relative perturbation breaks exact
        # distance ties deterministically (lowest index wins — the same
        # stable tie-break as lax.top_k / the brute kNN), so each pass
        # consumes exactly one candidate and the final mask selects
        # exactly K.
        d2_sg = jax.lax.stop_gradient(d2)
        iota = jnp.arange(d2.shape[-1], dtype=jnp.float32) * 2e-7
        d2_tb = d2_sg * (1.0 + iota)
        cur = d2_tb
        thresh = None
        for _ in range(K):
            thresh = jnp.min(cur, axis=-1, keepdims=True)  # (R, S, 1)
            cur = jnp.where(cur <= thresh, jnp.inf, cur)
        mask = d2_tb <= thresh
        w_raw = mask * (1.0 / (jnp.sqrt(d2_sg) + 1e-7))
        W = w_raw / jnp.sum(w_raw, axis=-1, keepdims=True)
        W = jax.lax.stop_gradient(W)

        d = jnp.sqrt(jnp.maximum(d2, 1e-20))             # analytic
        xn = (x0 * ind[:, None, :, 0] + x1 * ind[:, None, :, 1]
              + x2 * ind[:, None, :, 2])                 # (R, S, C)
        inv = 1.0 / (w1 + d)
        term = w1 * (xn - ctx["vn"][:, None, :]) + d * d2
        ds = jnp.sum(W * term * inv, axis=-1, keepdims=True)  # (R, S, 1)
        if not want_grad:
            return ds, W
        A = W * (w1 * inv)                               # (R, S, C)
        B = W * (3.0 * d2 * (w1 + d) - term) * inv * inv / d
        dh = jnp.stack(
            [jnp.sum(A * ind[:, None, :, k] - B * pts[:, None, :, k],
                     axis=-1)
             for k in range(3)], axis=-1) \
            + jnp.sum(B, axis=-1, keepdims=True) * xyz
        return ds, W, dh

    def _density_from_interp(self, params, ds, fg):
        """Geometry MLP on (embedded ds, embedded pre-interpolated fg)."""
        dt = self.compute_dtype
        d_emb = self.embed_fn_d(ds)
        # wide feature embedding computed in the low dtype (halves the
        # sin/cos + activation HBM traffic); d_emb stays f32 (geometry)
        fg_emb = self.embed_fn_fg(fg if dt is None else fg.astype(dt))
        h = softplus100(maybe_wnorm_apply_parts(
            params["pts_linears"][0], [d_emb, fg_emb], dt))
        for p in params["pts_linears"][1:]:
            h = softplus100(maybe_wnorm_apply(p, h, dt))
        density = maybe_wnorm_apply(params["density_linear"], h, dt)
        if dt is not None:
            density = density.astype(jnp.float32)
        return density, d_emb

    def _ctx_interp_feats(self, ctx, W, lo=None, hi=None):
        """One batched matmul W @ feat[..., lo:hi] -> (R, S, F)."""
        dt = self.compute_dtype
        feat = ctx["feat"]
        if lo is not None or hi is not None:
            feat = feat[..., lo:hi]
        Wm = W if dt is None else W.astype(dt)
        fm = feat if dt is None else feat.astype(dt)
        # f32 mode is the parity mode: force true-f32 MXU passes (TPU
        # default would silently truncate the inputs to bf16)
        return jnp.einsum("rsc,rcf->rsf", Wm, fm,
                          preferred_element_type=jnp.float32,
                          precision=None if dt is not None else "highest")

    def _ctx_density(self, params, ctx, ds, W):
        fg = self._ctx_interp_feats(ctx, W, hi=self.geometry_dim)
        return self._density_from_interp(params, ds, fg)

    def _ctx_density_and_nabla(self, params, ctx, xyz, with_ft=False):
        """(density, nabla, d_emb, W, ft-or-None). with_ft=True also
        interpolates the color features in the SAME batched matmul as the
        geometry features (the forward path needs both)."""
        ds, W, dh_dx = self._ctx_distance_parts(
            params, ctx, xyz, want_grad=True)

        if with_ft:
            feats = self._ctx_interp_feats(ctx, W)
            fg = feats[..., :self.geometry_dim]
            ft = feats[..., self.geometry_dim:]
        else:
            fg = self._ctx_interp_feats(ctx, W, hi=self.geometry_dim)
            ft = None

        def dens_of_ds(d):
            return self._density_from_interp(params, d, fg)

        (density, d_emb), (dD_dh, _) = jax.jvp(
            dens_of_ds, (ds,), (jnp.ones_like(ds),))
        nabla = dD_dh * dh_dx
        return density, nabla, d_emb, W, ft

    def _color_from_interp(self, params, d_emb, view_dirs, ft, nabla):
        dt = self.compute_dtype
        view_emb = self.embed_fn_view(view_dirs)
        parts = []
        if self.enable_nablas_input:
            parts.append(nabla)
        parts.append(d_emb)
        parts.append(view_emb)
        parts.append(self.embed_fn_ft(ft if dt is None else ft.astype(dt)))
        h = jnp.maximum(maybe_wnorm_apply_parts(
            params["views_linears"][0], parts, dt), 0.0)
        for p in params["views_linears"][1:]:
            h = jnp.maximum(maybe_wnorm_apply(p, h, dt), 0.0)
        logits = maybe_wnorm_apply(params["color_linear"], h, dt)
        if dt is not None:
            logits = logits.astype(jnp.float32)
        return jax.nn.sigmoid(logits)

    def _ctx_color(self, params, ctx, d_emb, view_dirs, W, nabla):
        ft = self._ctx_interp_feats(ctx, W, lo=self.geometry_dim)
        return self._color_from_interp(params, d_emb, view_dirs, ft, nabla)

    def bind_rays(self, params, rays_o, rays_d, near, far,
                  n_probes: int = 8, with_features: bool = True):
        """Returns a protocol-compatible view of this model specialised to a
        ray batch, or None when no candidate grid exists. Leading batch
        dims of the rays are flattened into the ray axis."""
        prefix = rays_o.shape[:-1]
        ctx = self.make_ray_context(
            params, rays_o.reshape(-1, 3), rays_d.reshape(-1, 3),
            near.reshape(-1, 1), far.reshape(-1, 1), n_probes,
            with_features=with_features)
        if ctx is None:
            return None
        return RayBoundNeuMesh(self, ctx, prefix)

    def forward_color(self, params, ds, view_dirs, color_features, indices,
                      weights, nabla=None):
        """Color query with externally-supplied features — the editing hook
        (reference neumesh.py:156-168)."""
        d_emb = self.embed_fn_d(ds)
        view_emb = self.embed_fn_view(view_dirs)
        parts = []
        if self.enable_nablas_input:
            parts.append(nabla)
        parts.append(d_emb)
        parts.append(view_emb)
        ft = interp.interpolate_features(color_features, indices, weights)
        parts.append(self.embed_fn_ft(ft))
        h = jnp.maximum(maybe_wnorm_apply_parts(
            params["views_linears"][0], parts), 0.0)
        for p in params["views_linears"][1:]:
            h = jnp.maximum(maybe_wnorm_apply(p, h), 0.0)
        return jax.nn.sigmoid(maybe_wnorm_apply(params["color_linear"], h))


class RayBoundNeuMesh:
    """Protocol view of a NeuMesh specialised to a ray batch: every sample
    query of shape (R, S, 3) is answered from the per-ray candidate cache.
    Created per render/train step inside the jitted program
    (NeuMesh.bind_rays)."""

    def __init__(self, model: NeuMesh, ctx: dict, prefix):
        assert len(prefix) >= 1, (
            "prefix must hold the ray-batch dims (use NeuMesh.bind_rays)")
        self.model = model
        self.ctx = ctx
        self.prefix = tuple(prefix)  # leading ray-batch dims at bind time
        self.mesh_grid = model.mesh_grid
        self.enable_nablas_input = model.enable_nablas_input

    def _flat(self, x):
        """(..., S, d) -> (Rtot, S, d) where Rtot = prod(prefix)."""
        return x.reshape((-1,) + x.shape[len(self.prefix):])

    def _unflat(self, x):
        return x.reshape(self.prefix + x.shape[1:])

    def forward_s(self, params):
        return self.model.forward_s(params)

    # ---- fully-fused Pallas field path (forward-only) -------------------
    def _field_weights(self, params, f32_override=None):
        """Fold weight-norm into plain (in, out) weights (+ (1, out)
        biases), cast to the serving dtype; split the density first layer
        into its d-embedding / fg-embedding row blocks.

        Selective-f32 serving (NeuMesh.f32_layers): layers tagged there
        keep f32 weights, and the kernels run a true-f32 MXU pass for any
        f32 weight (per-layer precision follows the weight dtype — see
        pallas_kernels._density_mlp). Tags: 'density' (whole density
        MLP), 'd0'/'dh' (its first layer / head), 'color', 'c0'/'ch'.
        f32_override replaces the model's tag set (e.g. () for the
        low-precision secant)."""
        from ...nn import wnorm_weight
        m = self.model
        dt = m.compute_dtype
        f32 = (getattr(m, "f32_layers", ()) if f32_override is None
               else f32_override)

        def eff(p, *tags):
            w = wnorm_weight(p) if "g" in p else p["w"]
            if dt is None or any(t in f32 for t in tags):
                return w
            return w.astype(dt)

        p0 = params["pts_linears"][0]
        w0 = eff(p0, "density", "d0")
        dws = [w0[:m.input_ch_d], w0[m.input_ch_d:], p0["b"][None]]
        for p in params["pts_linears"][1:]:
            dws += [eff(p, "density"), p["b"][None]]
        ph = params["density_linear"]
        dws += [eff(ph, "density", "dh"), ph["b"][None]]

        c0 = params["views_linears"][0]
        cws = [eff(c0, "color", "c0"), c0["b"][None]]
        for p in params["views_linears"][1:]:
            cws += [eff(p, "color"), p["b"][None]]
        cph = params["color_linear"]
        cws += [eff(cph, "color", "ch"), cph["b"][None]]
        return tuple(dws), tuple(cws)

    def _scan_budget(self):
        """Candidate budget for scan/secant: the nearest-prefix size when
        the context is proximity-ranked, else 0 (= full set)."""
        cs = self.model.scan_candidates
        if not cs or not self.ctx.get("_ranked", False):
            return 0
        return min(cs, self.ctx["geo"].shape[2])

    def _scan_ctx_slice(self, geo=None, feat=None):
        """(geo (B, 8, C), feat (B, C, F)) sliced to the scan budget."""
        cs = self._scan_budget()
        out = []
        if geo is not None:
            out.append(geo if not cs else geo[:, :, :cs])
        if feat is not None:
            out.append(feat if not cs else feat[:, :cs, :])
        return tuple(out)

    def _eval_ctx_slice(self):
        """(geo, feat) sliced to the eval_candidates nearest-prefix when
        the context is proximity-ranked (NeuMesh.eval_candidates)."""
        geo, feat = self.ctx["geo"], self.ctx["feat"]
        ec = self.model.eval_candidates
        if ec and self.ctx.get("_ranked", False) and ec < geo.shape[2]:
            return geo[:, :, :ec], feat[:, :ec, :]
        return geo, feat

    def _fused_field(self, params, xyz, want: str, dirs=None, group=None):
        from ...ops.pallas_kernels import field_fused, pack_ctx_geo
        m = self.model
        if "geo" not in self.ctx:
            self.ctx["geo"] = pack_ctx_geo(self.ctx)
        if want == "distance":
            # ds-only fast path: no MLP weights, no feature columns;
            # scan runs against the nearest-candidate prefix
            (geo,) = self._scan_ctx_slice(geo=self.ctx["geo"])
            B, C = geo.shape[0], geo.shape[2]
            return field_fused(
                xyz, geo, jnp.zeros((B, C, 1), jnp.float32),
                m.forward_indicator_weight(params), (), want="distance",
                k=m.scan_knn_k or 8,
                sample_block=m.pallas_sample_block,
                interpret=jax.default_backend() != "tpu")
        dws, cws = self._field_weights(params)
        geo_e, feat = self._eval_ctx_slice()
        feat = (feat if want == "full" else feat[..., :m.geometry_dim])
        return field_fused(
            xyz, geo_e, feat, m.forward_indicator_weight(params),
            dws, cws if want == "full" else None, dirs,
            want=want, multires_d=m.embed_fn_d.multires,
            multires_fg=m.embed_fn_fg.multires,
            multires_ft=m.embed_fn_ft.multires,
            multires_view=m.embed_fn_view.multires,
            geometry_dim=m.geometry_dim, dtype=m.compute_dtype,
            sample_block=m.pallas_sample_block,
            group=(group if group is not None else
                   (m.full_tiles_per_program if want == "full" else 1)),
            interpret=jax.default_backend() != "tpu")

    # ---- v3 Pallas candidate path (ctx math only; ops/pallas_kernels.py)
    def _fused_density_nabla(self, params, xyz, need_nabla: bool,
                             need_ft: bool = False):
        from ...ops.pallas_kernels import candidate_field_v3, pack_ctx_geo
        m = self.model
        w1 = m.forward_indicator_weight(params)
        # interpret mode off-TPU (CPU tests / debugging)
        interpret = jax.default_backend() != "tpu"
        if "geo" not in self.ctx:
            self.ctx["geo"] = pack_ctx_geo(self.ctx)
        feat = self.ctx["feat"] if need_ft \
            else self.ctx["feat"][..., :m.geometry_dim]
        ds, dh, feats = candidate_field_v3(
            xyz, self.ctx["geo"], feat, w1, interpret=interpret,
            want_dh=need_nabla)
        fg = feats[..., :m.geometry_dim]
        ft = feats[..., m.geometry_dim:] if need_ft else None

        if not need_nabla:
            density, d_emb = m._density_from_interp(params, ds, fg)
            return density, None, d_emb, ft

        def dens_of_ds(d):
            return m._density_from_interp(params, d, fg)

        (density, d_emb), (dD_dh, _) = jax.jvp(
            dens_of_ds, (ds,), (jnp.ones_like(ds),))
        nabla = dD_dh * dh
        return density, nabla, d_emb, ft

    def fused_secant(self, params, rays_o, rays_d, d_low, d_high,
                     f_low, f_high, n_iters: int = 6,
                     logit_tau: float = 0.0, d_low_w=None, d_high_w=None):
        """All secant iterations of the surface-render refinement in one
        kernel launch (ops/pallas_kernels.py::secant_refine); rays must
        be in binding order. d_low_w/d_high_w additionally fold the
        density re-bracket of the proxy scan into the same launch.
        Returns d_pred (R,)."""
        from ...ops.pallas_kernels import pack_ctx_geo, secant_refine
        m = self.model
        if "geo" not in self.ctx:
            self.ctx["geo"] = pack_ctx_geo(self.ctx)
        dws, _ = self._field_weights(
            params,
            f32_override=None if m.secant_full_precision else ())
        # root refinement also runs on the nearest-candidate prefix (the
        # density it evaluates uses the same kNN semantics; accuracy is
        # pinned by tests/test_surface_render + the quality gate)
        geo, feat = self._scan_ctx_slice(
            geo=self.ctx["geo"], feat=self.ctx["feat"][..., :m.geometry_dim])
        return secant_refine(
            rays_o, rays_d, d_low, d_high, f_low, f_high,
            geo, feat,
            m.forward_indicator_weight(params), dws, n_iters=n_iters,
            multires_d=m.embed_fn_d.multires,
            multires_fg=m.embed_fn_fg.multires,
            geometry_dim=m.geometry_dim, dtype=m.compute_dtype,
            tile=rays_o.shape[0] // self.ctx["geo"].shape[0],
            logit_tau=logit_tau, group=m.secant_tiles_per_program,
            d_low_w=d_low_w, d_high_w=d_high_w,
            frozen_knn=m.secant_frozen_knn,
            interpret=jax.default_backend() != "tpu")

    def fused_locate(self, params, rays_o, rays_d, near, far,
                     n_steps: int = 24, n_secant: int = 6,
                     logit_tau: float = 0.0):
        """The ENTIRE surface root-finding pipeline (distance scan +
        bracket + density re-bracket + secant) in one kernel program per
        tile (ops/pallas_kernels.py::surface_locate). rays in binding
        order; near/far (R,). Returns (d_pred, mask, mask_sign_change,
        val0_pos)."""
        from ...ops.pallas_kernels import pack_ctx_geo, surface_locate
        m = self.model
        if "geo" not in self.ctx:
            self.ctx["geo"] = pack_ctx_geo(self.ctx)
        dws, _ = self._field_weights(params)
        geo, feat = self._scan_ctx_slice(
            geo=self.ctx["geo"],
            feat=self.ctx["feat"][..., :m.geometry_dim])
        return surface_locate(
            rays_o, rays_d, near, far, geo, feat,
            m.forward_indicator_weight(params), dws,
            n_steps=n_steps, n_secant=n_secant,
            multires_d=m.embed_fn_d.multires,
            multires_fg=m.embed_fn_fg.multires,
            geometry_dim=m.geometry_dim, dtype=m.compute_dtype,
            tile=rays_o.shape[0] // self.ctx["geo"].shape[0],
            logit_tau=logit_tau,
            interpret=jax.default_backend() != "tpu")

    def compute_distance(self, params, xyz, K: int = 8):
        """(ds, None, None): callers on the ray-bound path (the renderer's
        mesh-bounded near/far and the surface-scan fast path) consume
        only ds."""
        x = self._flat(xyz)
        if self.model.use_pallas:
            out = self._fused_field(params, x, "distance")
            return self._unflat(out[0][..., None]), None, None
        ds, _ = self.model._ctx_distance_parts(
            params, self.ctx, x, self.model.scan_knn_k or K)
        return self._unflat(ds), None, None

    def forward_density_only(self, params, xyz):
        x = self._flat(xyz)
        if self.model.use_pallas:
            out = self._fused_field(params, x, "density")
            return self._unflat(out[0])
        ds, W = self.model._ctx_distance_parts(params, self.ctx, x)
        density, _ = self.model._ctx_density(params, self.ctx, ds, W)
        return self._unflat(density[..., 0])

    def forward_density_only_nograd(self, params, xyz):
        """Forward-only density for the renderer's stop-gradient
        up-sampling (sample PLACEMENT only — the reference runs these
        evals under no_grad, models/renderer.py:200): routes to the
        fused kernel even when the model otherwise trains on the
        differentiable XLA path (use_pallas=False). All operands are
        stop_gradient'ed, so the un-differentiable pallas_call sees only
        zero tangents under value_and_grad. The f32 (dtype=None) kernel
        is the parity mode — pinned == XLA in tests/test_pallas.py."""
        if jax.default_backend() != "tpu":
            # interpret-mode kernels are slower than XLA off-TPU
            return self.forward_density_only(
                params, jax.lax.stop_gradient(xyz))
        sg = jax.lax.stop_gradient
        ctx_sg = {k: (sg(v) if hasattr(v, "dtype") else v)
                  for k, v in self.ctx.items()}
        if isinstance(self, TileBoundNeuMesh):
            view = TileBoundNeuMesh(self.model, ctx_sg, self.prefix,
                                    self.tile)
        else:
            view = RayBoundNeuMesh(self.model, ctx_sg, self.prefix)
        x = view._flat(sg(xyz))
        # training shapes are many thin blocks (512 per-ray contexts x
        # 16-64 samples); group programs to ~1024 rows each (thin
        # (rows, C) chains are latency-bound, see _interp_distance)
        sblk_est = min(self.model.pallas_sample_block,
                       max(32, x.shape[1]))
        group = max(1, min(x.shape[0], 1024 // sblk_est))
        while x.shape[0] % group:
            group -= 1
        out = view._fused_field(sg(params), x, "density", group=group)
        return view._unflat(out[0])

    def forward_with_nablas(self, params, xyz):
        x = self._flat(xyz)
        if self.model.use_pallas:
            out = self._fused_field(params, x, "density_nabla")
            return (self._unflat(out[0]),
                    self._unflat(jnp.stack(out[1:4], axis=-1)))
        density, nabla, _, _, _ = self.model._ctx_density_and_nabla(
            params, self.ctx, x)
        return self._unflat(density[..., 0]), self._unflat(nabla)

    def forward_full(self, params, xyz, view_dirs):
        """(sdf, rgb, nablas) from ONE fused 'full' kernel launch — the
        surface render needs all three for its single per-ray query;
        separate forward + forward_with_nablas calls would evaluate the
        field twice. Falls back to the two-call path off the fused
        route."""
        m = self.model
        if (m.use_pallas and m.enable_nablas_input
                and view_dirs is not None):
            x = self._flat(xyz)
            v = self._flat(view_dirs)
            out = self._fused_field(params, x, "full", dirs=v)
            return (self._unflat(out[0]),
                    self._unflat(jnp.stack(out[4:7], axis=-1)),
                    self._unflat(jnp.stack(out[1:4], axis=-1)))
        sdf, rgb = self.forward(params, xyz, view_dirs)
        _, nablas = self.forward_with_nablas(params, xyz)
        return sdf, rgb, nablas

    def forward(self, params, xyz, view_dirs):
        m = self.model
        x = self._flat(xyz)
        v = self._flat(view_dirs)
        if m.use_pallas and m.enable_nablas_input:
            out = self._fused_field(params, x, "full", dirs=v)
            return (self._unflat(out[0]),
                    self._unflat(jnp.stack(out[4:7], axis=-1)))
        if m.use_pallas:
            density, nabla, d_emb, ft = self._fused_density_nabla(
                params, x, m.enable_nablas_input, need_ft=True)
            color = m._color_from_interp(params, d_emb, v, ft, nabla)
            return self._unflat(density[..., 0]), self._unflat(color)
        if m.enable_nablas_input:
            density, nabla, d_emb, W, ft = m._ctx_density_and_nabla(
                params, self.ctx, x, with_ft=True)
        else:
            ds, W = m._ctx_distance_parts(params, self.ctx, x)
            feats = m._ctx_interp_feats(self.ctx, W)
            density, d_emb = m._density_from_interp(
                params, ds, feats[..., :m.geometry_dim])
            ft = feats[..., m.geometry_dim:]
            nabla = None
        color = m._color_from_interp(params, d_emb, v, ft, nabla)
        return self._unflat(density[..., 0]), self._unflat(color)


class TileBoundNeuMesh(RayBoundNeuMesh):
    """Protocol view bound to tile-shared candidate caches: `tile`
    consecutive rays share one (C, ...) candidate set; a sample query of
    shape (..., S, 3) is answered as (R/tile, tile*S, C) batched math."""

    def __init__(self, model: NeuMesh, ctx: dict, prefix, tile: int):
        super().__init__(model, ctx, prefix)
        self.tile = tile

    def _flat(self, x):
        """(prefix..., S, d) -> (Rt, tile*S, d)."""
        n = len(self.prefix)
        rest = x.shape[n + 1:]
        return x.reshape((-1, self.tile * x.shape[n]) + rest)

    def _unflat(self, y):
        return y.reshape(
            self.prefix + (y.shape[1] // self.tile,) + y.shape[2:])


def candidate_bounded_near_far_tiled(ctx, rays_o, rays_d, near, far,
                                     tile: int,
                                     distance_thresh: float = 0.1):
    """Per-ray mesh-bounded near/far from a TILE-shared candidate set —
    same closed-form segment math as candidate_bounded_near_far, with the
    candidate axis shared across the `tile` rays of each group.
    rays/near/far: (R, 3)/(R, 1)."""
    R = rays_o.shape[0]
    Rt = R // tile
    pts = ctx["pts"]                                      # (Rt, C, 3)
    o = rays_o.reshape(Rt, tile, 1, 3)
    d = rays_d.reshape(Rt, tile, 1, 3)
    ov = pts[:, None, :, :] - o                           # (Rt, T, C, 3)
    t_c = jnp.sum(ov * d, axis=-1)                        # (Rt, T, C)
    d_perp2 = jnp.sum(ov * ov, axis=-1) - t_c * t_c
    s2 = distance_thresh * distance_thresh - d_perp2
    covered = s2 > 0
    s = jnp.sqrt(jnp.where(covered, s2, 1.0)) * covered

    nr = near.reshape(Rt, tile, 1)
    fr = far.reshape(Rt, tile, 1)
    t_lo = jnp.where(covered, t_c - s, 1e10)
    t_hi = jnp.where(covered, t_c + s, -1e10)
    near_new = jnp.min(t_lo, axis=-1, keepdims=True)      # (Rt, T, 1)
    far_new = jnp.max(t_hi, axis=-1, keepdims=True)
    near_new = jnp.clip(near_new, nr, fr)
    far_new = jnp.clip(far_new, nr, fr)
    hit = jnp.any(covered, axis=-1, keepdims=True)
    near_new = jnp.where(hit, near_new, nr)
    far_new = jnp.where(hit, far_new, fr)

    too_close = (far_new - near_new) < 0.1
    far_new = jnp.where(too_close, far_new + 0.05, far_new)
    near_new = jnp.where(too_close, near_new - 0.05, near_new)
    return near_new.reshape(R, 1), far_new.reshape(R, 1)


def candidate_bounded_near_far(ctx, rays_o, rays_d, near, far,
                               distance_thresh: float = 0.1):
    """Mesh-bounded near/far from per-ray candidate geometry (closed form).

    Replaces the reference's 256-probe interpolated-distance scan
    (models/renderer.py:66-102) with the exact segment where the ray passes
    within `distance_thresh` of a candidate vertex:

        t_c      = <v_c - o, d>
        d_perp^2 = |v_c - o|^2 - t_c^2
        ray within thresh of v_c for t in [t_c - s, t_c + s],
        s = sqrt(thresh^2 - d_perp^2)

    near/far = min/max over covered candidates, clamped to the input
    bounds; same 'too close' compensation as the reference
    (models/renderer.py:99-101). rays/near/far: (R, 3)/(R, 1).
    """
    ov = ctx["pts"] - rays_o[:, None, :]                  # (R, C, 3)
    t_c = jnp.sum(ov * rays_d[:, None, :], axis=-1)      # exact f32 (VPU)
    d_perp2 = jnp.sum(ov * ov, axis=-1) - t_c * t_c
    s2 = distance_thresh * distance_thresh - d_perp2
    covered = s2 > 0
    s = jnp.sqrt(jnp.where(covered, s2, 1.0)) * covered

    t_lo = jnp.where(covered, t_c - s, 1e10)
    t_hi = jnp.where(covered, t_c + s, -1e10)
    near_new = jnp.min(t_lo, axis=-1, keepdims=True)
    far_new = jnp.max(t_hi, axis=-1, keepdims=True)
    near_new = jnp.clip(near_new, near, far)
    far_new = jnp.clip(far_new, near, far)
    hit = jnp.any(covered, axis=-1, keepdims=True)
    near_new = jnp.where(hit, near_new, near)
    far_new = jnp.where(hit, far_new, far)

    too_close = (far_new - near_new) < 0.1
    far_new = jnp.where(too_close, far_new + 0.05, far_new)
    near_new = jnp.where(too_close, near_new - 0.05, near_new)
    return near_new, far_new
