"""NeuS-CDF volume renderer (reference models/renderer.py:105-377), TPU-first.

The entire per-ray pipeline — sphere (and optionally mesh-bounded) near/far,
64 coarse samples, 4 rounds of NeuS hierarchical up-sampling (+16 samples
each), final SDF/nabla evaluation, mid-point radiance, alpha compositing —
compiles to ONE jitted program with static shapes. The reference's Python
`rayschunk`/`netchunk` loops (models/renderer.py:352-366,
utils/train_util.py:25-82) become `lax.map` over fixed-size ray chunks in
`render_image`; point-level chunking is unnecessary under XLA.

Any model satisfying the protocol (forward / forward_density_only /
forward_with_nablas / forward_s, and optionally compute_distance for
mesh-bounded near-far) plugs in — NeuS, NeuMesh, and the texture-editing
wrapper — mirroring the reference's L2/L3 invariant (SURVEY §1).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.alpha import alpha_to_w, cdf_Phi_s, sdf_to_alpha
from ..ops.rays import near_far_from_sphere, sample_pdf


def compute_bounded_near_far(
    model,
    params,
    rays_o,
    rays_d,
    near,
    far,
    sample_grid: int = 256,
    distance_thresh: float = 0.1,
):
    """Tighten near/far to the segment where the interpolated mesh distance
    is below `distance_thresh` (reference models/renderer.py:66-102).
    near/far: (..., N_rays, 1)."""
    _t = jnp.linspace(0.0, 1.0, sample_grid)
    d_coarse = near * (1 - _t) + far * _t  # (..., N_rays, G)
    pts = rays_o[..., None, :] + d_coarse[..., None] * rays_d[..., None, :]
    ds, _, _ = model.compute_distance(params, pts)
    ds = ds[..., 0]  # (..., N_rays, G)
    mask = ds < distance_thresh

    near_cand = jnp.where(mask, d_coarse, 1e10)
    near_new = jnp.min(near_cand, axis=-1, keepdims=True)
    near_new = jnp.where(near_new > 1e5, near, near_new)

    far_cand = jnp.where(mask, d_coarse, -1e10)
    far_new = jnp.max(far_cand, axis=-1, keepdims=True)
    far_new = jnp.where(far_new < -1e5, far, far_new)

    too_close = (far_new - near_new) < 0.1
    far_new = jnp.where(too_close, far_new + 0.05, far_new)
    near_new = jnp.where(too_close, near_new - 0.05, near_new)
    return near_new, far_new


def root_anchored_depths(near, far, d_root, mask, N_fine: int,
                         window, win_frac: float = 0.5):
    """Per-ray sample depths concentrated around a located surface root —
    sorted by construction (three monotone uniform segments), so the NeuS
    alpha compositing consumes them without a sort/merge.

    near/far: (R, 1); d_root/mask: (R,) from root finding. `window` is the
    half-width of the dense middle segment (scalar, may be traced).
    Rays without a root (mask=False) get ALL N_fine samples uniformly over
    [near, far] (the reference's coarse pass at full budget — ADVICE r4:
    the previous three-segment degradation collapsed half the budget into
    duplicates at the endpoints). Returns (R, N_fine)."""
    near0 = near[..., 0]
    far0 = far[..., 0]
    half = 0.5 * (far0 - near0)
    c = jnp.where(mask, jnp.clip(d_root, near0, far0),
                  0.5 * (near0 + far0))
    w = jnp.where(mask, jnp.minimum(window, half), half)
    lo = jnp.clip(c - w, near0, far0)
    hi = jnp.clip(c + w, near0, far0)

    n_win = max(1, int(round(N_fine * win_frac)))
    n_lo = max(1, (N_fine - n_win) // 2)
    n_hi = max(1, N_fine - n_win - n_lo)

    # endpoint=False on the first two segments avoids duplicate depths at
    # the joins (duplicates are harmless — zero-length intervals get
    # alpha 0 — but waste samples)
    t_lo = near0[..., None] + (lo - near0)[..., None] * (
        jnp.arange(n_lo, dtype=jnp.float32) / n_lo)
    t_win = lo[..., None] + (hi - lo)[..., None] * (
        jnp.arange(n_win, dtype=jnp.float32) / n_win)
    t_hi = hi[..., None] + (far0 - hi)[..., None] * (
        jnp.linspace(0.0, 1.0, n_hi))
    d_anchor = jnp.concatenate([t_lo, t_win, t_hi], axis=-1)
    d_unif = near0[..., None] + (far0 - near0)[..., None] * (
        jnp.linspace(0.0, 1.0, N_fine))
    return jnp.where(mask[..., None], d_anchor, d_unif)


def volume_render_rays(
    model,
    params,
    rays_o,
    rays_d,
    key=None,
    *,
    obj_bounding_radius: float = 1.0,
    calc_normal: bool = False,
    use_view_dirs: bool = True,
    white_bkgd: bool = False,
    near_bypass: Optional[float] = None,
    far_bypass: Optional[float] = None,
    detailed_output: bool = True,
    perturb: bool = False,
    N_samples: int = 64,
    N_importance: int = 64,
    N_upsample_iters: int = 4,
    samples_output: bool = False,
    bounded_near_far: bool = True,
    random_color_direction: bool = False,
    phi_s_base: float = 256.0,
    reuse_upsample_sdf: bool = False,
    ray_tile: int = 0,
    tile_max_candidates: Optional[int] = None,
    color_topk: int = 0,
    root_anchored: bool = False,
    root_steps: int = 16,
    root_secant: int = 3,
    root_n_fine: int = 48,
    root_window: float = 0.0,
    root_win_frac: float = 0.5,
    **dummy_kwargs,
):
    """Render one chunk of rays. rays_o/rays_d: (..., N_rays, 3); rays_d need
    not be normalised (reference models/renderer.py:139 note). Returns an
    output dict; keys follow reference models/renderer.py:318-348."""
    rays_o = rays_o.astype(jnp.float32)
    rays_d = rays_d.astype(jnp.float32)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    if key is None:
        key = jax.random.PRNGKey(0)
    up_keys = jax.random.split(key, N_upsample_iters + 1)
    color_dir_key = up_keys[-1]

    near, far = near_far_from_sphere(rays_o, rays_d, r=obj_bounding_radius)
    can_bind = hasattr(model, "bind_rays") and rays_o.ndim >= 2

    # tile-shared candidate path (coherent rays / rendering): ONE context
    # build serves candidate-bounded near/far AND every sample query
    if (ray_tile and ray_tile > 1 and can_bind
            and hasattr(model, "bind_rays_tiled")):
        tb = model.bind_rays_tiled(
            params, rays_o, rays_d, near, far, tile=ray_tile,
            max_candidates=tile_max_candidates)
        if tb is not None:
            bound_model, near_t, far_t = tb
            if bounded_near_far:
                near, far = near_t, far_t
            if near_bypass is not None:
                near = jnp.full_like(near, near_bypass)
            if far_bypass is not None:
                far = jnp.full_like(far, far_bypass)

            d_all_override = None
            if root_anchored and (rays_o.ndim != 2 or calc_normal
                                  or random_color_direction):
                # refuse to silently render a different sampling
                # structure than the caller asked for (ADVICE r4)
                raise ValueError(
                    "root_anchored volume serving requires flat (R, 3) "
                    "rays and calc_normal=random_color_direction=False; "
                    "got ndim=%d calc_normal=%s random_color_direction=%s"
                    % (rays_o.ndim, calc_normal, random_color_direction))
            if root_anchored:
                # root-anchored serving: locate the first density
                # crossing with the surface machinery (proxy scan +
                # fused secant), then place root_n_fine samples
                # concentrated around it — replaces the reference's
                # 64-coarse + 4x16-upsample structure (128 density-MLP
                # evals/ray) with root_steps proxy evals + root_secant
                # density evals + root_n_fine density evals. Structural
                # serving knob, gated by tools/quality_gate.py
                # volume_bf16 vs the reference-structure f32 render.
                from .ray_casting import root_finding_surface_points

                def scan_fn(pts):
                    return bound_model.compute_distance(
                        params, pts)[0][..., 0]

                def refine_fn(pts):
                    if pts.ndim == 2:
                        return bound_model.forward_density_only(
                            params, pts[:, None, :])[..., 0]
                    return bound_model.forward_density_only(params, pts)

                secant_override = None
                if (hasattr(bound_model, "fused_secant")
                        and getattr(model, "use_pallas", False)):
                    def secant_override(f_low, f_high, d_low, d_high, n,
                                        tau, d_low_w=None, d_high_w=None):
                        return bound_model.fused_secant(
                            params, rays_o, rays_d, d_low, d_high,
                            f_low, f_high, n_iters=n, logit_tau=tau,
                            d_low_w=d_low_w, d_high_w=d_high_w)

                d_pred, _, mask, _ = root_finding_surface_points(
                    scan_fn, rays_o, rays_d, near=near[..., 0],
                    far=far[..., 0], N_steps=root_steps,
                    N_secant_steps=root_secant, fill_inf=False,
                    refine_query_fn=refine_fn,
                    secant_override=secant_override,
                    rebracket=getattr(model, "secant_rebracket", True))
                s_val = jax.lax.stop_gradient(model.forward_s(params))
                win = (root_window if root_window
                       else jnp.clip(6.0 / s_val, 0.02, 0.5))
                d_all_override = root_anchored_depths(
                    near, far, d_pred, mask, root_n_fine, win,
                    root_win_frac)

            return _render_core(
                bound_model, params, rays_o, rays_d, near, far,
                up_keys, color_dir_key,
                calc_normal=calc_normal, use_view_dirs=use_view_dirs,
                white_bkgd=white_bkgd, detailed_output=detailed_output,
                perturb=perturb, N_samples=N_samples,
                N_importance=N_importance,
                N_upsample_iters=N_upsample_iters,
                samples_output=samples_output,
                random_color_direction=random_color_direction,
                phi_s_base=phi_s_base,
                reuse_upsample_sdf=reuse_upsample_sdf,
                color_topk=color_topk, d_all_override=d_all_override)

    if root_anchored:
        # the tiled candidate binding was unavailable (ray_tile<=1, model
        # without bind_rays_tiled, or the bind returned None) — the
        # hierarchical fallback is a DIFFERENT sampling structure, so
        # fail loudly instead of reporting its numbers as root-anchored
        # (ADVICE r4)
        raise ValueError(
            "root_anchored volume serving requires the tiled candidate "
            "binding (ray_tile > 1 on a model with bind_rays_tiled); "
            f"ray_tile={ray_tile}, can_bind={can_bind}")

    if bounded_near_far and hasattr(model, "compute_distance"):
        pre_ctx = None
        if can_bind and hasattr(model, "make_ray_context"):
            # bounds-only context: raw candidate positions, no dedup or
            # compaction (min/max coverage is duplicate-insensitive)
            pre_ctx = model.make_ray_context(
                params, rays_o.reshape(-1, 3), rays_d.reshape(-1, 3),
                near.reshape(-1, 1), far.reshape(-1, 1), n_probes=16,
                for_bounds=True)
        if pre_ctx is not None:
            # closed-form candidate-geometry bounding (no probe scan)
            from ..models.neumesh.model import candidate_bounded_near_far
            shp = near.shape
            near_f, far_f = candidate_bounded_near_far(
                pre_ctx, rays_o.reshape(-1, 3), rays_d.reshape(-1, 3),
                near.reshape(-1, 1), far.reshape(-1, 1))
            near = near_f.reshape(shp)
            far = far_f.reshape(shp)
        else:
            near, far = compute_bounded_near_far(
                model, params, rays_o, rays_d, near, far)
    if near_bypass is not None:
        near = jnp.full_like(near, near_bypass)
    if far_bypass is not None:
        far = jnp.full_like(far, far_bypass)

    # specialise the model to this ray batch (per-ray candidate cache;
    # NeuMesh fast path) — all subsequent sample queries are (R, S, 3)
    bound_model = model
    if can_bind:
        bound = model.bind_rays(params, rays_o, rays_d, near, far,
                                n_probes=8)
        if bound is not None:
            bound_model = bound

    return _render_core(
        bound_model, params, rays_o, rays_d, near, far,
        up_keys, color_dir_key,
        calc_normal=calc_normal, use_view_dirs=use_view_dirs,
        white_bkgd=white_bkgd, detailed_output=detailed_output,
        perturb=perturb, N_samples=N_samples, N_importance=N_importance,
        N_upsample_iters=N_upsample_iters, samples_output=samples_output,
        random_color_direction=random_color_direction,
        phi_s_base=phi_s_base, reuse_upsample_sdf=reuse_upsample_sdf,
        color_topk=color_topk)


def _render_core(
    model,
    params,
    rays_o,
    rays_d,
    near,
    far,
    up_keys,
    color_dir_key,
    *,
    calc_normal,
    use_view_dirs,
    white_bkgd,
    detailed_output,
    perturb,
    N_samples,
    N_importance,
    N_upsample_iters,
    samples_output,
    random_color_direction,
    phi_s_base,
    reuse_upsample_sdf,
    color_topk=0,
    d_all_override=None,
):
    """Sampling + up-sampling + evaluation + compositing on a (possibly
    ray-bound) model with near/far already resolved. d_all_override
    supplies externally-placed (sorted) sample depths — the root-anchored
    serving path — skipping the coarse + hierarchical up-sampling."""
    view_dirs = rays_d if use_view_dirs else None

    # ---- coarse samples (reference models/renderer.py:193-194)
    _t = jnp.linspace(0.0, 1.0, N_samples)
    d_coarse = near * (1 - _t) + far * _t  # (..., N_rays, N_samples)

    # ---- NeuS hierarchical up-sampling, no-grad
    # (reference models/renderer.py:200-259); shapes grow 64->80->...->128
    # deterministically, so the loop is unrolled at trace time.
    def upsample(d_coarse):
        # the whole loop runs under stop_gradient (sample PLACEMENT,
        # reference models/renderer.py:200 no_grad): prefer the model's
        # forward-only fast path when it has one (the fused f32 kernel —
        # pinned == XLA — even when training keeps the differentiable
        # XLA path for the final evals)
        dens_fn = getattr(model, "forward_density_only_nograd",
                          model.forward_density_only)
        _d = d_coarse
        _xyz = rays_o[..., None, :] + _d[..., None] * rays_d[..., None, :]
        _sdf = dens_fn(params, _xyz)
        n_per_iter = N_importance // N_upsample_iters
        for i in range(N_upsample_iters):
            prev_sdf, next_sdf = _sdf[..., :-1], _sdf[..., 1:]
            prev_z, next_z = _d[..., :-1], _d[..., 1:]
            mid_sdf = (prev_sdf + next_sdf) * 0.5
            dot_val = (next_sdf - prev_sdf) / (next_z - prev_z + 1e-5)
            prev_dot_val = jnp.concatenate(
                [jnp.zeros_like(dot_val[..., :1]), dot_val[..., :-1]], axis=-1)
            dot_val = jnp.minimum(prev_dot_val, dot_val)
            dot_val = jnp.clip(dot_val, -10.0, 0.0)

            dist = next_z - prev_z
            prev_esti_sdf = mid_sdf - dot_val * dist * 0.5
            next_esti_sdf = mid_sdf + dot_val * dist * 0.5
            s_i = phi_s_base * (2**i)
            prev_cdf = cdf_Phi_s(prev_esti_sdf, s_i)
            next_cdf = cdf_Phi_s(next_esti_sdf, s_i)
            alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)
            _w = alpha_to_w(alpha)
            d_fine = sample_pdf(
                _d, _w, n_per_iter, det=not perturb, key=up_keys[i])
            _d = jnp.concatenate([_d, d_fine], axis=-1)

            pts_fine = (rays_o[..., None, :]
                        + d_fine[..., None] * rays_d[..., None, :])
            sdf_fine = dens_fn(params, pts_fine)
            _sdf = jnp.concatenate([_sdf, sdf_fine], axis=-1)
            # multi-operand sort permutes the payload inside the sort —
            # argsort + take_along_axis gathers run at ~5 GB/s on TPU and
            # dominated the whole render before this
            _d, _sdf = jax.lax.sort((_d, _sdf), dimension=-1, num_keys=1)
        return _d, _sdf

    if d_all_override is not None:
        d_all = jax.lax.stop_gradient(d_all_override)
        sdf_up = None
        reuse_upsample_sdf = False
    else:
        d_all, sdf_up = jax.lax.stop_gradient(
            upsample(jax.lax.stop_gradient(d_coarse)))

    # ---- final evaluation (reference models/renderer.py:262-294)
    pts = rays_o[..., None, :] + rays_d[..., None, :] * d_all[..., :, None]
    d_mid = 0.5 * (d_all[..., 1:] + d_all[..., :-1])
    pts_mid = rays_o[..., None, :] + rays_d[..., None, :] * d_mid[..., :, None]

    if calc_normal:
        sdf, nablas = model.forward_with_nablas(params, pts)
    elif reuse_upsample_sdf:
        # inference fast path: the up-sampling loop already evaluated the
        # SDF at every point of d_all — identical values, one fewer full
        # density pass. NOT valid for training: the upsample evals run
        # under stop_gradient, so parameter gradients need the re-eval.
        sdf = sdf_up
        nablas = None
    else:
        sdf = model.forward_density_only(params, pts)
        nablas = None

    cdf, opacity_alpha = sdf_to_alpha(sdf, model.forward_s(params))

    if not random_color_direction:
        dirs_mid = jnp.broadcast_to(view_dirs[..., None, :], pts_mid.shape)
    else:
        # view-independence trick for texture painting
        # (reference models/renderer.py:283-290)
        rnd = jax.random.uniform(color_dir_key, pts_mid.shape)
        dirs_mid = rnd / jnp.linalg.norm(rnd, axis=-1, keepdims=True)

    visibility_weights = alpha_to_w(opacity_alpha)

    use_topk = (color_topk and not detailed_output
                and not random_color_direction
                and color_topk < d_mid.shape[-1])
    if use_topk:
        # serving fast path: radiance — 59% of the volume frame, the
        # color MLP over every midpoint — is evaluated only at the
        # color_topk highest-visibility midpoints per ray, with the
        # selected mass renormalised to the ray's full accumulated mass
        # (the unselected tail's color is approximated by the selected
        # weighted mean — the importance-sampled midpoints all sit in
        # the same surface crossing, where radiance varies slowly;
        # K=16 reproduces the full composite to <1e-3 rgb on the
        # analytic pin and the config is quality-gated). Depth/acc maps
        # keep the full weight set, exactly. Multi-operand descending
        # sort carries (d_mid, w); gathers stay off the hot path.
        negw = -jax.lax.stop_gradient(visibility_weights)
        _, d_sel, w_sel = jax.lax.sort(
            (negw, d_mid, visibility_weights), dimension=-1, num_keys=1)
        d_sel = d_sel[..., :color_topk]
        w_sel = w_sel[..., :color_topk]
        pts_sel = (rays_o[..., None, :]
                   + rays_d[..., None, :] * d_sel[..., :, None])
        dirs_sel = jnp.broadcast_to(view_dirs[..., None, :],
                                    pts_sel.shape)
        sdf_mid, radiances = model.forward(params, pts_sel, dirs_sel)
        renorm = (jnp.sum(visibility_weights, -1, keepdims=True)
                  / (jnp.sum(w_sel, -1, keepdims=True) + 1e-10))
        rgb_map = jnp.sum(w_sel[..., None] * radiances, axis=-2) * renorm
    else:
        sdf_mid, radiances = model.forward(params, pts_mid, dirs_mid)
        # ---- integration (reference models/renderer.py:297-316)
        rgb_map = jnp.sum(visibility_weights[..., None] * radiances,
                          axis=-2)
    depth_map = jnp.sum(
        visibility_weights
        / (jnp.sum(visibility_weights, -1, keepdims=True) + 1e-10) * d_mid,
        axis=-1)
    acc_map = jnp.sum(visibility_weights, axis=-1)  # full set, exact

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    ret = {
        "rgb": rgb_map,                 # (..., N_rays, 3)
        "depth_volume": depth_map,      # (..., N_rays)
        "mask_volume": acc_map,         # (..., N_rays)
    }

    if calc_normal:
        normals_map = nablas / jnp.maximum(
            jnp.linalg.norm(nablas, axis=-1, keepdims=True), 1e-12)
        n_pts = min(visibility_weights.shape[-1], normals_map.shape[-2])
        ret["normals_volume"] = jnp.sum(
            normals_map[..., :n_pts, :]
            * visibility_weights[..., :n_pts, None], axis=-2)

    if detailed_output:
        if calc_normal:
            ret["implicit_nablas"] = nablas
        ret["implicit_surface"] = sdf
        ret["radiance"] = radiances
        ret["alpha"] = opacity_alpha
        ret["cdf"] = cdf
        ret["visibility_weights"] = visibility_weights
        ret["d_final"] = d_mid
        if samples_output:
            # per-sample buffers consumed by distillation
            # (reference models/renderer.py:344-348)
            ret["xyz"] = pts_mid
            ret["dirs"] = dirs_mid
            ret["density"] = sdf_mid[..., None]
            ret["colors"] = radiances

    return ret


def volume_render(model, params, rays_o, rays_d, key=None,
                  rayschunk: int = 0, show_progress: bool = False, **kwargs):
    """Full render entry (reference models/renderer.py:105).

    rays_o/rays_d are flattened to (..., N, 3). If ``rayschunk`` > 0 and
    N > rayschunk, rays are padded to a chunk multiple and processed with
    ``lax.map`` (single compiled body). Returns (rgb, depth, extras-dict).
    """
    shape = rays_o.shape
    rays_o = rays_o.reshape((-1, 3))
    rays_d = rays_d.reshape((-1, 3))
    n = rays_o.shape[0]

    if rayschunk and n > rayschunk:
        n_chunks = -(-n // rayschunk)
        pad = n_chunks * rayschunk - n
        ro = jnp.pad(rays_o, ((0, pad), (0, 0)), mode="edge")
        rd = jnp.pad(rays_d, ((0, pad), (0, 0)), mode="edge")
        ro = ro.reshape(n_chunks, rayschunk, 3)
        rd = rd.reshape(n_chunks, rayschunk, 3)
        if key is None:
            key = jax.random.PRNGKey(0)
        keys = jax.random.split(key, n_chunks)

        def body(args):
            ro_i, rd_i, k_i = args
            return volume_render_rays(model, params, ro_i, rd_i, k_i, **kwargs)

        ret = jax.lax.map(body, (ro, rd, keys))
        ret = {k: v.reshape((n_chunks * rayschunk,) + v.shape[2:])[:n]
               for k, v in ret.items()}
    else:
        ret = volume_render_rays(model, params, rays_o, rays_d, key, **kwargs)

    prefix = shape[:-1]
    ret = {k: v.reshape(prefix + v.shape[1:]) for k, v in ret.items()}
    return ret["rgb"], ret["depth_volume"], ret


class SingleRenderer:
    """Callable wrapper bundling (model, jit cache) — the functional analog of
    reference models/renderer.py:371-377. Call with (params, rays_o, rays_d,
    key=..., **render_kwargs); static render kwargs select a cached jitted
    program."""

    def __init__(self, model):
        self.model = model
        self._cache = {}

    def __call__(self, params, rays_o, rays_d, key=None, **kwargs):
        kwargs.pop("batched", None)  # layout is shape-inferred under JAX
        static = tuple(sorted(
            (k, v) for k, v in kwargs.items()
            if isinstance(v, (bool, int, float, str, type(None)))))
        mg = getattr(self.model, "mesh_grid", None)
        if static not in self._cache:
            static_dict = dict(static)

            def run(params, rays_o, rays_d, key, mesh_bufs,
                    _sd=static_dict):
                # mesh tables as jit arguments, not baked constants
                # (MeshGrid.device_buffers)
                if mg is not None and mesh_bufs is not None:
                    with mg.bound_buffers(mesh_bufs):
                        return volume_render(self.model, params, rays_o,
                                             rays_d, key, **_sd)
                return volume_render(self.model, params, rays_o, rays_d,
                                     key, **_sd)

            self._cache[static] = jax.jit(run)
        bufs = mg.device_buffers() if mg is not None else None
        return self._cache[static](params, rays_o, rays_d, key, bufs)
