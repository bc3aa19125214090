"""Pallas TPU kernels for the NeuMesh hot path.

``candidate_field``: the fused per-ray candidate loop — for every sample of
every ray, against the ray's candidate set (see NeuMesh.make_ray_context):

    d2        = |x|^2 + |v_c|^2 - 2 x.v_c                   (MXU)
    thr       = 8th-smallest d2                             (VPU loop)
    W_c       = [d2 <= thr] / (sqrt(d2) + 1e-7), normalised
    h         = sum_c W_c (w1 (x.n_c - v_c.n_c) + d^3)/(w1 + d)
    grad_x h  = A @ n + (sum_c B_c) x - B @ v               (closed form)
    fg, ft    = W @ geo, W @ col                            (MXU)

Everything for one ray block lives in VMEM — the XLA path round-trips
several (rays, samples, candidates) tensors through HBM per stage; this
kernel eliminates those.

Semantics match ops/interp.py + NeuMesh._ctx_distance_parts with one noted
deviation: exact distance TIES at the top-8 boundary may select fewer
candidates (the threshold loop masks equal minima together); measure-zero
on real meshes.

Forward-only: training keeps the XLA path (fully differentiable); the
kernel accelerates rendering/serving. Gated by NeuMesh(use_pallas=True) or
RayBoundNeuMesh.use_pallas.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xyz_ref, pts_ref, pp_ref, ind_ref, vn_ref, geo_ref, col_ref,
            w1_ref, ds_ref, dh_ref, fg_ref, ft_ref, *, k: int, rb: int):
    w1 = w1_ref[0, 0]
    for r in range(rb):                 # rays per program, unrolled
        x = xyz_ref[r]                  # (S, 3)
        pts = pts_ref[r]                # (C, 3)
        pp = pp_ref[r]                  # (1, C)
        ind = ind_ref[r]                # (C, 3)
        vn = vn_ref[r]                  # (1, C)

        xv = jnp.dot(x, pts.T, preferred_element_type=jnp.float32)
        xx = jnp.sum(x * x, axis=-1, keepdims=True)
        d2 = jnp.maximum(xx + pp - 2.0 * xv, 0.0)                # (S, C)

        # threshold = k-th smallest per row (equal minima mask together;
        # boundary ties are measure-zero on real meshes)
        cur = d2
        thr = jnp.zeros_like(xx)
        for _ in range(k):
            m = jnp.min(cur, axis=-1, keepdims=True)
            thr = m
            cur = jnp.where(cur <= m, jnp.inf, cur)

        mask = d2 <= thr
        d = jnp.sqrt(jnp.maximum(d2, 1e-20))
        w_raw = jnp.where(mask, 1.0 / (d + 1e-7), 0.0)
        W = w_raw / jnp.sum(w_raw, axis=-1, keepdims=True)       # (S, C)

        xn = jnp.dot(x, ind.T, preferred_element_type=jnp.float32)
        term = w1 * (xn - vn) + d * d2                           # d^3
        inv = 1.0 / (w1 + d)
        ds_ref[r] = jnp.sum(W * term * inv, axis=-1, keepdims=True)

        # closed-form grad: dh = A @ n + (sum B) x - B @ v
        A = W * w1 * inv
        B = W * (3.0 * d2 * (w1 + d) - term) * inv * inv / d
        dh = (jnp.dot(A, ind, preferred_element_type=jnp.float32)
              + jnp.sum(B, axis=-1, keepdims=True) * x
              - jnp.dot(B, pts, preferred_element_type=jnp.float32))
        dh_ref[r] = dh

        fg_ref[r] = jnp.dot(W, geo_ref[r],
                            preferred_element_type=jnp.float32)
        ft_ref[r] = jnp.dot(W, col_ref[r],
                            preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("k", "interpret", "rays_per_block"))
def candidate_field(xyz, pts, pp, ind, vn, geo, col, w1, k: int = 8,
                    interpret: bool = False, rays_per_block: int = 8):
    """xyz: (R, S, 3); pts/ind: (R, C, 3); pp/vn: (R, C);
    geo: (R, C, Fg); col: (R, C, Fc); w1 scalar ->
    (ds (R, S, 1), dh (R, S, 3), fg (R, S, Fg), ft (R, S, Fc)).
    R is padded internally to a multiple of rays_per_block."""
    R0, S, _ = xyz.shape
    C = pts.shape[1]
    Fg = geo.shape[-1]
    Fc = col.shape[-1]
    rb = min(rays_per_block, R0)
    pad = (-R0) % rb
    if pad:
        def padr(a):
            return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1),
                           mode="edge")
        xyz, pts, pp, ind, vn, geo, col = map(
            padr, (xyz, pts, pp, ind, vn, geo, col))
    R = R0 + pad
    w1_arr = jnp.full((1, 1), w1, jnp.float32)

    grid = (R // rb,)

    def row(i):
        return (i, 0, 0)

    out = pl.pallas_call(
        functools.partial(_kernel, k=k, rb=rb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rb, S, 3), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, C, 3), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1, C), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, C, 3), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1, C), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, C, Fg), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, C, Fc), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((rb, S, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, S, 3), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, S, Fg), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, S, Fc), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, S, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, S, 3), jnp.float32),
            jax.ShapeDtypeStruct((R, S, Fg), jnp.float32),
            jax.ShapeDtypeStruct((R, S, Fc), jnp.float32),
        ],
        interpret=interpret,
    )(xyz, pts, pp.reshape(R, 1, C), ind, vn.reshape(R, 1, C), geo, col,
      w1_arr)
    return tuple(o[:R0] for o in out)
