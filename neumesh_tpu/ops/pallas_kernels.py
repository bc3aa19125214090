"""Pallas TPU kernels for the NeuMesh hot path.

``candidate_field_v3`` (the production kernel): per-(ray|tile) candidate
math with the candidate axis on the 128-lane dimension. The context is
packed as one (8, C) f32 block per ray/tile — rows [px py pz ix iy iz
pp vn] — so every per-candidate operand is a natural (1, C) lane row and
the whole selection + distance + gradient chain runs out of VMEM without
a single relayout; features interpolate as one real (S_blk, C) @ (C, F)
MXU matmul per program (tile-shared candidates — no per-ray mini-matmul
loops, v2's downfall). Grid is (batch, sample-blocks) with the context
blocks constant along the inner dimension, so Mosaic keeps them resident
in VMEM across all sample blocks of a tile.

The older ``candidate_field`` (v2) is kept for reference/tests but loses
to the XLA path; v3 replaces it on the serving path.

``candidate_field`` (v2): the fused per-ray candidate computation — for every
sample of every ray, against the ray's candidate set (built by
NeuMesh.make_ray_context):

    d2        = |x|^2 + |v_c|^2 - 2 x.v_c            (VPU broadcast FMA)
    thr       = 8th-smallest d2                      (8 masked-min passes)
    W_c       = [d2 <= thr] / (sqrt(d2) + 1e-7), normalised
    h         = sum_c W_c (w1 (x.n_c - v_c.n_c) + d^3)/(w1 + d)
    grad_x h  = A @ n + (sum_c B_c) x - B @ v        (closed form)
    feats     = W @ feat_ctx                         (MXU, per-ray)

Everything for one ray block lives in VMEM. The XLA path round-trips the
(rays, samples, candidates) working set through HBM once per stage (the
8 masked-min passes alone move ~8x the d2 tensor); here the entire chain
runs out of VMEM and only the (rays, samples, ·) results are written back.

Selection semantics match NeuMesh._ctx_distance_parts exactly, including
its index-proportional tie-break (lowest index wins, the same stable
order as lax.top_k / the brute kNN).

v2 design notes (vs the retired per-ray-loop v1, which lost to XLA):
  - all VPU math is vectorised over the whole (rays_per_block, S, C)
    block — no unrolled per-ray Python loop;
  - rays_per_block adapts to S so each program keeps ~1k samples of
    work (small-S upsampling passes stay efficient);
  - the closed-form grad contractions over C are lane reductions, not
    N=3 matmuls (which would pad the MXU 128-wide for 3 columns);
  - density-only callers compile a variant without dh/ft (want_dh /
    feat_cols static args) so up-sampling passes skip unused outputs.

Forward-only: training keeps the XLA path (fully differentiable); the
kernel accelerates rendering/serving. Gated by NeuMesh(use_pallas=True).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xyz_ref, pts_ref, pp_ref, ind_ref, vn_ref, feat_ref, w1_ref,
            *out_refs, k: int, rb: int, want_dh: bool, n_feat: int):
    w1 = w1_ref[0, 0]
    x = xyz_ref[...]                    # (rb, S, 3)
    pts = pts_ref[...]                  # (rb, C, 3)
    pp = pp_ref[...]                    # (rb, 1, C)
    ind = ind_ref[...]                  # (rb, C, 3)
    vn = vn_ref[...]                    # (rb, 1, C)
    C = pts.shape[1]

    def bcast(a_rc3, d):                # (rb, C, 3)[..., d] -> (rb, 1, C)
        return a_rc3[:, :, d].reshape(a_rc3.shape[0], 1, C)

    xv = (x[..., 0:1] * bcast(pts, 0) + x[..., 1:2] * bcast(pts, 1)
          + x[..., 2:3] * bcast(pts, 2))                 # (rb, S, C)
    xx = jnp.sum(x * x, axis=-1, keepdims=True)          # (rb, S, 1)
    d2 = jnp.maximum(xx + pp - 2.0 * xv, 0.0)

    # k-th smallest with deterministic lowest-index tie-break (matches
    # the XLA path in NeuMesh._ctx_distance_parts)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, C), 2).astype(
        jnp.float32)
    d2_tb = d2 * (1.0 + iota * 2e-7)
    cur = d2_tb
    for _ in range(k):
        thr = jnp.min(cur, axis=-1, keepdims=True)
        cur = jnp.where(cur <= thr, jnp.inf, cur)
    mask = d2_tb <= thr

    # one sqrt serves both uses: sqrt(max(d2,1e-20)) == max(sqrt(d2),1e-10)
    # bit-exactly (sqrt is exactly rounded and monotone), so the f32
    # pallas==XLA parity pin is preserved
    d0 = jnp.sqrt(d2)
    d = jnp.maximum(d0, 1e-10)
    w_raw = jnp.where(mask, 1.0 / (d0 + 1e-7), 0.0)
    W = w_raw / jnp.sum(w_raw, axis=-1, keepdims=True)   # (rb, S, C)

    xn = (x[..., 0:1] * bcast(ind, 0) + x[..., 1:2] * bcast(ind, 1)
          + x[..., 2:3] * bcast(ind, 2))                 # (rb, S, C)
    inv = 1.0 / (w1 + d)
    term = w1 * (xn - vn) + d * d2                       # d^3
    ds_ref = out_refs[0]
    ds_ref[...] = jnp.sum(W * term * inv, axis=-1, keepdims=True)

    oi = 1
    if want_dh:
        # closed form: dh = A @ n + (sum_c B_c) x - B @ v, with
        # A = W w1 / (w1 + d); B = W (3 d^2 (w1+d) - term) / ((w1+d)^2 d)
        A = W * w1 * inv
        B = W * (3.0 * d2 * (w1 + d) - term) * inv * inv / d
        sB = jnp.sum(B, axis=-1, keepdims=True)          # (rb, S, 1)
        cols = []
        for dax in range(3):
            cols.append(jnp.sum(A * bcast(ind, dax), axis=-1, keepdims=True)
                        + sB * x[..., dax:dax + 1]
                        - jnp.sum(B * bcast(pts, dax), axis=-1,
                                  keepdims=True))
        out_refs[oi][...] = jnp.concatenate(cols, axis=-1)
        oi += 1

    if n_feat:
        feat = feat_ref[...]                             # (rb, C, F)
        fo = out_refs[oi]
        for r in range(rb):                              # MXU per ray
            fo[r] = jnp.dot(W[r], feat[r],
                            preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=(
    "k", "interpret", "rays_per_block", "want_dh", "want_feat"))
def candidate_field(xyz, pts, pp, ind, vn, feat, w1, k: int = 8,
                    interpret: bool = False, rays_per_block: int = 0,
                    want_dh: bool = True, want_feat: bool = True):
    """xyz: (R, S, 3); pts/ind: (R, C, 3); pp/vn: (R, C);
    feat: (R, C, F) (geometry columns first — see NeuMesh ctx["feat"]);
    w1 scalar. Returns (ds (R, S, 1), dh (R, S, 3) | None,
    feats (R, S, F) | None). R is padded to a rays_per_block multiple;
    rays_per_block=0 picks ~1024 samples of work per program."""
    R0, S, _ = xyz.shape
    C = pts.shape[1]
    F = feat.shape[-1] if want_feat else 0
    # ~512 samples of work per program: the unrolled min-loop keeps
    # several (rb, S, C) temporaries live on the VMEM stack (16MB limit)
    rb = rays_per_block or max(8, min(32, 512 // max(S, 1)))
    rb = min(rb, R0)
    pad = (-R0) % rb
    if pad:
        def padr(a):
            return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1),
                           mode="edge")
        xyz, pts, pp, ind, vn, feat = map(
            padr, (xyz, pts, pp, ind, vn, feat))
    R = R0 + pad
    w1_arr = jnp.full((1, 1), w1, jnp.float32)

    def row(i):
        return (i, 0, 0)

    out_specs = [pl.BlockSpec((rb, S, 1), row, memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((R, S, 1), jnp.float32)]
    if want_dh:
        out_specs.append(pl.BlockSpec((rb, S, 3), row,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((R, S, 3), jnp.float32))
    if want_feat:
        out_specs.append(pl.BlockSpec((rb, S, F), row,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((R, S, F), jnp.float32))

    out = pl.pallas_call(
        functools.partial(_kernel, k=k, rb=rb, want_dh=want_dh,
                          n_feat=F),
        grid=(R // rb,),
        in_specs=[
            pl.BlockSpec((rb, S, 3), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, C, 3), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1, C), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, C, 3), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1, C), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, C, max(F, 1)), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(xyz, pts, pp.reshape(R, 1, C), ind, vn.reshape(R, 1, C),
      feat if want_feat else jnp.zeros((R, C, 1), jnp.float32), w1_arr)

    ds = out[0][:R0]
    oi = 1
    dh = None
    if want_dh:
        dh = out[oi][:R0]
        oi += 1
    feats = out[oi][:R0] if want_feat else None
    return ds, dh, feats


# ---------------------------------------------------------------------------
# v3: candidate axis on lanes, tile-shared contexts, one MXU matmul per
# program for feature interpolation.
# ---------------------------------------------------------------------------

def _v3_kernel(w1_ref, xyz_ref, geo_ref, feat_ref, *out_refs,
               k: int, want_dh: bool, want_feat: bool):
    w1 = w1_ref[0]
    x = xyz_ref[0]                          # (Sblk, 3)
    geo = geo_ref[0]                        # (8, C)
    x0, x1, x2 = x[:, 0:1], x[:, 1:2], x[:, 2:3]     # (Sblk, 1)
    px, py, pz = geo[0:1, :], geo[1:2, :], geo[2:3, :]  # (1, C)
    ix, iy, iz = geo[3:4, :], geo[4:5, :], geo[5:6, :]
    pp, vn = geo[6:7, :], geo[7:8, :]
    C = geo.shape[1]

    xv = x0 * px + x1 * py + x2 * pz                 # (Sblk, C)
    xx = x0 * x0 + x1 * x1 + x2 * x2                 # (Sblk, 1)
    d2 = jnp.maximum(xx + pp - 2.0 * xv, 0.0)

    # k-th-smallest threshold with the deterministic lowest-index
    # tie-break of the XLA path (NeuMesh._ctx_distance_parts)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1).astype(
        jnp.float32)
    d2_tb = d2 * (1.0 + iota * 2e-7)
    cur = d2_tb
    for _ in range(k):
        thr = jnp.min(cur, axis=-1, keepdims=True)
        cur = jnp.where(cur <= thr, jnp.inf, cur)
    mask = d2_tb <= thr

    # one sqrt serves both uses: sqrt(max(d2,1e-20)) == max(sqrt(d2),1e-10)
    # bit-exactly (sqrt is exactly rounded and monotone), so the f32
    # pallas==XLA parity pin is preserved
    d0 = jnp.sqrt(d2)
    d = jnp.maximum(d0, 1e-10)
    w_raw = jnp.where(mask, 1.0 / (d0 + 1e-7), 0.0)
    W = w_raw / jnp.sum(w_raw, axis=-1, keepdims=True)  # (Sblk, C)

    xn = x0 * ix + x1 * iy + x2 * iz
    inv = 1.0 / (w1 + d)
    term = w1 * (xn - vn) + d * d2                   # d^3
    ds = jnp.sum(W * term * inv, axis=-1, keepdims=True)

    oi = 0
    if want_dh:
        # closed form: dh = A @ n + (sum_c B_c) x - B @ v
        A = W * (w1 * inv)
        B = W * (3.0 * d2 * (w1 + d) - term) * inv * inv / d
        sB = jnp.sum(B, axis=-1, keepdims=True)
        dhx = jnp.sum(A * ix - B * px, axis=-1, keepdims=True) + sB * x0
        dhy = jnp.sum(A * iy - B * py, axis=-1, keepdims=True) + sB * x1
        dhz = jnp.sum(A * iz - B * pz, axis=-1, keepdims=True) + sB * x2
        out_refs[oi][0] = jnp.concatenate([ds, dhx, dhy, dhz], axis=-1)
    else:
        out_refs[oi][0] = ds
    oi += 1
    if want_feat:
        # precision='highest': in-kernel MXU f32 dots otherwise truncate
        # inputs to bf16 (serving uses bf16 MLPs anyway; this keeps the
        # kernel exact for the f32 parity mode at negligible cost)
        out_refs[oi][0] = jnp.dot(W, feat_ref[0],
                                  preferred_element_type=jnp.float32,
                                  precision="highest")


@functools.partial(jax.jit, static_argnames=(
    "k", "interpret", "sample_block", "want_dh", "want_feat"))
def candidate_field_v3(xyz, geo, feat, w1, k: int = 8,
                       interpret: bool = False, sample_block: int = 256,
                       want_dh: bool = True, want_feat: bool = True):
    """Fused candidate-field evaluation (see module docstring).

    xyz:  (B, S, 3) sample points (B = rays or tiles; S = samples per B).
    geo:  (B, 8, C) packed candidate geometry rows [px py pz ix iy iz pp vn]
          (sentinel candidates use px=py=pz=1e9 -> never selected).
    feat: (B, C, F) candidate features (ignored unless want_feat).
    w1:   scalar indicator weight.

    Returns (ds (B, S, 1), dh (B, S, 3) | None, feats (B, S, F) | None).
    C should be a multiple of 128 (pad with sentinels); S is padded to the
    sample block internally.
    """
    B, S0, _ = xyz.shape
    C = geo.shape[2]
    F = feat.shape[-1] if want_feat else 0
    cpad = (-C) % 128
    if cpad:
        # sentinel candidates: pp = |v|^2 = +huge with v = 0 makes
        # d2 = |x|^2 + pp - 2 x.v ~ +huge, so sentinels are never
        # selected; 1e12 is huge vs real d2 (<~10) but keeps term =
        # d * d2 ~ 1e18 finite in f32 (1e30 overflows to inf and
        # 0 * inf = NaN in the weighted sums). (Do NOT put the sentinel in the position rows with
        # pp = 0: d2 would go hugely NEGATIVE for x.v > 0 and the clamp
        # at 0 would make the sentinel the NEAREST candidate.)
        fill = jnp.zeros((B, 8, cpad), jnp.float32)
        fill = fill.at[:, 6, :].set(1e12)
        geo = jnp.concatenate([geo, fill], axis=2)
        if want_feat:
            feat = jnp.pad(feat, ((0, 0), (0, cpad), (0, 0)))
        C += cpad
    sblk = min(sample_block, max(32, S0))
    pad = (-S0) % sblk
    if pad:
        xyz = jnp.pad(xyz, ((0, 0), (0, pad), (0, 0)), mode="edge")
    S = S0 + pad
    w1_arr = jnp.full((1,), w1, jnp.float32)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, sblk, 3), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, C), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C, max(F, 1)), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    d_cols = 4 if want_dh else 1
    out_specs = [pl.BlockSpec((1, sblk, d_cols), lambda i, j: (i, j, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((B, S, d_cols), jnp.float32)]
    if want_feat:
        out_specs.append(pl.BlockSpec((1, sblk, F), lambda i, j: (i, j, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, S, F), jnp.float32))

    out = pl.pallas_call(
        functools.partial(_v3_kernel, k=k, want_dh=want_dh,
                          want_feat=want_feat),
        grid=(B, S // sblk),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(w1_arr, xyz, geo,
      feat if want_feat else jnp.zeros((B, C, 1), jnp.float32))

    dsdh = out[0][:, :S0]
    ds = dsdh[..., 0:1]
    dh = dsdh[..., 1:4] if want_dh else None
    feats = out[1][:, :S0] if want_feat else None
    return ds, dh, feats


# ---------------------------------------------------------------------------
# Fully-fused field kernel: candidate math + positional embeddings +
# density MLP (+ scalar-tangent JVP for nablas) + color MLP, one program.
#
# Device traces of the v3-kernel render showed the remaining time going to
# embedding construction and MLP activations round-tripping HBM as
# (rays, samples, 160..256) tensors. Here a sample block never leaves
# VMEM: per program we compute the interpolated distance and kNN feature
# blend from the (8, C)/(C, F) context blocks, build d/fg/ft/view
# embeddings by the double-angle recursion in registers, and run the
# (folded weight-norm) MLPs on the MXU from VMEM-resident bf16 weights.
# HBM traffic per sample drops to xyz (+dirs) in, (sdf, nabla, rgb) out.
#
# The density tangent dD/dh (for nabla = dD/dh * grad h) is forward-mode:
# the fg features use detached kNN weights, so the only nonzero input
# tangent is through d_emb; each layer propagates t = (t @ W) * act'(pre).
# ---------------------------------------------------------------------------


def _emb_parts(x, n_freq: int):
    """[x, sin x, cos x, sin 2x, cos 2x, ...] by double-angle recursion."""
    parts = [x]
    if n_freq >= 1:
        s = jnp.sin(x)
        c = jnp.cos(x)
        parts += [s, c]
        for _ in range(n_freq - 1):
            s, c = 2.0 * s * c, c * c - s * s
            parts += [s, c]
    return parts


def _emb_parts_with_tangent(x, n_freq: int):
    """(parts, d parts / dx) for scalar-input embeddings."""
    parts = [x]
    dparts = [jnp.ones_like(x)]
    if n_freq >= 1:
        s, c = jnp.sin(x), jnp.cos(x)
        ds_, dc = c, -s
        parts += [s, c]
        dparts += [ds_, dc]
        for _ in range(n_freq - 1):
            s, c, ds_, dc = (2.0 * s * c, c * c - s * s,
                             2.0 * (ds_ * c + s * dc),
                             2.0 * (c * dc - s * ds_))
            parts += [s, c]
            dparts += [ds_, dc]
    return parts, dparts


def _cat(parts, axis=-1):
    """jnp.concatenate skipping None operands (disabled positional
    encodings, see _emb_cols n_freq<=0)."""
    parts = [p for p in parts if p is not None]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=axis)


def _emb_cols(x, n_freq: int, tangent: bool = False):
    """x (S, D) -> (S, D*2*n_freq) positional-encoding columns
    [sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...] (reference
    models/base.py:52-67 ordering) as ONE broadcasted sin over a tiled
    copy of x, using cos(z) = sin(z + pi/2). Building the same columns
    by concatenating per-frequency parts costs a lane relayout per
    piece — for scalar inputs that is 2*n_freq single-lane slivers.

    tangent=True additionally returns d(cols)/dx = freq*sin(z + pi/2).
    """
    import math

    D = x.shape[-1]
    if n_freq <= 0:
        # multires 0 disables the encoding (reference models/base.py
        # get_embedder identity mode). Mosaic rejects 0-sized vector
        # shapes, so the disabled case contributes no operand at all:
        # call sites concatenate via _cat, which skips None (ADVICE r3)
        return (None, None) if tangent else None
    xt = jnp.concatenate([x] * (2 * n_freq), axis=-1)    # (S, D*2F)
    j = jax.lax.broadcasted_iota(jnp.int32, (1, D * 2 * n_freq), 1)
    blk = j // D
    freq = jnp.exp2((blk // 2).astype(jnp.float32))
    phase = (blk % 2).astype(jnp.float32) * (math.pi / 2.0)
    z = xt * freq + phase
    cols = jnp.sin(z)
    if not tangent:
        return cols
    return cols, freq * jnp.sin(z + math.pi / 2.0)


def _emb_cols_rec(x, n_freq: int):
    """Same columns as _emb_cols via the double-angle recursion: 2
    transcendentals + 3 mults per freq step instead of 2*n_freq sins.
    Column order [sin(f0 x) (D), cos(f0 x) (D), sin(f1 x) (D), ...]
    matches _emb_cols. ~3e-5 abs error at n_freq=8 (same recursion the
    XLA serving embedder uses, see nn.get_embedder exact=False) — far
    below the bf16 cast error of the low-precision path it serves.
    Intended for WIDE inputs (feature embeddings): each freq contributes
    full (S, D) pieces, so the concat relayouts are cheap; scalar inputs
    keep the tiled-sin _emb_cols (2*n_freq single-lane slivers)."""
    if n_freq <= 0:
        return None
    # Mosaic legalizes vector transcendentals only at f32: take the base
    # sin/cos in f32 and run the (mult-only) recursion in the input dtype
    xf = x.astype(jnp.float32)
    s = jnp.sin(xf).astype(x.dtype)
    c = jnp.cos(xf).astype(x.dtype)
    parts = [s, c]
    for _ in range(n_freq - 1):
        s, c = 2.0 * s * c, c * c - s * s
        parts += [s, c]
    return jnp.concatenate(parts, axis=-1)


def _emb_cols_wide(x, n_freq: int, dtype):
    """Feature-embedding columns: exact tiled-sin in the f32 parity mode,
    double-angle recursion in low-precision serving (dtype set)."""
    if dtype is None:
        return _emb_cols(x, n_freq)
    return _emb_cols_rec(x, n_freq)


def _feat_dot(W, feat):
    """kNN feature blend W @ feat^T, contracting the trailing C dim of
    both operands (feat stored transposed (F, C) so its tiles carry no
    lane padding). Precision follows the FEAT dtype: the f32 parity mode
    runs a true-f32 pass; serving ships the feature table pre-cast to
    the serving dtype (field_fused), turning the 6-pass f32 'highest'
    MXU emulation into one bf16 pass. f32 accumulation either way."""
    if feat.dtype == jnp.float32:
        return jax.lax.dot_general(
            W, feat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision="highest")
    return jax.lax.dot_general(
        W.astype(feat.dtype), feat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _softplus100(x):
    bx = 100.0 * x
    return jnp.where(bx > 20.0, x, jax.nn.softplus(bx) / 100.0)


def _softplus100_grad(x):
    bx = 100.0 * x
    return jnp.where(bx > 20.0, 1.0, jax.nn.sigmoid(bx))


def _interp_distance(x0, x1, x2, geo, w1, k: int, want_dh: bool):
    """In-kernel interpolated-distance chain on (Sblk, 1) point columns
    against an (8, C) context block — or, rank-polymorphically, on
    (G, Sblk, 1) columns against (G, 8, C) blocks: grouped programs that
    unroll this chain per tile keep every elementwise op at thin
    (128, C) shapes (latency-bound, 21 Msamp/s); lifting the group axis
    into the arrays makes each op (G, Sblk, C) — G× the vector work per
    instruction at the same chain length (60 Msamp/s at 1024 rows,
    tools/kernel_micro.py secantshape). Same per-element op order in
    both ranks. Returns (ds, W[, dh cols])."""
    C = geo.shape[-1]
    if x0.ndim == 3:
        px, py, pz = geo[:, 0:1, :], geo[:, 1:2, :], geo[:, 2:3, :]
        ix, iy, iz = geo[:, 3:4, :], geo[:, 4:5, :], geo[:, 5:6, :]
        pp, vn = geo[:, 6:7, :], geo[:, 7:8, :]
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, C), 2).astype(jnp.float32)
    else:
        px, py, pz = geo[0:1, :], geo[1:2, :], geo[2:3, :]
        ix, iy, iz = geo[3:4, :], geo[4:5, :], geo[5:6, :]
        pp, vn = geo[6:7, :], geo[7:8, :]
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (1, C), 1).astype(jnp.float32)

    xv = x0 * px + x1 * py + x2 * pz
    xx = x0 * x0 + x1 * x1 + x2 * x2
    d2 = jnp.maximum(xx + pp - 2.0 * xv, 0.0)
    d2_tb = d2 * (1.0 + iota * 2e-7)

    if k == 1 and not want_dh:
        # nearest-tangent-plane fast path (the scan proxy): extract the
        # argmin candidate's terms with one one-hot reduction each, then
        # run the sqrt/divide chain — the expensive VPU transcendentals —
        # on a single (Sblk, 1) column instead of all C candidates. The
        # normalized weight of a 1-NN is exactly the one-hot mask.
        thr1 = jnp.min(d2_tb, axis=-1, keepdims=True)
        fm = (d2_tb <= thr1).astype(d2.dtype)       # exact one-hot
        xn1 = x0 * ix + x1 * iy + x2 * iz
        d2s = jnp.sum(fm * d2, axis=-1, keepdims=True)
        nvs = jnp.sum(fm * (xn1 - vn), axis=-1, keepdims=True)
        dsel = jnp.sqrt(jnp.maximum(d2s, 1e-20))
        ds1 = (w1 * nvs + dsel * d2s) / (w1 + dsel)  # (Sblk, 1)
        return ds1, fm

    cur = d2_tb
    for _ in range(k):
        thr = jnp.min(cur, axis=-1, keepdims=True)
        cur = jnp.where(cur <= thr, jnp.inf, cur)
    mask = d2_tb <= thr

    # one sqrt serves both uses: sqrt(max(d2,1e-20)) == max(sqrt(d2),1e-10)
    # bit-exactly (sqrt is exactly rounded and monotone), so the f32
    # pallas==XLA parity pin is preserved
    d0 = jnp.sqrt(d2)
    d = jnp.maximum(d0, 1e-10)
    w_raw = jnp.where(mask, 1.0 / (d0 + 1e-7), 0.0)
    W = w_raw / jnp.sum(w_raw, axis=-1, keepdims=True)

    xn = x0 * ix + x1 * iy + x2 * iz
    inv = 1.0 / (w1 + d)
    term = w1 * (xn - vn) + d * d2
    ds = jnp.sum(W * term * inv, axis=-1, keepdims=True)   # (Sblk, 1)
    if not want_dh:
        return ds, W
    A = W * (w1 * inv)
    B = W * (3.0 * d2 * (w1 + d) - term) * inv * inv / d
    sB = jnp.sum(B, axis=-1, keepdims=True)
    dhx = jnp.sum(A * ix - B * px, axis=-1, keepdims=True) + sB * x0
    dhy = jnp.sum(A * iy - B * py, axis=-1, keepdims=True) + sB * x1
    dhz = jnp.sum(A * iz - B * pz, axis=-1, keepdims=True) + sB * x2
    return ds, W, (dhx, dhy, dhz)


def _density_mlp(ds, fg, dens_ws, multires_d, multires_fg, dtype,
                 want_tangent: bool):
    """In-kernel density MLP on interpolated inputs. Returns
    (dens, d_emb[, dD/dh tangent]).

    One concatenated first-layer matmul: every extra operand of a split
    dot costs a full 128-deep MXU pass regardless of its K, so 6 small-K
    dots are ~3x the cost of one K=177 dot.

    Per-layer precision follows the WEIGHT dtype (selective-f32 serving,
    NeuMesh f32_layers): an f32 weight runs a true-f32 pass regardless of
    the global serving dtype; low-precision weights keep the whole layer
    (MXU output, bias add, activation) in the serving dtype — the f32
    writeback + per-layer f32->bf16 cast were pure VPU glue."""
    def dot(a, wm):
        if wm.dtype == jnp.float32:
            return jnp.dot(a.astype(jnp.float32), wm,
                           preferred_element_type=jnp.float32,
                           precision="highest")
        # Mosaic requires 32-bit matmul accumulators (bf16 acc is
        # rejected at verification); low-precision layers downcast at
        # the next layer's input cast instead
        return jnp.dot(a.astype(wm.dtype), wm,
                       preferred_element_type=jnp.float32)

    def dott(a, wm):
        # tangent-chain dots keep f32 accumulation/storage regardless of
        # the serving dtype: dD/dh feeds the nabla (surface normals /
        # color input) and bf16 storage across D layers compounds
        if wm.dtype == jnp.float32:
            return jnp.dot(a.astype(jnp.float32), wm,
                           preferred_element_type=jnp.float32,
                           precision="highest")
        return jnp.dot(a.astype(wm.dtype), wm,
                       preferred_element_type=jnp.float32)

    def badd(x, b):
        return x + b[0].astype(x.dtype)

    # materialise the weight refs once (callers may pass Refs or
    # values; [...] is the identity on plain arrays, and Ref tracers
    # masquerade as jnp arrays so isinstance cannot tell them apart)
    dens_ws = tuple(w[...] for w in dens_ws)
    n_dens = (len(dens_ws) - 3) // 2
    w0d, w0f, b0 = dens_ws[0], dens_ws[1], dens_ws[2]
    if dtype is not None:
        fg = fg.astype(dtype)  # embeddings + identity in the serving
        #                        dtype (the XLA serving path does the
        #                        same, NeuMesh._density_from_interp)
    if want_tangent:
        dcols, ddcols = _emb_cols(ds, multires_d, tangent=True)
        t = dott(_cat([jnp.ones_like(ds), ddcols]), w0d)
    else:
        dcols = _emb_cols(ds, multires_d)
    d_emb = _cat([ds, dcols])                            # (Sblk, 17)
    # split first-layer dot: the wide fg embedding feeds its own dot
    # instead of being concatenated into a misaligned (Sblk, 177)
    # operand (the concat costs a lane relayout of the 128-col piece;
    # K=49 + K=128 is the same two MXU passes as K=177)
    fg_emb = _emb_cols_wide(fg, multires_fg, dtype)
    head = _cat([ds, dcols, fg])                         # (Sblk, 49)
    nfg = fg.shape[-1]
    w_head = jnp.concatenate([w0d, w0f[:nfg]], axis=0)
    pre = badd(dot(head, w_head), b0)
    if fg_emb is not None:
        pre = pre + dot(fg_emb, w0f[nfg:]).astype(pre.dtype)
    h = _softplus100(pre)
    if want_tangent:
        t = t * _softplus100_grad(pre).astype(jnp.float32)
    wi = 3
    for _ in range(n_dens - 1):
        wl, bl = dens_ws[wi], dens_ws[wi + 1]
        wi += 2
        pre = badd(dot(h, wl), bl)
        h = _softplus100(pre)
        if want_tangent:
            t = dott(t, wl) * _softplus100_grad(pre).astype(jnp.float32)
    wh, bh = dens_ws[wi], dens_ws[wi + 1]
    dens = badd(dot(h, wh), bh).astype(jnp.float32)  # (Sblk, 1)
    if not want_tangent:
        return dens, d_emb
    return dens, d_emb, dott(t, wh).astype(jnp.float32)


def _field_kernel(w1_ref, xyz_ref, dirs_ref, geo_ref, feat_ref, *refs,
                  k: int, n_dens: int, n_col: int, want: str,
                  multires_d: int, multires_fg: int, multires_ft: int,
                  multires_view: int, geometry_dim: int, dtype,
                  group: int = 1):
    """refs = [dens weights..., color weights..., out rows...].

    xyz/dirs arrive TRANSPOSED as (8, Sblk) blocks (samples on the
    128-lane dim) and outputs leave as (1, Sblk) rows: a (B, S, 3)
    f32 operand/result of a TPU custom call is tiled T(8, 128) on its
    last two dims — a 43x memory/bandwidth blowup that OOMs large ray
    batches. The (8, Sblk)->(Sblk, 8) transposes here are exact
    in-register relayouts.

    group > 1 batches `group` tiles per program (final-eval fast path,
    where Sblk == the tile size): candidate interpolation stays per-tile
    but the MLPs — the MXU work — run once on the group*Sblk stacked
    rows; T=128-row matmuls underutilize the systolic array. Bit-exact
    per row vs group=1 (row-batching a matmul is exact)."""
    w1 = w1_ref[0]
    G = group
    want_nabla = want in ("density_nabla", "full")

    if want == "distance":
        # interpolated distance only (surface-scan fast path): no kNN
        # feature blend, no MLP — ~3x the density throughput. Only row 0
        # of the output block is written (rows 1-7 stay undefined; the
        # host slices n_out=1 rows).
        for g in range(G):
            x = xyz_ref[g].T                         # (Sblk, 8)
            ds, _ = _interp_distance(x[:, 0:1], x[:, 1:2], x[:, 2:3],
                                     geo_ref[g], w1, k, False)
            refs[-1][g, 0:1, :] = ds.T
        return

    def cat0(parts):
        return parts[0] if G == 1 else jnp.concatenate(parts, axis=0)

    if G > 1:
        # 3D-vectorized grouped interpolation (see _interp_distance):
        # every elementwise op runs at (G, Sblk, C) instead of a per-g
        # chain of thin (Sblk, C) ops; only the per-tile feature
        # matmuls stay unrolled (Mosaic dots are 2-D). Row-exact vs the
        # G == 1 path.
        Sb = xyz_ref.shape[2]
        x0 = jnp.swapaxes(xyz_ref[:, 0:1, :], 1, 2)   # (G, Sblk, 1)
        x1 = jnp.swapaxes(xyz_ref[:, 1:2, :], 1, 2)
        x2 = jnp.swapaxes(xyz_ref[:, 2:3, :], 1, 2)
        if want_nabla:
            ds3, W3, dh3 = _interp_distance(
                x0, x1, x2, geo_ref[...], w1, k, True)
            dhx = dh3[0].reshape(G * Sb, 1)
            dhy = dh3[1].reshape(G * Sb, 1)
            dhz = dh3[2].reshape(G * Sb, 1)
        else:
            ds3, W3 = _interp_distance(x0, x1, x2, geo_ref[...], w1, k,
                                       False)
        ds = ds3.reshape(G * Sb, 1)
        feats = jnp.concatenate(
            [_feat_dot(W3[g], feat_ref[g]) for g in range(G)],
            axis=0)                                  # (G*Sblk, F)
    else:
        ds_p, W_p, dh_p, feats_p = [], [], [], []
        for g in range(G):
            x = xyz_ref[g].T                         # (Sblk, 8)
            x0, x1, x2 = x[:, 0:1], x[:, 1:2], x[:, 2:3]
            if want_nabla:
                ds_g, W_g, dh_g = _interp_distance(
                    x0, x1, x2, geo_ref[g], w1, k, True)
                dh_p.append(dh_g)
            else:
                ds_g, W_g = _interp_distance(x0, x1, x2, geo_ref[g], w1,
                                             k, False)
            # kNN feature blend: one MXU matmul against the context
            # features (see _feat_dot)
            feats_p.append(_feat_dot(W_g, feat_ref[g]))  # (Sblk, F)
            ds_p.append(ds_g)
            W_p.append(W_g)
        ds = cat0(ds_p)
        feats = cat0(feats_p)
        if want_nabla:
            dhx = cat0([p[0] for p in dh_p])
            dhy = cat0([p[1] for p in dh_p])
            dhz = cat0([p[2] for p in dh_p])
    fg = feats[:, :geometry_dim]
    ft = feats[:, geometry_dim:] if want == "full" else None

    def dot2(a, wm):
        # per-layer precision follows the weight dtype (see _density_mlp)
        if wm.dtype == jnp.float32:
            return jnp.dot(a.astype(jnp.float32), wm,
                           preferred_element_type=jnp.float32,
                           precision="highest")
        return jnp.dot(a.astype(wm.dtype), wm,
                       preferred_element_type=jnp.float32)

    def badd2(x, b):
        return x + b[...][0].astype(x.dtype)

    ri = 0
    dens_ws = refs[ri:ri + 2 * (n_dens + 1) + 1]
    ri += 2 * (n_dens + 1) + 1
    col_ws = refs[ri:ri + 2 * (n_col + 1)] if want == "full" else ()

    if want_nabla:
        dens, d_emb, dDdh = _density_mlp(
            ds, fg, dens_ws, multires_d, multires_fg, dtype, True)
        nx, ny, nz = dDdh * dhx, dDdh * dhy, dDdh * dhz
    else:
        dens, d_emb = _density_mlp(
            ds, fg, dens_ws, multires_d, multires_fg, dtype, False)

    Sblk = ds.shape[0] // G

    def emit(cols):
        # stack the (G*Sblk, 1) result columns and transpose once per
        # tile to the (8, Sblk) output rows (a 2D (1, Sblk) per-component
        # output would need a block with second-minor dim 1, which Mosaic
        # rejects; the unused rows of the density-only variant cost
        # ~0.05 ms/pass of HBM writes at 4096 rays)
        cols = cols + [jnp.zeros_like(dens)] * (8 - len(cols))
        stacked = jnp.concatenate(cols, axis=-1)         # (G*Sblk, 8)
        for g in range(G):
            refs[-1][g] = stacked[g * Sblk:(g + 1) * Sblk].T

    if want == "density":
        emit([dens])
        return
    if want == "density_nabla":
        emit([dens, nx, ny, nz])
        return

    # ---- color MLP: [nabla, d_emb, view_emb, ft_emb] @ W0 ...
    # col_ws = [w0 (full first-layer weight), b0, w1, b1, ..., wh, bh]
    vdir = cat0([dirs_ref[g].T[:, 0:3] for g in range(G)])  # (G*Sblk, 3)
    cw0, cb0 = col_ws[0][...], col_ws[1]
    # split first-layer dot (see _density_mlp): the wide ft embedding
    # gets its own dot instead of a misaligned 207-col concat
    if dtype is not None:
        ft = ft.astype(dtype)
    ft_emb = _emb_cols_wide(ft, multires_ft, dtype)
    col_head = _cat(
        [nx, ny, nz, d_emb, vdir, _emb_cols(vdir, multires_view),
         ft])                                            # (Sblk, 79)
    nh = col_head.shape[-1]
    pre = badd2(dot2(col_head, cw0[:nh]), cb0)
    if ft_emb is not None:
        pre = pre + dot2(ft_emb, cw0[nh:]).astype(pre.dtype)
    hcol = jnp.maximum(pre, 0.0)
    wi = 2
    for _ in range(n_col - 1):
        wl, bl = col_ws[wi], col_ws[wi + 1]
        wi += 2
        hcol = jnp.maximum(badd2(dot2(hcol, wl[...]), bl), 0.0)
    cwh, cbh = col_ws[wi], col_ws[wi + 1]
    rgb = jax.nn.sigmoid(
        badd2(dot2(hcol, cwh[...]), cbh).astype(jnp.float32))
    emit([dens, nx, ny, nz,
          rgb[:, 0:1], rgb[:, 1:2], rgb[:, 2:3]])


def pack_ctx_geo(ctx):
    """(B, 8, C) packed geometry block from a ray/tile context dict."""
    pts_t = jnp.swapaxes(ctx["pts"], -1, -2)         # (B, 3, C)
    ind_t = jnp.swapaxes(ctx["ind"], -1, -2)         # (B, 3, C)
    return jnp.concatenate(
        [pts_t, ind_t, ctx["pp"][:, None, :], ctx["vn"][:, None, :]],
        axis=1)


@functools.partial(jax.jit, static_argnames=(
    "k", "interpret", "sample_block", "want", "multires_d", "multires_fg",
    "multires_ft", "multires_view", "geometry_dim", "dtype", "group"))
def field_fused(xyz, geo, feat, w1, dens_ws, col_ws=None, dirs=None, *,
                k: int = 8, want: str = "density", multires_d: int = 8,
                multires_fg: int = 2, multires_ft: int = 2,
                multires_view: int = 4, geometry_dim: int = 32,
                dtype=None, sample_block: int = 256,
                interpret: bool = False, group: int = 1):
    """Fused NeuMesh field evaluation (see _field_kernel block comment).

    xyz: (B, S, 3); geo: (B, 8, C) packed candidate geometry; feat:
    (B, C, F) candidate features (F = geometry_dim for density wants,
    geometry+color dims for 'full'); w1 scalar.
    dens_ws: (w0d (d_emb, W), w0f (fg_emb, W), b0 (1, W), [Wi (W, W),
    bi (1, W)]..., w_head (W, 1), b_head (1, 1)) — weight-norm already
    folded, cast to `dtype` by the caller for low-precision serving.
    col_ws (want='full'): (w0 (3+d_emb+view_emb+ft_emb, W), b0, [Wi, bi]...,
    w_head (W, 3), b_head (1, 3)); color input order [nabla, d_emb,
    view_emb, ft_emb] (reference neumesh.py:239-260, nablas enabled).

    Returns a list of (B, S) f32 arrays: [sdf] (density),
    [sdf, nx, ny, nz] (density_nabla), [sdf, nx, ny, nz, r, g, b] (full).

    Layout contract (see _field_kernel): xyz/dirs are shipped transposed
    as (B, 8, S) (zero-padded rows 3..7), feat transposed as (B, F, C),
    and each result component is its own (B, S) array — every custom-call
    operand/result then tiles T(8, 128) with no padding blowup. The
    naive (B, S, 3)/(B, S, cols) layouts cost 16-43x padded HBM and OOM
    at 65536 rays.
    """
    B, S0, _ = xyz.shape
    C = geo.shape[2]
    F = feat.shape[-1]
    cpad = (-C) % 128
    if cpad:
        # see candidate_field_v3: sentinel = (v=0, pp=+huge), NOT v=1e9
        fill = jnp.zeros((B, 8, cpad), jnp.float32)
        fill = fill.at[:, 6, :].set(1e12)
        geo = jnp.concatenate([geo, fill], axis=2)
        feat = jnp.pad(feat, ((0, 0), (0, cpad), (0, 0)))
        C += cpad
    sblk = min(sample_block, max(32, S0))
    pad = (-S0) % sblk
    if pad:
        xyz = jnp.pad(xyz, ((0, 0), (0, pad), (0, 0)), mode="edge")
        if dirs is not None:
            dirs = jnp.pad(dirs, ((0, 0), (0, pad), (0, 0)), mode="edge")
    S = S0 + pad
    w1_arr = jnp.full((1,), w1, jnp.float32)

    def t8(a):
        """(B, S, 3) -> (B, 8, S)."""
        return jnp.pad(jnp.swapaxes(a, 1, 2), ((0, 0), (0, 5), (0, 0)))

    xq = t8(xyz)
    if dtype is not None:
        # ship the feature table pre-cast to the serving dtype: the
        # in-kernel blend then runs one bf16 MXU pass (see _feat_dot)
        # and the table's VMEM/DMA footprint halves
        feat = feat.astype(dtype)
    feat_t = jnp.swapaxes(feat, 1, 2)                # (B, F, C)

    dens_ws = tuple(dens_ws) if want != "distance" else ()
    n_dens = (len(dens_ws) - 3) // 2 if dens_ws else 0
    if want == "full":
        assert col_ws is not None and dirs is not None
        n_col = (len(col_ws) - 2) // 2
        col_ws = tuple(col_ws)
        dq = t8(dirs)
    else:
        n_col = 0
        col_ws = ()
        dq = jnp.zeros((B, 8, 1), jnp.float32)
    n_out = {"distance": 1, "density": 1, "density_nabla": 4,
             "full": 7}[want]

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    G = max(1, min(int(group), B))
    while B % G:
        G -= 1

    dirs_spec = (pl.BlockSpec((G, 8, sblk), lambda i, j: (i, 0, j),
                              memory_space=pltpu.VMEM)
                 if want == "full" else
                 pl.BlockSpec((G, 8, 1), lambda i, j: (i, 0, 0),
                              memory_space=pltpu.VMEM))
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((G, 8, sblk), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),
        dirs_spec,
        pl.BlockSpec((G, 8, C), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((G, F, C), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [const_spec(a) for a in dens_ws] + [const_spec(a) for a in col_ws]

    out = pl.pallas_call(
        functools.partial(
            _field_kernel, k=k, n_dens=n_dens, n_col=n_col, want=want,
            multires_d=multires_d, multires_fg=multires_fg,
            multires_ft=multires_ft, multires_view=multires_view,
            geometry_dim=geometry_dim, dtype=dtype, group=G),
        grid=(B // G, S // sblk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((G, 8, sblk), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8, S), jnp.float32),
        interpret=interpret,
        # grouped programs unroll G per-tile interpolations (see
        # secant_refine)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024) if G > 1 else None,
        name=f"field_fused_{want}",  # per-want trace attribution
    )(w1_arr, xq, dq, geo, feat_t, *dens_ws, *col_ws)
    return [out[:, i, :S0] for i in range(n_out)]


# ---------------------------------------------------------------------------
# Fully-fused surface location: the ENTIRE root-finding pipeline of the
# surface render — N-step sign-change scan on the interpolated mesh
# distance, first-crossing bracket extraction, density re-bracketing, and
# all secant iterations on the density MLP — in ONE kernel program per
# ray tile. Replaces a scan field_fused launch (S/sblk programs per
# tile), XLA bracket bookkeeping, two re-bracket launches, and the
# secant_refine launch: the per-program fixed cost amortizes over
# ~30 field evaluations instead of 1-6, and no intermediate (R, N_steps)
# tensors round-trip HBM. Semantics mirror
# render.ray_casting.root_finding_surface_points with
# refine_query_fn=density exactly (reference ray_casting.py:45-200).
# ---------------------------------------------------------------------------


def _locate_kernel(w1_ref, od_ref, geo_ref, feat_ref, *refs,
                   k: int, n_steps: int, n_secant: int, multires_d: int,
                   multires_fg: int, geometry_dim: int, dtype,
                   logit_tau: float):
    """od rows: [ox oy oz dx dy dz near far]; refs = [dens weights..., out].
    Output rows: [d_pred, mask, mask_sign_change, val0_pos, 0...]."""
    w1 = w1_ref[0]
    od = od_ref[0].T                                   # (T, 8)
    o0, o1, o2 = od[:, 0:1], od[:, 1:2], od[:, 2:3]
    r0, r1, r2 = od[:, 3:4], od[:, 4:5], od[:, 5:6]
    near, far = od[:, 6:7], od[:, 7:8]
    geo = geo_ref[0]
    dens_ws = refs[:-1]
    step = (far - near) / max(n_steps - 1, 1)

    def dist_at(dv):
        x0 = o0 + dv * r0
        x1 = o1 + dv * r1
        x2 = o2 + dv * r2
        ds, _ = _interp_distance(x0, x1, x2, geo, w1, k, False)
        return ds - logit_tau

    def dens_at(dv):
        x0 = o0 + dv * r0
        x1 = o1 + dv * r1
        x2 = o2 + dv * r2
        ds, W = _interp_distance(x0, x1, x2, geo, w1, k, False)
        fg = _feat_dot(W, feat_ref[0])[:, :geometry_dim]
        dens, _ = _density_mlp(ds, fg, dens_ws, multires_d, multires_fg,
                               dtype, False)
        return dens - logit_tau

    # ---- sign-change scan on the distance proxy: first pos->neg
    # crossing (reference cost-matrix argmin picks the EARLIEST change;
    # d_high/f_high = the earlier/outside endpoint). All state carried as
    # f32 0/1 flags — Mosaic cannot round-trip i1 vectors through the
    # loop (arith.trunci i8->i1 is unsupported).
    f_prev = dist_at(near)
    d_prev = near
    one = jnp.ones_like(f_prev)
    zero = jnp.zeros_like(f_prev)
    val0_pos = jnp.where(f_prev > 0, one, zero)
    found = zero
    pos2neg = zero
    d_high = near
    f_high = one
    d_low = far
    f_low = -one
    for j in range(1, n_steps):
        dv = near + step * j
        f_cur = dist_at(dv)
        crossed = jnp.where(jnp.sign(f_prev) * jnp.sign(f_cur) < 0,
                            one, zero)
        cross = crossed * (1.0 - found)                # first crossing
        d_high = d_high + cross * (d_prev - d_high)
        f_high = f_high + cross * (f_prev - f_high)
        d_low = d_low + cross * (dv - d_low)
        f_low = f_low + cross * (f_cur - f_low)
        pos2neg = pos2neg + cross * jnp.where(f_prev > 0, one, zero)
        found = found + cross
        d_prev = dv
        f_prev = f_cur
    mask = found * pos2neg * val0_pos

    # ---- re-bracket the true density at half-step-widened endpoints
    # (ray_casting.root_finding_surface_points refine_query_fn branch)
    d_high_w = jnp.maximum(d_high - 0.5 * step, near)
    d_low_w = jnp.minimum(d_low + 0.5 * step, far)
    f_high_r = dens_at(d_high_w)
    f_low_r = dens_at(d_low_w)
    okf = jnp.where((f_high_r > 0) & (f_low_r < 0), one, zero)
    f_high = f_high + okf * (f_high_r - f_high)
    f_low = f_low + okf * (f_low_r - f_low)
    d_high = d_high + okf * (d_high_w - d_high)
    d_low = d_low + okf * (d_low_w - d_low)

    # ---- secant iterations on the density (run_secant_method exactly)
    def pred():
        denom = f_high - f_low
        denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        return -f_low * (d_high - d_low) / denom + d_low

    d_pred = pred()
    for _ in range(n_secant):
        f_mid = dens_at(d_pred)
        ind_low = f_mid < 0
        d_low = jnp.where(ind_low, d_pred, d_low)
        f_low = jnp.where(ind_low, f_mid, f_low)
        d_high = jnp.where(~ind_low, d_pred, d_high)
        f_high = jnp.where(~ind_low, f_mid, f_high)
        d_pred = pred()

    zeros = jnp.zeros_like(d_pred)
    refs[-1][0] = jnp.concatenate(
        [d_pred, mask, found, val0_pos,
         zeros, zeros, zeros, zeros], axis=-1).T       # (8, T)


@functools.partial(jax.jit, static_argnames=(
    "k", "n_steps", "n_secant", "multires_d", "multires_fg",
    "geometry_dim", "dtype", "tile", "logit_tau", "interpret"))
def surface_locate(rays_o, rays_d, near, far, geo, feat, w1, dens_ws, *,
                   n_steps: int = 24, n_secant: int = 6, k: int = 8,
                   multires_d: int = 8, multires_fg: int = 2,
                   geometry_dim: int = 32, dtype=None, tile: int = 1,
                   logit_tau: float = 0.0, interpret: bool = False):
    """Fused surface-root location (see _locate_kernel).

    rays_o/d: (R, 3) in binding order (R//tile contexts); near/far: (R,).
    Returns (d_pred (R,), mask (R,) bool, mask_sign_change (R,) bool,
    val0_pos (R,) bool)."""
    R = rays_o.shape[0]
    B = geo.shape[0]
    T = R // B
    C = geo.shape[2]
    cpad = (-C) % 128
    if cpad:
        fill = jnp.zeros((B, 8, cpad), jnp.float32)
        fill = fill.at[:, 6, :].set(1e12)
        geo = jnp.concatenate([geo, fill], axis=2)
        feat = jnp.pad(feat, ((0, 0), (0, cpad), (0, 0)))

    def rows8(cols):
        m = jnp.stack(cols, axis=-1)                   # (R, n)
        m = jnp.pad(m, ((0, 0), (0, 8 - m.shape[-1])))
        return jnp.swapaxes(m.reshape(B, T, 8), 1, 2)

    od = rows8([rays_o[:, 0], rays_o[:, 1], rays_o[:, 2],
                rays_d[:, 0], rays_d[:, 1], rays_d[:, 2],
                near, far])
    w1_arr = jnp.full((1,), w1, jnp.float32)
    dens_ws = tuple(dens_ws)
    if dtype is not None:
        feat = feat.astype(dtype)  # see field_fused
    feat_t = jnp.swapaxes(feat, 1, 2)                  # (B, F, C)

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(
            _locate_kernel, k=k, n_steps=n_steps, n_secant=n_secant,
            multires_d=multires_d, multires_fg=multires_fg,
            geometry_dim=geometry_dim, dtype=dtype, logit_tau=logit_tau),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, T), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, C + cpad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, feat.shape[-1], C + cpad),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ] + [const_spec(a) for a in dens_ws],
        out_specs=pl.BlockSpec((1, 8, T), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8, T), jnp.float32),
        interpret=interpret,
    )(w1_arr, od, geo, feat_t, *dens_ws)
    d_pred = out[:, 0, :].reshape(R)
    mask = out[:, 1, :].reshape(R) > 0.5
    sign_change = out[:, 2, :].reshape(R) > 0.5
    val0_pos = out[:, 3, :].reshape(R) > 0.5
    return d_pred, mask, sign_change, val0_pos


# ---------------------------------------------------------------------------
# Fused secant refinement: all N secant iterations of the surface-render
# root refinement in ONE kernel program per ray tile. The alternative —
# one host-level field_fused call per iteration — launches B programs of
# `tile` samples per iteration, and the per-program fixed cost dominated
# the refinement (~1/4 of the surface frame).
# ---------------------------------------------------------------------------


def _secant_kernel(w1_ref, od_ref, br_ref, geo_ref, feat_ref, *refs,
                   k: int, n_iters: int, multires_d: int, multires_fg: int,
                   geometry_dim: int, dtype, logit_tau: float,
                   group: int = 1, rebracket: bool = False,
                   frozen: bool = False):
    """od rows: [ox oy oz dx dy dz 0 0]; br rows: [d_low d_high f_low
    f_high d_low_w d_high_w 0 0]; refs = [dens weights..., out]. Mirrors
    render.ray_casting.run_secant_method exactly.

    group > 1 batches `group` tiles per program: candidate interpolation
    stays per-tile (each tile has its own geo/feat context) but the
    density MLP — the MXU work — runs ONCE per iteration on the
    group*T stacked rows, amortizing the per-program fixed cost and
    filling the systolic array (T=128-row matmuls underutilize it).
    Row-batching a matmul is exact per row, so results are bit-identical
    to group=1.

    rebracket=True folds the density re-bracketing of the distance-proxy
    scan (render.ray_casting.root_finding_surface_points's
    refine_query_fn block) into the same program: two in-register density
    passes at the half-step-widened endpoints [d_low_w, d_high_w] replace
    two whole-frame field launches, falling back to the proxy bracket
    where the true field does not straddle the root.

    frozen=True (serving approximation, quality-gated): the per-ray
    top-k candidate SELECTION is computed once, at the bracket midpoint,
    instead of at every density eval. All evals lie within ~one scan
    step of each other, so the 8-NN set is almost always identical
    across them; freezing it lets every per-candidate quantity be
    factored as a quadratic in the ray depth d —
        |o + d·r − p|² = A + 2dB + d²,   (x·n − vn) = E + dF
    with (A, B, E, F) extracted to (T, k) columns via the selection
    one-hots. Each of the ~n_iters+2 density evals then runs its
    sqrt/divide/weight chain on k=8 columns instead of all C=128 — the
    wide per-eval work drops to the k one-hot FMAs that rebuild the
    (T, C) weight row for the feature matmul."""
    w1 = w1_ref[0]
    G = group
    T = od_ref.shape[2]
    dens_ws = refs[:-1]
    odt = [od_ref[g].T for g in range(G)]              # (T, 8) each
    brt = [br_ref[g].T for g in range(G)]

    def cat(mats, j):
        cols = [m[:, j:j + 1] for m in mats]
        return cols[0] if G == 1 else jnp.concatenate(cols, axis=0)

    o0, o1, o2 = cat(odt, 0), cat(odt, 1), cat(odt, 2)   # (G*T, 1)
    r0, r1, r2 = cat(odt, 3), cat(odt, 4), cat(odt, 5)
    d_low, d_high = cat(brt, 0), cat(brt, 1)
    f_low, f_high = cat(brt, 2), cat(brt, 3)

    def field_full(d_eval):
        """Density at o + d_eval·r, (G·T, 1) rows (per-tile candidate
        interpolation, one stacked MLP pass — the iteration body)."""
        x0 = o0 + d_eval * r0
        x1 = o1 + d_eval * r1
        x2 = o2 + d_eval * r2
        ds_parts, fg_parts = [], []
        for g in range(G):
            sl = slice(g * T, (g + 1) * T)
            ds_g, W_g = _interp_distance(x0[sl], x1[sl], x2[sl],
                                         geo_ref[g], w1, k, False)
            fg_g = _feat_dot(W_g, feat_ref[g])[:, :geometry_dim]
            ds_parts.append(ds_g)
            fg_parts.append(fg_g)
        ds = ds_parts[0] if G == 1 else jnp.concatenate(ds_parts, axis=0)
        fg = fg_parts[0] if G == 1 else jnp.concatenate(fg_parts, axis=0)
        f, _ = _density_mlp(ds, fg, dens_ws, multires_d, multires_fg,
                            dtype, False)
        return f - logit_tau

    if G > 1 and not frozen:
        # 3D-vectorized grouped interpolation: the per-g loop above
        # keeps every elementwise op at (T=128, C) — a latency-bound
        # serial chain of thin ops that measured 21 Msamp/s vs
        # 60 Msamp/s for 1024-row blocks (tools/kernel_micro.py
        # secantshape). Lifting the group axis into the arrays makes
        # each op (G, T, C) — G× the vector work per instruction at the
        # same chain length. Math and per-element op order mirror
        # _interp_distance exactly (grouped == ungrouped to 1e-6,
        # tests/test_surface_render.py); only the tiny per-tile feature
        # matmuls stay unrolled (Mosaic dots are 2-D).
        o0_3 = jnp.swapaxes(od_ref[:, 0:1, :], 1, 2)   # (G, T, 1)
        o1_3 = jnp.swapaxes(od_ref[:, 1:2, :], 1, 2)
        o2_3 = jnp.swapaxes(od_ref[:, 2:3, :], 1, 2)
        r0_3 = jnp.swapaxes(od_ref[:, 3:4, :], 1, 2)
        r1_3 = jnp.swapaxes(od_ref[:, 4:5, :], 1, 2)
        r2_3 = jnp.swapaxes(od_ref[:, 5:6, :], 1, 2)
        def field_full(d_eval):  # noqa: F811
            de3 = d_eval.reshape(G, T, 1)
            x0 = o0_3 + de3 * r0_3
            x1 = o1_3 + de3 * r1_3
            x2 = o2_3 + de3 * r2_3
            ds3, W = _interp_distance(x0, x1, x2, geo_ref[...], w1, k,
                                      False)
            ds = ds3.reshape(G * T, 1)
            fg = jnp.concatenate([
                _feat_dot(W[g], feat_ref[g])[:, :geometry_dim]
                for g in range(G)], axis=0)
            f, _ = _density_mlp(ds, fg, dens_ws, multires_d,
                                multires_fg, dtype, False)
            return f - logit_tau

    if frozen:
        # one-time per-tile top-k selection at the bracket midpoint
        # (the WIDENED bracket when the re-bracket is folded in, so the
        # rebracket endpoints lie inside the selection's validity range)
        if rebracket:
            d_mid = 0.5 * (cat(brt, 4) + cat(brt, 5))
        else:
            d_mid = 0.5 * (d_low + d_high)
        sel = []
        for g in range(G):
            sl = slice(g * T, (g + 1) * T)
            geo = geo_ref[g]
            px, py, pz = geo[0:1, :], geo[1:2, :], geo[2:3, :]
            ix, iy, iz = geo[3:4, :], geo[4:5, :], geo[5:6, :]
            vn = geo[7:8, :]
            C = geo.shape[1]
            o0g, o1g, o2g = o0[sl], o1[sl], o2[sl]
            r0g, r1g, r2g = r0[sl], r1[sl], r2[sl]
            dm = d_mid[sl]
            # quadratic factorization CENTERED at the bracket midpoint
            # (δ = d − d_mid): |x_mid + δ·r − p|² = A + 2δB + δ² with A
            # built from direct (x_mid − p) differences — every term is
            # bracket-scale, so the f32 reconstruction error is ~100×
            # smaller than factoring around the ray origin (|o−p|² ≈ 9,
            # cross ≈ −15 would cancel to a ~0.1-sized result)
            dx = (o0g + dm * r0g) - px
            dy = (o1g + dm * r1g) - py
            dz = (o2g + dm * r2g) - pz
            Aq = dx * dx + dy * dy + dz * dz       # |x_mid − p|²
            Bq = dx * r0g + dy * r1g + dz * r2g    # (x_mid − p)·r
            Eq = ((o0g + dm * r0g) * ix + (o1g + dm * r1g) * iy
                  + (o2g + dm * r2g) * iz) - vn    # x_mid·n − vn
            Fq = r0g * ix + r1g * iy + r2g * iz    # r·n
            # pad columns carry pp=1e12 in row 6 but zero positions —
            # rebuild their sentinel distance so they are never selected
            d2m = Aq + geo[6:7, :] * (geo[6:7, :] >= 1e11).astype(
                jnp.float32)
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (1, C), 1).astype(jnp.float32)
            cur = d2m * (1.0 + iota * 2e-7)
            masks = []
            for _ in range(k):
                thr = jnp.min(cur, axis=-1, keepdims=True)
                fm = (cur <= thr).astype(jnp.float32)    # exact one-hot
                cur = jnp.where(fm > 0.0, jnp.inf, cur)
                masks.append(fm)

            def pick(q):
                return jnp.concatenate(
                    [jnp.sum(m * q, axis=-1, keepdims=True)
                     for m in masks], axis=-1)           # (T, k)

            sel.append((masks, pick(Aq), pick(Bq), pick(Eq), pick(Fq),
                        dm))

        def field(d_eval):
            ds_parts, fg_parts = [], []
            for g in range(G):
                masks, A8, B8, E8, F8, dm = sel[g]
                de = d_eval[g * T:(g + 1) * T] - dm
                d2 = jnp.maximum(A8 + (2.0 * de) * B8 + de * de, 1e-20)
                d = jnp.sqrt(d2)                                # (T, k)
                w_raw = 1.0 / (d + 1e-7)
                W8 = w_raw / jnp.sum(w_raw, axis=-1, keepdims=True)
                term = w1 * (E8 + de * F8) + d * d2
                ds_g = jnp.sum(W8 * term / (w1 + d), axis=-1,
                               keepdims=True)
                # weight row back in candidate space for the MXU feature
                # interpolation: k one-hot FMAs (the only wide per-eval
                # work)
                W_C = masks[0] * W8[:, 0:1]
                for r in range(1, k):
                    W_C = W_C + masks[r] * W8[:, r:r + 1]
                fg_g = _feat_dot(W_C, feat_ref[g])[:, :geometry_dim]
                ds_parts.append(ds_g)
                fg_parts.append(fg_g)
            ds = (ds_parts[0] if G == 1
                  else jnp.concatenate(ds_parts, axis=0))
            fg = (fg_parts[0] if G == 1
                  else jnp.concatenate(fg_parts, axis=0))
            f, _ = _density_mlp(ds, fg, dens_ws, multires_d, multires_fg,
                                dtype, False)
            return f - logit_tau
    else:
        field = field_full

    if rebracket:
        d_lw, d_hw = cat(brt, 4), cat(brt, 5)
        f_hr = field(d_hw)
        f_lr = field(d_lw)
        ok = (f_hr > 0) & (f_lr < 0)
        f_high = jnp.where(ok, f_hr, f_high)
        f_low = jnp.where(ok, f_lr, f_low)
        d_high = jnp.where(ok, d_hw, d_high)
        d_low = jnp.where(ok, d_lw, d_low)

    def pred():
        denom = f_high - f_low
        denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        return -f_low * (d_high - d_low) / denom + d_low

    d_pred = pred()
    for _ in range(n_iters):
        f_mid = field(d_pred)
        ind_low = f_mid < 0
        d_low = jnp.where(ind_low, d_pred, d_low)
        f_low = jnp.where(ind_low, f_mid, f_low)
        d_high = jnp.where(~ind_low, d_pred, d_high)
        f_high = jnp.where(~ind_low, f_mid, f_high)
        d_pred = pred()
    for g in range(G):
        refs[-1][g, 0:1, :] = d_pred[g * T:(g + 1) * T].T


@functools.partial(jax.jit, static_argnames=(
    "k", "n_iters", "multires_d", "multires_fg", "geometry_dim", "dtype",
    "tile", "logit_tau", "interpret", "group", "frozen_knn"))
def secant_refine(rays_o, rays_d, d_low, d_high, f_low, f_high, geo, feat,
                  w1, dens_ws, *, n_iters: int = 6, k: int = 8,
                  multires_d: int = 8, multires_fg: int = 2,
                  geometry_dim: int = 32, dtype=None, tile: int = 1,
                  logit_tau: float = 0.0, interpret: bool = False,
                  group: int = 1, d_low_w=None, d_high_w=None,
                  frozen_knn: bool = False):
    """Fused secant root refinement (see _secant_kernel).

    rays_o/d: (R, 3) with consecutive rays grouped into `tile`-ray groups
    matching `geo`/`feat` (B = R//tile contexts, as built by
    make_tile_context; tile=1 for per-ray contexts); d/f brackets: (R,).
    group: tiles batched per kernel program (see _secant_kernel; results
    are bit-identical across group values).
    d_low_w/d_high_w: optional half-step-widened proxy-scan endpoints —
    when given, the density re-bracket runs inside the kernel
    (see _secant_kernel rebracket).
    frozen_knn: freeze the per-ray candidate selection at the bracket
    midpoint (see _secant_kernel frozen). Returns d_pred (R,)."""
    R = rays_o.shape[0]
    B = geo.shape[0]
    T = R // B
    C = geo.shape[2]
    G = max(1, min(int(group), B))
    while B % G:
        G -= 1
    cpad = (-C) % 128
    if cpad:
        fill = jnp.zeros((B, 8, cpad), jnp.float32)
        fill = fill.at[:, 6, :].set(1e12)
        geo = jnp.concatenate([geo, fill], axis=2)
        feat = jnp.pad(feat, ((0, 0), (0, cpad), (0, 0)))

    def rows8(cols):
        """list of (R,) -> (B, 8, T)."""
        m = jnp.stack(cols, axis=-1)                     # (R, n)
        m = jnp.pad(m, ((0, 0), (0, 8 - m.shape[-1])))
        return jnp.swapaxes(m.reshape(B, T, 8), 1, 2)

    od = rows8([rays_o[:, 0], rays_o[:, 1], rays_o[:, 2],
                rays_d[:, 0], rays_d[:, 1], rays_d[:, 2]])
    rebracket = d_low_w is not None
    br_cols = [d_low, d_high, f_low, f_high]
    if rebracket:
        br_cols += [d_low_w, d_high_w]
    br = rows8(br_cols)
    w1_arr = jnp.full((1,), w1, jnp.float32)
    dens_ws = tuple(dens_ws)
    if dtype is not None:
        feat = feat.astype(dtype)  # see field_fused
    feat_t = jnp.swapaxes(feat, 1, 2)                    # (B, F, C)

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(
            _secant_kernel, k=k, n_iters=n_iters, multires_d=multires_d,
            multires_fg=multires_fg, geometry_dim=geometry_dim,
            dtype=dtype, logit_tau=logit_tau, group=G,
            rebracket=rebracket, frozen=frozen_knn),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((G, 8, T), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 8, T), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 8, C + cpad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, feat.shape[-1], C + cpad),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ] + [const_spec(a) for a in dens_ws],
        out_specs=pl.BlockSpec((G, 8, T), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8, T), jnp.float32),
        # grouped programs unroll G per-tile interpolations whose live
        # temporaries exceed the default 16M scoped-vmem stack limit
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024) if G > 1 else None,
        interpret=interpret,
    )(w1_arr, od, br, geo, feat_t, *dens_ws)
    return out[:, 0, :].reshape(R)
