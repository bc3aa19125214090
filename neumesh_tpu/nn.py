"""Minimal functional NN primitives for neumesh_tpu.

Parameters are nested dicts of jnp arrays (pytrees); every layer is an
(init, apply) pair of pure functions. This replaces the reference's
torch.nn modules (reference models/base.py) with jit/vmap/grad-friendly
pure functions.

Conventions:
  - linear weights are stored as ``w: (in, out)`` (JAX convention,
    transposed vs. torch's (out, in)); apply is ``x @ w + b``.
  - weight-normalised linears store ``(g, v)`` with ``g: (out,)`` and
    ``v: (in, out)``; the effective weight is ``v * g / ||v||_col`` where the
    norm is per output column — matching torch.nn.utils.weight_norm(dim=0)
    semantics used throughout the reference (reference models/base.py:253,
    models/frameworks/neumesh/neumesh.py:77,101).
"""
from __future__ import annotations

import contextlib
import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

Params = dict


# ---------------------------------------------------------------------------
# Linear layers
# ---------------------------------------------------------------------------

def linear_init(key, in_dim: int, out_dim: int) -> Params:
    """Torch-default init: U(-1/sqrt(in), 1/sqrt(in)) for both w and b."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    w = jax.random.uniform(kw, (in_dim, out_dim), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def linear_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    dt = _MLP_COMPUTE_DTYPE[-1]
    if dt is not None:
        return (jnp.dot(x.astype(dt), p["w"].astype(dt),
                        preferred_element_type=dt) + p["b"].astype(dt))
    return _f32_dot(x, p["w"]) + p["b"]


_F32_DOT_PRECISION = ["highest"]


@contextlib.contextmanager
def f32_matmul_precision(precision: str):
    """Trace-time override of the f32 matmul precision for everything
    traced inside the context (the stack value is read when jit TRACES,
    so a jitted function bakes in whatever was active at trace time).

    Rendering/parity paths keep the exact default ("highest": true-f32,
    6 MXU passes). TRAINING wraps its loss in a lower tier — the CUDA
    reference itself never trains at true f32: torch 1.8 on Ampere runs
    TF32 matmuls (10-bit mantissa) by default, so "high" (bf16x3,
    ~f32-quality) or "default" (bf16 inputs, f32 accumulate — standard
    mixed-precision training) is the faithful analog, and "highest" was
    63% of the training step on v5e (23.5 of 37 ms, trace_train r5)."""
    _F32_DOT_PRECISION.append(precision)
    try:
        yield
    finally:
        _F32_DOT_PRECISION.pop()


def _f32_dot(x, w):
    """f32 matmul at the context precision (default: true-f32 passes).
    TPU's own default would feed the MXU bf16 inputs for f32 operands
    (~1e-2 relative error), which breaks checkpoint parity with the f32
    CUDA reference — so the parity/serving default stays "highest" and
    training opts down via f32_matmul_precision."""
    return jnp.dot(x, w, precision=_F32_DOT_PRECISION[-1])


_MLP_COMPUTE_DTYPE = [None]


@contextlib.contextmanager
def mlp_compute_dtype(dtype):
    """Trace-time dtype override for dtype-less MLP applies: inside the
    context, maybe_wnorm_apply/maybe_wnorm_apply_parts/linear_apply calls
    that did not request an explicit dtype run (and return) in `dtype` —
    activations stay low-precision BETWEEN layers, halving the HBM
    traffic the TPU MLPs are bound by. Used to evaluate the no-grad
    distillation TEACHER in bf16 during training (the teacher targets
    are stop-gradient'ed; callers cast the head outputs back to f32).
    Parity/serving paths outside the context are unaffected."""
    _MLP_COMPUTE_DTYPE.append(dtype)
    try:
        yield
    finally:
        _MLP_COMPUTE_DTYPE.pop()


def wnorm_from_weight(w: jnp.ndarray) -> Params:
    """Split a plain weight (in, out) into weight-norm (g, v) parameterisation
    with identical effective weight (torch weight_norm init semantics)."""
    g = jnp.linalg.norm(w, axis=0)  # (out,)
    return {"g": g, "v": w}


def wnorm_linear_init(key, in_dim: int, out_dim: int) -> Params:
    p = linear_init(key, in_dim, out_dim)
    wn = wnorm_from_weight(p["w"])
    return {"g": wn["g"], "v": wn["v"], "b": p["b"]}


def wnorm_weight(p: Params) -> jnp.ndarray:
    v = p["v"]
    norm = jnp.linalg.norm(v, axis=0, keepdims=True)  # (1, out)
    return v * (p["g"] / jnp.maximum(norm, 1e-12))


def wnorm_linear_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return _f32_dot(x, wnorm_weight(p)) + p["b"]


def maybe_wnorm_init(key, in_dim, out_dim, weight_norm: bool) -> Params:
    return (wnorm_linear_init if weight_norm else linear_init)(key, in_dim, out_dim)


def maybe_wnorm_apply(p: Params, x: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """Apply a (weight-norm) linear. With `dtype` (e.g. bfloat16) the
    whole layer RUNS AND RETURNS in that dtype (MXU still accumulates
    f32 internally): keeping activations low-precision between layers
    halves the HBM traffic the TPU MLPs are bound by. Heads that need
    f32 outputs cast at the end."""
    w = wnorm_weight(p) if "g" in p else p["w"]
    if dtype is None:
        dtype = _MLP_COMPUTE_DTYPE[-1]
    if dtype is not None:
        return (jnp.dot(x.astype(dtype), w.astype(dtype),
                        preferred_element_type=dtype)
                + p["b"].astype(dtype))
    return _f32_dot(x, w) + p["b"]


def maybe_wnorm_apply_parts(p: Params, parts: Sequence[jnp.ndarray],
                            dtype=None) -> jnp.ndarray:
    """linear(concat(parts, -1)) WITHOUT materializing the concatenation:
    the weight rows are sliced per part and the partial products summed.
    On TPU, XLA materializes big activation concats to HBM before the
    matmul (measured ~10 ms/render in the NeuMesh MLPs); the split form
    keeps each embedding fused into its own matmul operand read."""
    w = wnorm_weight(p) if "g" in p else p["w"]
    if dtype is None:
        dtype = _MLP_COMPUTE_DTYPE[-1]
    out = p["b"] if dtype is None else p["b"].astype(dtype)
    lo = 0
    for x in parts:
        wi = w[lo:lo + x.shape[-1]]
        lo += x.shape[-1]
        if dtype is not None:
            out = out + jnp.dot(x.astype(dtype), wi.astype(dtype),
                                preferred_element_type=dtype)
        else:
            out = out + _f32_dot(x, wi)
    return out


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------

def softplus100(x: jnp.ndarray) -> jnp.ndarray:
    """Softplus with beta=100 as used by the SDF MLPs (reference
    models/base.py:217, neumesh.py:75). Torch switches to identity when
    beta*x > 20 (its default threshold); replicate for exact parity."""
    bx = 100.0 * x
    return jnp.where(bx > 20.0, x, jax.nn.softplus(bx) / 100.0)


def sine_w0(w0: float) -> Callable[[jnp.ndarray], jnp.ndarray]:
    return lambda x: jnp.sin(w0 * x)


# ---------------------------------------------------------------------------
# Positional embedder (reference models/base.py:15-87)
# ---------------------------------------------------------------------------

class Embedder:
    """NeRF positional encoding. Output ordering matches the reference:
    [x, sin(f0*x), cos(f0*x), sin(f1*x), cos(f1*x), ...] with
    log-sampled frequencies 2**linspace(0, multires-1, multires)."""

    def __init__(self, multires: int, input_dim: int = 3,
                 exact: bool = True):
        self.input_dim = input_dim
        self.multires = multires
        # exact=True keeps per-frequency sin/cos (f32 parity/training
        # mode); exact=False enables the double-angle recursion for
        # serving (error grows ~2**octave ulps, ~3e-5 absolute at
        # multires=8 — fine for bf16 serving, a needless global numeric
        # departure for the f32 parity mode; ADVICE r2)
        self.exact = exact
        if multires < 0:
            # identity embedder (reference models/base.py:74-75)
            self.out_dim = input_dim
            self.freqs: tuple = ()
        else:
            n_freqs = multires
            max_freq_log2 = multires - 1
            if n_freqs > 1:
                self.freqs = tuple(
                    float(2.0 ** (max_freq_log2 * i / (n_freqs - 1)))
                    for i in range(n_freqs)
                )
            elif n_freqs == 1:
                self.freqs = (1.0,)
            else:
                self.freqs = ()
            self.out_dim = input_dim * (1 + 2 * n_freqs)
        # doubling fast path applies when every frequency is exactly twice
        # the previous one (always true for the reference's log sampling
        # with integer max_freq_log2 = multires - 1)
        self._doubling = (
            not exact
            and len(self.freqs) >= 1 and self.freqs[0] == 1.0
            and all(abs(self.freqs[i + 1] - 2.0 * self.freqs[i]) == 0.0
                    for i in range(len(self.freqs) - 1)))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.multires < 0:
            return x
        parts = [x]
        if self._doubling:
            # log-sampled frequencies are exact powers of two, so octave
            # k+1 follows from octave k by the double-angle identities
            # (2 muls + 1 sub per element) instead of transcendental
            # sin/cos calls — these dominated the whole TPU render
            # (~30x the cost of an FMA, ~half of every density pass).
            # Exact to rounding: ~1 ulp accumulated per octave.
            s = jnp.sin(x)
            c = jnp.cos(x)
            parts.append(s)
            parts.append(c)
            for _ in self.freqs[1:]:
                s, c = 2.0 * s * c, c * c - s * s
                parts.append(s)
                parts.append(c)
        else:
            for f in self.freqs:
                xf = x * f
                parts.append(jnp.sin(xf))
                parts.append(jnp.cos(xf))
        return jnp.concatenate(parts, axis=-1)

    # allow use as a static (hashable) member of jitted model configs
    def __hash__(self):
        return hash((self.input_dim, self.multires, self.exact))

    def __eq__(self, other):
        return (
            isinstance(other, Embedder)
            and self.input_dim == other.input_dim
            and self.multires == other.multires
            and self.exact == other.exact
        )


def get_embedder(multires: int, input_dim: int = 3, exact: bool = True):
    e = Embedder(multires, input_dim, exact=exact)
    return e, e.out_dim


# ---------------------------------------------------------------------------
# Stacked MLP helper
# ---------------------------------------------------------------------------

def mlp_init(
    key,
    dims: Sequence[int],
    weight_norm: bool = False,
) -> list:
    """Init a plain MLP as a list of layer param dicts. dims = [in, h, ..., out]."""
    keys = jax.random.split(key, len(dims) - 1)
    return [
        maybe_wnorm_init(keys[i], dims[i], dims[i + 1], weight_norm)
        for i in range(len(dims) - 1)
    ]


def count_params(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
