"""Field MLPs: ImplicitSurface, RadianceNet, NeRF, ScalarField.

Functional re-design of reference models/base.py:138-575. Each model class
holds only *static* (hashable) configuration; parameters live in pytrees
returned by ``init`` and consumed by pure ``forward`` functions, so every
model call can sit inside one jitted render/train program and gradients
w.r.t. inputs (nablas, eikonal double-backward) come from jax.grad.

Numerical parity notes:
  - geometric sphere init replicated from reference models/base.py:223-250,
  - weight-norm as explicit (g, v) (reference models/base.py:252-253),
  - skip concat divided by sqrt(2) (reference models/base.py:276),
  - Softplus(beta=100) activations in the SDF net (models/base.py:217).
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..nn import (
    get_embedder,
    linear_apply,
    linear_init,
    maybe_wnorm_apply,
    softplus100,
    wnorm_from_weight,
)


class ImplicitSurface:
    """SDF MLP with geometric sphere init (reference models/base.py:138-311).

    D+1 linear layers; layers 0..D-1 use Softplus(beta=100), the last is
    linear. With W_geo_feat > 0 the last layer outputs (1 + W_geo_feat):
    sdf plus an IDR-style geometry feature.
    """

    def __init__(
        self,
        W: int = 256,
        D: int = 8,
        skips: Sequence[int] = (4,),
        W_geo_feat: int = 256,
        input_ch: int = 3,
        radius_init: float = 1.0,
        obj_bounding_size: float = 2.0,
        geometric_init: bool = True,
        embed_multires: int = 6,
        weight_norm: bool = True,
        use_siren: bool = False,
    ):
        self.radius_init = radius_init
        self.obj_bounding_size = obj_bounding_size
        self.geometric_init = geometric_init
        self.D = D
        self.W = W
        self.W_geo_feat = W_geo_feat
        self.skips = tuple(skips)
        self.use_siren = use_siren
        self.weight_norm = weight_norm
        if use_siren:
            assert len(self.skips) == 0, "do not use skips for siren"
        self.embed_fn, self.input_ch = get_embedder(embed_multires, input_ch)
        self.embed_multires = embed_multires

        # per-layer (in_dim, out_dim), mirroring reference models/base.py:191-209
        dims = []
        for l in range(D + 1):
            if l == D:
                out_dim = 1 + W_geo_feat if W_geo_feat > 0 else 1
            elif (l + 1) in self.skips:
                out_dim = W - self.input_ch  # reduced before skip concat
            else:
                out_dim = W
            in_dim = self.input_ch if l == 0 else W
            dims.append((in_dim, out_dim))
        self.layer_dims = tuple(dims)

    def init(self, key) -> list:
        layers = []
        keys = jax.random.split(key, self.D + 1)
        for l, (in_dim, out_dim) in enumerate(self.layer_dims):
            if self.use_siren:
                w_std = (1.0 / in_dim) if l == 0 else (
                    math.sqrt(6.0 / in_dim) / 30.0)
                kw, kb = jax.random.split(keys[l])
                w = jax.random.uniform(
                    kw, (in_dim, out_dim), jnp.float32, -w_std, w_std)
                bb = 1.0 / math.sqrt(in_dim)
                b = jax.random.uniform(kb, (out_dim,), jnp.float32, -bb, bb)
            elif self.geometric_init:
                # sphere init (SAL/IDR), reference models/base.py:223-250
                if l == self.D:
                    w = jax.random.normal(keys[l], (in_dim, out_dim)) * 1e-4 \
                        + math.sqrt(math.pi) / math.sqrt(in_dim)
                    b = jnp.full((out_dim,), -self.radius_init)
                elif self.embed_multires > 0 and l == 0:
                    w = jnp.zeros((in_dim, out_dim))
                    w = w.at[:3, :].set(
                        jax.random.normal(keys[l], (3, out_dim))
                        * math.sqrt(2) / math.sqrt(out_dim))
                    b = jnp.zeros((out_dim,))
                elif self.embed_multires > 0 and l in self.skips:
                    w = jax.random.normal(keys[l], (in_dim, out_dim)) \
                        * math.sqrt(2) / math.sqrt(out_dim)
                    # zero the octave part of the skip input; input layout is
                    # [h, x, octaves] (reference models/base.py:240-247)
                    w = w.at[-(self.input_ch - 3):, :].set(0.0)
                    b = jnp.zeros((out_dim,))
                else:
                    w = jax.random.normal(keys[l], (in_dim, out_dim)) \
                        * math.sqrt(2) / math.sqrt(out_dim)
                    b = jnp.zeros((out_dim,))
            else:
                p = linear_init(keys[l], in_dim, out_dim)
                w, b = p["w"], p["b"]

            if self.weight_norm:
                wn = wnorm_from_weight(w)
                layers.append({"g": wn["g"], "v": wn["v"], "b": b})
            else:
                layers.append({"w": w, "b": b})
        return layers

    def forward(self, params: list, x: jnp.ndarray, return_h: bool = False):
        """x: (..., 3) -> sdf (...,) [, geo feature (..., W_geo_feat)]."""
        x = self.embed_fn(x)
        h = x
        for i in range(self.D):
            if i in self.skips:
                h = jnp.concatenate([h, x], axis=-1) / math.sqrt(2)
            h = maybe_wnorm_apply(params[i], h)
            h = jnp.sin(30.0 * h) if self.use_siren else softplus100(h)
        out = maybe_wnorm_apply(params[self.D], h)

        if self.W_geo_feat > 0:
            sdf = out[..., 0]
            feat = out[..., 1:]
        else:
            sdf = out[..., 0]
            feat = h
        if return_h:
            return sdf, feat
        return sdf

    def forward_with_nablas(self, params: list, x: jnp.ndarray):
        """Returns (sdf (...,), nablas (..., 3), geo_feat (..., F)).

        Gradient w.r.t. the query point via per-point value_and_grad
        (replaces reference autograd.grad, models/base.py:291-311);
        differentiable again for the eikonal double-backward.
        """
        def f(p):
            sdf, feat = self.forward(params, p, return_h=True)
            return sdf, feat

        flat = x.reshape((-1, x.shape[-1]))
        (sdf, feat), nablas = jax.vmap(jax.value_and_grad(f, has_aux=True))(flat)
        out_shape = x.shape[:-1]
        return (
            sdf.reshape(out_shape),
            nablas.reshape(x.shape),
            feat.reshape(out_shape + (feat.shape[-1],)),
        )


class RadianceNet:
    """Color MLP (reference models/base.py:353-465). Inputs: x, view_dirs,
    normals, geometry feature. D+1 layers, ReLU, final sigmoid."""

    def __init__(
        self,
        D: int = 4,
        W: int = 256,
        skips: Sequence[int] = (),
        W_geo_feat: int = 256,
        embed_multires: int = 6,
        embed_multires_view: int = 4,
        use_view_dirs: bool = True,
        weight_norm: bool = True,
        use_siren: bool = False,
    ):
        self.D = D
        self.W = W
        self.skips = tuple(skips)
        self.use_view_dirs = use_view_dirs
        self.weight_norm = weight_norm
        self.use_siren = use_siren
        self.embed_fn, input_ch_pts = get_embedder(embed_multires)
        if use_view_dirs:
            self.embed_fn_view, input_ch_views = get_embedder(embed_multires_view)
            self.in_dim_0 = input_ch_pts + input_ch_views + 3 + W_geo_feat
        else:
            self.embed_fn_view = None
            self.in_dim_0 = input_ch_pts + W_geo_feat

        dims = []
        for l in range(D + 1):
            out_dim = 3 if l == D else W
            if l == 0:
                in_dim = self.in_dim_0
            elif l in self.skips:
                in_dim = self.in_dim_0 + W
            else:
                in_dim = W
            dims.append((in_dim, out_dim))
        self.layer_dims = tuple(dims)

    def init(self, key) -> list:
        layers = []
        keys = jax.random.split(key, self.D + 1)
        for l, (in_dim, out_dim) in enumerate(self.layer_dims):
            p = linear_init(keys[l], in_dim, out_dim)
            if self.weight_norm:
                wn = wnorm_from_weight(p["w"])
                layers.append({"g": wn["g"], "v": wn["v"], "b": p["b"]})
            else:
                layers.append(p)
        return layers

    def forward(self, params, x, view_dirs, normals, geometry_feature,
                return_feature: bool = False):
        x = self.embed_fn(x)
        if self.use_view_dirs:
            view_dirs = self.embed_fn_view(view_dirs)
            radiance_input = jnp.concatenate(
                [x, view_dirs, normals, geometry_feature], axis=-1)
        else:
            radiance_input = jnp.concatenate([x, geometry_feature], axis=-1)

        h = radiance_input
        color_feature = None
        for i in range(self.D + 1):
            if i in self.skips:
                h = jnp.concatenate([h, radiance_input], axis=-1)
            h = maybe_wnorm_apply(params[i], h)
            if i != self.D:
                h = jnp.maximum(h, 0.0)
            else:
                h = jax.nn.sigmoid(h)
            if i == self.D - 1:
                color_feature = h
        if return_feature:
            return h, color_feature
        return h


class NeRF:
    """Vanilla NeRF MLP (reference models/base.py:469-543); used for the
    optional NeRF++ background model."""

    def __init__(
        self,
        D: int = 8,
        W: int = 256,
        input_ch: int = 3,
        input_ch_view: int = 3,
        multires: int = -1,
        multires_view: int = -1,
        output_ch: int = 4,
        skips: Sequence[int] = (4,),
        use_view_dirs: bool = False,
    ):
        self.D = D
        self.W = W
        self.skips = tuple(skips)
        self.use_view_dirs = use_view_dirs
        self.output_ch = output_ch
        self.embed_fn, self.input_ch = get_embedder(multires, input_ch)
        self.embed_fn_view, self.input_ch_view = get_embedder(
            multires_view, input_ch_view)

    def init(self, key) -> dict:
        keys = iter(jax.random.split(key, self.D + 8))
        pts_linears = [linear_init(next(keys), self.input_ch, self.W)]
        for i in range(self.D - 1):
            in_dim = self.W + self.input_ch if i in self.skips else self.W
            pts_linears.append(linear_init(next(keys), in_dim, self.W))
        params = {"pts_linears": pts_linears}
        params["views_linears"] = [
            linear_init(next(keys), self.input_ch_view + self.W, self.W // 2)]
        if self.use_view_dirs:
            params["feature_linear"] = linear_init(next(keys), self.W, self.W)
            params["alpha_linear"] = linear_init(next(keys), self.W, 1)
            params["rgb_linear"] = linear_init(next(keys), self.W // 2, 3)
        else:
            params["output_linear"] = linear_init(
                next(keys), self.W, self.output_ch)
        return params

    def forward(self, params, input_pts, input_views):
        input_pts = self.embed_fn(input_pts)
        input_views = self.embed_fn_view(input_views)
        h = input_pts
        for i, p in enumerate(params["pts_linears"]):
            h = jnp.maximum(linear_apply(p, h), 0.0)
            if i in self.skips:
                h = jnp.concatenate([input_pts, h], axis=-1)
        if self.use_view_dirs:
            sigma = linear_apply(params["alpha_linear"], h)
            feature = linear_apply(params["feature_linear"], h)
            h = jnp.concatenate([feature, input_views], axis=-1)
            for p in params["views_linears"]:
                h = jnp.maximum(linear_apply(p, h), 0.0)
            rgb = linear_apply(params["rgb_linear"], h)
        else:
            outputs = linear_apply(params["output_linear"], h)
            rgb = outputs[..., :3]
            sigma = outputs[..., 3:]
        return sigma[..., 0], jax.nn.sigmoid(rgb)


class ScalarField:
    """Small scalar MLP (reference models/base.py:546-575)."""

    def __init__(self, input_ch: int = 3, W: int = 128, D: int = 4,
                 skips: Sequence[int] = (), init_val: float = -2.0):
        self.input_ch = input_ch
        self.W = W
        self.D = D
        self.skips = tuple(skips)
        self.init_val = init_val

    def init(self, key) -> dict:
        keys = iter(jax.random.split(key, self.D + 2))
        layers = [self._kaiming(next(keys), self.input_ch, self.W)]
        for i in range(self.D - 1):
            in_dim = self.W + self.input_ch if i in self.skips else self.W
            layers.append(self._kaiming(next(keys), in_dim, self.W))
        out = {"w": jnp.zeros((self.W, 1)),
               "b": jnp.full((1,), self.init_val)}
        return {"pts_linears": layers, "output_linear": out}

    @staticmethod
    def _kaiming(key, in_dim, out_dim):
        bound = math.sqrt(6.0 / in_dim)
        w = jax.random.uniform(key, (in_dim, out_dim), jnp.float32,
                               -bound, bound)
        return {"w": w, "b": jnp.zeros((out_dim,))}

    def forward(self, params, x):
        h = x
        for i, p in enumerate(params["pts_linears"]):
            h = jnp.maximum(linear_apply(p, h), 0.0)
            if i in self.skips:
                h = jnp.concatenate([x, h], axis=-1)
        return linear_apply(params["output_linear"], h)[..., 0]


def pretrain_siren_sdf_loss(surface: ImplicitSurface, params, pts):
    """L1 sphere-fit loss for SIREN pretraining
    (reference models/base.py:314-350)."""
    sdf_gt = jnp.linalg.norm(pts, axis=-1) - surface.radius_init
    sdf_pred = surface.forward(params, pts)
    return jnp.mean(jnp.abs(sdf_pred - sdf_gt))
