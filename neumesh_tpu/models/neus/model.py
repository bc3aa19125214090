"""NeuS model (reference models/frameworks/neus/neus.py:8-70).

SDF MLP (ImplicitSurface) + radiance MLP (RadianceNet) + optional NeRF++
background net, plus the learnable CDF sharpness ln_s.

Model protocol (shared with NeuMesh and the editing wrapper; see SURVEY §1):
  forward(params, x, view_dirs)      -> (sdf, rgb)
  forward_density_only(params, x)    -> sdf
  forward_with_nablas(params, x)     -> (sdf, nablas)
  forward_s(params)                  -> scalar s
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..base import NeRF, ImplicitSurface, RadianceNet


class NeuS:
    def __init__(
        self,
        variance_init: float = 0.05,
        speed_factor: float = 1.0,
        input_ch: int = 3,
        W_geo_feat: int = -1,
        use_outside_nerf: bool = False,
        obj_bounding_radius: float = 1.0,
        surface_cfg: dict = None,
        radiance_cfg: dict = None,
    ):
        self.speed_factor = speed_factor
        self.ln_s_init = -math.log(variance_init) / speed_factor

        self.implicit_surface = ImplicitSurface(
            W_geo_feat=W_geo_feat,
            input_ch=input_ch,
            obj_bounding_size=obj_bounding_radius,
            **(surface_cfg or {}),
        )
        if W_geo_feat < 0:
            W_geo_feat = self.implicit_surface.W
        self.radiance_net = RadianceNet(
            W_geo_feat=W_geo_feat, **(radiance_cfg or {}))

        self.use_outside_nerf = use_outside_nerf
        if use_outside_nerf:
            self.nerf_outside = NeRF(
                input_ch=4, multires=10, multires_view=4, use_view_dirs=True)

    def init(self, key) -> dict:
        ks, kr, kn = jax.random.split(key, 3)
        params = {
            "ln_s": jnp.asarray([self.ln_s_init], dtype=jnp.float32),
            "implicit_surface": self.implicit_surface.init(ks),
            "radiance_net": self.radiance_net.init(kr),
        }
        if self.use_outside_nerf:
            params["nerf_outside"] = self.nerf_outside.init(kn)
        return params

    def forward_s(self, params):
        return jnp.exp(params["ln_s"][0] * self.speed_factor)

    def forward(self, params, x, view_dirs):
        sdf, nablas, geometry_feature = self.implicit_surface.forward_with_nablas(
            params["implicit_surface"], x)
        radiances = self.radiance_net.forward(
            params["radiance_net"], x, view_dirs, nablas, geometry_feature)
        return sdf, radiances

    def forward_radiance(self, params, x, view_dirs):
        _, nablas, geometry_feature = self.implicit_surface.forward_with_nablas(
            params["implicit_surface"], x)
        return self.radiance_net.forward(
            params["radiance_net"], x, view_dirs, nablas, geometry_feature)

    def forward_density_only(self, params, x):
        return self.implicit_surface.forward(params["implicit_surface"], x)

    def forward_with_nablas(self, params, x):
        sdf, nablas, _ = self.implicit_surface.forward_with_nablas(
            params["implicit_surface"], x)
        return sdf, nablas
