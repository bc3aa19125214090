"""Surface renderer on the analytic sphere: root finding and sphere tracing
must hit the surface at the exact intersection distance."""
import jax.numpy as jnp
import numpy as np

from neumesh_tpu.render.ray_casting import (
    root_finding_surface_points,
    sphere_tracing_surface_points,
    surface_render,
)


class SphereModel:
    def forward_density_only(self, params, x):
        return jnp.linalg.norm(x, axis=-1) - 0.5

    def forward(self, params, x, view_dirs):
        sdf = self.forward_density_only(params, x)
        return sdf, jnp.broadcast_to(jnp.array([0.9, 0.4, 0.1]), x.shape)

    def forward_with_nablas(self, params, x):
        n = x / jnp.maximum(jnp.linalg.norm(x, -1, keepdims=True), 1e-9)
        return self.forward_density_only(params, x), n


def rays(n=32):
    o = jnp.tile(jnp.array([[0.0, 0.0, -3.0]]), (n, 1))
    ang = jnp.linspace(-0.12, 0.12, n)
    d = jnp.stack([ang, jnp.zeros(n), jnp.ones(n)], -1)
    return o, d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def analytic_hit(o, d, r=0.5):
    o, d = np.asarray(o), np.asarray(d)
    b = (o * d).sum(-1)
    c = (o * o).sum(-1) - r * r
    disc = b * b - c
    t = -b - np.sqrt(np.maximum(disc, 0))
    return t, disc > 0


def test_root_finding_exact_depth():
    model = SphereModel()
    o, d = rays()
    f = lambda p: model.forward_density_only({}, p)
    d_pred, pt, mask, _ = root_finding_surface_points(
        f, o, d, near=0.0, far=6.0, N_steps=128, N_secant_steps=8)
    t, hit = analytic_hit(o, d)
    assert (np.asarray(mask) == hit).all()
    np.testing.assert_allclose(np.asarray(d_pred)[hit], t[hit], atol=1e-4)
    radii = np.linalg.norm(np.asarray(pt)[hit], axis=-1)
    np.testing.assert_allclose(radii, 0.5, atol=1e-4)


def test_root_finding_miss_rays():
    model = SphereModel()
    n = 8
    o = jnp.tile(jnp.array([[0.0, 0.0, -3.0]]), (n, 1))
    d = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (n, 1))
    f = lambda p: model.forward_density_only({}, p)
    d_pred, _, mask, _ = root_finding_surface_points(f, o, d, 0.0, 6.0)
    assert not np.asarray(mask).any()
    assert np.isinf(np.asarray(d_pred)).all()


def test_sphere_tracing_depth():
    model = SphereModel()
    o, d = rays()
    f = lambda p: model.forward_density_only({}, p)
    d_pred, pt, mask = sphere_tracing_surface_points(f, o, d, 0.0, 6.0,
                                                     N_iters=30)
    t, hit = analytic_hit(o, d)
    np.testing.assert_allclose(np.asarray(d_pred)[hit], t[hit], atol=1e-3)


def test_surface_render_end_to_end():
    model = SphereModel()
    o, d = rays(16)
    colors, depths, extras = surface_render(
        model, {}, o, d, ray_casting_algo="root_finding",
        ray_casting_cfgs={"N_steps": 128})
    t, hit = analytic_hit(o, d)
    colors = np.asarray(colors)
    np.testing.assert_allclose(colors[hit],
                               np.tile([[0.9, 0.4, 0.1]], (hit.sum(), 1)),
                               atol=1e-5)
    np.testing.assert_allclose(colors[~hit], 0.0)
    np.testing.assert_allclose(np.asarray(depths)[hit], t[hit], atol=1e-4)
    normals = np.asarray(extras["normals_surface"])
    assert normals[hit][:, 2].mean() < -0.9  # facing camera
