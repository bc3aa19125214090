"""Renderer validated against an analytic sphere scene: a model whose SDF is
|x| - R and whose color is constant must composit to that color with depth at
the sphere surface."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from neumesh_tpu.render.volume import volume_render, volume_render_rays


class SphereModel:
    """Analytic unit-protocol model: sphere SDF, position-tinted color."""

    def __init__(self, radius=0.5, s=256.0):
        self.radius = radius
        self.s = s

    def forward_s(self, params):
        return self.s

    def forward_density_only(self, params, x):
        return jnp.linalg.norm(x, axis=-1) - self.radius

    def forward_with_nablas(self, params, x):
        sdf = self.forward_density_only(params, x)
        nablas = x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-9)
        return sdf, nablas

    def forward(self, params, x, view_dirs):
        sdf = self.forward_density_only(params, x)
        rgb = jnp.broadcast_to(jnp.array([0.2, 0.5, 0.8]), x.shape)
        return sdf, rgb


def camera_rays(n=64):
    """Rays from z=-3 toward the origin with a small angular spread."""
    key = jax.random.PRNGKey(0)
    o = jnp.tile(jnp.array([[0.0, 0.0, -3.0]]), (n, 1))
    ang = jax.random.uniform(key, (n, 2), minval=-0.05, maxval=0.05)
    d = jnp.stack([ang[:, 0], ang[:, 1], jnp.ones(n)], axis=-1)
    return o, d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def test_sphere_depth_and_color():
    model = SphereModel()
    o, d = camera_rays(64)
    ret = volume_render_rays(
        model, {}, o, d, jax.random.PRNGKey(1),
        calc_normal=True, detailed_output=True, perturb=False,
        bounded_near_far=False)
    rgb = np.asarray(ret["rgb"])
    depth = np.asarray(ret["depth_volume"])
    acc = np.asarray(ret["mask_volume"])

    # analytic ray-sphere hit distance
    o_np, d_np = np.asarray(o), np.asarray(d)
    b = np.sum(o_np * d_np, -1)
    c = np.sum(o_np * o_np, -1) - 0.5**2
    t_hit = -b - np.sqrt(b * b - c)

    assert np.all(acc > 0.99)
    np.testing.assert_allclose(depth, t_hit, atol=5e-3)
    np.testing.assert_allclose(rgb, np.tile([[0.2, 0.5, 0.8]], (64, 1)),
                               atol=5e-3)
    # normals point back toward the camera hemisphere
    normals = np.asarray(ret["normals_volume"])
    assert np.mean(normals[:, 2]) < -0.9


def test_miss_rays_zero_acc_and_white_bkgd():
    model = SphereModel()
    n = 8
    o = jnp.tile(jnp.array([[0.0, 0.0, -3.0]]), (n, 1))
    d = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (n, 1))  # miss entirely
    ret = volume_render_rays(model, {}, o, d, jax.random.PRNGKey(0),
                             detailed_output=False, bounded_near_far=False)
    assert np.all(np.asarray(ret["mask_volume"]) < 1e-3)
    ret_w = volume_render_rays(model, {}, o, d, jax.random.PRNGKey(0),
                               detailed_output=False, white_bkgd=True,
                               bounded_near_far=False)
    np.testing.assert_allclose(np.asarray(ret_w["rgb"]), 1.0, atol=1e-3)


@pytest.mark.slow
def test_chunked_render_matches_unchunked():
    model = SphereModel()
    o, d = camera_rays(96)
    rgb1, depth1, _ = volume_render(model, {}, o, d, perturb=False,
                                    detailed_output=False,
                                    bounded_near_far=False)
    rgb2, depth2, _ = volume_render(model, {}, o, d, rayschunk=32,
                                    perturb=False, detailed_output=False,
                                    bounded_near_far=False)
    np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth1), np.asarray(depth2),
                               atol=1e-5)


@pytest.mark.slow
def test_samples_output_shapes():
    model = SphereModel()
    o, d = camera_rays(16)
    ret = volume_render_rays(
        model, {}, o, d, jax.random.PRNGKey(0),
        detailed_output=True, samples_output=True, bounded_near_far=False,
        N_samples=32, N_importance=32)
    n_pts = 32 + 32
    assert ret["xyz"].shape == (16, n_pts - 1, 3)
    assert ret["density"].shape == (16, n_pts - 1, 1)
    assert ret["colors"].shape == (16, n_pts - 1, 3)
    assert ret["dirs"].shape == (16, n_pts - 1, 3)


@pytest.mark.slow
def test_jit_and_grad_through_renderer():
    """The render program must be differentiable (training path)."""
    class ScaledSphere(SphereModel):
        def forward_density_only(self, params, x):
            return jnp.linalg.norm(x, axis=-1) - params["r"]

        def forward(self, params, x, view_dirs):
            sdf = self.forward_density_only(params, x)
            rgb = jnp.broadcast_to(params["c"], x.shape)
            return sdf, rgb

        def forward_with_nablas(self, params, x):
            sdf = self.forward_density_only(params, x)
            n = x / jnp.maximum(jnp.linalg.norm(x, -1, keepdims=True), 1e-9)
            return sdf, n

    model = ScaledSphere()
    o, d = camera_rays(16)
    params = {"r": jnp.asarray(0.5), "c": jnp.array([0.2, 0.5, 0.8])}

    @jax.jit
    def loss(p):
        ret = volume_render_rays(model, p, o, d, jax.random.PRNGKey(0),
                                 detailed_output=False, perturb=False,
                                 bounded_near_far=False)
        return jnp.mean((ret["rgb"] - 0.9) ** 2) + jnp.mean(
            ret["depth_volume"])

    g = jax.grad(loss)(params)
    assert np.isfinite(np.asarray(g["r"]))
    assert np.all(np.isfinite(np.asarray(g["c"])))
    assert np.abs(np.asarray(g["c"])).max() > 0


def test_color_topk_matches_full():
    """color_topk composites radiance from only the K highest-visibility
    midpoints (serving fast path; the NeuS weights concentrate at the
    surface crossing); with a position-dependent color the result must
    match the full-midpoint composite to the dropped tail's mass, and
    depth/acc maps must be bit-identical (they keep the full set)."""
    class TintedSphere(SphereModel):
        def forward(self, params, x, view_dirs):
            sdf = self.forward_density_only(params, x)
            rgb = jax.nn.sigmoid(3.0 * x + 0.3)
            return sdf, rgb

    model = TintedSphere()
    o, d = camera_rays(64)
    kw = dict(detailed_output=False, perturb=False,
              bounded_near_far=False, N_samples=64, N_importance=64,
              N_upsample_iters=4)
    full = volume_render_rays(model, {}, o, d, jax.random.PRNGKey(0),
                              **kw)
    topk = volume_render_rays(model, {}, o, d, jax.random.PRNGKey(0),
                              color_topk=16, **kw)
    np.testing.assert_array_equal(np.asarray(topk["depth_volume"]),
                                  np.asarray(full["depth_volume"]))
    np.testing.assert_array_equal(np.asarray(topk["mask_volume"]),
                                  np.asarray(full["mask_volume"]))
    np.testing.assert_allclose(np.asarray(topk["rgb"]),
                               np.asarray(full["rgb"]), atol=2e-3)
    # detailed_output must ignore the knob (training/distill semantics)
    det = volume_render_rays(model, {}, o, d, jax.random.PRNGKey(0),
                             color_topk=16, detailed_output=True,
                             perturb=False, bounded_near_far=False,
                             N_samples=64, N_importance=64,
                             N_upsample_iters=4)
    assert det["radiance"].shape[-2] == 127


def test_root_anchored_depths_properties():
    """Placement depths must be sorted, within [near, far], and degrade to
    ~uniform coverage for rays without a root."""
    from neumesh_tpu.render.volume import root_anchored_depths

    near = jnp.array([[1.0], [0.5]])
    far = jnp.array([[3.0], [2.5]])
    d_root = jnp.array([2.0, 0.0])
    mask = jnp.array([True, False])
    d = np.asarray(root_anchored_depths(near, far, d_root, mask, 48,
                                        window=0.1))
    assert d.shape == (2, 48)
    assert (np.diff(d, axis=-1) >= 0).all(), "depths must be sorted"
    assert (d >= np.asarray(near)).all() and (d <= np.asarray(far)).all()
    # rooted ray: half the samples inside the +-window
    in_win = np.sum(np.abs(d[0] - 2.0) <= 0.1 + 1e-6)
    assert in_win >= 24
    # unrooted ray: ~uniform — max gap close to uniform spacing
    gaps = np.diff(d[1])
    assert gaps.max() < 2.5 * (2.5 - 0.5) / 48


def test_root_anchored_render_close_to_hierarchical():
    """The root-anchored serving structure must reproduce the reference
    hierarchical render on a trained-shape NeuMesh (XLA route; the gate
    scores the bf16 fused config end-to-end on the trained scene)."""
    from tests.test_rayctx import make_model

    model, params = make_model()
    n = 64
    o = jnp.tile(jnp.array([[0.0, 0.0, -2.5]]), (n, 1))
    ang = jnp.linspace(-0.12, 0.12, n)
    d = jnp.stack([ang, jnp.zeros(n), jnp.ones(n)], -1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    kw = dict(detailed_output=False, perturb=False, bounded_near_far=True,
              N_samples=64, N_importance=64, N_upsample_iters=4)
    ref = volume_render_rays(model, params, o, d, jax.random.PRNGKey(0),
                             reuse_upsample_sdf=True, ray_tile=16, **kw)
    ra = volume_render_rays(model, params, o, d, jax.random.PRNGKey(0),
                            ray_tile=16, root_anchored=True,
                            root_n_fine=64, **kw)
    rgb_mae = float(np.abs(np.asarray(ref["rgb"])
                           - np.asarray(ra["rgb"])).mean())
    acc_mae = float(np.abs(np.asarray(ref["mask_volume"])
                           - np.asarray(ra["mask_volume"])).mean())
    assert np.isfinite(np.asarray(ra["rgb"])).all()
    assert rgb_mae < 0.02, rgb_mae
    assert acc_mae < 0.05, acc_mae


def test_eval_candidates_prefix_mechanism():
    """eval_candidates must slice the ranked tile context to the nearest
    prefix for the fused density evals: the knobbed result must equal a
    manual prefix-slice of the unknobbed context exactly, and stay close
    to the full-set result (the approximation itself is quality-gated by
    tools/quality_gate.py volume_bf16, not pinned here)."""
    from tests.test_rayctx import make_model

    model, params = make_model()
    model.use_pallas = True
    n = 32
    o = jnp.tile(jnp.array([[0.0, 0.0, -2.5]]), (n, 1))
    ang = jnp.linspace(-0.1, 0.1, n)
    d = jnp.stack([ang, jnp.zeros(n), jnp.ones(n)], -1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    from neumesh_tpu.ops.rays import near_far_from_sphere
    near, far = near_far_from_sphere(o, d)

    tb = model.bind_rays_tiled(params, o, d, near, far, tile=16)
    assert tb is not None
    bound, nb, fb = tb
    assert bound.ctx.get("_ranked", False)
    t = jnp.linspace(0.0, 1.0, 8)
    z = nb * (1 - t) + fb * t
    pts = o[:, None, :] + z[..., None] * d[:, None, :]
    full = np.asarray(bound.forward_density_only(params, pts))

    ec = 96
    model.eval_candidates = ec
    tb2 = model.bind_rays_tiled(params, o, d, near, far, tile=16)
    pre = np.asarray(tb2[0].forward_density_only(params, pts))

    # mechanism: knobbed == manual prefix slice of the same context
    model.eval_candidates = 0
    tb3 = model.bind_rays_tiled(params, o, d, near, far, tile=16)
    b3 = tb3[0]
    from neumesh_tpu.ops.pallas_kernels import pack_ctx_geo
    b3.ctx["geo"] = pack_ctx_geo(b3.ctx)[:, :, :ec]
    b3.ctx["feat"] = b3.ctx["feat"][:, :ec, :]
    manual = np.asarray(b3.forward_density_only(params, pts))
    np.testing.assert_allclose(pre, manual, atol=1e-6)

    # the prefix is a controlled approximation of the full set
    assert float(np.abs(pre - full).mean()) < 0.01
    model.eval_candidates = 0
