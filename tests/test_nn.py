import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neumesh_tpu import nn as tnn


def test_embedder_matches_manual():
    emb, out_dim = tnn.get_embedder(4, input_dim=3)
    assert out_dim == 3 * (1 + 2 * 4)
    x = jnp.array([[0.1, -0.2, 0.3]])
    y = np.asarray(emb(x))
    freqs = 2.0 ** np.linspace(0, 3, 4)
    manual = [np.asarray(x)]
    for f in freqs:
        manual.append(np.sin(np.asarray(x) * f))
        manual.append(np.cos(np.asarray(x) * f))
    np.testing.assert_allclose(y, np.concatenate(manual, -1), atol=1e-6)


def test_embedder_identity():
    emb, out_dim = tnn.get_embedder(-1, input_dim=5)
    assert out_dim == 5
    x = jnp.ones((2, 5))
    np.testing.assert_allclose(np.asarray(emb(x)), np.asarray(x))


def test_weight_norm_matches_torch():
    torch = pytest.importorskip("torch")
    lin = torch.nn.utils.weight_norm(torch.nn.Linear(7, 5))
    x = np.random.default_rng(0).normal(size=(3, 7)).astype(np.float32)
    with torch.no_grad():
        want = lin(torch.from_numpy(x)).numpy()
    p = {
        "g": jnp.asarray(lin.weight_g.detach().numpy()[:, 0]),
        "v": jnp.asarray(lin.weight_v.detach().numpy().T),
        "b": jnp.asarray(lin.bias.detach().numpy()),
    }
    got = np.asarray(tnn.wnorm_linear_apply(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_wnorm_init_preserves_weight():
    key = jax.random.PRNGKey(0)
    p = tnn.linear_init(key, 6, 4)
    wn = tnn.wnorm_from_weight(p["w"])
    np.testing.assert_allclose(
        np.asarray(tnn.wnorm_weight({"g": wn["g"], "v": wn["v"]})),
        np.asarray(p["w"]), atol=1e-6)


def test_softplus100_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.linspace(-0.5, 0.5, 101).astype(np.float32)
    want = torch.nn.Softplus(beta=100)(torch.from_numpy(x)).numpy()
    got = np.asarray(tnn.softplus100(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_f32_matmul_precision_context():
    """f32_matmul_precision scopes the _f32_dot precision at TRACE time
    (training wraps its loss in 'high'; parity/serving code outside the
    context keeps exact 'highest' passes) and restores on exit, even
    through exceptions."""
    x = jnp.asarray(np.random.default_rng(0).random((8, 16), np.float32))
    w = jnp.asarray(np.random.default_rng(1).random((16, 4), np.float32))

    assert tnn._F32_DOT_PRECISION[-1] == "highest"
    with tnn.f32_matmul_precision("high"):
        assert tnn._F32_DOT_PRECISION[-1] == "high"
        y_high = tnn._f32_dot(x, w)
        with tnn.f32_matmul_precision("default"):
            assert tnn._F32_DOT_PRECISION[-1] == "default"
        assert tnn._F32_DOT_PRECISION[-1] == "high"
    assert tnn._F32_DOT_PRECISION[-1] == "highest"

    with pytest.raises(RuntimeError):
        with tnn.f32_matmul_precision("high"):
            raise RuntimeError("boom")
    assert tnn._F32_DOT_PRECISION[-1] == "highest"

    # on CPU every precision tier is a true-f32 matmul: the context must
    # not change values (the TPU-only difference is MXU pass count)
    np.testing.assert_allclose(np.asarray(y_high),
                               np.asarray(tnn._f32_dot(x, w)), atol=1e-6)


def test_build_train_step_bakes_matmul_precision():
    """The jitted train step traces its loss inside the requested
    precision context (baked at trace time, restored after)."""
    from neumesh_tpu import nn as tnn2

    seen = []
    orig = tnn2._f32_dot

    def spy(x, w):
        seen.append(tnn2._F32_DOT_PRECISION[-1])
        return orig(x, w)

    tnn2._f32_dot = spy
    try:
        import jax

        from neumesh_tpu.train.loop import build_train_step
        from neumesh_tpu.models.neus.model import NeuS
        from neumesh_tpu.train.trainer import Trainer
        from tests.test_multidevice import _tiny_model
        model, params = _tiny_model()
        teacher = NeuS(
            variance_init=0.05, speed_factor=10.0, W_geo_feat=32,
            obj_bounding_radius=1.0,
            surface_cfg={"D": 2, "W": 32, "skips": (),
                         "embed_multires": 2},
            radiance_cfg={"D": 2, "W": 32, "embed_multires": -1,
                          "embed_multires_view": 2})
        teacher_params = teacher.init(jax.random.PRNGKey(7))
        trainer = Trainer(
            model, {"img": 1.0, "mask": 0.1, "eikonal": 0.1,
                    "distill_density": 1.0, "distill_color": 1.0,
                    "indicator_reg": 0.001}, teacher_model=teacher)
        import optax
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        H = W = 8
        step = build_train_step(
            trainer, opt, dict(perturb=False, N_samples=8, N_importance=8,
                               N_upsample_iters=2, bounded_near_far=False),
            N_rays=4, H=H, W=W, matmul_precision="high")
        focal = 8.0
        intr = jnp.asarray([[[focal, 0, W / 2], [0, focal, H / 2],
                             [0, 0, 1]]], jnp.float32)
        c2w = jnp.asarray([[[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, -1, 2.5],
                            [0, 0, 0, 1]]], jnp.float32)
        model_input = {"intrinsics": intr, "c2w": c2w,
                       "object_mask": jnp.ones((1, H * W), bool)}
        gt = {"rgb": jnp.zeros((1, H * W, 3), jnp.float32)}
        _, _, total, _ = step(params, opt_state, model_input, gt,
                              jax.random.PRNGKey(0), teacher_params)
        assert np.isfinite(float(total))
    finally:
        tnn2._f32_dot = orig
    assert seen and all(p == "high" for p in seen)
    assert tnn2._F32_DOT_PRECISION[-1] == "highest"


def test_mlp_compute_dtype_context():
    """mlp_compute_dtype makes dtype-less MLP applies run in the context
    dtype (the no-grad distill teacher path) and restores on exit; an
    explicit dtype argument still wins."""
    p = tnn.linear_init(jax.random.PRNGKey(0), 8, 4)
    x = jnp.asarray(np.random.default_rng(0).random((3, 8), np.float32))

    assert tnn.linear_apply(p, x).dtype == jnp.float32
    assert tnn.maybe_wnorm_apply(p, x).dtype == jnp.float32
    with tnn.mlp_compute_dtype(jnp.bfloat16):
        assert tnn.linear_apply(p, x).dtype == jnp.bfloat16
        assert tnn.maybe_wnorm_apply(p, x).dtype == jnp.bfloat16
        assert tnn.maybe_wnorm_apply_parts(p, [x]).dtype == jnp.bfloat16
        # numerics stay close to f32
        np.testing.assert_allclose(
            np.asarray(tnn.linear_apply(p, x), np.float32),
            np.asarray(tnn._f32_dot(x, p["w"]) + p["b"]),
            atol=0.05)
    assert tnn.linear_apply(p, x).dtype == jnp.float32


def test_trainer_teacher_dtype_bf16_targets_close_to_f32():
    """Trainer(teacher_dtype=bf16) evaluates the distill teacher in bf16
    and returns f32 stop-gradient targets close to the f32 evaluation
    (the distill loss moves < 1e-2 on a random tiny model)."""
    from neumesh_tpu.models.neus.model import NeuS
    from neumesh_tpu.train.trainer import Trainer
    from tests.test_multidevice import _tiny_model

    model, params = _tiny_model()
    teacher = NeuS(
        variance_init=0.05, speed_factor=10.0, W_geo_feat=32,
        obj_bounding_radius=1.0,
        surface_cfg={"D": 2, "W": 32, "skips": (), "embed_multires": 2},
        radiance_cfg={"D": 2, "W": 32, "embed_multires": -1,
                      "embed_multires_view": 2})
    teacher_params = teacher.init(jax.random.PRNGKey(7))
    weights = {"img": 1.0, "mask": 0.1, "eikonal": 0.1,
               "distill_density": 1.0, "distill_color": 1.0,
               "indicator_reg": 0.001}
    rng = np.random.default_rng(3)
    R, S = 4, 8
    extras = {
        "mask_volume": jnp.asarray(rng.uniform(size=(R,)), jnp.float32),
        "implicit_nablas": jnp.asarray(rng.normal(size=(R, S, 3)),
                                       jnp.float32),
        "xyz": jnp.asarray(rng.normal(scale=0.3, size=(R, S, 3)),
                           jnp.float32),
        "dirs": jnp.asarray(rng.normal(size=(R, S, 3)), jnp.float32),
        "density": jnp.asarray(rng.normal(size=(R, S, 1)), jnp.float32),
        "colors": jnp.asarray(rng.uniform(size=(R, S, 3)), jnp.float32),
    }
    rgb = jnp.asarray(rng.uniform(size=(R, 3)), jnp.float32)
    target = jnp.asarray(rng.uniform(size=(R, 3)), jnp.float32)

    outs = {}
    for tag, dt in [("f32", None), ("bf16", "bfloat16")]:
        tr = Trainer(model, weights, teacher_model=teacher,
                     teacher_dtype=dt)
        ret = tr.compute_loss(params, rgb, target, dict(extras),
                              use_distill_loss=True, use_eikonal_loss=True,
                              use_indicator_reg=True,
                              teacher_params=teacher_params)
        outs[tag] = {k: float(v) for k, v in ret["losses"].items()}
    for k in outs["f32"]:
        assert abs(outs["f32"][k] - outs["bf16"][k]) < 1e-2, (
            k, outs["f32"][k], outs["bf16"][k])
    # the targets genuinely ran at a different precision
    assert outs["f32"]["loss_density"] != outs["bf16"]["loss_density"]
