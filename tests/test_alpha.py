import jax.numpy as jnp
import numpy as np

from neumesh_tpu.ops import alpha as A


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_sdf_to_alpha_reference_formula(rng):
    sdf = rng.normal(size=(4, 9)).astype(np.float32)
    s = 64.0
    cdf, alpha = A.sdf_to_alpha(jnp.asarray(sdf), s)
    cdf_np = _sigmoid(sdf * s)
    alpha_np = np.clip(
        (cdf_np[..., :-1] - cdf_np[..., 1:]) / (cdf_np[..., :-1] + 1e-10), 0,
        None)
    np.testing.assert_allclose(np.asarray(cdf), cdf_np, atol=1e-6)
    np.testing.assert_allclose(np.asarray(alpha), alpha_np, atol=1e-6)


def test_alpha_to_w_reference_formula(rng):
    alpha = rng.uniform(0, 1, size=(3, 7)).astype(np.float32)
    w = np.asarray(A.alpha_to_w(jnp.asarray(alpha)))
    shifted = np.concatenate(
        [np.ones((3, 1), np.float32), 1 - alpha + 1e-10], -1)
    want = alpha * np.cumprod(shifted, -1)[..., :-1]
    np.testing.assert_allclose(w, want, atol=1e-6)


def test_weights_sum_below_one(rng):
    alpha = rng.uniform(0, 1, size=(5, 32)).astype(np.float32)
    w = np.asarray(A.alpha_to_w(jnp.asarray(alpha)))
    assert np.all(w.sum(-1) <= 1.0 + 1e-4)
    assert np.all(w >= 0)


def test_opaque_wall_takes_all_weight():
    # single fully-opaque sample collects ~all visibility weight
    alpha = jnp.zeros((1, 10)).at[0, 4].set(1.0)
    w = np.asarray(A.alpha_to_w(alpha))
    assert w[0, 4] > 0.999
    assert np.all(w[0, 5:] < 1e-6)
