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
