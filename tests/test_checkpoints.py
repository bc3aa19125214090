import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neumesh_tpu.utils.checkpoints import (
    CheckpointIO,
    load_checkpoint,
    restore_into,
    save_checkpoint,
    sorted_ckpts,
)


def make_tree():
    return {
        "ln_s": jnp.asarray([0.3]),
        "layers": [
            {"g": jnp.ones(4), "v": jnp.full((3, 4), 0.5), "b": jnp.zeros(4)},
            {"w": jnp.arange(12.0).reshape(4, 3), "b": jnp.ones(3)},
        ],
    }


def test_native_roundtrip(tmp_path):
    tree = make_tree()
    path = str(tmp_path / "latest.ckpt")
    save_checkpoint(path, {"model": tree, "global_step": 123})
    loaded = load_checkpoint(path)
    assert loaded["global_step"] == 123
    restored = restore_into(tree, loaded["model"])
    for a, b in zip(jax.tree_util.tree_leaves(tree),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_checkpoint_io_filters(tmp_path):
    io = CheckpointIO(str(tmp_path))
    tree = make_tree()
    io.save("latest.ckpt", model=tree, global_step=5)
    modified = jax.tree.map(lambda x: x * 0, tree)
    ckpt = io.load_file("latest.ckpt", model_template=modified,
                        only_use_keys=["ln_s"])
    np.testing.assert_allclose(np.asarray(ckpt["model"]["ln_s"]), [0.3])
    # layers kept from template (zeros)
    np.testing.assert_allclose(
        np.asarray(ckpt["model"]["layers"][0]["g"]), 0.0)

    ckpt2 = io.load_file("latest.ckpt", model_template=modified,
                         ignore_keys=["ln_s"])
    np.testing.assert_allclose(np.asarray(ckpt2["model"]["ln_s"]), [0.0])
    np.testing.assert_allclose(
        np.asarray(ckpt2["model"]["layers"][0]["g"]), 1.0)


def test_sorted_ckpts_order(tmp_path):
    for name in ("latest.ckpt", "00050000.ckpt", "00000001.ckpt",
                 "final_00200000.ckpt"):
        save_checkpoint(str(tmp_path / name), {"x": jnp.zeros(1)})
    paths = [os.path.basename(p) for p in sorted_ckpts(str(tmp_path))]
    assert paths == ["00000001.ckpt", "00050000.ckpt", "latest.ckpt",
                     "final_00200000.ckpt"]


def test_torch_pt_reader_pure_python(tmp_path):
    torch = pytest.importorskip("torch")
    sd = {
        "ln_s": torch.tensor([0.29]),
        "geometry_features": torch.randn(10, 4),
        "pts_linears.0.weight_g": torch.rand(8, 1),
        "pts_linears.0.weight_v": torch.randn(8, 5),
        "pts_linears.0.bias": torch.randn(8),
    }
    path = str(tmp_path / "ref.pt")
    torch.save({"model": sd, "global_step": 77}, path)

    from neumesh_tpu.utils.torch_ckpt import load_torch_checkpoint
    out = load_torch_checkpoint(path)
    assert out["global_step"] == 77
    for k, v in sd.items():
        np.testing.assert_allclose(out["model"][k], v.numpy(), atol=1e-7)


def test_torch_statedict_converter_matches_forward(tmp_path):
    """A torch weight-norm MLP and the converted params must produce the
    same output."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    lin1 = torch.nn.utils.weight_norm(torch.nn.Linear(6, 8))
    lin2 = torch.nn.Linear(8, 3)
    sd = {}
    for k, v in lin1.state_dict().items():
        sd[f"l1.{k}"] = v
    for k, v in lin2.state_dict().items():
        sd[f"l2.{k}"] = v

    from neumesh_tpu.nn import maybe_wnorm_apply
    from neumesh_tpu.utils.torch_ckpt import _lin, _to_jnp
    p1 = _to_jnp(_lin(sd, "l1"))
    p2 = _to_jnp(_lin(sd, "l2"))

    x = np.random.default_rng(0).normal(size=(4, 6)).astype(np.float32)
    with torch.no_grad():
        want = lin2(torch.relu(lin1(torch.from_numpy(x)))).numpy()
    h = jnp.maximum(maybe_wnorm_apply(p1, jnp.asarray(x)), 0.0)
    got = np.asarray(maybe_wnorm_apply(p2, h))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_load_checkpoint_dispatches_pt(tmp_path):
    torch = pytest.importorskip("torch")
    path = str(tmp_path / "m.pt")
    torch.save({"model": {"a": torch.ones(3)}}, path)
    out = load_checkpoint(path)
    np.testing.assert_allclose(out["model"]["a"], 1.0)


def test_torch_export_roundtrip(tmp_path):
    """params -> reference .pt -> (pure-python reader + converter) -> same
    leaves; and torch.load can read the exported file directly."""
    import torch

    from neumesh_tpu.dataio.synthetic import sphere_mesh
    from neumesh_tpu.mesh import MeshGrid
    from neumesh_tpu.models.neumesh.model import NeuMesh
    from neumesh_tpu.utils.checkpoints import load_checkpoint
    from neumesh_tpu.utils.torch_ckpt import (
        neumesh_state_dict_to_params,
        save_torch_checkpoint,
    )

    mesh = sphere_mesh(radius=0.5, n_theta=12, n_phi=24)
    mg = MeshGrid(mesh, distance_method="brute")
    model = NeuMesh(mg, D_density=2, D_color=2, W=16, geometry_dim=4,
                    color_dim=4, multires_view=1, multires_d=2,
                    multires_fg=1, multires_ft=1,
                    learn_indicator_weight=True)
    params = model.init(jax.random.PRNGKey(3))

    path = str(tmp_path / "export.pt")
    save_torch_checkpoint(path, params, model, global_step=7)

    # torch itself reads it
    ck = torch.load(path, map_location="cpu", weights_only=False)
    assert ck["global_step"] == 7
    assert "pts_linears.0.weight_g" in ck["model"]

    # our pure-python reader + converter round-trips
    loaded = load_checkpoint(path)
    params2 = neumesh_state_dict_to_params(
        {k: np.asarray(v) for k, v in loaded["model"].items()}, model)

    flat1, _ = jax.tree_util.tree_flatten(params)
    flat2, _ = jax.tree_util.tree_flatten(params2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
