import numpy as np
import pytest

from neumesh_tpu.config import ConfigDict
from neumesh_tpu.dataio import get_data
from neumesh_tpu.dataio.synthetic import (
    generate_sphere_scene,
    rays_for_camera,
    sphere_scene_rgb,
)


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dtu_sphere")
    generate_sphere_scene(str(d), n_views=6, H=48, W=48)
    return str(d)


def make_args(scene_dir, **data_overrides):
    data = {"type": "DTU", "data_dir": scene_dir, "downscale": 1.0,
            "N_rays": 64, "batch_size": 1}
    data.update(data_overrides)
    return ConfigDict({"data": data})


def test_dataset_shapes(scene_dir):
    args = make_args(scene_dir)
    ds = get_data(args)
    assert len(ds) == 6
    idx, sample, gt = ds[0]
    assert gt["rgb"].shape == (48 * 48, 3)
    assert sample["object_mask"].shape == (48 * 48,)
    assert sample["intrinsics"].shape == (4, 4)
    assert sample["c2w"].shape == (4, 4)


def test_train_val_pair(scene_dir):
    args = make_args(scene_dir)
    train, val = get_data(args, return_val=True, val_downscale=2.0)
    assert train.H == 48 and val.H == 24
    # val intrinsics are rescaled
    np.testing.assert_allclose(val.intrinsics_all[0][0, 0],
                               train.intrinsics_all[0][0, 0] / 2.0,
                               rtol=1e-5)


def test_camera_roundtrip_through_npz(scene_dir):
    """The cameras.npz -> P -> (K, c2w) decomposition must reproduce the
    generating cameras: rays cast from loaded params must hit the sphere
    exactly where the stored mask says."""
    args = make_args(scene_dir)
    ds = get_data(args)
    for i in range(len(ds)):
        K = ds.intrinsics_all[i]
        c2w = ds.c2w_all[i]
        ro, rd = rays_for_camera(K, c2w, ds.H, ds.W)
        _, hit, _ = sphere_scene_rgb(ro, rd)
        mask = ds.object_masks[i]
        agree = (hit == mask).mean()
        assert agree > 0.995, f"view {i}: {agree}"


def test_batch_iterator(scene_dir):
    args = make_args(scene_dir)
    ds = get_data(args)
    rng = np.random.default_rng(0)
    batches = list(ds.epoch_batches(1, rng))
    assert len(batches) == 6
    idxs, model_input, gt = batches[0]
    assert model_input["c2w"].shape == (1, 4, 4)
    assert gt["rgb"].shape == (1, 48 * 48, 3)


def test_scale_radius(scene_dir):
    args = make_args(scene_dir)
    ds_raw = get_data(args)
    ds_scaled = get_data(args, scale_radius=3.0)
    norms = [np.linalg.norm(c[:3, 3]) for c in ds_scaled.c2w_all]
    assert max(norms) <= 3.0 / 1.09
    # directions preserved
    d0 = ds_raw.c2w_all[0][:3, 3] / np.linalg.norm(ds_raw.c2w_all[0][:3, 3])
    d1 = ds_scaled.c2w_all[0][:3, 3] / np.linalg.norm(
        ds_scaled.c2w_all[0][:3, 3])
    np.testing.assert_allclose(d0, d1, atol=1e-6)


def test_selected_view_export(scene_dir, tmp_path):
    args = make_args(scene_dir)
    ds = get_data(args)
    out = str(tmp_path / "subset")
    ds.save_selected_data([0, 2], out)
    # the exported subset loads as a dataset (with cameras_sphere.npz)
    args2 = make_args(out, cam_file="cameras_sphere.npz")
    sub = get_data(args2)
    assert len(sub) == 2
    np.testing.assert_allclose(sub.c2w_all[0], ds.c2w_all[0], atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(sub.rgb_images[1]), np.asarray(ds.rgb_images[2]),
        atol=2 / 255.0)
    poses = ds.get_gt_pose()
    assert poses.shape == (6, 4, 4)
