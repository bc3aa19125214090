"""DTU/IDR scene dataset (reference dataio/DTU.py), numpy/host-side.

Loads image/ + mask/ directories and cameras.npz (world_mat_i / scale_mat_i
-> K, c2w via the pure-numpy projection decomposition), with optional
intrinsics from camera_mat_i (NeRF-synthetic scenes; reference
DTU.py:62-68), downscaling of images + intrinsics, and camera-distance
normalisation (scale_radius; reference DTU.py:92-95).

Items are whole images flattened to (H*W, 3) rgb + bool mask, matching the
reference's per-image sampling granularity (DTU.py:133-151). A light batch
iterator replaces the torch DataLoader.
"""
from __future__ import annotations

import glob
import os
from typing import Optional

import numpy as np

from ..ops.cameras import load_K_Rt_from_P

_IMG_EXTS = (".png", ".jpg", ".jpeg", ".JPG", ".PNG", ".bmp", ".exr")


def glob_imgs(d: str):
    paths = []
    for ext in _IMG_EXTS:
        paths.extend(glob.glob(os.path.join(d, f"*{ext}")))
    return sorted(paths)


def load_rgb(path: str, downscale: float = 1.0) -> np.ndarray:
    """(H, W, 3) float32 in [0, 1] (reference utils/io_util.py:41-51
    loads CHW; we keep HWC and flatten later)."""
    import imageio.v2 as imageio
    img = imageio.imread(path)
    img = np.asarray(img)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    elif img.dtype == np.uint16:
        img = img.astype(np.float32) / 65535.0
    else:
        img = img.astype(np.float32)
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    img = img[..., :3]
    if downscale != 1:
        import cv2
        h, w = img.shape[:2]
        img = cv2.resize(
            img, (int(w / downscale), int(h / downscale)),
            interpolation=cv2.INTER_AREA)
    return img


def load_mask(path: str, downscale: float = 1.0) -> np.ndarray:
    """(H, W) bool; threshold at 127.5/255 (reference utils/io_util.py:54-61)."""
    import imageio.v2 as imageio
    alpha = imageio.imread(path)
    alpha = np.asarray(alpha)
    if alpha.ndim == 3:
        alpha = alpha[..., :3].mean(-1)
    alpha = alpha.astype(np.float32)
    if alpha.max() <= 1.0 + 1e-6:
        alpha = alpha * 255.0
    if downscale != 1:
        import cv2
        h, w = alpha.shape[:2]
        alpha = cv2.resize(
            alpha, (int(w / downscale), int(h / downscale)),
            interpolation=cv2.INTER_NEAREST)
    return alpha > 127.5


class SceneDataset:
    def __init__(
        self,
        train_cameras: bool,
        data_dir: str,
        downscale: float = 1.0,
        cam_file: Optional[str] = None,
        scale_radius: float = -1,
        split: str = "entire",
        intrinsic_from_cammat: bool = False,
        verbose: bool = False,
    ):
        assert os.path.exists(data_dir), f"Data directory is empty: {data_dir}"
        self.instance_dir = data_dir
        self.train_cameras = train_cameras
        self.downscale = downscale

        image_paths = glob_imgs(os.path.join(data_dir, "image"))
        mask_paths = glob_imgs(os.path.join(data_dir, "mask"))
        n_images = len(image_paths)
        assert n_images > 0, f"no images under {data_dir}/image"

        tmp_rgb = load_rgb(image_paths[0], downscale)
        self.H, self.W = tmp_rgb.shape[:2]

        self.cam_file = os.path.join(data_dir, cam_file or "cameras.npz")
        camera_dict = np.load(self.cam_file)
        scale_mats = [camera_dict[f"scale_mat_{i}"].astype(np.float32)
                      for i in range(n_images)]
        world_mats = [camera_dict[f"world_mat_{i}"].astype(np.float32)
                      for i in range(n_images)]
        intrinsic_mats = None
        if "camera_mat_0" in camera_dict and intrinsic_from_cammat:
            intrinsic_mats = [camera_dict[f"camera_mat_{i}"].astype(np.float32)
                              for i in range(n_images)]

        self.intrinsics_all = []
        self.c2w_all = []
        cam_center_norms = []
        for i, (scale_mat, world_mat) in enumerate(
                zip(scale_mats, world_mats)):
            P = (world_mat @ scale_mat)[:3, :4]
            if intrinsic_mats is None:
                intrinsics, pose = load_K_Rt_from_P(P)
            else:
                _, pose = load_K_Rt_from_P(P)
                intrinsics = np.eye(4)
                intrinsics[:3, :3] = intrinsic_mats[i][:3, :3]
            cam_center_norms.append(np.linalg.norm(pose[:3, 3]))
            # downscale intrinsics (skew is a ratio — not scaled;
            # reference DTU.py:84-88)
            intrinsics = intrinsics.copy()
            intrinsics[0, 2] /= downscale
            intrinsics[1, 2] /= downscale
            intrinsics[0, 0] /= downscale
            intrinsics[1, 1] /= downscale
            self.intrinsics_all.append(intrinsics.astype(np.float32))
            self.c2w_all.append(pose.astype(np.float32))

        max_cam_norm = max(cam_center_norms)
        if scale_radius > 0:
            for i in range(len(self.c2w_all)):
                self.c2w_all[i][:3, 3] *= scale_radius / max_cam_norm / 1.1

        self.rgb_images = []
        for path in image_paths:
            rgb = load_rgb(path, downscale)
            self.rgb_images.append(
                rgb.reshape(-1, 3).astype(np.float32))
        self.object_masks = []
        for path in mask_paths:
            m = load_mask(path, downscale)
            self.object_masks.append(m.reshape(-1))

        if verbose:
            print(f"# dataset {n_images} images {self.H}x{self.W} "
                  f"downscale {downscale}")

    # ------------------------------------------------------------------
    def __len__(self):
        return len(self.rgb_images)

    def __getitem__(self, idx: int):
        sample = {
            "object_mask": self.object_masks[idx],
            "intrinsics": self.intrinsics_all[idx],
        }
        if not self.train_cameras:
            sample["c2w"] = self.c2w_all[idx]
        ground_truth = {"rgb": self.rgb_images[idx]}
        return idx, sample, ground_truth

    def batch(self, indices):
        """Stack items into batched numpy dicts (the collate_fn analog,
        reference DTU.py:153-168)."""
        items = [self[i] for i in indices]
        idxs = np.asarray([it[0] for it in items])
        model_input = {
            k: np.stack([it[1][k] for it in items])
            for k in items[0][1]
        }
        ground_truth = {
            k: np.stack([it[2][k] for it in items])
            for k in items[0][2]
        }
        return idxs, model_input, ground_truth

    def epoch_batches(self, batch_size: int, rng: np.random.Generator,
                      shuffle: bool = True):
        order = np.arange(len(self))
        if shuffle:
            rng.shuffle(order)
        for i in range(0, len(order) - batch_size + 1, batch_size):
            yield self.batch(order[i:i + batch_size])

    # accessors (reference DTU.py:273-287)
    def get_images(self):
        return self.rgb_images

    def get_masks(self):
        return self.object_masks

    def get_intrinsics(self):
        return self.intrinsics_all

    def get_c2ws(self):
        return self.c2w_all

    def get_image_size(self):
        return self.H, self.W

    def get_scale_mat(self):
        return np.load(self.cam_file)["scale_mat_0"]

    # selected-view export utilities (reference DTU.py:170-271)
    def get_gt_pose(self, scaled: bool = True):
        """c2w poses without the unit-sphere normalisation option
        (reference DTU.py:173-194)."""
        camera_dict = np.load(self.cam_file)
        n = len(self)
        poses = []
        for i in range(n):
            P = camera_dict[f"world_mat_{i}"].astype(np.float32)
            if scaled:
                P = P @ camera_dict[f"scale_mat_{i}"].astype(np.float32)
            _, pose = load_K_Rt_from_P(P[:3, :4])
            poses.append(pose)
        return np.stack(poses)

    def get_selected_pose_data(self, select_ids=None):
        """Camera dict for a subset of views incl. inverses
        (reference DTU.py:223-249)."""
        camera_dict = np.load(self.cam_file)
        n = len(self)
        if select_ids is None:
            select_ids = range(n)
        out = {}
        for i, vid in enumerate(select_ids):
            sm = camera_dict[f"scale_mat_{vid}"].astype(np.float32)
            wm = camera_dict[f"world_mat_{vid}"].astype(np.float32)
            out[f"scale_mat_{i}"] = sm
            out[f"scale_mat_inv_{i}"] = np.linalg.inv(sm)
            out[f"world_mat_{i}"] = wm
            out[f"world_mat_inv_{i}"] = np.linalg.inv(wm)
        return out

    def save_selected_data(self, selected_ids, out_dir: str):
        """Export a view subset as a standalone DTU-format dataset
        (reference DTU.py:251-271)."""
        import imageio.v2 as imageio
        os.makedirs(os.path.join(out_dir, "image"), exist_ok=True)
        os.makedirs(os.path.join(out_dir, "mask"), exist_ok=True)
        for i, vid in enumerate(selected_ids):
            img = (np.clip(self.rgb_images[vid], 0, 1)
                   .reshape(self.H, self.W, 3) * 255).astype(np.uint8)
            msk = (self.object_masks[vid].reshape(self.H, self.W)
                   * 255).astype(np.uint8)
            imageio.imwrite(
                os.path.join(out_dir, "image", f"{i:04d}.png"), img)
            imageio.imwrite(
                os.path.join(out_dir, "mask", f"{i:04d}.png"), msk)
        np.savez(os.path.join(out_dir, "cameras_sphere.npz"),
                 **self.get_selected_pose_data(selected_ids))
