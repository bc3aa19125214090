import numpy as np
import pytest

from neumesh_tpu.ops import cameras


def random_projection(rng):
    K = np.array([
        [1500.0 + rng.uniform(-100, 100), rng.uniform(0, 2.0), 800.0],
        [0.0, 1500.0 + rng.uniform(-100, 100), 600.0],
        [0.0, 0.0, 1.0],
    ])
    # random rotation via QR
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = rng.normal(size=(3, 1)) * 2
    return K, Q, t, K @ np.concatenate([Q, t], axis=1)


def test_load_K_Rt_roundtrip(rng):
    for _ in range(20):
        K, R, t, P = random_projection(rng)
        intr, pose = cameras.load_K_Rt_from_P(P)
        np.testing.assert_allclose(intr[:3, :3], K, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(pose[:3, :3], R.T, rtol=1e-5, atol=1e-5)
        # camera center: -R^T t
        c = -R.T @ t[:, 0]
        np.testing.assert_allclose(pose[:3, 3], c, rtol=1e-4, atol=1e-4)


def test_load_K_Rt_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    for _ in range(10):
        _, _, _, P = random_projection(rng)
        intr, pose = cameras.load_K_Rt_from_P(P)
        out = cv2.decomposeProjectionMatrix(P)
        K_cv = out[0] / out[0][2, 2]
        R_cv, t_cv = out[1], out[2]
        np.testing.assert_allclose(intr[:3, :3], K_cv, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(pose[:3, :3], R_cv.T, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            pose[:3, 3], (t_cv[:3] / t_cv[3])[:, 0], rtol=1e-3, atol=1e-4)


def test_quat_rot_roundtrip(rng):
    A = rng.normal(size=(5, 3, 3))
    Rs = []
    for i in range(5):
        Q, _ = np.linalg.qr(A[i])
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        Rs.append(Q)
    Rs = np.stack(Rs)
    q = cameras.rot_to_quat(Rs)
    R2 = cameras.quat_to_rot(q)
    np.testing.assert_allclose(Rs, R2, atol=1e-6)


def test_look_at_points_at_target():
    cam = np.array([0.0, 0.0, -3.0])
    target = np.zeros(3)
    m = cameras.look_at(cam, target)
    # camera z axis points from cam to target (openCV)
    np.testing.assert_allclose(m[:3, 2], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(m[:3, 3], cam, atol=1e-6)
