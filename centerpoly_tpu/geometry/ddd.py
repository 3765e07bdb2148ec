"""3D box geometry helpers for the ddd task.

Behavioral reference: src/lib/utils/ddd_utils.py — camera unprojection,
alpha <-> rotation_y conversion, 3D box corner construction/projection.
Host-side numpy (eval/visualization path, not jitted).
"""
from __future__ import annotations

import numpy as np


def get_alpha(rot: np.ndarray) -> np.ndarray:
    """Multi-bin rotation head -> observation angle alpha
    (ref post_process.py:15-22). rot: (N, 8)."""
    idx = rot[:, 1] > rot[:, 5]
    # arctan2, not arctan(sin/cos): the ratio loses the quadrant (alpha
    # off by pi when cos < 0) and divides by zero at cos == 0
    alpha1 = np.arctan2(rot[:, 2], rot[:, 3]) + (-0.5 * np.pi)
    alpha2 = np.arctan2(rot[:, 6], rot[:, 7]) + (0.5 * np.pi)
    return alpha1 * idx + alpha2 * (1 - idx)


def unproject_2d_to_3d(pt_2d, depth: float, calib: np.ndarray) -> np.ndarray:
    """Pixel + depth -> camera coords (ref ddd_utils.py:69-78)."""
    z = depth - calib[2, 3]
    x = (pt_2d[0] * depth - calib[0, 3] - calib[0, 2] * z) / calib[0, 0]
    y = (pt_2d[1] * depth - calib[1, 3] - calib[1, 2] * z) / calib[1, 1]
    return np.array([x, y, z], dtype=np.float32)


def alpha2rot_y(alpha: float, x: float, cx: float, fx: float) -> float:
    """Observation angle -> yaw (ref ddd_utils.py:80-91)."""
    rot_y = alpha + np.arctan2(x - cx, fx)
    if rot_y > np.pi:
        rot_y -= 2 * np.pi
    if rot_y < -np.pi:
        rot_y += 2 * np.pi
    return rot_y


def ddd2locrot(center, alpha: float, dim, depth: float,
               calib: np.ndarray):
    """(center px, alpha, dim, depth) -> (location xyz, rotation_y)
    (ref ddd_utils.py:106-111)."""
    locations = unproject_2d_to_3d(center, depth, calib)
    locations[1] += dim[0] / 2
    rotation_y = alpha2rot_y(alpha, center[0], calib[0, 2], calib[0, 0])
    return locations, rotation_y


def compute_box_3d(dim, location, rotation_y: float) -> np.ndarray:
    """3D box corners (8, 3) in camera coords (ref ddd_utils.py:8-23)."""
    c, s = np.cos(rotation_y), np.sin(rotation_y)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float32)
    l, w, h = dim[2], dim[1], dim[0]
    x = [l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2, -l / 2, -l / 2]
    y = [0, 0, 0, 0, -h, -h, -h, -h]
    z = [w / 2, -w / 2, -w / 2, w / 2, w / 2, -w / 2, -w / 2, w / 2]
    corners = rot @ np.array([x, y, z], dtype=np.float32)
    return (corners + np.asarray(location, np.float32).reshape(3, 1)).T


def project_to_image(pts_3d: np.ndarray, calib: np.ndarray) -> np.ndarray:
    """(N, 3) camera coords -> (N, 2) pixels (ref ddd_utils.py:25-33)."""
    homo = np.concatenate(
        [pts_3d, np.ones((pts_3d.shape[0], 1), np.float32)], axis=1)
    pts = (calib @ homo.T).T
    return pts[:, :2] / pts[:, 2:]
