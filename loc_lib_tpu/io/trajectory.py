"""Trajectory writers/readers: KITTI and TUM formats.

Rebuild of the reference `SavePose`
(/root/reference/LocUtils/src/tools/save_pose.cpp:70-103 KITTI,
158-183 TUM). The reference's TUM batch writer has a bug (it writes the
unrelated `time` symbol for every row, save_pose.cpp:169); we write the real
per-pose timestamps. Readers are provided for the eval stack (ATE/RPE needs
ground-truth tracks in the same formats).
"""

from __future__ import annotations

import numpy as np

from ..utils import lie
import jax.numpy as jnp


def save_kitti(path: str, poses: np.ndarray) -> None:
    """poses: (T, 4, 4) -> KITTI rows (3x4 row-major, save_pose.cpp:70-87).
    Formats in the native runtime when available (io/native.py)."""
    poses = np.asarray(poses)
    from . import native

    raw = native.format_kitti(poses) if len(poses) else None
    if raw is not None:
        with open(path, "wb") as f:
            f.write(raw)
        return
    rows = poses[:, :3, :].reshape(len(poses), 12)
    np.savetxt(path, rows, fmt="%.9g")


def load_kitti(path: str) -> np.ndarray:
    rows = np.loadtxt(path).reshape(-1, 3, 4)
    out = np.tile(np.eye(4), (len(rows), 1, 1))
    out[:, :3, :] = rows
    return out


def save_tum(path: str, stamps: np.ndarray, poses: np.ndarray) -> None:
    """TUM rows: `t x y z qx qy qz qw` (save_pose.cpp:105-130)."""
    poses = np.asarray(poses)
    q = np.asarray(lie.quat_from_rotm(jnp.asarray(poses[:, :3, :3])))  # (T,4) wxyz
    with open(path, "w") as f:
        for i in range(len(poses)):
            t = poses[i, :3, 3]
            f.write(
                f"{stamps[i]:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                f"{q[i,1]:.6f} {q[i,2]:.6f} {q[i,3]:.6f} {q[i,0]:.6f}\n"
            )


def load_tum(path: str):
    rows = np.loadtxt(path).reshape(-1, 8)
    stamps = rows[:, 0]
    poses = np.tile(np.eye(4), (len(rows), 1, 1))
    poses[:, :3, 3] = rows[:, 1:4]
    q_wxyz = np.concatenate([rows[:, 7:8], rows[:, 4:7]], axis=1)
    poses[:, :3, :3] = np.asarray(lie.rotm_from_quat(jnp.asarray(q_wxyz)))
    return stamps, poses


def interp_pose(stamps: np.ndarray, poses: np.ndarray, query_time: float,
                time_th: float = 0.5):
    """SE(3) pose interpolation over a timestamped pose buffer — the
    `math::PoseInterp` analog (math_utils.h:470-517): rotation slerped,
    translation lerped between the straddling poses. Queries past the last
    stamp within `time_th` return the last pose (the reference's
    still-acceptable extrapolation window); outside the buffer returns
    None. `poses` is (T, 4, 4); stamps ascending."""
    stamps = np.asarray(stamps, np.float64)
    poses = np.asarray(poses)
    if len(stamps) == 0:
        return None
    if query_time > stamps[-1]:
        return poses[-1].copy() if query_time < stamps[-1] + time_th else None
    if query_time < stamps[0]:
        return None
    i = int(np.searchsorted(stamps, query_time, side="right") - 1)
    i = min(max(i, 0), len(stamps) - 2) if len(stamps) > 1 else 0
    dt = stamps[i + 1] - stamps[i] if len(stamps) > 1 else 0.0
    if abs(dt) < 1e-6:
        return poses[i].copy()
    s = float((query_time - stamps[i]) / dt)
    qa = lie.quat_from_rotm(jnp.asarray(poses[i, :3, :3], jnp.float32))
    qb = lie.quat_from_rotm(jnp.asarray(poses[i + 1, :3, :3], jnp.float32))
    R = np.asarray(lie.rotm_from_quat(lie.quat_slerp(qa, qb, s)))
    T = np.eye(4, dtype=poses.dtype)
    T[:3, :3] = R
    T[:3, 3] = poses[i, :3, 3] * (1.0 - s) + poses[i + 1, :3, 3] * s
    return T
