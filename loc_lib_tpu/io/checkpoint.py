"""Checkpoint / resume and the keyframe store.

The reference's persistence story is file-based and coarse: every keyframe
cloud is written as a PCD (/root/reference/LocUtils/src/slam/3d/lio.cpp:
116-129), keyframe poses live in memory and export as KITTI/TUM
(src/tools/save_pose.cpp:70-103), the global map is re-assembled from the
keyframe PCDs on disk (lio.cpp:550-580), and `FileManager::InitDirectory`
deletes and recreates output dirs at startup (src/tools/file_manager.cpp:
36-44) — so mapping runs are NOT resumable mid-stream.

This module upgrades that to real checkpoint/resume (SURVEY.md section 5):
the whole pipeline state — a pytree of fixed-shape arrays (LioState /
LocState / EskfState) — snapshots atomically with orbax when available and
a plain npz fallback otherwise, plus a `KeyframeStore` that fills the
FileManager + per-keyframe-PCD role (lio.cpp:116-129, file_manager.cpp:
36-44, 100-146) with npz/PCD blobs and a manifest.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from typing import Any, Optional

import jax
import numpy as np

from . import pcd as pcd_io

try:  # orbax is baked into the image but stay import-safe
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


# ---------------------------------------------------------------------------
# Pytree state snapshots
# ---------------------------------------------------------------------------

def _flatten_to_arrays(tree: Any) -> tuple[dict[str, np.ndarray], Any]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    return arrays, treedef


def save_state(path: str, state: Any, step: Optional[int] = None) -> str:
    """Atomic snapshot of a pytree state (LioState/LocState/EskfState/...).

    Writes `<path>` as an .npz (appending the suffix if missing) via a
    temp-file rename so a crash never leaves a torn checkpoint. Returns the
    final path.
    """
    if not path.endswith(".npz"):
        path = path + ".npz"
    arrays, _ = _flatten_to_arrays(state)
    if step is not None:
        arrays["__step__"] = np.asarray(step)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(path)),
                               suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return path


def load_state(path: str, like: Any) -> tuple[Any, Optional[int]]:
    """Restore a pytree saved by `save_state`. `like` provides the treedef
    (an example state built by the pipeline's init_state). Returns
    (state, step)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    restored = []
    for i, ref in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if arr.shape != np.shape(ref):
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != expected {np.shape(ref)}"
                " — options/capacities differ from the saving run")
        restored.append(arr.astype(np.asarray(ref).dtype))
    step = int(data["__step__"]) if "__step__" in data else None
    return jax.tree_util.tree_unflatten(treedef, restored), step


class Checkpointer:
    """Rolling checkpoint manager: orbax `CheckpointManager` when available
    (async-safe, step-indexed, GC of old steps), npz fallback otherwise.
    Either way the API is save(step, state) / latest() / restore(like)."""

    def __init__(self, directory: str, max_to_keep: int = 3,
                 use_orbax: Optional[bool] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.max_to_keep = max_to_keep
        self._orbax = _HAVE_ORBAX if use_orbax is None else use_orbax
        if self._orbax:
            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))

    def save(self, step: int, state: Any) -> None:
        if self._orbax:
            self._mgr.save(step, args=ocp.args.StandardSave(state))
            self._mgr.wait_until_finished()
            return
        save_state(os.path.join(self.directory, f"ckpt_{step:08d}"), state, step)
        kept = sorted(p for p in os.listdir(self.directory)
                      if p.startswith("ckpt_") and p.endswith(".npz"))
        for old in kept[: -self.max_to_keep]:
            os.unlink(os.path.join(self.directory, old))

    def latest(self) -> Optional[int]:
        if self._orbax:
            return self._mgr.latest_step()
        kept = sorted(p for p in os.listdir(self.directory)
                      if p.startswith("ckpt_") and p.endswith(".npz"))
        return int(kept[-1][5:13]) if kept else None

    def restore(self, like: Any, step: Optional[int] = None) -> tuple[Any, int]:
        step = self.latest() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        if self._orbax:
            state = self._mgr.restore(step, args=ocp.args.StandardRestore(like))
            return state, step
        state, _ = load_state(
            os.path.join(self.directory, f"ckpt_{step:08d}"), like)
        return state, step

    def close(self) -> None:
        if self._orbax:
            self._mgr.close()


# ---------------------------------------------------------------------------
# Keyframe store (FileManager + per-keyframe PCD, lio.cpp:116-129)
# ---------------------------------------------------------------------------

class KeyframeStore:
    """Directory of keyframe clouds + poses with a JSON manifest.

    Mirrors the reference flow — keyframes persist as individual cloud files
    named key_frame_<i> (lio.cpp:116-120) and the global map re-assembles
    from them (lio.cpp:550-580) — but resumable: the manifest records poses
    and count, so a restarted run continues appending instead of wiping
    (FileManager::InitDirectory's delete-and-recreate, file_manager.cpp:
    36-44, is opt-in via fresh=True).
    """

    def __init__(self, directory: str, fresh: bool = False,
                 fmt: str = "npz"):
        assert fmt in ("npz", "pcd")
        self.directory = os.path.abspath(directory)
        self.fmt = fmt
        if fresh and os.path.isdir(self.directory):
            shutil.rmtree(self.directory)
        os.makedirs(self.directory, exist_ok=True)
        self._manifest = os.path.join(self.directory, "manifest.json")
        if os.path.exists(self._manifest):
            with open(self._manifest) as f:
                m = json.load(f)
            self.poses = [np.asarray(p, np.float32) for p in m["poses"]]
        else:
            self.poses: list[np.ndarray] = []

    def __len__(self) -> int:
        return len(self.poses)

    def _path(self, i: int) -> str:
        return os.path.join(self.directory, f"key_frame_{i}.{self.fmt}")

    def append(self, xyz: np.ndarray, pose: np.ndarray) -> int:
        """Store one keyframe cloud (LIDAR frame, like the reference) and its
        4x4 world pose. Returns the keyframe index."""
        i = len(self.poses)
        xyz = np.asarray(xyz, np.float32)
        if self.fmt == "pcd":
            pcd_io.save_pcd(self._path(i), xyz)
        else:
            np.savez(self._path(i), xyz=xyz)
        self.poses.append(np.asarray(pose, np.float32))
        with open(self._manifest, "w") as f:
            json.dump({"count": len(self.poses),
                       "poses": [p.tolist() for p in self.poses]}, f)
        return i

    def load_cloud(self, i: int) -> np.ndarray:
        if self.fmt == "pcd":
            return pcd_io.load_pcd(self._path(i))
        return np.load(self._path(i))["xyz"]

    def assemble_global_map(self, voxel_size: float = 0.0) -> np.ndarray:
        """GetGlobalMap (lio.cpp:550-580): reload every keyframe, transform
        by its pose, concatenate; optional host-side voxel thinning."""
        parts = []
        for i, T in enumerate(self.poses):
            xyz = self.load_cloud(i)
            parts.append(xyz @ T[:3, :3].T + T[:3, 3])
        if not parts:
            return np.zeros((0, 3), np.float32)
        out = np.concatenate(parts).astype(np.float32)
        if voxel_size > 0:
            keys = np.floor(out / voxel_size).astype(np.int64)
            _, idx = np.unique(keys, axis=0, return_index=True)
            out = out[np.sort(idx)]
        return out
