"""Minimal PCD reader/writer (ASCII and binary, xyz[+intensity]).

Replaces the reference's pcl::io::loadPCDFile / savePCDFileBinary usage for
keyframe and global-map storage (lio.cpp:116-129, loc.cpp:268-283) without a
PCL dependency. Only the fields the pipelines use are supported; unknown
fields are skipped on read.
"""

from __future__ import annotations

import numpy as np

_SIZES = {("F", 4): "f4", ("F", 8): "f8", ("I", 4): "i4", ("I", 1): "i1",
          ("I", 2): "i2", ("U", 1): "u1", ("U", 2): "u2", ("U", 4): "u4"}


def load_pcd(path: str) -> np.ndarray:
    """Returns (N, 3) float32 xyz (intensity and other fields dropped)."""
    with open(path, "rb") as f:
        header = {}
        while True:
            line = f.readline().decode("ascii", "ignore").strip()
            if not line or line.startswith("#"):
                continue
            key, _, val = line.partition(" ")
            header[key] = val
            if key == "DATA":
                break
        fields = header["FIELDS"].split()
        sizes = [int(s) for s in header["SIZE"].split()]
        types = header["TYPE"].split()
        counts = [int(c) for c in header.get("COUNT", " ".join(["1"] * len(fields))).split()]
        n = int(header["POINTS"])
        mode = header["DATA"]

        if mode == "ascii":
            data = np.loadtxt(f, max_rows=n)
            cols = []
            c = 0
            for name, cnt in zip(fields, counts):
                if name in ("x", "y", "z"):
                    cols.append(c)
                c += cnt
            return data[:, cols].astype(np.float32)

        if mode == "binary":
            dt = []
            for i, (name, cnt) in enumerate(zip(fields, counts)):
                base = _SIZES[(types[i], sizes[i])]
                if cnt == 1:
                    dt.append((name, base))
                else:
                    dt.append((name, base, (cnt,)))
            arr = np.frombuffer(f.read(), dtype=np.dtype(dt), count=n)
            return np.stack([arr["x"], arr["y"], arr["z"]], axis=1).astype(np.float32)

        raise ValueError(f"unsupported PCD DATA mode {mode!r}")


def save_pcd(path: str, xyz: np.ndarray, binary: bool = True) -> None:
    xyz = np.ascontiguousarray(np.asarray(xyz, dtype=np.float32).reshape(-1, 3))
    n = len(xyz)
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\n"
        f"DATA {'binary' if binary else 'ascii'}\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        if binary:
            f.write(xyz.tobytes())
        else:
            np.savetxt(f, xyz, fmt="%.6f")
