"""Headline benchmark: single-chip scan-matching throughput (P2Plane ICP).

Prints ONE JSON line:
  {"metric": "icp_p2plane_scans_per_sec", "value": N, "unit": "scans/s",
   "vs_baseline": N / <measured C++ CPU baseline>}

Workload (the reference's operating point, SURVEY.md section 6): target =
local map of ~64k points at 0.5 m resolution, source = one voxel-filtered
scan of 8192 points, 20 GN iterations with |dx| < 1e-2 early exit, 5-NN
plane-fit correspondences. The baseline is the same algorithm as a
single-thread C++17 kd-tree implementation (cpp/baseline_icp.cpp) compiled
-O3 and run on this host — measured, not copied, because the reference
publishes no numbers (BASELINE.md) and cannot be built here (needs ROS/PCL).

Runs on whatever jax platform the environment provides (the real TPU chip
under the driver; CPU elsewhere). Map build time is excluded on both sides:
in LIO it amortizes over keyframes, and both engines pay it once per
keyframe, not per scan.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))

N_TARGET = 65536
N_SOURCE = 8192
CPP_REPEATS = 5
TPU_REPEATS = 20


def build_workload():
    from loc_lib_tpu.io import synthetic

    world = synthetic.make_world(num_points=200000, extent=80.0, seed=7)
    traj = synthetic.make_trajectory(num_frames=2, dt=0.1, speed=2.0)
    tgt = synthetic.render_scan(world, traj.R[0], traj.t[0], max_range=70.0,
                                max_points=N_TARGET, noise=0.01, seed=0,
                                capacity=N_TARGET)
    src = synthetic.render_scan(world, traj.R[1], traj.t[1], max_range=70.0,
                                max_points=N_SOURCE, noise=0.01, seed=1,
                                capacity=N_SOURCE)
    return tgt, src


def run_tpu(tgt, src):
    import jax
    import jax.numpy as jnp
    from loc_lib_tpu.models import icp

    opts = icp.IcpOptions(method="p2plane")
    target = icp.set_target(tgt, opts)
    R0, t0 = jnp.eye(3), jnp.zeros(3)

    res = icp.scan_match(target, opts, src, R0, t0)   # compile + warm up
    jax.block_until_ready(res)
    print(f"tpu pose t = {np.asarray(res.t).round(4)}, "
          f"iters={int(res.iterations)}, n_eff={int(res.num_effective)}",
          file=sys.stderr)

    t0_w = time.perf_counter()
    for _ in range(TPU_REPEATS):
        res = icp.scan_match(target, opts, src, R0, jnp.zeros(3))
    jax.block_until_ready(res)
    dt = (time.perf_counter() - t0_w) / TPU_REPEATS
    return 1.0 / dt, res


def run_cpp(tgt, src):
    binary = os.path.join(REPO, "cpp", "baseline_icp")
    source = os.path.join(REPO, "cpp", "baseline_icp.cpp")
    if (not os.path.exists(binary)
            or os.path.getmtime(binary) < os.path.getmtime(source)):
        subprocess.run(["g++", "-O3", "-std=c++17", "-o", binary, source],
                       check=True)

    from loc_lib_tpu.ops.pointcloud import to_numpy

    t_np = to_numpy(tgt).astype(np.float32)
    s_np = to_numpy(src).astype(np.float32)
    data = os.path.join("/tmp", "bench_icp_workload.bin")
    with open(data, "wb") as f:
        f.write(np.int32(len(t_np)).tobytes())
        f.write(np.int32(len(s_np)).tobytes())
        f.write(t_np.tobytes())
        f.write(s_np.tobytes())

    out = subprocess.run([binary, data, str(CPP_REPEATS)],
                         capture_output=True, text=True, check=True,
                         timeout=600)
    print(out.stderr.strip(), file=sys.stderr)
    build_ms, match_ms = map(float, out.stdout.split())
    print(f"cpp baseline: build {build_ms:.1f} ms, match {match_ms:.1f} ms/scan",
          file=sys.stderr)
    return 1000.0 / match_ms


def main():
    tgt, src = build_workload()
    tpu_sps, _ = run_tpu(tgt, src)
    try:
        cpp_sps = run_cpp(tgt, src)
    except Exception as e:  # keep the metric even if the toolchain is absent
        print(f"cpp baseline unavailable: {e}", file=sys.stderr)
        cpp_sps = None
    print(json.dumps({
        "metric": "icp_p2plane_scans_per_sec",
        "value": round(tpu_sps, 2),
        "unit": "scans/s",
        "vs_baseline": round(tpu_sps / cpp_sps, 2) if cpp_sps else None,
    }))


if __name__ == "__main__":
    main()
