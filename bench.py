"""Headline benchmark: single-chip scan-matching throughput (P2Plane ICP).

Prints ONE JSON line:
  {"metric": "icp_p2plane_scans_per_sec", "value": N, "unit": "scans/s",
   "vs_baseline": N / <measured C++ CPU baseline>}

Workload (the reference's operating point, SURVEY.md section 6): target =
local map of ~64k points at 0.5 m resolution, source = one voxel-filtered
scan of 8192 points, 20 GN iterations with |dx| < 1e-2 early exit. Both
engines start from the SAME realistic initial guess — ground truth perturbed
by 0.5 deg / 7 cm, the error magnitude of the constant-velocity / ESKF
prediction that seeds every scan match in the reference pipeline
(lio.cpp:446-473) — and the bench ASSERTS both converge to the ground-truth
pose (rot < 0.5 deg, trans < 3 cm) before the timing is trusted (VERDICT r1
weak #2: round 1 timed an unconverged baseline).

TPU engine: method="p2plane_vox_oct" — per-voxel planes precomputed at
set_target (amortized over keyframes, exactly how the reference's own NDT
amortizes target geometry, ndt_registration.cpp:87-148) WITH the
correspondence election additionally pre-evaluated per (voxel, octant)
cell (models/icp.py:_build_oct_tables): each GN iteration is one dense
O(1) lookup + one 8-float row gather + the fused Pallas linearization
kernel — measured 4.8x cheaper per iteration than the exact per-point
election at a sub-millimeter pose delta (BENCH_SUITE matcher_variants;
the exact-election p2plane_vox number is printed to stderr alongside).
C++ baseline: the reference's algorithm (kd-tree 5-NN + per-point plane fit
+ GN, icp_registration.cpp AlignP2Plane), single thread, -O3
(cpp/baseline_icp.cpp — independent implementation; the reference itself
needs ROS/PCL and cannot be built here). Map build time is excluded on both
sides: both engines pay it once per keyframe, not per scan.
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
TPU_REPEATS = 50

# parity gates: both engines must land on ground truth before timing counts
PARITY_ROT_RAD = 0.0088   # 0.5 deg
PARITY_TRANS_M = 0.03     # 3 cm

# initial-guess perturbation (const-velocity prediction error magnitude)
INIT_ROT_RAD = 0.0087     # 0.5 deg
INIT_TRANS_M = 0.07       # 7 cm


def _so3_exp(w):
    th = np.linalg.norm(w)
    K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    if th < 1e-12:
        return np.eye(3)
    return (np.eye(3) + np.sin(th) / th * K
            + (1 - np.cos(th)) / th**2 * (K @ K))


def _rot_err(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1.0) / 2.0
    return float(np.arccos(np.clip(c, -1.0, 1.0)))


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
    # ground-truth relative pose: p_tgt = R0^T R1 q + R0^T (t1 - t0)
    R0w, R1w = np.asarray(traj.R[0], np.float64), np.asarray(traj.R[1], np.float64)
    t0w, t1w = np.asarray(traj.t[0], np.float64), np.asarray(traj.t[1], np.float64)
    R_gt = R0w.T @ R1w
    t_gt = R0w.T @ (t1w - t0w)
    # shared initial guess: ground truth + fixed perturbation
    rng = np.random.default_rng(42)
    w = rng.normal(size=3)
    w *= INIT_ROT_RAD / np.linalg.norm(w)
    dt = rng.normal(size=3)
    dt *= INIT_TRANS_M / np.linalg.norm(dt)
    R_init = R_gt @ _so3_exp(w)
    t_init = t_gt + dt
    return tgt, src, R_gt, t_gt, R_init, t_init


def run_tpu(tgt, src, R_gt, t_gt, R_init, t_init,
            method="p2plane_vox_oct"):
    import jax
    import jax.numpy as jnp
    from loc_lib_tpu.models import icp

    opts = icp.IcpOptions(method=method)
    target = icp.set_target(tgt, opts)
    R0 = jnp.asarray(R_init, jnp.float32)
    t0 = jnp.asarray(t_init, jnp.float32)

    res = icp.scan_match(target, opts, src, R0, t0)   # compile + warm up
    jax.block_until_ready(res)
    rot_e = _rot_err(np.asarray(res.R, np.float64), R_gt)
    trans_e = float(np.linalg.norm(np.asarray(res.t, np.float64) - t_gt))
    print(f"tpu [{method}] pose t = {np.asarray(res.t).round(4)}, "
          f"iters={int(res.iterations)}, "
          f"n_eff={int(res.num_effective)}, err = {np.degrees(rot_e):.3f} deg / "
          f"{trans_e * 100:.2f} cm", file=sys.stderr)
    assert rot_e < PARITY_ROT_RAD and trans_e < PARITY_TRANS_M, (
        f"TPU engine ({method}) did not converge to ground truth: "
        f"{np.degrees(rot_e):.3f} deg / {trans_e:.4f} m")

    t0_w = time.perf_counter()
    for _ in range(TPU_REPEATS):
        res = icp.scan_match(target, opts, src, R0, t0)
    jax.block_until_ready(res)
    dt = (time.perf_counter() - t0_w) / TPU_REPEATS
    return 1.0 / dt, np.asarray(res.R, np.float64), np.asarray(res.t, np.float64)


def run_cpp(tgt, src, R_gt, t_gt, R_init, t_init):
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
        f.write(np.asarray(R_init, np.float32).reshape(9).tobytes())
        f.write(np.asarray(t_init, np.float32).tobytes())

    out = subprocess.run([binary, data, str(CPP_REPEATS)],
                         capture_output=True, text=True, check=True,
                         timeout=600)
    # stderr: "pose R = r00 .. r22 t = tx ty tz"
    toks = out.stderr.replace("=", " ").split()
    vals = [float(x) for x in toks if _is_float(x)]
    R_cpp = np.array(vals[:9], np.float64).reshape(3, 3)
    t_cpp = np.array(vals[9:12], np.float64)
    build_ms, match_ms = map(float, out.stdout.split())
    rot_e = _rot_err(R_cpp, R_gt)
    trans_e = float(np.linalg.norm(t_cpp - t_gt))
    print(f"cpp  pose t = {t_cpp.round(4)}, err = {np.degrees(rot_e):.3f} deg / "
          f"{trans_e * 100:.2f} cm; build {build_ms:.1f} ms, "
          f"match {match_ms:.1f} ms/scan", file=sys.stderr)
    assert rot_e < PARITY_ROT_RAD and trans_e < PARITY_TRANS_M, (
        f"C++ baseline did not converge to ground truth: "
        f"{np.degrees(rot_e):.3f} deg / {trans_e:.4f} m")
    return 1000.0 / match_ms, R_cpp, t_cpp


def _is_float(tok):
    try:
        float(tok)
        return True
    except ValueError:
        return False


def main():
    # persistent compilation cache: set_target's one-time compile is ~4 min
    # on the tunneled TPU; cache it across bench invocations.
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    tgt, src, R_gt, t_gt, R_init, t_init = build_workload()
    tpu_sps, R_tpu, t_tpu = run_tpu(tgt, src, R_gt, t_gt, R_init, t_init)
    # exact-election reference (same parity gates), for continuity with the
    # pre-oct headline history
    vox_sps, _, _ = run_tpu(tgt, src, R_gt, t_gt, R_init, t_init,
                            method="p2plane_vox")
    print(f"reference p2plane_vox (exact election): {vox_sps:.1f} scans/s",
          file=sys.stderr)
    try:
        cpp_sps, R_cpp, t_cpp = run_cpp(tgt, src, R_gt, t_gt, R_init, t_init)
        # engines must agree with each other too
        assert _rot_err(R_tpu, R_cpp) < PARITY_ROT_RAD, "engine rot mismatch"
        assert np.linalg.norm(t_tpu - t_cpp) < PARITY_TRANS_M, \
            "engine trans mismatch"
        print("parity: both engines at ground truth and within "
              f"{PARITY_TRANS_M*100:.0f} cm / 0.5 deg of each other",
              file=sys.stderr)
    except (subprocess.SubprocessError, OSError) as e:
        # keep the metric even if the C++ toolchain is absent
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
