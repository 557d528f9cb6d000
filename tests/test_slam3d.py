"""Full 3D SLAM pipeline: loop detection, loop registration, pose-graph
write-back (pipeline/slam3d.py + apps/slam.py). The reference has no 3D
loop closure to compare against (SURVEY.md section 2) — these tests check
the pipeline against synthetic ground truth instead."""

import numpy as np
import jax.numpy as jnp
import pytest

from loc_lib_tpu.io import logdir
from loc_lib_tpu.models import icp as icp_mod
from loc_lib_tpu.graph import pose_graph as pg, scan_context as sc
from loc_lib_tpu.pipeline import lio as lio_mod, slam3d
from loc_lib_tpu.utils import lie


def _loop_log(num_frames=46):
    """Closed circle: yaw_rate * dt * frames > 2*pi, revisiting the start."""
    return logdir.make_demo_log(num_frames=num_frames, capacity=512,
                                dt=0.2, speed=1.4, yaw_rate=0.72,
                                world_points=40000, with_imu=True,
                                extent=16.0, max_range=14.0)


def _small_opts():
    return slam3d.Slam3dOptions(
        lio=lio_mod.LioOptions(
            matcher="icp",
            icp=icp_mod.IcpOptions(method="p2plane", max_iteration=8,
                                   bucket_size=4),
            scan_capacity=512, num_kfs_in_local_map=3, with_eskf=True,
            kf_distance=0.4),
        sc=sc.ScanContextOptions(exclude_recent=8, dist_threshold=0.25),
        loop=slam3d.LoopOptions(min_keyframe_gap=8, max_candidate_dist=10.0,
                                min_effective_pts=60, max_chi2_per_pt=0.1,
                                optimize_every=100),
        loop_icp=icp_mod.IcpOptions(method="p2plane", max_iteration=20,
                                    max_plane_distance=0.5, grid_leaf=2.0,
                                    bucket_size=8),
    )


@pytest.mark.slow
def test_slam_app_closes_loop(tmp_path):
    from loc_lib_tpu.apps.slam import run_slam

    log = _loop_log()
    report = run_slam(log, _small_opts(), str(tmp_path / "out"))
    assert report["frames"] >= 30
    assert report["keyframes"] >= 10
    # the circle revisits its start: at least one accepted + inlier loop
    assert report["loops"] >= 1
    assert report["loop_inliers"] >= 1
    assert (tmp_path / "out" / "keyframes_optimized_kitti.txt").exists()


def test_apply_correction_consistency():
    """apply_correction must left-compose every live pose identically."""
    opts = lio_mod.LioOptions(scan_capacity=64, num_kfs_in_local_map=2,
                              with_eskf=True)
    engine = lio_mod.Lio(opts)
    dR = np.asarray(lie.so3_exp(jnp.array([0.0, 0.0, 0.3])))
    dt = np.array([1.0, -2.0, 0.5], np.float32)
    R_before = np.asarray(engine.state.R)
    t_before = np.asarray(engine.state.t)
    engine.apply_correction(dR, dt)
    np.testing.assert_allclose(np.asarray(engine.state.R), dR @ R_before,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(engine.state.t),
                               dR @ t_before + dt, atol=1e-6)
    # ESKF nominal moved the same way
    np.testing.assert_allclose(np.asarray(engine.state.eskf.p), dt, atol=1e-6)


def test_pose_graph_closes_synthetic_drift():
    """A drifted circle + one perfect loop edge must snap closed (the core
    guarantee slam3d builds on)."""
    m = 24
    ang = np.linspace(0, 2 * np.pi, m, endpoint=False)
    radius = 5.0
    gt_t = np.stack([radius * np.cos(ang), radius * np.sin(ang),
                     np.zeros(m)], 1).astype(np.float32)
    gt_R = np.stack([np.asarray(lie.so3_exp(jnp.array([0, 0, a], jnp.float32)))
                     for a in ang])
    # inject linearly growing yaw drift into the odometry chain
    drift = np.linspace(0, 0.25, m).astype(np.float32)
    est_R = np.stack([np.asarray(
        lie.so3_exp(jnp.array([0, 0, a + d], jnp.float32)))
        for a, d in zip(ang, drift)])
    est_t = gt_t + np.stack([drift * 3.0, drift * 2.0, 0 * drift], 1)

    edges = pg.odometry_edges(jnp.asarray(est_R), jnp.asarray(est_t))
    # perfect loop edge from gt: node 0 -> node m-1
    Rl, tl = lie.se3_compose(*lie.se3_inverse(jnp.asarray(gt_R[0]),
                                              jnp.asarray(gt_t[0])),
                             jnp.asarray(gt_R[-1]), jnp.asarray(gt_t[-1]))
    # odometry-grade loop information (see slam3d.LoopOptions.loop_info_scale)
    loop = pg.Se3Edges(
        i=jnp.array([0], jnp.int32), j=jnp.array([m - 1], jnp.int32),
        R=Rl[None], t=tl[None],
        info=jnp.eye(6, dtype=jnp.float32)[None] * 1e4,
        is_loop=jnp.array([True]), valid=jnp.array([True]))
    all_edges = pg.concat_edges(edges, loop)
    R_opt, t_opt, inl = pg.optimize_two_phase(
        jnp.asarray(est_R), jnp.asarray(est_t), all_edges)
    assert bool(inl[-1])  # the good loop edge survives the residual gate
    # loop end lands on the measured relative pose from node 0 (a small
    # residual split between the loop edge and the 23 odometry edges remains)
    R0, t0 = R_opt[0], t_opt[0]
    Rrel, trel = lie.se3_compose(*lie.se3_inverse(R0, t0),
                                 R_opt[-1], t_opt[-1])
    np.testing.assert_allclose(np.asarray(trel), np.asarray(tl), atol=0.1)


def test_loop_edge_info_quality_weighting():
    """Per-edge loop information tracks registration quality (VERDICT r1
    weak #8): cleaner/larger fits earn more weight, clipped to the cap."""
    from loc_lib_tpu.pipeline.slam3d import LoopOptions, loop_edge_info
    lo = LoopOptions()
    clean = loop_edge_info(2000, 0.005, lo)
    sloppy = loop_edge_info(250, 0.05, lo)
    assert clean > sloppy
    assert clean <= lo.loop_info_scale          # capped
    assert sloppy >= lo.loop_info_min
    # near-perfect synthetic fit hits the cap, not infinity
    assert loop_edge_info(5000, 1e-12, lo) == lo.loop_info_scale
    # constant mode restores the old behavior
    import dataclasses
    lo_const = dataclasses.replace(lo, use_quality_info=False)
    assert loop_edge_info(10, 1.0, lo_const) == lo_const.loop_info_scale
