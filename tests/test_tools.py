"""Tools layer tests: timing, checkpoint/resume, keyframe store, log format,
and the app drivers end-to-end (the reference has no automated tests —
SURVEY.md section 4 — these create the pyramid it lacks)."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from loc_lib_tpu.io import checkpoint as ckpt_io, logdir
from loc_lib_tpu.models import eskf
from loc_lib_tpu.utils.timing import TicToc, StageTimer, evaluate_and_call


def test_tictoc_and_evaluate():
    tt = TicToc()
    ms = tt.toc()
    assert ms >= 0.0
    calls = []
    mean = evaluate_and_call(lambda: calls.append(1) or jnp.zeros(3),
                             "noop", times=3, warmup=1)
    assert mean >= 0.0 and len(calls) == 4  # warmup + 3 timed


def test_stage_timer():
    st = StageTimer()
    with st.stage("a"):
        pass
    with st.stage("a"):
        pass
    rep = st.report()
    assert "a" in rep and st.counts["a"] == 2


def test_state_checkpoint_roundtrip(tmp_path):
    s = eskf.init_state(bg=jnp.array([0.01, 0.0, 0.0]),
                        ba=jnp.array([0.0, 0.02, 0.0]),
                        gravity=jnp.array([0.0, 0.0, -9.81]), time=1.5)
    path = ckpt_io.save_state(str(tmp_path / "eskf"), s, step=7)
    restored, step = ckpt_io.load_state(path, eskf.init_state())
    assert step == 7
    np.testing.assert_allclose(np.asarray(restored.bg), [0.01, 0, 0], atol=1e-7)
    np.testing.assert_allclose(np.asarray(restored.cov),
                               np.asarray(s.cov), atol=1e-7)


def test_checkpointer_rolling(tmp_path):
    ck = ckpt_io.Checkpointer(str(tmp_path), max_to_keep=2, use_orbax=False)
    s = eskf.init_state()
    for step in (1, 2, 3):
        ck.save(step, s._replace(time=jnp.float32(step)))
    assert ck.latest() == 3
    restored, step = ck.restore(s)
    assert step == 3 and float(restored.time) == 3.0
    kept = [p for p in os.listdir(tmp_path) if p.endswith(".npz")]
    assert len(kept) == 2  # oldest garbage-collected


def test_keyframe_store_resume_and_global_map(tmp_path):
    d = str(tmp_path / "kf")
    store = ckpt_io.KeyframeStore(d, fresh=True)
    cloud = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [10.0, 0.0, 0.0]
    store.append(cloud, np.eye(4, dtype=np.float32))
    store.append(cloud, T)
    # resume: a new store over the same dir continues, not wipes
    store2 = ckpt_io.KeyframeStore(d)
    assert len(store2) == 2
    gm = store2.assemble_global_map()
    assert gm.shape == (4, 3)
    np.testing.assert_allclose(gm[2], [11.0, 0.0, 0.0], atol=1e-6)


def test_logdir_roundtrip(tmp_path):
    log = logdir.make_demo_log(num_frames=3, capacity=512)
    logdir.save_log(str(tmp_path / "log"), log)
    log2 = logdir.load_log(str(tmp_path / "log"))
    assert log2.num_frames == 3
    np.testing.assert_allclose(log2.scan_xyz, log.scan_xyz)
    assert log2.imu is not None and len(log2.imu.stamps) > 0
    assert log2.gt_poses.shape == (3, 4, 4)
    groups = list(log2.measures(imu_capacity=32))
    assert len(groups) == 3
    assert groups[1].imu_valid.any()


@pytest.mark.slow
def test_mapping_app_end_to_end(tmp_path):
    """python -m loc_lib_tpu.apps.mapping --demo equivalent, tiny shapes."""
    from loc_lib_tpu.apps.mapping import run_mapping
    from loc_lib_tpu.pipeline import lio as lio_mod
    from loc_lib_tpu.models import icp as icp_mod

    log = logdir.make_demo_log(num_frames=6, capacity=1024)
    opts = lio_mod.LioOptions(
        matcher="icp",
        icp=icp_mod.IcpOptions(method="p2plane", max_iteration=5, bucket_size=4),
        scan_capacity=1024, num_kfs_in_local_map=3, with_eskf=True)
    out = str(tmp_path / "out")
    report = run_mapping(log, opts, out, ckpt_every=2)
    assert report["frames"] >= 1
    assert os.path.exists(os.path.join(out, "trajectory_kitti.txt"))
    assert os.path.exists(os.path.join(out, "global_map.npz"))
    assert report["keyframes"] == len(
        json.load(open(os.path.join(out, "key_frames/manifest.json")))["poses"])
    # pinned accuracy regression threshold (BASELINE.md plan item 3): the
    # demo log carries ground truth, and the report must record ATE under it
    assert report["ate_rmse_m"] < 0.3, report
    # rendered observability artifact (io/viz.py): a real PNG of plausible size
    png = os.path.join(out, "map_topdown.png")
    assert os.path.exists(png)
    with open(png, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"
    assert os.path.getsize(png) > 2000


@pytest.mark.slow
def test_matching_app_end_to_end(tmp_path):
    from loc_lib_tpu.apps.matching import run_matching
    from loc_lib_tpu.pipeline import loc as loc_mod
    from loc_lib_tpu.io import synthetic

    log = logdir.make_demo_log(num_frames=4, capacity=1024, with_imu=False)
    world = synthetic.make_world(num_points=60000, extent=80.0, seed=0)
    opts = loc_mod.LocOptions(scan_capacity=1024)
    report = run_matching(log, world, opts, str(tmp_path / "out"),
                          init_pose=log.gt_poses[0])
    assert report["frames"] == 4
    assert report["ate_rmse_m"] < 0.5


def test_checkpointer_orbax_roundtrip(tmp_path):
    """The orbax branch (the apps' default when orbax imports) must
    save/restore/GC like the npz fallback (VERDICT r1 weak #7)."""
    pytest.importorskip("orbax.checkpoint")
    ck = ckpt_io.Checkpointer(str(tmp_path), max_to_keep=2, use_orbax=True)
    s = eskf.init_state()
    for step in (1, 2, 3):
        ck.save(step, s._replace(time=jnp.float32(step)))
    assert ck.latest() == 3
    restored, step = ck.restore(s)
    assert step == 3 and float(restored.time) == 3.0
    np.testing.assert_allclose(np.asarray(restored.cov), np.asarray(s.cov),
                               atol=1e-7)
    assert ck._mgr.all_steps() == [2, 3]  # oldest garbage-collected
    ck.close()


def test_interp_pose():
    """math::PoseInterp analog (math_utils.h:470-517): slerp+lerp between
    straddling poses, last-pose extrapolation within time_th, None outside."""
    from loc_lib_tpu.io import trajectory
    from loc_lib_tpu.utils import lie
    import jax.numpy as jnp

    stamps = np.array([0.0, 1.0, 2.0])
    poses = np.tile(np.eye(4), (3, 1, 1))
    poses[1, :3, :3] = np.asarray(lie.so3_exp(jnp.array([0, 0, 0.4], jnp.float32)))
    poses[1, :3, 3] = [1.0, 0.0, 0.0]
    poses[2, :3, :3] = np.asarray(lie.so3_exp(jnp.array([0, 0, 0.8], jnp.float32)))
    poses[2, :3, 3] = [2.0, 0.0, 0.0]

    T = trajectory.interp_pose(stamps, poses, 0.5)
    np.testing.assert_allclose(T[:3, 3], [0.5, 0, 0], atol=1e-6)
    expected_R = np.asarray(lie.so3_exp(jnp.array([0, 0, 0.2], jnp.float32)))
    np.testing.assert_allclose(T[:3, :3], expected_R, atol=1e-4)
    # exact stamp
    np.testing.assert_allclose(trajectory.interp_pose(stamps, poses, 1.0)[:3, 3],
                               [1, 0, 0], atol=1e-6)
    # within the extrapolation window -> last pose; outside -> None
    np.testing.assert_allclose(
        trajectory.interp_pose(stamps, poses, 2.3)[:3, 3], [2, 0, 0])
    assert trajectory.interp_pose(stamps, poses, 3.0) is None
    assert trajectory.interp_pose(stamps, poses, -0.5) is None
