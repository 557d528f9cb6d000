"""Spatially sharded target maps (parallel/map_shard.py) on the virtual
8-device CPU mesh: a (dp, mp) mesh where the TARGET exceeds one shard's
capacity must reproduce the single-device (fully replicated) result.
Closes VERDICT r1 missing #2 / next-round #3."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from loc_lib_tpu.io import synthetic
from loc_lib_tpu.models import icp, ndt
from loc_lib_tpu.parallel import mesh as mesh_mod, map_shard
from loc_lib_tpu.utils import lie


WORLD = synthetic.make_world(num_points=20000, extent=60.0, seed=3)
CAP = 8192


def _pair():
    traj = synthetic.make_trajectory(num_frames=2, dt=0.1, speed=2.0)
    tgt = synthetic.render_scan(WORLD, traj.R[0], traj.t[0], max_points=CAP,
                                noise=0.005, seed=0, capacity=CAP)
    src = synthetic.render_scan(WORLD, traj.R[1], traj.t[1], max_points=CAP,
                                noise=0.005, seed=1, capacity=CAP)
    R_rel = traj.R[0].T @ traj.R[1]
    t_rel = traj.R[0].T @ (traj.t[1] - traj.t[0])
    return tgt, src, R_rel, t_rel


def test_partition_slabs_covers_and_balances():
    tgt, _, _, _ = _pair()
    part = map_shard.partition_slabs(tgt, 1.0, mp=4, cap=4096, halo=1)
    assert not np.asarray(part.overflow).any()
    # ownership tiles the axis: hi[s] == lo[s+1]
    lo, hi = np.asarray(part.lo), np.asarray(part.hi)
    np.testing.assert_array_equal(hi[:-1], lo[1:])
    # every valid point appears in exactly one OWNED slab
    xyz = np.asarray(tgt.xyz)[np.asarray(tgt.mask)]
    vx = np.floor(xyz[:, 0]).astype(np.int64)
    owned_counts = sum(((vx >= lo[s]) & (vx < hi[s])).sum() for s in range(4))
    assert owned_counts == xyz.shape[0]
    # shards are roughly balanced (percentile boundaries)
    per = np.asarray(part.mask).sum(axis=1)
    assert per.max() < 2.2 * max(per.min(), 1)


@pytest.mark.parametrize("dp,mp", [(2, 4), (4, 2)])
def test_sharded_icp_vox_matches_single_device(dp, mp):
    """Map sharded over 'mp' (each shard capacity < total target points),
    queries over 'dp': must agree with the replicated single-device solver."""
    m = mesh_mod.make_mesh_2d(dp, mp)
    tgt, src, R_gt, t_gt = _pair()
    opts = icp.IcpOptions(method="p2plane_vox")
    eye, z = jnp.eye(3), jnp.zeros(3)

    ref_target = icp.set_target(tgt, opts)
    ref = icp.scan_match(ref_target, opts, src, eye, z)

    shard_cap = 4096  # < 8192 valid target points: exceeds any one shard
    st = map_shard.set_target_sharded(m, tgt, opts, shard_capacity=shard_cap)
    assert not np.asarray(st.overflow).any()
    dist = map_shard.icp_scan_match_sharded(m, st, opts, src, eye, z)

    np.testing.assert_allclose(np.asarray(dist.t), np.asarray(ref.t), atol=2e-3)
    np.testing.assert_allclose(np.asarray(dist.R), np.asarray(ref.R), atol=2e-3)
    assert np.linalg.norm(np.asarray(dist.t) - t_gt) < 0.1
    assert int(dist.num_effective) > 100


def test_sharded_icp_vox_ownership_unique():
    """Across shards, any voxel is valid (answerable) on at most one shard —
    the halo copies must be ownership-masked."""
    m = mesh_mod.make_mesh_2d(2, 4)
    tgt, _, _, _ = _pair()
    opts = icp.IcpOptions(method="p2plane_vox")
    st = map_shard.set_target_sharded(m, tgt, opts, shard_capacity=4096)
    from loc_lib_tpu.ops import voxel as vox
    seen = {}
    for s in range(4):
        keys = np.asarray(st.target.grid.voxel_keys[s])
        valid = np.asarray(st.target.plane_valid[s])
        kx = int(np.asarray(st.kx[s]))
        coords = np.asarray(vox.key_to_coords(jnp.asarray(keys)))
        for kcoord, v in zip(coords[valid], keys[valid] * 0):
            gk = (kcoord[0] + kx, kcoord[1], kcoord[2])
            assert gk not in seen, f"voxel {gk} valid on two shards"
            seen[gk] = s
    assert len(seen) > 100


def test_sharded_icp_overflow_reported():
    m = mesh_mod.make_mesh_2d(2, 4)
    tgt, _, _, _ = _pair()
    opts = icp.IcpOptions(method="p2plane_vox")
    st = map_shard.set_target_sharded(m, tgt, opts, shard_capacity=512)
    assert np.asarray(st.overflow).sum() > 0


def test_sharded_ndt_matches_single_device():
    m = mesh_mod.make_mesh_2d(2, 4)
    tgt, src, R_gt, t_gt = _pair()
    opts = ndt.NdtOptions(voxel_size=2.0, method="direct")
    eye, z = jnp.eye(3), jnp.zeros(3)

    ref = ndt.scan_match(ndt.build_direct(tgt, opts), opts, src, eye, z)

    sm = map_shard.build_direct_sharded(m, tgt, opts, shard_capacity=4096)
    assert not np.asarray(sm.overflow).any()
    dist = map_shard.ndt_scan_match_sharded(m, sm, opts, src, eye, z)

    np.testing.assert_allclose(np.asarray(dist.t), np.asarray(ref.t), atol=2e-3)
    np.testing.assert_allclose(np.asarray(dist.R), np.asarray(ref.R), atol=2e-3)
    assert int(dist.num_effective) == int(ref.num_effective)


def test_sharded_incremental_ndt_update_matches_single_device():
    """Sharded incremental NDT: build from scan 1, absorb scan 2, match —
    must agree with the single-device incremental map over both scans."""
    import dataclasses
    m = mesh_mod.make_mesh_2d(2, 4)
    traj = synthetic.make_trajectory(num_frames=3, dt=0.1, speed=2.0)
    scans = [synthetic.render_scan(WORLD, traj.R[k], traj.t[k],
                                   max_points=4096, noise=0.005, seed=k,
                                   capacity=4096) for k in range(3)]
    # express scans 0/1 in the world frame (map frame) before absorbing
    import jax.numpy as jnp
    from loc_lib_tpu.ops.pointcloud import PointCloud, PAD_COORD

    def to_world(pc, R, t):
        xyz = pc.xyz @ jnp.asarray(R).T + jnp.asarray(t)
        xyz = jnp.where(pc.mask[:, None], xyz, PAD_COORD)
        return PointCloud(xyz=xyz, mask=pc.mask)

    w0 = to_world(scans[0], traj.R[0], traj.t[0])
    w1 = to_world(scans[1], traj.R[1], traj.t[1])
    opts = ndt.NdtOptions(voxel_size=2.0, method="incremental",
                          map_capacity=16384)

    ref_map = ndt.update_incremental(ndt.empty_incremental(opts), w0, opts)
    ref_map = ndt.update_incremental(ref_map, w1, opts)
    R0 = jnp.asarray(traj.R[2]); t0 = jnp.asarray(traj.t[2])
    ref = ndt.scan_match(ref_map, opts, scans[2], R0, t0)

    sm = map_shard.build_incremental_sharded(m, w0, opts)
    sm = map_shard.update_incremental_sharded(m, sm, w1, opts)
    dist = map_shard.ndt_scan_match_sharded(m, sm, opts, scans[2], R0, t0)

    np.testing.assert_allclose(np.asarray(dist.t), np.asarray(ref.t),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(dist.R), np.asarray(ref.R),
                               atol=2e-3)
    assert int(dist.num_effective) == int(ref.num_effective)


@pytest.mark.slow
def test_loc_sharded_matches_single_device_pipeline():
    """The mp-sharded Loc pipeline (pipeline/loc_sharded.py) must track the
    single-device Loc on the same workload, with the crop sized so no single
    shard could hold it (VERDICT r2 next #2)."""
    from loc_lib_tpu.io import logdir, synthetic as synth
    from loc_lib_tpu.ops.pointcloud import PointCloud
    from loc_lib_tpu.pipeline import loc as loc_mod, loc_sharded

    log = logdir.make_demo_log(num_frames=10, capacity=4096, yaw_rate=0.0,
                               speed=2.0, world_points=60000, extent=40.0,
                               max_range=35.0)
    world = synth.make_world(num_points=60000, extent=40.0, seed=0)

    # capacity > points-in-box (no truncation — a capped crop keeps only the
    # FIRST rows, which in make_world's layout is the degenerate ground
    # plane); the ~34k-point crop still exceeds the 16k per-shard budget
    opts = loc_mod.LocOptions(scan_capacity=4096, local_map_capacity=65536,
                              box_size=60.0, recrop_margin=20.0)
    single = loc_mod.Loc(world, opts)
    single.set_init_pose(log.gt_poses[0][:3, :3], log.gt_poses[0][:3, 3])

    mesh = mesh_mod.make_mesh_2d(2, 4)
    # per-shard budget well under the crop's valid points: the working set
    # exceeds any one shard
    sharded = loc_sharded.LocSharded(mesh, world, opts, shard_capacity=16384)
    sharded.set_init_pose(log.gt_poses[0][:3, :3], log.gt_poses[0][:3, 3])
    crop_points = int(np.asarray(
        jax.tree_util.tree_leaves(sharded.target.target.grid.num_voxels)[0]).sum())
    assert not sharded.shard_overflow().any()

    for mg in log.measures(imu_capacity=64):
        scan = PointCloud(xyz=jnp.asarray(log.scan_xyz[mg.scan_index]),
                          mask=jnp.asarray(log.scan_mask[mg.scan_index]))
        single.update_measure(scan, mg.imu_gyro, mg.imu_acce,
                              mg.imu_stamp, mg.imu_valid)
        sharded.update_measure(scan, mg.imu_gyro, mg.imu_acce,
                               mg.imu_stamp, mg.imu_valid)

    ps = np.stack(single.poses)
    pd = np.stack(sharded.poses)
    err = np.linalg.norm(ps[:, :3, 3] - pd[:, :3, 3], axis=1)
    # identical math up to the halo-exact sharded plane build: tight parity
    assert err.max() < 0.02, err
    # and both track ground truth (0.4: allows the shared early-ESKF
    # transient, which peaks ~0.30 then decays to ~0.10 by frame 10)
    gt = log.gt_poses[: len(pd), :3, 3]
    assert np.linalg.norm(pd[:, :3, 3] - gt, axis=1).max() < 0.4
    assert np.linalg.norm(pd[-1, :3, 3] - gt[-1]) < 0.15


@pytest.mark.slow
def test_loc_sharded_recrop_across_box_edge():
    """Driving toward the box edge must trigger a re-crop of the SHARDED
    map (new slab partition centered on the pose) and tracking must survive
    the swap (loc.cpp:235-246 semantics on the mp-sharded pipeline)."""
    from loc_lib_tpu.io import logdir, synthetic as synth
    from loc_lib_tpu.ops.pointcloud import PointCloud
    from loc_lib_tpu.pipeline import loc as loc_mod, loc_sharded

    log = logdir.make_demo_log(num_frames=30, capacity=4096, yaw_rate=0.0,
                               speed=2.0, world_points=60000, extent=40.0,
                               max_range=8.0)
    world = synth.make_world(num_points=60000, extent=40.0, seed=0)
    # the box must COVER the scan range (ref: 150 m box vs ~70 m lidar,
    # loc.hpp:35) — a box smaller than the scans starves the matcher of
    # correspondences and diverges regardless of sharding. 8 m scans in a
    # 24 m box; 6 m of travel crosses into the 8 m recrop margin.
    opts = loc_mod.LocOptions(scan_capacity=4096, local_map_capacity=65536,
                              box_size=24.0, recrop_margin=8.0)
    mesh = mesh_mod.make_mesh_2d(2, 4)
    eng = loc_sharded.LocSharded(mesh, world, opts, shard_capacity=16384)
    # init at the FIRST measure group's ground truth (the sync emits its
    # first group a few frames in, once the IMU buffer covers a scan)
    mgs = list(log.measures(imu_capacity=64))
    T0 = log.gt_poses[mgs[0].scan_index]
    eng.set_init_pose(T0[:3, :3], T0[:3, 3])
    center0 = np.asarray(eng.state.map_center)

    for mg in mgs:
        scan = PointCloud(xyz=jnp.asarray(log.scan_xyz[mg.scan_index]),
                          mask=jnp.asarray(log.scan_mask[mg.scan_index]))
        eng.update_measure(scan, mg.imu_gyro, mg.imu_acce,
                           mg.imu_stamp, mg.imu_valid)
    center1 = np.asarray(eng.state.map_center)
    assert np.linalg.norm(center1 - center0) > 1.0, (center0, center1)
    p = np.stack(eng.poses)[:, :3, 3]
    gt = log.gt_poses[: len(p), :3, 3]
    assert np.linalg.norm(p[-1] - gt[-1]) < 0.5, (p[-1], gt[-1])


def test_lio_sharded_matches_single_device_mapping():
    """The mp-sharded MAPPING pipeline (pipeline/lio_sharded.py) must track
    the single-device Lio(matcher='ndt_inc') on the same log (VERDICT r3
    missing #1), with per-shard voxel capacity sized so the LIVE map could
    not fit one shard — and no shard anywhere near forced eviction."""
    import dataclasses
    from loc_lib_tpu.io import logdir
    from loc_lib_tpu.ops.pointcloud import PointCloud
    from loc_lib_tpu.pipeline import lio as lio_mod, lio_sharded

    log = logdir.make_demo_log(num_frames=14, capacity=4096, yaw_rate=0.0,
                               speed=2.0, world_points=60000, extent=40.0,
                               max_range=35.0)
    nopts = ndt.NdtOptions(method="incremental", voxel_size=1.0,
                           map_capacity=65536)
    opts = lio_mod.LioOptions(matcher="ndt_inc", ndt=nopts,
                              scan_capacity=4096, with_eskf=True,
                              kf_distance=0.5)
    single = lio_mod.Lio(opts)

    mesh = mesh_mod.make_mesh_2d(2, 4)
    # per-shard table bounded at 4096 voxels: the live map (measured ~9k
    # voxels on this log) exceeds any ONE shard's capacity, but mp=4 shards
    # carry it with headroom
    opts_shard = dataclasses.replace(
        opts, ndt=dataclasses.replace(nopts, map_capacity=4096))
    sharded = lio_sharded.LioSharded(mesh, opts_shard)

    for t, g, a in zip(log.imu.stamps[:150], log.imu.gyro[:150],
                       log.imu.acce[:150]):
        single.init_imu(g, a, t)
        sharded.init_imu(g, a, t)
    assert single.imu_inited and sharded.imu_inited

    for mg in log.measures(imu_capacity=64):
        scan = PointCloud(xyz=jnp.asarray(log.scan_xyz[mg.scan_index]),
                          mask=jnp.asarray(log.scan_mask[mg.scan_index]))
        single.add_measure(scan, mg.imu_gyro, mg.imu_acce,
                           mg.imu_stamp, mg.imu_valid)
        sharded.add_measure(scan, mg.imu_gyro, mg.imu_acce,
                            mg.imu_stamp, mg.imu_valid)

    ps = np.stack(single.poses)
    pd = np.stack(sharded.poses)
    assert len(ps) == len(pd)
    err = np.linalg.norm(ps[:, :3, 3] - pd[:, :3, 3], axis=1)
    # identical math up to psum float ordering: tight parity
    assert err.max() < 0.02, err
    # the live map genuinely exceeds one shard's table...
    live = sharded.live_voxels_per_shard()
    assert live.sum() > opts_shard.ndt.map_capacity, live
    # ...and no shard was forced to age-evict (nothing silently dropped)
    assert (live < opts_shard.ndt.map_capacity).all(), live
    # single-device live voxel count matches the shard total (same map)
    from loc_lib_tpu.ops import voxel as voxel_ops
    single_live = int(np.sum(
        np.asarray(single.state.ndt_map.keys) != voxel_ops.INVALID_KEY))
    assert abs(int(live.sum()) - single_live) <= 2, (live.sum(), single_live)


@pytest.mark.slow
def test_lio_sharded_surfaces_slab_imbalance_on_exploration():
    """Slab ownership is fixed from the first keyframe, so an exploring
    trajectory funnels nearly all map growth into one boundary shard
    (advisor round 4): the driver must SURFACE that (imbalance_warnings),
    never silently degrade to ~one shard's capacity."""
    from tests.test_pipeline import _pillar_corridor, _corridor_scan
    from loc_lib_tpu.pipeline import lio_sharded
    from loc_lib_tpu.pipeline.lio import LioOptions

    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("mp", "dp"))
    eng = lio_sharded.LioSharded(mesh, LioOptions(with_eskf=False,
                                                  kf_distance=0.4))
    eng.imbalance_check_every = 4
    rng = np.random.default_rng(0)
    world = _pillar_corridor(rng)
    z = np.zeros((4, 3), np.float32)
    s = np.zeros(4)
    v = np.zeros(4, bool)
    errs = []
    for k in range(80):
        t = np.array([0.45 * k, 0.0, 0.0], np.float32)
        out = eng.add_measure(_corridor_scan(world, t, rng), z, z, s, v)
        errs.append(np.linalg.norm(np.asarray(out.t) - t))
    # tracking holds on the exploring run (needs the SO(3) projection)...
    assert float(np.sqrt(np.mean(np.square(errs)))) < 0.1
    # ...and the fixed-partition imbalance is surfaced, with real numbers
    assert eng.imbalance_warnings, eng.live_voxels_per_shard()
    assert "slab imbalance" in eng.imbalance_warnings[-1]
    live = eng.live_voxels_per_shard().astype(float)
    assert live.max() / live.mean() > eng.imbalance_warn_ratio


@pytest.mark.slow
def test_slam3d_sharded_closes_loops_over_the_sharded_map():
    """Distributed SLAM composition (VERDICT r4 next #3): Slam3dSharded =
    ScanContext + batched loop re-registration + SE(3) PGO over the
    mp-SHARDED mapping front-end, with the accepted correction written
    THROUGH the sharded voxel table (transform, re-bin, re-slab, exact
    merge). Must track the single-device Slam3d on a drifted loop log,
    close loops, and carry a live map that exceeds one shard's table."""
    import dataclasses
    from loc_lib_tpu.io import logdir
    from loc_lib_tpu.ops.pointcloud import PointCloud
    from loc_lib_tpu.pipeline import lio as lio_mod, slam3d
    from loc_lib_tpu.pipeline.slam3d_sharded import Slam3dSharded
    from loc_lib_tpu.graph import scan_context as sc

    log = logdir.make_demo_log(num_frames=40, capacity=2048, dt=0.2,
                               speed=1.4, yaw_rate=0.72, world_points=60000,
                               extent=16.0, max_range=14.0, with_imu=True)
    nopts = ndt.NdtOptions(method="incremental", voxel_size=1.0,
                           map_capacity=16384)
    lopts = lio_mod.LioOptions(matcher="ndt_inc", ndt=nopts,
                               scan_capacity=2048, with_eskf=True,
                               kf_distance=0.4)
    sopts = slam3d.Slam3dOptions(
        lio=lopts,
        sc=sc.ScanContextOptions(exclude_recent=8, dist_threshold=0.3),
        loop=slam3d.LoopOptions(min_keyframe_gap=8, max_candidate_dist=10.0,
                                min_effective_pts=60, max_chi2_per_pt=0.1,
                                optimize_every=1),
        loop_icp=icp.IcpOptions(method="p2plane", max_iteration=20,
                                max_plane_distance=0.5, grid_leaf=2.0,
                                bucket_size=8),
        warm_start=False)

    single = slam3d.Slam3d(sopts)
    mesh = mesh_mod.make_mesh_2d(2, 4)
    sopts_shard = dataclasses.replace(
        sopts, lio=dataclasses.replace(
            lopts, ndt=dataclasses.replace(nopts, map_capacity=1024)))
    sharded = Slam3dSharded(mesh, sopts_shard)

    for t, g, a in zip(log.imu.stamps[:150], log.imu.gyro[:150],
                       log.imu.acce[:150]):
        single.init_imu(g, a, t)
        sharded.init_imu(g, a, t)

    for mg in log.measures(imu_capacity=64):
        scan = PointCloud(xyz=jnp.asarray(log.scan_xyz[mg.scan_index]),
                          mask=jnp.asarray(log.scan_mask[mg.scan_index]))
        single.add_measure(scan, mg.imu_gyro, mg.imu_acce,
                           mg.imu_stamp, mg.imu_valid)
        sharded.add_measure(scan, mg.imu_gyro, mg.imu_acce,
                            mg.imu_stamp, mg.imu_valid)

    assert len(sharded.kf_R) == len(single.kf_R)
    # both engines accepted loops; the sharded one optimized + corrected
    assert single.loops and sharded.loops
    # keyframe trajectories stay in lockstep through loop corrections
    # (tolerance covers the write-through's re-bin approximation: after a
    # correction the sharded map's Gaussians sit on a re-quantized
    # lattice, so post-loop odometry diverges by sub-voxel noise)
    ts = np.stack(single.kf_t)
    td = np.stack(sharded.kf_t)
    err = np.linalg.norm(ts - td, axis=1)
    assert err.max() < 0.15, err
    # the live sharded map exceeds one shard's table (the reason to shard)
    live = sharded.live_voxels_per_shard()
    cap = sopts_shard.lio.ndt.map_capacity
    assert live.sum() > cap, live
    assert (live < cap).all(), live
    # ATE of the sharded engine against ground truth stays SLAM-grade
    # (ground truth re-expressed in the first frame's pose = SLAM world)
    gt = log.gt_poses[[k for k in sharded.kf_frame]]
    gt_rel = np.linalg.inv(log.gt_poses[0])[None] @ gt
    ate = np.linalg.norm(np.stack(sharded.kf_t) - gt_rel[:, :3, 3], axis=1)
    assert float(np.sqrt(np.mean(ate ** 2))) < 0.25, ate
