"""Real-format ingestion (io/kitti.py, VERDICT r4 missing #1): KITTI
velodyne `.bin` + times and vendor-layout PCDs (Robosense FullPointType),
fed end-to-end through LOAM feature extraction + registration.

Fixtures are generated in-test in the EXACT on-disk formats (float32
x,y,z,intensity .bin rows in ring-major azimuth order; binary PCD with
x/y/z/intensity/ring/timestamp fields) so the readers are exercised
against real byte layouts without committing binary blobs."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from loc_lib_tpu.io import kitti, pcd, synthetic, logdir
from loc_lib_tpu.models import loam
from loc_lib_tpu.ops.pointcloud import PointCloud
from loc_lib_tpu.utils import lie


def _hdl_scan(world, R, t, num_rings=16, seed=0):
    """Render a scan and lay it out the way a spinning-lidar driver does:
    ring-major, azimuth-ordered within each ring (what recover_rings
    inverts), with intensity."""
    pc = synthetic.render_scan(world, R, t, max_range=35.0,
                               max_points=8192, noise=0.005, seed=seed,
                               capacity=16384)
    pc = synthetic.annotate_rings(pc, num_rings=num_rings)
    xyz = np.asarray(pc.xyz)[np.asarray(pc.mask)]
    ring = np.asarray(pc.ring)[np.asarray(pc.mask)]
    rng = np.random.default_rng(seed)
    inten = rng.uniform(0, 1, len(xyz)).astype(np.float32)
    return xyz.astype(np.float32), ring.astype(np.int32), inten


def _write_kitti_seq(tmp_path, scans):
    seq = tmp_path / "sequence"
    vel = seq / "velodyne"
    os.makedirs(vel)
    for k, (xyz, ring, inten) in enumerate(scans):
        rows = np.concatenate([xyz, inten[:, None]], axis=1)
        rows.astype(np.float32).tofile(vel / f"{k:06d}.bin")
    with open(seq / "times.txt", "w") as f:
        for k in range(len(scans)):
            f.write(f"{0.1 * k:.6f}\n")
    return str(vel)


def test_kitti_bin_roundtrip_and_ring_recovery(tmp_path):
    world = synthetic.make_world(num_points=60000, extent=40.0, seed=4)
    xyz, ring, inten = _hdl_scan(world, np.eye(3), np.zeros(3), seed=1)
    vel = _write_kitti_seq(tmp_path, [(xyz, ring, inten)])
    pts = kitti.load_velodyne_bin(os.path.join(vel, "000000.bin"))
    assert pts.shape == (len(xyz), 4)
    np.testing.assert_allclose(pts[:, :3], xyz, rtol=0, atol=0)
    # ring recovery from firing order yields ORDINAL ids (absolute
    # elevation bins are unknowable from order alone, and LOAM only needs
    # the segmentation): recovered id must equal the dense RANK of the
    # true ring id for virtually every point
    rec = kitti.recover_rings(pts[:, :3], num_rings=16)
    present = np.unique(ring)
    rank = {r: i for i, r in enumerate(present)}
    true_rank = np.vectorize(rank.get)(ring)
    agree = float(np.mean(rec == true_rank))
    assert agree > 0.98, agree
    # azimuth rel-time is monotone within each recovered ring (direction
    # depends on spin handedness; the synthetic fixture sweeps
    # counterclockwise, real velodynes clockwise — both are monotone)
    rel = kitti.azimuth_rel_time(pts[:, :3])
    for r in (0, 5, 8):
        sel = rec == r
        if sel.sum() > 10:
            d = np.diff(rel[sel])
            mono = max(float(np.mean(d >= -1e-6)), float(np.mean(d <= 1e-6)))
            assert mono > 0.99, (r, mono)


def test_kitti_log_feeds_loam_end_to_end(tmp_path):
    """KITTI-format log -> SensorLog (ring/time recovered) -> LOAM
    features -> registration recovers the inter-frame pose. This is the
    first non-synthetic-annotation path into LOAM (the reference's
    /kitti/velo/pointcloud flow, test_node.cpp:256-315)."""
    world = synthetic.make_world(num_points=120000, extent=40.0, seed=4)
    R1 = np.asarray(lie.so3_exp(jnp.array([0, 0, 0.02], jnp.float32)))
    t1 = np.array([0.35, 0.05, 0.0], np.float32)
    s0 = _hdl_scan(world, np.eye(3), np.zeros(3), seed=1)
    s1 = _hdl_scan(world, R1, t1, seed=2)
    vel = _write_kitti_seq(tmp_path, [s0, s1])
    log = kitti.load_kitti_log(vel, capacity=16384, min_range=1.0)
    assert log.num_frames == 2
    assert np.allclose(log.scan_stamps, [0.0, 0.1])
    assert log.scan_ring is not None and log.scan_time is not None
    # roundtrips through the npz logdir schema
    logdir.save_log(str(tmp_path / "log"), log)
    log = logdir.load_log(str(tmp_path / "log"))
    assert log.scan_ring is not None

    fr0, fr1 = log.frame(0), log.frame(1)
    assert fr0.ring is not None and fr0.time is not None
    opts = loam.LoamOption()
    fopts = loam.LoamFeatureOptions(num_scan=16, min_ring_pts=64)
    f0 = loam.extract_features(fr0, fopts)
    f1 = loam.extract_features(fr1, fopts)
    tgt = loam.set_target(f0.edge, f0.surf, opts)
    res = loam.scan_match(tgt, opts, f1.edge, f1.surf,
                          jnp.eye(3), jnp.zeros(3))
    t_est = np.asarray(res.t)
    # frame1 points p satisfy world = R1 p + t1 -> relative pose vs frame0
    assert np.linalg.norm(t_est - t1) < 0.08, t_est
    ang = np.degrees(np.abs(np.asarray(lie.so3_log(res.R))[2] - 0.02))
    assert ang < 1.0


def test_vendor_pcd_ingestion_matches_reference_semantics(tmp_path):
    """Binary PCD with Robosense FullPointType fields -> from_vendor_pcd
    applies cloud_subscriber.cpp:31-58 exactly: finite+min-range-4m cull,
    ring passthrough, (t - t_first)/span per-point time."""
    rng = np.random.default_rng(9)
    n = 4000
    xyz = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
    xyz[0] = [0.5, 0.5, 0.5]              # near-field -> culled
    xyz[1] = [np.nan, 0, 0]               # non-finite -> culled
    ring = rng.integers(0, 16, n).astype(np.uint16)
    t0 = 1700000000.0
    ts = (t0 + np.sort(rng.uniform(0, 0.1, n))).astype(np.float64)
    inten = rng.uniform(0, 255, n).astype(np.float32)
    p = str(tmp_path / "scan.pcd")
    pcd.save_pcd(p, xyz, binary=True, extra_fields={
        "intensity": inten, "ring": ring, "timestamp": ts})
    # full-field reader preserves the row layout
    f = pcd.load_pcd_full(p)
    assert set(f) >= {"x", "y", "z", "intensity", "ring", "timestamp"}
    np.testing.assert_allclose(f["timestamp"], ts)

    log = kitti.from_vendor_pcd(p, capacity=8192)
    m = log.scan_mask[0]
    kept = int(m.sum())
    far_enough = (np.linalg.norm(xyz, axis=1) >= 4.0) & np.isfinite(xyz).all(axis=1)
    assert kept == int(far_enough.sum())
    rel = log.scan_time[0][m]
    assert rel.min() >= 0.0 and rel.max() <= 1.0
    assert (np.diff(rel) >= -1e-6).all()      # sorted stamps stay sorted
    assert set(np.unique(log.scan_ring[0][m])) <= set(range(16))
    assert abs(log.scan_stamps[0] - ts[0]) < 1e-6
