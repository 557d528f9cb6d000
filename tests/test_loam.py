"""LOAM feature extraction + the LIO loam pipeline path (previously
untested). Reference: loam_feature_extract.cpp (curvature split),
lio.cpp:311-410 (LOAM variant of the keyframe pipeline)."""
import numpy as np
import jax.numpy as jnp

from loc_lib_tpu.models import icp, loam
from loc_lib_tpu.ops import pointcloud as pcm
from loc_lib_tpu.pipeline import lio as lio_mod


def _l_shaped_rings(n_rings=8, n_per=400, noise=0.002, seed=0):
    """Per ring: an L-shaped wall profile — flat along both legs, one sharp
    corner at the midpoint (the classic LOAM edge)."""
    rng = np.random.default_rng(seed)
    xyz, ring = [], []
    half = n_per // 2
    for r in range(n_rings):
        z = 0.2 * r
        leg1 = np.stack([np.linspace(0, 10, half), np.zeros(half),
                         np.full(half, z)], 1)
        leg2 = np.stack([np.full(half, 10.0), np.linspace(0, 10, half),
                         np.full(half, z)], 1)
        pts = np.concatenate([leg1, leg2])
        pts += rng.normal(0, noise, pts.shape)
        xyz.append(pts)
        ring.append(np.full(n_per, r, np.int32))
    return (np.concatenate(xyz).astype(np.float32),
            np.concatenate(ring).astype(np.int32))


def test_extract_features_edges_at_corner():
    xyz, ring = _l_shaped_rings()
    pc = pcm.from_numpy(xyz, capacity=4096, ring=ring)
    opts = loam.LoamFeatureOptions(num_scan=8)
    feats = loam.extract_features(pc, opts)
    edge = np.asarray(feats.edge.mask)
    surf = np.asarray(feats.surf.mask)
    assert edge.sum() > 0 and surf.sum() > 100
    assert not (edge & surf).any()        # disjoint split
    # edges concentrate at the corner (x ~ 10, y ~ 0); surfs lie on the legs
    exyz = np.asarray(feats.edge.xyz)[edge]
    corner_d = np.linalg.norm(exyz[:, :2] - np.array([10.0, 0.0]), axis=1)
    assert np.median(corner_d) < 1.0, np.median(corner_d)
    # every ring with enough points contributes <= 20 edges per sector
    assert edge.sum() <= 8 * 6 * 20


def test_lio_loam_pipeline_runs():
    """matcher='loam' through the full jitted keyframe pipeline with the
    fused voxel methods (surf=p2plane_vox would need denser surfs on this
    synthetic scene; the knn methods are the reference defaults)."""
    xyz, ring = _l_shaped_rings()
    pc = pcm.from_numpy(xyz, capacity=4096, ring=ring)
    feats = loam.extract_features(pc, loam.LoamFeatureOptions(num_scan=8))

    opts = lio_mod.LioOptions(
        matcher="loam",
        loam=loam.LoamOption(
            surf_icp=icp.IcpOptions(method="p2plane", max_iteration=8,
                                    bucket_size=4),
            edge_icp=icp.IcpOptions(method="p2line", max_iteration=8,
                                    bucket_size=4)),
        scan_capacity=4096, num_kfs_in_local_map=2, with_eskf=False,
        scan_filter_leaf=0.3, map_filter_leaf=0.3, kf_distance=0.05)
    engine = lio_mod.Lio(opts)
    out0 = engine.add_cloud(feats.surf, edge_scan=feats.edge)
    assert bool(out0.is_keyframe)

    # second frame: same scene seen from a small known offset
    from loc_lib_tpu.utils import lie
    R = np.asarray(lie.so3_exp(jnp.array([0.0, 0.0, 0.01], jnp.float32)))
    t = np.array([0.06, 0.03, 0.0], np.float32)
    mv = lambda m: pcm.PointCloud(
        xyz=jnp.asarray(((np.asarray(m.xyz) - t) @ R).astype(np.float32)),
        mask=m.mask)
    out1 = engine.add_cloud(mv(feats.surf), edge_scan=mv(feats.edge))
    est_t = np.asarray(out1.t)
    assert np.isfinite(est_t).all()
    assert np.linalg.norm(est_t - t) < 0.05, (est_t, t)


def test_loam_default_config_is_fused_and_tracks():
    """LoamOption() defaults are the production fused voxel methods
    (surf=p2plane_vox, edge=p2line_vox) and recover a pose end-to-end on a
    lidar-density scene via synthetic ring annotation."""
    from loc_lib_tpu.io import synthetic

    opts = loam.LoamOption()
    assert opts.surf_icp.method == "p2plane_vox"
    assert opts.edge_icp.method == "p2line_vox"

    world = synthetic.make_world(num_points=120000, extent=40.0, seed=3)
    traj = synthetic.make_trajectory(num_frames=2, dt=0.1, speed=2.0)
    fopts = loam.LoamFeatureOptions(num_scan=16, min_ring_pts=64)
    feats = []
    for k in range(2):
        pc = synthetic.render_scan(world, traj.R[k], traj.t[k],
                                   max_points=8192, noise=0.01, seed=k,
                                   capacity=8192)
        feats.append(loam.extract_features(
            synthetic.annotate_rings(pc, num_rings=16), fopts))
    target = loam.set_target(feats[0].edge, feats[0].surf, opts)
    res = loam.scan_match(target, opts, feats[1].edge, feats[1].surf,
                          jnp.eye(3), jnp.zeros(3))
    rel = traj.R[0].T @ (traj.t[1] - traj.t[0])
    err = np.linalg.norm(np.asarray(res.t) - rel)
    assert np.isfinite(np.asarray(res.t)).all()
    assert err < 0.1, (np.asarray(res.t), rel, int(res.num_effective))


def test_annotate_rings_structure():
    """annotate_rings: elevation-binned ring ids, rows ordered (ring,
    azimuth) with valid rows first — the layout the curvature stencil
    assumes."""
    from loc_lib_tpu.io import synthetic

    world = synthetic.make_world(num_points=60000, extent=40.0, seed=1)
    pc = synthetic.render_scan(world, np.eye(3, dtype=np.float32),
                               np.array([0.0, 0.0, 1.5], np.float32),
                               max_points=4096, seed=0, capacity=4096)
    ringed = synthetic.annotate_rings(pc, num_rings=16)
    ring = np.asarray(ringed.ring)
    mask = np.asarray(ringed.mask)
    xyz = np.asarray(ringed.xyz)
    # valid rows form a prefix; within it rings are non-decreasing
    nv = int(mask.sum())
    assert mask[:nv].all() and not mask[nv:].any()
    r = ring[:nv]
    assert (np.diff(r) >= 0).all()
    assert r.min() >= 0 and r.max() <= 15
    # azimuth non-decreasing within each ring
    az = np.arctan2(xyz[:nv, 1], xyz[:nv, 0])
    for k in np.unique(r):
        a = az[r == k]
        assert (np.diff(a) >= -1e-6).all(), f"ring {k} not azimuth-sorted"
    # same point SET as the input
    src = np.asarray(pc.xyz)[np.asarray(pc.mask)]
    np.testing.assert_allclose(np.sort(xyz[:nv], axis=0),
                               np.sort(src, axis=0), atol=0)
