import numpy as np
import jax
import jax.numpy as jnp
import pytest

from loc_lib_tpu.ops import pointcloud as pcm
from loc_lib_tpu.ops.pointcloud import PointCloud
from loc_lib_tpu.io import synthetic
from loc_lib_tpu.models import icp
from loc_lib_tpu.utils import lie
import oracles


def _structured_scene(rng, n=600):
    """Non-degenerate scene: three mutually orthogonal planes + a ridge."""
    a = np.stack([rng.uniform(-10, 10, n), rng.uniform(-10, 10, n), np.zeros(n)], 1)
    b = np.stack([rng.uniform(-10, 10, n), np.full(n, -10.0), rng.uniform(0, 5, n)], 1)
    c = np.stack([np.full(n, -10.0), rng.uniform(-10, 10, n), rng.uniform(0, 5, n)], 1)
    return np.concatenate([a, b, c]).astype(np.float32)


def _make_pair(rng, w, trans):
    scene = _structured_scene(rng)
    R_true = oracles.so3_exp(np.asarray(w))
    t_true = np.asarray(trans, dtype=np.float64)
    src = ((scene - t_true) @ R_true).astype(np.float32)  # R^T(p - t): T*src = scene
    return scene, src, R_true, t_true


def _pose_err(res, R_true, t_true):
    R_est = np.array(res.R, dtype=np.float64)
    rot_err = np.linalg.norm(oracles.so3_log(R_est.T @ R_true))
    t_err = np.linalg.norm(np.array(res.t, dtype=np.float64) - t_true)
    return rot_err, t_err


def test_p2plane_recovers_pose():
    rng = np.random.default_rng(0)
    scene, src, R_true, t_true = _make_pair(rng, [0.02, -0.03, 0.04], [0.3, -0.2, 0.15])
    opts = icp.IcpOptions(method="p2plane")
    tgt = icp.set_target(pcm.from_numpy(scene, capacity=2048), opts)
    res = icp.scan_match(tgt, opts, pcm.from_numpy(src, capacity=2048), jnp.eye(3), jnp.zeros(3))
    rot_err, t_err = _pose_err(res, R_true, t_true)
    assert bool(res.converged)
    assert rot_err < 5e-3 and t_err < 5e-2


def test_p2p_recovers_pose():
    rng = np.random.default_rng(1)
    scene, src, R_true, t_true = _make_pair(rng, [0.01, 0.02, -0.02], [0.15, 0.1, -0.1])
    opts = icp.IcpOptions(method="p2p")
    tgt = icp.set_target(pcm.from_numpy(scene, capacity=2048), opts)
    res = icp.scan_match(tgt, opts, pcm.from_numpy(src, capacity=2048), jnp.eye(3), jnp.zeros(3))
    rot_err, t_err = _pose_err(res, R_true, t_true)
    # P2P on random-sampled planes has sampling noise; looser tolerance.
    assert rot_err < 2e-2 and t_err < 1e-1


def test_p2line_recovers_pose():
    rng = np.random.default_rng(2)
    # line-rich scene: grid of straight edges along x and y
    lines = []
    for z in range(5):
        ts = rng.uniform(-10, 10, 150)
        lines.append(np.stack([ts, np.full_like(ts, z * 2.0 - 5), np.full_like(ts, z * 1.0)], 1))
        lines.append(np.stack([np.full_like(ts, z * 2.0 - 5), ts, np.full_like(ts, z * 0.7)], 1))
    scene = np.concatenate(lines).astype(np.float32)
    R_true = oracles.so3_exp(np.array([0.01, -0.01, 0.02]))
    t_true = np.array([0.1, 0.05, -0.05])
    src = ((scene - t_true) @ R_true).astype(np.float32)
    opts = icp.IcpOptions(method="p2line")
    tgt = icp.set_target(pcm.from_numpy(scene, capacity=2048), opts)
    res = icp.scan_match(tgt, opts, pcm.from_numpy(src, capacity=2048), jnp.eye(3), jnp.zeros(3))
    rot_err, t_err = _pose_err(res, R_true, t_true)
    assert rot_err < 2e-2 and t_err < 5e-2


def test_h_b_matches_oracle_p2plane():
    """Golden check of one linearization against the float64 reference math
    (CaculateMatrixHAndBP2Plane, icp_registration.cpp:161-213)."""
    rng = np.random.default_rng(3)
    scene = _structured_scene(rng, n=400)
    # linearize at identity with a real pose offset so the GN step is O(offset)
    # and not noise-dominated
    Rw = oracles.so3_exp(np.array([0.01, -0.008, 0.015]))
    tw = np.array([0.04, -0.03, 0.02])
    src = ((scene[::7] - tw) @ Rw).astype(np.float32)
    R0 = np.eye(3)
    t0 = np.zeros(3)

    opts = icp.IcpOptions(method="p2plane", grid_leaf=1.0, bucket_size=32)
    tgt_pc = pcm.from_numpy(scene, capacity=2048)
    src_pc = pcm.from_numpy(src, capacity=256)
    tgt = icp.set_target(tgt_pc, opts)
    H, b, eff, chi2 = icp.compute_h_and_b(
        tgt, opts, src_pc, jnp.array(R0, dtype=jnp.float32), jnp.array(t0, dtype=jnp.float32))

    # oracle: same correspondences (exact brute-force 5-NN within the stencil)
    from loc_lib_tpu.ops import voxel as vx
    qs_all = src @ np.array(R0).T + t0

    def nn_fn(qs):
        # the TPU search sees only the 3x3x3 cell window around qs; take the
        # 5 nearest among those candidates (exactly the hash-grid semantics)
        cell = np.floor(qs)
        in_stencil = np.all(np.abs(np.floor(scene) - cell) <= 1, axis=1)
        cand = scene[in_stencil]
        if len(cand) == 0:
            return None
        d2 = np.sum((cand - qs) ** 2, axis=1)
        return cand[np.argsort(d2)[:5]]

    H_ref, b_ref, eff_ref = oracles.icp_p2plane_h_b(
        src.astype(np.float64), nn_fn, np.array(R0), t0)

    # correspondence/gate semantics must match the reference exactly
    assert abs(int(eff) - eff_ref) <= 2
    # H/b agree up to f32-vs-f64 plane-fit precision (the TPU path fits in
    # float32; the oracle in float64); the solved GN step must agree tightly
    scale = np.abs(H_ref).max()
    np.testing.assert_allclose(np.array(H), H_ref, atol=scale * 0.12)
    np.testing.assert_allclose(np.array(b), b_ref, atol=np.abs(b_ref).max() * 0.15 + 1e-3)
    dx_ours = np.linalg.solve(np.array(H, dtype=np.float64), np.array(b, dtype=np.float64))
    dx_ref = np.linalg.solve(H_ref, b_ref)
    np.testing.assert_allclose(dx_ours, dx_ref, atol=np.abs(dx_ref).max() * 0.2 + 2e-4)


def test_min_effective_guard():
    """With too few points the solver must not move (cpp:94-101)."""
    rng = np.random.default_rng(4)
    scene = _structured_scene(rng, n=100)
    opts = icp.IcpOptions(method="p2plane", min_effective_pts=10**6)
    tgt = icp.set_target(pcm.from_numpy(scene, capacity=1024), opts)
    src_pc = pcm.from_numpy(scene[:50], capacity=64)
    R0, t0 = jnp.eye(3), jnp.array([0.5, 0.5, 0.5])
    res = icp.scan_match(tgt, opts, src_pc, R0, t0)
    np.testing.assert_allclose(np.array(res.t), np.array(t0), atol=1e-6)
    assert not bool(res.converged)


def test_p2plane_vox_recovers_pose():
    rng = np.random.default_rng(7)
    scene, src, R_true, t_true = _make_pair(rng, [0.02, -0.03, 0.04], [0.3, -0.2, 0.15])
    opts = icp.IcpOptions(method="p2plane_vox", dense_dims=(64, 64, 32))
    tgt = icp.set_target(pcm.from_numpy(scene, capacity=2048), opts)
    res = icp.scan_match(tgt, opts, pcm.from_numpy(src, capacity=2048),
                         jnp.eye(3), jnp.zeros(3))
    rot_err, t_err = _pose_err(res, R_true, t_true)
    assert bool(res.converged)
    assert rot_err < 5e-3 and t_err < 5e-2


def test_vox_plane_table_alignment_and_geometry():
    """Plane-table rows must align with grid.voxel_keys slots, and a voxel on
    the synthetic ground plane must recover n ~ +-z, |d| ~ 0."""
    rng = np.random.default_rng(8)
    scene = _structured_scene(rng)
    opts = icp.IcpOptions(method="p2plane_vox", dense_dims=(64, 64, 32))
    pc = pcm.from_numpy(scene, capacity=2048)
    tgt = icp.set_target(pc, opts)
    from loc_lib_tpu.ops import voxel as voxel_ops
    stats = voxel_ops.voxel_stats(pc, opts.grid_leaf, origin=tgt.grid.origin,
                                  mode="floor")
    np.testing.assert_array_equal(np.asarray(stats.keys),
                                  np.asarray(tgt.grid.voxel_keys))
    # query the voxel containing a ground-plane point away from the walls
    q = jnp.asarray([[3.2, 3.2, 0.0]], jnp.float32)
    keys = voxel_ops.coords_to_key(
        voxel_ops.voxel_coords(q, tgt.grid.inv_leaf, tgt.grid.origin),
        jnp.ones((1,), bool))
    slot, found = voxel_ops.lookup_dense(tgt.dense, opts.dense_dims, keys)
    assert bool(found[0])
    coeffs = np.asarray(tgt.plane)[int(slot[0])]
    assert bool(np.asarray(tgt.plane_valid)[int(slot[0])])
    assert abs(abs(coeffs[2]) - 1.0) < 1e-3   # normal is +-z
    assert abs(coeffs[3]) < 1e-2              # plane through z=0


def test_fused_pick_matches_unfused_pick_oracle():
    """The in-kernel nearest-centroid election (p2plane_pick_fused_terms)
    must produce the exact same normal equations as the XLA argmin +
    take_along_axis election feeding the plane-only kernel — the pinned
    oracle pair for PROFILE.md lever 2."""
    rng = np.random.default_rng(11)
    scene, src, _, _ = _make_pair(rng, [0.02, -0.03, 0.04], [0.3, -0.2, 0.15])
    opts = icp.IcpOptions(method="p2plane_vox", dense_dims=(64, 64, 32))
    tgt = icp.set_target(pcm.from_numpy(scene, capacity=2048), opts)
    src_pc = pcm.from_numpy(src, capacity=2048)
    for w, trans in ([0.0, 0.0, 0.0], [0.0, 0.0, 0.0]), \
            ([0.01, -0.02, 0.03], [0.1, -0.05, 0.2]):
        R = jnp.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))
        t = jnp.asarray(trans, jnp.float32)
        H1, b1, n1, c1 = icp._p2plane_vox_terms(tgt, opts, src_pc, R, t)
        H2, b2, n2, c2 = icp._p2plane_vox_terms_unfused_pick(
            tgt, opts, src_pc, R, t)
        assert int(n1) == int(n2) and int(n1) > 0
        np.testing.assert_allclose(np.asarray(H1), np.asarray(H2),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b2),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(float(c1), float(c2), rtol=1e-5, atol=1e-4)


def test_fused_terms_match_reference_formula():
    """Pallas fused H/b vs a straight numpy evaluation of the same math."""
    from loc_lib_tpu.ops import pallas_kernels
    rng = np.random.default_rng(9)
    n = 4096
    q = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
    nvec = rng.normal(size=(n, 3)).astype(np.float32)
    nvec /= np.linalg.norm(nvec, axis=1, keepdims=True)
    d = rng.uniform(-1, 1, size=(n, 1)).astype(np.float32)
    plane = np.concatenate([nvec, d], axis=1)
    w = (rng.uniform(size=n) < 0.8).astype(np.float32)
    R = oracles.so3_exp(np.array([0.05, -0.1, 0.2])).astype(np.float32)
    t = np.array([0.3, -0.1, 0.25], np.float32)
    gate = 0.5
    H, b, n_eff, chi2 = pallas_kernels.p2plane_fused_terms(
        jnp.asarray(q), jnp.asarray(plane), jnp.asarray(w),
        jnp.asarray(R), jnp.asarray(t), gate, interpret=True)
    # numpy reference
    qs = q @ R.T + t
    dis = np.sum(nvec * qs, axis=1) + d[:, 0]
    wf = w * (np.abs(dis) <= gate)
    rn = nvec @ R        # row-wise R^T n
    jrot = -np.cross(rn, q)
    J = np.concatenate([jrot, nvec], axis=1) * wf[:, None]
    H_ref = J.T @ J
    b_ref = -(J.T @ (dis * wf))
    np.testing.assert_allclose(np.asarray(H), H_ref, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(b), b_ref, rtol=1e-4, atol=1e-3)
    assert int(n_eff) == int(wf.sum())
    np.testing.assert_allclose(float(chi2), float((dis**2 * wf).sum()),
                               rtol=1e-4)


def _line_field_cloud(seed=0, n_per=60, noise=0.003):
    """Points sampled on axis-aligned lines in all three directions — a
    fully 6-DoF-constraining line field for P2Line testing."""
    rng = np.random.default_rng(seed)
    pts = []
    for axis in range(3):
        for _ in range(14):
            off = rng.uniform(-6, 6, 3)
            p = np.tile(off, (n_per, 1))
            p[:, axis] = rng.uniform(-8, 8, n_per)
            pts.append(p)
    pts = np.concatenate(pts)
    pts = pts + rng.normal(0, noise, pts.shape)
    return pts.astype(np.float32)


def test_line_table_directions():
    from loc_lib_tpu.utils import mathx as mx
    pts = _line_field_cloud()
    pc = pcm.from_numpy(pts, capacity=4096)
    opts = icp.IcpOptions(method="p2line_vox", grid_leaf=1.0, plane_min_pts=4)
    target = icp.set_target(pc, opts)
    valid = np.asarray(target.line_packed[:, 12]) > 0.5
    assert valid.sum() > 50
    d = np.asarray(target.line_dir)[valid]
    # every valid voxel's direction is (close to) one coordinate axis
    # most valid voxels align with a coordinate axis; the rest sit where
    # two lines cross a merged neighborhood (their blended direction still
    # passes the anisotropy gate — acceptable, they are few)
    ax = np.abs(d).max(axis=1)
    assert (ax > 0.99).mean() > 0.75
    # packed W reproduces the perpendicular projector I - d d^T
    W = np.asarray(target.line_packed)[valid][:, 3:12].reshape(-1, 3, 3)
    info = W @ W.transpose(0, 2, 1)
    ref = np.eye(3)[None] - d[:, :, None] * d[:, None, :]
    np.testing.assert_allclose(info, ref, rtol=0, atol=5e-3)


def test_p2line_vox_recovers_pose():
    pts = _line_field_cloud()
    tgt = pcm.from_numpy(pts, capacity=4096)
    R_true = np.asarray(lie.so3_exp(jnp.array([0.004, -0.006, 0.02],
                                              jnp.float32)))
    t_true = np.array([0.15, -0.1, 0.05], np.float32)
    src_np = ((pts - t_true) @ R_true).astype(np.float32)
    src = pcm.from_numpy(src_np, capacity=4096)
    opts = icp.IcpOptions(method="p2line_vox", grid_leaf=1.0,
                          plane_min_pts=4, max_line_distance=0.5)
    target = icp.set_target(tgt, opts)
    res = icp.scan_match(target, opts, src, jnp.eye(3), jnp.zeros(3))
    assert np.linalg.norm(np.asarray(res.t) - t_true) < 0.03, np.asarray(res.t)
    assert np.linalg.norm(np.asarray(res.R) - R_true) < 0.02
    assert int(res.num_effective) > 500


def test_loam_vox_fused_recovers_pose():
    """LOAM with both fused voxel methods (surf=p2plane_vox,
    edge=p2line_vox): the production TPU configuration of the reference's
    edge+surf joint solve (loam_registration.cpp:38-99)."""
    from loc_lib_tpu.models import loam
    rng = np.random.default_rng(11)
    planes = _structured_scene(rng)
    lines = _line_field_cloud(seed=3)
    R_true = np.asarray(lie.so3_exp(jnp.array([0.01, -0.01, 0.02],
                                              jnp.float32)))
    t_true = np.array([0.12, -0.08, 0.05], np.float32)
    mk = lambda pts, cap: pcm.from_numpy(pts, capacity=cap)
    opts = loam.LoamOption(
        surf_icp=icp.IcpOptions(method="p2plane_vox",
                                dense_dims=(64, 64, 32)),
        edge_icp=icp.IcpOptions(method="p2line_vox", plane_min_pts=4,
                                max_line_distance=0.5,
                                dense_dims=(64, 64, 32)))
    target = loam.set_target(mk(lines, 4096), mk(planes, 2048), opts)
    e_src = mk(((lines - t_true) @ R_true).astype(np.float32), 4096)
    s_src = mk(((planes - t_true) @ R_true).astype(np.float32), 2048)
    res = loam.scan_match(target, opts, e_src, s_src,
                          jnp.eye(3), jnp.zeros(3))
    assert np.linalg.norm(np.asarray(res.t) - t_true) < 0.03
    assert np.linalg.norm(np.asarray(res.R) - R_true) < 0.02
    assert int(res.num_effective) > 1000


def test_target_from_moment_table_matches_set_target():
    """icp_vox_inc derivation parity: a plane table derived from a
    single-scan incremental moment table must match set_target on the same
    cloud (same voxels, same planes)."""
    from loc_lib_tpu.models import ndt
    import dataclasses
    rng = np.random.default_rng(9)
    scene = _structured_scene(rng)
    pc = pcm.from_numpy(scene, capacity=2048)
    opts = icp.IcpOptions(method="p2plane_vox", dense_dims=(64, 64, 32))
    ref = icp.set_target(pc, opts)

    nopts = ndt.NdtOptions(method="incremental", voxel_size=opts.grid_leaf,
                           bin_mode="floor", dense_dims=opts.dense_dims,
                           map_capacity=4096)
    m = ndt.update_incremental(ndt.empty_incremental(nopts), pc, nopts)
    der = icp.target_from_moment_table(m.keys, m.count, m.mean, m.cov,
                                       m.dense_table, m.dense_lo, m.origin,
                                       opts, opts.dense_dims)
    # compare per-voxel planes via key association
    ref_keys = np.asarray(ref.grid.voxel_keys)
    der_keys = np.asarray(der.grid.voxel_keys)
    ref_valid = np.asarray(ref.plane_valid)
    der_valid = np.asarray(der.plane_valid)
    ref_map = {k: i for i, k in enumerate(ref_keys) if ref_valid[i]}
    der_map = {k: i for i, k in enumerate(der_keys) if der_valid[i]}
    assert set(ref_map) == set(der_map)
    ref_planes = np.asarray(ref.plane)
    der_planes = np.asarray(der.plane)
    for k, i in ref_map.items():
        np.testing.assert_allclose(der_planes[der_map[k]], ref_planes[i],
                                   rtol=0, atol=1e-3)


def test_lio_icp_vox_inc_tracks():
    """The incremental plane-table LIO path tracks a short trajectory with
    accuracy comparable to the batch-rebuild vox path."""
    from loc_lib_tpu.io import logdir
    from loc_lib_tpu.pipeline import lio as lio_mod
    from loc_lib_tpu.eval import metrics

    log = logdir.make_demo_log(num_frames=8, capacity=2048, yaw_rate=0.0,
                               speed=2.0)
    ates = {}
    # (matcher, vox_inc_reanchor): reanchor=0 is pure absorption (the
    # reference's incremental semantics), reanchor=2 exercises the periodic
    # window-rebuild that flushes baked-in drift
    for name, matcher, reanchor in (("inc0", "icp_vox_inc", 0),
                                    ("inc2", "icp_vox_inc", 2),
                                    ("icp", "icp", 0)):
        opts = lio_mod.LioOptions(
            matcher=matcher,
            icp=icp.IcpOptions(method="p2plane_vox"),
            scan_capacity=2048, with_eskf=False,
            vox_inc_reanchor=reanchor)
        engine = lio_mod.Lio(opts)
        idxs = []
        for mg in log.measures(imu_capacity=8):
            scan = pcm.PointCloud(
                xyz=jnp.asarray(log.scan_xyz[mg.scan_index]),
                mask=jnp.asarray(log.scan_mask[mg.scan_index]))
            engine.add_cloud(scan)
            idxs.append(mg.scan_index)
        a = metrics.ate(np.stack(engine.poses), log.gt_poses[np.asarray(idxs)])
        ates[name] = a.rmse
    assert ates["inc0"] < max(2.5 * ates["icp"], 0.1), ates
    assert ates["inc2"] < max(2.5 * ates["icp"], 0.1), ates


def test_fitness_score():
    """get_fitness_score (matching_interface.h:52 — a 0-return stub in every
    reference matcher, icp_registration.cpp:246-250): ~0 at the true pose,
    large at a wrong pose, +inf against an empty target."""
    rng = np.random.default_rng(11)
    scene, src, R_true, t_true = _make_pair(rng, [0.0, 0.0, 0.05], [0.4, 0.1, 0.0])
    opts = icp.IcpOptions(method="p2plane")
    tgt = icp.set_target(pcm.from_numpy(scene, capacity=2048), opts)
    src_pc = pcm.from_numpy(src, capacity=2048)
    good = float(icp.get_fitness_score(tgt, opts, src_pc,
                                       jnp.asarray(R_true, jnp.float32),
                                       jnp.asarray(t_true, jnp.float32)))
    bad = float(icp.get_fitness_score(tgt, opts, src_pc,
                                      jnp.eye(3), jnp.array([3.0, 0.0, 0.0])))
    assert good < 0.01, good
    assert bad > 5 * good, (good, bad)

    empty = pcm.PointCloud(xyz=jnp.full((64, 3), pcm.PAD_COORD, jnp.float32),
                           mask=jnp.zeros((64,), bool))
    tgt_e = icp.set_target(empty, opts)
    inf = float(icp.get_fitness_score(tgt_e, opts, src_pc,
                                      jnp.eye(3), jnp.zeros(3)))
    assert np.isinf(inf)

    # NDT-map variant (serves moment-table targets too)
    from loc_lib_tpu.models import ndt
    nopts = ndt.NdtOptions(voxel_size=1.0)
    m = ndt.build_direct(pcm.from_numpy(scene, capacity=2048), nopts)
    good_n = float(ndt.get_fitness_score(m, nopts, src_pc,
                                         jnp.asarray(R_true, jnp.float32),
                                         jnp.asarray(t_true, jnp.float32)))
    bad_n = float(ndt.get_fitness_score(m, nopts, src_pc,
                                        jnp.eye(3), jnp.array([30.0, 0.0, 0.0])))
    assert np.isfinite(good_n) and good_n < 1.0
    assert np.isinf(bad_n) or bad_n > good_n


def test_use_initial_translation_false_centroid_init():
    """use_initial_translation=False replaces the init translation with the
    target-source centroid difference (icp_registration.cpp:273-275; the
    reference's own centers are never computed, cpp:22-26 — implemented
    functionally here). A pair offset by 3 m with a ZERO init must converge
    via the centroid init where the plain init's basin fails."""
    rng = np.random.default_rng(21)
    scene, src, R_true, t_true = _make_pair(rng, [0.0, 0.0, 0.02],
                                            [3.0, -2.0, 0.4])
    tgt_pc = pcm.from_numpy(scene, capacity=2048)
    src_pc = pcm.from_numpy(src, capacity=2048)
    opts0 = icp.IcpOptions(method="p2p", max_nn_distance=25.0)
    tgt = icp.set_target(tgt_pc, opts0)
    plain = icp.scan_match(tgt, opts0, src_pc, jnp.eye(3), jnp.zeros(3))
    opts1 = icp.IcpOptions(method="p2p", max_nn_distance=25.0,
                           use_initial_translation=False)
    cen = icp.scan_match(tgt, opts1, src_pc, jnp.eye(3), jnp.zeros(3))
    _, t_err_cen = _pose_err(cen, R_true, t_true)
    _, t_err_plain = _pose_err(plain, R_true, t_true)
    assert t_err_cen < 0.1, t_err_cen
    assert t_err_cen <= t_err_plain + 1e-6


def test_p2plane_vox_frozen_election_matches_full():
    """freeze_election_after > 0 (pure fused-kernel refinement after the
    first k elections) must land on the same pose as the re-elect-every-
    iteration path."""
    rng = np.random.default_rng(31)
    scene, src, R_true, t_true = _make_pair(rng, [0.02, -0.03, 0.04],
                                            [0.3, -0.2, 0.15])
    tgt_pc = pcm.from_numpy(scene, capacity=2048)
    src_pc = pcm.from_numpy(src, capacity=2048)
    full_o = icp.IcpOptions(method="p2plane_vox")
    frozen_o = icp.IcpOptions(method="p2plane_vox", freeze_election_after=2)
    tgt = icp.set_target(tgt_pc, full_o)
    full = icp.scan_match(tgt, full_o, src_pc, jnp.eye(3), jnp.zeros(3))
    froz = icp.scan_match(tgt, frozen_o, src_pc, jnp.eye(3), jnp.zeros(3))
    for res in (full, froz):
        rot_err, t_err = _pose_err(res, R_true, t_true)
        assert rot_err < 1e-2 and t_err < 5e-2, (rot_err, t_err)
    assert np.linalg.norm(np.asarray(full.t) - np.asarray(froz.t)) < 1e-2
    assert bool(froz.converged)


def test_scan_match_batch_matches_scalar():
    """B independent (target, source, init) matches fused into one program
    (scan_match_batch) must be BIT-IDENTICAL to B scalar scan_match calls —
    the throughput mode is pure vmap, no numerical shortcut."""
    import jax

    rng = np.random.default_rng(11)
    opts = icp.IcpOptions(method="p2plane_vox", dense_dims=(64, 64, 32))
    tgts, srcs, inits = [], [], []
    for b in range(3):
        scene, src, R_true, t_true = _make_pair(
            rng, 0.02 * rng.standard_normal(3), 0.2 * rng.standard_normal(3))
        tgts.append(pcm.from_numpy(scene, capacity=2048))
        srcs.append(pcm.from_numpy(src, capacity=2048))
        inits.append((jnp.eye(3), jnp.zeros(3)))
    stack = lambda xs: jax.tree_util.tree_map(lambda *a: jnp.stack(a), *xs)
    bt = icp.set_target_batch(stack(tgts), opts)
    res_b = icp.scan_match_batch(
        bt, opts, stack(srcs),
        jnp.stack([i[0] for i in inits]), jnp.stack([i[1] for i in inits]))
    for b in range(3):
        res_s = icp.scan_match(icp.set_target(tgts[b], opts), opts, srcs[b],
                               *inits[b])
        np.testing.assert_array_equal(np.asarray(res_s.R),
                                      np.asarray(res_b.R)[b])
        np.testing.assert_array_equal(np.asarray(res_s.t),
                                      np.asarray(res_b.t)[b])
        assert bool(res_s.converged) == bool(np.asarray(res_b.converged)[b])


def test_p2plane_vox_oct_recovers_pose():
    rng = np.random.default_rng(7)
    scene, src, R_true, t_true = _make_pair(rng, [0.02, -0.03, 0.04],
                                            [0.3, -0.2, 0.15])
    opts = icp.IcpOptions(method="p2plane_vox_oct", dense_dims=(64, 64, 32))
    tgt = icp.set_target(pcm.from_numpy(scene, capacity=2048), opts)
    res = icp.scan_match(tgt, opts, pcm.from_numpy(src, capacity=2048),
                         jnp.eye(3), jnp.zeros(3))
    rot_err, t_err = _pose_err(res, R_true, t_true)
    assert bool(res.converged)
    assert rot_err < 5e-3 and t_err < 5e-2


def test_oct_election_matches_exact_at_octant_centers():
    """The octant-pre-elected correspondence (p2plane_vox_oct) evaluates the
    SAME nearest-valid-centroid election as p2plane_vox, just at the octant
    center instead of the point: for query points placed exactly AT octant
    centers the two must agree wherever both find a plane."""
    rng = np.random.default_rng(3)
    scene = _structured_scene(rng)
    opts_o = icp.IcpOptions(method="p2plane_vox_oct", dense_dims=(64, 64, 32))
    opts_v = icp.IcpOptions(method="p2plane_vox", dense_dims=(64, 64, 32))
    pc = pcm.from_numpy(scene, capacity=2048)
    tgt_o = icp.set_target(pc, opts_o)
    tgt_v = icp.set_target(pc, opts_v)

    # octant-center probes of occupied voxels
    from loc_lib_tpu.ops import voxel as vox
    keys = np.asarray(tgt_v.grid.voxel_keys)
    coords = np.asarray(vox.key_to_coords(jnp.asarray(keys)))
    live = keys != np.iinfo(np.int32).max
    cs = coords[live][:64]
    offs = (((np.arange(8)[:, None] >> np.arange(3)[None, :]) & 1)
            * 0.5 + 0.25)
    leaf = 1.0 / float(tgt_v.grid.inv_leaf)
    origin = np.asarray(tgt_v.grid.origin)
    pts = (cs[:, None, :] + offs[None]).reshape(-1, 3) * leaf + origin
    probes = pcm.PointCloud(xyz=jnp.asarray(pts, jnp.float32),
                            mask=jnp.ones((len(pts),), bool))

    plane_exact, w_exact = icp._p2plane_vox_elect(
        tgt_v, opts_v, probes, jnp.eye(3), jnp.zeros(3))
    # oct path's elected plane, extracted the same way the terms fn does
    u = (probes.xyz - tgt_o.grid.origin) * tgt_o.grid.inv_leaf
    vc = jnp.floor(u).astype(jnp.int32)
    frac = u - jnp.floor(u)
    octant = ((frac[:, 0] > 0.5).astype(jnp.int32)
              + 2 * (frac[:, 1] > 0.5).astype(jnp.int32)
              + 4 * (frac[:, 2] > 0.5).astype(jnp.int32))
    key = vox.coords_to_key(vc, probes.mask)
    slot, found = vox.lookup_dense(tgt_o.dense_oct, opts_o.dense_dims, key)
    row = jnp.take_along_axis(tgt_o.oct_table[slot], octant[:, None],
                              axis=1)[:, 0]
    rows = tgt_o.packed_ext[row]
    both = (np.asarray(w_exact) > 0.5) & np.asarray(found) \
        & (np.asarray(rows[:, 7]) > 0.5)
    assert both.sum() > 100
    np.testing.assert_allclose(np.asarray(rows[:, 0:4])[both],
                               np.asarray(plane_exact)[both], atol=1e-6)


def test_lio_vox_oct_tracks_like_vox():
    """Half-voxel-granular election must not change LIO tracking materially:
    ATE within 1.3x of the exact-election path on the demo log."""
    import jax
    from loc_lib_tpu.io import logdir
    from loc_lib_tpu.ops.pointcloud import PointCloud
    from loc_lib_tpu.pipeline import lio as lio_mod
    from loc_lib_tpu.eval import metrics

    log = logdir.make_demo_log(num_frames=14, capacity=4096, yaw_rate=0.0,
                               speed=2.0)
    ates = {}
    for meth in ("p2plane_vox", "p2plane_vox_oct"):
        opts = lio_mod.LioOptions(
            matcher="icp", icp=icp.IcpOptions(method=meth),
            scan_capacity=4096, with_eskf=True)
        eng = lio_mod.Lio(opts)
        for t, g, a in zip(log.imu.stamps[:150], log.imu.gyro[:150],
                           log.imu.acce[:150]):
            eng.init_imu(g, a, t)
        idxs = []
        for mg in log.measures(imu_capacity=64):
            scan = PointCloud(xyz=jnp.asarray(log.scan_xyz[mg.scan_index]),
                              mask=jnp.asarray(log.scan_mask[mg.scan_index]))
            eng.add_measure(scan, jnp.asarray(mg.imu_gyro),
                            jnp.asarray(mg.imu_acce),
                            jnp.asarray(mg.imu_stamp),
                            jnp.asarray(mg.imu_valid))
            idxs.append(mg.scan_index)
        ates[meth] = metrics.ate(np.stack(eng.poses),
                                 log.gt_poses[np.asarray(idxs)]).rmse
    assert ates["p2plane_vox_oct"] < 1.3 * ates["p2plane_vox"] + 0.02, ates


@pytest.mark.slow
def test_batched_converged_tail_at_keyframe_density():
    """REGRESSION (VERDICT r4 weak #2 / next #2): B=64 batched CONVERGED
    matches at the loop-registration operating point (8192-pt targets,
    2048-pt sources, 5 cm inits) must keep every lane under 3 cm.

    Round 4 measured a 9.3 cm tail here; the diagnosis (round 5) was
    target-density misconfiguration, not the stopping rule: library
    defaults (grid_leaf=1.0, plane_min_pts=5) leave ~23% of source points
    with any valid plane on a cloud this sparse, and that biased
    near-zero-residual subset false-converges at its init. With
    density-matched options every lane lands < 3 cm (measured max
    0.0093 m). See IcpOptions.gate_warmup_iters docstring."""
    world = synthetic.make_world(num_points=200000, extent=80.0, seed=7)
    b_max = 64
    traj = synthetic.make_trajectory(num_frames=b_max + 1, dt=0.1, speed=2.0)
    rng = np.random.default_rng(3)
    tgts, srcs, R0s, t0s, gts = [], [], [], [], []
    for b in range(b_max):
        tgts.append(synthetic.render_scan(
            world, traj.R[b], traj.t[b], max_range=70.0, max_points=8192,
            noise=0.01, seed=2 * b, capacity=8192))
        srcs.append(synthetic.render_scan(
            world, traj.R[b + 1], traj.t[b + 1], max_range=70.0,
            max_points=2048, noise=0.01, seed=2 * b + 1, capacity=2048))
        R0s.append(traj.R[b].T @ traj.R[b + 1])
        gt = traj.R[b].T @ (traj.t[b + 1] - traj.t[b])
        t0s.append(gt + rng.normal(0.0, 0.05, 3))
        gts.append(gt)
    stack = lambda xs: jax.tree_util.tree_map(lambda *a: jnp.stack(a), *xs)
    o = icp.IcpOptions(method="p2plane_vox", grid_leaf=2.0, plane_min_pts=4)
    bt = icp.set_target_batch(
        stack([PointCloud(xyz=t.xyz, mask=t.mask) for t in tgts]), o)
    bs = stack([PointCloud(xyz=s.xyz, mask=s.mask) for s in srcs])
    res = icp.scan_match_batch(
        bt, o, bs, jnp.asarray(np.stack(R0s), jnp.float32),
        jnp.asarray(np.stack(t0s), jnp.float32))
    err = np.linalg.norm(np.asarray(res.t) - np.stack(gts), axis=1)
    assert float(err.max()) < 0.03, (err.max(), np.argsort(-err)[:5])
    # and the misconfigured-density pathology stays observable: callers
    # can gate on num_effective (the biased-subset signature is a low
    # effective count, ~23% here vs ~42% density-matched)
    assert int(np.median(np.asarray(res.num_effective))) > 700


def test_gate_warmup_recovers_init_beyond_the_gate():
    """Opt-in accumulation-gate warm-up (IcpOptions.gate_warmup_iters):
    a 0.3 m-offset init on a corridor whose x signal lives ONLY in the
    end wall exceeds the 0.1 m plane gate, so the plain default stops
    ~0.16 m off; three wide-gate (Marquardt-damped) warm-up iterations
    recover it. Also pins that warm-up leaves a well-posed registration
    untouched."""
    rng = np.random.default_rng(7)
    n = 500
    scene = np.concatenate([
        np.stack([rng.uniform(-10, 10, n), rng.uniform(-4, 4, n),
                  np.zeros(n)], 1),
        np.stack([rng.uniform(-10, 10, n), np.full(n, -4.0),
                  rng.uniform(0, 3, n)], 1),
        np.stack([rng.uniform(-10, 10, n), np.full(n, 4.0),
                  rng.uniform(0, 3, n)], 1),
        np.stack([np.full(n, 10.0), rng.uniform(-4, 4, n),
                  rng.uniform(0, 3, n)], 1),
    ]).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.array([0, 0, 0.026], jnp.float32)))
    t = np.array([0.3, 0.02, 0.0])
    src = ((scene - t) @ R).astype(np.float32)
    tgt_pc = pcm.from_numpy(scene, capacity=2048)
    src_pc = pcm.from_numpy(src, capacity=2048)
    o_plain = icp.IcpOptions(method="p2plane_vox")
    o_warm = icp.IcpOptions(method="p2plane_vox", gate_warmup_iters=3)
    res_p = icp.scan_match(icp.set_target(tgt_pc, o_plain), o_plain, src_pc,
                           jnp.eye(3), jnp.zeros(3))
    res_w = icp.scan_match(icp.set_target(tgt_pc, o_warm), o_warm, src_pc,
                           jnp.eye(3), jnp.zeros(3))
    err_p = np.linalg.norm(np.asarray(res_p.t) - t)
    err_w = np.linalg.norm(np.asarray(res_w.t) - t)
    assert err_p > 0.1, err_p          # the documented failure, pinned
    assert err_w < 0.02, err_w         # warm-up recovers it
    assert bool(res_w.converged)


def test_scan_match_batch_chunked_matches_direct():
    """scan_match_batch_chunked (VERDICT r4 next #6): sub-batch dispatches
    must reproduce the direct batched result lane-for-lane, including a
    B not divisible by the chunk (wrap-padded, padding dropped)."""
    world = synthetic.make_world(num_points=60000, extent=40.0, seed=5)
    B = 6
    traj = synthetic.make_trajectory(num_frames=B + 1, dt=0.1, speed=2.0)
    rng = np.random.default_rng(4)
    tgts, srcs, R0s, t0s = [], [], [], []
    for b in range(B):
        tgts.append(synthetic.render_scan(
            world, traj.R[b], traj.t[b], max_range=35.0, max_points=2048,
            noise=0.01, seed=2 * b, capacity=2048))
        srcs.append(synthetic.render_scan(
            world, traj.R[b + 1], traj.t[b + 1], max_range=35.0,
            max_points=1024, noise=0.01, seed=2 * b + 1, capacity=1024))
        R0s.append(traj.R[b].T @ traj.R[b + 1])
        t0s.append(traj.R[b].T @ (traj.t[b + 1] - traj.t[b])
                   + rng.normal(0.0, 0.03, 3))
    stack = lambda xs: jax.tree_util.tree_map(lambda *a: jnp.stack(a), *xs)
    o = icp.IcpOptions(method="p2plane_vox", grid_leaf=2.0, plane_min_pts=4)
    bt = icp.set_target_batch(
        stack([PointCloud(xyz=t.xyz, mask=t.mask) for t in tgts]), o)
    bs = stack([PointCloud(xyz=s.xyz, mask=s.mask) for s in srcs])
    bR = jnp.asarray(np.stack(R0s), jnp.float32)
    bT = jnp.asarray(np.stack(t0s), jnp.float32)
    direct = icp.scan_match_batch(bt, o, bs, bR, bT)
    chunked = icp.scan_match_batch_chunked(bt, o, bs, bR, bT, chunk=4)
    np.testing.assert_allclose(np.asarray(direct.t), np.asarray(chunked.t),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(direct.R), np.asarray(chunked.R),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(direct.iterations),
                                  np.asarray(chunked.iterations))
