"""Pose graph + ScanContext loop closure tests (the 3D generalization of
loop_closing.cpp:160-255 and the retrieval the reference left as a stub,
scan_context.cpp:190-203)."""
import numpy as np
import jax
import jax.numpy as jnp

from loc_lib_tpu.graph import pose_graph as pg, scan_context as sc
from loc_lib_tpu.io import synthetic
from loc_lib_tpu.ops.pointcloud import from_numpy
from loc_lib_tpu.utils import lie


def _noisy_chain(m=12, seed=0, drift=0.05):
    """Ground-truth circle of poses + drifted odometry estimates."""
    rng = np.random.default_rng(seed)
    ang = np.linspace(0, 1.5 * np.pi, m)
    t_gt = np.stack([np.cos(ang) * 5, np.sin(ang) * 5, np.zeros(m)], axis=1)
    R_gt = np.stack([np.asarray(lie.so3_exp(jnp.array([0, 0, a], jnp.float32)))
                     for a in ang])
    # integrate noisy relative motions
    R_est = [R_gt[0]]
    t_est = [t_gt[0]]
    for i in range(1, m):
        Rrel = R_gt[i - 1].T @ R_gt[i]
        trel = R_gt[i - 1].T @ (t_gt[i] - t_gt[i - 1])
        trel = trel + rng.normal(0, drift, 3)
        R_est.append(R_est[-1] @ Rrel)
        t_est.append(t_est[-1] + R_est[-1] @ trel)
    return (np.stack(R_gt).astype(np.float32), t_gt.astype(np.float32),
            np.stack(R_est).astype(np.float32), np.stack(t_est).astype(np.float32))


def test_pose_graph_corrects_drift():
    R_gt, t_gt, R_est, t_est = _noisy_chain()
    m = len(R_gt)
    # odometry edges from the (noisy) estimates, loop edge = exact relative
    # pose between first and last node
    odo = pg.odometry_edges(jnp.asarray(R_est), jnp.asarray(t_est))
    Rl = R_gt[0].T @ R_gt[-1]
    tl = R_gt[0].T @ (t_gt[-1] - t_gt[0])
    loop = pg.Se3Edges(
        i=jnp.array([0], jnp.int32), j=jnp.array([m - 1], jnp.int32),
        R=jnp.asarray(Rl)[None], t=jnp.asarray(tl)[None],
        info=jnp.eye(6, dtype=jnp.float32)[None] * 1e4,
        is_loop=jnp.array([True]), valid=jnp.array([True]))
    edges = pg.concat_edges(odo, loop)

    err_before = np.linalg.norm(t_est[-1] - t_gt[-1])
    R, t, inliers = pg.optimize_two_phase(
        jnp.asarray(R_est), jnp.asarray(t_est), edges)
    err_after = np.linalg.norm(np.asarray(t)[-1] - t_gt[-1])
    assert bool(inliers[-1]), "true loop should survive chi2 gating"
    # Loop and odometry edges share info (1e4), so the optimum distributes
    # the drift: ~90% of the endpoint error is recovered.
    assert err_after < err_before * 0.15, (err_before, err_after)
    assert err_after < 0.4


def test_pose_graph_rejects_false_loop():
    R_gt, t_gt, R_est, t_est = _noisy_chain(drift=0.01)
    m = len(R_gt)
    odo = pg.odometry_edges(jnp.asarray(R_est), jnp.asarray(t_est))
    # wildly wrong loop constraint
    bad = pg.Se3Edges(
        i=jnp.array([0], jnp.int32), j=jnp.array([m - 1], jnp.int32),
        R=jnp.eye(3, dtype=jnp.float32)[None],
        t=jnp.array([[30.0, -20.0, 5.0]], jnp.float32),
        info=jnp.eye(6, dtype=jnp.float32)[None] * 1e4,
        is_loop=jnp.array([True]), valid=jnp.array([True]))
    edges = pg.concat_edges(odo, bad)
    R, t, inliers = pg.optimize_two_phase(
        jnp.asarray(R_est), jnp.asarray(t_est), edges)
    assert not bool(inliers[-1]), "false loop must be chi2-gated out"
    # trajectory must stay near the odometry solution, not the bad loop
    assert np.linalg.norm(np.asarray(t)[-1] - t_est[-1]) < 1.0


def test_scan_context_retrieval():
    """Same-place scans (rotated) must match; different places must not."""
    world = synthetic.make_world(num_points=30000, extent=60.0, seed=5)
    # 0.35 gate: the synthetic re-render resamples world points, so same-place
    # descriptors differ more than real lidar revisits (same-place ~0.2 here,
    # different-place >=0.45; the 0.13 default is the real-data operating point)
    opts = sc.ScanContextOptions(exclude_recent=2, dist_threshold=0.35)
    db = sc.ScanContextDb(capacity=64, opts=opts)

    poses = [(-20.0, -20.0), (0.0, 20.0), (25.0, 5.0), (-10.0, 15.0),
             (15.0, -25.0), (5.0, 5.0)]
    scans = []
    for k, (x, y) in enumerate(poses):
        R = np.eye(3, dtype=np.float32)
        t = np.array([x, y, 1.5], np.float32)
        scans.append(synthetic.render_scan(world, R, t, max_range=50.0,
                                           max_points=4096, seed=k,
                                           capacity=4096))
        db.add(scans[-1])

    # revisit pose 0 with a yaw rotation — must retrieve frame 0
    yaw = np.asarray(lie.so3_exp(jnp.array([0, 0, 1.1], jnp.float32)))
    revisit = synthetic.render_scan(world, yaw, np.array([-20.0, -20.0, 1.5]),
                                    max_range=50.0, max_points=4096, seed=99,
                                    capacity=4096)
    res = db.query(revisit)
    assert bool(res.found), f"loop not found (dist={float(res.distance):.3f})"
    assert int(res.index) == 0

    # a far-away novel place must NOT match anything
    novel = synthetic.render_scan(world, np.eye(3, dtype=np.float32),
                                  np.array([55.0, 55.0, 1.5]), max_range=50.0,
                                  max_points=4096, seed=98, capacity=4096)
    res2 = db.query(novel)
    assert int(res2.index) != 0 or not bool(res2.found)


def test_pcg_matches_dense_solver():
    import dataclasses
    R_gt, t_gt, R_est, t_est = _noisy_chain(m=16, seed=3)
    odo = pg.odometry_edges(jnp.asarray(R_est), jnp.asarray(t_est))
    Rl = R_gt[0].T @ R_gt[-1]
    tl = R_gt[0].T @ (t_gt[-1] - t_gt[0])
    loop = pg.Se3Edges(
        i=jnp.array([0], jnp.int32), j=jnp.array([15], jnp.int32),
        R=jnp.asarray(Rl)[None], t=jnp.asarray(tl)[None],
        info=jnp.eye(6, dtype=jnp.float32)[None] * 1e4,
        is_loop=jnp.array([True]), valid=jnp.array([True]))
    edges = pg.concat_edges(odo, loop)
    o_dense = dataclasses.replace(pg.PgoOptions(), solver="dense")
    o_pcg = dataclasses.replace(pg.PgoOptions(), solver="pcg")
    rd = pg.optimize(jnp.asarray(R_est), jnp.asarray(t_est), edges, o_dense)
    rp = pg.optimize(jnp.asarray(R_est), jnp.asarray(t_est), edges, o_pcg)
    Rd, td, chi2_d = rd.R, rd.t, rd.chi2
    Rp, tp, chi2_p = rp.R, rp.t, rp.chi2
    np.testing.assert_allclose(np.asarray(tp), np.asarray(td), atol=2e-3)
    np.testing.assert_allclose(np.asarray(Rp), np.asarray(Rd), atol=2e-3)
    np.testing.assert_allclose(float(chi2_p.sum()), float(chi2_d.sum()),
                               rtol=1e-2, atol=1e-3)


def test_pcg_large_graph_bounded_memory():
    """4096 nodes + 512 loop edges: the dense path would materialize a
    (24576)^2 system (~2.4 GB, VERDICT r1 weak #4); PCG must run it in
    O(M+E) and reduce chi2."""
    import dataclasses
    rng = np.random.default_rng(11)
    m = 4096
    ang = np.linspace(0, 8 * np.pi, m)
    t_gt = np.stack([np.cos(ang) * 30, np.sin(ang) * 30, np.zeros(m)], axis=1)
    R_gt = np.stack([np.asarray(lie.so3_exp(jnp.array([0, 0, a % (2 * np.pi)],
                                                      jnp.float32)))
                     for a in ang]).astype(np.float32)
    R_est = [R_gt[0]]; t_est = [t_gt[0].astype(np.float32)]
    for i in range(1, m):
        Rrel = R_gt[i - 1].T @ R_gt[i]
        trel = R_gt[i - 1].T @ (t_gt[i] - t_gt[i - 1]) + rng.normal(0, 0.01, 3)
        R_est.append((R_est[-1] @ Rrel).astype(np.float32))
        t_est.append((t_est[-1] + R_est[-1] @ trel).astype(np.float32))
    R_est, t_est = np.stack(R_est), np.stack(t_est).astype(np.float32)
    odo = pg.odometry_edges(jnp.asarray(R_est), jnp.asarray(t_est))
    li = rng.integers(0, m - 600, 512).astype(np.int32)
    lj = li + 512  # one revolution apart -> same place on the circle
    Rl = np.einsum("eab,eac->ebc", R_gt[li], R_gt[lj]).astype(np.float32)
    tl = np.einsum("eab,ea->eb", R_gt[li],
                   (t_gt[lj] - t_gt[li])).astype(np.float32)
    loops = pg.Se3Edges(
        i=jnp.asarray(li), j=jnp.asarray(lj), R=jnp.asarray(Rl),
        t=jnp.asarray(tl),
        info=jnp.broadcast_to(jnp.eye(6, dtype=jnp.float32) * 1e4, (512, 6, 6)),
        is_loop=jnp.ones((512,), bool), valid=jnp.ones((512,), bool))
    edges = pg.concat_edges(odo, loops)
    opts = dataclasses.replace(pg.PgoOptions(), solver="pcg",
                               max_iterations=3, max_cg_iterations=100)
    chi2_before = float(jnp.sum(pg.edge_chi2(jnp.asarray(R_est),
                                             jnp.asarray(t_est), edges)))
    res = pg.optimize(jnp.asarray(R_est), jnp.asarray(t_est), edges, opts)
    R, t, chi2, hist = res.R, res.t, res.chi2, res.chi2_hist
    chi2_after = float(jnp.sum(chi2))
    assert np.isfinite(chi2_after)
    assert chi2_after < chi2_before * 0.05, (chi2_before, chi2_after)


def test_scan_context_db_ring_buffer_eviction():
    """At capacity the DB evicts the OLDEST descriptor (counted, never a
    silent stop) and retrieval keeps returning stable insertion ids."""
    world = synthetic.make_world(num_points=30000, extent=60.0, seed=5)
    opts = sc.ScanContextOptions(exclude_recent=2, dist_threshold=0.35)
    db = sc.ScanContextDb(capacity=4, opts=opts)

    poses = [(-20.0, -20.0), (0.0, 20.0), (25.0, 5.0), (-10.0, 15.0),
             (15.0, -25.0), (5.0, 5.0)]
    for k, (x, y) in enumerate(poses):
        scan = synthetic.render_scan(world, np.eye(3, dtype=np.float32),
                                     np.array([x, y, 1.5], np.float32),
                                     max_range=50.0, max_points=4096,
                                     seed=k, capacity=4096)
        assert db.add(scan) == k
    assert db.count == 6
    assert db.evicted == 2                      # ids 0 and 1 overwritten
    assert set(db.ids.tolist()) == {2, 3, 4, 5}

    # revisiting an EVICTED place must not (mis)match anything
    revisit0 = synthetic.render_scan(world, np.eye(3, dtype=np.float32),
                                     np.array([-20.0, -20.0, 1.5]),
                                     max_range=50.0, max_points=4096,
                                     seed=99, capacity=4096)
    res = db.query(revisit0)
    assert int(res.index) != 0

    # revisiting a LIVE place must return its original insertion id
    revisit2 = synthetic.render_scan(world, np.eye(3, dtype=np.float32),
                                     np.array([25.0, 5.0, 1.5]),
                                     max_range=50.0, max_points=4096,
                                     seed=98, capacity=4096)
    res2 = db.query(revisit2)
    assert bool(res2.found) and int(res2.index) == 2, (
        int(res2.index), float(res2.distance))


def test_closed_form_edge_jacobians_match_autodiff():
    """The closed-form edge linearization (pose_graph._linearize) is pinned
    to the jacfwd oracle (_linearize_autodiff) across residual magnitudes,
    including the zero-residual point every converged graph sits at."""
    rng = np.random.default_rng(9)
    for drift in (0.0, 0.05, 0.5, 2.0):
        Ri = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(0, 0.6, 3), jnp.float32)))
        ti = rng.normal(0, 3, 3).astype(np.float32)
        Rj = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(0, 0.6, 3), jnp.float32)))
        tj = rng.normal(0, 3, 3).astype(np.float32)
        # measurement = true relative pose perturbed by `drift`
        Rm = Ri.T @ Rj
        tm = Ri.T @ (tj - ti)
        dR, dt = (np.asarray(x) for x in lie.se3_exp(
            jnp.asarray(rng.normal(0, drift, 6), jnp.float32)))
        Rm = Rm @ dR
        tm = tm + dt
        args = tuple(jnp.asarray(x[None], jnp.float32)
                     for x in (Ri, ti, Rj, tj, Rm, tm))
        r_cf, Ji_cf, Jj_cf = pg._linearize(*args)
        r_ad, Ji_ad, Jj_ad = pg._linearize_autodiff(*args)
        np.testing.assert_allclose(np.asarray(r_cf), np.asarray(r_ad), atol=1e-5)
        np.testing.assert_allclose(np.asarray(Ji_cf), np.asarray(Ji_ad),
                                   atol=5e-4, rtol=2e-3)
        np.testing.assert_allclose(np.asarray(Jj_cf), np.asarray(Jj_ad),
                                   atol=5e-4, rtol=2e-3)


def test_pad_graph_parity():
    """Shape-bucket padding must not change the solution for real nodes
    (padded nodes are identity with no incident edges)."""
    R_gt, t_gt, R_est, t_est = _noisy_chain(m=13, seed=7)
    odo = pg.odometry_edges(jnp.asarray(R_est), jnp.asarray(t_est))
    Rl = R_gt[0].T @ R_gt[-1]
    tl = R_gt[0].T @ (t_gt[-1] - t_gt[0])
    loop = pg.Se3Edges(
        i=jnp.array([0], jnp.int32), j=jnp.array([12], jnp.int32),
        R=jnp.asarray(Rl[None]), t=jnp.asarray(tl[None]),
        info=jnp.eye(6, dtype=jnp.float32)[None] * 1e4,
        is_loop=jnp.array([True]), valid=jnp.array([True]))
    edges = pg.concat_edges(odo, loop)
    R0, t0 = jnp.asarray(R_est), jnp.asarray(t_est)

    Ru, tu, inl_u = pg.optimize_two_phase(R0, t0, edges)
    Rp_, tp_, edges_p, m = pg.pad_graph(R0, t0, edges, bucket=16)
    assert Rp_.shape[0] == 16 and edges_p.i.shape[0] == 16
    Rp, tp, inl_p = pg.optimize_two_phase(Rp_, tp_, edges_p)
    np.testing.assert_allclose(np.asarray(tp)[:m], np.asarray(tu), atol=1e-4)
    np.testing.assert_allclose(np.asarray(Rp)[:m], np.asarray(Ru), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(inl_p)[: edges.i.shape[0]],
                                  np.asarray(inl_u))
    # padded nodes stay at identity
    np.testing.assert_allclose(np.asarray(Rp)[m:],
                               np.tile(np.eye(3, dtype=np.float32),
                                       (16 - m, 1, 1)), atol=1e-5)


def test_scan_context_topk_retrieval():
    """detect_loop_topk: lane 0 must equal the 1-best result, distances come
    back ascending, and lanes past the acceptable matches carry -1/False."""
    world = synthetic.make_world(num_points=30000, extent=60.0, seed=5)
    opts = sc.ScanContextOptions(exclude_recent=2, dist_threshold=0.45)
    db = sc.ScanContextDb(capacity=64, opts=opts)
    for k, (x, y) in enumerate([(-20.0, -20.0), (-18.0, -20.0), (0.0, 20.0),
                                (25.0, 5.0), (15.0, -25.0), (5.0, 5.0)]):
        db.add(synthetic.render_scan(
            world, np.eye(3, dtype=np.float32),
            np.array([x, y, 1.5], np.float32), max_range=50.0,
            max_points=4096, seed=k, capacity=4096))
    revisit = synthetic.render_scan(world, np.eye(3, dtype=np.float32),
                                    np.array([-20.0, -20.0, 1.5]),
                                    max_range=50.0, max_points=4096, seed=99,
                                    capacity=4096)
    one = db.query(revisit)
    topk = db.query_topk(revisit, 4)
    ids, dist, found = (np.asarray(topk.index), np.asarray(topk.distance),
                        np.asarray(topk.found))
    assert ids.shape == (4,)
    assert bool(found[0]) == bool(one.found)
    assert int(ids[0]) == int(one.index)
    assert float(dist[0]) == float(one.distance)
    fin = dist[np.isfinite(dist)]
    assert (np.diff(fin) >= 0).all()          # best first
    # both nearby scans (0 and 1) should appear among the found lanes
    got = set(ids[found].tolist())
    assert 0 in got and 1 in got, got
    assert (ids[~found] == -1).all()


def test_numpy_graph_builders_match_jnp():
    """The host-numpy graph builders (pose_graph.odometry_edges_np,
    pose_graph2d.build_graph_np) are hand-written twins of the jnp
    originals (kept to avoid the relay's per-shape eager-op compile tax,
    PROFILE §16) — pin them equal, per the repo's oracle convention."""
    import numpy as np
    from loc_lib_tpu.graph import pose_graph2d as pg2

    rng = np.random.default_rng(4)
    m = 9
    R = np.stack([np.asarray(lie.so3_exp(jnp.asarray(
        0.3 * rng.standard_normal(3), jnp.float32))) for _ in range(m)])
    t = rng.standard_normal((m, 3)).astype(np.float32)
    a = pg.odometry_edges(jnp.asarray(R), jnp.asarray(t))
    b = pg.odometry_edges_np(R, t)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)

    # SE(2): build_graph_np vs odometry_edges + concat_edges + manual pad
    theta = (0.4 * rng.standard_normal(7)).astype(np.float32)
    t2 = rng.standard_normal((7, 2)).astype(np.float32)
    loops = [(0, 5, 0.2, np.array([0.3, -0.1], np.float32), True),
             (1, 6, -0.1, np.array([-0.2, 0.4], np.float32), False)]
    th_p, t_p, edges_np, m_real = pg2.build_graph_np(theta, t2, loops)
    assert m_real == 7 and th_p.shape == (32,) and len(edges_np.i) == 64
    ref = pg2.odometry_edges(jnp.asarray(theta), jnp.asarray(t2))
    n_odo = 6
    for name, ours, theirs in (
            ("i", edges_np.i[:n_odo], ref.i), ("j", edges_np.j[:n_odo], ref.j),
            ("theta", edges_np.theta[:n_odo], ref.theta),
            ("t", edges_np.t[:n_odo], ref.t),
            ("info", edges_np.info[:n_odo], ref.info)):
        np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs),
                                   atol=1e-6, err_msg=name)
    # loop rows land after the odometry chain with their given payloads
    np.testing.assert_allclose(edges_np.theta[n_odo:n_odo + 2], [0.2, -0.1])
    assert edges_np.is_loop[n_odo:n_odo + 2].all()
    assert bool(edges_np.valid[n_odo]) and not bool(edges_np.valid[n_odo + 1])
    assert not edges_np.valid[n_odo + 2:].any()       # padding invalid
    # padded nodes are identity
    np.testing.assert_array_equal(th_p[7:], 0.0)

    # and the solves agree: numpy-built graph vs jnp-built graph
    all_e = pg2.concat_edges(ref, pg2.Se2Edges(
        i=jnp.asarray(edges_np.i[n_odo:n_odo + 2]),
        j=jnp.asarray(edges_np.j[n_odo:n_odo + 2]),
        theta=jnp.asarray(edges_np.theta[n_odo:n_odo + 2]),
        t=jnp.asarray(edges_np.t[n_odo:n_odo + 2]),
        info=jnp.asarray(edges_np.info[n_odo:n_odo + 2]),
        is_loop=jnp.ones((2,), bool),
        valid=jnp.asarray([True, False])))
    r_j = pg2.optimize(jnp.asarray(theta), jnp.asarray(t2), all_e)
    r_n = pg2.optimize(jnp.asarray(th_p), jnp.asarray(t_p), edges_np,
                       num_nodes=32)
    np.testing.assert_allclose(np.asarray(r_j.t), np.asarray(r_n.t)[:7],
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(r_j.theta),
                               np.asarray(r_n.theta)[:7], atol=2e-4)
