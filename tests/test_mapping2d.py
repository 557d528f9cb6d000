"""2D stack tests: occupancy/likelihood-field kernels and the Mapping2D
pipeline (mirrors the reference's 2D path, mapping_2d.cpp + likelihood_filed
.cpp, verified on a synthetic room)."""
import numpy as np
import jax.numpy as jnp
import pytest

from loc_lib_tpu.models import grid2d
from loc_lib_tpu.pipeline import mapping2d
from loc_lib_tpu.io import synthetic


GOPTS = grid2d.Grid2dOptions(image_size=500, resolution=10.0, ray_steps=128,
                             max_beam_range=14.0)


def test_occupancy_and_field():
    """Endpoints must raise counts, traversed cells lower them, and the
    likelihood field must be 0 at occupied cells and grow with distance."""
    g = grid2d.empty_grid(GOPTS)
    pts = jnp.asarray([[5.0, 0.0], [0.0, 5.0]], jnp.float32)
    valid = jnp.ones((2,), bool)
    g = grid2d.add_scan(g, GOPTS, pts, valid, jnp.zeros(2))
    counts = np.asarray(g.counts)
    c = int(GOPTS.center)
    px = int(round(5.0 * GOPTS.resolution + GOPTS.center))
    assert counts[c, px] > GOPTS.unknown          # endpoint occupied
    assert counts[c, c + 10] < GOPTS.unknown      # ray cell freed
    field = np.asarray(grid2d.likelihood_field(g, GOPTS))
    assert field[c, px] == 0.0
    assert field[c, px - 5] == pytest.approx(5.0, abs=0.01)
    assert field[c, c] == GOPTS.field_radius      # far from any wall


def test_polar_carve_vs_sampled_oracle():
    """The production dense polar carve (add_scan) pinned against the
    reinstated per-beam sampled-ray ORACLE (add_scan_sampled, the direct
    analog of the reference's Bresenham walk, occupancy_map.cpp:175-215):

      * endpoint occupancy — the only input to the likelihood field, hence
        to all matching — must be IDENTICAL;
      * therefore the likelihood fields must be bit-identical;
      * neither rasterizer may free an occupied cell;
      * the freed regions must agree up to quantization at the wedge
        edges: the carve fills the wedge between sampled rays but trims a
        half-cell-diagonal margin at the endpoint arc, the sampler hits
        only ray cells but walks them right up to the endpoint — measured
        mutual coverage is ~95%/99%, asserted at >90% both ways.
    """
    world = synthetic.make_world_2d(seed=3)
    xy, valid = synthetic.render_scan_2d(world, 0.3, np.array([0.5, -0.4]),
                                         seed=5)
    g0 = grid2d.empty_grid(GOPTS)
    g_polar = grid2d.add_scan(g0, GOPTS, jnp.asarray(xy),
                              jnp.asarray(valid), jnp.zeros(2))
    g_samp = grid2d.add_scan_sampled(g0, GOPTS, jnp.asarray(xy),
                                     jnp.asarray(valid), jnp.zeros(2))
    cp, cs = np.asarray(g_polar.counts), np.asarray(g_samp.counts)
    occ_p, occ_s = cp > GOPTS.unknown, cs > GOPTS.unknown
    free_p, free_s = cp < GOPTS.unknown, cs < GOPTS.unknown
    np.testing.assert_array_equal(occ_p, occ_s)
    assert not np.any(occ_p & free_p) and not np.any(occ_s & free_s)
    fp = np.asarray(grid2d.likelihood_field(g_polar, GOPTS))
    fs = np.asarray(grid2d.likelihood_field(g_samp, GOPTS))
    np.testing.assert_array_equal(fp, fs)
    inter = np.sum(free_p & free_s)
    assert inter / max(free_s.sum(), 1) > 0.9, (
        f"sampled rays poorly covered by the carve: "
        f"{inter}/{free_s.sum()} polar={free_p.sum()}")
    assert inter / max(free_p.sum(), 1) > 0.9, (
        f"carve frees cells the sampler disowns: "
        f"{inter}/{free_p.sum()} sampled={free_s.sum()}")


def test_align_2d_recovers_offset():
    """SE(2) GN on the field must recover a known offset."""
    world = synthetic.make_world_2d(seed=1)
    xy, valid = synthetic.render_scan_2d(world, 0.0, np.zeros(2), seed=0)
    g = grid2d.empty_grid(GOPTS)
    g = grid2d.add_scan(g, GOPTS, jnp.asarray(xy), jnp.asarray(valid), jnp.zeros(2))
    field = grid2d.likelihood_field(g, GOPTS)

    true_th, true_t = 0.05, np.array([0.3, -0.2], np.float32)
    xy2, valid2 = synthetic.render_scan_2d(world, true_th, true_t, seed=7)
    res = grid2d.align_gauss_newton(field, GOPTS, jnp.asarray(xy2),
                                    jnp.asarray(valid2), 0.0, jnp.zeros(2))
    assert abs(float(res.theta) - true_th) < 0.02
    np.testing.assert_allclose(np.asarray(res.t), true_t, atol=0.08)
    assert float(res.inlier_ratio) > 0.5


def test_mapping2d_pipeline():
    """Short 2D SLAM run: drift must stay bounded and submaps must expand."""
    world = synthetic.make_world_2d(seed=2)
    opts = mapping2d.Mapping2dOptions(
        grid=GOPTS, keyframe_dist=0.2, max_keyframes_in_submap=6)
    m = mapping2d.Mapping2D(opts)

    n = 12
    rng = np.random.default_rng(0)
    for i in range(n):
        th_gt = 0.04 * i
        t_gt = np.array([0.25 * i, 0.1 * i], np.float32)
        xy, valid = synthetic.render_scan_2d(world, th_gt, t_gt, seed=i)
        th, t = m.process_scan(xy, valid)
        err = np.linalg.norm(t - t_gt)
        assert err < 0.25, f"frame {i}: {err:.3f} m 2D drift"
    assert m.frame_count == n


def test_se2_pcg_matches_dense():
    """The SE(2) PCG solve must agree with the dense oracle (same scheme as
    the SE(3) graph; pose_graph.py solve_pcg is block-size generic)."""
    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    from loc_lib_tpu.graph import pose_graph2d as pg2
    from loc_lib_tpu.graph.pose_graph import PgoOptions

    rng = np.random.default_rng(0)
    m = 30
    ang = np.linspace(0, 1.5 * np.pi, m).astype(np.float32)
    t_gt = np.stack([np.cos(ang) * 5, np.sin(ang) * 5], 1).astype(np.float32)
    th = (ang + rng.normal(0, 0.02, m)).astype(np.float32)
    t = (t_gt + rng.normal(0, 0.05, (m, 2))).astype(np.float32)
    edges = pg2.odometry_edges(jnp.asarray(ang), jnp.asarray(t_gt))
    opts_p = dataclasses.replace(PgoOptions(), max_iterations=10)
    opts_d = dataclasses.replace(opts_p, solver="dense")
    rp = pg2.optimize(jnp.asarray(th), jnp.asarray(t), edges, opts_p)
    rd = pg2.optimize(jnp.asarray(th), jnp.asarray(t), edges, opts_d)
    th_p, t_p, chi_p = rp.theta, rp.t, rp.chi2
    th_d, t_d, chi_d = rd.theta, rd.t, rd.chi2
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_d), atol=2e-3)
    np.testing.assert_allclose(np.asarray(th_p), np.asarray(th_d), atol=2e-3)


@pytest.mark.slow
def test_mapping2d_loop_closure_improves_accuracy():
    """Circular run with revisit: submaps expand (seeded from the previous
    submap, submap.cpp:14-23), loops are accepted (pair-deduped,
    loop_closing.cpp:66-69), and the closed trajectory beats pure odometry."""
    world = synthetic.make_world_2d(extent=10.0, seed=2)
    frames = 80
    scans, gt = [], []
    for k in range(frames):
        a = 2.0 * np.pi * k / frames
        t = np.array([4 * np.cos(a) - 4, 4 * np.sin(a)], np.float32)
        scans.append(synthetic.render_scan_2d(world, a, t, seed=k))
        gt.append(t)

    rmse = {}
    engines = {}
    for radius, tag in ((0.0, "noloop"), (15.0, "loops")):
        m = mapping2d.Mapping2D(mapping2d.Mapping2dOptions(
            max_keyframes_in_submap=16, loop_candidate_radius=radius))
        errs = [np.linalg.norm(m.process_scan(*scans[k])[1] - gt[k])
                for k in range(frames)]
        rmse[tag] = float(np.sqrt(np.mean(np.square(errs))))
        engines[tag] = m
    m = engines["loops"]
    assert len(m.submaps) > 2, len(m.submaps)
    assert sum(1 for l in m.loops if l.valid) > 0
    assert rmse["loops"] < 0.1, rmse
    assert rmse["loops"] <= rmse["noloop"] * 1.2, rmse


def test_pad_graph2d_parity():
    """SE(2) shape-bucket padding must not change the solution for real
    nodes (the twin of the SE(3) test in test_graph.py)."""
    from loc_lib_tpu.graph import pose_graph2d as pg2d
    rng = np.random.default_rng(4)
    m = 6
    th_gt = np.linspace(0, np.pi, m).astype(np.float32)
    t_gt = np.stack([np.cos(th_gt) * 4, np.sin(th_gt) * 4], 1).astype(np.float32)
    th = (th_gt + rng.normal(0, 0.03, m)).astype(np.float32)
    t = (t_gt + rng.normal(0, 0.1, (m, 2))).astype(np.float32)
    edges = pg2d.odometry_edges(jnp.asarray(th_gt), jnp.asarray(t_gt))
    thu, tu, inl_u = pg2d.optimize_two_phase(jnp.asarray(th), jnp.asarray(t),
                                             edges)
    thp_, tp_, edges_p, mm = pg2d.pad_graph(jnp.asarray(th), jnp.asarray(t),
                                            edges, bucket=8)
    assert thp_.shape[0] == 8 and edges_p.i.shape[0] == 8
    thp, tp, inl_p = pg2d.optimize_two_phase(thp_, tp_, edges_p)
    np.testing.assert_allclose(np.asarray(tp)[:mm], np.asarray(tu), atol=1e-4)
    np.testing.assert_allclose(np.asarray(thp)[:mm], np.asarray(thu), atol=1e-4)


def test_viz_renderers_geometry(tmp_path):
    """io/viz.py unit geometry: PNG roundtrippable magic + sizes; occupancy
    stitching places a submap's occupied cell at the right world pixel;
    the top-down map renderer darkens cells where points fall."""
    import os
    from loc_lib_tpu.io import viz

    # occupancy: one submap at t_ws=(2, 1), occupied cell at submap center
    # -> world (2, 1)
    n, res = 100, 10.0
    counts = np.full((n, n), 127, np.int64)
    counts[50, 50] = 137                      # occupied at submap origin
    counts[50, 60] = 117                      # free 1 m +x of origin
    img = viz.render_occupancy_global([(counts, 0.0, np.array([2.0, 1.0]))],
                                      resolution=res, unknown=127)
    h, w = img.shape[:2]
    # world->px per the renderer's bound: lo = t_ws - (n/2/res)*sqrt(2)
    half = n / 2.0 / res * np.sqrt(2.0)
    lo = np.array([2.0, 1.0]) - half
    col = lambda x: int(np.round((x - lo[0]) * res - 0.5))
    row = lambda y: (h - 1) - int(np.round((y - lo[1]) * res - 0.5))
    occ_px = img[row(1.0), col(2.0)]          # occupied at world (2, 1)
    free_px = img[row(1.0), col(3.0)]         # free 1 m +x of it
    assert occ_px[0] < 100                    # occupied renders dark
    assert free_px[0] > 200                   # free renders light
    assert img[2, 2][0] == 200                # unknown mid-gray

    # rotated submap: occupied cell at submap (1, 0) with theta_ws=+90 deg
    # must land at world t_ws + (0, 1) — and must not be cropped (the
    # bounds use the rotated corner extent)
    c90 = np.full((n, n), 127, np.int64)
    c90[50, 60] = 137
    img90 = viz.render_occupancy_global(
        [(c90, np.pi / 2, np.array([2.0, 1.0]))], resolution=res,
        unknown=127)
    h90 = img90.shape[0]
    assert img90[row(2.0) + (h90 - h), col(2.0)][0] < 100

    # top-down: points on a line darken their cells; trajectory draws red
    pts = np.stack([np.linspace(0, 10, 50), np.zeros(50), np.zeros(50)], 1)
    traj = np.stack([np.linspace(0, 10, 8), np.full(8, 2.0), np.zeros(8)], 1)
    img3 = viz.render_map_topdown(pts, traj_t=traj, image_size=256)
    assert img3.shape == (256, 256, 3)
    reds = (img3[:, :, 0].astype(int) - img3[:, :, 2].astype(int)) > 100
    assert reds.sum() > 50                    # trajectory visible
    p = str(tmp_path / "x.png")
    viz.write_png(p, img3)
    with open(p, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"
    assert os.path.getsize(p) > 500


def test_mapping2d_app_artifacts(tmp_path):
    """run_mapping2d end-to-end on a tiny log: report + TUM trajectory +
    submaps.npz + the stitched occupancy PNG land in out_dir."""
    import os
    from loc_lib_tpu.apps.mapping2d import run_mapping2d

    world = synthetic.make_world_2d(seed=2)
    frames = 8
    xy = np.zeros((frames, 720, 2), np.float32)
    valid = np.zeros((frames, 720), bool)
    for k in range(frames):
        th, t = 0.04 * k, np.array([0.25 * k, 0.0], np.float32)
        xy[k], valid[k] = synthetic.render_scan_2d(world, th, t, seed=k)
    opts = mapping2d.Mapping2dOptions(grid=GOPTS, keyframe_dist=0.2,
                                      max_keyframes_in_submap=6)
    out = str(tmp_path / "out2d")
    report = run_mapping2d(xy, valid, np.arange(frames, dtype=np.float64),
                           opts, out, warm_start=False)
    assert report["frames"] == frames
    for f in ("trajectory_tum.txt", "submaps.npz", "report.json",
              "occupancy_global.png"):
        assert os.path.exists(os.path.join(out, f)), f
    png = os.path.join(out, "occupancy_global.png")
    with open(png, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"
    assert os.path.getsize(png) > 2000


@pytest.mark.slow
def test_mapping2d_device_matches_host_driven():
    """The device-resident 2D pipeline (pipeline/mapping2d_device.py: one
    jitted step per scan, submap raster+field under lax.cond) must track
    the host-driven Mapping2D through expansions AND loop closures
    (VERDICT r3 next #1 parity requirement)."""
    from loc_lib_tpu.pipeline import mapping2d_device as m2dd

    world = synthetic.make_world_2d(extent=10.0, seed=2)
    frames = 48
    scans, gt = [], []
    for k in range(frames):
        a = 2.0 * np.pi * k / frames
        t = np.array([4 * np.cos(a) - 4, 4 * np.sin(a)], np.float32)
        scans.append(synthetic.render_scan_2d(world, a, t, seed=k))
        gt.append(t)

    opts = mapping2d.Mapping2dOptions(max_keyframes_in_submap=16)
    host = mapping2d.Mapping2D(opts)
    # warm_start=False: the warm thread's background XLA:CPU compiles
    # race the main thread's and segfault deep in the compilation-cache
    # read when the suite has a long compile history (jax XLA:CPU
    # concurrency fragility; the TPU relay path the warm exists for has
    # never shown it). Tests exercise the warmed programs anyway -- just
    # compiled on the main thread.
    dev = m2dd.Mapping2DDevice(opts, warm_start=False)
    for k in range(frames):
        host.process_scan(*scans[k])
        dev.process_scan(*scans[k])

    ph = np.stack([t for _, t in host.frame_poses])
    pd = np.stack([t for _, t in dev.frame_poses])
    # same float32 math modulo host-float64 round points: tight parity
    assert np.linalg.norm(ph - pd, axis=1).max() < 0.02
    assert len(dev.submaps) == len(host.submaps)
    assert abs(sum(1 for l in dev.loops if l.valid)
               - sum(1 for l in host.loops if l.valid)) <= 1
    # and the device engine tracks ground truth
    err = [np.linalg.norm(pd[k] - gt[k]) for k in range(frames)]
    assert float(np.sqrt(np.mean(np.square(err)))) < 0.08
    # exported stitched map covers every submap incl. the device-resident one
    assert len(dev.global_occupancy()) == len(dev.submaps)


@pytest.mark.slow
def test_mapping2d_device_spilled_archives_still_close_loops():
    """With archived_device_submaps=1, every archive beyond the newest
    spills its grid/field to host numpy (the HBM cap) — loop candidates
    matched against SPILLED submaps must still re-register and close."""
    from loc_lib_tpu.pipeline import mapping2d_device as m2dd

    world = synthetic.make_world_2d(extent=10.0, seed=2)
    frames = 64
    opts = mapping2d.Mapping2dOptions(max_keyframes_in_submap=16,
                                      archived_device_submaps=1)
    eng = m2dd.Mapping2DDevice(opts, warm_start=False)
    errs = []
    for k in range(frames):
        a = 2.0 * np.pi * k / frames
        t = np.array([4 * np.cos(a) - 4, 4 * np.sin(a)], np.float32)
        xy, valid = synthetic.render_scan_2d(world, a, t, seed=k)
        th, est = eng.process_scan(xy, valid)
        errs.append(np.linalg.norm(est - t))
    # archives actually spilled (numpy fields beyond the newest)
    spilled = [s for s in eng.submaps[:-1]
               if isinstance(s.field, np.ndarray)]
    assert len(spilled) >= 2, [type(s.field) for s in eng.submaps]
    assert sum(1 for l in eng.loops if l.valid) >= 1
    assert float(np.sqrt(np.mean(np.square(errs)))) < 0.1


def test_align_lm_recovers_where_gn_loses():
    """grid2d.align_lm (VERDICT r4 missing #2): the LM-damped Huber
    variant of the field aligner — the analog of the reference's g2o-LM
    path (likelihood_filed.cpp:146-201). On a SPARSE outlier-laden scan
    (16 beams, 6 gross outliers, 0.32 m init error) the plain GN step
    overshoots off the Huber-weighted landscape and stops 13 cm off;
    LM's accept/reject damping recovers to 2 cm. On nominal dense scans
    the two match (parity clause)."""
    gopts = grid2d.Grid2dOptions()
    world = synthetic.make_world_2d(extent=10.0, seed=2)
    xy, valid = synthetic.render_scan_2d(world, 0.0, np.zeros(2, np.float32),
                                         seed=0)
    g = grid2d.add_scan(grid2d.empty_grid(gopts), gopts, jnp.asarray(xy),
                        jnp.asarray(valid), jnp.zeros(2))
    field = grid2d.likelihood_field(g, gopts)

    # nominal parity: dense scan, small init error
    xy2, v2 = synthetic.render_scan_2d(world, 0.05,
                                       np.array([0.15, -0.1], np.float32),
                                       seed=3)
    outs = {}
    for m in ("gn", "lm"):
        ao = grid2d.Align2dOptions(method=m, max_iterations=30)
        r = grid2d.align_gauss_newton(field, gopts, jnp.asarray(xy2),
                                      jnp.asarray(v2), jnp.float32(0.0),
                                      jnp.zeros(2), ao)
        outs[m] = np.asarray(r.t)
        assert np.linalg.norm(outs[m] - [0.15, -0.1]) < 0.02
    # the robustness case: sparse + outliers + moderate init offset
    init = np.array([0.25, 0.2], np.float32)
    rng = np.random.default_rng(12)
    xys, vs = synthetic.render_scan_2d(world, 0.0, np.zeros(2, np.float32),
                                       seed=7)
    sel = rng.choice(np.where(vs)[0], 16, replace=False)
    pts = xys[sel].copy()
    pts[:6] = rng.uniform(-8, 8, (6, 2))
    obs = (pts - init).astype(np.float32)
    errs = {}
    for m in ("gn", "lm"):
        ao = grid2d.Align2dOptions(method=m, max_iterations=30,
                                   min_effective=5)
        r = grid2d.align_gauss_newton(field, gopts, jnp.asarray(obs),
                                      jnp.ones(16, bool), jnp.float32(0.0),
                                      jnp.zeros(2), ao)
        errs[m] = float(np.linalg.norm(np.asarray(r.t) - init))
    assert errs["gn"] > 0.1, errs    # GN demonstrably loses here
    assert errs["lm"] < 0.05, errs   # LM recovers


def test_multires_lm_fallback_runs_and_stays_consistent():
    """Mapping2dOptions.lm_fallback: a failed GN multires acceptance
    retries the pyramid with method='lm'; a PASSING GN candidate never
    triggers the retry (same result either way)."""
    opts = mapping2d.Mapping2dOptions()
    assert opts.lm_fallback
    eng = mapping2d.Mapping2D(opts)
    world = synthetic.make_world_2d(extent=10.0, seed=2)
    xy, valid = synthetic.render_scan_2d(world, 0.0, np.zeros(2, np.float32),
                                         seed=0)
    eng.process_scan(xy, valid)
    sm = eng.submaps[-1]
    # good init: GN accepts, no fallback consulted
    res, ok = sm.match_multires(xy, valid, 0.02, np.array([0.05, 0.02]))
    assert ok
    # garbage scan: both GN and the LM retry must REJECT (acceptance
    # correctness of the fallback path — it must not rescue junk)
    rng = np.random.default_rng(0)
    junk = rng.uniform(-12, 12, xy.shape).astype(np.float32)
    res2, ok2 = sm.match_multires(junk, valid, 0.0, np.zeros(2))
    assert not ok2


@pytest.mark.slow
def test_mapping2d_device_pipelined_is_exact():
    """Lag-1 pipelined mode (round 5): dispatch scan k, then pull/handle
    scan k-1 — hides the per-scan result pull behind device compute. Must
    be EXACT: whenever handling k-1 mutates the device state (expansion /
    loop write-back), the in-flight scan k is replayed, so the pose
    trajectory equals sequential mode bit-for-bit; the workload forces
    both event kinds (replays observable)."""
    from loc_lib_tpu.pipeline import mapping2d_device as m2dd

    world = synthetic.make_world_2d(extent=10.0, seed=2)
    frames = 48
    scans = []
    for k in range(frames):
        a = 2.0 * np.pi * k / frames
        t = np.array([4 * np.cos(a) - 4, 4 * np.sin(a)], np.float32)
        scans.append(synthetic.render_scan_2d(world, a, t, seed=k))

    opts = mapping2d.Mapping2dOptions(max_keyframes_in_submap=16)
    seq = m2dd.Mapping2DDevice(opts, warm_start=False)
    pip = m2dd.Mapping2DDevice(opts, warm_start=False, pipelined=True)
    for k in range(frames):
        seq.process_scan(*scans[k])
        pip.process_scan(*scans[k])
    pip.flush()

    ps = np.stack([t for _, t in seq.frame_poses])
    pp = np.stack([t for _, t in pip.frame_poses])
    assert ps.shape == pp.shape
    np.testing.assert_array_equal(ps, pp)       # bit-exact chain
    assert len(pip.submaps) == len(seq.submaps)
    assert [l.valid for l in pip.loops] == [l.valid for l in seq.loops]
    # the workload actually exercised the replay path
    assert pip.replays >= 2, pip.replays
