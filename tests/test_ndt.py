"""NDT model: the fused Pallas path (dense lookup + Cholesky-packed rows)
must reproduce the jnp oracle path exactly, in both the weighted
(incremental, cpp:344-347) and unweighted (direct, cpp:425-433)
accumulation modes."""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from loc_lib_tpu.io import synthetic
from loc_lib_tpu.models import ndt
from loc_lib_tpu.ops.pointcloud import from_numpy
from loc_lib_tpu.utils import mathx


def _scene(capacity=2048):
    world = synthetic.make_world(num_points=20000, extent=40.0, seed=3)
    traj = synthetic.make_trajectory(num_frames=2, dt=0.1, speed=2.0)
    tgt = synthetic.render_scan(world, traj.R[0], traj.t[0],
                                max_points=capacity, noise=0.005, seed=0,
                                capacity=capacity)
    src = synthetic.render_scan(world, traj.R[1], traj.t[1],
                                max_points=capacity, noise=0.005, seed=1,
                                capacity=capacity)
    t_rel = traj.R[0].T @ (traj.t[1] - traj.t[0])
    return tgt, src, t_rel


def test_finalize_packs_cholesky_of_info():
    tgt, _, _ = _scene()
    opts = ndt.NdtOptions(voxel_size=2.0)
    m = ndt.build_direct(tgt, opts)
    est = np.asarray(m.estimated)
    W = np.asarray(m.packed)[:, 3:12].reshape(-1, 3, 3)
    info = np.asarray(m.info)
    np.testing.assert_allclose((W @ W.transpose(0, 2, 1))[est], info[est],
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(m.packed[:, 0:3]),
                               np.asarray(m.mean), atol=0)
    np.testing.assert_array_equal(np.asarray(m.packed[:, 12]) > 0.5, est)


@pytest.mark.parametrize("method", ["direct", "incremental"])
def test_fused_terms_match_oracle(method):
    tgt, src, _ = _scene()
    weighted = method == "incremental"
    opts_f = ndt.NdtOptions(voxel_size=2.0, method=method, use_fused=True)
    opts_o = dataclasses.replace(opts_f, use_fused=False)
    if weighted:
        m = ndt.update_incremental(ndt.empty_incremental(opts_f), tgt, opts_f)
    else:
        m = ndt.build_direct(tgt, opts_f)
    R = jnp.eye(3)
    t = jnp.array([0.05, -0.02, 0.01], jnp.float32)
    Hf, bf, nf, cf = ndt._ndt_terms(m, opts_f, src, R, t, weighted)
    Ho, bo, no, co = ndt._ndt_terms(m, opts_o, src, R, t, weighted)
    assert int(nf) == int(no)
    np.testing.assert_allclose(np.asarray(cf), np.asarray(co),
                               rtol=2e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(bf), np.asarray(bo),
                               rtol=2e-3, atol=2e-2 * max(1.0, float(jnp.max(jnp.abs(bo)))))
    np.testing.assert_allclose(np.asarray(Hf), np.asarray(Ho),
                               rtol=2e-3, atol=2e-2 * max(1.0, float(jnp.max(jnp.abs(Ho)))))


def test_fused_scan_match_recovers_pose():
    tgt, src, t_rel = _scene()
    opts = ndt.NdtOptions(voxel_size=2.0, method="incremental",
                          use_fused=True)
    m = ndt.update_incremental(ndt.empty_incremental(opts), tgt, opts)
    res = ndt.scan_match(m, opts, src, jnp.eye(3), jnp.zeros(3))
    assert np.linalg.norm(np.asarray(res.t) - t_rel) < 0.1
    assert int(res.num_effective) > 100


def test_fused_empty_map_is_inert():
    _, src, _ = _scene(512)
    opts = ndt.NdtOptions(method="incremental", map_capacity=1024,
                          use_fused=True)
    m = ndt.empty_incremental(opts)
    res = ndt.scan_match(m, opts, src, jnp.eye(3), jnp.zeros(3))
    assert np.isfinite(np.asarray(res.t)).all()
    np.testing.assert_array_equal(np.asarray(res.t), 0.0)


def test_rebuild_from_moments_merges_collisions_exactly():
    """ndt.rebuild_from_moments (round 5, the correction write-through
    primitive): an arbitrary row multiset with repeated keys must merge to
    the same Gaussians as building the map from the union of the points
    directly — count-weighted first/second moments are exact under any
    grouping."""
    import numpy as np
    from loc_lib_tpu.ops import voxel, pointcloud

    rng = np.random.default_rng(0)
    opts = ndt.NdtOptions(method="incremental", voxel_size=1.0,
                          map_capacity=512)
    pts = rng.uniform(-4, 4, (600, 3)).astype(np.float32)
    pc = pointcloud.from_numpy(pts, capacity=1024)
    ref = ndt.update_incremental(ndt.empty_incremental(opts), pc, opts)

    # split the same points ARBITRARILY into 3 groups, compute per-group
    # voxel stats, concatenate (keys repeat up to 3x) and rebuild
    ks, cs, ms, cvs = [], [], [], []
    for lo, hi in ((0, 150), (150, 400), (400, 600)):
        st = voxel.voxel_stats(pointcloud.from_numpy(pts[lo:hi],
                                                     capacity=1024),
                               opts.voxel_size, jnp.zeros(3),
                               mode=opts.bin_mode)
        ks.append(np.asarray(st.keys))
        cs.append(np.asarray(st.count))
        ms.append(np.asarray(st.mean))
        cvs.append(np.asarray(st.cov))
    keys = jnp.asarray(np.concatenate(ks))
    cnt = jnp.asarray(np.concatenate(cs))
    mean = jnp.asarray(np.concatenate(ms))
    cov = jnp.asarray(np.concatenate(cvs))
    est = jnp.zeros(keys.shape, bool)
    age = jnp.ones(keys.shape, jnp.int32)
    m2 = ndt.rebuild_from_moments(keys, cnt, mean, cov, est, age,
                                  jnp.int32(1), jnp.zeros(3), opts)

    ka = np.asarray(ref.keys)
    kb = np.asarray(m2.keys)
    live_a = ka != voxel.INVALID_KEY
    live_b = kb != voxel.INVALID_KEY
    assert set(ka[live_a]) == set(kb[live_b])
    # align rows by key and compare moments exactly (same fp32 merge tree
    # up to reassociation: loose-ish tolerance)
    ia = {int(k): i for i, k in enumerate(ka) if live_a[i]}
    for j, k in enumerate(kb):
        if not live_b[j]:
            continue
        i = ia[int(k)]
        np.testing.assert_allclose(np.asarray(ref.count)[i],
                                   np.asarray(m2.count)[j], rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ref.mean)[i],
                                   np.asarray(m2.mean)[j], atol=1e-4)
        np.testing.assert_allclose(np.asarray(ref.cov)[i],
                                   np.asarray(m2.cov)[j], atol=1e-4)
