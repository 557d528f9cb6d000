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
