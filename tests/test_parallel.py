"""Distributed scan matching on the virtual 8-device CPU mesh: the sharded
GN must agree with the single-device solver (SURVEY.md section 4: multi-host
tests run on CPU via xla_force_host_platform_device_count)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from loc_lib_tpu.io import synthetic
from loc_lib_tpu.models import icp, ndt
from loc_lib_tpu.ops.pointcloud import from_numpy
from loc_lib_tpu.parallel import mesh as mesh_mod, match as pmatch
from loc_lib_tpu.utils import lie


WORLD = synthetic.make_world(num_points=20000, extent=60.0, seed=3)


def _pair(capacity=2048):
    traj = synthetic.make_trajectory(num_frames=2, dt=0.1, speed=2.0)
    tgt = synthetic.render_scan(WORLD, traj.R[0], traj.t[0], max_points=capacity,
                                noise=0.005, seed=0, capacity=capacity)
    src = synthetic.render_scan(WORLD, traj.R[1], traj.t[1], max_points=capacity,
                                noise=0.005, seed=1, capacity=capacity)
    # ground-truth relative pose: T_0^-1 * T_1
    R_rel = traj.R[0].T @ traj.R[1]
    t_rel = traj.R[0].T @ (traj.t[1] - traj.t[0])
    return tgt, src, R_rel, t_rel


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_icp_matches_single_device(n_dev):
    assert len(jax.devices()) >= n_dev
    m = mesh_mod.make_mesh(n_dev)
    tgt, src, R_gt, t_gt = _pair()
    opts = icp.IcpOptions(method="p2plane")
    target = icp.set_target(tgt, opts)
    eye, z = jnp.eye(3), jnp.zeros(3)

    ref = icp.scan_match(target, opts, src, eye, z)
    dist = pmatch.icp_scan_match(m, target, opts, src, eye, z)

    np.testing.assert_allclose(np.array(dist.t), np.array(ref.t), atol=1e-3)
    np.testing.assert_allclose(np.array(dist.R), np.array(ref.R), atol=1e-3)
    # and both near ground truth
    assert np.linalg.norm(np.array(dist.t) - t_gt) < 0.1
    assert int(dist.num_effective) > 100


def test_sharded_ndt_matches_single_device():
    m = mesh_mod.make_mesh(8)
    tgt, src, R_gt, t_gt = _pair()
    opts = ndt.NdtOptions(voxel_size=2.0, method="direct")
    nmap = ndt.build_direct(tgt, opts)
    eye, z = jnp.eye(3), jnp.zeros(3)

    ref = ndt.scan_match(nmap, opts, src, eye, z)
    dist = pmatch.ndt_scan_match(m, nmap, opts, src, eye, z)

    np.testing.assert_allclose(np.array(dist.t), np.array(ref.t), atol=1e-3)
    # direct NDT pulls toward coarse-voxel centroids (unweighted accumulation,
    # ndt_registration.cpp:425-433) — consistency above is the real check;
    # the ground-truth gate is loose.
    assert np.linalg.norm(np.array(dist.t) - t_gt) < 0.5
