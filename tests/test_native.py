"""Native host runtime (cpp/loc_runtime.cpp via io/native.py) vs the numpy
oracles in io/replay.py. The C++ layer replaces the reference's subscriber +
measure-sync runtime (cloud_subscriber.cpp:7-157, measure_sync.cpp:42-181);
these tests pin its behavior to the pure-Python implementations."""

import numpy as np
import pytest

from loc_lib_tpu.io import native, replay


requires_native = pytest.mark.skipif(not native.available(),
                                     reason="no C++ toolchain")


def _random_imu(rng, m=300, t0=0.0, dt=0.01):
    stamps = t0 + np.arange(m) * dt + rng.uniform(-dt / 4, dt / 4, m)
    stamps = np.sort(stamps)
    return (stamps, rng.normal(0, 1, (m, 3)).astype(np.float32),
            rng.normal(0, 5, (m, 3)).astype(np.float32))


@requires_native
def test_sync_measures_matches_python_oracle():
    rng = np.random.default_rng(0)
    imu_stamps, gyro, acce = _random_imu(rng)
    scan_stamps = np.sort(rng.uniform(0.1, 2.8, 25)).astype(np.float64)
    cap = 32

    st, gy, ac, va = native.sync_measures_batch(scan_stamps, imu_stamps,
                                                gyro, acce, cap)
    imu = replay.ImuLog(imu_stamps, gyro, acce)
    for mg in replay.sync_measures(scan_stamps, imu, None, cap):
        k = mg.scan_index
        np.testing.assert_array_equal(va[k], mg.imu_valid)
        np.testing.assert_allclose(st[k], mg.imu_stamp, rtol=1e-6)
        np.testing.assert_allclose(gy[k], mg.imu_gyro, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(ac[k], mg.imu_acce, rtol=1e-5, atol=1e-5)


@requires_native
def test_sync_measures_edges():
    """Capacity overflow, scans before/after the IMU stream, exact-stamp
    hits — native and oracle must agree on every packet."""
    rng = np.random.default_rng(1)
    imu_stamps, gyro, acce = _random_imu(rng, m=120)
    # scan before stream start, on an exact imu stamp, after stream end
    scan_stamps = np.array([imu_stamps[0] - 0.5, imu_stamps[17],
                            imu_stamps[40] + 1e-5, imu_stamps[-1] + 1.0])
    cap = 8  # force overflow: >8 samples between some scans

    st, gy, ac, va = native.sync_measures_batch(scan_stamps, imu_stamps,
                                                gyro, acce, cap)
    imu = replay.ImuLog(imu_stamps, gyro, acce)
    for mg in replay.sync_measures(scan_stamps, imu, None, cap):
        k = mg.scan_index
        np.testing.assert_array_equal(va[k], mg.imu_valid, err_msg=f"frame {k}")
        np.testing.assert_allclose(st[k], mg.imu_stamp, rtol=1e-6)
        np.testing.assert_allclose(gy[k], mg.imu_gyro, rtol=1e-5, atol=1e-6)


@requires_native
def test_convert_cloud_matches_numpy():
    rng = np.random.default_rng(2)
    n = 2000
    xyz = rng.uniform(-50, 50, (n, 3)).astype(np.float32)
    xyz[rng.choice(n, 50, replace=False)] = np.nan        # dead returns
    tstamps = 100.0 + np.sort(rng.uniform(0, 0.1, n))
    ring = rng.integers(0, 16, n).astype(np.int32)

    got = native.convert_cloud(xyz, 4096, tstamps, ring,
                               min_range=4.0, max_range=60.0)
    want = native._convert_cloud_np(xyz, 4096, tstamps, ring, 4.0, 60.0, 1e6)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g, np.float64),
                                   np.asarray(w, np.float64),
                                   rtol=1e-6, atol=1e-6)
    # min-range cull actually removed something and count is consistent
    assert 0 < got[4] < n
    assert got[3].sum() == got[4]


@requires_native
def test_convert_cloud_capacity_truncates():
    rng = np.random.default_rng(3)
    xyz = rng.uniform(-10, 10, (500, 3)).astype(np.float32)
    out_xyz, rel, ring, mask, m = native.convert_cloud(xyz, 64, None, None)
    assert m == 64 and mask.sum() == 64
    assert np.isfinite(out_xyz[:64]).all()


@requires_native
def test_format_kitti_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    poses = np.tile(np.eye(4, dtype=np.float32), (7, 1, 1))
    poses[:, :3, 3] = rng.normal(0, 10, (7, 3))
    raw = native.format_kitti(poses)
    assert raw is not None
    rows = np.array([[float(v) for v in line.split()]
                     for line in raw.decode().strip().splitlines()])
    assert rows.shape == (7, 12)
    np.testing.assert_allclose(rows.reshape(7, 3, 4), poses[:, :3, :],
                               rtol=1e-6, atol=1e-6)


def test_python_fallback_paths():
    """The numpy fallbacks must work standalone (no toolchain needed)."""
    rng = np.random.default_rng(5)
    imu_stamps, gyro, acce = _random_imu(rng, m=50)
    scans = np.sort(rng.uniform(0.05, 0.4, 5))
    st, gy, ac, va = native._sync_measures_np(scans, imu_stamps, gyro, acce, 16)
    assert va.any()
    xyz = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
    out = native._convert_cloud_np(xyz, 128, None, None, 0.0, np.inf, 1e6)
    assert out[4] == 100 and out[3].sum() == 100
