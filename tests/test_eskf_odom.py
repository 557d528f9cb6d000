"""Wheel-odometry data path: stillness gate, gated static init, ESKF wheel
speed observation, Odom/Velocity logs (VERDICT r1 missing #4 / next #8).
Reference analogs: common/odom.h:6-15, common/velocity_data.hpp:8-36,
static_imu_init.cpp:46-61, eskf.hpp:100/168-169."""
import numpy as np
import jax.numpy as jnp

from loc_lib_tpu.models import eskf
from loc_lib_tpu.io import replay


def test_odom_is_static_threshold():
    opts = eskf.ImuInitOptions()  # static_odom_pulse = 5
    assert bool(eskf.odom_is_static(jnp.float32(4), jnp.float32(4), opts))
    assert not bool(eskf.odom_is_static(jnp.float32(6), jnp.float32(4), opts))
    assert not bool(eskf.odom_is_static(jnp.float32(4), jnp.float32(6), opts))


def test_static_init_odom_gate_trailing_run():
    """Samples before the last movement must be discarded (the reference
    clears its init queue on movement, static_imu_init.cpp:13-18)."""
    rng = np.random.default_rng(0)
    n = 200
    acce = np.tile([0.0, 0.0, 9.81], (n, 1)).astype(np.float32)
    gyro = rng.normal(0, 1e-3, (n, 3)).astype(np.float32)
    # first half: vehicle moving with wildly corrupted gyro — would fail the
    # noise check if included
    gyro[: n // 2] += rng.normal(0, 2.0, (n // 2, 3))
    is_static = np.ones((n,), bool)
    is_static[: n // 2] = False
    valid = np.ones((n,), bool)

    gated = eskf.static_imu_init(jnp.asarray(gyro), jnp.asarray(acce),
                                 jnp.asarray(valid),
                                 is_static=jnp.asarray(is_static))
    assert bool(gated.success)
    ungated = eskf.static_imu_init(jnp.asarray(gyro), jnp.asarray(acce),
                                   jnp.asarray(valid))
    assert not bool(ungated.success)
    # a movement blip INSIDE the static tail also clears everything before it
    is_static2 = is_static.copy()
    is_static2[n - 20] = False
    gated2 = eskf.static_imu_init(jnp.asarray(gyro), jnp.asarray(acce),
                                  jnp.asarray(valid),
                                  is_static=jnp.asarray(is_static2))
    # only 19 samples remain -> success possible (>=10) but from the tail only
    assert bool(gated2.success)


def test_observe_wheel_speed_pulls_velocity():
    opts = eskf.EskfOptions()
    s = eskf.init_state()
    # nominal velocity wrongly says 2 m/s along +x; wheels report stationary
    s = s._replace(v=jnp.array([2.0, 0.0, 0.0], jnp.float32),
                   cov=jnp.eye(18, dtype=jnp.float32) * 1.0)
    s2 = eskf.observe_wheel_speed(s, jnp.float32(0.0), jnp.float32(0.0), opts)
    assert float(jnp.linalg.norm(s2.v)) < float(jnp.linalg.norm(s.v)) * 0.5

    # wheels report ~1.53 m/s forward: v should move toward that
    pulses = 1.0 / (opts.wheel_radius * 2 * np.pi / opts.circle_pulse
                    / opts.odom_span)  # pulses for 1 m/s
    s3 = eskf.observe_wheel_speed(s, jnp.float32(pulses), jnp.float32(pulses),
                                  opts)
    assert abs(float(s3.v[0]) - 1.0) < abs(float(s.v[0]) - 1.0)


def test_odom_log_sample_at_zero_order_hold():
    log = replay.OdomLog(stamps=np.array([0.0, 1.0, 2.0]),
                         left_pulse=np.array([10.0, 20.0, 30.0]),
                         right_pulse=np.array([11.0, 21.0, 31.0]))
    l, r = log.sample_at(np.array([-0.5, 0.0, 0.5, 1.0, 1.9, 5.0]))
    np.testing.assert_array_equal(l, [10, 10, 10, 20, 20, 30])
    np.testing.assert_array_equal(r, [11, 11, 11, 21, 21, 31])


def test_velocity_log_transform_and_ned2enu():
    log = replay.VelocityLog(
        stamps=np.array([0.0, 1.0]),
        linear=np.array([[1.0, 0, 0], [1.0, 0, 0]]),
        angular=np.array([[0, 0, 1.0], [0, 0, 1.0]]))
    # lerp
    v = log.sync_to(0.5)
    np.testing.assert_allclose(v, [1, 0, 0, 0, 0, 1], atol=1e-7)
    # lever arm: frame offset r=[0,1,0], identity rotation ->
    # v' = v + w x r = [1,0,0] + [0,0,1]x[0,1,0] = [1,0,0] + [-1,0,0] = 0
    T = np.eye(4); T[:3, 3] = [0, 1, 0]
    tr = log.transform_coordinate(T)
    np.testing.assert_allclose(tr.linear[0], [0, 0, 0], atol=1e-7)
    np.testing.assert_allclose(tr.angular[0], [0, 0, 1], atol=1e-7)
    # NED->ENU: x<->y, z negated
    enu = log.ned2enu()
    np.testing.assert_allclose(enu.linear[0], [0, 1, 0], atol=1e-7)
    np.testing.assert_allclose(enu.angular[0], [0, 0, -1], atol=1e-7)
