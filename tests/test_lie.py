import numpy as np
import jax.numpy as jnp
import pytest

from loc_lib_tpu.utils import lie
import oracles


@pytest.mark.parametrize("seed", range(5))
def test_so3_exp_log_roundtrip(seed):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=3) * 1.5
    R = lie.so3_exp(jnp.array(w, dtype=jnp.float32))
    np.testing.assert_allclose(np.array(R), oracles.so3_exp(w), atol=1e-5)
    w_back = np.array(lie.so3_log(R))
    # log returns the principal value (|w| <= pi); for |w| > pi the raw
    # vector differs but must encode the same rotation.
    assert np.linalg.norm(w_back) <= np.pi + 1e-4
    if np.linalg.norm(w) <= np.pi:
        np.testing.assert_allclose(w_back, w, atol=1e-4)
    np.testing.assert_allclose(oracles.so3_exp(w_back), np.array(R), atol=1e-4)


def test_so3_exp_small_angle():
    w = jnp.array([1e-7, -2e-7, 3e-8])
    R = lie.so3_exp(w)
    np.testing.assert_allclose(np.array(R), np.eye(3) + oracles.hat(np.array(w)), atol=1e-7)


def test_so3_log_near_pi():
    w = np.array([0.0, 0.0, np.pi - 1e-3])
    R = oracles.so3_exp(w)
    w_back = np.array(lie.so3_log(jnp.array(R, dtype=jnp.float32)))
    np.testing.assert_allclose(w_back, w, atol=1e-3)


def test_se3_compose_inverse():
    rng = np.random.default_rng(1)
    Ra = oracles.so3_exp(rng.normal(size=3))
    ta = rng.normal(size=3)
    Ri, ti = lie.se3_inverse(jnp.array(Ra, dtype=jnp.float32), jnp.array(ta, dtype=jnp.float32))
    Rc, tc = lie.se3_compose(jnp.array(Ra, dtype=jnp.float32), jnp.array(ta, dtype=jnp.float32), Ri, ti)
    np.testing.assert_allclose(np.array(Rc), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.array(tc), np.zeros(3), atol=1e-6)


def test_se3_exp_log_roundtrip():
    xi = jnp.array([0.2, -0.1, 0.3, 1.0, 2.0, -0.5])
    R, t = lie.se3_exp(xi)
    np.testing.assert_allclose(np.array(lie.se3_log(R, t)), np.array(xi), atol=1e-4)


def test_retract_matches_reference_update():
    """pose.so3()*exp(dx[:3]); t += dx[3:] (icp_registration.cpp:288-289)."""
    rng = np.random.default_rng(2)
    R = oracles.so3_exp(rng.normal(size=3))
    t = rng.normal(size=3)
    dx = rng.normal(size=6) * 0.1
    R2, t2 = lie.se3_retract(jnp.array(R, dtype=jnp.float32), jnp.array(t, dtype=jnp.float32),
                             jnp.array(dx, dtype=jnp.float32))
    np.testing.assert_allclose(np.array(R2), R @ oracles.so3_exp(dx[:3]), atol=1e-5)
    np.testing.assert_allclose(np.array(t2), t + dx[3:], atol=1e-6)


def test_quat_roundtrip():
    rng = np.random.default_rng(3)
    for _ in range(10):
        R = oracles.so3_exp(rng.normal(size=3) * 2)
        q = lie.quat_from_rotm(jnp.array(R, dtype=jnp.float32))
        R2 = lie.rotm_from_quat(q)
        np.testing.assert_allclose(np.array(R2), R, atol=1e-5)


def test_se2_roundtrip():
    th = jnp.float32(0.7)
    t = jnp.array([1.0, -2.0])
    thi, ti = lie.se2_inverse(th, t)
    thc, tc = lie.se2_compose(th, t, thi, ti)
    assert abs(float(thc)) < 1e-6
    np.testing.assert_allclose(np.array(tc), 0, atol=1e-6)
