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


def test_se3_jacobian_inverses_closed_form():
    """se3_jl_inv / se3_jr_inv (Barfoot Q block) pinned to autodiff of the
    group composition they claim to differentiate."""
    import jax

    rng = np.random.default_rng(3)
    for mag in (1e-6, 1e-3, 0.3, 1.5, 2.8):
        xi = jnp.asarray(rng.normal(0, 1, 6), jnp.float32)
        xi = xi / jnp.linalg.norm(xi[:3]) * mag if mag > 0 else xi
        # Jl^{-1}: d/de Log(Exp(e) Exp(xi)) at e = 0
        def f_left(e, xi=xi):
            Re, te = lie.se3_exp(e)
            Rx, tx = lie.se3_exp(xi)
            return lie.se3_log(*lie.se3_compose(Re, te, Rx, tx))
        J_ad = jax.jacfwd(f_left)(jnp.zeros(6, jnp.float32))
        J_cf = lie.se3_jl_inv(xi)
        np.testing.assert_allclose(np.asarray(J_cf), np.asarray(J_ad),
                                   atol=2e-4, rtol=1e-3)
        # Jr^{-1}: d/de Log(Exp(xi) Exp(e)) at e = 0
        def f_right(e, xi=xi):
            Re, te = lie.se3_exp(e)
            Rx, tx = lie.se3_exp(xi)
            return lie.se3_log(*lie.se3_compose(Rx, tx, Re, te))
        J_ad_r = jax.jacfwd(f_right)(jnp.zeros(6, jnp.float32))
        J_cf_r = lie.se3_jr_inv(xi)
        np.testing.assert_allclose(np.asarray(J_cf_r), np.asarray(J_ad_r),
                                   atol=2e-4, rtol=1e-3)


def test_se3_adjoint():
    """Ad(T) satisfies T Exp(xi) T^{-1} = Exp(Ad(T) xi)."""
    rng = np.random.default_rng(5)
    R = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(0, 0.8, 3), jnp.float32)))
    t = rng.normal(0, 2, 3).astype(np.float32)
    xi = jnp.asarray(rng.normal(0, 0.5, 6), jnp.float32)
    Rx, tx = lie.se3_exp(xi)
    lhs = lie.se3_compose(*lie.se3_compose(jnp.asarray(R), jnp.asarray(t), Rx, tx),
                          *lie.se3_inverse(jnp.asarray(R), jnp.asarray(t)))
    rhs = lie.se3_exp(lie.se3_adjoint(jnp.asarray(R), jnp.asarray(t)) @ xi)
    np.testing.assert_allclose(np.asarray(lhs[0]), np.asarray(rhs[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lhs[1]), np.asarray(rhs[1]), atol=1e-4)


def test_so3_renormalize_projects_back_to_so3():
    """Newton-Schulz projection: a rotation with a multiplicative defect of
    the size the odometry feedback loop actually produces (up to ~0.1,
    measured on the exploring-corridor divergence) must come back to an
    orthonormal matrix near the true rotation; exact rotations are fixed
    points. Batched input supported."""
    rng = np.random.default_rng(11)
    R = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(0, 0.7, 3),
                                           jnp.float32)))
    for eps in (1e-7, 1e-3, 0.05):
        Rp = (R + eps * rng.normal(0, 1, (3, 3))).astype(np.float32)
        Rn = np.asarray(lie.so3_renormalize(jnp.asarray(Rp)))
        np.testing.assert_allclose(Rn.T @ Rn, np.eye(3),
                                   atol=max(1e-6, 20 * eps ** 2))
        assert np.abs(Rn - R).max() < 5 * eps + 1e-6
    # exact rotation: fixed point to float32 roundoff
    Rn = np.asarray(lie.so3_renormalize(jnp.asarray(R)))
    np.testing.assert_allclose(Rn, R, atol=1e-6)
    # batched
    Rb = np.stack([R, np.eye(3, dtype=np.float32)])
    Rbn = np.asarray(lie.so3_renormalize(jnp.asarray(Rb)))
    assert Rbn.shape == (2, 3, 3)
    np.testing.assert_allclose(Rbn[1], np.eye(3), atol=1e-6)
