import numpy as np
import jax.numpy as jnp

from loc_lib_tpu.utils import mathx
import oracles


def _rand_neighbors(rng, k=5, planar=False, linear=False):
    if planar:
        n = rng.normal(size=3)
        n /= np.linalg.norm(n)
        basis = np.linalg.svd(np.outer(n, n))[0][:, 1:]
        pts = (rng.normal(size=(k, 2)) * 0.5) @ basis.T + rng.normal(size=3)
    elif linear:
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        pts = np.outer(rng.normal(size=k), d) * 0.5 + rng.normal(size=3)
    else:
        pts = rng.normal(size=(k, 3))
    return pts.astype(np.float32)


def test_fit_plane_matches_oracle():
    rng = np.random.default_rng(0)
    for _ in range(20):
        pts = _rand_neighbors(rng, planar=True)
        ours, ok = mathx.fit_plane(jnp.array(pts)[None], jnp.ones((1, 5), bool))
        ref, ref_ok = oracles.fit_plane(pts)
        assert bool(ok[0]) == ref_ok
        if ref_ok:
            a = np.array(ours[0], dtype=np.float64)
            # sign ambiguity: compare up to sign
            err = min(np.abs(a - ref).max(), np.abs(a + ref).max())
            assert err < 1e-3


def test_fit_plane_rejects_nonplanar():
    rng = np.random.default_rng(1)
    pts = _rand_neighbors(rng) * 3.0
    _, ok = mathx.fit_plane(jnp.array(pts)[None], jnp.ones((1, 5), bool))
    ref, ref_ok = oracles.fit_plane(pts)
    assert bool(ok[0]) == ref_ok


def test_fit_line_matches_oracle():
    rng = np.random.default_rng(2)
    for _ in range(20):
        pts = _rand_neighbors(rng, linear=True)
        o, d, ok = mathx.fit_line(jnp.array(pts)[None], jnp.ones((1, 5), bool), eps=0.5)
        ro, rd, rok = oracles.fit_line(pts, eps=0.5)
        assert bool(ok[0]) == rok
        if rok:
            dd = np.array(d[0], dtype=np.float64)
            err = min(np.abs(dd - rd).max(), np.abs(dd + rd).max())
            assert err < 1e-3
            np.testing.assert_allclose(np.array(o[0]), ro, atol=1e-5)


def test_masked_mean_cov_matches_oracle():
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    padded = np.concatenate([pts, np.full((6, 3), 1e6, np.float32)])
    mask = np.array([True] * 10 + [False] * 6)
    mean, cov, n = mathx.masked_mean_and_cov(jnp.array(padded)[None], jnp.array(mask)[None])
    rm, rc = oracles.mean_and_cov(pts)
    assert int(n[0]) == 10
    np.testing.assert_allclose(np.array(mean[0]), rm, atol=1e-5)
    np.testing.assert_allclose(np.array(cov[0]), rc, atol=1e-4)


def test_merge_gaussian_matches_oracle():
    rng = np.random.default_rng(4)
    a = rng.normal(size=(20, 3))
    b = rng.normal(size=(7, 3)) + 1.0
    ma, ca = oracles.mean_and_cov(a)
    mb, cb = oracles.mean_and_cov(b)
    ours_m, ours_c = mathx.merge_gaussian(
        jnp.float32(20), jnp.array(ma, dtype=jnp.float32), jnp.array(ca, dtype=jnp.float32),
        jnp.float32(7), jnp.array(mb, dtype=jnp.float32), jnp.array(cb, dtype=jnp.float32))
    rm, rc = oracles.merge_gaussian(20, ma, ca, 7, mb, cb)
    np.testing.assert_allclose(np.array(ours_m), rm, atol=1e-5)
    np.testing.assert_allclose(np.array(ours_c), rc, atol=1e-4)


def test_clamped_inverse_matches_ndt_info():
    rng = np.random.default_rng(5)
    # nearly-degenerate covariance (planar voxel)
    d = rng.normal(size=(30, 3))
    d[:, 2] *= 1e-5
    _, cov = oracles.mean_and_cov(d)
    info = mathx.clamped_inverse_3x3(jnp.array(cov, dtype=jnp.float32))
    ref = oracles.ndt_clamped_info(cov)
    np.testing.assert_allclose(np.array(info), ref, rtol=2e-2, atol=1e-3 * np.abs(ref).max())


def test_schur_marginalize():
    rng = np.random.default_rng(6)
    A = rng.normal(size=(9, 9))
    H = A @ A.T + np.eye(9)
    b = rng.normal(size=9)
    Hp, bp = mathx.schur_marginalize(jnp.array(H, dtype=jnp.float32), jnp.array(b, dtype=jnp.float32), 3)
    # oracle: eliminate x_a from the full solve; solution of reduced system
    # must equal the b-block of the full solution
    x_full = np.linalg.solve(H, b)
    x_b = np.linalg.solve(np.array(Hp, dtype=np.float64), np.array(bp, dtype=np.float64))
    np.testing.assert_allclose(x_b, x_full[3:], atol=1e-3)


def test_cholesky_3x3_roundtrip():
    import numpy as np
    import jax.numpy as jnp
    from loc_lib_tpu.utils import mathx
    rng = np.random.default_rng(3)
    B = rng.normal(size=(32, 3, 3)).astype(np.float32)
    A = B @ B.transpose(0, 2, 1) + 0.1 * np.eye(3, dtype=np.float32)
    packed = mathx.cholesky_3x3(jnp.asarray(A))
    L = np.asarray(mathx.cholesky_3x3_unpack(packed))
    np.testing.assert_allclose(L @ L.transpose(0, 2, 1), A, rtol=2e-3,
                               atol=2e-3)
    assert (np.asarray(packed)[:, [0, 2, 5]] > 0).all()  # diagonal positive
    # zero info (non-estimated voxel) stays exactly zero
    z = mathx.cholesky_3x3(jnp.zeros((1, 3, 3)))
    np.testing.assert_array_equal(np.asarray(z), 0.0)
