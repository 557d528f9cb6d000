"""Batched geometry/statistics kernels.

TPU-native rewrite of the reference math kernel namespace `LocUtils::math`
(/root/reference/LocUtils/include/LocUtils/common/math_utils.h): masked
mean/covariance reductions (math_utils.h:36-72), Gaussian merge
(math_utils.h:88-98), plane fit (math_utils.h:113-136) and line fit
(math_utils.h:138-163) — but vectorized over an arbitrary batch of neighbor
sets instead of one `std::vector` at a time, with validity masks standing in
for the reference's early-return bools.

The 3x3/4x4 eigen-decompositions are closed-form-ish via `jnp.linalg.eigh`
(batched; XLA lowers small-batch eigh efficiently) so a whole scan's worth of
5-NN plane fits runs as a single fused batched op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

G_M_S2 = 9.81  # gravity magnitude used throughout the reference


def masked_mean(x: jax.Array, mask: jax.Array, axis=-2, eps: float = 1e-9):
    """Mean over `axis` counting only mask==True rows. mask: (...,N)."""
    m = mask[..., None].astype(x.dtype)
    n = jnp.sum(m, axis=axis)
    return jnp.sum(x * m, axis=axis) / jnp.maximum(n, eps), n[..., 0]


def masked_mean_and_cov(pts: jax.Array, mask: jax.Array):
    """Masked mean and (unbiased, /(n-1)) covariance of point sets.

    pts: (..., N, 3), mask: (..., N) -> mean (..., 3), cov (..., 3, 3), n (...).
    Matches math::ComputeMeanAndCov (math_utils.h:55-72) which divides by
    (len - 1).
    """
    mean, n = masked_mean(pts, mask)
    d = (pts - mean[..., None, :]) * mask[..., None].astype(pts.dtype)
    cov = jnp.einsum("...ni,...nj->...ij", d, d) / jnp.maximum(n - 1.0, 1.0)[..., None, None]
    return mean, cov, n


def masked_mean_and_cov_diag(x: jax.Array, mask: jax.Array):
    """Diagonal-covariance variant, math::ComputeMeanAndCovDiag
    (math_utils.h:36-47). x: (..., N, D)."""
    mean, n = masked_mean(x, mask)
    d = (x - mean[..., None, :]) * mask[..., None].astype(x.dtype)
    var = jnp.sum(d * d, axis=-2) / jnp.maximum(n - 1.0, 1.0)[..., None]
    return mean, var, n


def merge_gaussian(hist_n, hist_mean, hist_cov, cur_n, cur_mean, cur_cov):
    """Moment-matched merge of two Gaussians, math::UpdateMeanAndCov
    (math_utils.h:88-98). Used by incremental NDT voxel updates."""
    total = hist_n + cur_n
    new_mean = (hist_n[..., None] * hist_mean + cur_n[..., None] * cur_mean) / total[..., None]
    dh = hist_mean - new_mean
    dc = cur_mean - new_mean
    new_cov = (
        hist_n[..., None, None] * (hist_cov + dh[..., :, None] * dh[..., None, :])
        + cur_n[..., None, None] * (cur_cov + dc[..., :, None] * dc[..., None, :])
    ) / total[..., None, None]
    return new_mean, new_cov


def fit_plane(pts: jax.Array, mask: jax.Array, eps: float = 1e-2):
    """Batched plane fit: smallest right-singular vector of [x y z 1].

    pts: (..., K, 3), mask: (..., K) -> coeffs (..., 4) with ||coeffs||=1,
    valid (...,). Mirrors math::FitPlane (math_utils.h:113-136): the plane is
    the null direction of A = [p, 1]; validity requires >=3 points and
    per-point residual^2 <= eps for every (real) neighbor.
    """
    m = mask[..., None].astype(pts.dtype)
    A = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1) * m  # (...,K,4)
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    # Smallest eigenvector of AtA == smallest right singular vector of A.
    _, vecs = jnp.linalg.eigh(AtA)
    coeffs = vecs[..., :, 0]
    n = jnp.sum(mask, axis=-1)
    resid = jnp.einsum("...ki,...i->...k", A, coeffs)  # masked rows give 0
    ok = jnp.all(jnp.where(mask, resid * resid <= eps, True), axis=-1)
    valid = (n >= 3) & ok & jnp.isfinite(coeffs).all(axis=-1)
    return coeffs, valid


def fit_line(pts: jax.Array, mask: jax.Array, eps: float = 0.2):
    """Batched line fit: centroid + principal eigenvector of the scatter.

    pts: (..., K, 3), mask: (..., K) -> origin (..., 3), dir (..., 3) unit,
    valid (...,). Mirrors math::FitLine (math_utils.h:138-163); validity
    requires >=2 points and |dir x (p - origin)|^2 <= eps for every neighbor.
    """
    origin, n = masked_mean(pts, mask)
    d = (pts - origin[..., None, :]) * mask[..., None].astype(pts.dtype)
    S = jnp.einsum("...ki,...kj->...ij", d, d)
    _, vecs = jnp.linalg.eigh(S)
    direction = vecs[..., :, 2]  # largest eigenvalue
    cr = jnp.cross(jnp.broadcast_to(direction[..., None, :], d.shape), d)
    cr2 = jnp.sum(cr * cr, axis=-1)
    ok = jnp.all(jnp.where(mask, cr2 <= eps, True), axis=-1)
    valid = (n >= 2) & ok & jnp.isfinite(direction).all(axis=-1)
    return origin, direction, valid


def clamped_inverse_3x3(cov: jax.Array, rel_floor: float = 1e-3):
    """Information matrix from covariance with singular-value clamping.

    Mirrors the NDT voxel info computation (ndt_registration.cpp:116-131):
    SVD of sigma, clamp lambda[1], lambda[2] below lambda[0]*1e-3, invert.
    cov: (..., 3, 3) symmetric PSD -> info (..., 3, 3).
    """
    vals, vecs = jnp.linalg.eigh(cov)  # ascending
    lam0 = vals[..., 2:3]  # largest
    floor = lam0 * rel_floor
    clamped = jnp.maximum(vals, floor)
    inv = 1.0 / jnp.maximum(clamped, 1e-12)
    return jnp.einsum("...ij,...j,...kj->...ik", vecs, inv, vecs)


def regularized_inverse_3x3(cov: jax.Array, jitter: float = 1e-3):
    """info = (sigma + jitter*I)^-1, the incremental-NDT first-scan variant
    (ndt_registration.cpp:188-189)."""
    eye = jnp.eye(3, dtype=cov.dtype)
    return jnp.linalg.inv(cov + jitter * eye)


def solve_gn_6x6(H: jax.Array, b: jax.Array, damping: float = 0.0):
    """Solve H dx = b for the 6-DoF GN step.

    The reference inverts H directly (icp_registration.cpp:325). We solve the
    (slightly damped, for f32 robustness) system instead; with damping=0 this
    is numerically equivalent for well-conditioned H.
    """
    if damping:
        H = H + damping * jnp.eye(6, dtype=H.dtype)
    return jnp.linalg.solve(H, b)


def schur_marginalize(H: jax.Array, b: jax.Array, k: int):
    """Schur-complement marginalization of the first k states.

    Mirrors math::Marginalize (math_utils.h:613-686) semantics: returns the
    reduced (H', b') over the remaining block after eliminating block [0:k].
    H: (n, n), b: (n,).
    """
    Haa = H[:k, :k]
    Hab = H[:k, k:]
    Hba = H[k:, :k]
    Hbb = H[k:, k:]
    ba = b[:k]
    bb = b[k:]
    Haa_inv = jnp.linalg.inv(Haa + 1e-9 * jnp.eye(k, dtype=H.dtype))
    Hp = Hbb - Hba @ Haa_inv @ Hab
    bp = bb - Hba @ Haa_inv @ ba
    return Hp, bp
