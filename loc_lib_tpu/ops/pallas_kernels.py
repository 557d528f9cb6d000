"""Pallas TPU kernels for the scan-matching hot path.

`p2plane_fused_terms` is the fused inner loop of voxel-plane ICP: one kernel
that, per source point, applies the pose, evaluates the precomputed plane
(residual), applies the accumulation gate, forms the 1x6 Jacobian, and folds
everything into the normal equations as a single (8, N) x (N, 8) MXU matmul

    A = [ J_rot(3) | n(3) | dis | 1 ] * w      (N, 8)
    G = A^T A                                   (8, 8)

so H = G[:6,:6], b = -G[:6,6], chi2 = G[6,6], n_eff = G[7,7] all come out of
one contraction. This is the TPU-native rendering of the reference's per-point
accumulation loop (/root/reference/LocUtils/src/model/matching/3d/icp/
icp_registration.cpp:161-213): instead of 8k sequential kd-tree probes +
plane fits per GN iteration, the geometry is baked into a per-voxel table at
set_target time (models/icp.py) and this kernel touches each point once with
zero intermediate HBM traffic.

Falls back to interpreter mode off-TPU so the CPU test mesh exercises the
same code path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 4096  # source points per grid step; N must be a multiple or is padded


def _p2plane_kernel(pose_ref, q_ref, plane_ref, w_ref, out_ref):
    """pose_ref: SMEM (1, 16) = [R row-major 0..8, t 9..11, gate 12].
    Points ride TRANSPOSED so per-component temporaries are (1, T) rows
    (lane-major; a (T, 1) layout pads every temp's lane dim to 128 and blows
    the 16 MB VMEM budget 128x over — measured, not theoretical).
    q_ref (3, T), plane_ref (4, T), w_ref (1, T) validity 0/1.
    out_ref (8, 128): G accumulated in [:, :8] across grid steps."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x, y, z = q_ref[0:1, :], q_ref[1:2, :], q_ref[2:3, :]   # (1, T)
    p = pose_ref
    # transformed point qs = R q + t
    qsx = p[0, 0] * x + p[0, 1] * y + p[0, 2] * z + p[0, 9]
    qsy = p[0, 3] * x + p[0, 4] * y + p[0, 5] * z + p[0, 10]
    qsz = p[0, 6] * x + p[0, 7] * y + p[0, 8] * z + p[0, 11]
    nx, ny, nz = plane_ref[0:1, :], plane_ref[1:2, :], plane_ref[2:3, :]
    d = plane_ref[3:4, :]
    dis = nx * qsx + ny * qsy + nz * qsz + d
    w = w_ref[:] * (jnp.abs(dis) <= p[0, 12]).astype(jnp.float32)
    # rn = R^T n;  J_rot = -(rn x q), J_t = n   (icp_registration.cpp:193-195)
    rnx = p[0, 0] * nx + p[0, 3] * ny + p[0, 6] * nz
    rny = p[0, 1] * nx + p[0, 4] * ny + p[0, 7] * nz
    rnz = p[0, 2] * nx + p[0, 5] * ny + p[0, 8] * nz
    j0 = -(rny * z - rnz * y)
    j1 = -(rnz * x - rnx * z)
    j2 = -(rnx * y - rny * x)
    A = jnp.concatenate(
        [j0, j1, j2, nx, ny, nz, dis, jnp.ones_like(dis)], axis=0) * w
    G = jax.lax.dot_general(                                  # (8, 8) on MXU
        A, A, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[:] += jnp.concatenate(
        [G, jnp.zeros((8, 120), jnp.float32)], axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def p2plane_fused_terms(q, plane, w, R, t, gate, interpret=False):
    """Fused voxel-plane P2Plane linearization.

    q (N, 3) source points, plane (N, 4) gathered per-point plane coeffs,
    w (N,) float32 0/1 validity, R (3,3), t (3,), gate scalar accumulation
    threshold (|n.qs+d| <= gate).
    Returns (H (6,6), b (6,), n_eff () int32, chi2 ()).
    """
    n = q.shape[0]
    pad = (-n) % _TILE
    if pad:
        q = jnp.concatenate([q, jnp.zeros((pad, 3), q.dtype)])
        plane = jnp.concatenate([plane, jnp.zeros((pad, 4), plane.dtype)])
        w = jnp.concatenate([w, jnp.zeros((pad,), w.dtype)])
    n_pad = n + pad
    pose = jnp.concatenate([
        jnp.reshape(R, (9,)).astype(jnp.float32),
        jnp.reshape(t, (3,)).astype(jnp.float32),
        jnp.reshape(jnp.asarray(gate, jnp.float32), (1,)),
        jnp.zeros((3,), jnp.float32),
    ]).reshape(1, 16)
    grid = n_pad // _TILE
    out = pl.pallas_call(
        _p2plane_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 16), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((3, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )(pose, q.astype(jnp.float32).T, plane.astype(jnp.float32).T,
      w.astype(jnp.float32).reshape(1, n_pad))
    G = out[:, :8]
    H = G[:6, :6]
    b = -G[:6, 6]
    chi2 = G[6, 6]
    n_eff = G[7, 7].astype(jnp.int32)
    return H, b, n_eff, chi2


_PICK_TILE = 2048


def _make_p2plane_pick_kernel(S: int):
    """p2plane kernel with the NEARBY-S candidate ELECTION fused in.

    Instead of XLA computing centroid distances, argmin-picking one plane
    row per point and handing the kernel a (N, 4) plane array
    (models/icp.py:_p2plane_vox_terms), the kernel receives all S gathered
    candidate rows [n(3), d, mu(3), valid] per point and performs the
    nearest-valid-centroid election itself with running min/select over
    (1, T) lanes — PROFILE.md lever 2: one fewer XLA gather +
    argmin/take_along_axis pass (and their HBM round trip) per GN
    iteration. Accumulation math identical to `_p2plane_kernel`.
    """

    def kernel(pose_ref, q_ref, rows_ref, w_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        x, y, z = q_ref[0:1, :], q_ref[1:2, :], q_ref[2:3, :]   # (1, T)
        p = pose_ref
        qsx = p[0, 0] * x + p[0, 1] * y + p[0, 2] * z + p[0, 9]
        qsy = p[0, 3] * x + p[0, 4] * y + p[0, 5] * z + p[0, 10]
        qsz = p[0, 6] * x + p[0, 7] * y + p[0, 8] * z + p[0, 11]
        inf = jnp.float32(jnp.inf)
        best_d2 = jnp.full_like(x, inf)
        best = [jnp.zeros_like(x) for _ in range(4)]            # n, d
        any_valid = jnp.zeros_like(x)
        for s in range(S):
            r = lambda k: rows_ref[8 * s + k:8 * s + k + 1, :]
            valid = r(7)                                        # 0/1
            dx_ = r(4) - qsx
            dy_ = r(5) - qsy
            dz_ = r(6) - qsz
            d2 = jnp.where(valid > 0.5,
                           dx_ * dx_ + dy_ * dy_ + dz_ * dz_, inf)
            take = d2 < best_d2
            best_d2 = jnp.where(take, d2, best_d2)
            best = [jnp.where(take, r(k), best[k]) for k in range(4)]
            any_valid = jnp.maximum(any_valid, valid)
        nx, ny, nz, d = best
        dis = nx * qsx + ny * qsy + nz * qsz + d
        w = w_ref[:] * any_valid * (jnp.abs(dis) <= p[0, 12]).astype(jnp.float32)
        rnx = p[0, 0] * nx + p[0, 3] * ny + p[0, 6] * nz
        rny = p[0, 1] * nx + p[0, 4] * ny + p[0, 7] * nz
        rnz = p[0, 2] * nx + p[0, 5] * ny + p[0, 8] * nz
        j0 = -(rny * z - rnz * y)
        j1 = -(rnz * x - rnx * z)
        j2 = -(rnx * y - rny * x)
        A = jnp.concatenate(
            [j0, j1, j2, nx, ny, nz, dis, jnp.ones_like(dis)], axis=0) * w
        G = jax.lax.dot_general(
            A, A, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[:] += jnp.concatenate(
            [G, jnp.zeros((8, 120), jnp.float32)], axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def p2plane_pick_fused_terms(q, rows, w, R, t, gate, interpret=False):
    """Fused election + linearization for voxel-plane P2Plane.

    q (N, 3) body points, rows (N, S, 8) gathered candidate voxel rows
    [n(3), d, mu(3), valid] (valid already ANDed with dense-lookup `found`),
    w (N,) float32 0/1 source mask, R (3,3), t (3,), gate accumulation
    threshold. Returns (H (6,6), b (6,), n_eff () int32, chi2 ()).
    """
    n, S, _ = rows.shape
    pad = (-n) % _PICK_TILE
    if pad:
        q = jnp.concatenate([q, jnp.zeros((pad, 3), q.dtype)])
        rows = jnp.concatenate([rows, jnp.zeros((pad, S, 8), rows.dtype)])
        w = jnp.concatenate([w, jnp.zeros((pad,), w.dtype)])
    n_pad = n + pad
    pose = jnp.concatenate([
        jnp.reshape(R, (9,)).astype(jnp.float32),
        jnp.reshape(t, (3,)).astype(jnp.float32),
        jnp.reshape(jnp.asarray(gate, jnp.float32), (1,)),
        jnp.zeros((3,), jnp.float32),
    ]).reshape(1, 16)
    T = _PICK_TILE
    grid = n_pad // T
    out = pl.pallas_call(
        _make_p2plane_pick_kernel(S),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 16), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((3, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * S, T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )(pose, q.astype(jnp.float32).T,
      rows.astype(jnp.float32).transpose(1, 2, 0).reshape(8 * S, n_pad),
      w.astype(jnp.float32).reshape(1, n_pad))
    G = out[:, :8]
    return G[:6, :6], -G[:6, 6], G[7, 7].astype(jnp.int32), G[6, 6]


_NDT_TILE = 2048


def _make_ndt_kernel(S: int, weighted: bool):
    """Fused generalized-Gaussian linearization over a static stencil of S
    voxels per point.

    The per-voxel information matrix rides as a pre-computed square-root
    factor W with info = W W^T (models/ndt.py packs chol(info); the P2Line
    voxel table packs the orthonormal perpendicular pair [v0 v1 0], which is
    EXACT for the rank-2 projector I - dd^T). Each (point, stencil) residual
    contributes rows

        weighted   a_i = w * [ (W^T J)_i(6) | (W^T e)_i | flag_i ]
        direct     a_i = w * [       J_i(6) |       e_i | flag_i ]

    with J = [-R hat(q) | I] (ndt_registration.cpp:330-332), the chi2 gate
    res = |W^T e|^2 = e^T info e <= th evaluated from the SAME z rows, and
    flag_0 = 1 counting residuals. G = sum a a^T on the MXU then yields
    H = G[:6,:6], b = -G[:6,6], chi2 = G[6,6], n_res = G[7,7] — the exact
    weighted/unweighted systems of AlignIncNdt/AlignNdt
    (cpp:344-347 / 425-433) with zero intermediate HBM traffic.
    """

    def kernel(pose_ref, q_ref, qs_ref, mu_ref, W_ref, valid_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        p = pose_ref
        th = p[0, 9]
        x, y, z = q_ref[0:1, :], q_ref[1:2, :], q_ref[2:3, :]
        qsx, qsy, qsz = qs_ref[0:1, :], qs_ref[1:2, :], qs_ref[2:3, :]
        R = [[p[0, 0], p[0, 1], p[0, 2]],
             [p[0, 3], p[0, 4], p[0, 5]],
             [p[0, 6], p[0, 7], p[0, 8]]]

        acc = jnp.zeros((8, 8), jnp.float32)
        for s in range(S):
            e = [qsx - mu_ref[3 * s + 0:3 * s + 1, :],
                 qsy - mu_ref[3 * s + 1:3 * s + 2, :],
                 qsz - mu_ref[3 * s + 2:3 * s + 3, :]]
            # W rows: fac[k*3+j] = W[k, j]
            W = [[W_ref[9 * s + k * 3 + j:9 * s + k * 3 + j + 1, :]
                  for j in range(3)] for k in range(3)]
            zr = [W[0][i_] * e[0] + W[1][i_] * e[1] + W[2][i_] * e[2]
                  for i_ in range(3)]                       # z = W^T e
            res = zr[0] * zr[0] + zr[1] * zr[1] + zr[2] * zr[2]
            w = valid_ref[s:s + 1, :] * (res <= th).astype(jnp.float32)
            one = jnp.ones_like(w)
            zero = jnp.zeros_like(w)
            if weighted:
                # M = W^T R (3x3 of (1,T) rows); B_rot = -M hat(q); B_t = W^T
                M = [[W[0][i_] * R[0][j] + W[1][i_] * R[1][j]
                      + W[2][i_] * R[2][j] for j in range(3)]
                     for i_ in range(3)]
                Bt = [[W[j][i_] for j in range(3)] for i_ in range(3)]
                zrow = zr
            else:
                M = R  # rows of J_rot come from -R hat(q) directly
                eye = [[one, zero, zero], [zero, one, zero], [zero, zero, one]]
                Bt = eye
                zrow = e
            for i_row in range(3):
                m0, m1, m2 = M[i_row][0], M[i_row][1], M[i_row][2]
                a = jnp.concatenate([
                    m2 * y - m1 * z,          # B_rot col 0
                    m0 * z - m2 * x,          # B_rot col 1
                    m1 * x - m0 * y,          # B_rot col 2
                    Bt[i_row][0], Bt[i_row][1], Bt[i_row][2],
                    zrow[i_row],
                    one if i_row == 0 else zero,
                ], axis=0) * w                # (8, T)
                acc = acc + jax.lax.dot_general(
                    a, a, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
        out_ref[:] += jnp.concatenate(
            [acc, jnp.zeros((8, 120), jnp.float32)], axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("weighted", "interpret"))
def ndt_fused_terms(q, qs, mu, W, valid, R, t, outlier_th, weighted,
                    interpret=False):
    """Fused generalized-Gaussian linearization.

    q (N, 3) body points, qs (N, 3) world points, mu (N, S, 3) gathered
    voxel means, W (N, S, 9) row-major square-root factors of the voxel
    info (info = W W^T), valid (N, S) float 0/1, R (3,3), outlier_th chi2
    gate. Returns (H (6,6), b (6,), n_res () int32, chi2 ()).
    """
    n, S = valid.shape
    pad = (-n) % _NDT_TILE
    if pad:
        zf = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
        q, qs, mu, W, valid = zf(q), zf(qs), zf(mu), zf(W), zf(valid)
    n_pad = n + pad
    pose = jnp.concatenate([
        jnp.reshape(R, (9,)).astype(jnp.float32),
        jnp.reshape(jnp.asarray(outlier_th, jnp.float32), (1,)),
        jnp.zeros((6,), jnp.float32),
    ]).reshape(1, 16)
    T = _NDT_TILE
    grid = n_pad // T
    out = pl.pallas_call(
        _make_ndt_kernel(S, weighted),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 16), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((3, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * S, T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * S, T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )(pose,
      q.astype(jnp.float32).T,
      qs.astype(jnp.float32).T,
      mu.astype(jnp.float32).transpose(1, 2, 0).reshape(3 * S, n_pad),
      W.astype(jnp.float32).transpose(1, 2, 0).reshape(9 * S, n_pad),
      valid.astype(jnp.float32).T)
    G = out[:, :8]
    H = G[:6, :6]
    b = -G[:6, 6]
    chi2 = G[6, 6]
    n_res = G[7, 7].astype(jnp.int32)
    return H, b, n_res, chi2


def on_tpu() -> bool:
    """True when the default backend is a real TPU (Pallas compiled mode);
    the CPU test mesh runs the same kernels under interpret=True."""
    return jax.default_backend() == "tpu"
