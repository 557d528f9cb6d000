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


def on_tpu() -> bool:
    """True when the default backend is a real TPU (Pallas compiled mode);
    the CPU test mesh runs the same kernels under interpret=True."""
    return jax.default_backend() == "tpu"
