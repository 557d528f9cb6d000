"""Distributed scan matching: SPMD Gauss-Newton over a device mesh.

This is the TPU-native replacement for the intra-op parallelism the reference
never wrote (its NDT loop allocates per-residual arrays "for some concurrent
code" but runs sequentially, ndt_registration.cpp:280-347; the kd-tree's
GetClosestPointMT was declared and never implemented, kdtree.h:54).

Design (the scaling-book recipe): shard the SOURCE POINTS across the mesh's
"dp" axis, replicate the target search structure (hash grid / NDT voxel
table), and run the full GN `while_loop` inside `shard_map`. Each device
linearizes its point shard locally — transform, neighbor gather, local fit,
J/e assembly — and one 6x6/6-vector `psum` per iteration fuses the global
normal equations over ICI. Every device solves the identical 6x6 system, so
the iterate stays replicated with zero extra communication: the per-iteration
traffic is 42 floats, independent of cloud size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models import icp, ndt
from ..ops.pointcloud import PointCloud
from ..utils import lie, mathx


def _gn_loop(terms_fn, opts, R0, t0):
    """Replicated GN driver: terms_fn returns LOCAL (H, b, n_eff, chi2);
    psum fuses them, all devices take the same step."""

    def cond(state):
        it, R, t, done, _, _ = state
        return (it < opts.max_iteration) & (~done)

    def body(state):
        it, R, t, _, _, _ = state
        H, b, n_eff, chi2 = terms_fn(R, t)
        H = jax.lax.psum(H, "dp")
        b = jax.lax.psum(b, "dp")
        n_eff = jax.lax.psum(n_eff, "dp")
        chi2 = jax.lax.psum(chi2, "dp")
        ok = n_eff >= opts.min_effective_pts
        dx = jnp.where(ok, mathx.solve_gn_6x6(H, b), jnp.zeros(6, dtype=b.dtype))
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        R_new, t_new = lie.se3_retract(R, t, dx)
        converged = ok & (jnp.linalg.norm(dx) < opts.eps)
        return (it + 1, R_new, t_new, converged, n_eff, chi2)

    init = (jnp.int32(0), jnp.asarray(R0, jnp.float32), jnp.asarray(t0, jnp.float32),
            jnp.bool_(False), jnp.int32(0), jnp.float32(0.0))
    it, R, t, converged, n_eff, chi2 = jax.lax.while_loop(cond, body, init)
    return icp.MatchResult(R=lie.so3_renormalize(R), t=t, converged=converged, num_effective=n_eff,
                           iterations=it, chi2=chi2)


@functools.partial(jax.jit, static_argnames=("opts", "mesh"))
def icp_scan_match(mesh: Mesh, target: icp.IcpTarget, opts: icp.IcpOptions,
                   src: PointCloud, R0, t0) -> icp.MatchResult:
    """Distributed ICP: src points sharded over 'dp', target replicated."""
    terms = icp._TERM_FNS[opts.method]

    def kernel(grid_tree, xyz, mask, R0, t0):
        tgt = icp.IcpTarget(grid=grid_tree)
        shard = PointCloud(xyz=xyz, mask=mask)
        return _gn_loop(lambda R, t: terms(tgt, opts, shard, R, t), opts, R0, t0)

    n_target = jax.tree_util.tree_map(lambda _: P(), target.grid)
    return shard_map(
        kernel, mesh=mesh,
        in_specs=(n_target, P("dp"), P("dp"), P(), P()),
        out_specs=P(), check_vma=False,
    )(target.grid, src.xyz, src.mask, jnp.asarray(R0, jnp.float32),
      jnp.asarray(t0, jnp.float32))


@functools.partial(jax.jit, static_argnames=("opts", "mesh"))
def ndt_scan_match(mesh: Mesh, m: ndt.NdtMap, opts: ndt.NdtOptions,
                   src: PointCloud, R0, t0) -> icp.MatchResult:
    """Distributed NDT: same pattern, the voxel-Gaussian table replicated."""
    weighted = opts.method == "incremental"

    def kernel(map_tree, xyz, mask, R0, t0):
        shard = PointCloud(xyz=xyz, mask=mask)

        def terms(R, t):
            H, b, n_res, chi2 = ndt._ndt_terms(map_tree, opts, shard, R, t, weighted)
            # direct mode counts every source point as effective — reference
            # quirk replicated for parity with ndt.scan_match (cpp:434)
            n_eff = n_res if weighted else shard.count()
            return H, b, n_eff, chi2

        return _gn_loop(terms, opts, R0, t0)

    n_map = jax.tree_util.tree_map(lambda _: P(), m)
    return shard_map(
        kernel, mesh=mesh,
        in_specs=(n_map, P("dp"), P("dp"), P(), P()),
        out_specs=P(), check_vma=False,
    )(m, src.xyz, src.mask, jnp.asarray(R0, jnp.float32),
      jnp.asarray(t0, jnp.float32))
