"""Distributed pose-graph optimization: edges sharded over the mesh.

BASELINE config #5 path: keyframe blocks live replicated (node states are
small — M x (3,3)+(3,)), the EDGE SET — the expensive part: linearization,
robust weighting, block outer products — is sharded across the "dp" axis,
and the global normal equations fuse with one psum of the block-diagonal
(M, 6, 6) + off-diagonal scatter per GN iteration. Every device then solves
the same reduced system (the Schur-complement-style reduction over
collectives SURVEY.md section 5 calls for; the reference's only solver is
single-threaded g2o, loop_closing.cpp:160-255).

Edge count must be padded to a multiple of the mesh size; pad with
valid=False rows (`pad_edges`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..graph import pose_graph as pg
from ..utils import lie


def pad_edges(edges: pg.Se3Edges, multiple: int) -> pg.Se3Edges:
    e = edges.i.shape[0]
    pad = (-e) % multiple
    if pad == 0:
        return edges
    z = lambda x: jnp.concatenate(
        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (pad, 3, 3))
    return pg.Se3Edges(
        i=z(edges.i), j=z(edges.j),
        R=jnp.concatenate([edges.R, eye]),
        t=z(edges.t), info=z(edges.info),
        is_loop=z(edges.is_loop), valid=z(edges.valid))


@functools.partial(jax.jit, static_argnames=("opts", "mesh"))
def optimize(mesh: Mesh, nodes_R, nodes_t, edges: pg.Se3Edges,
             opts: pg.PgoOptions = pg.PgoOptions()):
    """Distributed robust GN. Returns (R, t, per-edge chi2 at the optimum)."""
    m = nodes_R.shape[0]

    def kernel(R0, t0, e_i, e_j, e_R, e_t, e_info, e_valid):
        shard = pg.Se3Edges(i=e_i, j=e_j, R=e_R, t=e_t, info=e_info,
                            is_loop=jnp.zeros_like(e_valid), valid=e_valid)

        def gn_iter(carry, _):
            R, t = carry
            r, Ji, Jj = pg._linearize(R[shard.i], t[shard.i],
                                      R[shard.j], t[shard.j], shard.R, shard.t)
            chi2 = jnp.einsum("ei,eij,ej->e", r, shard.info, r)
            w = pg._robust_weight(opts, chi2) * shard.valid.astype(r.dtype)
            info_w = shard.info * w[:, None, None]

            Hii = jnp.einsum("eki,ekl,elj->eij", Ji, info_w, Ji)
            Hjj = jnp.einsum("eki,ekl,elj->eij", Jj, info_w, Jj)
            Hij = jnp.einsum("eki,ekl,elj->eij", Ji, info_w, Jj)
            bi = -jnp.einsum("eki,ekl,el->ei", Ji, info_w, r)
            bj = -jnp.einsum("eki,ekl,el->ei", Jj, info_w, r)

            # local block assembly, then ONE psum over the edge shards
            H = jnp.zeros((m, 6, m, 6), jnp.float32)
            idx = jnp.arange(m)
            Hd = jax.ops.segment_sum(Hii, shard.i, num_segments=m) + \
                jax.ops.segment_sum(Hjj, shard.j, num_segments=m)
            H = H.at[idx, :, idx, :].set(Hd)
            H = H.at[shard.i, :, shard.j, :].add(Hij * shard.valid[:, None, None])
            H = H.at[shard.j, :, shard.i, :].add(
                jnp.swapaxes(Hij, -1, -2) * shard.valid[:, None, None])
            b = jax.ops.segment_sum(bi, shard.i, num_segments=m) + \
                jax.ops.segment_sum(bj, shard.j, num_segments=m)

            H = jax.lax.psum(H, "dp")
            b = jax.lax.psum(b, "dp")

            H = H.at[idx, :, idx, :].add(opts.damping * jnp.eye(6, dtype=jnp.float32))
            H = H.at[0, :, 0, :].add(opts.gauge_weight * jnp.eye(6, dtype=jnp.float32))
            dx = jnp.linalg.solve(H.reshape(6 * m, 6 * m), b.reshape(6 * m))
            dx = jnp.where(jnp.isfinite(dx), dx, 0.0).reshape(m, 6)
            R2, t2 = jax.vmap(lie.se3_retract_full)(R, t, dx)
            return (R2, t2), jnp.sum(chi2 * shard.valid)

        (R, t), _ = jax.lax.scan(gn_iter, (R0, t0), None,
                                 length=opts.max_iterations)
        # final local chi2 -> concatenated back outside via all_gather
        r, _, _ = pg._linearize(R[shard.i], t[shard.i], R[shard.j], t[shard.j],
                                shard.R, shard.t)
        chi2 = jnp.einsum("ei,eij,ej->e", r, shard.info, r)
        return R, t, chi2

    n_dev = mesh.devices.size
    edges = pad_edges(edges, n_dev)
    return shard_map(
        kernel, mesh=mesh,
        in_specs=(P(), P(), P("dp"), P("dp"), P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=(P(), P(), P("dp")),
    )(nodes_R, nodes_t, edges.i, edges.j, edges.R, edges.t, edges.info,
      edges.valid)
