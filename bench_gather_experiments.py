"""Follow-up experiments for the batched-matcher gather bottleneck.

The round-5 trace (PROFILE.md) shows the batched fixed-20 program spends
61% in the dense-index lookup (random s32 gathers, ~4 KB tile read per
element) and 24% in the packed-row gather. Candidate fixes measured here
at B=64 / 8192-pt targets / 2048-pt sources / 20 iterations:

  A. baseline      p2plane_vox rows7 gather (917k elements/iter)
  B. sorted        same, with source points PRE-SORTED by spatial voxel
                   key (consecutive queries hit the same table tiles --
                   tests whether the gather engine coalesces)
  C. oct           p2plane_vox_oct gather path (1 lookup + 1 oct-table
                   gather + 1 row gather per point = ~7x fewer elements)
  D. full oct      scan_match_batch with method=p2plane_vox_oct
"""

from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

from loc_lib_tpu.io import synthetic
from loc_lib_tpu.models import icp
from loc_lib_tpu.ops import voxel
from loc_lib_tpu.ops.pointcloud import PointCloud

N_TGT, N_SRC, B = 8192, 2048, 64
REPEATS = 20

OPTS = icp.IcpOptions(method="p2plane_vox", max_iteration=20,
                      max_plane_distance=0.5, grid_leaf=2.0, bucket_size=8,
                      plane_min_pts=4, eps=0.0)
OPTS_OCT = dataclasses.replace(OPTS, method="p2plane_vox_oct")


def build(sort_sources: bool):
    world = synthetic.make_world(num_points=200000, extent=80.0, seed=7)
    traj = synthetic.make_trajectory(num_frames=B + 1, dt=0.1, speed=2.0)
    rng = np.random.default_rng(3)
    tgts, srcs, R0s, t0s = [], [], [], []
    for b in range(B):
        tgts.append(synthetic.render_scan(
            world, traj.R[b], traj.t[b], max_range=70.0, max_points=N_TGT,
            noise=0.01, seed=2 * b, capacity=N_TGT))
        s = synthetic.render_scan(
            world, traj.R[b + 1], traj.t[b + 1], max_range=70.0,
            max_points=N_SRC, noise=0.01, seed=2 * b + 1, capacity=N_SRC)
        if sort_sources:
            xyz = np.asarray(s.xyz)
            key = np.asarray(voxel.coords_to_key(
                jnp.asarray(np.floor(xyz / OPTS.grid_leaf).astype(np.int32)),
                s.mask))
            order = np.argsort(key, kind="stable")
            s = PointCloud(xyz=jnp.asarray(xyz[order]),
                           mask=jnp.asarray(np.asarray(s.mask)[order]))
        srcs.append(s)
        R0s.append(traj.R[b].T @ traj.R[b + 1])
        t0s.append(traj.R[b].T @ (traj.t[b + 1] - traj.t[b])
                   + rng.normal(0.0, 0.05, 3))
    stack = lambda xs: jax.tree_util.tree_map(lambda *a: jnp.stack(a), *xs)
    return (stack([PointCloud(xyz=t.xyz, mask=t.mask) for t in tgts]),
            stack(srcs),
            jnp.asarray(np.stack(R0s), jnp.float32),
            jnp.asarray(np.stack(t0s), jnp.float32))


@functools.partial(jax.jit, static_argnames=("n",))
def rows7_n(bt, bs, bR, bT, n=20):
    def body(i, acc):
        r = jax.vmap(lambda tg, s, R, t: icp._p2plane_vox_rows7(
            tg, OPTS, s, R, t + 1e-6 * i))(bt, bs, bR, bT)
        return acc + jnp.sum(r[..., 7])
    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))


@functools.partial(jax.jit, static_argnames=("n",))
def oct_terms_n(bt, bs, bR, bT, n=20):
    def body(i, acc):
        H, b, ne, chi2 = jax.vmap(
            lambda tg, s, R, t: icp._p2plane_vox_oct_terms(
                tg, OPTS_OCT, s, R, t + 1e-6 * i))(bt, bs, bR, bT)
        return acc + jnp.sum(b)
    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPEATS):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPEATS


def main():
    res = {}

    def emit(k, v):
        res[k] = v
        print(f"# {k} = {v}", flush=True)

    clouds, bs, bR, bT = build(sort_sources=False)
    bt = icp.set_target_batch(clouds, OPTS)
    jax.block_until_ready(bt)
    emit("A_rows7_base_ms", round(timed(lambda: rows7_n(bt, bs, bR, bT)) * 1e3, 2))
    emit("A_full_vox_ms", round(
        timed(lambda: icp.scan_match_batch(bt, OPTS, bs, bR, bT)) * 1e3, 2))
    del bt

    clouds_s, bs_s, bR_s, bT_s = build(sort_sources=True)
    bt_s = icp.set_target_batch(clouds_s, OPTS)
    jax.block_until_ready(bt_s)
    emit("B_rows7_sorted_ms", round(
        timed(lambda: rows7_n(bt_s, bs_s, bR_s, bT_s)) * 1e3, 2))
    emit("B_full_vox_sorted_ms", round(
        timed(lambda: icp.scan_match_batch(bt_s, OPTS, bs_s, bR_s, bT_s))
        * 1e3, 2))
    del bt_s

    bto = icp.set_target_batch(clouds, OPTS_OCT)
    jax.block_until_ready(bto)
    emit("C_oct_terms_ms", round(
        timed(lambda: oct_terms_n(bto, bs, bR, bT)) * 1e3, 2))
    emit("D_full_oct_ms", round(
        timed(lambda: icp.scan_match_batch(bto, OPTS_OCT, bs, bR, bT))
        * 1e3, 2))
    out = icp.scan_match_batch(bto, OPTS_OCT, bs, bR, bT)
    emit("D_finite", bool(np.isfinite(np.asarray(out.t)).all()))
    del bto, out

    # oct + sorted sources compose
    bto_s = icp.set_target_batch(clouds_s, OPTS_OCT)
    jax.block_until_ready(bto_s)
    emit("E_full_oct_sorted_ms", round(
        timed(lambda: icp.scan_match_batch(bto_s, OPTS_OCT, bs_s, bR_s,
                                           bT_s)) * 1e3, 2))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
