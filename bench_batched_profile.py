"""Op-level attribution of the batched fixed-iteration matcher (VERDICT r4
next #1): where do the ~6.4 ms per lane-iteration actually go?

Round 4 measured the batched fixed-20 sweep FLAT (per-lane cost identical
at B=1 and B=64) at an estimated ~0.01% MFU and <1% HBM bandwidth — i.e.
the ceiling is serialization somewhere in the program, not the hardware.
This script decomposes one batched iteration into its three stages and
times each in isolation at B = 1 / 16 / 64 on the real chip:

  rows7   the XLA-side election gather (7-key dense lookup + (N,7,8)
          packed-row gather), `icp._p2plane_vox_rows7`
  kernel  the fused in-kernel election + linearization Pallas call
          (`pallas_kernels.p2plane_pick_fused_terms`), fed precomputed rows
  solve   6x6 solve + retract
  terms   rows7 + kernel together (the real per-iteration body)
  full    `icp.scan_match_batch` at fixed 20 iterations (the bench row)

plus a `jax.profiler` device trace of the B=64 program when the axon
backend supports tracing (written to /tmp/jxtrace_b64; parsed op table
appended to the JSON when readable).

Each timed program is dispatched with a sync after the group (tunneled
device: async queues degrade ~40x, CLAUDE.md). Output: one JSON blob on
stdout -> paste into PROFILE.md.
"""

from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

import functools

import jax.numpy as jnp
import numpy as np

from loc_lib_tpu.io import synthetic
from loc_lib_tpu.models import icp
from loc_lib_tpu.ops import pallas_kernels
from loc_lib_tpu.ops.pointcloud import PointCloud
from loc_lib_tpu.utils import lie, mathx

N_TGT, N_SRC = 8192, 2048
B_MAX = 64
REPEATS = 30


def build_lanes():
    world = synthetic.make_world(num_points=200000, extent=80.0, seed=7)
    traj = synthetic.make_trajectory(num_frames=B_MAX + 1, dt=0.1, speed=2.0)
    rng = np.random.default_rng(3)
    tgts, srcs, R0s, t0s = [], [], [], []
    for b in range(B_MAX):
        tgts.append(synthetic.render_scan(
            world, traj.R[b], traj.t[b], max_range=70.0, max_points=N_TGT,
            noise=0.01, seed=2 * b, capacity=N_TGT))
        srcs.append(synthetic.render_scan(
            world, traj.R[b + 1], traj.t[b + 1], max_range=70.0,
            max_points=N_SRC, noise=0.01, seed=2 * b + 1, capacity=N_SRC))
        R0s.append(traj.R[b].T @ traj.R[b + 1])
        t0s.append(traj.R[b].T @ (traj.t[b + 1] - traj.t[b])
                   + rng.normal(0.0, 0.05, 3))
    stack = lambda xs: jax.tree_util.tree_map(lambda *a: jnp.stack(a), *xs)
    bt = icp.set_target_batch(
        stack([PointCloud(xyz=t.xyz, mask=t.mask) for t in tgts]), OPTS)
    return (bt,
            stack([PointCloud(xyz=s.xyz, mask=s.mask) for s in srcs]),
            jnp.asarray(np.stack(R0s), jnp.float32),
            jnp.asarray(np.stack(t0s), jnp.float32))


# the bench's fixed-iteration loop-registration configuration
OPTS = icp.IcpOptions(method="p2plane_vox", max_iteration=20,
                      max_plane_distance=0.5, grid_leaf=2.0, bucket_size=8,
                      plane_min_pts=4, eps=0.0)


@functools.partial(jax.jit, static_argnames=("n",))
def rows7_n(bt, bs, bR, bT, n=20):
    """n iterations of ONLY the election gather (pose fixed; result summed
    to defeat DCE — each iteration adds a pose jitter so XLA cannot CSE
    the iterations into one)."""
    def body(i, acc):
        r = jax.vmap(lambda tg, s, R, t: icp._p2plane_vox_rows7(
            tg, OPTS, s, R, t + 1e-6 * i))(bt, bs, bR, bT)
        return acc + jnp.sum(r[..., 7])
    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))


@functools.partial(jax.jit, static_argnames=("n",))
def kernel_n(rows7, bs, bR, bT, n=20):
    """n iterations of ONLY the fused pick kernel on precomputed rows."""
    def body(i, acc):
        H, b, ne, chi2 = jax.vmap(
            lambda r, s, R, t: pallas_kernels.p2plane_pick_fused_terms(
                s.xyz, r, s.mask.astype(jnp.float32), R,
                t + 1e-6 * i, OPTS.max_plane_distance))(rows7, bs, bR, bT)
        return acc + jnp.sum(b)
    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))


@functools.partial(jax.jit, static_argnames=("n",))
def terms_n(bt, bs, bR, bT, n=20):
    """n iterations of the full linearization body (gather + kernel)."""
    def body(i, acc):
        H, b, ne, chi2 = jax.vmap(
            lambda tg, s, R, t: icp._p2plane_vox_terms(
                tg, OPTS, s, R, t + 1e-6 * i))(bt, bs, bR, bT)
        return acc + jnp.sum(b)
    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))


@functools.partial(jax.jit, static_argnames=("n",))
def solve_n(bH, bb, bR, bT, n=20):
    def body(i, carry):
        R, t = carry
        dx = jax.vmap(mathx.solve_gn_6x6)(bH + 1e-6 * i, bb)
        R, t = jax.vmap(lie.se3_retract)(R, t, dx)
        return (R, t)
    return jax.lax.fori_loop(0, n, body, (bR, bT))


def timed(fn, *args, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPEATS):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPEATS
    return dt, out


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev}", flush=True)
    bt64, bs64, bR64, bT64 = build_lanes()
    take = lambda tree, B: jax.tree_util.tree_map(lambda a: a[:B], tree)
    result = {"device": str(dev), "repeats": REPEATS,
              "n_target": N_TGT, "n_source": N_SRC, "iters": 20, "rows": {}}

    for B in (1, 16, 64):
        bt = take(bt64, B)
        bs = take(bs64, B)
        bR, bT = bR64[:B], bT64[:B]
        jax.block_until_ready(bt)
        row = {}
        # full bench program (the round-4 flat row)
        dt, _ = timed(lambda: icp.scan_match_batch(bt, OPTS, bs, bR, bT))
        row["full_fixed20_ms"] = round(dt * 1e3, 2)
        # decomposition
        dt, _ = timed(lambda: terms_n(bt, bs, bR, bT))
        row["terms20_ms"] = round(dt * 1e3, 2)
        dt, _ = timed(lambda: rows7_n(bt, bs, bR, bT))
        row["rows7x20_ms"] = round(dt * 1e3, 2)
        rows7 = jax.vmap(lambda tg, s, R, t: icp._p2plane_vox_rows7(
            tg, OPTS, s, R, t))(bt, bs, bR, bT)
        jax.block_until_ready(rows7)
        dt, _ = timed(lambda: kernel_n(rows7, bs, bR, bT))
        row["kernel20_ms"] = round(dt * 1e3, 2)
        bH = jnp.broadcast_to(jnp.eye(6, dtype=jnp.float32) * 100.0,
                              (B, 6, 6))
        bb = jnp.ones((B, 6), jnp.float32)
        dt, _ = timed(lambda: solve_n(bH, bb, bR, bT))
        row["solve20_ms"] = round(dt * 1e3, 2)
        row["per_lane_iter_us"] = round(
            row["full_fixed20_ms"] * 1e3 / (20 * B), 1)
        result["rows"][str(B)] = row
        print(f"# B={B}: {row}", flush=True)

    # optional device trace of the B=64 program
    try:
        with jax.profiler.trace("/tmp/jxtrace_b64"):
            out = icp.scan_match_batch(bt64, OPTS, bs64, bR64, bT64)
            jax.block_until_ready(out)
        result["trace_dir"] = "/tmp/jxtrace_b64"
    except Exception as e:  # the axon relay may not support tracing
        result["trace_error"] = f"{type(e).__name__}: {str(e)[:200]}"

    print(json.dumps(result))


if __name__ == "__main__":
    main()
