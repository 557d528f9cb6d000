"""2D occupancy grid + likelihood field + SE(2) scan matching.

TPU-native rebuild of the reference 2D mapping kernels:

  * `OccupancyMap` (/root/reference/LocUtils/src/model/occupancy_grid/
    occupancy_map.cpp): 1000x1000 grid with per-scan ray updates, occupancy
    counts clamped to [117, 137] around the 127 unknown midpoint
    (occupancy_map.cpp:135-156). The reference walks Bresenham lines per
    beam (cpp:175-215); here free space is carved DENSELY in polar form —
    a (polar_bins,) closest-hit range table from one tiny scatter-min,
    then every cell tests its own (range, angle-bin) against the table:
    elementwise images + one gather instead of a 185k-sample serialized
    scatter (measured 95 -> ~8 ms/scan on the chip). Endpoints scatter
    exactly (+1); traversed cells -1, each cell at most once per scan.

  * `LikelihoodField` (model/likelihoodField/likelihood_filed.cpp): the
    reference burns a 41x41 min-distance template around each occupied pixel
    (cpp:15-49). Equivalent and exact within the same radius, computed as a
    SEPARABLE squared Euclidean distance transform: a min over 2r+1 row
    shifts then 2r+1 column shifts (82 vectorized passes instead of 1681
    template stamps), the standard two-pass decomposition
    d2(x,y) = min_dy ( min_dx (occ ? dx^2 : inf) + dy^2 ).

  * `align_gauss_newton` (likelihood_filed.cpp:54-133): SE(2) GN on bilinear
    field samples; all beams linearized in parallel, analytic bilinear
    gradients, 3x3 solve, same iteration budget/rms-based convergence.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Grid2dOptions:
    """Mirror of the reference constants (occupancy_map.hpp:17-103,
    likelihood_filed.hpp:20-77).

    DELIBERATE DEVIATION: resolution defaults to 40 px/m, not the
    reference's 20 (occupancy_map.hpp:84). The occupancy-cell quantization
    sets the scan-to-map odometry noise floor, and at 20 px/m (5 cm cells)
    the measured drift on the circular bench workload is 0.32 m RMSE vs
    0.045 m at 40 px/m — at IDENTICAL compute, since the EDT/matching cost
    scales with image_size (unchanged), not metric coverage. The grid then
    spans 25 m instead of 50 m, which just triggers submap expansion more
    often (the machinery built for it). Set resolution=20.0 to reproduce
    reference-parity behavior."""

    image_size: int = 1000          # cells per side
    resolution: float = 40.0        # px per meter (ref: 20, see above)
    occupied_step: int = 1
    min_occ: int = 117
    max_occ: int = 137
    unknown: int = 127
    field_radius: int = 20          # template half-width (41x41)
    max_beam_range: float = 15.0    # meters rasterized along a ray
    ray_steps: int = 256            # samples per beam in add_scan_sampled (oracle)
    polar_bins: int = 720           # angle bins of the dense free-space carve

    @property
    def center(self) -> float:
        return self.image_size / 2.0


def world_to_px(opts: Grid2dOptions, xy: jax.Array) -> jax.Array:
    """(..., 2) meters in the submap frame -> float pixel coords."""
    return xy * opts.resolution + opts.center


class OccupancyGrid(NamedTuple):
    counts: jax.Array   # (H, W) int32 occupancy counters around `unknown`
    touched: jax.Array  # (H, W) bool — ever updated (for visualization/export)


def empty_grid(opts: Grid2dOptions) -> OccupancyGrid:
    n = opts.image_size
    return OccupancyGrid(
        counts=jnp.full((n, n), opts.unknown, jnp.int32),
        touched=jnp.zeros((n, n), bool),
    )


@functools.partial(jax.jit, static_argnames=("opts",))
def add_scan(grid: OccupancyGrid, opts: Grid2dOptions,
             points: jax.Array, valid: jax.Array,
             origin_xy: jax.Array) -> OccupancyGrid:
    """AddLidarFrame (occupancy_map.cpp:72-133): endpoints occupy, rays free.

    points: (B, 2) scan endpoints in the SUBMAP frame (already posed);
    origin_xy: (2,) sensor position in the submap frame.

    TPU-native rasterization: instead of scattering B*ray_steps (~185k)
    parametric ray samples into the 1M-cell grid (a serialized TPU scatter
    — measured 95 ms/scan), build a (polar_bins,) closest-hit range table
    (one tiny scatter-min over B beams) and test EVERY cell densely
    against its angle bin: two elementwise images + one (n, n) gather —
    the access pattern the hardware streams. Endpoints still scatter
    exactly (B updates). Cells are freed strictly before the bin's
    closest hit, matching the sampled version's before-the-endpoint rule;
    directions with no in-range beam free nothing."""
    n = opts.image_size
    end_px = world_to_px(opts, points)                       # (B, 2)

    d = points - origin_xy
    rng = jnp.linalg.norm(d, axis=-1)                        # (B,)
    ang = jnp.arctan2(d[:, 1], d[:, 0])
    nb = opts.polar_bins
    two_pi = 2.0 * jnp.pi
    bi = jnp.clip(((ang + jnp.pi) / two_pi * nb).astype(jnp.int32), 0, nb - 1)
    beam_ok = valid & (rng <= opts.max_beam_range)
    rv = jnp.where(beam_ok, rng, jnp.inf)
    bin_range = jnp.full((nb,), jnp.inf, jnp.float32).at[bi].min(rv)

    # dense per-cell polar test (cell centers in the submap frame)
    coords = (jnp.arange(n, dtype=jnp.float32) - opts.center) / opts.resolution
    dx = coords[None, :] - origin_xy[0]                      # columns = x
    dy = coords[:, None] - origin_xy[1]                      # rows = y
    crng = jnp.sqrt(dx * dx + dy * dy)
    cbi = jnp.clip(((jnp.arctan2(dy, dx) + jnp.pi) / two_pi * nb)
                   .astype(jnp.int32), 0, nb - 1)
    br = bin_range[cbi]                                      # (n, n)
    half = 0.7071 / opts.resolution                          # half cell diag
    free = jnp.isfinite(br) & (crng < br - half)

    # exact endpoint occupancy: B-update scatter
    end_cell = jnp.round(end_px).astype(jnp.int32)
    in_b = ((end_cell[:, 0] >= 0) & (end_cell[:, 0] < n)
            & (end_cell[:, 1] >= 0) & (end_cell[:, 1] < n))
    end_ok = beam_ok & in_b
    flat = end_cell[:, 1] * n + end_cell[:, 0]
    occ_flag = jnp.zeros((n * n,), bool).at[
        jnp.where(end_ok, flat, n * n)].set(True, mode="drop")
    occ = occ_flag.reshape(n, n)
    # occupied wins over free for the same cell (endpoint precedence)
    free = free & ~occ

    delta = occ.astype(jnp.int32) - free.astype(jnp.int32)
    counts = jnp.clip(grid.counts + delta * opts.occupied_step,
                      opts.min_occ, opts.max_occ)
    touched = grid.touched | (delta != 0)
    return OccupancyGrid(counts=counts, touched=touched)


@functools.partial(jax.jit, static_argnames=("opts",))
def add_scan_sampled(grid: OccupancyGrid, opts: Grid2dOptions,
                     points: jax.Array, valid: jax.Array,
                     origin_xy: jax.Array) -> OccupancyGrid:
    """ORACLE rasterizer: per-beam parametric ray sampling, the direct
    analog of the reference's per-beam walk (Bresenham filling,
    occupancy_map.cpp:175-215) — `ray_steps` samples along each beam scatter
    the free cells, endpoints scatter occupancy. Kept as the pinned
    behavioral twin of the production dense polar carve in `add_scan`
    (tests/test_grid2d.py): endpoint occupancy — the only part the
    likelihood field and therefore MATCHING sees — is identical by
    construction; the freed regions agree except that the carve covers the
    whole wedge between sampled rays (fuller coverage, measured 95 -> ~8
    ms/scan on the chip). Not used by any pipeline."""
    n = opts.image_size
    end_px = world_to_px(opts, points)                       # (B, 2)
    org_px = world_to_px(opts, origin_xy)                    # (2,)

    # Parametric ray sampling: cells strictly before the endpoint are free.
    s = jnp.linspace(0.0, 1.0, opts.ray_steps)[None, :, None]  # (1, S, 1)
    ray = org_px[None, None, :] + (end_px[:, None, :] - org_px[None, None, :]) * s
    ray_cell = jnp.round(ray).astype(jnp.int32)              # (B, S, 2)
    end_cell = jnp.round(end_px).astype(jnp.int32)           # (B, 2)

    in_b = lambda c: ((c[..., 0] >= 0) & (c[..., 0] < n)
                      & (c[..., 1] >= 0) & (c[..., 1] < n))
    # a ray sample is "free" until it reaches the endpoint cell
    at_end = jnp.all(ray_cell == end_cell[:, None, :], axis=-1)
    beam_len = jnp.linalg.norm(points - origin_xy, axis=-1)
    beam_ok = valid & (beam_len <= opts.max_beam_range)
    free_ok = beam_ok[:, None] & (~at_end) & in_b(ray_cell)
    end_ok = beam_ok & in_b(end_cell)

    # Each cell updates AT MOST once per scan: scatter boolean flags first.
    flat = lambda c: c[..., 1] * n + c[..., 0]               # (x, y) -> row-major
    free_flag = jnp.zeros((n * n,), bool).at[
        jnp.where(free_ok, flat(ray_cell), n * n)].set(True, mode="drop")
    occ_flag = jnp.zeros((n * n,), bool).at[
        jnp.where(end_ok, flat(end_cell), n * n)].set(True, mode="drop")
    # occupied wins over free for the same cell (endpoint precedence)
    free_flag = free_flag & ~occ_flag

    delta = occ_flag.astype(jnp.int32) - free_flag.astype(jnp.int32)
    counts = jnp.clip(grid.counts + delta.reshape(n, n) * opts.occupied_step,
                      opts.min_occ, opts.max_occ)
    touched = grid.touched | (delta.reshape(n, n) != 0)
    return OccupancyGrid(counts=counts, touched=touched)


@functools.partial(jax.jit, static_argnames=("opts",))
def add_scan_and_field(grid: OccupancyGrid, opts: Grid2dOptions,
                       points: jax.Array, valid: jax.Array,
                       origin_xy: jax.Array):
    """Occupancy update + field regen as ONE device program: the 2D submap
    lifecycle alternates several small jitted calls per frame, and on a
    relay-attached device each DISTINCT executable call carries a fixed
    overhead (PROFILE.md §7) — fusing the per-keyframe pair halves that."""
    g = add_scan(grid, opts, points, valid, origin_xy)
    return g, likelihood_field(g, opts)


@functools.partial(jax.jit, static_argnames=("opts",))
def add_scans_and_field(grid: OccupancyGrid, opts: Grid2dOptions,
                        points: jax.Array, valid: jax.Array,
                        origins: jax.Array, count: jax.Array):
    """Rasterize a STACK of scans ((K, B, 2) points, (K, B) valid, (K, 2)
    origins; only the first `count` rows are applied) then regenerate the
    field once — the submap seeding path (seed_from) as one program."""

    def body(k, g):
        g2 = add_scan(g, opts, points[k], valid[k], origins[k])
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(k < count, a, b), g2, g)

    g = jax.lax.fori_loop(0, points.shape[0], body, grid)
    return g, likelihood_field(g, opts)


def out_of_bounds_fraction(opts: Grid2dOptions, points: jax.Array,
                           valid: jax.Array) -> jax.Array:
    """Fraction of valid endpoints falling outside the grid — the submap
    expansion trigger (occupancy_map.cpp:137-143)."""
    px = world_to_px(opts, points)
    n = opts.image_size
    outside = (px[..., 0] < 0) | (px[..., 0] >= n) | (px[..., 1] < 0) | (px[..., 1] >= n)
    num = jnp.sum((outside & valid).astype(jnp.float32))
    return num / jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)


# ---------------------------------------------------------------------------
# Likelihood field
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("opts",))
def likelihood_field(grid: OccupancyGrid, opts: Grid2dOptions) -> jax.Array:
    """(H, W) float32 distance field in PIXELS, capped at field_radius
    (SetFieldImageFromOccuMap, likelihood_filed.cpp:203-222: occupied =
    count < unknown-10 ... the reference treats counts below 127 as hits).
    """
    r = opts.field_radius
    occupied = grid.counts > opts.unknown   # net-positive hit evidence
    big = jnp.float32(r * r * 4.0)
    g = jnp.where(occupied, 0.0, big)

    def axis_pass(f, axis):
        out = f + 0.0
        for d in range(1, r + 1):
            d2 = jnp.float32(d * d)
            out = jnp.minimum(out, jnp.roll(f, d, axis=axis) + d2)
            out = jnp.minimum(out, jnp.roll(f, -d, axis=axis) + d2)
        return out

    # separable squared EDT (exact within radius r); roll wrap-around is
    # harmless: wrapped values are >= the cap after the clip below
    d2 = axis_pass(axis_pass(g, 1), 0)
    return jnp.minimum(jnp.sqrt(d2), jnp.float32(r))


def _bilinear(img: jax.Array, x: jax.Array, y: jax.Array):
    """Bilinear sample + analytic gradient of a (H, W) image at float
    (x, y) = (col, row). Returns (value, d/dx, d/dy). Mirrors the reference's
    GetPixelValue sampling (math_utils.h:215-226)."""
    h, w = img.shape
    x = jnp.clip(x, 1.0, w - 2.0)
    y = jnp.clip(y, 1.0, h - 2.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    val = (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
           + v10 * (1 - fx) * fy + v11 * fx * fy)
    dx = (v01 - v00) * (1 - fy) + (v11 - v10) * fy
    dy = (v10 - v00) * (1 - fx) + (v11 - v01) * fx
    return val, dx, dy


@dataclasses.dataclass(frozen=True)
class Align2dOptions:
    max_iterations: int = 10
    max_residual_px: float = 20.0    # outlier gate on |field| value
    eps: float = 1e-4
    min_effective: int = 20
    huber_delta_px: float = 5.0
    # method="lm": Levenberg-Marquardt with accept/reject steps — the
    # analog of the reference's g2o-LM alignment path
    # (likelihood_filed.cpp:146-201), its robustness lever for bad
    # initializations: damping bounds the step when H is ill-conditioned
    # (e.g. most beams off the field), and rejected steps (chi2 up)
    # raise lambda instead of walking away. GN ("gn") is the default and
    # the parity-pinned production path.
    method: str = "gn"               # gn | lm
    lm_lambda0: float = 1e-3
    lm_up: float = 10.0
    lm_down: float = 0.2
    lm_lambda_max: float = 1e4


class Align2dResult(NamedTuple):
    theta: jax.Array
    t: jax.Array          # (2,)
    converged: jax.Array
    num_effective: jax.Array
    chi2: jax.Array
    inlier_ratio: jax.Array


@functools.partial(jax.jit, static_argnames=("gopts", "aopts"))
def _field_terms(field, gopts, aopts, scan_xy, scan_valid, theta, t):
    """Shared SE(2) field linearization: bilinear residual/gradient lookup,
    outlier gate, Huber weights, 3x3 H / b (likelihood_filed.cpp:54-133).
    Returns (H, b, n_eff, chi2, inlier_ratio)."""
    res_scale = gopts.resolution  # field gradient is in px; J in px/m
    c, s = jnp.cos(theta), jnp.sin(theta)
    wx = c * scan_xy[:, 0] - s * scan_xy[:, 1] + t[0]
    wy = s * scan_xy[:, 0] + c * scan_xy[:, 1] + t[1]
    px = wx * gopts.resolution + gopts.center
    py = wy * gopts.resolution + gopts.center
    e, gx, gy = _bilinear(field, px, py)
    ok = scan_valid & (e < aopts.max_residual_px) & jnp.isfinite(e)
    # Huber weights on the field residual
    w = jnp.where(e <= aopts.huber_delta_px, 1.0,
                  aopts.huber_delta_px / jnp.maximum(e, 1e-9))
    w = w * ok.astype(field.dtype)
    # d(world)/d(theta) = (-wx_rel_sin..., rotation of the body point)
    dwx_dth = -s * scan_xy[:, 0] - c * scan_xy[:, 1]
    dwy_dth = c * scan_xy[:, 0] - s * scan_xy[:, 1]
    J = jnp.stack([
        res_scale * (gx * dwx_dth + gy * dwy_dth),   # d e / d theta
        res_scale * gx,                               # d e / d tx
        res_scale * gy,                               # d e / d ty
    ], axis=-1)                                       # (B, 3)
    H = (J * w[:, None]).T @ J
    b = -(J * w[:, None]).T @ e
    chi2 = jnp.sum(e * e * w)
    n_eff = jnp.sum(ok)
    inl = jnp.sum(ok & (e < 3.0)) / jnp.maximum(jnp.sum(scan_valid), 1)
    return H, b, n_eff, chi2, inl


def align_gauss_newton(field: jax.Array, gopts: Grid2dOptions,
                       scan_xy: jax.Array, scan_valid: jax.Array,
                       theta0, t0, aopts: Align2dOptions = Align2dOptions()) -> Align2dResult:
    """AlignGaussNewton / AlignG2O (likelihood_filed.cpp:54-201) fused:
    SE(2) GN on bilinear field residuals with Huber weights, all beams in
    parallel, 3x3 solve per iteration. With aopts.method="lm" dispatches
    to the Levenberg-Marquardt variant (`align_lm`) — same residuals and
    Huber weights, damped accept/reject steps.

    scan_xy: (B, 2) beam endpoints in the SENSOR frame.
    """
    if aopts.method == "lm":
        return align_lm(field, gopts, scan_xy, scan_valid, theta0, t0,
                        aopts)
    def terms(theta, t):
        return _field_terms(field, gopts, aopts, scan_xy, scan_valid,
                            theta, t)

    def cond(st):
        it, th, t, done, *_ = st
        return (it < aopts.max_iterations) & (~done)

    def body(st):
        it, th, t, _, _, _, _ = st
        H, b, n_eff, chi2, inl = terms(th, t)
        ok = n_eff >= aopts.min_effective
        H = H + jnp.eye(3, dtype=H.dtype) * 1e-6
        dx = jnp.where(ok, jnp.linalg.solve(H, b), jnp.zeros(3, H.dtype))
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        th2 = th + dx[0]
        t2 = t + dx[1:]
        done = ok & (jnp.linalg.norm(dx) < aopts.eps)
        return (it + 1, th2, t2, done, n_eff, chi2, inl)

    init = (jnp.int32(0), jnp.float32(theta0), jnp.asarray(t0, jnp.float32),
            jnp.bool_(False), jnp.int32(0), jnp.float32(0.0), jnp.float32(0.0))
    it, th, t, done, n_eff, chi2, inl = jax.lax.while_loop(cond, body, init)
    return Align2dResult(theta=th, t=t, converged=done, num_effective=n_eff,
                         chi2=chi2, inlier_ratio=inl)


def align_lm(field: jax.Array, gopts: Grid2dOptions,
             scan_xy: jax.Array, scan_valid: jax.Array,
             theta0, t0, aopts: Align2dOptions = Align2dOptions()) -> Align2dResult:
    """Levenberg-Marquardt field alignment with Huber weights — the analog
    of the reference's AlignG2O path (likelihood_filed.cpp:146-201, g2o
    LM over EdgeSE2LikelihoodFiled unary edges with Huber kernels), the
    robustness lever for bad initializations the plain GN lacks: each
    iteration solves (H + lambda*diag(H)) dx = b and only ACCEPTS the
    step if chi2 decreases (lambda /5 on accept, x10 on reject), so an
    ill-conditioned H or a residual landscape that GN would overshoot
    yields a smaller, retried step instead of divergence. Same residual
    model as `align_gauss_newton` (shared `_field_terms`)."""

    def terms(theta, t):
        return _field_terms(field, gopts, aopts, scan_xy, scan_valid,
                            theta, t)

    def cond(st):
        it, done = st[0], st[3]
        return (it < aopts.max_iterations) & (~done)

    def body(st):
        it, th, t, _, _, _, _, lam = st
        H, b, n_eff, chi2, inl = terms(th, t)
        ok = n_eff >= aopts.min_effective
        Hd = H + lam * jnp.diag(jnp.diagonal(H)) \
            + jnp.eye(3, dtype=H.dtype) * 1e-6
        dx = jnp.where(ok, jnp.linalg.solve(Hd, b), jnp.zeros(3, H.dtype))
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        th2, t2 = th + dx[0], t + dx[1:]
        _, _, n_eff2, chi2_new, inl2 = terms(th2, t2)
        # acceptance on the MEAN residual per effective beam: the raw chi2
        # sums over a pose-GATED beam set, so a better pose that brings
        # more beams inside the gate can RAISE chi2 and get rejected
        # (measured: plain-chi2 acceptance trapped LM at 0.64 m on an init
        # GN recovered from)
        mean_old = chi2 / jnp.maximum(n_eff, 1).astype(chi2.dtype)
        mean_new = chi2_new / jnp.maximum(n_eff2, 1).astype(chi2.dtype)
        accept = ok & jnp.isfinite(mean_new) & (mean_new < mean_old) \
            & (n_eff2 >= aopts.min_effective)
        th_n = jnp.where(accept, th2, th)
        t_n = jnp.where(accept, t2, t)
        lam_n = jnp.clip(jnp.where(accept, lam * aopts.lm_down,
                                   lam * aopts.lm_up),
                         1e-9, aopts.lm_lambda_max)
        # converged: an accepted tiny step, or damping maxed out (stuck)
        done = (ok & accept & (jnp.linalg.norm(dx) < aopts.eps)) | (
            lam_n >= aopts.lm_lambda_max)
        return (it + 1, th_n, t_n, done, n_eff, chi2, inl, lam_n)

    init = (jnp.int32(0), jnp.float32(theta0), jnp.asarray(t0, jnp.float32),
            jnp.bool_(False), jnp.int32(0), jnp.float32(0.0),
            jnp.float32(0.0), jnp.float32(aopts.lm_lambda0))
    it, th, t, done, n_eff, chi2, inl, lam = jax.lax.while_loop(
        cond, body, init)
    # report the metrics AT the final pose (the loop's carried values lag
    # one iteration)
    _, _, n_eff, chi2, inl = terms(th, t)
    return Align2dResult(theta=th, t=t, converged=done, num_effective=n_eff,
                         chi2=chi2, inlier_ratio=inl)


def scan_to_points(ranges: jax.Array, angle_min: float, angle_inc: float,
                   range_min: float = 0.1, range_max: float = 30.0):
    """LaserScan -> (B, 2) sensor-frame endpoints + validity (the reference's
    Scan2d unpacking, likelihood_filed.cpp:61-67)."""
    b = ranges.shape[0]
    ang = angle_min + jnp.arange(b, dtype=jnp.float32) * angle_inc
    valid = (ranges > range_min) & (ranges < range_max) & jnp.isfinite(ranges)
    xy = jnp.stack([ranges * jnp.cos(ang), ranges * jnp.sin(ang)], axis=-1)
    return jnp.where(valid[:, None], xy, 0.0), valid
