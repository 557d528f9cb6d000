"""Full 3D SLAM: LIO front-end + ScanContext loop closure + SE(3) pose graph.

The reference has loop closure ONLY in its 2D stack (LoopClosing over
submaps, /root/reference/LocUtils/src/mapping_2d/loop_closing.cpp:39-255);
its 3D ScanContext retrieval is an empty stub (model/loop_closure/
scan_context.cpp:190-203) and "3D has none" of a pose graph (SURVEY.md
section 2). This module is the 3D generalization SURVEY.md section 3.5
calls for: keyframe LIO odometry (pipeline/lio.py), ScanContext descriptor
retrieval over keyframes (graph/scan_context.py), ICP re-registration of
loop pairs (models/icp.py), and two-phase chi2-gated SE(3) pose-graph
optimization (graph/pose_graph.py) with pose write-back — the same
detect / re-register / optimize / validate / write-back structure as the
reference's 2D path (loop_closing.cpp:52-85, 120-158, 160-255), device-side
and batched.

Host/device split: the keyframe archive (every keyframe cloud + pose) lives
in host numpy — it grows without bound and is touched once per loop event —
while each loop registration and each pose-graph solve is one jitted
fixed-shape device program.
"""

from __future__ import annotations

import dataclasses
import threading
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import pose_graph as pg, scan_context as sc
from ..models import icp
from ..ops.pointcloud import PointCloud
from ..utils import lie
from . import lio as lio_mod


@dataclasses.dataclass(frozen=True)
class LoopOptions:
    """Loop-closure gates, mirroring the reference's 2D LoopClosing knobs
    (loop_closing.cpp:52-85) lifted to 3D keyframes."""

    min_keyframe_gap: int = 15        # submap_gap_ analog: skip recent kfs
    max_candidate_dist: float = 25.0  # odometry-distance gate (cpp:70: 15 m)
    min_effective_pts: int = 200      # registration acceptance
    max_chi2_per_pt: float = 0.05     # mean squared residual acceptance (m^2)
    # Loop edges carry odometry-grade information: a loop measurement is an
    # ICP registration of the same quality as the odometry chain, and a
    # 100x-weaker loop edge leaves ~99% of the drift uncorrected at the
    # optimum. (The reference sets loop info = I against odom info = 1e4*I,
    # loop_closing.cpp:185,204 — which makes its 2D PGO nearly cosmetic; bad
    # edges are handled by the residual gate, not by under-weighting.)
    loop_info_scale: float = 1e4      # loop edge information CAP
    odom_info_scale: float = 1e4      # sequential edge info (cpp:192-199)
    # Per-edge information from registration quality (VERDICT r1 weak #8):
    # info = n_eff / chi2_per_pt, i.e. residual count x inverse residual
    # variance — the isotropic Fisher-information estimate of the ICP fit —
    # clipped to [loop_info_min, loop_info_scale]. Set use_quality_info=False
    # to restore the constant-information behavior.
    use_quality_info: bool = True
    loop_info_min: float = 1e2
    optimize_every: int = 4           # run PGO after this many new loops
    # Padded loop-edge capacity AND the solver's constant loop bucket
    # (see Slam3d._solver_shape); oldest edges are dropped at the cap.
    max_loops: int = 512
    # ScanContext candidates re-registered PER KEYFRAME. 1 = the reference's
    # one-candidate flow; >1 retrieves the top-K descriptor matches and
    # re-registers all surviving candidates in ONE batched device program
    # (icp.scan_match_batch) — the chip is ~99.99% idle during a single
    # match (PROFILE.md §1), so K registrations cost nearly the wall time
    # of one while yielding up to K loop edges per keyframe.
    sc_topk: int = 1


@dataclasses.dataclass(frozen=True)
class Slam3dOptions:
    lio: lio_mod.LioOptions = lio_mod.LioOptions()
    sc: sc.ScanContextOptions = sc.ScanContextOptions(exclude_recent=15)
    pgo: pg.PgoOptions = pg.PgoOptions()
    loop: LoopOptions = LoopOptions()
    # Wide-basin ICP for loop re-registration (coarser gates than odometry:
    # the initial guess comes from drifted poses, cf. the reference's
    # multi-resolution wide-basin matcher, multi_resolution_likelihood_field).
    # p2plane_vox: the loop target's plane table is built once per candidate
    # and the fused kernel runs the 30 wide-basin iterations — same
    # production path as odometry, coarser leaf for the wider basin.
    # Octant-pre-elected correspondences for loop registration (round 5):
    # the batched candidate matcher is gather-bound on TPU (PROFILE.md),
    # and oct cuts gathered elements ~6x — measured 2.3x converged batched
    # throughput at B=64 with max error 0.96 cm (vs 0.93 vox). The oct
    # target build is ~20 ms/candidate on-chip, amortized over the 20-30
    # GN iterations it feeds.
    loop_icp: icp.IcpOptions = icp.IcpOptions(
        method="p2plane_vox_oct", max_iteration=30, max_plane_distance=0.5,
        grid_leaf=2.0, bucket_size=8, plane_min_pts=4)
    sc_capacity: int = 4096           # max keyframes in the descriptor DB
    # Compile the bucketed two-phase PGO executable AHEAD of the first
    # accepted loop, in a background thread (at __init__ and at every
    # keyframe that moves the graph into a new shape bucket). Without it
    # the full solver compile — tens of seconds on a remote-compile
    # testbed — lands exactly at the first accepted loop closure, the
    # worst possible moment (BENCH_SUITE r3: pgo_first_call_s = 27.5).
    warm_start: bool = True


def loop_edge_info(num_effective: int, chi2_per_pt: float,
                   lo: LoopOptions) -> float:
    """Isotropic information weight of one loop registration.

    chi2_per_pt is the mean squared residual (the per-residual noise
    variance estimate), so 1/chi2_per_pt is the per-residual information and
    n_eff residuals give n_eff/chi2_per_pt — a cleaner fit or more support
    earns more weight. Clipped so a near-perfect synthetic fit can't drown
    the odometry chain and a barely-accepted one still pulls."""
    if not lo.use_quality_info:
        return lo.loop_info_scale
    w = num_effective / max(chi2_per_pt, 1e-6)
    return float(np.clip(w, lo.loop_info_min, lo.loop_info_scale))


class LoopEdge(NamedTuple):
    i: int                 # older keyframe index
    j: int                 # newer keyframe index
    R: np.ndarray          # measured R_i_j
    t: np.ndarray          # measured t_i_j
    chi2_per_pt: float
    num_effective: int


class Slam3d:
    """Host driver owning the LIO engine, the keyframe archive, the
    ScanContext database, and the pose graph."""

    def __init__(self, opts: Slam3dOptions = Slam3dOptions(),
                 R_il=None, t_il=None, front_end=None):
        """`front_end` swaps the odometry engine: anything with the Lio
        driver contract (init_imu / add_measure / imu_inited /
        apply_correction) — e.g. `lio_sharded.LioSharded` for the
        DISTRIBUTED composition (pipeline/slam3d_sharded.py). Default:
        a single-device Lio."""
        self.opts = opts
        self.lio = (front_end if front_end is not None
                    else lio_mod.Lio(opts.lio, R_il=R_il, t_il=t_il))
        self.scdb = sc.ScanContextDb(capacity=opts.sc_capacity, opts=opts.sc)
        # keyframe archive (host): lidar-frame clouds + world poses
        self.kf_xyz: list[np.ndarray] = []     # (C, 3) each
        self.kf_mask: list[np.ndarray] = []    # (C,) each
        self.kf_R: list[np.ndarray] = []       # (3, 3) each, world pose
        self.kf_t: list[np.ndarray] = []       # (3,) each
        self.kf_frame: list[int] = []          # source frame index
        self.loops: list[LoopEdge] = []
        self.loop_inliers: Optional[np.ndarray] = None
        self._loops_since_opt = 0
        self._frame = 0
        # PGO warm-start bookkeeping: per-shape compile wall times
        # (observable; bench_slam3d records them) + in-flight threads
        self.warm_times: dict[tuple, float] = {}
        self._warmed: set[tuple] = set()
        self._warm_threads: dict[tuple, threading.Thread] = {}
        # warm-start is DEFERRED to the first keyframe (_after_step):
        # warming at construction started two ~20-40 s background solver
        # compiles even for engines that never see a scan (advisor round
        # 4), and a loop cannot be accepted before the first keyframe
        # anyway — the first _warm_ahead still runs a whole bucket-width
        # of keyframes before the solver can be needed.

    # -- delegation to the LIO front-end ------------------------------------
    @property
    def imu_inited(self) -> bool:
        return self.lio.imu_inited

    def init_imu(self, gyro, acce, timestamp) -> bool:
        return self.lio.init_imu(gyro, acce, timestamp)

    def add_measure(self, scan: PointCloud, imu_gyro, imu_acce, imu_stamp,
                    imu_valid):
        out = self.lio.add_measure(scan, imu_gyro, imu_acce, imu_stamp,
                                   imu_valid)
        self._after_step(scan, out)
        return out

    def add_cloud(self, scan: PointCloud):
        out = self.lio.add_cloud(scan)
        self._after_step(scan, out)
        return out

    # -- loop closure --------------------------------------------------------
    def _after_step(self, scan: PointCloud, out) -> None:
        self._frame += 1
        if not bool(out.is_keyframe):
            return
        self.kf_xyz.append(np.asarray(scan.xyz))
        self.kf_mask.append(np.asarray(scan.mask))
        self.kf_R.append(np.asarray(out.R))
        self.kf_t.append(np.asarray(out.t))
        self.kf_frame.append(self._frame - 1)
        kf_id = len(self.kf_R) - 1
        # Ring-buffered DB: at capacity the oldest descriptor is evicted and
        # counted (scdb.evicted) instead of silently refusing new keyframes —
        # loop detection keeps working on long runs over the most recent
        # sc_capacity keyframes.
        self.scdb.add(scan)
        if self.opts.warm_start:
            self._warm_ahead()
        cands = self._detect(scan, kf_id)
        if cands:
            accepted = self._register_loops(cands, kf_id, scan)
            self._loops_since_opt += accepted
            if (accepted
                    and self._loops_since_opt >= self.opts.loop.optimize_every):
                self.optimize()

    def _detect(self, scan: PointCloud, kf_id: int) -> list[int]:
        """ScanContext retrieval + the reference's odometry-distance gate
        (loop_closing.cpp:52-85). Returns the gated candidate keyframe ids,
        best descriptor match first (up to loop.sc_topk of them)."""
        lo = self.opts.loop
        if kf_id < lo.min_keyframe_gap:
            return []
        res = self.scdb.query_topk(scan, lo.sc_topk)
        ids, found = jax.device_get((res.index, res.found))
        out: list[int] = []
        for cand, ok in zip(ids.tolist(), found.tolist()):
            if not ok or cand < 0:
                continue
            if kf_id - cand < lo.min_keyframe_gap:
                continue
            if np.linalg.norm(self.kf_t[kf_id]
                              - self.kf_t[cand]) > lo.max_candidate_dist:
                continue
            out.append(cand)
        return out

    def _register_loops(self, cands: list[int], kf_id: int,
                        scan: PointCloud) -> int:
        """Re-register every surviving candidate against the new keyframe.
        One candidate runs the scalar path; several run as ONE batched
        device program (icp.scan_match_batch over sc_topk lanes, padded by
        repeating the last candidate so the executable shape is fixed) —
        the per-iteration fixed overhead that dominates a single match
        (PROFILE.md §1) is paid once for all lanes. Returns the number of
        accepted loop edges."""
        lo = self.opts.loop
        if len(cands) == 1:
            return int(self._register_loop(cands[0], kf_id, scan))
        B = lo.sc_topk
        lanes = (cands + [cands[-1]] * B)[:B]
        targets = icp.set_target_batch(
            PointCloud(
                xyz=jnp.asarray(np.stack([self.kf_xyz[c] for c in lanes])),
                mask=jnp.asarray(np.stack([self.kf_mask[c] for c in lanes]))),
            self.opts.loop_icp)
        R0 = np.stack([self.kf_R[c].T @ self.kf_R[kf_id] for c in lanes])
        t0 = np.stack([self.kf_R[c].T @ (self.kf_t[kf_id] - self.kf_t[c])
                       for c in lanes])
        srcs = PointCloud(
            xyz=jnp.broadcast_to(scan.xyz, (B,) + scan.xyz.shape),
            mask=jnp.broadcast_to(scan.mask, (B,) + scan.mask.shape))
        res = icp.scan_match_batch(targets, self.opts.loop_icp, srcs,
                                   jnp.asarray(R0, jnp.float32),
                                   jnp.asarray(t0, jnp.float32))
        Rb, tb, n_eff_b, chi2_b = jax.device_get(
            (res.R, res.t, res.num_effective, res.chi2))
        accepted = 0
        for k, cand in enumerate(cands):     # padding lanes are ignored
            n_eff = int(n_eff_b[k])
            chi2pp = float(chi2_b[k]) / max(n_eff, 1)
            if n_eff < lo.min_effective_pts or chi2pp > lo.max_chi2_per_pt:
                continue
            self._append_loop(LoopEdge(
                i=cand, j=kf_id, R=Rb[k].copy(), t=tb[k].copy(),
                chi2_per_pt=chi2pp, num_effective=n_eff))
            accepted += 1
        return accepted

    def _register_loop(self, cand: int, kf_id: int, scan: PointCloud) -> bool:
        """Re-register the new keyframe scan against the candidate keyframe
        cloud (the 3D analog of MatchInHistorySubmaps,
        loop_closing.cpp:120-158). Measurement: T_cand_cur on acceptance."""
        lo = self.opts.loop
        # target = candidate cloud in the candidate's lidar frame
        tgt = PointCloud(xyz=jnp.asarray(self.kf_xyz[cand]),
                         mask=jnp.asarray(self.kf_mask[cand]))
        target = icp.set_target(tgt, self.opts.loop_icp)
        # initial guess from current (drifted) pose estimates
        Rc, tc = self.kf_R[cand], self.kf_t[cand]
        Rn, tn = self.kf_R[kf_id], self.kf_t[kf_id]
        R0 = Rc.T @ Rn
        t0 = Rc.T @ (tn - tc)
        res = icp.scan_match(target, self.opts.loop_icp, scan,
                             jnp.asarray(R0, jnp.float32),
                             jnp.asarray(t0, jnp.float32))
        n_eff = int(res.num_effective)
        chi2pp = float(res.chi2) / max(n_eff, 1)
        # Acceptance is quality-gated (effective-point count + mean residual),
        # NOT convergence-flag-gated: a wide-basin loop registration may use
        # its full iteration budget without reaching |dx|<eps while still
        # being an excellent fit, and the reference's own loop acceptance is
        # inlier-based for the same reason (inliers>100 && ratio>0.4,
        # multi_resolution_likelihood_field.cpp:163-177). Bad edges are
        # additionally chi2-gated inside the pose graph (optimize_two_phase).
        if n_eff < lo.min_effective_pts or chi2pp > lo.max_chi2_per_pt:
            return False
        self._append_loop(LoopEdge(i=cand, j=kf_id, R=np.asarray(res.R),
                                   t=np.asarray(res.t), chi2_per_pt=chi2pp,
                                   num_effective=n_eff))
        return True

    def _append_loop(self, edge: LoopEdge) -> None:
        """Bounded loop-edge store (loop.max_loops IS the padded solver
        capacity): at the cap the OLDEST constraints are dropped — recent
        loops carry the information about the drift still in the graph."""
        self.loops.append(edge)
        cap = self.opts.loop.max_loops
        if len(self.loops) > cap:
            self.loops = self.loops[-cap:]

    # -- pose-graph optimization ---------------------------------------------
    _BUCKET = 16

    @classmethod
    def _bucketed(cls, n: int) -> int:
        """GEOMETRIC shape buckets: 16, 32, 64, 128... A growing graph then
        crosses O(log) bucket boundaries instead of O(n/16): each distinct
        bucket pair is a full solver compile (~20 s on a remote-compile
        testbed, BENCH_SUITE pgo_warm_compile_s), and linear 16-buckets
        churned 9 compiles in one 92-frame run — the background warmer
        could not stay ahead. Padding waste is bounded at 2x, which the
        block-sparse PCG (cost ∝ padded edges, zeros for invalid rows)
        absorbs."""
        b = cls._BUCKET
        n = max(n, 1)
        while b < n:
            b *= 2
        return b

    def _solver_shape(self, num_kfs: int, num_loops: int = 0) -> tuple:
        """(node bucket, loop-edge bucket) — together with the static
        PgoOptions these fully determine the compiled solver executable:
        odometry edges are padded to nb-1 and loop edges to lb before
        pad_graph, so the total edge count is a function of the buckets
        alone.

        The loop bucket is CONSTANT at loop.max_loops' bucket: measured on
        the remote-compile testbed, each distinct solver shape costs
        20-40 s to compile and the compile service serializes, so a
        loop-count-dependent bucket churned 6-14 shapes per run and the
        background warmer could never stay ahead of 3-loops-per-keyframe
        growth (pgo_first_call_s ~20 s across three attempts). With lb
        pinned, the executable depends ONLY on the node bucket — nodes
        grow one per keyframe, so the next shape is always known tens of
        keyframes in advance. Cost: the PCG iterates over <= max_loops
        padded loop rows (zeros for invalid) instead of the live count —
        linear in rows and measured cheap (0.18 s warm solves)."""
        return (self._bucketed(num_kfs),
                self._bucketed(self.opts.loop.max_loops))

    @staticmethod
    def _pad_edges(edges: pg.Se3Edges, total: int) -> pg.Se3Edges:
        """Pad with invalid identity self-edges up to `total` rows, in HOST
        numpy (eager jnp builds recompile per pre-pad shape on a
        remote-compile relay — pg.odometry_edges_np)."""
        k = total - int(len(edges.i))
        if k <= 0:
            return edges
        return pg.concat_edges_np(edges, pg.make_pad_edges_np(k))

    def _build_edges(self, nb: int, lb: int) -> pg.Se3Edges:
        """Odometry chain padded to nb-1 rows, then loop edges padded to lb
        rows — the deterministic layout `_solver_shape` promises. Loop
        edges therefore always occupy rows [nb-1, nb-1+len(self.loops)).
        Built entirely in host numpy; only the bucketed solver program
        ever touches the device."""
        lo = self.opts.loop
        edges = pg.odometry_edges_np(np.stack(self.kf_R),
                                     np.stack(self.kf_t),
                                     info_scale=lo.odom_info_scale)
        edges = self._pad_edges(edges, nb - 1)
        if self.loops:
            scales = np.array(
                [loop_edge_info(l.num_effective, l.chi2_per_pt, lo)
                 for l in self.loops], np.float32)
            info = (np.eye(6, dtype=np.float32)[None]
                    * scales[:, None, None])
            loop_edges = pg.Se3Edges(
                i=np.array([l.i for l in self.loops], np.int32),
                j=np.array([l.j for l in self.loops], np.int32),
                R=np.stack([l.R for l in self.loops]).astype(np.float32),
                t=np.stack([l.t for l in self.loops]).astype(np.float32),
                info=info,
                is_loop=np.ones((len(self.loops),), bool),
                valid=np.ones((len(self.loops),), bool))
            edges = pg.concat_edges_np(edges, loop_edges)
        return self._pad_edges(edges, (nb - 1) + lb)

    def warm_solver(self, num_kfs: int, num_loops: int,
                    background: bool = True) -> None:
        """Compile the two-phase PGO executable for the given graph-shape
        bucket on a DUMMY identity graph (values don't enter the compile
        key; shapes + PgoOptions do), so the first real optimize() call in
        that bucket dispatches a cached program instead of stalling the
        pipeline for the solver compile. Wall time lands in
        `self.warm_times[shape]`."""
        shape = self._solver_shape(num_kfs, num_loops)
        if shape in self._warmed:
            return
        th = self._warm_threads.get(shape)
        if th is not None:
            if not background:       # foreground = make sure it's ready NOW
                th.join(timeout=600)
            return

        def run():
            t0 = time.perf_counter()
            try:
                nb, lb = shape
                nodes_R = np.broadcast_to(np.eye(3, dtype=np.float32),
                                          (nb, 3, 3))
                nodes_t = np.zeros((nb, 3), np.float32)
                edges = pg.odometry_edges_np(nodes_R, nodes_t)  # nb-1 rows
                edges = self._pad_edges(edges, (nb - 1) + lb)
                edges = self._pad_edges(edges, -(-((nb - 1) + lb) // 16) * 16)
                out = pg.optimize_two_phase(nodes_R, nodes_t, edges,
                                            self.opts.pgo)
                jax.block_until_ready(out)
                self.warm_times[shape] = time.perf_counter() - t0
                self._warmed.add(shape)
            finally:
                # always clear the in-flight slot: a failed warm (device
                # error, OOM) must not permanently disable warming the shape
                self._warm_threads.pop(shape, None)

        if background:
            # non-daemon ON PURPOSE: a daemon thread cancelled mid-XLA at
            # interpreter exit aborts the whole process ("FATAL: exception
            # not rethrown"); non-daemon means a clean exit waits for the
            # in-flight compile instead
            th = threading.Thread(target=run, name=f"pgo-warm-{shape}")
            self._warm_threads[shape] = th
            th.start()
        else:
            run()

    def _warm_ahead(self) -> None:
        """Keep the solver executable for the CURRENT node bucket AND the
        next one compiled (the loop bucket is constant, so those are the
        only two shapes that can be needed): called at __init__ and per
        keyframe; the per-shape dedupe set makes this a no-op except at
        node-bucket crossings — nodes grow one per keyframe, so the next
        bucket's ~20-40 s compile starts a whole bucket-width of keyframes
        before it can be needed."""
        m = max(len(self.kf_R), 1)
        nb, _ = self._solver_shape(m)
        self.warm_solver(m, 1)                  # current node bucket
        self.warm_solver(nb + 1, 1)             # next node bucket

    def optimize(self) -> bool:
        """Two-phase chi2-gated solve + pose write-back + front-end
        correction (the 3D Optimize, cf. loop_closing.cpp:160-255)."""
        if len(self.kf_R) < 2 or not self.loops:
            self._loops_since_opt = 0
            return False
        m = len(self.kf_R)
        nb, lb = self._solver_shape(m, len(self.loops))
        # if the warm-start compile for this shape is in flight, wait for it
        # (compiling the same program twice concurrently helps no one) —
        # bounded: a hung device must not deadlock the pipeline
        th = self._warm_threads.get((nb, lb))
        if th is not None and th.is_alive():
            th.join(timeout=600)
        edges = self._build_edges(nb, lb)
        # node padding to nb + edge-count rounding to a multiple of 16:
        # deterministic given (nb, lb), so warm_solver compiles the exact
        # executable. ALL in host numpy — the jitted solver below is the
        # only device program (eager graph-building ops recompiled per
        # pre-pad shape on the relay: ~18 s per optimize measured on the
        # SE(2) twin).
        edges = self._pad_edges(edges, -(-((nb - 1) + lb) // 16) * 16)
        pad_n = nb - m
        nodes_R = np.concatenate([
            np.stack(self.kf_R).astype(np.float32),
            np.broadcast_to(np.eye(3, dtype=np.float32), (pad_n, 3, 3))])
        nodes_t = np.concatenate([
            np.stack(self.kf_t).astype(np.float32),
            np.zeros((pad_n, 3), np.float32)])
        m_real = m
        R_opt, t_opt, inliers = pg.optimize_two_phase(
            nodes_R, nodes_t, edges, self.opts.pgo)
        R_opt = np.asarray(R_opt)[:m_real]
        t_opt = np.asarray(t_opt)[:m_real]

        # Correct the live front-end by the last keyframe's update
        # (UpdateFramePoseWorld analog, submap.cpp:46-50).
        k = len(self.kf_R) - 1
        dR = R_opt[k] @ self.kf_R[k].T
        dt = t_opt[k] - dR @ self.kf_t[k]
        self.lio.apply_correction(dR, dt)
        for i in range(len(self.kf_R)):
            self.kf_R[i] = R_opt[i]
            self.kf_t[i] = t_opt[i]
        # loop edges always occupy rows [nb-1, nb-1+len(self.loops))
        # (_build_edges layout)
        self.loop_inliers = np.asarray(
            inliers)[nb - 1: nb - 1 + len(self.loops)]
        self._loops_since_opt = 0
        return True

    # -- exports ---------------------------------------------------------------
    def keyframe_poses(self) -> np.ndarray:
        if not self.kf_R:
            return np.zeros((0, 4, 4), np.float32)
        T = np.tile(np.eye(4, dtype=np.float32), (len(self.kf_R), 1, 1))
        T[:, :3, :3] = np.stack(self.kf_R)
        T[:, :3, 3] = np.stack(self.kf_t)
        return T

    def assemble_global_map(self, voxel_size: float = 0.3,
                            max_points_per_kf: int = 0) -> np.ndarray:
        """Re-assemble the map from keyframe clouds at their OPTIMIZED poses
        (the reference re-loads keyframe PCDs and transforms by
        estimated_poses_, lio.cpp:550-580)."""
        pts = []
        for xyz, mask, R, t in zip(self.kf_xyz, self.kf_mask,
                                   self.kf_R, self.kf_t):
            p = xyz[mask]
            if max_points_per_kf and len(p) > max_points_per_kf:
                p = p[:max_points_per_kf]
            pts.append(p @ R.T + t)
        if not pts:
            return np.zeros((0, 3), np.float32)
        allp = np.concatenate(pts).astype(np.float32)
        if voxel_size > 0:
            from ..ops import voxel as voxel_ops
            pc = PointCloud(xyz=jnp.asarray(allp),
                            mask=jnp.ones((len(allp),), bool))
            origin = jnp.asarray(allp.mean(axis=0))
            ds = voxel_ops.voxel_downsample(pc, voxel_size, origin=origin)
            return np.asarray(ds.xyz)[np.asarray(ds.mask)]
        return allp
