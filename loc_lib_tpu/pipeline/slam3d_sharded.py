"""Distributed SLAM: loop closure over the SPATIALLY SHARDED mapping
pipeline (VERDICT r4 next #3 — the city-scale composition).

Round 4 left the two halves one layer apart: `pipeline/lio_sharded.py`
maps with the incremental voxel table partitioned over the mesh's "mp"
axis (a map one chip cannot hold), while `pipeline/slam3d.py`'s loop
machinery (ScanContext retrieval, top-K batched re-registration, two-phase
SE(3) PGO, front-end correction) ran only on the single-device `Lio`.
This module composes them:

  * the front-end is a `LioSharded` — per scan: replicated ESKF predict,
    the distributed NDT match (source points over "dp", Gaussian table
    over "mp", one 6x6 psum per GN iteration), shard-local keyframe
    absorption;
  * the back-end is `Slam3d` unchanged (its front-end contract is
    init_imu / add_measure / imu_inited / apply_correction, which
    LioSharded now satisfies);
  * an accepted pose-graph optimization corrects the front-end THROUGH
    the sharded map (`map_shard.apply_correction_sharded`): every live
    Gaussian is transformed by the rigid correction, re-binned, migrated
    to its new owner slab (bounds re-derived from the corrected map —
    which also re-balances an exploration-skewed partition) and merged
    exactly on key collisions (`ndt.rebuild_from_moments`).

Reference anchor for the composition (its 2D crown jewel): mapping +
loop optimization + write-back, /root/reference/LocUtils/src/mapping_2d/
loop_closing.cpp:160-255, with the bounded incremental map being scaled
the 100k-voxel LRU table, ndt_registration.cpp:150-174. Parity vs the
single-device Slam3d is pinned by tests/test_map_shard.py on the virtual
8-device CPU mesh; the multi-chip program is dry-run compiled by
__graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from jax.sharding import Mesh

from .lio_sharded import LioSharded
from .slam3d import Slam3d, Slam3dOptions


class Slam3dSharded(Slam3d):
    """Slam3d with the sharded mapping front-end."""

    def __init__(self, mesh: Mesh, opts: Slam3dOptions = Slam3dOptions(),
                 R_il=None, t_il=None):
        front = LioSharded(mesh, opts.lio, R_il=R_il, t_il=t_il)
        super().__init__(opts, front_end=front)
        self.mesh = mesh

    # observability passthroughs
    def live_voxels_per_shard(self):
        return self.lio.live_voxels_per_shard()

    @property
    def imbalance_warnings(self):
        return self.lio.imbalance_warnings
