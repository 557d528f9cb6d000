"""Coverage for the smaller components that previously had no dedicated
tests: ring-window NN search (the reference's FPGA prototype, fpga_node.cpp),
cloud filters, PCD I/O, and the 2D reflector pipeline."""
import numpy as np
import jax.numpy as jnp

from loc_lib_tpu.ops import filters, ring_search, pointcloud as pcm
from loc_lib_tpu.io import pcd as pcd_io


def _ring_scan(R_w=None, t_w=None, num_rings=8, ring_len=256, seed=0):
    """Cylindrical room scan organized by (ring, azimuth)."""
    rng = np.random.default_rng(seed)
    az = (np.arange(ring_len) + 0.5) / ring_len * 2 * np.pi - np.pi
    pts, ring = [], []
    for r in range(num_rings):
        el = -0.2 + 0.05 * r
        radius = 8.0 + 0.5 * np.sin(3 * az) + rng.normal(0, 0.01, ring_len)
        x = radius * np.cos(az)
        y = radius * np.sin(az)
        z = radius * el
        p = np.stack([x, y, z], 1)
        if R_w is not None:
            p = (p - t_w) @ R_w
        pts.append(p)
        ring.append(np.full(ring_len, r, np.int32))
    return (np.concatenate(pts).astype(np.float32),
            np.concatenate(ring).astype(np.int32))


def test_organize_rings_and_window_nn():
    xyz, ring = _ring_scan()
    img = ring_search.organize_rings(jnp.asarray(xyz), jnp.asarray(ring),
                                     jnp.ones((len(xyz),), bool),
                                     num_rings=8, ring_len=256)
    assert int(img.valid.sum()) > 0.9 * len(xyz)
    # self-NN at zero offset: every valid cell finds itself at distance 0
    nn, d2, found = ring_search.ring_window_nn(img, img)
    v = np.asarray(img.valid)
    assert np.asarray(found)[v].all()
    assert float(np.asarray(d2)[v].max()) < 1e-9


def test_ring_scan_match_recovers_pose():
    """The GN solve the FPGA prototype left commented out
    (fpga_node.cpp:200-230) recovers a small frame-to-frame motion."""
    from loc_lib_tpu.utils import lie
    xyz0, ring = _ring_scan()
    R_w = np.asarray(lie.so3_exp(jnp.array([0.0, 0.0, 0.01], jnp.float32)))
    t_w = np.array([0.05, 0.02, 0.0], np.float32)
    xyz1, _ = _ring_scan(R_w=R_w, t_w=t_w)
    # eps below the default: on this smooth synthetic room the very first
    # GN step can dip under 1e-2 while real error remains
    opts = ring_search.RingOptions(num_rings=8, ring_len=256, eps=1e-4,
                                   max_iteration=40)
    prev = ring_search.organize_rings(jnp.asarray(xyz0), jnp.asarray(ring),
                                      jnp.ones((len(xyz0),), bool), 8, 256)
    cur = ring_search.organize_rings(jnp.asarray(xyz1), jnp.asarray(ring),
                                     jnp.ones((len(xyz1),), bool), 8, 256)
    res = ring_search.scan_match_rings(prev, cur, opts)
    assert np.linalg.norm(np.asarray(res.t) - t_w) < 0.03, np.asarray(res.t)
    assert int(res.num_effective) > 500


def test_filters():
    xyz = np.array([[0.0, 0, 0], [1, 1, 1], [5, 5, 5], [np.nan, 0, 0],
                    [0.5, 0.5, 0.5]], np.float32)
    pc = pcm.PointCloud(xyz=jnp.asarray(np.nan_to_num(xyz, nan=1e6)),
                        mask=jnp.ones((5,), bool))
    boxed = filters.box_filter(pc, origin=[0.5, 0.5, 0.5], size=[2, 2, 2])
    np.testing.assert_array_equal(np.asarray(boxed.mask),
                                  [True, True, False, False, True])
    ranged = filters.range_filter(pc, min_range=0.5, max_range=3.0)
    np.testing.assert_array_equal(np.asarray(ranged.mask),
                                  [False, True, False, False, True])
    pc_nan = pcm.PointCloud(xyz=jnp.asarray(xyz), mask=jnp.ones((5,), bool))
    fin = filters.remove_nonfinite(pc_nan)
    assert not bool(fin.mask[3]) and bool(fin.mask[0])
    assert filters.no_filter(pc) is pc


def test_pcd_roundtrip(tmp_path):
    xyz = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    for binary in (True, False):
        p = str(tmp_path / f"c_{binary}.pcd")
        pcd_io.save_pcd(p, xyz, binary=binary)
        back = pcd_io.load_pcd(p)
        np.testing.assert_allclose(back, xyz, atol=1e-5)


def test_reflector_detect_match_pose():
    """End-to-end 2D reflector localization: detect retro markers in a
    synthetic scan, triangle-match against the map, recover the SE(2) pose
    (the component the reference stubbed, reflactor_proc.cpp:19-22)."""
    from loc_lib_tpu.models import reflector as refl

    map_xy = np.array([[2.0, 0.0], [0.0, 3.0], [-2.5, -1.0], [3.0, 2.5]],
                      np.float32)
    theta, tx, ty = 0.3, 0.4, -0.2   # robot pose in map frame
    c, s = np.cos(theta), np.sin(theta)
    Rwr = np.array([[c, -s], [s, c]])
    # markers in robot frame
    m_r = (map_xy - [tx, ty]) @ Rwr

    B = 720
    angles = (np.arange(B) + 0.5) / B * 2 * np.pi - np.pi
    ranges = np.full(B, 5.5, np.float32)       # background wall
    intensity = np.full(B, 5.0, np.float32)
    for mx, my in m_r:
        a = np.arctan2(my, mx)
        r = np.hypot(mx, my)
        # ~6 cm target so the cluster arc lands inside the width band
        half = max(int(round(0.03 / r / (2 * np.pi / B))), 1)
        i0 = int(np.round((a + np.pi) / (2 * np.pi) * B))
        for k in range(i0 - half, i0 + half + 1):
            ranges[k % B] = r
            intensity[k % B] = 200.0
    det = refl.detect_markers(jnp.asarray(ranges), jnp.asarray(angles),
                              jnp.asarray(intensity), jnp.ones((B,), bool))
    # the farthest marker's quantized beam footprint can exceed the width
    # band (realistic long-range behavior); 3 markers suffice for a fix
    assert int(det.valid.sum()) >= 3
    match = refl.match_markers(det, jnp.asarray(map_xy),
                               jnp.ones((4,), bool))
    assert int(match.num_matched) >= 3
    fix = refl.estimate_pose(det, jnp.asarray(map_xy), match)
    assert abs(float(fix.theta) - theta) < 0.02
    np.testing.assert_allclose(np.asarray(fix.t), [tx, ty], atol=0.05)
