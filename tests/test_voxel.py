import numpy as np
import jax.numpy as jnp

from loc_lib_tpu.ops import pointcloud as pcm, voxel


def _brute_knn(tgt, q, k):
    d2 = np.sum((tgt[None, :, :] - q[:, None, :]) ** 2, axis=-1)
    idx = np.argsort(d2, axis=1)[:, :k]
    return idx, np.take_along_axis(d2, idx, axis=1)


def test_downsample_one_point_per_voxel():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-10, 10, size=(300, 3)).astype(np.float32)
    pc = pcm.from_numpy(pts, capacity=512)
    out = voxel.voxel_downsample(pc, 1.0)
    got = pcm.to_numpy(out)
    keys = set(map(tuple, np.floor(got / 1.0).astype(int)))
    assert len(keys) == len(got)  # one centroid per voxel
    ref_keys = set(map(tuple, np.floor(pts / 1.0).astype(int)))
    assert keys == ref_keys


def test_downsample_centroid_value():
    pts = np.array([[0.1, 0.1, 0.1], [0.3, 0.2, 0.4], [5.5, 5.5, 5.5]], np.float32)
    pc = pcm.from_numpy(pts, capacity=128)
    out = pcm.to_numpy(voxel.voxel_downsample(pc, 1.0))
    out = out[np.argsort(out[:, 0])]
    np.testing.assert_allclose(out[0], pts[:2].mean(axis=0), atol=1e-6)
    np.testing.assert_allclose(out[1], pts[2], atol=1e-6)


def test_knn_exact_within_radius():
    """Within a 1-cell stencil radius the hash-grid kNN must agree with brute
    force (this is the oracle check the reference does by eyeballing BFNN vs
    KdTree, test_node.cpp:376-435 — here automated)."""
    rng = np.random.default_rng(1)
    tgt = rng.uniform(-8, 8, size=(1000, 3)).astype(np.float32)
    q = rng.uniform(-7, 7, size=(100, 3)).astype(np.float32)
    pc = pcm.from_numpy(tgt, capacity=1024)
    grid = voxel.build_hash_grid(pc, 1.0, bucket_size=16)
    pts, idx, d2, valid = voxel.knn(grid, jnp.array(q), jnp.ones(100, bool), 5)
    bf_idx, bf_d2 = _brute_knn(tgt, q, 5)
    for i in range(100):
        ours = set(np.array(idx[i])[np.array(valid[i])])
        for j in range(5):
            if bf_d2[i, j] <= 1.0:  # inside guaranteed stencil radius
                assert bf_idx[i, j] in ours


def test_knn_radius_gate():
    tgt = np.array([[0, 0, 0], [0.45, 0, 0], [0.9, 0, 0]], np.float32)
    pc = pcm.from_numpy(tgt, capacity=128)
    grid = voxel.build_hash_grid(pc, 1.0, bucket_size=8)
    q = jnp.array([[0.0, 0.0, 0.0]])
    pts, idx, d2, valid = voxel.knn(grid, q, jnp.ones(1, bool), 3, max_radius=0.5)
    assert int(valid.sum()) == 2  # 0.9 is outside the 0.5 radius


def test_nn1_matches_brute():
    rng = np.random.default_rng(2)
    tgt = rng.uniform(-5, 5, size=(400, 3)).astype(np.float32)
    q = tgt[:50] + rng.normal(scale=0.05, size=(50, 3)).astype(np.float32)
    pc = pcm.from_numpy(tgt, capacity=512)
    grid = voxel.build_hash_grid(pc, 1.0, bucket_size=16)
    pts, idx, d2, valid = voxel.nn1(grid, jnp.array(q), jnp.ones(50, bool))
    bf_idx, _ = _brute_knn(tgt, q, 1)
    assert np.all(np.array(valid))
    assert np.mean(np.array(idx) == bf_idx[:, 0]) > 0.95  # ties can differ


def test_voxel_stats_match_numpy():
    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 3, size=(200, 3)).astype(np.float32)
    pc = pcm.from_numpy(pts, capacity=256)
    stats = voxel.voxel_stats(pc, 1.0, mode="trunc")
    keys = np.array(stats.keys)
    valid = keys != voxel.INVALID_KEY
    # numpy reference
    coords = np.trunc(pts).astype(int)
    for slot in np.nonzero(valid)[0]:
        k = keys[slot]
        kz = k % voxel.WINDOW - voxel.HALF_WINDOW
        ky = (k // voxel.WINDOW) % voxel.WINDOW - voxel.HALF_WINDOW
        kx = k // (voxel.WINDOW * voxel.WINDOW) - voxel.HALF_WINDOW
        sel = (coords == [kx, ky, kz]).all(axis=1)
        assert sel.sum() == int(stats.count[slot])
        np.testing.assert_allclose(np.array(stats.mean[slot]), pts[sel].mean(axis=0), atol=1e-4)
        if sel.sum() > 1:
            d = pts[sel] - pts[sel].mean(axis=0)
            ref_cov = d.T @ d / (sel.sum() - 1)
            np.testing.assert_allclose(np.array(stats.cov[slot]), ref_cov, atol=1e-4)


def test_masked_points_ignored():
    pts = np.zeros((4, 3), np.float32)
    pc = pcm.from_numpy(pts, capacity=8)
    # invalidate two rows
    mask = np.array(pc.mask)
    mask[2:] = False
    pc = pc._replace(mask=jnp.array(mask))
    out = voxel.voxel_downsample(pc, 1.0)
    assert int(out.count()) == 1  # all valid points share one voxel
    stats = voxel.voxel_stats(pc, 1.0)
    assert float(stats.count.max()) == 2.0


def test_dense_index_matches_searchsorted():
    rng = np.random.default_rng(3)
    pts = rng.uniform(-20, 20, size=(500, 3)).astype(np.float32)
    pc = pcm.from_numpy(pts, capacity=512)
    grid = voxel.build_hash_grid(pc, 1.0, bucket_size=8)
    dense = voxel.build_dense_index(grid.voxel_keys, dims=(64, 64, 64))
    queries = rng.uniform(-25, 25, size=(300, 3)).astype(np.float32)
    keys = voxel.coords_to_key(
        voxel.voxel_coords(jnp.asarray(queries), grid.inv_leaf, grid.origin),
        jnp.ones((300,), bool))
    s_slot, s_found = voxel.lookup_voxels(grid, keys)
    d_slot, d_found = voxel.lookup_dense(dense, (64, 64, 64), keys)
    np.testing.assert_array_equal(np.asarray(s_found), np.asarray(d_found))
    np.testing.assert_array_equal(
        np.asarray(s_slot)[np.asarray(s_found)],
        np.asarray(d_slot)[np.asarray(d_found)])


def test_dense_index_out_of_window_not_found():
    pts = np.array([[0.5, 0.5, 0.5], [100.5, 0.5, 0.5]], np.float32)
    pc = pcm.from_numpy(pts, capacity=4)
    grid = voxel.build_hash_grid(pc, 1.0, bucket_size=4)
    dense = voxel.build_dense_index(grid.voxel_keys, dims=(8, 8, 8))
    keys = voxel.coords_to_key(
        voxel.voxel_coords(jnp.asarray(pts), grid.inv_leaf, grid.origin),
        jnp.ones((2,), bool))
    _, found = voxel.lookup_dense(dense, (8, 8, 8), keys)
    assert bool(found[0]) and not bool(found[1])  # 100m away: outside window


def test_bucket_overflow_counter():
    # 12 points in one voxel with bucket_size=8 -> 4 dropped, counted
    pts = np.tile(np.array([[0.2, 0.2, 0.2]], np.float32), (12, 1))
    pts += np.linspace(0, 0.01, 12)[:, None].astype(np.float32)
    pc = pcm.from_numpy(pts, capacity=16)
    grid = voxel.build_hash_grid(pc, 1.0, bucket_size=8)
    assert int(grid.overflow) == 4
    grid2 = voxel.build_hash_grid(pc, 1.0, bucket_size=16)
    assert int(grid2.overflow) == 0


def test_key_to_coords_roundtrip():
    rng = np.random.default_rng(5)
    coords = rng.integers(-500, 500, size=(100, 3)).astype(np.int32)
    keys = voxel.coords_to_key(jnp.asarray(coords), jnp.ones((100,), bool))
    back = voxel.key_to_coords(keys)
    np.testing.assert_array_equal(np.asarray(back), coords)


def test_bfnn_exact_against_numpy_and_grid():
    """ops.bfnn is the library's exact oracle (reference BFNN role,
    bfnn.cpp:24-66): matches a float64 numpy argsort and upper-bounds the
    stencil-limited hash-grid knn."""
    import numpy as np
    import jax.numpy as jnp
    from loc_lib_tpu.ops import bfnn, voxel
    from loc_lib_tpu.ops.pointcloud import from_numpy

    rng = np.random.default_rng(5)
    tgt_np = rng.uniform(-8, 8, (300, 3)).astype(np.float32)
    q_np = rng.uniform(-8, 8, (64, 3)).astype(np.float32)
    tgt = from_numpy(tgt_np, capacity=512)
    pts, idx, d2, valid = bfnn.knn(tgt, jnp.asarray(q_np),
                                   jnp.ones((64,), bool), k=3)
    idx, d2 = np.asarray(idx), np.asarray(d2)
    for qi in range(64):
        ref = np.sum((tgt_np.astype(np.float64) - q_np[qi]) ** 2, axis=1)
        order = np.argsort(ref)[:3]
        np.testing.assert_array_equal(np.sort(idx[qi]), np.sort(order))
        np.testing.assert_allclose(np.sort(d2[qi]), np.sort(ref[order]),
                                   rtol=1e-4, atol=1e-4)
    # the grid knn (exact within its stencil) never beats the oracle
    grid = voxel.build_hash_grid(tgt, 1.0, bucket_size=8)
    _, _, gd2, gvalid = voxel.knn(grid, jnp.asarray(q_np),
                                  jnp.ones((64,), bool), 3)
    gd2 = np.asarray(gd2)
    assert (gd2[np.asarray(gvalid)] >= d2[np.asarray(gvalid)] - 1e-4).all()
