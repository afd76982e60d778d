"""PCL-source citation pins for the clustering/voxelization semantics.

Compiled-PCL ground truth is not attainable here (docs/PCL_PARITY.md records
the attempt: no libpcl on the image, no apt candidate, zero pip egress), so
each claim the oracle makes about PCL is pinned to the PCL source that
defines it (citation table in docs/PCL_PARITY.md) and asserted on
constructed boundary cases.  The TPU path is held to the oracle by the
existing parity suites; this file holds the ORACLE to the PCL claims.

Reference call sites: pcl::VoxelGrid at
src/multiple_object_tracking_lidar.cpp:452-456,
pcl::EuclideanClusterExtraction at :471-488.
"""

from __future__ import annotations

import numpy as np

import oracle


class TestVoxelGridClaims:
    """docs/PCL_PARITY.md claims 1-3: voxel_grid.hpp applyFilter."""

    def test_claim1_quantization_is_float32(self):
        """PCL computes floor(p * inverse_leaf) in FLOAT32.  Pick a
        coordinate where the f32 product lands just below an integer that
        the f64 product reaches: the two quantizations disagree, and the
        oracle must take the f32 side."""
        leaf = 0.1
        inv32 = np.float32(1.0 / leaf)
        # scan for a float32 value whose f32 product floors differently
        # from the f64 product (guaranteed to exist near cell boundaries)
        cand = None
        for k in range(1, 4000):
            x = np.float32(k * 0.1)
            if np.floor(x * inv32) != np.floor(float(x) * (1.0 / leaf)):
                cand = x
                break
        assert cand is not None, "no f32/f64 quantization divergence found"
        pts = np.array([[float(cand), 0.0, 0.0]])
        out = oracle.voxel_downsample(pts, leaf, 20 * leaf)
        # one point -> one voxel; its centroid is the point itself either
        # way, so pin the quantization through a PAIR that f32 merges into
        # one voxel but f64 would split (or vice versa)
        eps = np.float32(cand) * np.float32(np.finfo(np.float32).eps)
        pair = np.array(
            [[float(cand), 0.0, 0.0], [float(cand) - float(eps) * 2, 0.0, 0.0]]
        )
        n32 = len(oracle.voxel_downsample(pair, leaf, 20 * leaf))
        # recompute both quantizations explicitly
        q32 = {
            int(np.floor(np.float32(p) * inv32)) for p in pair[:, 0]
        }
        q64 = {int(np.floor(p * (1.0 / leaf))) for p in pair[:, 0]}
        assert n32 == len(q32)
        if len(q32) != len(q64):
            assert n32 != len(q64)  # the oracle took the f32 side
        assert len(out) == 1

    def test_claim2_centroid_of_members(self):
        leaf = 0.5
        pts = np.array(
            [[0.1, 0.1, 0.0], [0.3, 0.2, 0.0], [0.2, 0.3, 0.0]]
        )
        out = oracle.voxel_downsample(pts, leaf, 20 * leaf)
        assert len(out) == 1
        np.testing.assert_allclose(out[0], pts.mean(axis=0), rtol=1e-12)

    def test_claim3_output_order_x_fastest(self):
        """Ascending flattened voxel index, x fastest, then y, then z."""
        leaf = 0.5
        # occupied voxels at (ix, iy, iz): (1,0,0), (0,1,0), (0,0,1), (0,0,0)
        pts = np.array(
            [
                [0.75, 0.25, 0.25],   # (1, 0, 0)
                [0.25, 0.75, 0.25],   # (0, 1, 0)
                [0.25, 0.25, 0.75],   # (0, 0, 1) — z leaf is 20x, use big z
                [0.25, 0.25, 0.25],   # (0, 0, 0)
            ]
        )
        # make z land in distinct z-voxels despite the 20x leaf
        pts[2, 2] = 20 * leaf * 1.5
        out = oracle.voxel_downsample(pts, leaf, 20 * leaf)
        ids = [
            (
                int(np.floor(np.float32(p[2]) * np.float32(1 / (20 * leaf)))),
                int(np.floor(np.float32(p[1]) * np.float32(1 / leaf))),
                int(np.floor(np.float32(p[0]) * np.float32(1 / leaf))),
            )
            for p in out
        ]
        assert ids == sorted(ids), "output not in (z, y, x)-ascending order"


class TestClusterExtractionClaims:
    """docs/PCL_PARITY.md claims 4-7: extract_clusters.hpp."""

    def test_claim4_boundary_pair_merges(self):
        """radiusSearch compares sqr_dist <= sqr_radius: a pair at EXACTLY
        tol is one cluster."""
        tol = 0.25
        pts = np.array([[0.0, 0.0, 0.0], [tol, 0.0, 0.0]])
        comps = oracle.euclidean_cluster(pts, tol, 1, 10)
        assert len(comps) == 1 and sorted(comps[0]) == [0, 1]
        # and just past it: two clusters
        pts2 = np.array([[0.0, 0.0, 0.0], [np.nextafter(tol, 1.0) + 1e-12, 0.0, 0.0]])
        comps2 = oracle.euclidean_cluster(pts2, tol, 1, 10)
        assert len(comps2) == 2

    def test_claim5_size_filter_boundaries(self):
        """min_pts <= size <= max_pts, both bounds inclusive."""
        tol = 0.1
        # chain of 3 tight points + chain of 5 + a singleton, far apart
        g3 = np.array([[0.0, 0.0, 0.0], [0.05, 0.0, 0.0], [0.1, 0.0, 0.0]])
        g5 = np.array([[10 + 0.05 * i, 0.0, 0.0] for i in range(5)])
        g1 = np.array([[20.0, 0.0, 0.0]])
        pts = np.concatenate([g3, g5, g1])
        comps = oracle.euclidean_cluster(pts, tol, 3, 5)
        sizes = sorted(len(c) for c in comps)
        assert sizes == [3, 5]  # 3 kept (== min), 5 kept (== max), 1 dropped
        comps2 = oracle.euclidean_cluster(pts, tol, 3, 4)
        assert [len(c) for c in comps2] == [3]  # 5 > max now dropped

    def test_claim6_largest_first(self):
        tol = 0.1
        small = np.array([[0.0, 0.0, 0.0], [0.05, 0.0, 0.0]])
        big = np.array([[5 + 0.05 * i, 0.0, 0.0] for i in range(4)])
        # big cluster's points come LAST in index order; it must still be
        # emitted FIRST (size-descending sort, claim 6)
        pts = np.concatenate([small, big])
        comps = oracle.euclidean_cluster(pts, tol, 1, 10)
        assert [len(c) for c in comps] == [4, 2]

    def test_claim7_equal_size_tiebreak_is_min_index(self):
        """PCL's equal-size order is unspecified (unstable std::sort over
        reversed iterators); the framework's documented refinement is
        min-member-index ascending."""
        tol = 0.1
        a = np.array([[0.0, 0.0, 0.0], [0.05, 0.0, 0.0]])
        b = np.array([[5.0, 0.0, 0.0], [5.05, 0.0, 0.0]])
        comps = oracle.euclidean_cluster(np.concatenate([b, a]), tol, 1, 10)
        # indices 0,1 = cluster b; 2,3 = cluster a; equal sizes -> min index
        assert comps == [[0, 1], [2, 3]]

    def test_claim5_seed_order_component_identity(self):
        """Seeds iterate in ascending index order and BFS the whole
        component: labels (component membership) are independent of seed
        order, pinned against a brute-force transitive closure."""
        rng = np.random.default_rng(11)
        pts = rng.uniform(0, 1.2, (40, 3))
        pts[:, 2] = 0
        tol = 0.22
        comps = oracle.euclidean_cluster(pts, tol, 1, 40)
        # brute force: transitive closure of the <= tol adjacency
        d2 = ((pts[:, None] - pts[None, :]) ** 2).sum(-1)
        adj = d2 <= tol * tol
        reach = adj.copy()
        for _ in range(8):
            reach = reach | (reach @ reach)
        got = {frozenset(c) for c in comps}
        want = {frozenset(np.nonzero(reach[i])[0].tolist()) for i in range(40)}
        assert got == want
