"""Tests for Hamming matching kernels and projection-guided search."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_refactored_tpu.geometry import projection, se3
from orb_slam2_refactored_tpu.ops import hamming, matching


def rand_desc(rng, n):
    return jnp.asarray(rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32))


class TestHamming:
    def test_exact_distances(self):
        a = jnp.zeros((1, 8), jnp.uint32)
        b = jnp.zeros((2, 8), jnp.uint32).at[1, 0].set(0b1011)
        d = hamming.hamming_matrix(a, b)
        assert d.shape == (1, 2)
        assert int(d[0, 0]) == 0 and int(d[0, 1]) == 3

    def test_matrix_vs_pairwise(self):
        rng = np.random.default_rng(0)
        a, b = rand_desc(rng, 5), rand_desc(rng, 5)
        m = hamming.hamming_matrix(a, b)
        p = hamming.hamming_pairwise(a, b)
        np.testing.assert_array_equal(np.asarray(jnp.diagonal(m)), np.asarray(p))

    def test_masked_best2(self):
        d = jnp.array([[5, 3, 9], [1, 2, 3]], jnp.int32)
        mask = jnp.array([[True, True, True], [False, True, True]])
        idx, best, second = hamming.masked_best2(d, mask)
        assert list(np.asarray(idx)) == [1, 1]
        assert list(np.asarray(best)) == [3, 2]
        assert list(np.asarray(second)) == [5, 3]

    def test_resolve_duplicates(self):
        tgt = jnp.array([0, 0, 1], jnp.int32)
        dist = jnp.array([5, 3, 7], jnp.int32)
        valid = jnp.array([True, True, True])
        keep = hamming.resolve_duplicates(tgt, dist, valid, 4)
        assert list(np.asarray(keep)) == [False, True, True]


class TestDescriptorMatch:
    def test_identity_match(self):
        rng = np.random.default_rng(1)
        desc = rand_desc(rng, 64)
        valid = jnp.ones((64,), bool)
        m = matching.match_descriptors(desc, desc, valid, valid, max_dist=10)
        np.testing.assert_array_equal(np.asarray(m.idx), np.arange(64))
        assert bool(m.valid.all())

    def test_permuted_match_with_noise(self):
        rng = np.random.default_rng(2)
        desc = np.asarray(rand_desc(rng, 64))
        perm = rng.permutation(64)
        noisy = desc[perm].copy()
        # flip ~8 random bits in each
        for i in range(64):
            w = rng.integers(0, 8, 8)
            bit = rng.integers(0, 32, 8)
            for j in range(8):
                noisy[i, w[j]] ^= np.uint32(1) << np.uint32(bit[j])
        valid = jnp.ones((64,), bool)
        m = matching.match_descriptors(
            jnp.asarray(desc), jnp.asarray(noisy), valid, valid, max_dist=20, nn_ratio=1.0
        )
        got = np.asarray(m.idx)
        ok = np.asarray(m.valid)
        # matched index i -> position of i in perm
        inv = np.argsort(perm)
        assert ok.mean() > 0.9
        assert (got[ok] == inv[ok]).mean() > 0.95

    def test_rotation_consistency(self):
        valid = jnp.ones((100,), bool)
        a = jnp.zeros((100,))
        b = np.zeros(100, np.float32)
        b[:90] = 0.1  # dominant rotation
        b[90:] = np.linspace(1.0, 3.0, 10)  # outliers spread over other bins
        keep = matching.rotation_consistency(a, jnp.asarray(b), valid)
        keep = np.asarray(keep)
        assert keep[:90].all()
        assert keep[90:].sum() <= 6  # top-3 bins may admit a couple


class TestProjectionSearch:
    def test_search_by_projection_recovers_matches(self):
        rng = np.random.default_rng(3)
        cam = projection.CameraIntrinsics.create(500.0, 500.0, 160.0, 120.0, bf=40.0)
        n_pts = 50
        pts = np.stack(
            [
                rng.uniform(-1, 1, n_pts),
                rng.uniform(-0.7, 0.7, n_pts),
                rng.uniform(3, 6, n_pts),
            ],
            axis=-1,
        ).astype(np.float32)
        pose = se3.identity()
        uv = np.asarray(projection.project(cam, jnp.asarray(pts)))
        desc = np.asarray(rand_desc(rng, n_pts))

        # frame: the same features with slight pixel noise + 14 distractors
        n_feat = 64
        fxy = np.zeros((n_feat, 2), np.float32)
        fdesc = np.zeros((n_feat, 8), np.uint32)
        fxy[:n_pts] = uv + rng.normal(0, 0.5, uv.shape)
        fdesc[:n_pts] = desc
        fxy[n_pts:] = rng.uniform(0, 300, (n_feat - n_pts, 2))
        fdesc[n_pts:] = np.asarray(rand_desc(rng, n_feat - n_pts))
        flevel = np.zeros(n_feat, np.int32)
        fvalid = np.ones(n_feat, bool)

        dists = np.linalg.norm(pts, axis=-1)
        scale_factors = jnp.asarray([1.2**i for i in range(8)], jnp.float32)
        m = matching.search_by_projection(
            jnp.asarray(fxy), jnp.asarray(flevel), jnp.asarray(fdesc),
            jnp.asarray(fvalid),
            jnp.asarray(pts), jnp.asarray(desc),
            jnp.asarray(pts / dists[:, None]),  # normals pointing away from origin cam
            jnp.asarray(dists * 0.5), jnp.asarray(dists * 1.1),
            jnp.ones(n_pts, bool),
            pose, cam, scale_factors, radius=4.0,
        )
        got = np.asarray(m.idx)
        ok = np.asarray(m.valid)
        assert ok.mean() > 0.9
        assert (got[ok] == np.nonzero(ok)[0]).all()
