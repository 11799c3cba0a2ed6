"""Tests for FAST detection and the ORB extraction pipeline."""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_refactored_tpu.ops import fast as fast_ops
from orb_slam2_refactored_tpu.ops import image as image_ops
from orb_slam2_refactored_tpu.ops.orb import (
    OrbExtractor,
    brief_pattern,
    features_per_level,
    select_spread_topk,
)


def checkerboard(h=120, w=160, sq=20, lo=50.0, hi=200.0):
    yy, xx = np.mgrid[0:h, 0:w]
    board = (((yy // sq) + (xx // sq)) % 2).astype(np.float32)
    return board * (hi - lo) + lo


def squares_texture(h=120, w=160, n=25, seed=0, lo=50.0, hi=200.0):
    """Isolated bright squares on dark background: true FAST L-corners
    (checkerboard X-junctions have no 9-contiguous arc and don't fire)."""
    rng = np.random.default_rng(seed)
    img = np.full((h, w), lo, np.float32)
    corners = []
    for _ in range(n):
        size = int(rng.integers(8, 16))
        y = int(rng.integers(5, h - size - 5))
        x = int(rng.integers(5, w - size - 5))
        img[y : y + size, x : x + size] = hi
        corners.append((y, x, size))
    return img, corners


class TestFast:
    def test_uniform_image_no_corners(self):
        img = jnp.full((64, 64), 100.0)
        score = fast_ops.fast_score_map(img, 20.0)
        assert float(score.max()) == 0.0

    def test_detects_isolated_dot(self):
        img = np.full((64, 64), 50.0, np.float32)
        img[32, 32] = 250.0  # bright dot: all 16 circle pixels darker
        score = fast_ops.fast_score_map(jnp.asarray(img), 20.0)
        assert float(score[32, 32]) > 0
        # far away: nothing
        assert float(score[10, 10]) == 0.0

    def test_square_corners(self):
        img, squares = squares_texture()
        score = fast_ops.detect_two_threshold(jnp.asarray(img), 20.0, 7.0)
        ys, xs = np.nonzero(np.asarray(score) > 0)
        assert len(ys) > 10
        # each detection should be near some square corner
        corner_pts = []
        for y, x, s in squares:
            corner_pts += [(y, x), (y, x + s - 1), (y + s - 1, x), (y + s - 1, x + s - 1)]
        corner_pts = np.asarray(corner_pts)
        d = np.abs(ys[:, None] - corner_pts[None, :, 0]) + np.abs(
            xs[:, None] - corner_pts[None, :, 1]
        )
        assert (d.min(axis=1) <= 4).mean() > 0.8

    def test_two_threshold_fallback(self):
        # weak-contrast corner that only the low threshold catches
        img = np.full((64, 64), 100.0, np.float32)
        img[20:, 20:] = 112.0  # step of 12: > minTh 7, < iniTh 20
        hi_only = fast_ops.fast_score_map(jnp.asarray(img), 20.0)
        both = fast_ops.detect_two_threshold(jnp.asarray(img), 20.0, 7.0)
        assert float(hi_only.max()) == 0.0
        assert float(both.max()) > 0.0

    def test_nms_keeps_single_peak(self):
        img = np.zeros((32, 32), np.float32)
        img[10:14, 10:14] = np.array(
            [[1, 2, 3, 2], [2, 5, 6, 3], [3, 8, 9, 4], [2, 3, 4, 2]], np.float32
        )
        out = np.asarray(fast_ops.nms3x3(jnp.asarray(img)))
        assert (out > 0).sum() == 1
        assert out[12, 12] == 9


class TestSelection:
    def test_budgets_sum(self):
        b = features_per_level(1000, 8, 1.2)
        assert sum(b) == 1000
        assert b[0] > b[-1] > 0

    def test_spread_topk_prefers_coverage(self):
        score = np.zeros((64, 64), np.float32)
        # one very strong cluster in one cell, weak singles elsewhere
        score[5, 5], score[6, 6], score[7, 7] = 100, 99, 98
        score[40, 40] = 1.0
        score[40, 10] = 1.0
        ys, xs, s, valid = select_spread_topk(jnp.asarray(score), 3, cell=32)
        pts = {(int(y), int(x)) for y, x, v in zip(ys, xs, valid) if bool(v)}
        # all 3 occupied cells must be represented before the cluster's 2nd-best
        assert (5, 5) in pts and (40, 40) in pts and (40, 10) in pts


class TestOrb:
    def test_pattern_static(self):
        p = brief_pattern()
        assert p.shape == (256, 2, 2)
        assert np.abs(p).max() <= 13
        assert not np.all(p[:, 0] == p[:, 1], axis=-1).any()

    def test_extract_squares(self):
        img, _ = squares_texture(240, 320, n=80, seed=3)
        ex = OrbExtractor(240, 320, n_features=500, n_levels=4)
        feats = ex(jnp.asarray(img))
        n_valid = int(np.asarray(feats.valid).sum())
        assert n_valid > 100
        v = np.asarray(feats.valid)
        xy = np.asarray(feats.xy)[v]
        assert xy[:, 0].max() < 320 and xy[:, 1].max() < 240
        # descriptors should be diverse
        desc = np.asarray(feats.desc)[v]
        assert len(np.unique(desc, axis=0)) > 0.5 * len(desc)

    def test_descriptor_repeatability_under_shift(self):
        """Same texture shifted by whole squares -> descriptors still match."""
        img1, _ = squares_texture(240, 320, n=80, seed=4)
        rng = np.random.default_rng(0)
        noise = rng.normal(0, 2.0, img1.shape).astype(np.float32)
        img2 = np.roll(img1, (0, 20), (0, 1)) + noise  # shift right 20 px
        ex = OrbExtractor(240, 320, n_features=300, n_levels=1)
        f1, f2 = ex(jnp.asarray(img1)), ex(jnp.asarray(img2 + 0.0))
        from orb_slam2_refactored_tpu.ops import hamming

        d = np.asarray(
            hamming.hamming_matrix(f1.desc, f2.desc)
        )
        v1, v2 = np.asarray(f1.valid), np.asarray(f2.valid)
        d = d[v1][:, v2]
        # for each f1 descriptor the best f2 distance should be small
        assert np.median(d.min(axis=1)) <= 40

    def test_learned_pattern_table(self):
        from orb_slam2_refactored_tpu.ops.orb import get_pattern, learned_pattern

        p = learned_pattern()
        assert p.shape == (256, 2, 2)
        # published table's first pair: (8,-3) -> (9,5)
        assert p[0].tolist() == [[8, -3], [9, 5]]
        assert np.abs(p).max() <= 13
        assert get_pattern("learned") is p
        with pytest.raises(ValueError):
            get_pattern("nope")

    def test_learned_pattern_repeatability(self):
        """The learned table must match as well as the fresh one under
        shift, and produce a different bit space."""
        img1, _ = squares_texture(240, 320, n=80, seed=4)
        img2 = np.roll(img1, (0, 20), (0, 1))
        medians = {}
        descs = {}
        from orb_slam2_refactored_tpu.ops import hamming

        for pat in ("fresh", "learned"):
            ex = OrbExtractor(240, 320, n_features=300, n_levels=1, pattern=pat)
            f1, f2 = ex(jnp.asarray(img1)), ex(jnp.asarray(img2 + 0.0))
            d = np.asarray(hamming.hamming_matrix(f1.desc, f2.desc))
            v1, v2 = np.asarray(f1.valid), np.asarray(f2.valid)
            medians[pat] = np.median(d[v1][:, v2].min(axis=1))
            descs[pat] = np.asarray(f1.desc)[v1]
        assert medians["learned"] <= 40
        # same keypoints, different test pairs -> different bits
        n = min(len(descs["fresh"]), len(descs["learned"]))
        assert not np.array_equal(descs["fresh"][:n], descs["learned"][:n])
