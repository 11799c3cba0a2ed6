"""Tests for the BoW vocabulary/database and RANSAC solvers."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_refactored_tpu.geometry import projection, se3, sim3
from orb_slam2_refactored_tpu.slam.vocabulary import (
    KeyFrameDatabase, train_vocabulary, transform,
)
from orb_slam2_refactored_tpu.solvers.ransac import (
    horn_ransac, p6p_ransac, pnp_ransac,
)


def rand_desc(rng, n):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


def perturb_desc(rng, desc, n_bits=12):
    out = desc.copy()
    for i in range(len(out)):
        for _ in range(n_bits):
            w = rng.integers(0, 8)
            out[i, w] ^= np.uint32(1) << np.uint32(rng.integers(0, 32))
    return out


class TestVocabulary:
    def test_transform_normalized(self):
        rng = np.random.default_rng(0)
        voc = train_vocabulary(rand_desc(rng, 512), n_words=64, iters=4)
        desc = jnp.asarray(rand_desc(rng, 100))
        v, words = transform(voc, desc, jnp.ones(100, bool))
        assert abs(float(v.sum()) - 1.0) < 1e-5
        assert words.shape == (100,)

    def test_place_recognition(self):
        """A revisited place must out-score unrelated places."""
        rng = np.random.default_rng(1)
        base = rand_desc(rng, 800)
        voc = train_vocabulary(base, n_words=128, iters=4)
        db = KeyFrameDatabase(voc, kf_capacity=16)

        place_descs = [base[i * 150 : i * 150 + 120] for i in range(5)]
        for k, d in enumerate(place_descs):
            v, _ = db.compute_bow(jnp.asarray(d), jnp.ones(len(d), bool))
            db.add(k, v)
        # query = noisy revisit of place 2
        q = perturb_desc(rng, place_descs[2])
        qv, _ = db.compute_bow(jnp.asarray(q), jnp.ones(len(q), bool))
        scores = db.scores_against_all(qv)
        assert scores.argmax() == 2
        cands = db.detect_candidates(qv, exclude=set(), min_score=0.05)
        assert cands and cands[0] == 2

    def test_exclude_set(self):
        rng = np.random.default_rng(2)
        voc = train_vocabulary(rand_desc(rng, 400), n_words=64, iters=3)
        db = KeyFrameDatabase(voc, kf_capacity=8)
        d = rand_desc(rng, 80)
        v, _ = db.compute_bow(jnp.asarray(d), jnp.ones(80, bool))
        db.add(0, v)
        db.add(1, v)
        cands = db.detect_candidates(v, exclude={0}, min_score=0.01)
        assert 0 not in cands and 1 in cands


class TestHornRansac:
    def test_recovers_sim3(self):
        rng = np.random.default_rng(3)
        src = rng.uniform(-2, 2, (80, 3)).astype(np.float32)
        g = sim3.make(
            se3.quat_normalize(jnp.asarray([0.9, 0.1, -0.2, 0.15])),
            jnp.asarray([0.5, -0.3, 1.0]), jnp.asarray(1.4),
        )
        dst = np.array(sim3.transform(g, jnp.asarray(src)))
        dst += rng.normal(0, 0.005, dst.shape)
        out = rng.choice(80, 16, replace=False)
        dst[out] += rng.uniform(0.5, 2.0, (16, 3))
        res = horn_ransac(
            jnp.asarray(src), jnp.asarray(dst), jnp.ones(80, bool),
            jax.random.PRNGKey(0), with_scale=True, inlier_th=0.01,
        )
        assert bool(res.success)
        assert abs(float(res.scale) - 1.4) < 0.02
        err = np.asarray(se3.boxminus(res.pose, g[:7]))
        assert np.linalg.norm(err[:3]) < 0.02
        inl = np.asarray(res.inliers)
        assert not inl[out].any()

    def test_fixed_scale(self):
        rng = np.random.default_rng(4)
        src = rng.uniform(-2, 2, (60, 3)).astype(np.float32)
        p = se3.exp(jnp.asarray(np.array([0.1, -0.2, 0.05, 0.3, 0.1, -0.2], np.float32)))
        dst = np.asarray(se3.transform(p, jnp.asarray(src)))
        res = horn_ransac(
            jnp.asarray(src), jnp.asarray(dst), jnp.ones(60, bool),
            jax.random.PRNGKey(1), with_scale=False, inlier_th=0.01,
        )
        assert bool(res.success)
        assert float(res.scale) == 1.0
        err = np.asarray(se3.boxminus(res.pose, p))
        assert np.linalg.norm(err) < 0.01


class TestP6P:
    def test_resection_with_outliers(self):
        rng = np.random.default_rng(5)
        cam = projection.CameraIntrinsics.create(400.0, 400.0, 160.0, 120.0)
        pts = np.stack(
            [rng.uniform(-2, 2, 100), rng.uniform(-1.5, 1.5, 100), rng.uniform(3, 8, 100)],
            -1,
        ).astype(np.float32)
        pose = se3.exp(jnp.asarray(np.array([0.05, -0.1, 0.02, 0.2, 0.1, -0.3], np.float32)))
        uv = np.array(projection.project_world(cam, pose, jnp.asarray(pts))[0])
        uv += rng.normal(0, 0.5, uv.shape)
        out = rng.choice(100, 20, replace=False)
        uv[out] += rng.uniform(30, 80, (20, 2)) * rng.choice([-1, 1], (20, 2))
        res = p6p_ransac(
            jnp.asarray(pts), jnp.asarray(uv, jnp.float32), jnp.ones(100, bool),
            cam, jax.random.PRNGKey(2),
        )
        assert bool(res.success)
        err = np.asarray(se3.boxminus(res.pose, pose))
        assert np.linalg.norm(err) < 0.02
        assert int(res.n_inliers) > 60


def _one_wall_problem(seed=7):
    """All visible landmarks on ONE plane (a wall at z=5 tilted 20 deg) —
    the geometry that defeats a pure DLT resection (2-D nullspace) and that
    the reference's EPnP survives (`src/PnPsolver.cc:375-568`). A mono
    kidnap in front of a wall must relocalize through this."""
    rng = np.random.default_rng(seed)
    cam = projection.CameraIntrinsics.create(400.0, 400.0, 160.0, 120.0)
    n = 120
    uvp = np.stack([rng.uniform(-2.5, 2.5, n), rng.uniform(-1.8, 1.8, n)], -1)
    nrm = np.array([np.sin(0.35), 0.0, -np.cos(0.35)])
    u_ax = np.array([np.cos(0.35), 0.0, np.sin(0.35)])
    v_ax = np.array([0.0, 1.0, 0.0])
    pts = (np.array([0.3, 0.1, 5.0])[None]
           + uvp[:, :1] * u_ax[None] + uvp[:, 1:] * v_ax[None]).astype(np.float32)
    pose = se3.exp(jnp.asarray(
        np.array([0.08, -0.12, 0.03, 0.3, -0.1, 0.2], np.float32)))
    uv = np.array(projection.project_world(cam, pose, jnp.asarray(pts))[0])
    uv += rng.normal(0, 0.4, uv.shape)
    out = rng.choice(n, 20, replace=False)
    uv[out] += rng.uniform(30, 80, (20, 2)) * rng.choice([-1, 1], (20, 2))
    return cam, pts, uv.astype(np.float32), pose


class TestPlanarPnP:
    def test_one_wall_pnp_succeeds(self):
        """pnp_ransac recovers the pose from a purely coplanar landmark set
        (VERDICT r4 'done' criterion for the planar-safe mono solver)."""
        cam, pts, uv, pose = _one_wall_problem()
        res = pnp_ransac(jnp.asarray(pts), jnp.asarray(uv),
                         jnp.ones(len(pts), bool), cam, jax.random.PRNGKey(3))
        assert bool(res.success)
        err = np.asarray(se3.boxminus(res.pose, pose))
        assert np.linalg.norm(err) < 0.03, err
        assert int(res.n_inliers) > 70

    def test_one_wall_dlt_fails(self):
        """The DLT-only solver does NOT recover the coplanar pose — the
        degeneracy pnp_ransac exists to fix. (If this ever starts passing,
        the planar family is redundant; revisit.)"""
        cam, pts, uv, pose = _one_wall_problem()
        res = p6p_ransac(jnp.asarray(pts), jnp.asarray(uv),
                         jnp.ones(len(pts), bool), cam, jax.random.PRNGKey(3))
        err = np.linalg.norm(np.asarray(se3.boxminus(res.pose, pose)))
        assert (not bool(res.success)) or err > 0.03

    def test_general_structure_unharmed(self):
        """On general (non-planar) structure the hybrid matches the DLT
        solver's accuracy — the planar family only adds hypotheses."""
        rng = np.random.default_rng(11)
        cam = projection.CameraIntrinsics.create(400.0, 400.0, 160.0, 120.0)
        pts = np.stack(
            [rng.uniform(-2, 2, 100), rng.uniform(-1.5, 1.5, 100),
             rng.uniform(3, 8, 100)], -1).astype(np.float32)
        pose = se3.exp(jnp.asarray(
            np.array([0.05, -0.1, 0.02, 0.2, 0.1, -0.3], np.float32)))
        uv = np.array(projection.project_world(cam, pose, jnp.asarray(pts))[0])
        uv += rng.normal(0, 0.5, uv.shape)
        res = pnp_ransac(jnp.asarray(pts), jnp.asarray(uv, jnp.float32),
                         jnp.ones(100, bool), cam, jax.random.PRNGKey(2))
        assert bool(res.success)
        err = np.asarray(se3.boxminus(res.pose, pose))
        assert np.linalg.norm(err) < 0.02
        assert int(res.n_inliers) > 80
