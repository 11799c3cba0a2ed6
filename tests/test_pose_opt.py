"""Tests for pose-only LM optimization."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_refactored_tpu.geometry import projection, se3
from orb_slam2_refactored_tpu.optim.pose_opt import pose_optimize


def make_problem(rng, n=200, stereo=False, outlier_frac=0.0, noise_px=0.3):
    cam = projection.CameraIntrinsics.create(500.0, 500.0, 320.0, 240.0, bf=40.0)
    pts = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(3, 10, n)],
        axis=-1,
    ).astype(np.float32)
    # true pose: modest rotation + translation
    tau = np.array([0.03, -0.05, 0.02, 0.1, -0.05, 0.15], np.float32)
    pose_true = se3.exp(jnp.asarray(tau))
    xc = se3.transform(pose_true, jnp.asarray(pts))
    uvr = np.asarray(projection.project_stereo(cam, xc))
    obs_uv = uvr[:, :2] + rng.normal(0, noise_px, (n, 2)).astype(np.float32)
    obs_ur = (
        uvr[:, 2] + rng.normal(0, noise_px, n).astype(np.float32)
        if stereo
        else -np.ones(n, np.float32)
    )
    n_out = int(outlier_frac * n)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        obs_uv[idx] += rng.uniform(20, 80, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    return cam, pts, pose_true, obs_uv, obs_ur, np.arange(n) if n_out == 0 else idx


class TestPoseOptimize:
    def test_converges_clean_mono(self):
        rng = np.random.default_rng(0)
        cam, pts, pose_true, obs_uv, obs_ur, _ = make_problem(rng)
        res = pose_optimize(
            se3.identity(),
            jnp.asarray(pts),
            jnp.asarray(obs_uv),
            jnp.asarray(obs_ur),
            jnp.ones(len(pts)),
            jnp.ones(len(pts), bool),
            cam,
        )
        err = np.asarray(se3.boxminus(res.pose, pose_true))
        assert np.linalg.norm(err) < 5e-3
        assert int(res.num_inliers) > 190

    def test_converges_stereo(self):
        rng = np.random.default_rng(1)
        cam, pts, pose_true, obs_uv, obs_ur, _ = make_problem(rng, stereo=True)
        res = pose_optimize(
            se3.identity(),
            jnp.asarray(pts),
            jnp.asarray(obs_uv),
            jnp.asarray(obs_ur),
            jnp.ones(len(pts)),
            jnp.ones(len(pts), bool),
            cam,
        )
        err = np.asarray(se3.boxminus(res.pose, pose_true))
        assert np.linalg.norm(err) < 5e-3

    def test_rejects_outliers(self):
        rng = np.random.default_rng(2)
        cam, pts, pose_true, obs_uv, obs_ur, out_idx = make_problem(
            rng, outlier_frac=0.25
        )
        res = pose_optimize(
            se3.identity(),
            jnp.asarray(pts),
            jnp.asarray(obs_uv),
            jnp.asarray(obs_ur),
            jnp.ones(len(pts)),
            jnp.ones(len(pts), bool),
            cam,
        )
        err = np.asarray(se3.boxminus(res.pose, pose_true))
        assert np.linalg.norm(err) < 1e-2
        inl = np.asarray(res.inliers)
        assert not inl[out_idx].any()
        assert inl.sum() > 140

    def test_respects_valid_mask(self):
        rng = np.random.default_rng(3)
        cam, pts, pose_true, obs_uv, obs_ur, _ = make_problem(rng, n=100)
        # corrupt half the points but mark them invalid
        obs_uv2 = obs_uv.copy()
        obs_uv2[50:] += 500.0
        valid = np.zeros(100, bool)
        valid[:50] = True
        res = pose_optimize(
            se3.identity(),
            jnp.asarray(pts),
            jnp.asarray(obs_uv2),
            jnp.asarray(obs_ur),
            jnp.ones(100),
            jnp.asarray(valid),
            cam,
        )
        err = np.asarray(se3.boxminus(res.pose, pose_true))
        assert np.linalg.norm(err) < 1e-2
        assert not np.asarray(res.inliers)[50:].any()

    def test_jittable(self):
        rng = np.random.default_rng(4)
        cam, pts, pose_true, obs_uv, obs_ur, _ = make_problem(rng, n=64)
        f = jax.jit(
            lambda p0, x, uv, ur, w, v: pose_optimize(p0, x, uv, ur, w, v, cam)
        )
        res = f(
            se3.identity(),
            jnp.asarray(pts),
            jnp.asarray(obs_uv),
            jnp.asarray(obs_ur),
            jnp.ones(64),
            jnp.ones(64, bool),
        )
        err = np.asarray(se3.boxminus(res.pose, pose_true))
        assert np.linalg.norm(err) < 5e-3
