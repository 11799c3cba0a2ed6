"""Tests for monocular H/F RANSAC initialization."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_refactored_tpu.geometry import projection, se3
from orb_slam2_refactored_tpu.solvers.initializer import initialize


def make_pair(rng, planar=False, n=150, outlier_frac=0.1, noise=0.4):
    cam = projection.CameraIntrinsics.create(400.0, 400.0, 160.0, 120.0)
    if planar:
        # points on a plane z = 4 + 0.2x + 0.1y
        xy = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n)], -1)
        z = 4.0 + 0.2 * xy[:, 0] + 0.1 * xy[:, 1]
        pts = np.concatenate([xy, z[:, None]], -1).astype(np.float32)
    else:
        pts = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(3, 7, n)],
            -1,
        ).astype(np.float32)
    tau = np.array([0.02, -0.06, 0.01, 0.35, 0.05, 0.1], np.float32)
    pose2 = se3.exp(jnp.asarray(tau))  # frame1 = identity
    uv1 = np.array(projection.project(cam, jnp.asarray(pts)))
    xc2 = np.asarray(se3.transform(pose2, jnp.asarray(pts)))
    uv2 = np.array(projection.project(cam, jnp.asarray(xc2)))
    uv1 += rng.normal(0, noise, uv1.shape)
    uv2 += rng.normal(0, noise, uv2.shape)
    n_out = int(outlier_frac * n)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        uv2[idx] += rng.uniform(20, 60, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    valid = np.ones(n, bool)
    return cam, pts, np.asarray(pose2), uv1, uv2, valid


def relative_pose_error(est_pose21, gt_pose21):
    """Rotation error (rad) + translation direction angle (rad) — mono scale
    is unobservable so only the direction matters."""
    rot_err = np.linalg.norm(
        np.asarray(se3.boxminus(jnp.asarray(est_pose21), jnp.asarray(gt_pose21)))[:3]
    )
    t_est = np.asarray(se3.translation(jnp.asarray(est_pose21)))
    t_gt = np.asarray(se3.translation(jnp.asarray(gt_pose21)))
    cos = np.dot(t_est, t_gt) / (np.linalg.norm(t_est) * np.linalg.norm(t_gt) + 1e-12)
    return rot_err, float(np.arccos(np.clip(abs(cos), -1, 1)))


class TestMonoInit:
    def test_general_scene_uses_fundamental(self):
        rng = np.random.default_rng(0)
        cam, pts, pose2, uv1, uv2, valid = make_pair(rng, planar=False)
        res = initialize(
            jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
            jnp.asarray(valid), cam, jax.random.PRNGKey(0),
        )
        assert bool(res.success)
        assert not bool(res.used_homography)
        rot_err, dir_err = relative_pose_error(res.pose21, pose2)
        assert rot_err < 0.03
        assert dir_err < 0.12
        # triangulated structure: scaled version of GT for good points
        good = np.asarray(res.is_good)
        assert good.sum() > 80
        X = np.asarray(res.points3d)[good]
        ratio = X[:, 2] / pts[good][:, 2]
        assert np.std(ratio) / np.mean(ratio) < 0.12

    def test_planar_scene_uses_homography(self):
        rng = np.random.default_rng(1)
        cam, pts, pose2, uv1, uv2, valid = make_pair(rng, planar=True)
        res = initialize(
            jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
            jnp.asarray(valid), cam, jax.random.PRNGKey(1),
        )
        assert bool(res.used_homography)
        assert bool(res.success)
        rot_err, dir_err = relative_pose_error(res.pose21, pose2)
        assert rot_err < 0.04
        assert dir_err < 0.15

    def test_no_parallax_fails(self):
        """Pure rotation -> no triangulable structure -> must not succeed."""
        rng = np.random.default_rng(2)
        cam = projection.CameraIntrinsics.create(400.0, 400.0, 160.0, 120.0)
        pts = np.stack(
            [rng.uniform(-2, 2, 150), rng.uniform(-1.5, 1.5, 150), rng.uniform(3, 7, 150)],
            -1,
        ).astype(np.float32)
        pose2 = se3.exp(jnp.asarray(np.array([0.0, 0.08, 0, 0, 0, 0], np.float32)))
        uv1 = np.array(projection.project(cam, jnp.asarray(pts)))
        xc2 = np.asarray(se3.transform(pose2, jnp.asarray(pts)))
        uv2 = np.array(projection.project(cam, jnp.asarray(xc2)))
        uv1 += rng.normal(0, 0.3, uv1.shape)
        uv2 += rng.normal(0, 0.3, uv2.shape)
        res = initialize(
            jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
            jnp.ones(150, dtype=bool), cam, jax.random.PRNGKey(2),
        )
        assert not bool(res.success)
