"""Tests for the Schur-CG bundle adjustment solver."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_refactored_tpu.geometry import projection, se3
from orb_slam2_refactored_tpu.optim.ba import BAProblem, ba_solve


def build_problem(rng, K=6, P=64, N=64, stereo=True, pose_noise=0.03,
                  pt_noise=0.05, px_noise=0.3, outlier_frac=0.0):
    """Well-posed BA problem: every frame observes every point (visibility
    permitting), so poses are strongly coupled through shared landmarks."""
    cam = projection.CameraIntrinsics.create(400.0, 400.0, 160.0, 120.0, bf=32.0)
    pts_gt = np.stack(
        [rng.uniform(-2, 2, P), rng.uniform(-1.5, 1.5, P), rng.uniform(4, 9, P)],
        -1,
    ).astype(np.float32)
    poses_gt = []
    for k in range(K):
        tau = np.zeros(6, np.float32)
        tau[3] = 0.25 * k  # translate along x
        tau[1] = 0.02 * k
        poses_gt.append(np.asarray(se3.exp(jnp.asarray(tau))))
    poses_gt = np.stack(poses_gt)

    obs_uv = np.zeros((K, N, 2), np.float32)
    obs_ur = -np.ones((K, N), np.float32)
    obs_pt = np.full((K, N), -1, np.int32)
    for k in range(K):
        sel = rng.permutation(P)[:N] if P > N else np.arange(P)
        xc = np.asarray(se3.transform(jnp.asarray(poses_gt[k]), jnp.asarray(pts_gt[sel])))
        uvr = np.asarray(projection.project_stereo(cam, jnp.asarray(xc)))
        vis = (xc[:, 2] > 0.5) & (np.abs(uvr[:, 0] - 160) < 170) & (np.abs(uvr[:, 1] - 120) < 130)
        obs_pt[k, vis] = sel[vis]
        obs_uv[k] = uvr[:, :2] + rng.normal(0, px_noise, (N, 2))
        if stereo:
            obs_ur[k] = uvr[:, 2] + rng.normal(0, px_noise, N)
    n_out = int(outlier_frac * K * N)
    if n_out:
        ks = rng.integers(0, K, n_out)
        ns = rng.integers(0, N, n_out)
        obs_uv[ks, ns] += rng.uniform(30, 90, (n_out, 2))

    # perturb initial estimates
    poses0 = poses_gt.copy()
    for k in range(1, K):
        d = rng.normal(0, pose_noise, 6).astype(np.float32)
        poses0[k] = np.asarray(se3.retract(jnp.asarray(poses_gt[k]), jnp.asarray(d)))
    pts0 = pts_gt + rng.normal(0, pt_noise, pts_gt.shape).astype(np.float32)

    fixed = np.zeros(K, bool)
    fixed[0] = True
    prob = BAProblem(
        kf_pose=jnp.asarray(poses0),
        kf_fixed=jnp.asarray(fixed),
        obs_uv=jnp.asarray(obs_uv),
        obs_ur=jnp.asarray(obs_ur),
        obs_pt=jnp.asarray(obs_pt),
        obs_inv_s2=jnp.ones((K, N), jnp.float32),
        pt_pos=jnp.asarray(pts0),
        pt_valid=jnp.ones(P, bool),
    )
    return cam, prob, poses_gt, pts_gt


class TestBA:
    def test_exact_recovery_zero_noise(self):
        """With noiseless observations BA must recover GT to float precision."""
        rng = np.random.default_rng(0)
        cam, prob, poses_gt, pts_gt = build_problem(rng, px_noise=0.0)
        res = ba_solve(prob, cam, iters=20, cg_iters=60)
        err = np.asarray(se3.boxminus(res.kf_pose, jnp.asarray(poses_gt)))
        assert np.linalg.norm(err, axis=1).max() < 1e-4
        assert float(res.final_cost) < 1e-4

    def test_reduces_cost_and_recovers_poses(self):
        rng = np.random.default_rng(0)
        cam, prob, poses_gt, pts_gt = build_problem(rng)
        res = ba_solve(prob, cam, iters=12, cg_iters=40)
        assert float(res.final_cost) < 0.05 * float(res.initial_cost)
        err = np.asarray(se3.boxminus(res.kf_pose, jnp.asarray(poses_gt)))
        # statistical limit of this geometry is ~1e-2 (verified: zero-noise
        # run recovers to 1e-7); require a clear reduction vs the 0.03
        # per-component injected perturbation
        assert np.linalg.norm(err, axis=1).max() < 2e-2
        # fixed frame untouched
        np.testing.assert_allclose(
            np.asarray(res.kf_pose[0]), poses_gt[0], atol=1e-7
        )

    def test_improves_points(self):
        rng = np.random.default_rng(1)
        cam, prob, poses_gt, pts_gt = build_problem(rng, pt_noise=0.08)
        res = ba_solve(prob, cam, iters=12, cg_iters=40)
        # only points with observations improve; measure those
        obs_pts = np.unique(np.asarray(prob.obs_pt)[np.asarray(prob.obs_pt) >= 0])
        err0 = np.linalg.norm(np.asarray(prob.pt_pos)[obs_pts] - pts_gt[obs_pts], axis=1)
        err1 = np.linalg.norm(np.asarray(res.pt_pos)[obs_pts] - pts_gt[obs_pts], axis=1)
        assert np.median(err1) < 0.3 * np.median(err0)

    def test_mono_only(self):
        rng = np.random.default_rng(2)
        cam, prob, poses_gt, pts_gt = build_problem(rng, stereo=False)
        res = ba_solve(prob, cam, iters=12, cg_iters=40)
        assert float(res.final_cost) < 0.3 * float(res.initial_cost)

    def test_outlier_gate(self):
        rng = np.random.default_rng(3)
        cam, prob, poses_gt, pts_gt = build_problem(rng, outlier_frac=0.05)
        res = ba_solve(prob, cam, iters=12, cg_iters=40)
        err = np.asarray(se3.boxminus(res.kf_pose, jnp.asarray(poses_gt)))
        assert np.linalg.norm(err, axis=1).max() < 2e-2
        inl = np.asarray(res.obs_inlier)
        ok0 = np.asarray(prob.obs_pt) >= 0
        assert inl.sum() < ok0.sum()  # some observations flagged out

    def test_jittable(self):
        rng = np.random.default_rng(4)
        cam, prob, poses_gt, _ = build_problem(rng, K=4, P=100, N=32)
        f = jax.jit(lambda pr: ba_solve(pr, cam, iters=6, cg_iters=25))
        res = f(prob)
        assert float(res.final_cost) < float(res.initial_cost)


class TestAnalyticJacobians:
    def test_match_autodiff(self):
        """The analytic Jacobians must equal vmapped jacfwd on the same
        residual (regression guard for the closed-form rewrite)."""
        import jax
        from orb_slam2_refactored_tpu.optim.ba import (
            BAProblem, _residual_one, _residuals_jacobians,
        )
        from orb_slam2_refactored_tpu.geometry import projection as proj
        from orb_slam2_refactored_tpu.geometry import se3

        rng = np.random.default_rng(0)
        K, N, P = 3, 8, 16
        cam = proj.CameraIntrinsics.create(260.0, 260.0, 160.0, 120.0, bf=20.0)
        tang = jnp.asarray(rng.normal(0, 0.2, (K, 6)).astype(np.float32))
        poses = jax.vmap(se3.exp)(tang)
        pts = jnp.asarray(
            rng.uniform(-1, 1, (P, 3)).astype(np.float32) + np.array([0, 0, 3.0], np.float32)
        )
        obs_pt = jnp.asarray(rng.integers(-1, P, (K, N)), jnp.int32)
        obs_uv = jnp.asarray(rng.uniform(0, 320, (K, N, 2)).astype(np.float32))
        obs_ur = jnp.asarray(
            np.where(rng.random((K, N)) < 0.5, rng.uniform(0, 320, (K, N)), -1.0).astype(np.float32)
        )
        p = BAProblem(
            kf_pose=poses, kf_fixed=jnp.zeros((K,), bool), obs_uv=obs_uv,
            obs_ur=obs_ur, obs_pt=obs_pt, obs_inv_s2=jnp.ones((K, N)),
            pt_pos=pts, pt_valid=jnp.ones((P,), bool),
        )
        r, Jp, Jl = _residuals_jacobians(poses, pts, p, cam)

        has_ur = p.obs_ur > 0
        pt_idx = jnp.clip(p.obs_pt, 0, P - 1)
        gathered = pts[pt_idx]

        def obs_fn(pose, pt, uv, ur, h):
            def f(dp, dl):
                return _residual_one(se3.retract(pose, dp), pt + dl, uv, ur, h, cam)
            z6, z3 = jnp.zeros(6), jnp.zeros(3)
            return f(z6, z3), jax.jacfwd(f, 0)(z6, z3), jax.jacfwd(f, 1)(z6, z3)

        fn = jax.vmap(jax.vmap(obs_fn, in_axes=(None, 0, 0, 0, 0)),
                      in_axes=(0, 0, 0, 0, 0))
        r2, Jp2, Jl2 = fn(poses, gathered, p.obs_uv, p.obs_ur, has_ur)
        np.testing.assert_allclose(np.asarray(r), np.asarray(r2), atol=1e-4)
        np.testing.assert_allclose(np.asarray(Jp), np.asarray(Jp2), atol=2e-2, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(Jl), np.asarray(Jl2), atol=2e-2, rtol=1e-3)

    def test_inv3x3(self):
        from orb_slam2_refactored_tpu.optim.ba import _inv3x3
        rng = np.random.default_rng(1)
        A = rng.normal(0, 1, (64, 3, 3)).astype(np.float32)
        A = A @ A.transpose(0, 2, 1) + 0.5 * np.eye(3)  # SPD, well-conditioned
        Ainv = np.asarray(_inv3x3(jnp.asarray(A)))
        np.testing.assert_allclose(
            Ainv @ A, np.tile(np.eye(3, dtype=np.float32), (64, 1, 1)),
            atol=2e-3,
        )
