"""OptimizeSim3: relative-Sim3 refinement over paired reprojections.

Oracle (reference `Optimizer::OptimizeSim3`,
`/root/reference/src/Optimizer.cc:944-1100`): starting from a noisy Horn
estimate, LM over both-image reprojections must recover the true similarity
more accurately than the 3-point closed form on noisy matches, and its chi2
gate must reject planted outliers.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam2_refactored_tpu.geometry import projection as proj
from orb_slam2_refactored_tpu.geometry import se3, sim3
from orb_slam2_refactored_tpu.optim.sim3_opt import optimize_sim3
from orb_slam2_refactored_tpu.solvers.ransac import horn_ransac

CAM = proj.CameraIntrinsics.create(260.0, 260.0, 160.0, 120.0, bf=0.0)


def make_problem(n=120, scale=1.0, noise_px=1.0, outlier_frac=0.0, seed=0):
    """Two camera views of one point cloud related by a known Sim3."""
    rng = np.random.default_rng(seed)
    # points in camera-1 frame, in front of the camera
    x1 = np.stack([
        rng.uniform(-1.2, 1.2, n), rng.uniform(-0.9, 0.9, n),
        rng.uniform(1.5, 4.0, n),
    ], -1).astype(np.float32)
    # true S12 maps cam-2 coords to cam-1 coords
    rotvec = np.array([0.05, -0.3, 0.08], np.float32)
    t = np.array([0.4, -0.1, 0.2], np.float32)
    S_true = np.asarray(sim3.make(
        jnp.asarray(se3.exp(jnp.concatenate(
            [jnp.asarray(rotvec), jnp.zeros(3)]))[0:4])[None],
        jnp.asarray(t)[None], jnp.asarray([scale]),
    ))[0]
    x2 = np.asarray(jax.vmap(lambda p: sim3.transform(
        jnp.asarray(sim3.inverse(jnp.asarray(S_true))), p))(jnp.asarray(x1)))
    # observations with pixel noise
    uv1 = np.array(proj.project(CAM, jnp.asarray(x1)))
    uv2 = np.array(proj.project(CAM, jnp.asarray(x2)))
    uv1 += rng.normal(0, noise_px, uv1.shape)
    uv2 += rng.normal(0, noise_px, uv2.shape)
    n_out = int(outlier_frac * n)
    if n_out:
        sel = rng.choice(n, n_out, replace=False)
        uv1[sel] += rng.uniform(30, 80, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    return (jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(uv1),
            jnp.asarray(uv2), S_true, sel if n_out else np.array([], int))


def sim3_err(S_est, S_true):
    d = np.asarray(sim3.log(sim3.compose(
        jnp.asarray(S_est), sim3.inverse(jnp.asarray(S_true)))))
    return np.linalg.norm(d[:3]), np.linalg.norm(d[3:6]), abs(d[6])


class TestOptimizeSim3:
    def test_refines_noisy_horn(self):
        x1, x2, uv1, uv2, S_true, _ = make_problem(noise_px=1.5, scale=1.0)
        n = x1.shape[0]
        valid = jnp.ones((n,), bool)
        # Horn on HEAVILY corrupted 3D pairs (triangulated-point-grade error:
        # 6cm sigma) — the pixel observations carry only 1.5px noise, so the
        # reprojection refinement has far better information than the 3D fit
        rng = np.random.default_rng(3)
        x1n = x1 + jnp.asarray(rng.normal(0, 0.06, (n, 3)).astype(np.float32))
        res = horn_ransac(x2, x1n, valid, jax.random.PRNGKey(0),
                          with_scale=False, inlier_th=0.09, min_inliers=20)
        assert bool(res.success)
        S0 = sim3.from_se3(res.pose, res.scale)
        r = optimize_sim3(S0, x1, x2, uv1, uv2,
                          jnp.ones((n,)), jnp.ones((n,)), valid, CAM,
                          fix_scale=True, rounds=3, iters_per_round=8)
        rot0, t0, s0 = sim3_err(np.asarray(S0), S_true)
        rot1, t1, s1 = sim3_err(np.asarray(r.S), S_true)
        print(f"horn rot {rot0:.4f} t {t0:.4f} | refined rot {rot1:.4f} t {t1:.4f}")
        assert int(r.num_inliers) > 0.8 * n
        # combined pose error must improve (reprojection beats noisy 3D)
        assert rot1 + t1 < rot0 + t0

    def test_rejects_outliers(self):
        x1, x2, uv1, uv2, S_true, out_idx = make_problem(
            noise_px=1.0, outlier_frac=0.2, seed=5)
        n = x1.shape[0]
        valid = jnp.ones((n,), bool)
        S0 = sim3.retract(jnp.asarray(sim3.from_se3(jnp.asarray(
            [1, 0, 0, 0, 0, 0, 0], ), None)), jnp.zeros(7))
        # start from the TRUE S perturbed slightly
        S0 = sim3.retract(jnp.asarray(S_true),
                          jnp.asarray([0.01, -0.02, 0.01, 0.03, 0.01, -0.02, 0.0]))
        r = optimize_sim3(S0, x1, x2, uv1, uv2,
                          jnp.ones((n,)), jnp.ones((n,)), valid, CAM,
                          fix_scale=True)
        inl = np.asarray(r.inliers)
        assert not inl[out_idx].any(), "planted outliers must fail the chi2 gate"
        rot1, t1, _ = sim3_err(np.asarray(r.S), S_true)
        assert rot1 < 0.01 and t1 < 0.02

    def test_recovers_scale_mono(self):
        x1, x2, uv1, uv2, S_true, _ = make_problem(noise_px=0.5, scale=1.25)
        n = x1.shape[0]
        valid = jnp.ones((n,), bool)
        # seed with WRONG scale 1.0
        S0 = jnp.asarray(S_true).at[7].set(0.0)
        r = optimize_sim3(S0, x1, x2, uv1, uv2,
                          jnp.ones((n,)), jnp.ones((n,)), valid, CAM,
                          fix_scale=False, rounds=3, iters_per_round=10)
        s_est = float(np.exp(np.asarray(r.S)[7]))
        print(f"scale est {s_est:.4f} (true 1.25)")
        assert abs(s_est - 1.25) < 0.04
