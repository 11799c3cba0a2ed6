"""Tests for Sim3 essential-graph optimization."""

import jax.numpy as jnp
import numpy as np

from orb_slam2_refactored_tpu.geometry import se3, sim3
from orb_slam2_refactored_tpu.optim.pose_graph import (
    PoseGraphProblem, edge_measurement, pose_graph_solve,
)


def ring_problem(K=16, drift=0.05, scale_drift=0.02, seed=0):
    """Odometry ring with accumulated drift + one loop edge closing it.

    GT: poses around a circle. Estimates: GT perturbed by accumulated drift.
    Edges: consecutive (from GT measurements = drift-free odometry is not
    realistic, so measurements come from the DRIFTED chain) + loop edge 0-K+1
    from GT (the loop closure 'correct' measurement).
    """
    rng = np.random.default_rng(seed)
    gt = []
    for k in range(K):
        a = 2 * np.pi * k / K
        tau = np.array([0, a, 0, np.sin(a), 0.0, 1 - np.cos(a)], np.float32)
        gt.append(np.asarray(sim3.from_se3(se3.exp(jnp.asarray(tau)))))
    gt = np.stack(gt)

    # drifted estimates: chain the GT relative motions with noise injected
    est = [gt[0]]
    for k in range(1, K):
        rel_gt = edge_measurement(jnp.asarray(gt[k]), jnp.asarray(gt[k - 1]))
        noise = np.zeros(7, np.float32)
        noise[:6] = rng.normal(0, drift, 6)
        noise[6] = rng.normal(0, scale_drift)
        rel_noisy = sim3.compose(sim3.exp(jnp.asarray(noise)), rel_gt)
        est.append(np.asarray(sim3.compose(rel_noisy, jnp.asarray(est[-1]))))
    est = np.stack(est)

    # edges: odometry chain measured from the DRIFTED estimates (consistent
    # with them) + one loop edge measured from GT (the new, correct info)
    ei, ej, rel, w = [], [], [], []
    for k in range(1, K):
        ei.append(k); ej.append(k - 1)
        rel.append(np.asarray(edge_measurement(jnp.asarray(est[k]), jnp.asarray(est[k - 1]))))
        w.append(1.0)
    ei.append(K - 1); ej.append(0)
    rel.append(np.asarray(edge_measurement(jnp.asarray(gt[K - 1]), jnp.asarray(gt[0]))))
    w.append(1.0)

    fixed = np.zeros(K, bool)
    fixed[0] = True
    prob = PoseGraphProblem(
        poses=jnp.asarray(est),
        fixed=jnp.asarray(fixed),
        edge_i=jnp.asarray(ei, jnp.int32),
        edge_j=jnp.asarray(ej, jnp.int32),
        edge_rel=jnp.asarray(np.stack(rel)),
        edge_w=jnp.asarray(w, jnp.float32),
    )
    return prob, gt, est


class TestPoseGraph:
    def test_loop_closure_reduces_drift(self):
        prob, gt, est = ring_problem()
        poses, c0, c1 = pose_graph_solve(prob, iters=20, cg_iters=40)
        poses = np.asarray(poses)
        # the loop edge error should be (nearly) distributed away
        assert float(c1) < 0.2 * float(c0)

        def t_err(a, b):
            return np.linalg.norm(
                np.asarray(sim3.translation(jnp.asarray(a)))
                - np.asarray(sim3.translation(jnp.asarray(b))), axis=-1,
            )

        # end-of-loop keyframe must be pulled toward GT
        before = t_err(est[-1], gt[-1])
        after = t_err(poses[-1], gt[-1])
        assert after < 0.6 * before

    def test_consistent_graph_stays(self):
        prob, gt, est = ring_problem(drift=0.0, scale_drift=0.0)
        poses, c0, c1 = pose_graph_solve(prob, iters=5, cg_iters=20)
        assert float(c0) < 1e-6
        np.testing.assert_allclose(np.asarray(poses), est, atol=1e-4)

    def test_scale_drift_corrected(self):
        prob, gt, est = ring_problem(drift=0.01, scale_drift=0.08, seed=3)
        poses, c0, c1 = pose_graph_solve(prob, iters=25, cg_iters=40)
        s_before = float(sim3.scale(jnp.asarray(est[-1])))
        s_after = float(sim3.scale(jnp.asarray(np.asarray(poses)[-1])))
        s_gt = float(sim3.scale(jnp.asarray(gt[-1])))
        assert abs(s_after - s_gt) < 0.6 * abs(s_before - s_gt)
