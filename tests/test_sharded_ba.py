"""Sharded global BA must agree with the single-device solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_refactored_tpu.geometry import se3
from orb_slam2_refactored_tpu.optim.ba import ba_solve
from orb_slam2_refactored_tpu.parallel.sharded_ba import (
    make_mesh,
    pad_problem,
    sharded_ba_solve,
)

from test_ba import build_problem


@pytest.mark.skipif(jax.device_count() < 2, reason="needs multi-device mesh")
class TestShardedBA:
    def test_matches_single_device(self):
        rng = np.random.default_rng(0)
        cam, prob, poses_gt, _ = build_problem(rng, K=8, P=64, N=64)
        mesh = make_mesh()
        res_s = sharded_ba_solve(prob, cam, mesh, iters=8, cg_iters=30)
        res_1 = ba_solve(prob, cam, iters=8, cg_iters=30)
        np.testing.assert_allclose(
            np.asarray(res_s.kf_pose), np.asarray(res_1.kf_pose), atol=1e-3
        )
        np.testing.assert_allclose(
            float(res_s.final_cost), float(res_1.final_cost), rtol=1e-2
        )

    def test_padding_neutral(self):
        rng = np.random.default_rng(1)
        cam, prob, poses_gt, _ = build_problem(rng, K=6, P=64, N=64)  # 6 % 8 != 0
        mesh = make_mesh()
        res_s = sharded_ba_solve(prob, cam, mesh, iters=6, cg_iters=25)
        res_1 = ba_solve(prob, cam, iters=6, cg_iters=25)
        assert res_s.kf_pose.shape[0] == 6
        np.testing.assert_allclose(
            np.asarray(res_s.kf_pose), np.asarray(res_1.kf_pose), atol=1e-3
        )

    def test_converges_on_mesh(self):
        rng = np.random.default_rng(2)
        cam, prob, poses_gt, _ = build_problem(rng, K=8, P=64, N=64, px_noise=0.0)
        mesh = make_mesh()
        res = sharded_ba_solve(prob, cam, mesh, iters=15, cg_iters=40)
        err = np.asarray(se3.boxminus(res.kf_pose, jnp.asarray(poses_gt)))
        assert np.linalg.norm(err, axis=1).max() < 1e-3
