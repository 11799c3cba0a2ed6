"""Unit tests for SE3 / Sim3 / projection numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_refactored_tpu.geometry import se3, sim3, projection


def random_pose(key):
    k1, k2 = jax.random.split(key)
    q = se3.quat_normalize(jax.random.normal(k1, (4,)))
    q = jnp.where(q[0] < 0, -q, q)
    t = jax.random.normal(k2, (3,))
    return se3.make(q, t)


class TestSE3:
    def test_identity(self):
        p = se3.identity()
        x = jnp.array([1.0, 2.0, 3.0])
        np.testing.assert_allclose(se3.transform(p, x), x, atol=1e-6)

    def test_compose_inverse(self):
        key = jax.random.PRNGKey(0)
        a = random_pose(key)
        ainv = se3.inverse(a)
        ident = se3.compose(a, ainv)
        np.testing.assert_allclose(
            np.asarray(ident), np.asarray(se3.identity()), atol=1e-5
        )

    def test_compose_matches_matrix(self):
        key = jax.random.PRNGKey(1)
        ka, kb = jax.random.split(key)
        a, b = random_pose(ka), random_pose(kb)
        m = se3.to_matrix(se3.compose(a, b))
        m_ref = se3.to_matrix(a) @ se3.to_matrix(b)
        np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref), atol=1e-5)

    def test_matrix_roundtrip(self):
        key = jax.random.PRNGKey(2)
        for i in range(5):
            p = random_pose(jax.random.fold_in(key, i))
            p2 = se3.from_matrix(se3.to_matrix(p))
            np.testing.assert_allclose(np.asarray(p), np.asarray(p2), atol=1e-5)

    def test_transform_batch(self):
        key = jax.random.PRNGKey(3)
        p = random_pose(key)
        xs = jax.random.normal(jax.random.fold_in(key, 7), (11, 3))
        got = se3.transform(p, xs)
        R = se3.quat_to_matrix(se3.rotation(p))
        want = xs @ np.asarray(R).T + np.asarray(se3.translation(p))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(4)
        # rotation magnitude must stay below pi (log returns principal branch)
        for scale in [1e-8, 1e-4, 0.1, 0.5, 1.2]:
            tau = jax.random.normal(key, (6,))
            tau = tau / jnp.linalg.norm(tau[:3]) * scale
            tau2 = se3.log(se3.exp(tau))
            np.testing.assert_allclose(np.asarray(tau), np.asarray(tau2), atol=1e-4)

    def test_exp_zero(self):
        p = se3.exp(jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(p), np.asarray(se3.identity()), atol=1e-7)

    def test_retract_boxminus(self):
        key = jax.random.PRNGKey(5)
        p = random_pose(key)
        delta = jax.random.normal(jax.random.fold_in(key, 1), (6,)) * 0.3
        q = se3.retract(p, delta)
        np.testing.assert_allclose(
            np.asarray(se3.boxminus(q, p)), np.asarray(delta), atol=1e-4
        )

    def test_batched_poses(self):
        key = jax.random.PRNGKey(6)
        poses = jnp.stack([random_pose(jax.random.fold_in(key, i)) for i in range(4)])
        inv = se3.inverse(poses)
        ident = se3.compose(poses, inv)
        np.testing.assert_allclose(
            np.asarray(ident), np.tile(np.asarray(se3.identity()), (4, 1)), atol=1e-5
        )


class TestSim3:
    def test_identity_scale(self):
        g = sim3.identity()
        assert float(sim3.scale(g)) == pytest.approx(1.0)

    def test_transform_scales(self):
        g = sim3.make(jnp.array([1.0, 0, 0, 0]), jnp.zeros(3), jnp.array(2.0))
        x = jnp.array([1.0, 1.0, 1.0])
        np.testing.assert_allclose(np.asarray(sim3.transform(g, x)), [2, 2, 2], atol=1e-6)

    def test_compose_inverse(self):
        key = jax.random.PRNGKey(7)
        p = random_pose(key)
        g = sim3.from_se3(p, jnp.array(1.7))
        ident = sim3.compose(g, sim3.inverse(g))
        np.testing.assert_allclose(
            np.asarray(ident), np.asarray(sim3.identity()), atol=1e-5
        )

    def test_compose_action(self):
        key = jax.random.PRNGKey(8)
        ga = sim3.from_se3(random_pose(key), jnp.array(1.3))
        gb = sim3.from_se3(random_pose(jax.random.fold_in(key, 1)), jnp.array(0.8))
        x = jax.random.normal(jax.random.fold_in(key, 2), (5, 3))
        lhs = sim3.transform(sim3.compose(ga, gb), x)
        rhs = sim3.transform(ga, sim3.transform(gb, x))
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)


class TestProjection:
    def setup_method(self):
        self.cam = projection.CameraIntrinsics.create(517.3, 516.5, 318.6, 255.3, bf=40.0)

    def test_project_unproject(self):
        uv = jnp.array([[100.0, 200.0], [320.0, 240.0]])
        depth = jnp.array([2.0, 5.0])
        xc = projection.unproject(self.cam, uv, depth)
        uv2 = projection.project(self.cam, xc)
        np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-4)

    def test_stereo_disparity(self):
        xc = jnp.array([[0.5, 0.2, 2.0]])
        uvr = projection.project_stereo(self.cam, xc)
        disparity = uvr[0, 0] - uvr[0, 2]
        np.testing.assert_allclose(float(disparity), 40.0 / 2.0, atol=1e-4)

    def test_undistort_roundtrip(self):
        dist = projection.DistCoeffs.create(k1=0.26, k2=-0.57, p1=0.0005, p2=0.0002)
        uv = jnp.array([[100.0, 120.0], [320.0, 240.0], [500.0, 400.0]])
        # distort normalized true points, then undistort back
        xn = jnp.stack(
            [(uv[:, 0] - self.cam.cx) / self.cam.fx, (uv[:, 1] - self.cam.cy) / self.cam.fy],
            axis=-1,
        )
        xd = projection.distort_normalized(dist, xn)
        uv_dist = jnp.stack(
            [xd[:, 0] * self.cam.fx + self.cam.cx, xd[:, 1] * self.cam.fy + self.cam.cy],
            axis=-1,
        )
        uv_und = projection.undistort_points(self.cam, dist, uv_dist, iters=10)
        np.testing.assert_allclose(np.asarray(uv_und), np.asarray(uv), atol=0.05)

    def test_project_world(self):
        key = jax.random.PRNGKey(9)
        pose = random_pose(key)
        xw = jnp.array([[0.0, 0.0, 4.0]])
        uv, z = projection.project_world(self.cam, pose, xw)
        xc = se3.transform(pose, xw)
        np.testing.assert_allclose(float(z[0]), float(xc[0, 2]), atol=1e-5)
