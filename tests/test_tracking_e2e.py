"""End-to-end RGB-D odometry on a synthetic box-room sequence.

The oracle: ATE RMSE of the estimated trajectory against ground truth after
SE3 alignment must be small (sub-centimeter at this scale), mirroring how the
reference is validated on TUM fr1/desk (SURVEY.md §4).
"""

import numpy as np
import pytest

from orb_slam2_refactored_tpu.io.evaluation import ate_rmse, rpe
from orb_slam2_refactored_tpu.io.synthetic import SyntheticScene, orbit_trajectory
from orb_slam2_refactored_tpu.slam.map_state import MapCapacity
from orb_slam2_refactored_tpu.slam.tracking import Tracker, TrackerConfig


@pytest.fixture(scope="module")
def scene():
    return SyntheticScene(width=320, height=240, fx=260.0, fy=260.0)


class TestSynthetic:
    def test_renderer_depth_consistency(self, scene):
        """Rendered depth must agree with ray-plane geometry: reprojecting
        pixel+depth through the pose lands on a wall of the box."""
        poses = orbit_trajectory(4)
        img, depth = scene.render(poses[1])
        assert img.shape == (240, 320)
        assert (depth > 0).mean() > 0.99
        assert depth.min() > 0.3 and depth.max() < 20.0

    def test_texture_has_corners(self, scene):
        import jax.numpy as jnp

        from orb_slam2_refactored_tpu.ops import fast as fast_ops

        img, _ = scene.render(orbit_trajectory(4)[0])
        score = fast_ops.detect_two_threshold(jnp.asarray(img), 20.0, 7.0)
        assert (np.asarray(score) > 0).sum() > 200


class TestRgbdOdometry:
    def test_short_sequence_ate(self, scene):
        n = 30
        gt = orbit_trajectory(n, radius=0.5, yaw_amp=0.15)
        cfg = TrackerConfig(
            width=320, height=240, fx=260.0, fy=260.0, cx=160.0, cy=120.0,
            bf=0.08 * 260.0, n_features=600, n_levels=4,
            map_capacity=MapCapacity(max_keyframes=32, max_points=8192,
                                     max_features=600),
        )
        tracker = Tracker(cfg)
        for i in range(n):
            img, depth = scene.render(gt[i])
            tracker.track_rgbd(img, depth, timestamp=i / 30.0)
        est = np.stack(tracker.trajectory)
        assert tracker.state != 2, f"tracker lost: {tracker.track_info[-3:]}"
        rmse, err = ate_rmse(est, gt, align="se3")
        t_rpe, r_rpe = rpe(est, gt)
        print(f"ATE RMSE {rmse:.4f} m, RPE {t_rpe:.4f} m/frame, {r_rpe:.5f} rad")
        assert rmse < 0.03, f"ATE {rmse} too large; info={tracker.track_info[-5:]}"
        assert len(tracker.graph.alive_kfs()) >= 1
