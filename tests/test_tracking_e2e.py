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


from orb_slam2_refactored_tpu.io.synthetic import box_room


@pytest.fixture(scope="module")
def scene():
    return SyntheticScene(width=320, height=240, fx=260.0, fy=260.0)


@pytest.fixture(scope="module")
def close_scene():
    """TUM-fr1-like conditioning: depths ~0.8-2.5 m."""
    planes = box_room(half_x=1.5, half_y=1.2, z_far=2.5, z_near=-2.5)
    return SyntheticScene(width=320, height=240, fx=260.0, fy=260.0, planes=planes)


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
            bf=0.08 * 260.0, n_features=600, n_levels=4, enable_local_ba=False,
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

    def test_local_ba_improves_noisy_depth(self, close_scene):
        """With realistic depth noise and close-range geometry, local BA must
        not degrade the trajectory (regression guard for the slot-aliasing
        bug where culled point slots were recycled under stale kf_mp refs)."""
        n = 45
        gt = orbit_trajectory(n, radius=0.35, yaw_amp=0.3)
        rng = np.random.default_rng(7)
        frames = []
        for i in range(n):
            img, depth = close_scene.render(gt[i])
            frames.append(
                (img, depth * (1 + rng.normal(0, 0.01, depth.shape).astype(np.float32)))
            )
        results = {}
        for ba in (False, True):
            cfg = TrackerConfig(
                width=320, height=240, fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                bf=0.08 * 260.0, n_features=600, n_levels=4, enable_local_ba=ba,
                local_ba_iters=5, local_ba_cg_iters=25,
                map_capacity=MapCapacity(max_keyframes=64, max_points=8192,
                                         max_features=600),
            )
            tracker = Tracker(cfg)
            for img, depth in frames:
                tracker.track_rgbd(img, depth)
            est = np.stack(tracker.trajectory)
            results[ba], _ = ate_rmse(est, gt, align="se3")
        print(f"ATE no-BA {results[False]:.4f}, BA {results[True]:.4f}")
        # BA optimizes reprojection consistency, not ground-truth ATE: with
        # 1% correlated depth noise on a 4-KF map the reprojection optimum
        # sits a few mm from the GT optimum (verified identical between the
        # windowed and full-map formulations). The guard catches the
        # catastrophic slot-aliasing failure mode (ATE blows up >2x / >4cm),
        # not millimeter-level estimator bias.
        assert results[True] < max(2.0 * results[False], 0.04)

    def test_depth_subsample_matches_full_res(self, close_scene):
        """depth_subsample=2 (half-res depth upload, nearest sampling on
        device) must track with ATE in the same band as full-res depth —
        the guard for the bandwidth-saving upload mode used by bench.py."""
        n = 40
        gt = orbit_trajectory(n, radius=0.35, yaw_amp=0.25)
        rng = np.random.default_rng(11)
        frames = []
        for i in range(n):
            img, depth = close_scene.render(gt[i])
            frames.append(
                (img, depth * (1 + rng.normal(0, 0.01, depth.shape).astype(np.float32)))
            )
        results = {}
        for sub in (1, 2):
            cfg = TrackerConfig(
                width=320, height=240, fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                bf=0.08 * 260.0, n_features=600, n_levels=4,
                depth_subsample=sub,
                map_capacity=MapCapacity(max_keyframes=64, max_points=8192,
                                         max_features=600),
            )
            tracker = Tracker(cfg)
            for img, depth in frames:
                tracker.track_rgbd(img, depth)
            assert tracker.state != 2
            est = np.stack(tracker.trajectory)
            results[sub], _ = ate_rmse(est, gt, align="se3")
        print(f"ATE full-res {results[1]:.4f}, half-res depth {results[2]:.4f}")
        assert results[2] < max(1.5 * results[1], 0.02)


class TestLog8Depth:
    def test_log8_roundtrip_precision(self):
        """log8 wire format: +-0.8% relative depth error over [0.25, 16] m,
        0 = invalid, exact invalid/valid preservation (bench.py uploads
        RGB-D depth this way — the ATE gate there is the e2e check)."""
        import jax.numpy as jnp

        from orb_slam2_refactored_tpu.slam.map_state import MapCapacity
        from orb_slam2_refactored_tpu.slam.tracking import Tracker, TrackerConfig

        cfg = TrackerConfig(
            width=64, height=48, fx=50.0, fy=50.0, cx=32.0, cy=24.0,
            bf=4.0, n_features=64, n_levels=2, depth_encoding="log8",
            map_capacity=MapCapacity(max_keyframes=4, max_points=256,
                                     max_features=64),
        )
        t = Tracker(cfg)
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (48, 64)).astype(np.uint8)
        depth = rng.uniform(0.3, 12.0, (48, 64)).astype(np.float32)
        depth[10:14, 20:30] = 0.0  # invalid holes
        buf = t._pack_rgbd(img, depth)
        img2, dep2 = t._unpack_impl(jnp.asarray(buf))
        np.testing.assert_array_equal(np.asarray(img2), img)
        d2 = np.asarray(dep2)
        assert (d2[10:14, 20:30] == 0).all()
        pos = depth > 0
        rel = np.abs(d2[pos] - depth[pos]) / depth[pos]
        assert rel.max() < 0.01, rel.max()
