"""Lens-distortion frontend: keypoints undistorted after extraction.

The reference undistorts every keypoint before geometry touches it
(`/root/reference/src/System.cc:153-174`) and gates the frustum on the
undistorted image bounds (`:177-195`). Oracle: a sequence rendered through a
TUM-fr1-like lens (k1=0.26) tracks with ATE close to the distortion-free run
of the same trajectory — without undistortion the warp (tens of pixels at the
borders) wrecks the geometry.
"""

import numpy as np
import pytest

from orb_slam2_refactored_tpu.geometry.projection import (
    CameraIntrinsics, DistCoeffs, distort_normalized, image_bounds_np,
    undistort_points, undistort_points_np,
)
from orb_slam2_refactored_tpu.io.evaluation import ate_rmse
from orb_slam2_refactored_tpu.io.synthetic import (
    SyntheticScene, box_room, orbit_trajectory,
)
from orb_slam2_refactored_tpu.slam.map_state import MapCapacity
from orb_slam2_refactored_tpu.slam.tracking import Tracker, TrackerConfig

# TUM fr1-like distortion (fr1 has k1~0.26, k2~-0.95, ...; the higher-order
# terms shrink the test's valid region, so only the dominant terms are used)
DIST = (0.26, -0.1, 0.001, 0.0005, 0.0)


class TestUndistortMath:
    def test_round_trip(self):
        """undistort(distort(x)) == x for the jax path and the host path."""
        import jax.numpy as jnp

        cam = CameraIntrinsics.create(260.0, 260.0, 160.0, 120.0)
        dist = DistCoeffs.create(*DIST)
        rng = np.random.default_rng(0)
        xn = rng.uniform(-0.45, 0.45, (200, 2)).astype(np.float32)
        xd = np.asarray(distort_normalized(dist, jnp.asarray(xn)))
        uv_d = np.stack([xd[:, 0] * 260.0 + 160.0, xd[:, 1] * 260.0 + 120.0], -1)
        uv_und = np.asarray(undistort_points(cam, dist, jnp.asarray(uv_d)))
        uv_true = np.stack([xn[:, 0] * 260.0 + 160.0, xn[:, 1] * 260.0 + 120.0], -1)
        np.testing.assert_allclose(uv_und, uv_true, atol=0.05)

        uv_und_np = undistort_points_np(260.0, 260.0, 160.0, 120.0, DIST, uv_d)
        np.testing.assert_allclose(uv_und_np, uv_true, atol=0.05)

    def test_image_bounds_expand(self):
        """Barrel distortion (k1>0 pincushion in this convention) changes the
        undistorted bounds away from the raw image rectangle."""
        b = image_bounds_np(260.0, 260.0, 160.0, 120.0, DIST, 320, 240)
        assert b != (0.0, 320.0, 0.0, 240.0)
        assert b[0] < b[1] and b[2] < b[3]

    def test_renderer_warps(self):
        """The distorting renderer must actually move image content."""
        planes = box_room(half_x=1.5, half_y=1.2, z_far=2.5, z_near=-2.5)
        pose = orbit_trajectory(4)[1]
        clean = SyntheticScene(width=320, height=240, fx=260.0, fy=260.0,
                               planes=planes)
        warped = SyntheticScene(width=320, height=240, fx=260.0, fy=260.0,
                                planes=planes, dist_coeffs=DIST)
        img_c, _ = clean.render(pose)
        img_w, _ = warped.render(pose)
        # centers nearly agree, borders differ strongly
        c = np.abs(img_c[110:130, 150:170] - img_w[110:130, 150:170]).mean()
        b = np.abs(img_c[:30, :60] - img_w[:30, :60]).mean()
        assert b > 4 * max(c, 1.0)


class TestDistortedTracking:
    @pytest.fixture(scope="class")
    def gt(self):
        return orbit_trajectory(30, radius=0.35, yaw_amp=0.25)

    def _run(self, gt, dist_render, dist_cfg):
        planes = box_room(half_x=1.5, half_y=1.2, z_far=2.5, z_near=-2.5)
        scene = SyntheticScene(width=320, height=240, fx=260.0, fy=260.0,
                               planes=planes, dist_coeffs=dist_render)
        cfg = TrackerConfig(
            width=320, height=240, fx=260.0, fy=260.0, cx=160.0, cy=120.0,
            bf=0.08 * 260.0, dist_coeffs=dist_cfg,
            n_features=600, n_levels=4, enable_local_ba=True,
            map_capacity=MapCapacity(max_keyframes=32, max_points=8192,
                                     max_features=600),
        )
        tracker = Tracker(cfg)
        for i in range(len(gt)):
            img, depth = scene.render(gt[i])
            tracker.track_rgbd(img, depth, timestamp=i / 30.0)
        assert tracker.state != 2, f"lost: {tracker.track_info[-3:]}"
        est = np.stack(tracker.trajectory)
        rmse, _ = ate_rmse(est, gt, align="se3")
        return rmse

    def test_distorted_matches_clean(self, gt):
        zero = (0.0, 0.0, 0.0, 0.0, 0.0)
        rmse_clean = self._run(gt, zero, zero)
        rmse_dist = self._run(gt, DIST, DIST)
        print(f"ATE clean {rmse_clean:.4f} m, distorted+undistort {rmse_dist:.4f} m")
        # undistorted run matches the clean run within noise
        assert rmse_dist < max(2.0 * rmse_clean, 0.025), (
            f"distorted ATE {rmse_dist:.4f} vs clean {rmse_clean:.4f}"
        )
