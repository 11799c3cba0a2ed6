"""End-to-end monocular SLAM on a synthetic sequence."""

import numpy as np
import pytest

from orb_slam2_refactored_tpu.io.evaluation import ate_rmse
from orb_slam2_refactored_tpu.io.synthetic import (
    SyntheticScene, box_room, orbit_trajectory,
)
from orb_slam2_refactored_tpu.slam.map_state import MapCapacity
from orb_slam2_refactored_tpu.slam.tracking import Tracker, TrackerConfig


class TestMonoSlam:
    def test_mono_sequence(self):
        planes = box_room(half_x=1.5, half_y=1.2, z_far=2.5, z_near=-2.5)
        scene = SyntheticScene(width=320, height=240, fx=260.0, fy=260.0,
                               planes=planes)
        n = 35
        gt = orbit_trajectory(n, radius=0.35, yaw_amp=0.3)
        cfg = TrackerConfig(
            width=320, height=240, fx=260.0, fy=260.0, cx=160.0, cy=120.0,
            n_features=600, n_levels=4, enable_local_ba=True, kf_ref_ratio=0.9,
            map_capacity=MapCapacity(max_keyframes=64, max_points=8192,
                                     max_features=600),
        )
        tracker = Tracker(cfg)
        for i in range(n):
            img, _ = scene.render(gt[i])
            tracker.track_mono(img, timestamp=i / 30.0)
        assert tracker.state == 1, f"mono lost/uninitialized: {tracker.state}"
        assert len(tracker.graph.alive_kfs()) >= 2
        est = np.stack(tracker.trajectory)
        # monocular scale is unobservable: sim3 alignment; generous gate
        # (no loop closure in this short run, drift accumulates)
        rmse, _ = ate_rmse(est, gt[: len(est)], align="sim3")
        assert rmse < 0.3, f"mono ATE {rmse}"
        # triangulation must have populated the map beyond the bootstrap
        assert tracker.graph.pt_alive.sum() > 150
