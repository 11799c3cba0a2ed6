"""Stereo tracking e2e + pipelined-mode equivalence tests."""

import numpy as np
import pytest

from orb_slam2_refactored_tpu.io.evaluation import ate_rmse
from orb_slam2_refactored_tpu.io.synthetic import (
    SyntheticScene, box_room, orbit_trajectory,
)
from orb_slam2_refactored_tpu.slam.map_state import MapCapacity
from orb_slam2_refactored_tpu.slam.tracking import Tracker, TrackerConfig


@pytest.fixture(scope="module")
def stereo_frames():
    planes = box_room(half_x=1.5, half_y=1.2, z_far=2.5, z_near=-2.5)
    scene = SyntheticScene(width=320, height=240, fx=260.0, fy=260.0,
                           baseline=0.08, planes=planes)
    n = 25
    gt = orbit_trajectory(n, radius=0.3, yaw_amp=0.25)
    frames = [scene.render_stereo(gt[i]) for i in range(n)]
    return frames, gt


def make_cfg(**kw):
    base = dict(
        width=320, height=240, fx=260.0, fy=260.0, cx=160.0, cy=120.0,
        bf=0.08 * 260.0, n_features=600, n_levels=4,
        map_capacity=MapCapacity(max_keyframes=64, max_points=8192,
                                 max_features=600),
    )
    base.update(kw)
    return TrackerConfig(**base)


class TestStereo:
    def test_stereo_matcher_on_rendered_pair(self, stereo_frames):
        import jax.numpy as jnp

        from orb_slam2_refactored_tpu.ops.orb import OrbExtractor
        from orb_slam2_refactored_tpu.ops.stereo import stereo_match
        from orb_slam2_refactored_tpu.slam.frame import scale_factors

        frames, gt = stereo_frames
        left, right, depth_gt = frames[0]
        ex = OrbExtractor(240, 320, n_features=600, n_levels=4)
        lf = ex(jnp.asarray(left))
        rf = ex(jnp.asarray(right))
        sf, _, _ = scale_factors(4, 1.2)
        bf = 0.08 * 260.0
        u_right, depth, ok = stereo_match(
            lf.xy, lf.level, lf.desc, lf.valid,
            rf.xy, rf.level, rf.desc, rf.valid,
            sf, bf, min_z=bf / 260.0,
        )
        ok = np.asarray(ok)
        assert ok.sum() > 150
        # matched depths must agree with the renderer's depth at the keypoint
        xy = np.asarray(lf.xy)[ok]
        d_est = np.asarray(depth)[ok]
        d_true = depth_gt[
            np.clip(np.round(xy[:, 1]).astype(int), 0, 239),
            np.clip(np.round(xy[:, 0]).astype(int), 0, 319),
        ]
        rel_err = np.abs(d_est - d_true) / d_true
        assert np.median(rel_err) < 0.05

    def test_stereo_odometry(self, stereo_frames):
        frames, gt = stereo_frames
        tracker = Tracker(make_cfg())
        for i, (l, r, _) in enumerate(frames):
            tracker.track_stereo(l, r, timestamp=i / 30.0)
        assert tracker.state == 1
        est = np.stack(tracker.trajectory)
        rmse, _ = ate_rmse(est, gt, align="se3")
        print(f"stereo ATE {rmse:.4f}")
        # track_stereo rides the packed 8-BIT wire (one uint8 upload per
        # pair, round 5) like every real dataset's 8-bit images; quantizing
        # this fixture's float renders cost ~1.5 cm (0.044 f32 -> 0.059),
        # and adopting the reference's exact SAD gates (|deltaR|<=1
        # rejection + SAD median filter, src/ORBmatcher.cc:217,231-246)
        # won most of it back (0.0485). The scored VGA stereo bench keeps
        # its own hard 3 cm gate.
        assert rmse < 0.055


class TestPipelined:
    def test_pipelined_matches_sync(self, stereo_frames):
        frames, gt = stereo_frames
        results = {}
        for pipelined in (False, True):
            tracker = Tracker(make_cfg(pipelined=pipelined, enable_local_ba=False))
            for i, (l, r, d) in enumerate(frames):
                tracker.track_rgbd(l, d, timestamp=i / 30.0)
            tracker.flush()
            est = np.stack(tracker.trajectory)
            assert len(est) == len(frames)
            results[pipelined], _ = ate_rmse(est, gt, align="se3")
        print(f"sync ATE {results[False]:.4f}, pipelined {results[True]:.4f}")
        # 1-frame-late keyframing may shift results slightly; same ballpark
        assert results[True] < max(2.0 * results[False], 0.04)
