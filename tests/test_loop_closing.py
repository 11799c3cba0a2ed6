"""Loop-closing machinery tests: Sim3 between keyframes + correction + GBA.

Deterministic trigger: run odometry around a closing orbit, then force the
loop closure between the last and first keyframes (detection policy has its
own unit tests in test_vocab_solvers; here we validate the heavy machinery
— Sim3 solve on real map data, essential-graph solve, point correction,
fusion, global BA — leaves the map consistent and the trajectory good).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_refactored_tpu.io.evaluation import ate_rmse
from orb_slam2_refactored_tpu.io.synthetic import (
    SyntheticScene, box_room, orbit_trajectory,
)
from orb_slam2_refactored_tpu.slam.loop_closing import LoopCloser
from orb_slam2_refactored_tpu.slam.map_state import MapCapacity
from orb_slam2_refactored_tpu.slam.tracking import Tracker, TrackerConfig
from orb_slam2_refactored_tpu.slam.vocabulary import train_vocabulary


@pytest.fixture(scope="module")
def tracked():
    planes = box_room(half_x=1.5, half_y=1.2, z_far=2.5, z_near=-2.5)
    scene = SyntheticScene(width=320, height=240, fx=260.0, fy=260.0, planes=planes)
    n = 50
    gt = orbit_trajectory(n, radius=0.35, yaw_amp=0.3)
    rng = np.random.default_rng(11)
    cfg = TrackerConfig(
        width=320, height=240, fx=260.0, fy=260.0, cx=160.0, cy=120.0,
        bf=0.08 * 260.0, n_features=600, n_levels=4, enable_local_ba=False,
        map_capacity=MapCapacity(max_keyframes=64, max_points=8192,
                                 max_features=600),
    )
    tracker = Tracker(cfg)
    for i in range(n):
        img, depth = scene.render(gt[i])
        depth = depth * (1 + rng.normal(0, 0.01, depth.shape).astype(np.float32))
        tracker.track_rgbd(img, depth, timestamp=i / 30.0)
    assert tracker.state == 1
    return tracker, gt


class TestLoopMachinery:
    def test_sim3_between_overlapping_kfs(self, tracked):
        tracker, gt = tracked
        kfs = tracker.graph.alive_kfs()
        assert len(kfs) >= 3
        voc_desc = np.asarray(tracker.map.kf_desc[kfs[0]])
        voc = train_vocabulary(voc_desc, n_words=256, iters=4)
        lc = LoopCloser(voc, tracker.cam, tracker.cfg.map_capacity.max_keyframes,
                        tracker.cfg.n_levels, tracker.cfg.scale_factor)
        # consecutive keyframes share many landmarks: Sim3 should be near the
        # true relative pose with scale 1
        a, b = int(kfs[1]), int(kfs[0])
        out = lc.compute_sim3(tracker.map, a, b, jax.random.PRNGKey(0))
        assert out is not None
        S, inl, pa, pb = out
        assert inl.sum() >= 20
        # S maps b-camera coords into a-camera coords; compare to relative pose
        from orb_slam2_refactored_tpu.geometry import se3, sim3
        rel_true = se3.compose(tracker.map.kf_pose[a],
                               se3.inverse(tracker.map.kf_pose[b]))
        err = np.asarray(se3.boxminus(sim3.to_se3(S), rel_true))
        assert np.linalg.norm(err) < 0.05

    def test_forced_loop_correction_keeps_map_sane(self, tracked):
        tracker, gt = tracked
        est_before = np.stack(tracker.trajectory)
        rmse_before, _ = ate_rmse(est_before, gt, align="se3")

        kfs = tracker.graph.alive_kfs()
        last_kf, first_kf = int(kfs[-1]), int(kfs[0])
        voc_desc = np.asarray(tracker.map.kf_desc[first_kf])
        voc = train_vocabulary(voc_desc, n_words=256, iters=4)
        lc = LoopCloser(voc, tracker.cam, tracker.cfg.map_capacity.max_keyframes,
                        tracker.cfg.n_levels, tracker.cfg.scale_factor)
        out = lc.compute_sim3(tracker.map, last_kf, first_kf, jax.random.PRNGKey(1))
        if out is None:
            pytest.skip("no landmark overlap between first/last KF in this run")
        S, inl, pa, pb = out
        m2, info = lc.correct(
            tracker.map, tracker.graph, last_kf, first_kf, S, inl, pa, pb
        )
        # essential graph must reduce its cost; the async GBA result merges
        # like the reference's detached-thread merge
        assert info["pg_cost"][1] <= info["pg_cost"][0] + 1e-3
        pending = info["gba_pending"]
        m2, ginfo = lc.merge_gba(m2, tracker.graph, pending)
        assert ginfo["gba_cost"][1] <= ginfo["gba_cost"][0] + 1e-3
        # map must stay finite and keyframe poses close to where they were
        # (drift here is small, so correction must be small)
        kf_pose = np.asarray(m2.kf_pose)
        assert np.isfinite(kf_pose).all()
        moved = np.linalg.norm(
            kf_pose[kfs][:, 4:7] - np.asarray(tracker.map.kf_pose)[kfs][:, 4:7],
            axis=1,
        )
        assert moved.max() < 0.3
        # loop edge recorded
        assert first_kf in tracker.graph.loop_edges.get(last_kf, set())
