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


class TestGbaMergeLateKeyframes:
    def test_merge_preserves_relative_pose_to_merge_time_parent(self, tracked):
        """Regression pin for the round-5 GBA-merge bug: keyframes created
        AFTER a GBA launch must be corrected relative to their parent's
        pose AT MERGE TIME (reference TcwBefGBA semantics,
        `src/LoopClosing.cc:393-446`). The old code used the LAUNCH
        snapshot; when anything (window BA) moved the parent between
        launch and merge, the child landed offset by exactly that motion
        (0.55 m on the organic-loop circuit). Invariant: the child->parent
        relative pose survives the merge bit-for-bit, and cascades through
        chains of late keyframes."""
        from orb_slam2_refactored_tpu.geometry import se3
        from orb_slam2_refactored_tpu.slam.system import (
            _np_compose, _np_inverse,
        )

        tracker, gt = tracked
        g = tracker.graph
        m = tracker.map
        kfs = [int(k) for k in g.alive_kfs()]
        assert len(kfs) >= 4
        voc_desc = np.asarray(m.kf_desc[kfs[0]])
        voc = train_vocabulary(voc_desc, n_words=256, iters=4)
        lc = LoopCloser(voc, tracker.cam,
                        tracker.cfg.map_capacity.max_keyframes,
                        tracker.cfg.n_levels, tracker.cfg.scale_factor)

        pending = lc.launch_gba(m, g)

        # simulate: (a) window BA moving a launched keyframe after launch,
        # (b) TWO late keyframes forming a parent chain off it
        moved = kfs[-1]
        bump = np.asarray(se3.exp(jnp.asarray(
            [0.02, -0.01, 0.03, 0.15, -0.1, 0.08], jnp.float32)))
        cur = np.array(m.kf_pose)  # writable copy
        cur[moved] = _np_compose(bump, cur[moved])
        late1 = g.alloc_kf_slot()
        g.set_kf_alive(late1, True)
        g.kf_seq[late1] = g.num_kfs
        g.num_kfs += 1
        g.parent[late1] = moved
        cur[late1] = _np_compose(
            np.asarray(se3.exp(jnp.asarray([0, 0, 0, 0.05, 0, 0],
                                           jnp.float32))), cur[moved])
        late2 = g.alloc_kf_slot()
        g.set_kf_alive(late2, True)
        g.kf_seq[late2] = g.num_kfs
        g.num_kfs += 1
        g.parent[late2] = late1
        cur[late2] = _np_compose(
            np.asarray(se3.exp(jnp.asarray([0, 0, 0, 0.05, 0, 0],
                                           jnp.float32))), cur[late1])
        m = m._replace(
            kf_pose=jnp.asarray(cur),
            kf_valid=m.kf_valid.at[jnp.asarray([late1, late2])].set(True),
        )

        m2, _ = lc.merge_gba(m, g, pending)
        new = np.asarray(m2.kf_pose)

        # launched keyframes adopt the GBA pose (the bump is discarded)
        gba = np.asarray(pending["gba_pose"])
        assert np.allclose(new[moved], gba[moved], atol=1e-5)
        # late chain: child->parent relatives preserved vs MERGE-TIME poses
        for child, parent in ((late1, moved), (late2, late1)):
            rel_before = _np_compose(cur[child], _np_inverse(cur[parent]))
            rel_after = _np_compose(new[child], _np_inverse(new[parent]))
            err = np.linalg.norm(
                np.asarray(se3.boxminus(jnp.asarray(rel_after),
                                        jnp.asarray(rel_before))))
            assert err < 1e-4, (child, parent, err)
