"""Map save/load round-trip + relocalize-into-loaded-map test."""

import numpy as np
import pytest

from orb_slam2_refactored_tpu.io.synthetic import (
    SyntheticScene, box_room, orbit_trajectory,
)
from orb_slam2_refactored_tpu.slam.map_state import MapCapacity
from orb_slam2_refactored_tpu.slam.serialize import load_map, save_map
from orb_slam2_refactored_tpu.slam.tracking import Tracker, TrackerConfig


def make_cfg(**kw):
    base = dict(
        width=320, height=240, fx=260.0, fy=260.0, cx=160.0, cy=120.0,
        bf=0.08 * 260.0, n_features=600, n_levels=4,
        enable_loop_closing=True,
        map_capacity=MapCapacity(max_keyframes=64, max_points=8192,
                                 max_features=600),
    )
    base.update(kw)
    return TrackerConfig(**base)


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    planes = box_room(half_x=1.5, half_y=1.2, z_far=2.5, z_near=-2.5)
    scene = SyntheticScene(width=320, height=240, fx=260.0, fy=260.0,
                           planes=planes)
    n = 25
    gt = orbit_trajectory(n, radius=0.3, yaw_amp=0.25)
    frames = [scene.render(gt[i]) for i in range(n)]
    tracker = Tracker(make_cfg())
    for i, (img, depth) in enumerate(frames):
        tracker.track_rgbd(img, depth, timestamp=i / 30.0)
    path = str(tmp_path_factory.mktemp("ckpt") / "map.npz")
    save_map(tracker, path)
    return tracker, path, frames, gt


class TestSerialize:
    def test_roundtrip_arrays(self, built):
        tracker, path, frames, gt = built
        t2 = Tracker(make_cfg())
        load_map(t2, path)
        np.testing.assert_array_equal(
            np.asarray(t2.map.kf_pose), np.asarray(tracker.map.kf_pose)
        )
        np.testing.assert_array_equal(
            np.asarray(t2.map.mp_pos), np.asarray(tracker.map.mp_pos)
        )
        assert set(t2.graph.alive_kfs()) == set(tracker.graph.alive_kfs())
        assert t2.graph.pt_alive.sum() == tracker.graph.pt_alive.sum()
        # observations survive
        pts = tracker.graph.points_with_obs()
        assert len(t2.graph.points_with_obs()) == len(pts)
        p0 = pts[0]
        assert sorted(t2.graph.obs_pairs(p0)) == sorted(tracker.graph.obs_pairs(p0))

    def test_relocalize_into_loaded_map(self, built):
        tracker, path, frames, gt = built
        t2 = Tracker(make_cfg())
        load_map(t2, path)
        assert t2.state == 2  # LOST, waiting for relocalization
        # the loaded tracker has no vocabulary/loop closer yet: install one
        # trained on the loaded map's first keyframe
        from orb_slam2_refactored_tpu.slam.loop_closing import LoopCloser
        from orb_slam2_refactored_tpu.slam.vocabulary import train_vocabulary

        kf0 = t2.graph.alive_kfs()[0]
        desc = np.asarray(t2.map.kf_desc[kf0])
        voc = train_vocabulary(desc, n_words=256, iters=4)
        t2.loop_closer = LoopCloser(voc, t2.cam,
                                    t2.cfg.map_capacity.max_keyframes,
                                    t2.cfg.n_levels, t2.cfg.scale_factor)
        for k in t2.graph.alive_kfs():
            t2.loop_closer.add_keyframe_bow(t2.map, int(k))
        # feed a frame from the middle of the mapped sequence
        img, depth = frames[10]
        t2.track_rgbd(img, depth, timestamp=99.0)
        assert t2.state == 1, "relocalization into loaded map failed"
        # pose must be close to the ground truth of that frame
        from orb_slam2_refactored_tpu.geometry import se3
        import jax.numpy as jnp

        err = np.asarray(se3.boxminus(jnp.asarray(t2.pose), jnp.asarray(gt[10])))
        assert np.linalg.norm(err) < 0.1
