"""Monocular end-to-end circuit with organic loop closure.

The monocular path has no depth: scale is set by the bootstrap map and
drifts as the map extends (the reference's motivation for Sim3 — not SE3 —
loop machinery, `/root/reference/src/LoopClosing.cc` fixScale ctor arg).
This drives a full 240-frame mono circuit through `track_mono` and requires
the loop stage to fire ORGANICALLY (no forced pair):

- under whole-map matching a revisit re-acquires first-lap landmarks and
  the IMPLICIT loop detector (tracking.py::_implicit_loop_candidate) must
  catch the reconnection and pass the strict TH_LOW projection verification,
- aliased BoW candidates (the box room's repetitive block textures retrieve
  mid-lap views constantly) must ALL be rejected by the Sim3/projection
  gates — a single false acceptance corrupts the map and blows the ATE gate.
"""

import numpy as np
import pytest

from test_organic_loop import circuit_trajectory

from orb_slam2_refactored_tpu.io.evaluation import ate_rmse
from orb_slam2_refactored_tpu.io.synthetic import SyntheticScene, box_room
from orb_slam2_refactored_tpu.slam.map_state import MapCapacity
from orb_slam2_refactored_tpu.slam.system import corrected_frame_poses
from orb_slam2_refactored_tpu.slam.tracking import Tracker, TrackerConfig


@pytest.fixture(scope="module")
def mono_circuit():
    planes = box_room(half_x=1.7, half_y=1.3, z_far=2.7, z_near=-2.7,
                      distinct_textures=True)
    scene = SyntheticScene(width=320, height=240, fx=260.0, fy=260.0,
                           planes=planes)
    n = 240
    gt = circuit_trajectory(n, overlap=40)
    imgs = []
    for i in range(n):
        img, _ = scene.render(gt[i])
        imgs.append(img)
    return imgs, gt


class TestMonoLoop:
    def test_mono_circuit_loop_fires(self, mono_circuit):
        imgs, gt = mono_circuit
        cfg = TrackerConfig(
            width=320, height=240, fx=260.0, fy=260.0, cx=160.0, cy=120.0,
            bf=0.0, n_features=900, n_levels=4,
            enable_loop_closing=True, vocab_words=1024,
            kf_max_interval=8,
            map_capacity=MapCapacity(max_keyframes=96, max_points=16384,
                                     max_features=900),
        )
        t = Tracker(cfg)
        for i, img in enumerate(imgs):
            t.track_mono(img, timestamp=i / 30.0)
        t.flush()

        # the full circuit must be tracked to the end (losses mid-run are
        # tolerated if relocalization recovers; the end state must be OK)
        assert t.state == 1, t.track_info[-3:]
        assert len(t.trajectory) == len(imgs)

        # a loop must have closed organically — for mono whole-map matching
        # that is the implicit reconnection path, strictly verified
        assert t.loop_closer is not None
        assert t.loop_closer.loops_closed >= 1, "no organic loop closure"
        info = t.last_loop_info
        assert info is not None
        if info.get("implicit"):
            assert info["n_proj"] >= 25, info

        # map consistency: Sim3-aligned ATE bounded (monocular scale is
        # unobservable; a corrupted map — e.g. one false loop accepted —
        # lands far above this)
        est = corrected_frame_poses(t)
        n = min(len(est), len(gt))
        rmse, _ = ate_rmse(est[:n], gt[:n], align="sim3")
        assert rmse < 0.45, f"mono circuit ATE {rmse:.3f} m"
