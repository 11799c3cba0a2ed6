"""System façade tests: YAML settings -> full pipeline -> trajectory export."""

import os

import numpy as np
import pytest

from orb_slam2_refactored_tpu.io.synthetic import (
    SyntheticScene, box_room, orbit_trajectory,
)
from orb_slam2_refactored_tpu.slam.system import RGBD, SlamSystem

SETTINGS = os.path.join(os.path.dirname(__file__), "..", "configs",
                        "synthetic_rgbd.yaml")


@pytest.fixture(scope="module")
def system_run(tmp_path_factory):
    planes = box_room(half_x=1.5, half_y=1.2, z_far=2.5, z_near=-2.5)
    scene = SyntheticScene(width=320, height=240, fx=260.0, fy=260.0,
                           planes=planes)
    n = 20
    gt = orbit_trajectory(n, radius=0.3, yaw_amp=0.25)
    system = SlamSystem.create(SETTINGS, RGBD, enable_loop_closing=False)
    for i in range(n):
        img, depth = scene.render(gt[i])
        system.track_rgbd(img, depth, timestamp=i / 30.0)
    return system, gt


class TestSystem:
    def test_settings_schema(self):
        system = SlamSystem.create(SETTINGS, RGBD, enable_loop_closing=False)
        assert system.tracker.cfg.fx == 260.0
        assert system.tracker.cfg.n_features == 600
        assert system.tracker.cfg.n_levels == 4
        assert float(system.settings.camera.bf) == 20.8

    def test_tracking_state(self, system_run):
        system, gt = system_run
        assert system.get_tracking_state() == 1

    def test_save_trajectory_tum(self, system_run, tmp_path):
        system, gt = system_run
        out = tmp_path / "traj.txt"
        system.save_trajectory_tum(str(out))
        lines = out.read_text().strip().splitlines()
        assert len(lines) == len(system.tracker.trajectory)
        first = lines[0].split()
        assert len(first) == 8  # t tx ty tz qx qy qz qw
        # first pose ~ identity (origin)
        vals = [float(v) for v in first[1:]]
        assert abs(vals[0]) < 1e-5 and abs(vals[6] - 1.0) < 1e-5

    def test_save_trajectory_kitti(self, system_run, tmp_path):
        system, gt = system_run
        out = tmp_path / "traj_kitti.txt"
        system.save_trajectory_kitti(str(out))
        lines = out.read_text().strip().splitlines()
        assert len(lines) == len(system.tracker.trajectory)
        assert len(lines[0].split()) == 12  # 3x4 row-major

    def test_save_keyframe_trajectory(self, system_run, tmp_path):
        system, gt = system_run
        out = tmp_path / "kf.txt"
        system.save_keyframe_trajectory_tum(str(out))
        lines = out.read_text().strip().splitlines()
        assert len(lines) == len(system.tracker.graph.alive_kfs())

    def test_localization_mode(self, system_run):
        """Localization mode must FREEZE the map — not just suppress new
        keyframes but also stop the mapping pipeline from mutating device
        state (the reference stops LocalMapping outright,
        src/System.cc:221-271). Byte-hash the map arrays across 50 tracked
        frames."""
        import hashlib

        system, gt = system_run
        scene = SyntheticScene(
            width=320, height=240, fx=260.0, fy=260.0,
            planes=box_room(half_x=1.5, half_y=1.2, z_far=2.5, z_near=-2.5),
        )
        n_kf_before = len(system.tracker.graph.alive_kfs())
        system.activate_localization_mode()

        def map_hash():
            h = hashlib.sha256()
            m = system.tracker.map
            for a in (m.kf_pose, m.kf_mp, m.kf_valid, m.mp_pos, m.mp_valid,
                      m.mp_desc):
                h.update(np.asarray(a).tobytes())
            h.update(np.int64(system.tracker.graph.num_kfs).tobytes())
            return h.hexdigest()

        h0 = map_hash()
        traj = orbit_trajectory(50, radius=0.3, yaw_amp=0.25)
        for i in range(50):
            img, depth = scene.render(traj[i])
            system.track_rgbd(img, depth, timestamp=99.0 + i / 30.0)
        system.tracker.flush()
        assert map_hash() == h0, "map mutated in localization mode"
        assert len(system.tracker.graph.alive_kfs()) == n_kf_before
        assert system.get_tracking_state() == 1  # still tracking against it
        system.deactivate_localization_mode()

    def test_viz_plot(self, system_run, tmp_path):
        from orb_slam2_refactored_tpu.viz.plot import plot_map

        system, gt = system_run
        out = plot_map(system.tracker, str(tmp_path / "map.png"), gt=gt)
        assert os.path.exists(out) and os.path.getsize(out) > 10000

    def test_reset(self, system_run):
        system, gt = system_run
        system.reset()
        assert system.get_tracking_state() == 0
        assert len(system.tracker.trajectory) == 0


class TestChangeCalibration:
    def test_change_calibration_retraces_and_tracks(self, tmp_path):
        """ChangeCalibration analog (src/System.cc:869-875): swap intrinsics
        mid-session; the map survives and tracking continues with the new
        camera model (programs re-trace)."""
        planes = box_room(half_x=1.5, half_y=1.2, z_far=2.5, z_near=-2.5)
        scene = SyntheticScene(width=320, height=240, fx=260.0, fy=260.0,
                               planes=planes)
        gt = orbit_trajectory(30, radius=0.3, yaw_amp=0.25)
        system = SlamSystem.create(SETTINGS, RGBD, enable_loop_closing=False)
        for i in range(12):
            img, depth = scene.render(gt[i])
            system.track_rgbd(img, depth, timestamp=i / 30.0)
        assert system.get_tracking_state() == 1
        n_kf = len(system.tracker.graph.alive_kfs())

        # write a settings file with the SAME optics (the swap machinery is
        # what's under test; a genuinely different lens would need new input
        # imagery) and a marker change in fy of 0.5% that tracking tolerates
        src = open(SETTINGS).read()
        mod = src.replace("Camera.fy: 260.0", "Camera.fy: 261.3")
        new_yaml = tmp_path / "recal.yaml"
        new_yaml.write_text(mod)
        system.change_calibration(str(new_yaml))
        assert abs(system.tracker.cfg.fy - 261.3) < 1e-6
        assert len(system.tracker.graph.alive_kfs()) == n_kf  # map survived

        for i in range(12, 30):
            img, depth = scene.render(gt[i])
            system.track_rgbd(img, depth, timestamp=i / 30.0)
        system.tracker.flush()
        assert system.get_tracking_state() == 1


class TestLiveViewer:
    def test_live_viewer_renders_during_tracking(self, tmp_path):
        """Runtime Viewer analog (src/Viewer.cc:62-179): a background
        render loop produces map snapshots WHILE tracking runs, and
        stop() leaves a final consistent frame."""
        from orb_slam2_refactored_tpu.viz.viewer import LiveViewer

        planes = box_room(half_x=1.5, half_y=1.2, z_far=2.5, z_near=-2.5)
        scene = SyntheticScene(width=320, height=240, fx=260.0, fy=260.0,
                               planes=planes)
        gt = orbit_trajectory(24, radius=0.3, yaw_amp=0.25)
        system = SlamSystem.create(SETTINGS, RGBD, enable_loop_closing=False)
        viewer = LiveViewer(system.tracker, out_dir=str(tmp_path / "live"),
                            hz=4.0).start()
        for i in range(24):
            img, depth = scene.render(gt[i])
            system.track_rgbd(img, depth, timestamp=i / 30.0)
        viewer.stop()
        latest = tmp_path / "live" / "map_latest.png"
        assert latest.exists() and latest.stat().st_size > 10000
        assert viewer.frames_rendered >= 1

    def test_viewer_control_surface(self, tmp_path):
        """The reference Viewer's menu toggles wire back into System
        (localization-mode checkbox + reset button, src/Viewer.cc:62-179 /
        src/System.cc:221-308). Headless transport: drop commands into
        `<viz>/control`; the viewer thread relays them and the system
        applies at its next tracked frame. `status.json` is the
        FrameDrawer status-text analog."""
        import json
        import time as _time

        from orb_slam2_refactored_tpu.viz.viewer import LiveViewer

        planes = box_room(half_x=1.5, half_y=1.2, z_far=2.5, z_near=-2.5)
        scene = SyntheticScene(width=320, height=240, fx=260.0, fy=260.0,
                               planes=planes)
        gt = orbit_trajectory(40, radius=0.3, yaw_amp=0.25)
        system = SlamSystem.create(SETTINGS, RGBD, enable_loop_closing=False)
        vdir = tmp_path / "live"
        viewer = LiveViewer(system.tracker, out_dir=str(vdir), hz=20.0,
                            system=system).start()
        for i in range(10):
            img, depth = scene.render(gt[i])
            system.track_rgbd(img, depth, timestamp=i / 30.0)
        assert system.get_tracking_state() == 1
        n_kf = len(system.tracker.graph.alive_kfs())

        # 1. localization mode ON via the control file
        (vdir / "control").write_text("localization_mode on\n")
        deadline = _time.time() + 5.0
        while not system._pending_cmds and viewer.commands_relayed < 1 \
                and _time.time() < deadline:
            _time.sleep(0.02)
        assert viewer.commands_relayed >= 1, "control file never consumed"
        for i in range(10, 18):
            img, depth = scene.render(gt[i])
            system.track_rgbd(img, depth, timestamp=i / 30.0)
        assert system.localization_only
        # map frozen: no keyframes created while localization-only
        assert len(system.tracker.graph.alive_kfs()) == n_kf

        # 2. save_map + localization off via one file, multiple commands
        map_path = tmp_path / "ctl_map.npz"
        (vdir / "control").write_text(
            f"save_map {map_path}\nlocalization_mode off\n")
        deadline = _time.time() + 5.0
        while viewer.commands_relayed < 3 and _time.time() < deadline:
            _time.sleep(0.02)
        for i in range(18, 26):
            img, depth = scene.render(gt[i])
            system.track_rgbd(img, depth, timestamp=i / 30.0)
        assert map_path.exists()
        assert not system.localization_only

        # 3. reset: the system swaps trackers; the viewer follows through
        # its live system reference and keeps rendering the NEW tracker
        old_tracker = system.tracker
        (vdir / "control").write_text("reset\n")
        deadline = _time.time() + 5.0
        while viewer.commands_relayed < 4 and _time.time() < deadline:
            _time.sleep(0.02)
        img, depth = scene.render(gt[26])
        system.track_rgbd(img, depth, timestamp=26 / 30.0)
        assert system.tracker is not old_tracker  # reset swapped trackers
        # fresh map: RGB-D re-initializes from this single frame (stereo
        # init semantics) — exactly one keyframe, none of the old map
        assert len(system.tracker.graph.alive_kfs()) == 1
        assert viewer.tracker is system.tracker
        viewer.stop()
        status = json.loads((vdir / "status.json").read_text())
        assert set(status) >= {"frame_id", "state", "keyframes", "points",
                               "localization_only", "loops_closed"}
