"""Image wire codec (ops/codec.py): round-trip correctness + tracking
quality parity with the raw wire format.

The DCT wire format exists for tunnel-attached deployments where the gray
image dominates the payload; like log8 depth, its license to exist is the
ATE gate — this test IS that gate at unit scale.
"""

import numpy as np
import pytest

from orb_slam2_refactored_tpu.io.evaluation import ate_rmse
from orb_slam2_refactored_tpu.io.synthetic import (
    SyntheticScene, box_room, orbit_trajectory,
)
from orb_slam2_refactored_tpu.ops.codec import (
    decode_dct, decode_dct_np, encode_dct, encoded_nbytes,
)
from orb_slam2_refactored_tpu.slam.map_state import MapCapacity
from orb_slam2_refactored_tpu.slam.tracking import Tracker, TrackerConfig


@pytest.fixture(scope="module")
def scene_frames():
    planes = box_room(half_x=1.5, half_y=1.2, z_far=2.5, z_near=-2.5)
    scene = SyntheticScene(width=320, height=240, fx=260.0, fy=260.0,
                           planes=planes)
    n = 36
    gt = orbit_trajectory(n, radius=0.3, yaw_amp=0.2)
    rng = np.random.default_rng(9)
    frames = []
    for i in range(n):
        img, depth = scene.render(gt[i])
        depth = depth * (1 + rng.normal(0, 0.01, depth.shape))
        frames.append((np.clip(img, 0, 255).astype(np.uint8),
                       depth.astype(np.float32)))
    return frames, gt


class TestCodecUnit:
    def test_roundtrip_decoders_agree(self, scene_frames):
        img = scene_frames[0][0][0]
        buf = encode_dct(img)
        assert buf.nbytes == encoded_nbytes(*img.shape) == img.size // 4
        d_np = decode_dct_np(buf, *img.shape)
        d_j = np.asarray(decode_dct(np.asarray(buf), *img.shape))
        np.testing.assert_allclose(d_np, d_j, atol=1e-3)

    def test_quality_floor(self, scene_frames):
        """PSNR must stay comfortably above what feature extraction
        tolerates (the FAST thresholds are 20/7 gray; mean error here is
        ~1 gray)."""
        img = scene_frames[0][0][0]
        dec = decode_dct_np(encode_dct(img), *img.shape)
        err = dec - img.astype(np.float32)
        psnr = 10 * np.log10(255.0 ** 2 / np.mean(err ** 2))
        assert psnr > 30.0, f"PSNR {psnr:.1f} dB"
        assert np.abs(err).mean() < 3.0

    def test_flat_blocks_near_lossless(self):
        """Uniform blocks (DC only) survive with <= 1 gray of error."""
        img = np.full((64, 64), 137, np.uint8)
        dec = decode_dct_np(encode_dct(img), 64, 64)
        assert np.abs(dec - 137.0).max() < 1.0


class TestCodecTrackingParity:
    def _run(self, frames, encoding):
        cfg = TrackerConfig(
            width=320, height=240, fx=260.0, fy=260.0, cx=160.0, cy=120.0,
            bf=0.08 * 260.0, n_features=400, n_levels=4,
            enable_loop_closing=False,
            map_capacity=MapCapacity(max_keyframes=32, max_points=8192,
                                     max_features=400),
            depth_subsample=2, depth_encoding="log8",
            image_encoding=encoding,
        )
        t = Tracker(cfg)
        for i, (img, d) in enumerate(frames):
            t.track_rgbd(img, d, timestamp=i / 30.0)
        t.flush()
        return t

    def test_dct_tracks_like_raw(self, scene_frames):
        """End-to-end: the DCT wire format must track within a hair of the
        raw format — the same gate log8 depth passed."""
        frames, gt = scene_frames
        t_raw = self._run(frames, "raw")
        t_dct = self._run(frames, "dct")
        r_raw, _ = ate_rmse(np.stack(t_raw.trajectory), gt, align="se3")
        r_dct, _ = ate_rmse(np.stack(t_dct.trajectory), gt, align="se3")
        print(f"ATE raw {r_raw:.4f} m vs dct {r_dct:.4f} m")
        assert t_dct.state == 1
        # the codec's documented tradeoff is ~+1 cm ATE for 4x smaller
        # images (ops/codec.py); gate the DELTA vs raw plus a loose
        # absolute roof (raw 0.0131 / dct 0.0207 with the round-5 umax
        # IC-angle mask — the old 0.02 absolute gate was calibrated on the
        # pre-parity mask and failed by 0.7 mm)
        assert r_dct < 0.03
        assert r_dct < r_raw + 0.012
