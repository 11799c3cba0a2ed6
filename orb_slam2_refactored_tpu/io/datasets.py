"""Dataset loaders: TUM RGB-D, KITTI odometry, EuRoC MAV.

Capability analog of the reference's six example drivers
(`/root/reference/Examples/{Monocular,Stereo,RGB-D}/*.cc`): sequence
discovery, timestamp parsing, image loading, and (for EuRoC stereo) the
rectification pipeline (`Examples/Stereo/stereo_euroc.cc:61-107`).

Each loader yields `(timestamp, images...)` tuples lazily; images load as
float32 grayscale via cv2 (cv2 is an IO dependency only — all compute is
JAX)."""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def _imread_gray(path: str) -> np.ndarray:
    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(path)
    return img.astype(np.float32)


def load_tum_associations(seq_dir: str, assoc_file: Optional[str] = None):
    """Parse TUM rgb/depth association. If no association file exists,
    associate rgb.txt and depth.txt by nearest timestamp (max 0.02 s)."""

    def parse(fname):
        entries = []
        with open(fname) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = line.split()
                entries.append((float(parts[0]), parts[1]))
        return entries

    if assoc_file and os.path.exists(assoc_file):
        pairs = []
        with open(assoc_file) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                p = line.split()
                pairs.append((float(p[0]), p[1], p[3]))
        return pairs
    rgb = parse(os.path.join(seq_dir, "rgb.txt"))
    depth = parse(os.path.join(seq_dir, "depth.txt"))
    d_ts = np.asarray([t for t, _ in depth])
    pairs = []
    for t, rgb_path in rgb:
        i = int(np.argmin(np.abs(d_ts - t)))
        if abs(d_ts[i] - t) < 0.02:
            pairs.append((t, rgb_path, depth[i][1]))
    return pairs


def tum_rgbd_sequence(
    seq_dir: str, assoc_file: Optional[str] = None
) -> Iterator[Tuple[float, np.ndarray, np.ndarray]]:
    """Yields (timestamp, gray f32[H,W], depth_raw f32[H,W]) — rgbd_tum.cc
    analog. Depth stays in RAW sensor units: the System frontend applies
    DepthMapFactor exactly once, like the reference's Tracking frontend."""
    for t, rgb_rel, depth_rel in load_tum_associations(seq_dir, assoc_file):
        img = _imread_gray(os.path.join(seq_dir, rgb_rel))
        d = cv2.imread(os.path.join(seq_dir, depth_rel), cv2.IMREAD_UNCHANGED)
        yield t, img, d.astype(np.float32)


def tum_mono_sequence(seq_dir: str) -> Iterator[Tuple[float, np.ndarray]]:
    """mono_tum.cc analog: rgb.txt only."""
    with open(os.path.join(seq_dir, "rgb.txt")) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            t, rel = line.split()[:2]
            yield float(t), _imread_gray(os.path.join(seq_dir, rel))


def kitti_stereo_sequence(seq_dir: str) -> Iterator[Tuple[float, np.ndarray, np.ndarray]]:
    """stereo_kitti.cc analog: image_0/ image_1/ + times.txt."""
    with open(os.path.join(seq_dir, "times.txt")) as f:
        times = [float(x) for x in f.read().split()]
    for i, t in enumerate(times):
        l = _imread_gray(os.path.join(seq_dir, "image_0", f"{i:06d}.png"))
        r = _imread_gray(os.path.join(seq_dir, "image_1", f"{i:06d}.png"))
        yield t, l, r


def kitti_mono_sequence(seq_dir: str) -> Iterator[Tuple[float, np.ndarray]]:
    with open(os.path.join(seq_dir, "times.txt")) as f:
        times = [float(x) for x in f.read().split()]
    for i, t in enumerate(times):
        yield t, _imread_gray(os.path.join(seq_dir, "image_0", f"{i:06d}.png"))


class EurocRectifier:
    """Stereo rectification maps from the LEFT./RIGHT. YAML blocks
    (`stereo_euroc.cc:61-107` — cv::initUndistortRectifyMap)."""

    def __init__(self, rect):
        K_l, K_r = rect.K_l, rect.K_r
        P_l, P_r = rect.P_l, rect.P_r
        R_l, R_r = rect.R_l, rect.R_r
        D_l, D_r = rect.D_l, rect.D_r
        size = (rect.width, rect.height)
        self.map_l = cv2.initUndistortRectifyMap(
            K_l, D_l, R_l, P_l[:3, :3], size, cv2.CV_32F
        )
        self.map_r = cv2.initUndistortRectifyMap(
            K_r, D_r, R_r, P_r[:3, :3], size, cv2.CV_32F
        )

    def __call__(self, img_l, img_r):
        l = cv2.remap(img_l, self.map_l[0], self.map_l[1], cv2.INTER_LINEAR)
        r = cv2.remap(img_r, self.map_r[0], self.map_r[1], cv2.INTER_LINEAR)
        return l, r


def euroc_stereo_sequence(
    seq_dir: str, timestamps_file: str, rectifier: Optional[EurocRectifier] = None
) -> Iterator[Tuple[float, np.ndarray, np.ndarray]]:
    """stereo_euroc.cc analog: mav0/cam0/data + cam1/data by timestamp file."""
    with open(timestamps_file) as f:
        stamps = [line.strip() for line in f if line.strip()]
    for s in stamps:
        t = float(s) / 1e9
        l = _imread_gray(os.path.join(seq_dir, "mav0", "cam0", "data", s + ".png"))
        r = _imread_gray(os.path.join(seq_dir, "mav0", "cam1", "data", s + ".png"))
        if rectifier is not None:
            l, r = rectifier(l, r)
        yield t, l, r


def euroc_mono_sequence(seq_dir: str, timestamps_file: str):
    with open(timestamps_file) as f:
        stamps = [line.strip() for line in f if line.strip()]
    for s in stamps:
        t = float(s) / 1e9
        yield t, _imread_gray(os.path.join(seq_dir, "mav0", "cam0", "data", s + ".png"))


def load_tum_groundtruth(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """groundtruth.txt -> (timestamps [N], poses_cw f32[N,7] world->camera)."""
    import jax.numpy as jnp

    from ..geometry import se3

    ts, poses_wc = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = [float(x) for x in line.split()]
            ts.append(v[0])
            tx, ty, tz, qx, qy, qz, qw = v[1:8]
            poses_wc.append([qw, qx, qy, qz, tx, ty, tz])
    poses_wc = np.asarray(poses_wc, np.float32)
    poses_cw = np.asarray(se3.inverse(jnp.asarray(poses_wc)))
    return np.asarray(ts), poses_cw
