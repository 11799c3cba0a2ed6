"""Synthetic RGB-D/stereo sequence generator: a textured box room.

No public SLAM datasets ship with this container (zero egress), so unit /
integration tests and the benchmark harness render their own ground-truthed
sequences: a camera moving inside a box room whose walls carry blocky
random textures (sharp L-corner-rich, FAST-friendly). Rendering is exact
ray-plane intersection per pixel, so the depth channel is perfect and ATE
against the ground-truth trajectory measures the tracker alone.

This plays the role of the reference's dataset drivers + ground truth files
(`/root/reference/Examples/RGB-D/rgbd_tum.cc` etc.) for in-repo testing.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Tuple

import numpy as np

def _np_quat_mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], np.float32)


def _np_quat_rotate(q: np.ndarray, v: np.ndarray) -> np.ndarray:
    qw, qv = q[0], q[1:4]
    t = 2.0 * np.cross(qv, v)
    return v + qw * t + np.cross(qv, t)


def _np_pose_compose(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a o b)(x) = a(b(x)) for poses x -> q*x*q^-1 + t (se3.compose analog,
    kept numpy: host-side data generation must not dispatch eager device ops
    through the axon tunnel)."""
    q = _np_quat_mul(a[0:4], b[0:4])
    t = _np_quat_rotate(a[0:4], b[4:7]) + a[4:7]
    return np.concatenate([q, t]).astype(np.float32)


def _np_pose_inverse(p: np.ndarray) -> np.ndarray:
    p = np.asarray(p, np.float32)
    q = p[0:4] / max(np.linalg.norm(p[0:4]), 1e-12)
    qinv = np.array([q[0], -q[1], -q[2], -q[3]], np.float32)
    return np.concatenate([qinv, -_np_quat_rotate(qinv, p[4:7])]).astype(np.float32)


def _hash2(ix, iy, seed):
    """Deterministic integer hash -> [0,1) floats (blocky texture lookup)."""
    h = (ix.astype(np.int64) * 73856093) ^ (iy.astype(np.int64) * 19349663) ^ (seed * 83492791)
    h = (h ^ (h >> 13)) * 1274126177
    h = h ^ (h >> 16)
    return ((h & 0xFFFF).astype(np.float32)) / 65536.0


def block_texture(u, v, seed: int, scales=(0.25, 0.5)):
    """Multi-scale random-block texture in [0,255], sharp edges everywhere.

    Pass `scales=None` for seed-varied block scales: different surfaces get
    different spatial statistics, which keeps BoW place recognition from
    aliasing (with uniform scales every wall has near-identical word
    histograms and all loop candidates alias — the geometric gates reject
    them, verified experimentally, but no true loop can be retrieved either).
    """
    if scales is None:
        # seed-varied block scales, clamped to a corner-dense range: at a
        # typical 2m viewing distance with fx=260 these are 19-45px blocks,
        # so every wall keeps enough FAST corners for tracking (a 0.58m
        # block at that range is ~75px — one near-blank wall starves the
        # extractor and tracking dies on luck, not geometry)
        base = 0.15 + 0.05 * ((seed * 29) % 5)
        scales = (base, base * 2.3)
    val = np.zeros_like(u, dtype=np.float32)
    for k, s in enumerate(scales):
        iu = np.floor(u / s).astype(np.int64)
        iv = np.floor(v / s).astype(np.int64)
        val += _hash2(iu, iv, seed * 7 + k)
    val /= len(scales)
    return 40.0 + 180.0 * val


@dataclasses.dataclass
class Plane:
    point: np.ndarray   # a point on the plane
    normal: np.ndarray  # unit normal (pointing into the room)
    axis_u: np.ndarray  # in-plane texture axes
    axis_v: np.ndarray
    seed: int
    scales: tuple = (0.25, 0.5)  # None -> seed-varied (distinct per surface)


def box_room(half_x=3.0, half_y=2.0, z_far=7.0, z_near=-7.0,
             distinct_textures=False) -> List[Plane]:
    """`distinct_textures=True` gives every surface its own block scales so
    BoW place recognition can discriminate surfaces (see block_texture)."""
    e = np.eye(3, dtype=np.float32)
    sc = None if distinct_textures else (0.25, 0.5)
    return [
        Plane(np.array([0, 0, z_far], np.float32), -e[2], e[0], e[1], 1, sc),   # back wall
        Plane(np.array([0, 0, z_near], np.float32), e[2], e[0], e[1], 6, sc),   # front wall
        Plane(np.array([-half_x, 0, 0], np.float32), e[0], e[2], e[1], 2, sc),  # left
        Plane(np.array([half_x, 0, 0], np.float32), -e[0], e[2], e[1], 3, sc),  # right
        Plane(np.array([0, half_y, 0], np.float32), -e[1], e[0], e[2], 4, sc),  # floor
        Plane(np.array([0, -half_y, 0], np.float32), e[1], e[0], e[2], 5, sc),  # ceiling
    ]


class SyntheticScene:
    """Renders gray + depth images from any camera pose (world->camera Tcw)."""

    def __init__(self, width=320, height=240, fx=260.0, fy=260.0,
                 cx=None, cy=None, baseline=0.08, planes=None,
                 dist_coeffs=(0.0, 0.0, 0.0, 0.0, 0.0)):
        """`dist_coeffs=(k1,k2,p1,p2,k3)`: renders through a distorting lens —
        each output pixel's ray comes from undistorting its coordinates, so
        the image exhibits the radial-tangential warp a real camera would
        (exercises the frontend's UndistortKeyPoints analog)."""
        self.width, self.height = width, height
        self.fx, self.fy = fx, fy
        self.cx = width / 2.0 if cx is None else cx
        self.cy = height / 2.0 if cy is None else cy
        self.bf = baseline * fx
        self.dist_coeffs = tuple(dist_coeffs)
        self.planes = planes if planes is not None else box_room()
        u, v = np.meshgrid(np.arange(width), np.arange(height))
        if any(c != 0.0 for c in self.dist_coeffs):
            from ..geometry.projection import undistort_points_np

            uv = np.stack([u, v], -1).reshape(-1, 2).astype(np.float64)
            und = undistort_points_np(fx, fy, self.cx, self.cy,
                                      self.dist_coeffs, uv, iters=12)
            xn = ((und[:, 0] - self.cx) / fx).reshape(height, width)
            yn = ((und[:, 1] - self.cy) / fy).reshape(height, width)
            self._rays = np.stack(
                [xn, yn, np.ones_like(xn)], axis=-1
            ).astype(np.float32)
        else:
            self._rays = np.stack(
                [(u - self.cx) / fx, (v - self.cy) / fy, np.ones_like(u, np.float32)],
                axis=-1,
            ).astype(np.float32)

    def render(self, pose_cw: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """-> (gray f32[H,W], depth f32[H,W]); depth = z in camera frame.

        Pure numpy on purpose: renderers run on host while the tracker owns
        the device, and tiny eager jax ops through the axon tunnel cost
        seconds each (see .claude/skills/verify gotchas)."""
        pose_cw = np.asarray(pose_cw, np.float32)
        qw, qx, qy, qz = pose_cw[0:4] / max(np.linalg.norm(pose_cw[0:4]), 1e-12)
        R_cw = np.array([
            [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz), 2 * (qx * qz + qw * qy)],
            [2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qw * qx)],
            [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx), 1 - 2 * (qx * qx + qy * qy)],
        ], np.float32)
        R_wc = R_cw.T
        c = -(R_wc @ pose_cw[4:7])
        dirs = self._rays @ R_wc.T  # [H,W,3] world-frame ray directions

        best_t = np.full((self.height, self.width), np.inf, np.float32)
        img = np.zeros((self.height, self.width), np.float32)
        for pl in self.planes:
            denom = dirs @ pl.normal
            t = ((pl.point - c) @ pl.normal) / np.where(
                np.abs(denom) < 1e-9, 1e-9, denom
            )
            hit = (t > 0.05) & (t < best_t)
            if not hit.any():
                continue
            pt = c + dirs * t[..., None]
            u = (pt - pl.point) @ pl.axis_u
            v = (pt - pl.point) @ pl.axis_v
            tex = block_texture(u, v, pl.seed, pl.scales)
            img = np.where(hit, tex, img)
            best_t = np.where(hit, t, best_t)
        depth = best_t * 1.0  # t multiplies unit-z rays: depth = t (z component 1)
        depth[~np.isfinite(depth)] = 0.0
        return img, depth

    def render_stereo(self, pose_cw: np.ndarray):
        """-> (left, right, depth_left). Right camera offset +baseline in x."""
        left, depth = self.render(pose_cw)
        # right camera pose: x_right = x_left - baseline (camera frame shift)
        shift = np.array([1, 0, 0, 0, -self.bf / self.fx, 0, 0], np.float32)
        pose_r = _np_pose_compose(shift, np.asarray(pose_cw, np.float32))
        right, _ = self.render(pose_r)
        return left, right, depth


def export_tum_sequence(out_dir: str, scene: "SyntheticScene",
                        poses_cw: np.ndarray, fps: float = 30.0,
                        depth_factor: float = 5000.0,
                        depth_noise: float = 0.0, seed: int = 0,
                        t0: float = 1000.0) -> str:
    """Write a rendered sequence in the TUM RGB-D on-disk layout.

    Produces `rgb/*.png` (8-bit gray), `depth/*.png` (16-bit, meters *
    depth_factor), `rgb.txt`, `depth.txt` and `groundtruth.txt` — byte-format
    compatible with the files `rgbd_tum.cc` and the TUM tools consume
    (`/root/reference/Examples/RGB-D/rgbd_tum.cc`, association format of
    associate.py). Lets the REAL dataset driver (`drivers.py rgbd_tum`) run
    end-to-end in a zero-egress container. Returns out_dir.
    """
    import cv2

    os.makedirs(os.path.join(out_dir, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "depth"), exist_ok=True)
    rng = np.random.default_rng(seed)
    rgb_lines, depth_lines, gt_lines = [], [], []
    for i, pose in enumerate(poses_cw):
        ts = t0 + i / fps
        img, depth = scene.render(pose)
        if depth_noise:
            depth = depth * (1 + rng.normal(0, depth_noise, depth.shape))
        rgb_name = f"rgb/{ts:.6f}.png"
        depth_name = f"depth/{ts:.6f}.png"
        cv2.imwrite(os.path.join(out_dir, rgb_name),
                    np.clip(img, 0, 255).astype(np.uint8))
        cv2.imwrite(os.path.join(out_dir, depth_name),
                    np.clip(depth * depth_factor, 0, 65535).astype(np.uint16))
        rgb_lines.append(f"{ts:.6f} {rgb_name}")
        depth_lines.append(f"{ts:.6f} {depth_name}")
        wc = _np_pose_inverse(pose)
        qw, qx, qy, qz, tx, ty, tz = wc
        gt_lines.append(
            f"{ts:.6f} {tx:.6f} {ty:.6f} {tz:.6f} {qx:.6f} {qy:.6f} {qz:.6f} {qw:.6f}"
        )
    for name, lines in [("rgb.txt", rgb_lines), ("depth.txt", depth_lines),
                        ("groundtruth.txt", gt_lines)]:
        with open(os.path.join(out_dir, name), "w") as f:
            f.write(f"# synthetic TUM-layout export\n# timestamp data\n")
            f.write("\n".join(lines) + "\n")
    return out_dir


def orbit_trajectory(n_frames: int, radius=0.8, z_amp=0.3, yaw_amp=0.25):
    """Smooth looping trajectory inside the room: lateral orbit + yaw sweep.

    Returns f32[n,7] world->camera poses (Tcw).
    """
    poses = []
    for i in range(n_frames):
        a = 2.0 * np.pi * i / max(n_frames, 1)
        # camera center in world
        cx = radius * np.sin(a)
        cy = 0.3 * np.sin(2 * a) * z_amp
        cz = radius * (1 - np.cos(a)) * 0.5
        yaw = yaw_amp * np.sin(a)
        cq = np.array(
            [np.cos(yaw / 2), 0.0, np.sin(yaw / 2), 0.0], np.float32
        )  # rotation about y
        pose_wc = np.concatenate([cq, np.array([cx, cy, cz], np.float32)])
        poses.append(_np_pose_inverse(pose_wc))
    return np.stack(poses)
