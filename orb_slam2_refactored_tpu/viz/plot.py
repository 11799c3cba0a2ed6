"""Headless map / trajectory visualization (the Pangolin viewer analog).

Capability analog of the reference's Viewer/FrameDrawer/MapDrawer stack
(`/root/reference/src/Viewer.cc:62-179`, `MapDrawer`): renders the sparse
landmark cloud, keyframe frusta, covisibility graph and the camera
trajectory — as offline matplotlib figures (no interactive GUI dependency;
headless-friendly by design, SURVEY.md §7 step 9).
"""

from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from ..geometry import se3  # noqa: E402


def plot_map(tracker, out_path: str, gt=None, title: str = "tpu-slam map"):
    """Top-down (x-z) map + trajectory figure; returns the path."""
    fig, ax = plt.subplots(figsize=(8, 8))
    m = tracker.map
    g = tracker.graph
    pts = np.asarray(m.mp_pos)
    alive = np.asarray(m.mp_valid)
    if alive.any():
        ax.scatter(pts[alive, 0], pts[alive, 2], s=0.5, c="#888888",
                   label=f"{int(alive.sum())} landmarks")
    if tracker.trajectory:
        traj_cw = np.stack(tracker.trajectory)
        centers = np.asarray(se3.inverse(jnp.asarray(traj_cw)))[:, 4:7]
        ax.plot(centers[:, 0], centers[:, 2], "-", lw=1.2, c="#1f77b4",
                label="estimated")
    if gt is not None:
        centers_gt = np.asarray(se3.inverse(jnp.asarray(np.asarray(gt))))[:, 4:7]
        ax.plot(centers_gt[:, 0], centers_gt[:, 2], "--", lw=1.0, c="#2ca02c",
                label="ground truth")
    kfs = g.alive_kfs()
    if len(kfs):
        kf_pose = np.asarray(m.kf_pose)[kfs]
        kc = np.asarray(se3.inverse(jnp.asarray(kf_pose)))[:, 4:7]
        ax.scatter(kc[:, 0], kc[:, 2], marker="s", s=14, c="#d62728",
                   label=f"{len(kfs)} keyframes")
        # covisibility edges
        for a in kfs:
            for b in g.covis_neighbors(int(a), min_weight=15):
                if b > a:
                    pa = kc[list(kfs).index(a)]
                    pb = kc[list(kfs).index(b)]
                    ax.plot([pa[0], pb[0]], [pa[2], pb[2]], "-", lw=0.3,
                            c="#d6272855")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_title(title)
    ax.legend(loc="best", fontsize=8)
    ax.set_aspect("equal")
    fig.tight_layout()
    fig.savefig(out_path, dpi=130)
    plt.close(fig)
    return out_path


def plot_frame(img, frame_data, feat_mp=None, out_path: str = "frame.png"):
    """Current frame with tracked keypoints (FrameDrawer::DrawFrame analog)."""
    fig, ax = plt.subplots(figsize=(8, 6))
    ax.imshow(np.asarray(img), cmap="gray")
    xy = np.asarray(frame_data.xy)
    valid = np.asarray(frame_data.valid)
    if feat_mp is not None:
        tracked = valid & (np.asarray(feat_mp) >= 0)
        ax.scatter(xy[tracked, 0], xy[tracked, 1], s=6, c="#2ca02c",
                   marker="o", label=f"tracked {int(tracked.sum())}")
        rest = valid & ~tracked
        ax.scatter(xy[rest, 0], xy[rest, 1], s=3, c="#1f77b4", marker=".",
                   label=f"untracked {int(rest.sum())}")
    else:
        ax.scatter(xy[valid, 0], xy[valid, 1], s=3, c="#1f77b4", marker=".")
    ax.legend(loc="lower right", fontsize=8)
    ax.set_axis_off()
    fig.tight_layout()
    fig.savefig(out_path, dpi=130)
    plt.close(fig)
    return out_path
