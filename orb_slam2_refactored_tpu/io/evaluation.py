"""Trajectory evaluation: ATE (with SE3/Sim3 Umeyama alignment) and RPE.

The reference exports trajectories for *external* evaluation (TUM tools /
KITTI devkit, `/root/reference/include/System.h:84,96`); this build ships the
evaluator so both engines can be scored identically in-repo
(SURVEY.md §6 first-milestone requirement).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

from ..geometry import se3


def _positions(poses_cw: np.ndarray) -> np.ndarray:
    """[N,7] world->camera poses -> [N,3] camera centers in world frame."""
    inv = np.asarray(se3.inverse(jnp.asarray(poses_cw, jnp.float32)))
    return inv[:, 4:7]


def umeyama_alignment(src: np.ndarray, dst: np.ndarray, with_scale: bool = False):
    """Least-squares similarity aligning src -> dst. Returns (s, R, t)."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    xs, xd = src - mu_s, dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs ** 2).sum() / len(src)
        s = float(np.trace(np.diag(D) @ S) / var_s)
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def ate_rmse(
    est_cw: np.ndarray, gt_cw: np.ndarray, align: str = "se3"
) -> Tuple[float, np.ndarray]:
    """Absolute trajectory error RMSE after alignment.

    align: 'se3' (stereo/RGB-D) or 'sim3' (monocular, scale-free).
    Returns (rmse, per-frame errors).
    """
    p_est = _positions(est_cw)
    p_gt = _positions(gt_cw)
    assert p_est.shape == p_gt.shape
    s, R, t = umeyama_alignment(p_est, p_gt, with_scale=(align == "sim3"))
    p_al = (s * (R @ p_est.T)).T + t
    err = np.linalg.norm(p_al - p_gt, axis=1)
    return float(np.sqrt((err ** 2).mean())), err


def associate_timestamps(ts_a: np.ndarray, ts_b: np.ndarray,
                         max_dt: float = 0.02):
    """Greedy nearest-timestamp association (TUM associate.py semantics).

    Returns (idx_a, idx_b) index arrays of matched pairs with |dt| <= max_dt;
    each b index is used at most once."""
    ts_a = np.asarray(ts_a, np.float64)
    ts_b = np.asarray(ts_b, np.float64)
    order = np.argsort(ts_b)
    ts_b_sorted = ts_b[order]
    used = np.zeros(len(ts_b), bool)
    ia, ib = [], []
    for i, t in enumerate(ts_a):
        j = int(np.searchsorted(ts_b_sorted, t))
        best, best_dt = -1, max_dt
        for k in (j - 1, j):
            if 0 <= k < len(ts_b_sorted) and not used[k]:
                dt = abs(ts_b_sorted[k] - t)
                if dt <= best_dt:
                    best, best_dt = k, dt
        if best >= 0:
            used[best] = True
            ia.append(i)
            ib.append(int(order[best]))
    return np.asarray(ia, np.int64), np.asarray(ib, np.int64)


def ate_rmse_assoc(
    est_ts: np.ndarray, est_cw: np.ndarray,
    gt_ts: np.ndarray, gt_cw: np.ndarray,
    align: str = "se3", max_dt: float = 0.02,
) -> Tuple[float, np.ndarray, int]:
    """ATE RMSE between trajectories with DIFFERENT timestamp grids — scores
    estimated trajectories against a real groundtruth file the way the TUM
    evaluation tools do (timestamp association, then aligned RMSE).

    Returns (rmse, per-pair errors, n_matched)."""
    ia, ib = associate_timestamps(est_ts, gt_ts, max_dt)
    if len(ia) < 3:
        raise ValueError(
            f"only {len(ia)} associated pairs (need >=3 for alignment)"
        )
    rmse, err = ate_rmse(np.asarray(est_cw)[ia], np.asarray(gt_cw)[ib], align)
    return rmse, err, len(ia)


def rpe(
    est_cw: np.ndarray, gt_cw: np.ndarray, delta: int = 1
) -> Tuple[float, float]:
    """Relative pose error over frame offsets of `delta`.

    Returns (trans RMSE per step, rot RMSE radians per step).
    """
    e = jnp.asarray(est_cw, jnp.float32)
    g = jnp.asarray(gt_cw, jnp.float32)
    rel_e = se3.compose(e[delta:], se3.inverse(e[:-delta]))
    rel_g = se3.compose(g[delta:], se3.inverse(g[:-delta]))
    d = np.asarray(se3.log(se3.compose(rel_e, se3.inverse(rel_g))))
    t_err = np.linalg.norm(d[:, 3:6], axis=1)
    r_err = np.linalg.norm(d[:, 0:3], axis=1)
    return float(np.sqrt((t_err ** 2).mean())), float(np.sqrt((r_err ** 2).mean()))
