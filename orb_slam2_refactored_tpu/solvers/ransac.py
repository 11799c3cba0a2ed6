"""Vmapped RANSAC solvers: Horn 3D-3D (Sim3/SE3) and DLT P6P camera resection.

Capability analogs:
- `horn_ransac`  <- `Sim3Solver` (`/root/reference/src/Sim3Solver.cc:111-365`):
  Horn 1987 closed-form absolute orientation from 3 correspondences inside
  RANSAC, fixed scale s=1 for stereo/RGB-D (`:39` bFixScale), reprojection
  gating at 9.21*sigma^2 (`:245-246`). Also serves stereo/RGB-D
  relocalization (3D map point <-> 3D frame point with s=1).
- `p6p_ransac`   <- `PnPsolver` (`src/PnPsolver.cc:165-258`): the EPnP+RANSAC
  relocalization solver. The TPU realization solves the 6-point DLT resection
  per hypothesis (one tiny SVD, trivially vmapped) — every hypothesis in the
  population evaluates simultaneously, replacing the round-robin `iterate(5)`
  scheduling (`src/Tracking.cc:349-441`) with one batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import projection as proj
from ..geometry import se3


class RansacResult(NamedTuple):
    success: jnp.ndarray   # bool
    pose: jnp.ndarray      # f32[7] (and scale f32 for horn with scale)
    scale: jnp.ndarray     # f32 (1.0 when fixed)
    inliers: jnp.ndarray   # bool[M]
    n_inliers: jnp.ndarray


def horn_align(x_src, x_dst, with_scale: bool):
    """Closed-form similarity aligning src -> dst point sets [K,3]
    (Horn 1987 via SVD of the correlation, `src/Sim3Solver.cc:51-63` uses the
    quaternion-eigen variant; SVD is numerically equivalent).
    Returns (q, t, s): x_dst ~= s*R(q) x_src + t."""
    mu_s = x_src.mean(0)
    mu_d = x_dst.mean(0)
    xs = x_src - mu_s
    xd = x_dst - mu_d
    cov = xd.T @ xs
    U, D, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(U @ Vt)
    S = jnp.diag(jnp.stack([jnp.float32(1.0), jnp.float32(1.0), det]))
    R = U @ S @ Vt
    if with_scale:
        var_s = jnp.maximum(jnp.sum(xs * xs), 1e-12)
        s = jnp.sum(D * jnp.diag(S)) / var_s
    else:
        s = jnp.float32(1.0)
    t = mu_d - s * (R @ mu_s)
    q = se3.quat_from_matrix(R)
    return q, t, s


def horn_ransac(
    x_src,
    x_dst,
    valid,
    key,
    with_scale: bool = False,
    n_iters: int = 128,
    inlier_th: float = 0.09,
    min_inliers: int = 20,
) -> RansacResult:
    """RANSAC absolute orientation between matched 3D sets [M,3].

    inlier gate: squared euclidean distance gated in BOTH frames (the
    reference's Sim3Solver checks reprojection in both images,
    src/Sim3Solver.cc:245-246 err1/err2) — the backward residual is the
    forward one divided by s^2, so the two-sided gate is
    e2 < th * min(1, s^2). One-sided 3D gating is degenerate under
    with_scale: a tiny s maps every source point near one spot and buys
    spurious inliers. Threshold in m^2."""
    M = x_src.shape[0]
    keys = jax.random.split(key, n_iters)

    def gate(e2, s):
        # a proper similarity has s > 0; reflections (negative Horn scale)
        # and extreme scales (|log s| > log 4 — far beyond plausible SLAM
        # scale drift over one loop) are degenerate fits, not solutions
        s_ok = (s > 0.25) & (s < 4.0)
        return (e2 < inlier_th * jnp.minimum(1.0, s * s)) & s_ok

    def hyp(k):
        g = jax.random.gumbel(k, (M,)) + jnp.where(valid, 0.0, -1e9)
        idx = jax.lax.top_k(g, 3)[1]
        q, t, s = horn_align(x_src[idx], x_dst[idx], with_scale)
        pred = s * se3.quat_rotate(q[None], x_src) + t[None]
        e2 = jnp.sum((pred - x_dst) ** 2, -1)
        inl = valid & gate(e2, s)
        return inl.sum(), q, t, s, inl

    n_inl, qs, ts, ss, inls = jax.vmap(hyp)(keys)
    best = jnp.argmax(n_inl)
    inl = inls[best]
    # refine on the full inlier set
    w = inl.astype(jnp.float32)[:, None]
    n = jnp.maximum(inl.sum(), 3)

    def refine(_):
        mu_s = (x_src * w).sum(0) / n
        mu_d = (x_dst * w).sum(0) / n
        xs = (x_src - mu_s) * w
        xd = (x_dst - mu_d) * w
        cov = xd.T @ xs
        U, D, Vt = jnp.linalg.svd(cov)
        det = jnp.linalg.det(U @ Vt)
        S = jnp.diag(jnp.stack([jnp.float32(1.0), jnp.float32(1.0), det]))
        R = U @ S @ Vt
        if with_scale:
            var_s = jnp.maximum(jnp.sum(xs * xs), 1e-12)
            s = jnp.sum(D * jnp.diag(S)) / var_s
        else:
            s = jnp.float32(1.0)
        t = mu_d - s * (R @ mu_s)
        return se3.quat_from_matrix(R), t, s

    q, t, s = refine(None)
    pred = s * se3.quat_rotate(q[None], x_src) + t[None]
    e2 = jnp.sum((pred - x_dst) ** 2, -1)
    inl = valid & gate(e2, s)
    return RansacResult(
        success=inl.sum() >= min_inliers,
        pose=se3.make(q, t),
        scale=s,
        inliers=inl,
        n_inliers=inl.sum(),
    )


def _dlt_resection(X, uv, w=None):
    """6+ point DLT: solve P [3,4] s.t. uv ~ P [X;1]; decompose to (R,t)
    assuming known intrinsics were removed (uv are NORMALIZED image coords).
    `w`: optional per-point weights (0 rows drop out of the nullspace fit)."""
    n = X.shape[0]
    ones = jnp.ones((n, 1))
    Xh = jnp.concatenate([X, ones], -1)  # [n,4]
    zeros = jnp.zeros((n, 4))
    r1 = jnp.concatenate([Xh, zeros, -uv[:, 0:1] * Xh], -1)
    r2 = jnp.concatenate([zeros, Xh, -uv[:, 1:2] * Xh], -1)
    A = jnp.concatenate([r1, r2], 0)  # [2n,12]
    if w is not None:
        A = A * jnp.concatenate([w, w])[:, None]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    P = Vt[-1].reshape(3, 4)
    # enforce rotation via SVD of the leading 3x3
    Rraw = P[:, :3]
    U, D, Vt2 = jnp.linalg.svd(Rraw)
    det = jnp.linalg.det(U @ Vt2)
    R = U @ jnp.diag(jnp.stack([jnp.float32(1.0), jnp.float32(1.0), det])) @ Vt2
    scale = jnp.sum(D) / 3.0 * det  # signed scale
    t = P[:, 3] / jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)
    # cheirality fix: majority of points must land in front
    z = (X @ R[2] + t[2])
    flip = jnp.sum(jnp.sign(z)) < 0
    R = jnp.where(flip, -R, R)
    t = jnp.where(flip, -t, t)
    return se3.from_Rt(R, t)


def p6p_ransac(
    pts3d,
    uv,
    valid,
    cam: proj.CameraIntrinsics,
    key,
    n_iters: int = 256,
    sample_size: int = 12,
    inlier_th_px: float = 9.0,
    min_inliers: int = 15,
) -> RansacResult:
    """RANSAC camera resection from 2D-3D matches (PnPsolver analog).

    pts3d [M,3] world, uv [M,2] pixels. Returns world->camera pose."""
    M = pts3d.shape[0]
    xn = jnp.stack(
        [(uv[:, 0] - cam.cx) / cam.fx, (uv[:, 1] - cam.cy) / cam.fy], -1
    )
    keys = jax.random.split(key, n_iters)

    def hyp(k):
        # non-minimal 12-point hypotheses: the DLT is noise-sensitive at the
        # minimal size; a slightly larger sample trades a few extra RANSAC
        # iterations for far more accurate hypotheses (vmapped, so free)
        g = jax.random.gumbel(k, (M,)) + jnp.where(valid, 0.0, -1e9)
        idx = jax.lax.top_k(g, sample_size)[1]
        pose = _dlt_resection(pts3d[idx], xn[idx])
        uv_pred, z = proj.project_world(cam, pose, pts3d)
        e2 = jnp.sum((uv_pred - uv) ** 2, -1)
        inl = valid & (z > 0.01) & (e2 < inlier_th_px)
        return inl.sum(), pose, inl

    n_inl, poses, inls = jax.vmap(hyp)(keys)
    best = jnp.argmax(n_inl)
    # non-minimal refinement on the winning inlier set (PnPsolver::Refine
    # analog, src/PnPsolver.cc:260-306)
    w = inls[best].astype(jnp.float32)
    pose_r = _dlt_resection(pts3d, xn, w)
    uv_pred, z = proj.project_world(cam, pose_r, pts3d)
    e2 = jnp.sum((uv_pred - uv) ** 2, -1)
    inl_r = valid & (z > 0.01) & (e2 < inlier_th_px)
    use_r = inl_r.sum() >= n_inl[best]
    pose = jnp.where(use_r, pose_r, poses[best])
    inl = jnp.where(use_r, inl_r, inls[best])
    return RansacResult(
        success=jnp.maximum(inl.sum(), n_inl[best]) >= min_inliers,
        pose=pose,
        scale=jnp.float32(1.0),
        inliers=inl,
        n_inliers=inl.sum(),
    )
