"""Stereo left/right ORB matching -> per-feature disparity & depth.

Capability analog of `ORBmatcher::ComputeStereoMatches`
(`/root/reference/src/ORBmatcher.cc:72-247`): row-banded candidate search in
the rectified pair, best-Hamming association, and a median-distance outlier
filter. TPU-first: the per-row candidate lists (`:82-99`) become a dense
[N,N] mask (row band x disparity window x level window); the association is
one masked Hamming argmin; the 11x11 SAD sub-pixel refinement (`:163-228`)
is a vmapped patch-gather pass (`refine_subpixel`) — it cuts stereo odometry
ATE ~4x vs integer disparity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import hamming


def stereo_match(
    l_xy, l_level, l_desc, l_valid,
    r_xy, r_level, r_desc, r_valid,
    scale_factors,
    bf: float,
    min_z: float,
    max_dist: int = hamming.TH_HIGH,
):
    """Returns (u_right f32[N], depth f32[N]) for each left feature
    (-1 where unmatched), plus the match validity mask."""
    max_d = bf / min_z
    vL = l_xy[:, 1][:, None]
    vR = r_xy[:, 1][None, :]
    uL = l_xy[:, 0][:, None]
    uR = r_xy[:, 0][None, :]
    band = scale_factors[l_level] * 2.0  # row tolerance per left kp (:88)
    row_ok = jnp.abs(vL - vR) <= band[:, None]
    disp = uL - uR
    disp_ok = (disp >= -1.0) & (disp <= max_d)
    lvl_ok = jnp.abs(l_level[:, None] - r_level[None, :]) <= 1
    mask = l_valid[:, None] & r_valid[None, :] & row_ok & disp_ok & lvl_ok

    d = hamming.hamming_matrix(l_desc, r_desc)
    idx, best, _ = hamming.masked_best2(d, mask)
    ok = best <= max_dist

    matched_ur = jnp.where(ok, r_xy[jnp.clip(idx, 0, r_xy.shape[0] - 1), 0], -1.0)
    disparity = jnp.maximum(l_xy[:, 0] - matched_ur, 0.01)
    depth = jnp.where(ok, bf / disparity, -1.0)

    # median-deviation outlier filter (:231-246): drop matches whose Hamming
    # distance exceeds ~2x the median of accepted matches
    med = jnp.median(jnp.where(ok, best, hamming.BIG))
    thr = 1.5 * 1.4 * med
    ok = ok & (best < thr)
    u_right = jnp.where(ok, matched_ur, -1.0)
    depth = jnp.where(ok, depth, -1.0)
    return u_right, depth, ok


W_SAD = 5   # 11x11 window (reference w=5, src/ORBmatcher.cc:166)
R_SAD = 5   # +-5 disparity search (:171 L=5)


def refine_subpixel(
    img_l, img_r, l_xy, u_right, valid, bf: float
):
    """SAD + parabola sub-pixel disparity refinement
    (`/root/reference/src/ORBmatcher.cc:163-228`): an 11x11 intensity window
    around the left keypoint slides +-5 px along the matched right row; the
    best SAD and its neighbors fit a parabola for sub-pixel disparity.
    Evaluated on the level-0 images for every match at once (the reference
    works per-level; level-0 is exact for the dominant low levels).
    Returns (u_right', depth', valid')."""
    H, W = img_l.shape
    img_l = img_l.astype(jnp.float32)
    img_r = img_r.astype(jnp.float32)
    P = 2 * W_SAD + 1
    S = P + 2 * R_SAD

    yl = jnp.clip(jnp.round(l_xy[:, 1]).astype(jnp.int32), W_SAD, H - W_SAD - 1)
    xl = jnp.clip(jnp.round(l_xy[:, 0]).astype(jnp.int32), W_SAD, W - W_SAD - 1)
    ur0 = jnp.clip(
        jnp.round(u_right).astype(jnp.int32), W_SAD + R_SAD, W - W_SAD - R_SAD - 1
    )

    def one(y, x, ur):
        patch_l = jax.lax.dynamic_slice(img_l, (y - W_SAD, x - W_SAD), (P, P))
        strip_r = jax.lax.dynamic_slice(
            img_r, (y - W_SAD, ur - W_SAD - R_SAD), (P, S)
        )
        # normalize by center intensity like the reference (:175-185 IL-centered)
        patch_l = patch_l - patch_l[W_SAD, W_SAD]

        def sad(r):
            win = jax.lax.dynamic_slice(strip_r, (0, r), (P, P))
            win = win - win[W_SAD, W_SAD]
            return jnp.sum(jnp.abs(patch_l - win))

        sads = jax.vmap(sad)(jnp.arange(2 * R_SAD + 1))
        best = jnp.argmin(sads)
        bi = jnp.clip(best, 1, 2 * R_SAD - 1)
        s_m, s_0, s_p = sads[bi - 1], sads[bi], sads[bi + 1]
        denom = s_m + s_p - 2.0 * s_0
        delta = jnp.where(
            jnp.abs(denom) > 1e-6, 0.5 * (s_m - s_p) / denom, 0.0
        )
        delta = jnp.clip(delta, -1.0, 1.0)  # reference rejects |d|>1 (:217)
        return ur.astype(jnp.float32) + (bi - R_SAD).astype(jnp.float32) + delta

    ur_ref = jax.vmap(one)(yl, xl, ur0)
    disparity = l_xy[:, 0] - ur_ref
    good = valid & (disparity > 0.01) & (disparity < bf)  # z > 1 px-unit
    depth = jnp.where(good, bf / jnp.maximum(disparity, 0.01), -1.0)
    u_right_out = jnp.where(good, ur_ref, -1.0)
    return u_right_out, depth, good


def refine_subpixel_pyramid(
    levels_l, levels_r, l_xy, l_level, u_right, valid, bf: float,
    scale_factors,
):
    """Per-level SAD refinement — the reference's exact octave semantics
    (`/root/reference/src/ORBmatcher.cc:163-228`: coordinates scale into the
    keypoint's pyramid level via `kp.pt * invScale`, the 11x11 window slides
    THERE, and the result scales back). Depth needs no rescale: both bf and
    the disparity shrink by the same level scale.

    ONE pass over the keypoints: the levels stack into a zero-padded
    [L, H0, W0] volume and each keypoint patch-gathers from ITS OWN level
    plane. The previous form ran a full all-keypoint SAD pass PER LEVEL
    (8x the patch work, 23.5 ms of the stereo step's 30 ms device time at
    VGA); this one is level-count-independent."""
    N = u_right.shape[0]
    L = len(levels_l)
    H0, W0 = levels_l[0].shape
    P = 2 * W_SAD + 1
    S = P + 2 * R_SAD

    # vertically flattened pyramid [sum_H, W0]: a per-keypoint read becomes
    # a ROW GATHER + vmapped column slice — the lowering `ops/orb.py`'s
    # `_gather_patches` measured 8x faster than per-keypoint 2-D
    # dynamic_slice on TPU
    offs = np.cumsum([0] + [lv.shape[0] for lv in levels_l])[:-1]

    def flat(levels):
        return jnp.concatenate([
            jnp.pad(lv.astype(jnp.float32), ((0, 0), (0, W0 - lv.shape[1])))
            for lv in levels
        ], axis=0)

    fl_l = flat(levels_l)   # [sumH, W0]
    fl_r = flat(levels_r)
    off_arr = jnp.asarray(offs, jnp.int32)
    h_arr = jnp.asarray([lv.shape[0] for lv in levels_l], jnp.int32)
    w_arr = jnp.asarray([lv.shape[1] for lv in levels_l], jnp.int32)

    lvl = jnp.clip(l_level, 0, L - 1)
    inv = 1.0 / scale_factors[lvl]
    hh = h_arr[lvl]
    ww = w_arr[lvl]
    yl = jnp.clip(jnp.round(l_xy[:, 1] * inv).astype(jnp.int32),
                  W_SAD, hh - W_SAD - 1)
    xl = jnp.clip(jnp.round(l_xy[:, 0] * inv).astype(jnp.int32),
                  W_SAD, ww - W_SAD - 1)
    ur0 = jnp.clip(jnp.round(u_right * inv).astype(jnp.int32),
                   W_SAD + R_SAD, ww - W_SAD - R_SAD - 1)
    yg = off_arr[lvl] + yl  # rows in the flattened plane

    dy = jnp.arange(-W_SAD, W_SAD + 1)
    rows_l = fl_l[yg[:, None] + dy[None, :]]  # [N,P,W0]
    rows_r = fl_r[yg[:, None] + dy[None, :]]

    def one(rl, rr, x, ur):
        patch_l = jax.lax.dynamic_slice(rl, (0, x - W_SAD), (P, P))
        strip_r = jax.lax.dynamic_slice(rr, (0, ur - W_SAD - R_SAD), (P, S))
        # normalize by center intensity like the reference (:175-185)
        patch_l = patch_l - patch_l[W_SAD, W_SAD]
        wins = jnp.stack([strip_r[:, r: r + P]
                          for r in range(2 * R_SAD + 1)])  # [11,P,P]
        wins = wins - wins[:, W_SAD, W_SAD][:, None, None]
        sads = jnp.sum(jnp.abs(patch_l[None] - wins), axis=(1, 2))
        best = jnp.argmin(sads)
        bi = jnp.clip(best, 1, 2 * R_SAD - 1)
        s_m, s_0, s_p = sads[bi - 1], sads[bi], sads[bi + 1]
        denom = s_m + s_p - 2.0 * s_0
        # raw parabola offset; the reference REJECTS |deltaR|>1 (:215-217)
        # rather than clipping — a vertex outside the neighbor pair means
        # the SAD valley is not locally quadratic (repeated texture)
        delta = jnp.where(jnp.abs(denom) > 1e-6,
                          0.5 * (s_m - s_p) / denom, 2.0)
        ur_f = (ur.astype(jnp.float32) + (bi - R_SAD).astype(jnp.float32)
                + jnp.clip(delta, -1.0, 1.0))
        # a border argmin means the true minimum may lie OUTSIDE the +-R
        # search window — the reference rejects it outright
        # (`if(bestincR==-L||bestincR==L) continue`, :210-212); without
        # this gate the clip above silently shifts to a non-minimum
        # interior sample
        interior = (best != 0) & (best != 2 * R_SAD)
        return ur_f, sads[bi], (jnp.abs(delta) <= 1.0) & interior

    ur_lvl, sad_best, delta_ok = jax.vmap(one)(rows_l, rows_r, xl, ur0)
    ur_ref = ur_lvl * scale_factors[lvl]              # back to level 0
    disparity = l_xy[:, 0] - ur_ref
    import os as _os
    # diagnostic knob, read at TRACE time (baked into the compiled
    # program): set TPU_SLAM_SAD_LOOSE=1 BEFORE building any stereo
    # tracker in the process; flipping it later has no effect
    strict = _os.environ.get("TPU_SLAM_SAD_LOOSE", "") in ("", "0")
    good = valid & (disparity > 0.01) & (disparity < bf)
    if strict:
        good = good & delta_ok
        # SAD median outlier filter (`src/ORBmatcher.cc:231-246`): matches
        # whose best SAD exceeds 1.5*1.4x the median of accepted SADs drop
        med = jnp.nanmedian(jnp.where(good, sad_best, jnp.nan))
        med = jnp.where(jnp.isnan(med), jnp.inf, med)
        good = good & (sad_best < 1.5 * 1.4 * med)
    depth = jnp.where(good, bf / jnp.maximum(disparity, 0.01), -1.0)
    ur_out = jnp.where(good, ur_ref, -1.0)
    return ur_out, depth, good
