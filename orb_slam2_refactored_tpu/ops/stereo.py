"""Stereo left/right ORB matching -> per-feature disparity & depth.

Capability analog of `ORBmatcher::ComputeStereoMatches`
(`/root/reference/src/ORBmatcher.cc:72-247`): row-banded candidate search in
the rectified pair, best-Hamming association, and a median-distance outlier
filter. TPU-first: the per-row candidate lists (`:82-99`) become a dense
[N,N] mask (row band x disparity window x level window); the association is
one masked Hamming argmin. The reference's 11x11 SAD sub-pixel refinement
(`:163-228`) trades ~0.5px disparity precision for a large patch-gather pass;
it lands with the Pallas patch kernel (same gather machinery as descriptors).
"""

from __future__ import annotations

import jax.numpy as jnp

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
