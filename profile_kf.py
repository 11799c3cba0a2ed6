"""Profile the keyframe-stage device programs in steady state (real TPU)."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REPS = int(os.environ.get("PROF_REPS", "5"))


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jnp.sum(leaf.astype(jnp.float32).ravel()[:1]))


def bench_stage(name, fn, *args, reps=REPS, rt=0.027):
    out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    fetch(out)
    dt = (time.perf_counter() - t0 - rt) / reps
    print(f"{name:32s} {dt*1e3:8.2f} ms")
    return dt


def main():
    from orb_slam2_refactored_tpu.slam.map_state import MapCapacity
    from orb_slam2_refactored_tpu.slam.tracking import Tracker, TrackerConfig
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench
    imgs, depths, gt = bench.get_frames()

    cfg = TrackerConfig(
        width=640, height=480, fx=520.0, fy=520.0, cx=320.0, cy=240.0,
        bf=0.08 * 520.0, n_features=1000, n_levels=8, pipelined=False,
        map_capacity=MapCapacity(max_keyframes=128, max_points=32768,
                                 max_features=1000),
    )
    tracker = Tracker(cfg)
    for i in range(40):
        tracker.track_rgbd(imgs[i], depths[i], timestamp=i / 30.0)
    print(f"state={tracker.state} kfs={len(tracker.graph.alive_kfs())} "
          f"pts={tracker.graph.pt_alive.sum()}", file=sys.stderr)

    m = tracker.map
    lm = tracker.local_mapper
    graph = tracker.graph
    new_kf = tracker.ref_kf
    nbs_l = graph.covis_neighbors(new_kf, top_k=lm.tri_neighbors)
    B = lm.tri_neighbors
    nbs = np.full(B, new_kf, np.int32)
    nbs[: len(nbs_l)] = nbs_l[:B]
    nbs_j = jnp.asarray(nbs)

    bench_stage("tri_batch (6 nbrs)", lm._tri_batch, m, jnp.int32(new_kf), nbs_j)
    bench_stage("tri single pair", lm._tri, m, jnp.int32(new_kf),
                jnp.int32(nbs[0]))

    srcs = np.full(10, new_kf, np.int32)
    dsts = np.full(10, new_kf, np.int32)
    for i, nb in enumerate(nbs_l[:5]):
        srcs[i], dsts[i] = new_kf, nb
        srcs[5 + i], dsts[5 + i] = nb, new_kf
    bench_stage("fuse_batch (10 pairs)", lm._fuse_batch, m,
                jnp.asarray(srcs), jnp.asarray(dsts))

    free = np.zeros(cfg.map_capacity.max_keyframes, bool)
    free[new_kf] = True
    for j in graph.covis_neighbors(new_kf, top_k=lm.window):
        free[j] = True
    free_j = jnp.asarray(free)
    bench_stage("local_ba program", lm._ba, m, free_j)

    # BA at different CG budgets to see scaling
    from orb_slam2_refactored_tpu.optim.ba import BAProblem, ba_solve
    def mk_ba(iters, cg):
        def f(m, fr):
            prob = BAProblem(
                kf_pose=m.kf_pose, kf_fixed=~fr, obs_uv=m.kf_xy,
                obs_ur=m.kf_uright, obs_pt=m.kf_mp,
                obs_inv_s2=lm.inv_sigma2[m.kf_level],
                pt_pos=m.mp_pos, pt_valid=m.mp_valid,
            )
            r = ba_solve(prob, lm.cam, iters=iters, cg_iters=cg, lambda0=1e-4)
            return r.kf_pose, r.pt_pos
        return jax.jit(f)
    bench_stage("ba iters=1 cg=1", mk_ba(1, 1), m, free_j)
    bench_stage("ba iters=4 cg=4", mk_ba(4, 4), m, free_j)

    # hamming matrix at tri scale
    from orb_slam2_refactored_tpu.ops import hamming
    d0 = m.kf_desc[new_kf]
    hm = jax.jit(lambda a, b: hamming.hamming_matrix(a, b))
    bench_stage("hamming 1000x1000", hm, d0, d0)
    hmv = jax.jit(lambda a, b: jax.vmap(hamming.hamming_matrix, (None, 0))(a, b))
    bench_stage("hamming vmapped x6", hmv, d0, m.kf_desc[nbs_j])

    # xla-only hamming
    os.environ["TPU_SLAM_PALLAS"] = "0"
    hamming._PALLAS_OK = None
    hm2 = jax.jit(lambda a, b: jnp.sum(jnp.bitwise_count(
        jnp.bitwise_xor(a[:, None, :], b[None, :, :])).astype(jnp.int32), -1))
    bench_stage("hamming 1000x1000 XLA", hm2, d0, d0)

    # refresh program
    Bq, M = 1024, lm.MAXOBS
    pts = np.full(Bq, m.point_capacity, np.int32)
    okf = np.zeros((Bq, M), np.int32)
    oft = np.zeros((Bq, M), np.int32)
    nob = np.zeros(Bq, np.int32)
    cand = [int(p) for p in np.asarray(m.kf_mp[new_kf]) if p >= 0][:Bq]
    for i, p in enumerate(cand):
        pairs = graph.obs_pairs(p)[:M]
        pts[i] = p
        nob[i] = len(pairs)
        for j, (kf, ft) in enumerate(pairs):
            okf[i, j] = kf
            oft[i, j] = ft
    if not hasattr(lm, "_refresh"):
        lm._refresh = jax.jit(lm._refresh_points_impl)
    bench_stage("refresh_points program", lm._refresh, m, jnp.asarray(pts),
                jnp.asarray(okf), jnp.asarray(oft), jnp.asarray(nob))

    # insert_kf program
    frame = tracker.last_kf_frame
    bench_stage("insert_kf program",
                jax.jit(tracker._insert_kf_impl), m, jnp.int32(new_kf), frame,
                jnp.asarray(tracker.pose), jnp.asarray(
                    np.asarray(tracker.last_mp_dev)),
                jnp.full((frame.capacity,), -1, jnp.int32))


if __name__ == "__main__":
    main()
