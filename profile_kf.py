"""Profile the keyframe-stage device programs in steady state (real TPU).

Each program is timed over REPS back-to-back dispatches with one tiny forced
fetch at the end; the tunnel RT is subtracted, so numbers ~= device compute.
"""
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


def measure_rt():
    x = jnp.zeros((1,), jnp.float32)
    f = jax.jit(lambda a: a + 1)
    for _ in range(3):
        np.asarray(f(x))
    t0 = time.perf_counter()
    for _ in range(20):
        np.asarray(f(x))
    return (time.perf_counter() - t0) / 20


def bench_stage(name, fn, *args, reps=REPS, rt=0.03):
    out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    fetch(out)
    dt = (time.perf_counter() - t0 - rt) / reps
    print(f"{name:32s} {dt*1e3:8.2f} ms", flush=True)
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

    rt = measure_rt()
    print(f"tunnel RT {rt*1e3:.1f} ms")

    m = tracker.map
    lm = tracker.local_mapper
    graph = tracker.graph
    new_kf = tracker.ref_kf
    nbs_l = graph.covis_neighbors(new_kf, top_k=lm.tri_neighbors)
    B = lm.tri_neighbors
    nbs = np.full(B, new_kf, np.int32)
    nbs[: len(nbs_l)] = nbs_l[:B]
    nbs_j = jnp.asarray(nbs)

    # per-frame step for context
    img_j, dep_j = jnp.asarray(imgs[40]), jnp.asarray(depths[40])
    bench_stage("frame step (fused)", tracker._step, img_j, dep_j,
                tracker.last_frame, tracker.last_mp_dev, m,
                tracker.pose_dev, tracker.velocity_dev,
                jnp.int32(max(tracker.ref_kf, 0)),
                tracker.mp_vis_dev, tracker.mp_found_dev,
                tracker.local_mask_dev, tracker.mp_seen_dev,
                tracker.fidx_dev, rt=rt)

    bench_stage("tri_batch (6 nbrs)", lm._tri_batch, m, jnp.int32(new_kf),
                nbs_j, rt=rt)
    slots_all = jnp.full((B, 1000), -1, jnp.int32)
    small, idx_dev, xw_dev = lm._tri_batch(m, jnp.int32(new_kf), nbs_j)
    def tia(mm, kf, nbs, sl, ib, xw):
        for b in range(B):
            mm = lm._tri_insert_impl(mm, kf, nbs[b], sl[b], ib[b], xw[b])
        return mm
    bench_stage("tri_insert_all", jax.jit(tia), m, jnp.int32(new_kf),
                nbs_j, slots_all, idx_dev, xw_dev, rt=rt)

    srcs = np.full(10, new_kf, np.int32)
    dsts = np.full(10, new_kf, np.int32)
    for i, nb in enumerate(nbs_l[:5]):
        srcs[i], dsts[i] = new_kf, nb
        srcs[5 + i], dsts[5 + i] = nb, new_kf
    bench_stage("fuse_batch (10 pairs)", lm._fuse_batch, m,
                jnp.asarray(srcs), jnp.asarray(dsts), rt=rt)

    pad = jnp.full(512, m.kf_capacity, jnp.int32)
    padp = jnp.full(512, m.point_capacity, jnp.int32)
    bench_stage("fuse_apply (512 pad)", jax.jit(lm._fuse_apply_impl), m, pad,
                pad, padp, padp, padp, rt=rt)

    # window BA exactly as local_ba builds it
    W = lm.BA_WINDOW
    K = graph.cap.max_keyframes
    free_list = [new_kf] + graph.covis_neighbors(new_kf, top_k=lm.window)
    free_list = free_list[:W - 1]
    seen = set(free_list)
    frontier = []
    for k in free_list:
        for nb in graph.covis_neighbors(int(k)):
            if nb not in seen:
                seen.add(nb)
                frontier.append(nb)
                if len(free_list) + len(frontier) >= W:
                    break
        if len(free_list) + len(frontier) >= W:
            break
    win_idx = np.full(W, K, np.int32)
    win_free = np.zeros(W, bool)
    win_valid = np.zeros(W, bool)
    n_f = len(free_list)
    win_idx[:n_f] = free_list
    win_free[:n_f] = True
    win_valid[:n_f] = True
    win_idx[n_f:n_f + len(frontier)] = frontier
    win_valid[n_f:n_f + len(frontier)] = True
    P = m.point_capacity
    rows = graph.kf_row[[int(k) for k in win_idx[: n_f + len(frontier)]]]
    pts = np.unique(rows[rows >= 0]).astype(np.int64)
    Q = next((b for b in lm.BA_POINT_BUCKETS if len(pts) < b),
             lm.BA_POINT_BUCKETS[-1])
    pts = pts[: Q - 1]
    lut = np.full(P, Q - 1, np.int32)
    lut[pts] = np.arange(len(pts), dtype=np.int32)
    pts_local = np.full(Q, P, np.int32)
    pts_local[: len(pts)] = pts
    bench_stage(f"local_ba W={W} (free={n_f}, pts={len(pts)})", lm._ba, m,
                jnp.asarray(win_idx), jnp.asarray(win_free),
                jnp.asarray(win_valid), jnp.asarray(lut),
                jnp.asarray(pts_local), rt=rt)

    bench_stage("cull program (512 pad)", jax.jit(lm._cull_impl), m,
                padp, pad, jnp.zeros(512, jnp.int32), rt=rt)

    Bq, M = 1024, lm.MAXOBS
    pts = jnp.full(Bq, m.point_capacity, jnp.int32)
    okf = jnp.zeros((Bq, M), jnp.int32)
    oft = jnp.zeros((Bq, M), jnp.int32)
    nob = jnp.zeros(Bq, jnp.int32)
    bench_stage("refresh_points (1024)", jax.jit(lm._refresh_points_impl),
                m, pts, okf, oft, nob, rt=rt)

    # insert_kf program (non-donating copy for repeat timing)
    frame = tracker._prepare(img_j, dep_j)
    bench_stage("insert_kf", jax.jit(tracker._insert_kf_impl), m, 64, frame,
                tracker.pose_dev,
                jnp.full(1000, -1, jnp.int32), jnp.full(1000, -1, jnp.int32),
                rt=rt)


if __name__ == "__main__":
    main()
