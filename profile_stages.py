"""Per-stage device-time profiler for the tracking hot path (real TPU).

The axon tunnel adds ~27 ms RT per forced transfer, so each stage is timed
over REPS back-to-back dispatches with ONE tiny forced fetch at the end:
  t = (wall(REPS dispatches + fetch) - tunnel_RT) / REPS
Stages share inputs from a real mid-sequence tracker state so shapes/occupancy
are representative.
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

REPS = int(os.environ.get("PROF_REPS", "10"))


def fetch(x):
    """Force a tiny device->host transfer tied to x."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jnp.sum(leaf.astype(jnp.float32).ravel()[:1]))


def measure_rt():
    x = jnp.zeros((1,), jnp.float32)
    f = jax.jit(lambda a: a + 1)
    for _ in range(3):
        np.asarray(f(x))
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        np.asarray(f(x))
    return (time.perf_counter() - t0) / n


def bench_stage(name, fn, *args, reps=REPS, rt=0.0):
    out = fn(*args)
    fetch(out)  # compile + settle
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    fetch(out)
    dt = (time.perf_counter() - t0 - rt) / reps
    print(f"{name:28s} {dt*1e3:8.2f} ms")
    return dt


def main():
    from orb_slam2_refactored_tpu.slam.map_state import MapCapacity
    from orb_slam2_refactored_tpu.slam.tracking import Tracker, TrackerConfig
    sys.argv = [sys.argv[0]]

    # reuse the bench scene
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
    # get to a steady state: 30 frames
    for i in range(30):
        tracker.track_rgbd(imgs[i], depths[i], timestamp=i / 30.0)
    print(f"state={tracker.state} kfs={len(tracker.graph.alive_kfs())}",
          file=sys.stderr)

    rt = measure_rt()
    print(f"tunnel RT per fetch: {rt*1e3:.1f} ms")

    s = cfg.depth_subsample
    buf = jnp.asarray(tracker._pack_rgbd(imgs[30], depths[30]))
    img = jnp.asarray(imgs[30])
    depth = jnp.asarray(np.ascontiguousarray(np.asarray(depths[30])[::s, ::s]))
    m = tracker.map
    last, last_mp = tracker.last_frame, tracker.last_mp_dev
    pose, vel = tracker.pose_dev, tracker.velocity_dev
    ref_kf = jnp.int32(max(tracker.ref_kf, 0))
    mp_vis, mp_found = tracker.mp_vis_dev, tracker.mp_found_dev
    local_mask = tracker.local_mask_dev

    # full fused step
    bench_stage("step (fused,packed)", tracker._step_packed, buf, last,
                last_mp, m, pose, vel, ref_kf, mp_vis, mp_found, local_mask,
                tracker.mp_seen_dev, tracker.fidx_dev, rt=rt)
    # extraction only
    prep = jax.jit(tracker._prepare_impl)
    bench_stage("prepare (extract+depth)", prep, img, depth, rt=rt)
    frame = prep(img, depth)
    # track only
    trk = jax.jit(tracker._track_impl)
    bench_stage("track (match+LM)", trk, frame, last, last_mp, m, pose, vel,
                ref_kf, local_mask, rt=rt)

    # extraction sub-stages
    from orb_slam2_refactored_tpu.ops import fast as fast_ops
    from orb_slam2_refactored_tpu.ops import image as image_ops
    from orb_slam2_refactored_tpu.ops import orb as orb_ops
    ex = tracker.extractor

    gray = jax.jit(image_ops.to_gray)(img)
    pyr = jax.jit(lambda g: image_ops.build_pyramid(g, cfg.n_levels, 1.2))
    bench_stage("  pyramid", pyr, gray, rt=rt)
    levels = pyr(gray)

    fast_all = jax.jit(lambda ls: [fast_ops.detect_two_threshold(l, 20., 7.)
                                   for l in ls])
    bench_stage("  FAST all levels", fast_all, levels, rt=rt)

    topk_all = jax.jit(lambda ls: [
        orb_ops.select_spread_topk(fast_ops.detect_two_threshold(l, 20., 7.),
                                   ex.budgets[i], ex.cell)[0]
        for i, l in enumerate(ls)])
    bench_stage("  FAST+topk", topk_all, levels, rt=rt)

    blur_all = jax.jit(lambda ls: [image_ops.gaussian_blur(l, 7, 2.0)
                                   for l in ls])
    bench_stage("  blur all levels", blur_all, levels, rt=rt)

    def angles_descs(ls):
        outs = []
        for i, l in enumerate(ls):
            k = ex.budgets[i]
            h, w = l.shape
            ys = jnp.linspace(20, h - 21, k).astype(jnp.int32)
            xs = jnp.linspace(20, w - 21, k).astype(jnp.int32)
            ang = orb_ops.ic_angles(l, ys, xs)
            b = image_ops.gaussian_blur(l, 7, 2.0)
            outs.append(orb_ops.brief_descriptors(b, ys, xs, ang))
        return outs
    bench_stage("  angle+desc (w/ blur)", jax.jit(angles_descs), levels, rt=rt)

    # pose optimize alone
    from orb_slam2_refactored_tpu.optim.pose_opt import pose_optimize
    lm_pos = m.mp_pos[jnp.clip(last_mp, 0, m.point_capacity - 1)]
    po = jax.jit(lambda p, pts, f: pose_optimize(
        p, pts, f.xy, f.u_right, jnp.ones((f.capacity,)), last_mp >= 0,
        tracker.cam, rounds=cfg.pose_opt_rounds,
        iters_per_round=cfg.pose_opt_iters))
    bench_stage("pose_optimize x1", po, pose, lm_pos, frame, rt=rt)

    # matching alone
    from orb_slam2_refactored_tpu.ops import matching
    sbp = jax.jit(lambda f, mm: matching.search_by_projection(
        f.xy, f.level, f.desc, f.valid,
        mm.mp_pos, mm.mp_desc, mm.mp_normal, mm.mp_min_dist, mm.mp_max_dist,
        mm.mp_valid, pose, tracker.cam, tracker.sf, radius=3.0,
        image_bounds=(0., 640., 0., 480.)))
    bench_stage("search_by_projection (map)", sbp, frame, m, rt=rt)

    # keyframe stage wall times (host orchestrated, includes round trips)
    feat_mp = np.asarray(tracker.last_mp_dev)
    t0 = time.perf_counter()
    tracker._create_keyframe(frame, feat_mp, 1.0)
    print(f"{'create_keyframe (wall)':28s} {(time.perf_counter()-t0)*1e3:8.2f} ms")
    print(tracker.timer.report())


if __name__ == "__main__":
    main()
