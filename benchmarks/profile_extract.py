"""Per-stage device profile of the extraction pipeline + tracking step.

Breaks tracker._prepare_packed (~2.3 ms) and _step_packed (~6 ms) into
sub-stages, each timed as its own jitted program (back-to-back dispatch,
tunnel RT subtracted) to direct optimization at the real hot spots.
"""

import os
import sys
import time

import numpy as np

os.makedirs("/tmp/jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


def _rt():
    f = jax.jit(lambda a: a + 1)
    x = jnp.zeros((1,), np.float32)
    for _ in range(3):
        np.asarray(f(x))
    t = time.perf_counter()
    for _ in range(10):
        np.asarray(f(x))
    return (time.perf_counter() - t) / 10


def _stage(fn, *args, reps=20, rt=0.0):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    best = np.inf
    for _ in range(3):
        t = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        best = min(best, (time.perf_counter() - t - rt) / reps)
    return best


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench as bench_mod
    from orb_slam2_refactored_tpu.ops import fast as fast_ops
    from orb_slam2_refactored_tpu.ops import image as image_ops
    from orb_slam2_refactored_tpu.ops import orb as orb_ops
    from orb_slam2_refactored_tpu.slam.map_state import MapCapacity
    from orb_slam2_refactored_tpu.slam.tracking import Tracker, TrackerConfig

    imgs, depths, gt = bench_mod.get_frames()
    cfg = TrackerConfig(
        width=640, height=480, fx=520.0, fy=520.0, cx=320.0, cy=240.0,
        bf=0.08 * 520.0, n_features=1000, n_levels=8, pipelined=True,
        map_capacity=MapCapacity(max_keyframes=128, max_points=32768,
                                 max_features=1000),
        depth_subsample=2, depth_encoding="log8",
    )
    tracker = Tracker(cfg)
    for i in range(55):
        tracker.track_rgbd(imgs[i], depths[i], timestamp=i / 30.0)
    tracker.flush()
    rt = _rt()
    print(f"[pex] tunnel RT {rt*1e3:.2f} ms (subtracted)", file=sys.stderr)

    ex = tracker.extractor
    img_f = jnp.asarray(imgs[-1].astype(np.float32))
    buf_j = jnp.asarray(tracker._pack_rgbd(imgs[-1], depths[-1]))

    t_unpack = _stage(jax.jit(tracker._unpack_impl), buf_j, rt=rt)

    pyr = jax.jit(lambda im: image_ops.build_pyramid(
        im, ex.n_levels, ex.scale_factor))
    t_pyr = _stage(pyr, img_f, rt=rt)

    def fast_all(im):
        levels = image_ops.build_pyramid(im, ex.n_levels, ex.scale_factor)
        return [fast_ops.detect_two_threshold(l, ex.ini_th, ex.min_th)
                for l in levels]

    t_fast = _stage(jax.jit(fast_all), img_f, rt=rt) - t_pyr

    def select_all(im):
        levels = image_ops.build_pyramid(im, ex.n_levels, ex.scale_factor)
        outs = []
        for l, lvl in enumerate(levels):
            k = ex.budgets[l]
            if k <= 0:
                continue
            score = fast_ops.detect_two_threshold(lvl, ex.ini_th, ex.min_th)
            outs.append(orb_ops.select_spread_topk(score, k, ex.cell))
        return outs

    t_sel = _stage(jax.jit(select_all), img_f, rt=rt) - t_pyr - t_fast

    t_extract = _stage(jax.jit(ex._extract_impl), img_f, rt=rt)
    t_desc = t_extract - t_pyr - t_fast - t_sel

    t_prep = _stage(tracker._prepare_packed, buf_j, rt=rt)

    args = (buf_j, tracker.last_frame, tracker.last_mp_dev,
            tracker.map, tracker.pose_dev, tracker.velocity_dev,
            jnp.int32(max(tracker.ref_kf, 0)),
            tracker.mp_vis_dev, tracker.mp_found_dev,
            tracker.local_mask_dev, tracker.mp_seen_dev, tracker.fidx_dev)
    t_step = _stage(tracker._step_packed, *args, rt=rt)

    print(f"[pex] unpack           {t_unpack*1e3:6.2f} ms", file=sys.stderr)
    print(f"[pex] pyramid          {t_pyr*1e3:6.2f} ms", file=sys.stderr)
    print(f"[pex] FAST (8 lvl)     {t_fast*1e3:6.2f} ms", file=sys.stderr)
    print(f"[pex] select topk      {t_sel*1e3:6.2f} ms", file=sys.stderr)
    print(f"[pex] angle+desc       {t_desc*1e3:6.2f} ms", file=sys.stderr)
    print(f"[pex] extract total    {t_extract*1e3:6.2f} ms", file=sys.stderr)
    print(f"[pex] prepare(packed)  {t_prep*1e3:6.2f} ms "
          f"(depth assoc = {max(t_prep-t_extract-t_unpack,0)*1e3:.2f})",
          file=sys.stderr)
    print(f"[pex] full step        {t_step*1e3:6.2f} ms "
          f"(track = {(t_step-t_prep)*1e3:.2f})", file=sys.stderr)


if __name__ == "__main__":
    main()
