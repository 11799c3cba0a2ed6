"""Interleaved A/B: fused pair stepping vs per-frame stepping, same link.

The tunnel's bandwidth swings ~2x minute-to-minute in multi-minute phases,
so sequential A-then-B runs measure weather, not code. This harness
alternates SHORT segments (single, pair, single, pair, ...) through ONE
tracker in steady state, so both modes sample the same link phases, and
reports per-mode medians plus the paired per-(adjacent-segment) ratio.

Also measures the fused pair program's DEVICE time vs 2x the single-step
program (XLA may fuse better or worse across the seam).

Usage: timeout 560 python benchmarks/ab_pair.py [segments-per-mode]
"""

import os
import sys
import time

import numpy as np

import jax

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import bench as B
    from orb_slam2_refactored_tpu.slam.map_state import MapCapacity
    from orb_slam2_refactored_tpu.slam.tracking import Tracker, TrackerConfig

    imgs, depths, gt = B.get_frames()
    n = len(imgs)
    cfg = TrackerConfig(
        width=640, height=480, fx=520.0, fy=520.0, cx=320.0, cy=240.0,
        bf=0.08 * 520.0, n_features=1000, n_levels=8, pipelined=True,
        pipeline_depth=6,
        map_capacity=MapCapacity(max_keyframes=128, max_points=32768,
                                 max_features=1000),
        depth_subsample=8, depth_encoding="log8",
    )
    t = Tracker(cfg)
    BATCH = int(os.environ.get("AB_BATCH", "8"))

    def ingest(lo, hi, ts_base, paired):
        futs = t.prefetch_rgbd_batches(imgs[lo:hi], depths[lo:hi], BATCH)
        idx = lo
        for f in futs:
            k = min(BATCH, hi - idx)
            t.track_rgbd_batch(
                None, None,
                [(ts_base + i) / 30.0 for i in range(idx, idx + k)],
                uploaded=f.result(), paired=paired,
            )
            idx += k

    # warmup: one full orbit per mode (compiles everything, trains vocab)
    t0 = time.time()
    ingest(0, n, 0, paired=False)
    t.flush()
    ingest(0, n, n, paired=True)
    t.flush()
    print(f"[ab] warmup {time.time()-t0:.1f}s", file=sys.stderr)

    # interleaved segments over the orbit, steady state (no resets: both
    # modes keep re-tracking the same loop against the established map)
    SEG = int(os.environ.get("AB_SEG", "64"))
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    fps = {"single": [], "pair": []}
    lo, orbit = 0, 2
    for r in range(reps):
        for mode in ("single", "pair"):
            hi = lo + SEG
            seg_frames = [(lo + i) % n for i in range(SEG)]
            futs = t.prefetch_rgbd_batches(
                [imgs[i] for i in seg_frames],
                [depths[i] for i in seg_frames], BATCH)
            ts0 = time.time()
            idx = 0
            for f in futs:
                k = min(BATCH, SEG - idx)
                t.track_rgbd_batch(
                    None, None,
                    [(orbit * n + lo + idx + i) / 30.0 for i in range(k)],
                    uploaded=f.result(), paired=(mode == "pair"),
                )
                idx += k
            t.sync_device()
            dt = time.time() - ts0
            fps[mode].append(SEG / dt)
            lo = (lo + SEG) % n
            orbit += 1
    for mode in ("single", "pair"):
        v = fps[mode]
        print(f"[ab] {mode:6s}: median {np.median(v):6.1f} fps  "
              f"(segments: {', '.join(f'{x:.1f}' for x in v)})",
              file=sys.stderr)
    ratios = [p / s for s, p in zip(fps["single"], fps["pair"])]
    print(f"[ab] paired ratio pair/single per adjacent segment: "
          f"median {np.median(ratios):.3f} "
          f"({', '.join(f'{x:.2f}' for x in ratios)})", file=sys.stderr)

    # device-time comparison: fused pair program vs 2x single step
    def _rt():
        f = jax.jit(lambda a: a + 1)
        x = jnp.zeros((1,), np.float32)
        for _ in range(3):
            np.asarray(f(x))
        tt = time.perf_counter()
        for _ in range(10):
            np.asarray(f(x))
        return (time.perf_counter() - tt) / 10

    def _stage(fn, *args, reps=10, rt=0.0):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        tt = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        return (time.perf_counter() - tt - rt) / reps

    rt = _rt()
    buf_a = jnp.asarray(t._pack_rgbd(imgs[0], depths[0]))
    buf_b = jnp.asarray(t._pack_rgbd(imgs[1], depths[1]))
    rest = (t.last_frame, t.last_mp_dev, t.map, t.pose_dev, t.velocity_dev,
            jnp.int32(max(t.ref_kf, 0)), t.mp_vis_dev, t.mp_found_dev,
            t.local_mask_dev, t.mp_seen_dev, t.fidx_dev)
    t1 = _stage(t._step_packed, buf_a, *rest, rt=rt)
    t2 = _stage(t._step2_packed, buf_a, buf_b, *rest, rt=rt)
    print(f"[ab] device: single step {t1*1e3:.2f} ms, fused pair "
          f"{t2*1e3:.2f} ms ({t2/t1:.2f}x; 2.0x = seam-neutral), "
          f"tunnel RT {rt*1e3:.1f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
