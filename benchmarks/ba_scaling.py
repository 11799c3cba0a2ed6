"""Sharded global-BA scaling measurement over a virtual CPU device mesh.

Times the keyframe-sharded `sharded_ba_solve` on a compute-bound problem
(K=256 keyframes x 512 obs, 16k landmarks — KITTI-map scale) at 1/2/4/8
devices and reports wall time + parallel efficiency.

HONEST CAVEAT (read before quoting numbers): this host exposes N VIRTUAL
devices over a 2-core CPU, so wall-clock "speedup" here mostly measures
XLA:CPU's intra-op threading, NOT what a TPU slice would do. What the run
DOES validate: (a) the sharded program compiles and produces the same result
at every mesh size, (b) per-shard FLOPs and bytes shrink ~1/N (printed), and
(c) the collective volume per CG iteration is a single [P,3] psum + two
scalar psums — on a real slice that rides ICI at ~100GB/s+, so the expected
efficiency at 2+ hosts is bounded by psum([16384,3] f32 = 196KB) per CG
iteration against ~10ms of per-shard compute, i.e. >95% on ICI and >=70% on
DCN-connected hosts (BASELINE.json north star).

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python benchmarks/ba_scaling.py
"""

import os
import sys
import time

os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import make_ba_problem  # noqa: E402
from orb_slam2_refactored_tpu.parallel.sharded_ba import (  # noqa: E402
    make_mesh, sharded_ba_solve,
)

K, N, P = 256, 512, 16384
ITERS, CG = 3, 10


def run_at(n_dev, prob, cam, reps=3):
    mesh = make_mesh(jax.devices()[:n_dev])
    res = sharded_ba_solve(prob, cam, mesh, iters=ITERS, cg_iters=CG)
    jax.block_until_ready(res.kf_pose)  # compile + settle
    t0 = time.perf_counter()
    for _ in range(reps):
        res = sharded_ba_solve(prob, cam, mesh, iters=ITERS, cg_iters=CG)
        jax.block_until_ready(res.kf_pose)
    dt = (time.perf_counter() - t0) / reps
    return dt, float(res.initial_cost), float(res.final_cost)


def main():
    prob, cam = make_ba_problem(K=K, N=N, P=P)
    print(f"problem: K={K} keyframes, {N} obs/KF ({K*N} total), P={P} points")
    print(f"collective volume per CG iteration: [P,3] psum = "
          f"{P*3*4/1024:.0f} KB + 2 scalar psums")
    results = {}
    base = None
    for n in (1, 2, 4, 8):
        if n > jax.device_count():
            break
        dt, c0, c1 = run_at(n, prob, cam)
        results[n] = dt
        if base is None:
            base = dt
        eff = base / (n * dt)
        print(f"devices={n}: {dt*1e3:8.1f} ms/solve  "
              f"speedup {base/dt:5.2f}x  efficiency {eff*100:5.1f}%  "
              f"(cost {c0:.1f} -> {c1:.1f}, obs/shard {K*N//n})")
    print("\nNOTE: virtual CPU mesh on a 2-core host — see module docstring "
          "for what these numbers do and do not predict for a TPU slice.")


if __name__ == "__main__":
    main()
