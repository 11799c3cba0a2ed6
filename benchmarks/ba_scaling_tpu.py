"""TPU-measured per-shard BA compute for the 2-host scaling projection.

VERDICT r4 item #1: the CPU-measured `ba_scaling.py` numbers are
overhead-dominated (t_hi barely moves with shard size), so the printed
50.6-51.2 % 2-host efficiency says nothing about the TPU operating point.
This script runs the REAL per-shard program — `ba_solve` over K/n keyframes
— on the real TPU chip and records device-time per solve at every shard
size the ring model needs:

  t_hi(n) = t(K/n, P)   : point-space scatter targets stay full-P
  t_lo(n) = t(K/n, P/n) : as if scatter targets sharded too

Tunnel discipline (TODO.md "architecture notes"): one dispatch costs a
~25 ms round trip, so each timing issues `reps` ASYNC dispatches back to
back and blocks once — measured wall is reps * t_device + 1 RT; we report
(wall - RT_estimate) / reps with the RT measured from a null fetch.

Results land in BA_TPU_TIMES.json; `ba_scaling.py` picks that file up and
prints a TPU-measured efficiency table next to the CPU one.

Run (real chip): python benchmarks/ba_scaling_tpu.py         [small scale]
                 BA_KITTI=1 python benchmarks/ba_scaling_tpu.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import make_ba_problem  # noqa: E402
from orb_slam2_refactored_tpu.optim.ba import ba_solve  # noqa: E402

if os.environ.get("BA_KITTI"):
    SCALE, K, N, P = "kitti", 1408, 512, 65536
else:
    SCALE, K, N, P = "small", 256, 512, 16384
ITERS, CG = 3, 10
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "..", "BA_TPU_TIMES.json")


def measure_rt():
    """Tunnel round-trip: median of tiny fetches."""
    x = jnp.zeros(()) + 1.0
    jax.block_until_ready(x)
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        jax.block_until_ready(jnp.zeros(()) + 1.0)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def time_solve(Ks, Ps, reps=12):
    """Device time per ba_solve(K=Ks, P=Ps) via amortized async dispatch."""
    prob, cam = make_ba_problem(K=Ks, N=N, P=Ps)
    prob = jax.device_put(prob)
    fn = jax.jit(lambda pr: ba_solve(pr, cam, iters=ITERS, cg_iters=CG))
    t_c0 = time.perf_counter()
    res = fn(prob)
    jax.block_until_ready(res.kf_pose)
    compile_s = time.perf_counter() - t_c0
    best = None
    for _ in range(3):  # 3 trials, keep the best (tunnel weather)
        t0 = time.perf_counter()
        outs = [fn(prob) for _ in range(reps)]
        jax.block_until_ready(outs[-1].kf_pose)
        wall = time.perf_counter() - t0
        best = wall if best is None else min(best, wall)
    rt = measure_rt()
    t_dev = max((best - rt) / reps, 1e-6)
    return t_dev, compile_s, float(res.final_cost)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev} platform={dev.platform}")
    rt = measure_rt()
    print(f"tunnel RT ~{rt*1e3:.1f} ms; problem K={K} N={N} P={P} "
          f"(LM={ITERS}, CG={CG})")

    times = {}
    for n in (1, 2, 4, 8):
        t_hi, c_s, cost = time_solve(K // n, P)
        times[f"hi_{n}"] = t_hi
        print(f"n={n}: t_hi = t(K/{n}={K//n}, P={P})      = {t_hi*1e3:8.2f} ms"
              f"  (compile {c_s:.0f}s, cost {cost:.1f})")
        if n > 1:
            t_lo, c_s, cost = time_solve(K // n, P // n)
            times[f"lo_{n}"] = t_lo
            print(f"n={n}: t_lo = t(K/{n}={K//n}, P/{n}={P//n}) = "
                  f"{t_lo*1e3:8.2f} ms  (compile {c_s:.0f}s, cost {cost:.1f})")

    # ring model (identical to ba_scaling.py): volume from the psum sites
    per_lm_bytes = P * 12 * 4 + CG * (P * 3 * 4) + P * 3 * 4
    vol = ITERS * per_lm_bytes
    ncoll = ITERS * (1 + CG * 3 + 1 + 1) + 1
    t1 = times["hi_1"]
    print(f"\ncollective volume {vol/1e6:.2f} MB over {ncoll} psums/solve")
    print(f"{'hosts':>5} {'t_hi':>10} {'t_lo':>10} "
          f"{'eff (ICI 100GB/s)':>20} {'eff (DCN 10GB/s)':>20}")
    rows = {}
    for n in (2, 4, 8):
        t_hi, t_lo = times[f"hi_{n}"], times[f"lo_{n}"]
        ring = 2 * (n - 1) / n
        cols = []
        for bw, lat in ((100e9, 1e-6), (10e9, 25e-6)):
            t_comm = vol * ring / bw + ncoll * lat
            e_lo = t1 / (n * (t_hi + t_comm))
            e_hi = t1 / (n * (t_lo + t_comm))
            cols.append((e_lo, e_hi))
        rows[n] = cols
        print(f"{n:5d} {t_hi*1e3:8.2f}ms {t_lo*1e3:8.2f}ms "
              f"{cols[0][0]*100:6.1f}-{cols[0][1]*100:4.1f}% "
              f"{cols[1][0]*100:13.1f}-{cols[1][1]*100:4.1f}%")

    data = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            data = json.load(f)
    data[SCALE] = {
        "platform": dev.platform, "K": K, "N": N, "P": P,
        "iters": ITERS, "cg": CG, "tunnel_rt_s": rt,
        "times_s": times,
        "eff_2host_ici": [rows[2][0][0], rows[2][0][1]],
        "eff_2host_dcn": [rows[2][1][0], rows[2][1][1]],
    }
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1)
    print(f"\nwrote {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
