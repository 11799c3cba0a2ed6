"""Measure the host->TPU link: fixed per-transfer overhead, bandwidth,
async-overlap behavior, and batching gain.

The scored bench is link-bound (device compute ~4.8 ms/frame vs ~10-16 ms
observed per frame), so ingest design decisions must come from measured
link characteristics, not guesses. Prints a small table + a JSON summary.

HISTORICAL NOTE: one-shot timings here undersell the real link — the axon
client buffers, so `block_until_ready` can return before bytes move (a
30-matmul burn "finished" in 0.1 ms below). Only SUSTAINED pipelines
(pipeline_probe.py) or the real tracker reveal the regime behavior;
bench.py's probe_batch measures the live link with forced dependent
fetches instead.
"""

import json
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


def sync():
    jnp.zeros((1,)).block_until_ready()


def upload_time(nbytes: int, reps: int = 8) -> float:
    """Median wall time of one synchronous host->device upload."""
    buf = np.random.default_rng(0).integers(0, 255, nbytes, np.uint8)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jnp.asarray(buf).block_until_ready()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def upload_async_return(nbytes: int, reps: int = 8):
    """Time until jnp.asarray RETURNS (is the transfer async?) vs total."""
    buf = np.random.default_rng(0).integers(0, 255, nbytes, np.uint8)
    rets, tots = [], []
    for _ in range(reps):
        sync()
        t0 = time.perf_counter()
        a = jnp.asarray(buf)
        rets.append(time.perf_counter() - t0)
        a.block_until_ready()
        tots.append(time.perf_counter() - t0)
    return float(np.median(rets)), float(np.median(tots))


def overlap_with_compute(nbytes: int, reps: int = 6):
    """Upload while a chunky device matmul chain runs: does the transfer
    overlap compute dispatches, or serialize behind them?"""
    m = jnp.ones((2048, 2048), jnp.bfloat16)

    @jax.jit
    def burn(x):
        for _ in range(30):
            x = x @ x * 0.5
        return x

    burn(m).block_until_ready()
    t0 = time.perf_counter()
    burn(m).block_until_ready()
    t_burn = time.perf_counter() - t0

    buf = np.random.default_rng(0).integers(0, 255, nbytes, np.uint8)
    t_up = upload_time(nbytes)
    ts = []
    for _ in range(reps):
        sync()
        t0 = time.perf_counter()
        out = burn(m)
        a = jnp.asarray(buf)
        a.block_until_ready()
        out.block_until_ready()
        ts.append(time.perf_counter() - t0)
    both = float(np.median(ts))
    return t_burn, t_up, both


def main():
    print(f"[probe] devices: {jax.devices()}", file=sys.stderr)
    sync()

    # 1) size sweep -> fixed overhead + marginal bandwidth
    sizes = [1 << 10, 16 << 10, 64 << 10, 256 << 10, 384 << 10,
             1 << 20, 3 << 20, 8 << 20]
    rows = []
    for s in sizes:
        t = upload_time(s)
        rows.append((s, t))
        print(f"[probe] upload {s/1024:9.0f} KB  {t*1e3:8.2f} ms  "
              f"{s/t/1e6:8.1f} MB/s", file=sys.stderr)
    # fit t = a + s/B on the two largest
    (s1, t1), (s2, t2) = rows[-2], rows[-1]
    bw = (s2 - s1) / (t2 - t1)
    overhead = t1 - s1 / bw
    print(f"[probe] fit: overhead {overhead*1e3:.2f} ms, "
          f"marginal bw {bw/1e6:.1f} MB/s", file=sys.stderr)

    # 2) is jnp.asarray async?
    ret, tot = upload_async_return(3 << 20)
    print(f"[probe] 3MB upload: asarray returns in {ret*1e3:.2f} ms, "
          f"ready in {tot*1e3:.2f} ms -> "
          f"{'ASYNC' if ret < 0.3 * tot else 'BLOCKING'}", file=sys.stderr)

    # 3) transfer/compute overlap
    t_burn, t_up, both = overlap_with_compute(3 << 20)
    ov = (t_burn + t_up - both) / min(t_burn, t_up)
    print(f"[probe] burn {t_burn*1e3:.1f} ms, upload {t_up*1e3:.1f} ms, "
          f"together {both*1e3:.1f} ms -> overlap {ov*100:.0f}%",
          file=sys.stderr)

    # 4) batching: k separate 384KB uploads vs one k*384KB upload
    fsz = 384 << 10
    for k in (1, 4, 8, 16):
        sep = upload_time(fsz) * k
        one = upload_time(fsz * k)
        print(f"[probe] k={k:2d}: separate {sep*1e3:7.1f} ms, "
              f"batched {one*1e3:7.1f} ms  "
              f"({sep/one:4.2f}x)", file=sys.stderr)

    print(json.dumps({
        "overhead_ms": round(overhead * 1e3, 2),
        "bandwidth_MBps": round(bw / 1e6, 1),
        "asarray_async": bool(ret < 0.3 * tot),
        "overlap_frac": round(ov, 2),
    }))


if __name__ == "__main__":
    main()
