"""Sustained frame-cycle probe: what does each part of the per-frame cycle
cost in STEADY STATE (not one-shot)?

Mimics the bench loop: per frame -> upload payload, dispatch a sequential
device step (frame i+1 depends on i), request a tiny async readback,
finalize the readback D frames later. Sweeps payload size, pipeline depth,
and batched-vs-separate uploads, reporting sustained fps for each variant.
This isolates the marginal cost of (a) upload bytes, (b) per-frame RPCs,
(c) readback latency, in the regime the scored bench runs in.

ONE compiled step program for all variants (payload rides as an
independent upload; the step's compute chain runs via fori_loop), so the
probe itself is cheap to (re)run on a cold cache.

HISTORICAL NOTE: this mock suggested batched uploads always win; the REAL
tracker showed the answer is link-regime-dependent (per-frame wins in
bandwidth-bound phases, 8-frame batches win under congestion's fixed
per-RPC service cost) — see Tracker.upload_rgbd_batch and bench.py's
probe_batch, which measure the live link instead of assuming either
regime. Kept as the template for sustained-cycle experiments.
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

STEP_MS = float(os.environ.get("PROBE_STEP_MS", "6.0"))
N = int(os.environ.get("PROBE_FRAMES", "120"))
ITERS = max(int(STEP_MS / 0.045), 1)  # ~0.045ms per 1024^3 bf16 matmul


@jax.jit
def step(state):
    def body(_, x):
        return x @ x * 0.5 + 1e-6

    x = jax.lax.fori_loop(0, ITERS, body, state)
    return x, x.reshape(-1)[:32].astype(jnp.float32)


def run_variant(payload_bytes: int, depth: int, batch: int):
    state = jnp.eye(1024, dtype=jnp.bfloat16) * 0.9
    rng = np.random.default_rng(0)
    buf = rng.integers(0, 255, max(payload_bytes, 64), np.uint8)

    for _ in range(3):
        state, pack = step(state)
    np.asarray(pack)

    q = []
    live = []  # hold payload refs a few frames (like real frame arrays)
    t0 = time.perf_counter()
    i = 0
    while i < N:
        k = min(batch, N - i)
        if payload_bytes:
            if batch > 1:
                big = np.broadcast_to(buf, (k, buf.size))
                live.append(jnp.asarray(np.ascontiguousarray(big)))
            else:
                for _ in range(k):
                    live.append(jnp.asarray(buf))
        for _ in range(k):
            state, pack = step(state)
            pack.copy_to_host_async()
            q.append(pack)
            while len(q) > depth:
                np.asarray(q.pop(0))
        del live[:-3]
        i += k
    while q:
        np.asarray(q.pop(0))
    dt = time.perf_counter() - t0
    return N / dt


def main():
    print(f"[pprobe] devices: {jax.devices()}", file=sys.stderr)
    KB = 1024
    variants = [
        ("no-payload       d6 ", 0, 6, 1),
        ("96KB             d6 ", 96 * KB, 6, 1),
        ("384KB            d6 ", 384 * KB, 6, 1),
        ("384KB            d2 ", 384 * KB, 2, 1),
        ("384KB            d10", 384 * KB, 10, 1),
        ("768KB            d6 ", 768 * KB, 6, 1),
        ("384KB batch4     d6 ", 384 * KB, 6, 4),
        ("384KB batch8     d6 ", 384 * KB, 6, 8),
        ("384KB batch16    d6 ", 384 * KB, 6, 16),
        ("no-payload       d6b", 0, 6, 1),  # repeat: drift check
    ]
    for name, pb, d, b in variants:
        fps = run_variant(pb, d, b)
        print(f"[pprobe] {name}: {fps:7.1f} fps  ({1e3/fps:6.2f} ms/frame)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
