"""Per-stage wall-clock instrumentation (SURVEY.md §5 tracing gap).

The reference only times whole Track* calls in its drivers
(`/root/reference/Examples/Monocular/mono_tum.cc:81-115`); here every
pipeline stage can be timed and summarized. For device-level traces use
`jax.profiler.trace()` around the jitted programs.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict, List


class StageTimer:
    def __init__(self):
        self.samples: Dict[str, List[float]] = defaultdict(list)
        self.paused = False  # drop samples (e.g. warmup/re-warm segments)

    @contextmanager
    def time(self, stage: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if not self.paused:
                self.samples[stage].append(time.perf_counter() - t0)

    def report(self) -> str:
        lines = []
        for stage, xs in sorted(self.samples.items()):
            xs_sorted = sorted(xs)
            med = xs_sorted[len(xs_sorted) // 2]
            lines.append(
                f"{stage:24s} n={len(xs):4d} median={med*1000:8.2f}ms "
                f"mean={sum(xs)/len(xs)*1000:8.2f}ms total={sum(xs):7.2f}s"
            )
        return "\n".join(lines)

    def reset(self):
        self.samples.clear()
