"""Live viewer: a background render loop over the running tracker.

Runtime counterpart of the reference's Pangolin `Viewer` thread
(`/root/reference/src/Viewer.cc:62-179` — a loop that redraws the MapDrawer
+ FrameDrawer at a fixed rate while tracking runs). A TPU host has no GUI;
the loop renders the same content (map points, keyframes, covisibility,
trajectory + the latest frame overlay) to PNG files at a fixed rate, so an
operator tails the directory (or serves it) the way the reference user
watches the Pangolin window. Headless-friendly, zero effect on the tracker:
reads only host mirrors and snapshots of the functional map arrays.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Optional


class LiveViewer:
    """Background thread rendering `plot_map` snapshots of a live tracker.

    Usage (System::Viewer analog, `src/System.cc:99-107` wiring):
        viewer = LiveViewer(tracker, out_dir="viz_live", hz=1.0)
        viewer.start()
        ... track frames ...
        viewer.stop()

    Files: `out_dir/map_latest.png` (atomically replaced each tick — the
    "window") plus a bounded history `map_00000.png ...`.
    """

    def __init__(self, tracker, out_dir: str = "viz_live", hz: float = 1.0,
                 keep_history: int = 20):
        self.tracker = tracker
        self.out_dir = out_dir
        self.period = 1.0 / max(hz, 1e-3)
        self.keep_history = keep_history
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()
        self.frames_rendered = 0

    # -- lifecycle (Viewer::RequestFinish semantics) -----------------------

    def start(self):
        os.makedirs(self.out_dir, exist_ok=True)
        self._stop.clear()
        self._thread = threading.Thread(
            target=self._run, name="live-viewer", daemon=True
        )
        self._thread.start()
        return self

    def stop(self, final_render: bool = True):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=30.0)
            self._thread = None
        if final_render:
            self._render_once()

    # -- render loop -------------------------------------------------------

    def _run(self):
        failures = 0
        while not self._stop.wait(self.period):
            try:
                self._render_once()
                failures = 0
            except Exception as e:
                # a torn snapshot mid-keyframe must never kill the viewer
                # (the reference viewer holds mutexes instead; the
                # functional arrays make retries safe) — but a PERSISTENT
                # failure (e.g. matplotlib missing) must be diagnosable,
                # not a silent forever-loop (ADVICE r3)
                failures += 1
                if failures in (1, 10):
                    import sys
                    import traceback

                    print(f"[live-viewer] render failed "
                          f"({failures} consecutive): {e!r}",
                          file=sys.stderr)
                    if failures == 10:
                        traceback.print_exc()
                continue

    def _render_once(self):
        from .plot import plot_map

        t = self.tracker
        if t.state != 1 or len(t.graph.alive_kfs()) == 0:
            return
        idx = self.frames_rendered
        tmp = os.path.join(self.out_dir, ".map_tmp.png")
        plot_map(t, tmp, title=f"tpu-slam live (frame {t.frame_id})")
        latest = os.path.join(self.out_dir, "map_latest.png")
        os.replace(tmp, latest)  # atomic "window" update
        if self.keep_history > 0:
            hist = os.path.join(self.out_dir, f"map_{idx:05d}.png")
            import shutil

            shutil.copyfile(latest, hist)
            old = idx - self.keep_history
            if old >= 0:
                stale = os.path.join(self.out_dir, f"map_{old:05d}.png")
                if os.path.exists(stale):
                    os.remove(stale)
        self.frames_rendered += 1
