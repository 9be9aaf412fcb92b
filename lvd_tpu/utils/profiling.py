"""Tracing and phase timing.

The reference has no profiling story (SURVEY.md §5: tqdm bars only). Here:
* ``phase_timer`` — host-side wall-clock phase accounting with a structured
  summary (enabled by default in the pipeline; printed when LVD_TIMINGS=1).
* ``maybe_trace`` — wraps a block in ``jax.profiler.trace`` when
  ``LVD_PROFILE=<dir>`` is set, producing TensorBoard-loadable traces.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict


class PhaseTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            if os.environ.get("LVD_TIMINGS") == "1":
                print(f"[lvd_tpu timing] {name}: {dt:.3f}s")

    def summary(self) -> Dict[str, float]:
        return dict(self.totals)


@contextlib.contextmanager
def maybe_trace(label: str = "lvd"):
    trace_dir = os.environ.get("LVD_PROFILE")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(trace_dir, label)):
        yield
