"""Tracing and phase timing — first-class observability (SURVEY.md §5).

The reference's only instrumentation is coarse wall-clock prints
(utils/util.py:94-98). Here:
  - `trace(log_dir)`: JAX profiler traces (TensorBoard-viewable, includes
    XLA/TPU timelines) around any code block;
  - `PhaseTimer`: named phase accumulation with JSONL export, used by the
    drivers to attribute wall-clock to sample/compile/execute/host phases;
  - `annotate`: TraceAnnotation wrapper so host phases show up inside
    profiler timelines.
"""
import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a JAX profiler trace into log_dir."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named annotation appearing on profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """Accumulates wall-clock per named phase."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        start = time.perf_counter()
        try:
            with annotate(name):
                yield
        finally:
            elapsed = time.perf_counter() - start
            self.totals[name] += elapsed
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {name: {"total_s": self.totals[name],
                       "count": self.counts[name],
                       "mean_s": self.totals[name] / max(self.counts[name], 1)}
                for name in self.totals}

    def dump(self, path: Optional[str] = None, log_fn=print) -> None:
        payload = json.dumps(self.summary(), sort_keys=True)
        if path is not None:
            with open(path, "a") as f:
                f.write(payload + "\n")
        log_fn("phase timings: {}".format(payload))
