"""Metrics logging: JSONL scalars + optional TensorBoard writers.

The reference logs IoU and meta_step_size scalars to twin train/test
TensorBoard FileWriters (train.py:70-74,114-119) and prints everything else.
Here every scalar goes to an append-only JSONL stream (greppable, the
log-as-regression-harness pattern the reference relies on) and, when
tensorboardX is importable, to TB as well.
"""
import json
import os
import time
from typing import Optional

try:
    from tensorboardX import SummaryWriter
except ImportError:  # pragma: no cover
    SummaryWriter = None


class MetricsWriter:
    def __init__(self, log_dir: str, name: str):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, name + "_metrics.jsonl"), "a")
        self._tb = None
        if SummaryWriter is not None:
            self._tb = SummaryWriter(os.path.join(log_dir, name))

    def scalar(self, tag: str, value: float, step: int) -> None:
        record = {"tag": tag, "value": float(value), "step": int(step),
                  "time": time.time()}
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def log_estimated_time_remaining(start_time: float, cur_step: int,
                                 total_steps: int,
                                 unit_name: str = "meta-step",
                                 log_fn=print) -> float:
    elapsed = (time.time() - start_time) / 60.0
    log_fn("This {} took: {} minutes.".format(unit_name, elapsed))
    log_fn("Estimated training hours remaining:%.4f"
           % ((total_steps - cur_step) * elapsed / 60.0))
    return elapsed
