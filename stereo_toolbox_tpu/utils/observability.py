"""Structured per-step scalar logging + on-demand profiler traces.

The reference only has tqdm text bars and an unused tensorboard import
(reference trainer/trainer_torchrun.py:230-247, tests/train_accelerate.py:20).
This module is the real thing, TPU-flavored:

  * `ScalarWriter` — TensorBoard event files via flax's SummaryWriter
    (process-0 only, no-op elsewhere and when tensorboard is unavailable),
    plus an always-on JSONL mirror (`scalars.jsonl`) so metrics remain
    machine-readable without TensorBoard.
  * `profile_trace` — context manager around `jax.profiler.trace`; wraps the
    steps it encloses in an XLA/TPU trace viewable in TensorBoard or Perfetto
    (the jax-native analogue of the reference's torch.cuda.Event timing,
    evaluation/speed_and_memory_test.py:58-68).
"""

from __future__ import annotations

import contextlib
import json
import os
import time

import jax


class ScalarWriter:
    """Per-step scalar sink: TensorBoard events + JSONL mirror.

    Only process 0 writes (multi-host safe). Pass ``log_dir=None`` for a
    pure no-op writer.
    """

    def __init__(self, log_dir: str | None):
        self._tb = None
        self._jsonl = None
        self.log_dir = log_dir
        if log_dir is None or jax.process_index() != 0:
            return
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a",
                           buffering=1)
        try:
            from flax.metrics.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir)
        except Exception:  # tensorboard optional — JSONL still works
            self._tb = None

    def scalars(self, step: int, **values: float) -> None:
        if self._jsonl is None:
            return
        rec = {"step": int(step), "time": time.time()}
        for key, val in values.items():
            val = float(val)
            rec[key] = val
            if self._tb is not None:
                self._tb.scalar(key, val, step=int(step))
        self._jsonl.write(json.dumps(rec) + "\n")

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
            self._tb = None
        if self._jsonl is not None:
            self._jsonl.close()
            self._jsonl = None


@contextlib.contextmanager
def profile_trace(log_dir: str | None, enabled: bool = True):
    """Capture a `jax.profiler` trace of the enclosed block into
    ``<log_dir>/plugins/profile/...`` (TensorBoard's profile plugin layout).

    Make sure the block ends with `jax.block_until_ready` on its outputs —
    dispatch returns before the TPU finishes, and an early stop truncates
    the device timeline.
    """
    if not enabled or log_dir is None or jax.process_index() != 0:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
