"""Profiling / observability utilities.

The reference has zero instrumentation (SURVEY §5).  Here: wall-clock phase
timers with throughput accounting, an optional ``jax.profiler`` trace
context, and a fetch-barrier helper for the remote-TPU quirk where
``block_until_ready`` returns at enqueue time.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax
import numpy as np


def fetch_barrier(tree) -> None:
    """True completion barrier: forces a tiny host fetch of every leaf's
    first element (block_until_ready is not sufficient on remote platforms)."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "addressable_shards") or hasattr(leaf, "device"):
            np.asarray(jax.device_get(leaf.ravel()[:1] if leaf.ndim else leaf))


class PhaseTimers:
    """Accumulating named wall-clock timers with item-rate reporting."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.items: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, items: int = 0, barrier=None):
        """``barrier`` may be a pytree of device arrays or a zero-arg callable
        returning one (for values produced inside the block)."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if barrier is not None:
                fetch_barrier(barrier() if callable(barrier) else barrier)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1
            self.items[name] += items

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals):
            total = self.totals[name]
            line = f"{name}: {total:.3f}s over {self.counts[name]} calls"
            if self.items[name]:
                line += f" ({self.items[name] / max(total, 1e-9):.1f} items/s)"
            lines.append(line)
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, float]:
        return dict(self.totals)


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """``jax.profiler`` trace context; no-op when ``log_dir`` is falsy or
    the platform doesn't support tracing."""
    if not log_dir:
        yield
        return
    try:
        with jax.profiler.trace(log_dir):
            yield
    except Exception:  # platform without profiler support
        yield
