"""Profiling & timing utilities (SURVEY.md §5: the reference has no
tracing/profiling at all — print statements only, reference:
evaluation.py:880-884).

- ``trace(...)``: context manager around jax.profiler for device traces
  viewable in TensorBoard/Perfetto.
- ``sync(tree)``: robust device synchronization. On platforms whose
  remote-execution relay makes ``block_until_ready`` unreliable (see
  bench.py), fetching a scalar checksum is the only trustworthy sync.
- ``benchmark(fn, *args)``: compile-once, best-of-N wall timing.
- ``StageTimer``: named-stage accumulator for loop instrumentation.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Device trace context: ``with trace('/tmp/trace'): step(...)``."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree: Any) -> float:
    """Force completion of all computations producing ``tree``.

    Returns a checksum (sum of all leaves' sums) whose host transfer
    guarantees execution finished even through async dispatch relays.
    """
    leaves = [x for x in jax.tree_util.tree_leaves(tree) if hasattr(x, "dtype")]
    if not leaves:
        return 0.0
    total = 0.0
    for leaf in leaves:
        if jnp.issubdtype(leaf.dtype, jnp.floating) or jnp.issubdtype(
            leaf.dtype, jnp.integer
        ):
            total += float(jnp.sum(leaf.astype(jnp.float32)))
    return total


def benchmark(
    fn: Callable,
    *args,
    reps: int = 5,
    warmup: int = 1,
    **kwargs,
) -> Dict[str, float]:
    """Time ``fn(*args)`` with full synchronization.

    Returns {'best_s', 'mean_s', 'reps'}; fn is called ``warmup`` times
    first (compilation + caches).
    """
    for _ in range(warmup):
        sync(fn(*args, **kwargs))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    return {
        "best_s": min(times),
        "mean_s": sum(times) / len(times),
        "reps": reps,
    }


class StageTimer:
    """Accumulate wall time per named stage.

    with timer.stage("solve"): ...
    timer.summary() -> {stage: {'total_s', 'count', 'mean_s'}}
    """

    def __init__(self):
        self._totals: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, tree: Optional[Any] = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if tree is not None:
                sync(tree)
            self._totals[name] += time.perf_counter() - t0
            self._counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": total,
                "count": self._counts[name],
                "mean_s": total / max(self._counts[name], 1),
            }
            for name, total in self._totals.items()
        }

    def report(self) -> str:
        lines = [f"{'stage':<24}{'count':>8}{'total_s':>12}{'mean_ms':>12}"]
        for name, s in sorted(self.summary().items()):
            lines.append(
                f"{name:<24}{s['count']:>8}{s['total_s']:>12.3f}"
                f"{s['mean_s'] * 1e3:>12.2f}"
            )
        return "\n".join(lines)
