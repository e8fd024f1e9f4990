"""Lightweight per-stage tracing (the reference has none — SURVEY.md §5).

Usage:
    with stage_timer("tree_build", items=n_leaves) as t:
        ...
    report()  -> list of dicts with wall-clock + throughput

Set PMT_TRACE=1 to print stages as they complete; integrates with
jax.profiler for deep traces (trace_to(path) wraps jax.profiler.trace).
"""

import contextlib
import os
import time
from typing import List

_STAGES: List[dict] = []


@contextlib.contextmanager
def stage_timer(name: str, items: int = 0, unit: str = "items"):
    start = time.perf_counter()
    record = {"stage": name, "items": items, "unit": unit}
    try:
        yield record
    finally:
        elapsed = time.perf_counter() - start
        record["seconds"] = elapsed
        if items:
            record["throughput"] = items / elapsed
        _STAGES.append(record)
        if os.environ.get("PMT_TRACE"):
            rate = f" ({record.get('throughput', 0):,.0f} {unit}/s)" if items else ""
            print(f"[pmt] {name}: {elapsed:.3f}s{rate}")


def report() -> List[dict]:
    return list(_STAGES)


def reset() -> None:
    _STAGES.clear()


@contextlib.contextmanager
def trace_to(path: str):
    """jax.profiler trace wrapper (TensorBoard-compatible)."""
    import jax
    with jax.profiler.trace(path):
        yield
