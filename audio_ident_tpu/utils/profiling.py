"""Tracing / profiling hooks.

The reference's only tracing is perf_counter spans surfaced as
``query_duration_ms`` (reference: app/search/orchestrator.py:88,124-132);
SURVEY.md §5 calls for adding jax.profiler hooks on top.  Two layers:

- ``span(name)``: lightweight perf_counter spans collected into a
  process-local ring buffer, readable via ``recent_spans()`` (surfaced by
  the service's debug endpoint);
- ``device_trace()``: when AUDIO_IDENT_TRACE_DIR is set, wraps work in a
  ``jax.profiler.trace`` so device timelines land in TensorBoard format.
"""

from __future__ import annotations

import collections
import contextlib
import os
import threading
import time

_SPANS: collections.deque = collections.deque(maxlen=256)
_LOCK = threading.Lock()


@contextlib.contextmanager
def span(name: str):
    """Record a wall-clock span into the ring buffer."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        ms = (time.perf_counter() - t0) * 1000
        with _LOCK:
            _SPANS.append({"name": name, "ms": round(ms, 2), "at": time.time()})


def recent_spans(limit: int = 64) -> list[dict]:
    with _LOCK:
        return list(_SPANS)[-limit:]


@contextlib.contextmanager
def device_trace():
    """jax.profiler trace when AUDIO_IDENT_TRACE_DIR is configured."""
    trace_dir = os.environ.get("AUDIO_IDENT_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
