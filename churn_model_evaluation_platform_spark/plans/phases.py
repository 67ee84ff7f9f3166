"""Per-query PHASE TIMING hooks (round 10, VERDICT r9 next #7): the
txnlog/ANN-store registry queries build multi-commit fixture tables
INSIDE their timed body (they must — the driver runs each query
standalone), which dilutes the measured feed/scan time with fixture
construction. Rather than change query semantics, the fixture builders
record their build seconds here and bench.py drains the registry after
each timed run — BENCH_DETAIL then shows a build/query split per
query, so a feed-computation regression is visible instead of hiding
inside fixture noise."""

from __future__ import annotations

import time
from contextlib import contextmanager

_PHASES: dict[str, float] = {}
_DEPTH = 0


@contextmanager
def timed_phase(name: str):
    """Accumulate the wrapped block's wall seconds under ``name``.

    NESTING-SAFE: only the OUTERMOST block records — a builder that
    times itself, wrapped again by its caller, must not count the same
    seconds twice (bench.py subtracts the phase sum from wall time; a
    double count once produced a negative query time for
    txnlog_stream_sink)."""
    global _DEPTH
    _DEPTH += 1
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _DEPTH -= 1
        if _DEPTH == 0:
            _PHASES[name] = _PHASES.get(name, 0.0) + (
                time.perf_counter() - t0
            )


def drain() -> dict[str, float]:
    """Return and reset the accumulated phase times (bench.py calls
    this after each timed query run)."""
    out = {k: round(v, 4) for k, v in _PHASES.items()}
    _PHASES.clear()
    return out


__all__ = ["timed_phase", "drain"]
