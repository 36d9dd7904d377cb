"""Memoized construction of heavy Catalyst Column trees.

The all-JVM hot path (operators/jvm_wkt.py, operators/jvm_clip.py)
re-expresses the WKT parse and the Sutherland–Hodgman clip as deeply
nested higher-order-function expressions. EXECUTING them is pure
task-thread JVM work — but BUILDING them from Python is thousands of
py4j round-trips, measured at ~2.5 s driver time for the clip tree
and ~1 s for the dim-stats tree per `build_dataset` call (round 5
profile). That construction cost is serial driver time: it depressed
the recorded headline (each bench run re-paid it) and feeds the
Amdahl floor of the N→4N scaling record (both legs pay the same
fixed seconds).

The built Column is an immutable, unresolved expression tree that is
valid for ANY DataFrame in the same JVM, so identical constructions
are pure waste. `cached_column(key, build)` returns the memoized
Column for `key`, rebuilding only when the active SparkContext has
changed (a stopped context invalidates the py4j objects inside the
Column). Callers key by constructor name + every input COLUMN NAME
and literal parameter, so a cache hit is by-construction the same
expression.
"""

from __future__ import annotations

from typing import Callable

from pyspark import SparkContext
from pyspark.sql import Column

_cache: dict[tuple, tuple[object, Column]] = {}


def cached_column(key: tuple, build: Callable[[], Column]) -> Column:
    """Return the memoized Column for `key`, building it on first use.

    The cache entry pins the SparkContext it was built under; a new
    context (tests that stop/start Spark) rebuilds instead of handing
    out stale py4j references. Thread safety: worst case two threads
    build the same expression once each — both results are equivalent
    and immutable, so last-write-wins is correct.
    """
    sc = SparkContext._active_spark_context
    hit = _cache.get(key)
    if hit is not None and hit[0] is sc:
        return hit[1]
    col = build()
    _cache[key] = (sc, col)
    return col
