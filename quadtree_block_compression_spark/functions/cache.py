"""Session-scoped cache registry: tracked ``persist()`` with release points.

Operators that cache an intermediate (the shingle table feeding three
consumers, the LSH bucket table feeding both self-join sides, the kNN big
side rescanned per ring) register the frame here instead of calling
``DataFrame.persist()`` directly. A long-lived driver session that runs many
queries then releases every tracked frame at the next query boundary —
without this, each invocation leaks its caches into the block manager for
the life of the session (the round-2 bench regression amplifier).

``unpersist()`` on a frame another in-flight plan still references is safe
in Spark: blocks are dropped and any later use recomputes from lineage —
correctness is never at stake, only (bounded) recomputation.

The registry is scoped PER DRIVER THREAD (ADVICE r3): a multi-threaded
driver that starts query B on one thread must not unpersist query A's
in-flight intermediates on another — releases only ever touch frames the
calling thread registered. A thread pool that retires a thread without a
final release can strand its entries; ``release_caches(all_threads=True)``
is the session-teardown escape hatch.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: dict[int, list[DataFrame]] = {}  # thread ident → tracked frames
_LOCK = threading.Lock()  # drivers may run queries from multiple threads


def persist_tracked(df: DataFrame,
                    level: StorageLevel = StorageLevel.MEMORY_AND_DISK) -> DataFrame:
    """Persist ``df`` and register it for the next ``release_caches()``
    issued by THIS thread."""
    df = df.persist(level)
    with _LOCK:
        _TRACKED.setdefault(threading.get_ident(), []).append(df)
    return df


def release_caches(all_threads: bool = False) -> int:
    """Unpersist the calling thread's tracked frames (non-blocking);
    returns how many. ``all_threads=True`` drains every thread's registry
    (session teardown only — mid-flight it reintroduces the cross-thread
    release the per-thread scoping exists to prevent)."""
    with _LOCK:
        if all_threads:
            batch = [df for lst in _TRACKED.values() for df in lst]
            _TRACKED.clear()
        else:
            batch = _TRACKED.pop(threading.get_ident(), [])
    released = 0
    for df in batch:
        try:
            df.unpersist()
            released += 1
        except Exception:
            # the owning session stopped between registration and release —
            # its executors (and any cached blocks) are gone with it, so
            # there is genuinely nothing left to free
            pass
    return released


def tracked_count(all_threads: bool = False) -> int:
    with _LOCK:
        if all_threads:
            return sum(len(v) for v in _TRACKED.values())
        return len(_TRACKED.get(threading.get_ident(), []))
