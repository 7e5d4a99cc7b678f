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
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []
_LOCK = threading.Lock()  # drivers may run queries from multiple threads


def persist_tracked(df: DataFrame,
                    level: StorageLevel = StorageLevel.MEMORY_AND_DISK) -> DataFrame:
    """Persist ``df`` and register it for the next ``release_caches()``."""
    df = df.persist(level)
    with _LOCK:
        _TRACKED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked frame (non-blocking); returns how many."""
    with _LOCK:
        batch, _TRACKED[:] = list(_TRACKED), []
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


def tracked_count() -> int:
    with _LOCK:
        return len(_TRACKED)
