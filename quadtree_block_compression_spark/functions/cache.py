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
calling thread registered, PLUS frames whose registering thread has since
died (a dead thread cannot be mid-query, so draining its entries at the
next boundary is pure teardown — this keeps a thread-per-query driver
bounded instead of stranding every query's caches for the session
lifetime). Keys are the ``threading.Thread`` OBJECTS, not idents: the OS
recycles idents after a thread exits, and an ident-keyed map would let a
new thread inherit — and prematurely release — a dead thread's list.
``release_caches(all_threads=True)`` drains everything at session
teardown.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

# registering Thread object (identity-keyed, never recycled) → its frames
_TRACKED: dict[threading.Thread, list[DataFrame]] = {}
_LOCK = threading.Lock()  # drivers may run queries from multiple threads


def persist_tracked(df: DataFrame,
                    level: StorageLevel = StorageLevel.MEMORY_AND_DISK) -> DataFrame:
    """Persist ``df`` and register it for the next ``release_caches()``
    issued by this thread (or by any thread once this one exits)."""
    df = df.persist(level)
    with _LOCK:
        _TRACKED.setdefault(threading.current_thread(), []).append(df)
    return df


def release_caches(all_threads: bool = False) -> int:
    """Unpersist the calling thread's tracked frames plus any DEAD
    thread's leftovers (non-blocking); returns how many.
    ``all_threads=True`` additionally drains live threads' registries
    (session teardown only — mid-flight it reintroduces the cross-thread
    release the per-thread scoping exists to prevent)."""
    me = threading.current_thread()
    with _LOCK:
        batch = _TRACKED.pop(me, [])
        for th in list(_TRACKED):
            if all_threads or not th.is_alive():
                batch.extend(_TRACKED.pop(th))
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
        return len(_TRACKED.get(threading.current_thread(), []))
