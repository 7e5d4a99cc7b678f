"""Cache lifecycle: every operator persist is tracked and releasable.

Round-2 finding: seven ``persist()`` sites with zero ``unpersist()`` leaked
cached plans into the block manager for the session lifetime. Every persist
now routes through ``functions.cache.persist_tracked``; the driver entry
releases at query boundaries. These tests prove the contract: after running
each persisting query and releasing, the SQL cache manager is empty.
"""

import os

import pytest

import __spark_entry__ as entrymod
from quadtree_block_compression_spark.functions.cache import (
    persist_tracked, release_caches, tracked_count)

SF_DIR = os.environ["SPARK_GRAFT_SF_DIR"]

# the complete set of graded queries whose operators persist intermediates
PERSISTING_QUERIES = [
    "ngram_jaccard", "minhash_lsh_pairs", "simhash_pairs", "corpus_clean",
    "ann_lsh_topk", "embedding_near_dup", "knn_points",
    "dedup_components", "tile_range_query",
]


def _sql_cache_size(spark) -> int:
    return spark._jsparkSession.sharedState().cacheManager().cachedData().size()


def test_persist_tracked_registers_and_releases(spark):
    df = spark.range(10)
    release_caches()  # clean slate
    base = _sql_cache_size(spark)  # session fixtures may hold their own caches
    persist_tracked(df)
    assert tracked_count() == 1
    assert df.count() == 10
    assert _sql_cache_size(spark) == base + 1
    assert release_caches() == 1
    assert tracked_count() == 0
    assert _sql_cache_size(spark) == base


@pytest.mark.parametrize("name", PERSISTING_QUERIES)
def test_no_orphaned_cache_after_release(spark, name):
    """Run each persisting graded query, release, assert nothing cached —
    the loop-all proof that a long-lived driver session cannot accumulate
    block-manager residue across queries."""
    qs = entrymod.queries()
    base = _sql_cache_size(spark)  # unrelated session fixtures may be cached
    assert qs[name](spark, SF_DIR).count() >= 0
    release_caches()
    # ≤, not ==: Spark's cache manager keys on CANONICALIZED plans, so if a
    # session fixture has .cache()d a plan identical to one the query
    # persist_tracked's (e.g. assign_tiles over the same 16-image fixture),
    # the release legitimately drops that shared entry too (correctness-safe
    # — blocks recompute from lineage). What the test pins is no RESIDUE.
    assert _sql_cache_size(spark) <= base, f"{name} left cached plans behind"


def test_query_boundary_releases_previous_caches(spark):
    """The queries() wrapper itself releases at the next query start, so
    even a driver that never calls release_caches() is bounded to one
    query's caches at a time."""
    qs = entrymod.queries()
    release_caches()
    base = _sql_cache_size(spark)
    qs["ngram_jaccard"](spark, SF_DIR).count()
    assert tracked_count() > 0  # ngram's shingle cache is registered
    # invoking ANY other query releases ngram's caches before building
    qs["dedup_exact_docs"](spark, SF_DIR).count()
    qs["fingerprint_docs"](spark, SF_DIR)  # build only — releases again
    assert tracked_count() == 0
    assert _sql_cache_size(spark) == base


def test_spread_parallelizes_tiny_scans(spark):
    """functions.parallelism.spread: a 1-partition frame is repartitioned to
    the session's parallelism with identical content; an already-spread
    frame passes through untouched (no gratuitous shuffle at real scale)."""
    from quadtree_block_compression_spark.functions.parallelism import spread
    one = spark.range(1000).coalesce(1)
    sp = spread(one)
    assert one.rdd.getNumPartitions() == 1
    assert sp.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert sorted(r.id for r in sp.collect()) == list(range(1000))
    wide = spark.range(1000).repartition(64)
    assert spread(wide) is wide


def test_release_is_scoped_to_the_calling_thread(spark):
    """ADVICE r3: a query boundary on one driver thread must not unpersist
    another thread's in-flight caches."""
    import threading

    release_caches()
    base = _sql_cache_size(spark)
    other_ready = threading.Event()
    main_released = threading.Event()
    results = {}

    def worker():
        df = spark.range(50)
        persist_tracked(df)
        df.count()
        other_ready.set()
        main_released.wait(timeout=30)
        # main thread's release must NOT have touched this thread's cache
        results["still_cached_after_main_release"] = \
            _sql_cache_size(spark) - base
        results["worker_released"] = release_caches()

    t = threading.Thread(target=worker)
    t.start()
    other_ready.wait(timeout=30)
    assert release_caches() == 0  # nothing registered by THIS thread
    main_released.set()
    t.join(timeout=60)
    assert results["still_cached_after_main_release"] == 1
    assert results["worker_released"] == 1
    assert _sql_cache_size(spark) == base
    assert tracked_count(all_threads=True) == 0


def test_dead_thread_caches_drain_at_next_boundary(spark):
    """A thread-per-query driver must not strand caches: frames registered
    by a thread that has EXITED are drained by the next release_caches()
    on any thread (a dead thread cannot be mid-query, so this is pure
    teardown, not a cross-thread kill)."""
    import threading

    release_caches()
    base = _sql_cache_size(spark)

    def worker():
        df = spark.range(64)
        persist_tracked(df)
        df.count()
        # exits WITHOUT releasing — the stranding case

    t = threading.Thread(target=worker)
    t.start()
    t.join(timeout=60)
    assert not t.is_alive()
    assert _sql_cache_size(spark) == base + 1  # stranded for now
    assert release_caches() == 1               # drained here, on main
    assert _sql_cache_size(spark) == base
    assert tracked_count(all_threads=True) == 0
