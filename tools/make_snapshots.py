"""Freeze deterministic pixel-path query outputs as oracle snapshots.

The queries below are pure functions of the committed seed-42 fixture
images (no scale-factor dependence) but their verify steps need pixel
kernels, so no SQL engine can recompute them from first principles. Their
outputs ARE deterministic tables, so they are frozen once as committed
parquet (exactly like ``tests/golden/blocks_golden.parquet``) and the
driver's DuckDB oracle replays ``SELECT * FROM read_parquet(...)`` — any
kernel drift becomes a driver-visible hash failure instead of a silent
rows-only pass.

Regenerate ONLY alongside an intentional kernel-semantics change, in the
same commit (CLAUDE.md invariant).

Usage: python tools/make_snapshots.py [query ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SNAP_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tests", "golden", "snapshots")

SNAPSHOT_QUERIES = [
    "quadtree_roundtrip",
    "block_near_dedup",
    "image_features",
    "interpolator_matrix",
    "image_near_dup_phash",
    # WAV decode is pure-function-of-nation-keys, and the TPC-H nation table
    # is constant across scale factors — snapshot-safe
    "audio_features",
    # MJPEG/AVI demux + JFIF frame decode, same nation-key determinism
    "video_frame_stats",
]


def main(names: list[str]) -> None:
    import __spark_entry__ as entrymod
    from quadtree_block_compression_spark.session import build_session

    spark = build_session("make-snapshots", cores=8, shuffle_partitions=8)
    qs = entrymod.queries()
    os.makedirs(SNAP_DIR, exist_ok=True)
    for name in (names or SNAPSHOT_QUERIES):
        out = os.path.join(SNAP_DIR, f"{name}.parquet")
        df = qs[name](spark, "/root/testdata/sf0.01")
        df.coalesce(1).write.mode("overwrite").parquet(out)
        print(f"{df.count()} rows -> {out}")


if __name__ == "__main__":
    main(sys.argv[1:])
