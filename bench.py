"""Benchmark harness.

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: ``{"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {...}, "sf": ...}``.

Extra keys carry the north-rule evidence: ``blocks_per_sec`` for the tile
assignment stage and (with ``--scaling``) the two-parallelism-level
throughput + scaling efficiency that stands in for N vs 4N executors
(BASELINE.md), which is also written to ``BENCH/BASELINE.md``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_BENCH_IMAGES = int(os.environ.get("QBCS_BENCH_IMAGES", "192"))
SF = SF_DIR.rstrip("/").split("sf")[-1]

BENCH_QUERIES = [
    "q1_pricing_summary", "q3_revenue_by_order", "q5_local_supplier_volume",
    "q10_returned_revenue", "q18_large_orders",
    "q6_forecast_revenue", "topk_orders_per_customer",
    "events_tumbling", "events_sessionize", "events_json_stats", "events_rollup",
    "dedup_exact_docs", "fingerprint_docs", "token_counts", "text_quality",
    "lang_id", "ngram_jaccard", "minhash_signatures", "minhash_lsh_pairs",
    "simhash_docs", "simhash_pairs", "corpus_clean",
    "ann_topk", "ann_lsh_topk", "embedding_near_dup",
    "cell_assign", "spatial_join_rects", "spatial_join_salted_rects",
    "spatial_join_triangles", "knn_points", "video_frame_stats",
    "corpus_sample", "vocab_topk", "corpus_stats",
    "spatial_distance_join", "events_asof_join", "dedup_incremental",  # r4
    "corpus_weighted_sample", "events_funnel", "tile_pyramid_rollup",  # r4
    "corpus_clean_components", "ann_ivf_topk", "pii_redact", "decontaminate",  # r5
    "doc_repetition", "knn_corpus", "doc_chunks", "text_embed_hashed",  # r5
    "rasterize_rects", "zonal_stats_rects", "rect_overlap_join",  # r5 spatial
    "compact_cover_rects", "blocks_pip_join",  # r5 spatial
    "dedup_elect_quality", "image_dedup_clusters",  # r5 continuation
    "boilerplate_docs",  # r5: line-dedup identity pass over the real corpus
]


def _session(cores: int):
    from quadtree_block_compression_spark.session import build_session
    return build_session(f"qbcs-bench-{cores}", cores=cores,
                         shuffle_partitions=max(cores, 8),
                         extra={"spark.sql.session.timeZone": "UTC",
                                # image rows are ~50KB: small scan splits keep
                                # every core fed without a repartition shuffle
                                "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024)})


_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")


def _bench_images_path(spark, n: int) -> str:
    """Materialize the deterministic images table to parquet once (the
    production shape: tile assignment reads a table, it doesn't generate)."""
    from quadtree_block_compression_spark.fixtures.images import generate_images
    path = os.path.join(_CACHE_DIR, f"images_{n}.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        generate_images(spark, n, seed=42, partitions=128, max_side=256) \
            .write.mode("overwrite").parquet(path)
    return path


def tile_assign_run(spark, n_images: int, cores: int) -> tuple[float, int]:
    """Tile-assign n synthetic images from parquet; returns (seconds, blocks)."""
    from quadtree_block_compression_spark.operators.tiling import assign_tiles
    images = spark.read.parquet(_bench_images_path(spark, n_images))
    t0 = time.time()
    blocks = assign_tiles(images).count()
    return time.time() - t0, blocks


def tile_assign_output_hash(spark, n_images: int) -> int:
    """Order-insensitive hash of the full tile-assignment output — the
    identical-outputs-across-cluster-sizes evidence the north rule asks for."""
    from pyspark.sql import functions as F
    from quadtree_block_compression_spark.operators.tiling import assign_tiles
    images = spark.read.parquet(_bench_images_path(spark, n_images))
    out = assign_tiles(images)
    row = out.select(F.xxhash64("image_id", "tile_id", "level", "x0", "y0",
                                "x1", "y1", "is_leaf", "oob", "block_hash",
                                "morton").alias("h")) \
        .agg(F.expr("bit_xor(h)").alias("s"), F.count("*").alias("n")).collect()[0]
    return int(row.s) ^ int(row.n)


def spatial_pipeline_run(spark, n_images: int) -> tuple[float, int]:
    """The BASELINE metric's OTHER half ("tile-assign + spatial-join
    throughput"): the full raster→vector pipeline from the images scan —
    tile assignment → block centroids + cell keys → broadcast PIP join
    against 64 deterministic geometries — timed end to end. Returns
    (seconds, matched rows)."""
    from quadtree_block_compression_spark.fixtures.geometries import (
        generate_geometries)
    from quadtree_block_compression_spark.operators.spatial_join import (
        block_centroids, spatial_join_broadcast)
    from quadtree_block_compression_spark.operators.tiling import assign_tiles
    images = spark.read.parquet(_bench_images_path(spark, n_images))
    t0 = time.time()
    pts = block_centroids(assign_tiles(images), res=8)
    geoms = spark.createDataFrame(generate_geometries(n=64, seed=7))
    n = spatial_join_broadcast(pts, geoms).count()
    return time.time() - t0, n


def _scale_worker(cores: int, n_scale: int, reps: int = 3,
                  with_hash: bool = True, with_spatial: bool = True) -> None:
    """Subprocess body for one scaling measurement (run under taskset)."""
    s = _session(cores)
    tile_assign_run(s, 1024, cores)
    times = []
    for _ in range(reps):
        dt, nb = tile_assign_run(s, n_scale, cores)
        times.append(dt)
    dt = sorted(times)[len(times) // 2]  # median: the box shows VM jitter
    out_hash = tile_assign_output_hash(s, n_scale) if with_hash else None
    # spatial half of the metric at n/4 images (the join stage repeats the
    # tile assignment inside its plan, so the stage cost is ~2× a bare
    # assign — n/4 keeps the per-level cost bounded without changing what
    # scales: per-image Arrow work + a broadcast hash join). Warm the
    # join/broadcast codepaths first: a fresh pinned subprocess pays ~6-8s
    # of codegen + broadcast + shuffle init on the FIRST spatial plan,
    # which a single cold shot misattributes to whichever level runs it
    # (measured: cold 59.6s vs warm 52.7s at 4 cores, cold 23.0s vs warm
    # 15.4s at 16 — the cold ratio reads 0.65 where the warm truth is 0.86)
    out = {"seconds": round(dt, 3), "blocks": nb,
           "blocks_per_sec": round(nb / dt, 1), "output_hash": out_hash}
    if with_spatial:
        spatial_pipeline_run(s, 1024)
        sp_times = []
        for _ in range(max(reps, 1)):
            d, sp_n = spatial_pipeline_run(s, max(n_scale // 4, 1024))
            sp_times.append(d)
        sp_dt = sorted(sp_times)[len(sp_times) // 2]
        out.update({"spatial_seconds": round(sp_dt, 3),
                    "spatial_matches": sp_n,
                    "spatial_rows_per_sec": round(sp_n / sp_dt, 1)})
    s.stop()
    print("SCALE_RESULT " + json.dumps(out))


_CONTROL_LOOP = ("x=1.0\nfor i in range(20000000):\n    x = x * 1.0000001 + 0.1\n"
                 "print(x)")


def _run_control_level(cores: int) -> float:
    """Host-delivery control: aggregate throughput (loops/sec) of a pure
    CPU-bound, zero-memory-traffic python loop on ``cores`` pinned
    processes. On a dedicated box this scales linearly with cores by
    construction; any shortfall is host-side (steal / occupancy-dependent
    frequency), not engine behavior — reported alongside the engine's
    efficiency so the two can't be conflated."""
    import subprocess
    import shutil
    procs = []
    t0 = time.time()
    for i in range(cores):
        cmd = [sys.executable, "-c", _CONTROL_LOOP]
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", str(i % os.cpu_count())] + cmd
        procs.append(subprocess.Popen(cmd, stdout=subprocess.DEVNULL,
                                      stderr=subprocess.DEVNULL))
    for p in procs:
        p.wait()
    return cores / (time.time() - t0)


def _run_scale_level(cores: int, n_scale: int, reps: int = 3,
                     with_hash: bool = True, with_spatial: bool = True) -> dict:
    """Run one level in a CPU-pinned subprocess: local[N] must only see N
    CPUs (as an N-core executor would), else JVM/GC/python threads spill
    onto idle cores and inflate the small-N baseline."""
    import shutil
    import subprocess
    cmd = [sys.executable, os.path.abspath(__file__),
           "--scale-worker", str(cores), str(n_scale), str(reps),
           str(int(with_hash)), str(int(with_spatial))]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=1200)
    for line in res.stdout.splitlines():
        if line.startswith("SCALE_RESULT "):
            return json.loads(line[len("SCALE_RESULT "):])
    raise RuntimeError(f"scale worker failed: {res.stdout[-2000:]}\n{res.stderr[-2000:]}")


def main() -> None:
    import __spark_entry__ as entrymod

    if "--scale-worker" in sys.argv:
        i = sys.argv.index("--scale-worker")
        _scale_worker(int(sys.argv[i + 1]), int(sys.argv[i + 2]),
                      int(sys.argv[i + 3]), bool(int(sys.argv[i + 4])),
                      bool(int(sys.argv[i + 5])))
        return

    # scaling evidence is part of the default run (disable with --no-scaling
    # or QBCS_NO_SCALING=1 for quick iterations); --scaling-only skips the
    # query sweep for a standalone scaling sample (host windows swing the
    # efficiency, so a second sample in a different window is cheap signal)
    scaling_only = "--scaling-only" in sys.argv
    scaling = scaling_only or ("--no-scaling" not in sys.argv
                               and not os.environ.get("QBCS_NO_SCALING"))
    t_start = time.time()
    spark = _session(CPUS)
    qs = entrymod.queries()

    timings: dict[str, float] = {}

    # tile assignment throughput (the headline metric); warm up the python
    # workers first so the measurement is steady-state, not JVM/worker spawn
    tile_assign_run(spark, 16, CPUS)
    dt, n_blocks = tile_assign_run(spark, N_BENCH_IMAGES, CPUS)
    timings["quadtree_tile_assign"] = round(dt, 3)
    blocks_per_sec = round(n_blocks / dt, 1)

    from quadtree_block_compression_spark.functions.cache import release_caches
    for name in ([] if scaling_only else BENCH_QUERIES):
        t0 = time.time()
        qs[name](spark, SF_DIR).count()
        timings[name] = round(time.time() - t0, 3)
        # release tracked caches so one query's persisted intermediates
        # can't inflate (or starve) the next — each timing is standalone
        release_caches()

    total = round(sum(timings.values()), 3)

    result = {
        "metric": "headline query wall time (tile-assign + dedup + spatial + text + ANN)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF,
        "cpus": CPUS,
        "bench_images": N_BENCH_IMAGES,
        "tile_assign_blocks": n_blocks,
        "blocks_per_sec": blocks_per_sec,
    }

    # skip the scaling phase if the query sweep already ate the time budget
    # (protects the JSON line from an external timeout on slow machines)
    budget = float(os.environ.get("QBCS_BENCH_BUDGET_SEC", "400"))
    if scaling and (time.time() - t_start) > budget:
        result["scaling"] = {"skipped": f"query sweep exceeded {budget}s budget"}
        scaling = False
    if scaling:
        try:
            # pre-materialize the workload parquet before forking pinned workers
            _bench_images_path(spark, 1024)
            n_scale = int(os.environ.get("QBCS_SCALE_IMAGES", "36864"))
            _bench_images_path(spark, n_scale)
            _bench_images_path(spark, max(n_scale // 4, 1024))  # spatial stage
            spark.stop()
            # N→4N pair. Default 4→16: at full 32-core occupancy THIS HOST
            # slows every core ~1.4× (the pure-compute control below scales
            # at only ~0.72 eff 8→32 with zero memory traffic), an
            # occupancy-dependent-frequency/steal artifact a multi-machine
            # cluster doesn't have. ≤50% occupancy keeps per-core delivery
            # stable so the measurement isolates ENGINE scaling; the control
            # efficiency is reported so the artifact stays visible.
            lo, hi = (int(x) for x in
                      os.environ.get("QBCS_SCALE_LEVELS", "4,16").split(","))
            assert hi == 4 * lo, "scaling pair must be N,4N"
            # INTERLEAVED A-B pairs, median of per-pair ratios: host delivery
            # on this shared VM drifts on a minutes timescale, so measuring
            # all of level N and then all of level 4N lets a slow window hit
            # one side only and swing a single-shot ratio ±0.15. Temporally
            # adjacent pairs cancel the drift; the median of 3 pair ratios
            # drops any pair a window boundary still split.
            pairs = int(os.environ.get("QBCS_SCALE_PAIRS", "3"))
            # A degraded host window (absolute throughput collapses on one
            # level mid-run) can sink a 3-pair median even though the
            # engine's ratio is stable across good windows — observed median
            # 0.716 vs 0.896 for IDENTICAL code 20 min apart, with the
            # pure-compute control reading 0.845 (usually ~1.0). Decide the
            # pair budget from the CONTROL, measured BEFORE the engine pairs:
            # the trigger is exogenous to the statistic being estimated, so
            # there is no optional-stopping bias (extending only when the
            # engine median looks low would be one-sided and inflate the
            # reported efficiency).
            ctrl = {c: _run_control_level(c) for c in (lo, hi)}
            ctrl_eff = round((ctrl[hi] / ctrl[lo]) / 4.0, 3)
            max_pairs = int(os.environ.get("QBCS_SCALE_MAX_PAIRS",
                                           str(pairs + 2)))
            if ctrl_eff < 0.9:
                pairs = max_pairs
            # healthy-window local[hi] capability (BENCH/BASELINE.md: the
            # 16-core level delivers 141-148k blocks/s across healthy runs);
            # a first pair far below it flags external contention the pure-
            # compute control cannot see (it is bandwidth-blind). Both
            # triggers use LEVELS, never the ratio under estimation, and
            # fire before the 3-pair median exists — no optional stopping.
            ref_hi = float(os.environ.get("QBCS_HEALTHY_HI_BLOCKS_PER_SEC",
                                          "140000"))
            pair_effs = []
            spatial_pair_effs = []
            scale_report = {}
            i = 0
            while i < pairs:
                # ABBA ordering: odd pairs measure hi first, so a linear
                # host-delivery drift biases consecutive pair ratios in
                # OPPOSITE directions and the median cancels it
                # the spatial half rides the first 3 pairs only: budget-
                # extension pairs exist to re-sample the TILE statistic in a
                # degraded window, and each spatial stage adds ~1 min/pair
                w_sp = i < 3
                if i % 2 == 0:
                    rlo = _run_scale_level(lo, n_scale, reps=1,
                                           with_hash=(i == 0), with_spatial=w_sp)
                    rhi = _run_scale_level(hi, n_scale, reps=1,
                                           with_hash=(i == 0), with_spatial=w_sp)
                else:
                    rhi = _run_scale_level(hi, n_scale, reps=1,
                                           with_hash=False, with_spatial=w_sp)
                    rlo = _run_scale_level(lo, n_scale, reps=1,
                                           with_hash=False, with_spatial=w_sp)
                pair_effs.append(round(
                    (rhi["blocks_per_sec"] / rlo["blocks_per_sec"]) / 4.0, 3))
                if w_sp:
                    spatial_pair_effs.append(round(
                        (rhi["spatial_rows_per_sec"]
                         / rlo["spatial_rows_per_sec"]) / 4.0, 3))
                if i == 0:
                    scale_report = {lo: rlo, hi: rhi}
                    if rhi["blocks_per_sec"] < 0.8 * ref_hi:
                        pairs = max_pairs
                i += 1
            eff = sorted(pair_effs)[len(pair_effs) // 2]
            sp_eff = sorted(spatial_pair_effs)[len(spatial_pair_effs) // 2]
            result["scaling"] = {
                f"local{lo}": scale_report[lo], f"local{hi}": scale_report[hi],
                "n_cores": lo, "n4_cores": hi,
                "pair_efficiencies": pair_effs,
                "efficiency_n_to_4n": eff,
                # the metric's OTHER half: tile-assign + broadcast PIP join
                # end to end (spatial_pipeline_run), same pair protocol
                "spatial_pair_efficiencies": spatial_pair_effs,
                "spatial_efficiency_n_to_4n": sp_eff,
                "outputs_identical": scale_report[lo]["output_hash"]
                == scale_report[hi]["output_hash"],
                "spatial_matches_identical":
                    scale_report[lo]["spatial_matches"]
                    == scale_report[hi]["spatial_matches"],
                "host_compute_control_eff": ctrl_eff,
                "pairs_budget_extended": pairs > int(
                    os.environ.get("QBCS_SCALE_PAIRS", "3")),
            }
            # headline throughput at full machine occupancy (the capability
            # number, comparable across rounds) — measured separately from
            # the efficiency pair, which runs at ≤50% occupancy to dodge the
            # host's full-load downclock (see comment above)
            if CPUS > hi:
                # median-of-3 inside the pinned worker: the single-sample
                # figure swung 188k-267k between rounds (host window), which
                # reads as a trend when it isn't (VERDICT r2 #8)
                full = _run_scale_level(CPUS, n_scale, reps=3, with_hash=False,
                                        with_spatial=False)
                result["scaling"][f"local{CPUS}_full_occupancy"] = full
                result["blocks_per_sec_full_load"] = full["blocks_per_sec"]
            else:
                result["blocks_per_sec_full_load"] = scale_report[hi]["blocks_per_sec"]
        except Exception as e:  # never lose the JSON line to a scaling hiccup
            result["scaling"] = {"error": str(e)[:500]}

    print(json.dumps(result))


if __name__ == "__main__":
    main()
