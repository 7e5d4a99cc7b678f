"""Round-6 measurement harness (bench.py is FROZEN — this file carries the
optimization round's extra instrumentation; cite numbers in
OPTIMIZATION_r06.md).

Usage:
    python bench_extra.py [--sf DIR] [--queries a,b,c] [--plans OUTDIR]
                          [--noop] [--reps N]

* times each query exactly like bench.py (`.count()`, tracked-cache release
  between queries) unless --noop, which times a full-materialization noop
  sink instead (guide §1.4);
* --plans writes `.explain("formatted")` for each timed query to
  OUTDIR/<query>_<suffix>.txt (suffix via --suffix, default "before");
* prints one JSON line {"queries": {...}, "sf": ..., "total": ...}.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench as benchmod  # round-start bench: reuse its session + query list


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default=None,
                    help="comma list; default = bench.py's BENCH_QUERIES")
    ap.add_argument("--plans", default=None, help="dir for explain dumps")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--noop", action="store_true",
                    help="time a noop-sink write instead of count()")
    ap.add_argument("--reps", type=int, default=1)
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    spark = benchmod._session(benchmod.CPUS)
    qs = entrymod.queries()
    names = (args.queries.split(",") if args.queries
             else list(benchmod.BENCH_QUERIES))

    from quadtree_block_compression_spark.functions.cache import release_caches

    timings: dict[str, list[float]] = {}
    for name in names:
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            try:
                buf = io.StringIO()
                with redirect_stdout(buf):
                    qs[name](spark, args.sf).explain("formatted")
                with open(os.path.join(args.plans,
                                       f"{name}_{args.suffix}.txt"), "w") as f:
                    f.write(buf.getvalue())
            except Exception as e:  # plan capture must never sink the timing
                print(f"# explain({name}) failed: {e}", file=sys.stderr)
            release_caches()
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"r06-probe: {name}")
            t0 = time.time()
            df = qs[name](spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            timings.setdefault(name, []).append(round(time.time() - t0, 3))
            release_caches()
        spark.sparkContext.setJobDescription(None)

    best = {k: min(v) for k, v in timings.items()}
    print(json.dumps({"queries": best, "samples": timings,
                      "sf": args.sf, "noop": args.noop,
                      "total": round(sum(best.values()), 3)}))


if __name__ == "__main__":
    main()
