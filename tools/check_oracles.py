"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares
row-count, column names, and an order-insensitive value hash against the
matching ``oracle_sql()`` run in DuckDB. Floats are rounded inside the
queries themselves (both sides), so the hash compares canonical strings.

Usage: python tools/check_oracles.py [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def canon(rows, cols):
    """Order-insensitive canonical hash of a result set."""
    cols = sorted(cols)
    lines = []
    for row in rows:
        d = row.asDict() if hasattr(row, "asDict") else dict(row)
        parts = []
        for c in cols:
            v = d[c]
            if isinstance(v, float):
                v = f"{v:.6f}"
                if v == "-0.000000":
                    v = "0.000000"
            parts.append(f"{c}={v}")
        lines.append("|".join(parts))
    lines.sort()
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main(selected: list[str]) -> int:
    import __spark_entry__ as entrymod
    from quadtree_block_compression_spark.session import build_session

    # mirror the DRIVER's session exactly (CORRECTNESS_r01 showed failures
    # the old replica couldn't reproduce): ANSI on, NTZ timestamps, Etc/UTC
    spark = build_session("oracle-check", cores=8, shuffle_partitions=8,
                          extra={"spark.sql.session.timeZone": "Etc/UTC",
                                 "spark.sql.ansi.enabled": "true",
                                 "spark.sql.timestampType": "TIMESTAMP_NTZ"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = selected or list(qs)
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, SF_DIR)
            rows = df.collect()
            cols = df.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok*   {name}: rows={len(rows)} (rows-only, no oracle) [{dt:.1f}s]")
            if len(rows) == 0:
                print(f"WARN  {name}: empty result")
            continue
        try:
            # fetch through pandas, as the driver does: DuckDB HUGEINT (e.g.
            # sum(INT), window sums) surfaces as float64 here, while
            # fetchall() would hide it behind Python ints — the round-1
            # events_json_stats driver failure was exactly this
            odf = con.execute(oracles[name]).fetchdf()
            orows = odf.to_dict("records")
            ocols = list(odf.columns)
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            failures += 1
            continue
        ok_cols = sorted(cols) == sorted(ocols)
        ok_count = len(rows) == len(orows)
        sh = canon(rows, cols)
        oh = canon(orows, ocols)
        ok_hash = sh == oh
        status = "ok" if (ok_cols and ok_count and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{status:5} {name}: rows={len(rows)}/{len(orows)} cols={'=' if ok_cols else f'{sorted(cols)} vs {sorted(ocols)}'} hash={'=' if ok_hash else 'MISMATCH'} [{dt:.1f}s]")
        if not ok_hash and ok_cols and ok_count and len(rows) < 10000:
            # show first few differing lines
            sset = {}
            for row in rows:
                d = row.asDict()
                key = canon([row], cols)
                sset[key] = d
            oset = {canon([d], ocols): d for d in orows}
            only_s = [v for k, v in sset.items() if k not in oset][:3]
            only_o = [v for k, v in oset.items() if k not in sset][:3]
            print(f"      spark-only: {only_s}")
            print(f"      duck-only:  {only_o}")
    print(f"\n{failures} failures / {len(names)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
