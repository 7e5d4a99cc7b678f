"""Quick per-query timing at sf0.1 for iteration (not the graded bench)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    names = sys.argv[1:]
    import __spark_entry__ as entrymod
    from quadtree_block_compression_spark.session import build_session
    spark = build_session("qbcs-profile", cores=32, shuffle_partitions=32,
                          extra={"spark.sql.session.timeZone": "UTC"})
    qs = entrymod.queries()
    if not names:
        names = list(qs)
    out = {}
    for name in names:
        t0 = time.time()
        n = qs[name](spark, SF_DIR).count()
        out[name] = {"sec": round(time.time() - t0, 3), "rows": n}
        print(json.dumps({name: out[name]}), flush=True)
    print("TOTAL", round(sum(v["sec"] for v in out.values()), 3))


if __name__ == "__main__":
    main()
