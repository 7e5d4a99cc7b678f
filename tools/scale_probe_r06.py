import json, os, sys, time, glob
sys.path.insert(0, "/root/repo")
from quadtree_block_compression_spark.session import build_session
from quadtree_block_compression_spark.functions.cache import release_caches

QUERIES = ["corpus_clean", "minhash_lsh_pairs", "blocks_pip_join",
           "knn_corpus", "simhash_pairs", "ngram_jaccard"]

def run(sf_dir, tag):
    spark = build_session(f"scale-probe-{tag}", cores=32, shuffle_partitions=32,
        extra={"spark.sql.session.timeZone": "UTC",
               "spark.sql.files.maxPartitionBytes": str(2*1024*1024),
               "spark.eventLog.enabled": "true",
               "spark.eventLog.dir": "/tmp/spark-events",
               "spark.eventLog.compress": "false"})
    import __spark_entry__ as entry
    qs = entry.queries()
    sc = spark.sparkContext
    app_id = sc.applicationId
    # warmup
    spark.range(100000).selectExpr("sum(id)").collect()
    results = {}
    for name in QUERIES:
        sc.setJobGroup(name, name)
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        dt = time.time() - t0
        results[name] = {"sec": round(dt, 2), "rows": n}
        release_caches()
    spark.stop()
    # parse event log: map job group -> stages -> shuffle bytes
    log = glob.glob(f"/tmp/spark-events/eventlog_v2_{app_id}/events_*")[0]
    stage_to_group = {}
    stage_shuffle = {}
    for line in open(log):
        try: ev = json.loads(line)
        except Exception: continue
        if ev.get("Event") == "SparkListenerJobStart":
            grp = ev.get("Properties", {}).get("spark.jobGroup.id")
            for sid in ev.get("Stage IDs", []):
                stage_to_group[sid] = grp
        elif ev.get("Event") == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            w = r = 0
            for acc in si.get("Accumulables", []):
                if acc.get("Name") == "internal.metrics.shuffle.write.bytesWritten":
                    w = int(acc.get("Value", 0))
                if acc.get("Name") == "internal.metrics.shuffle.read.remoteBytesRead":
                    r += int(acc.get("Value", 0))
                if acc.get("Name") == "internal.metrics.shuffle.read.localBytesRead":
                    r += int(acc.get("Value", 0))
            stage_shuffle[sid] = (w, r)
    agg = {}
    for sid, grp in stage_to_group.items():
        if grp in QUERIES and sid in stage_shuffle:
            w, r = stage_shuffle[sid]
            a = agg.setdefault(grp, [0, 0])
            a[0] += w; a[1] += r
    for name in QUERIES:
        if name in agg:
            results[name]["shuffle_write_mb"] = round(agg[name][0]/1e6, 1)
    print(tag, json.dumps(results))

run("/root/testdata/sf0.1", "sf0.1")
run("/root/testdata/sf1.0", "sf1.0")
