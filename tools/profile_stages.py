"""Per-stage profile of selected bench queries from Spark event logs.

Runs each named query once (bench methodology: .count(), tracked-cache
release), then reports per job-group the completed stages sorted by task
wall (executor run time), with shuffle bytes and row counts — the guide
§1.1 empirical loop without a live UI.

Usage: python tools/profile_stages.py <sf_dir> <query> [query...]
"""
import glob
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from quadtree_block_compression_spark.session import build_session
from quadtree_block_compression_spark.functions.cache import release_caches


def main(sf_dir, queries):
    os.makedirs("/tmp/spark-events", exist_ok=True)
    spark = build_session("profile-stages", cores=32, shuffle_partitions=32,
        extra={"spark.sql.session.timeZone": "UTC",
               "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
               "spark.eventLog.enabled": "true",
               "spark.eventLog.dir": "/tmp/spark-events",
               "spark.eventLog.compress": "false"})
    import __spark_entry__ as entry
    qs = entry.queries()
    sc = spark.sparkContext
    app_id = sc.applicationId
    spark.range(100000).selectExpr("sum(id)").collect()  # warmup
    walls = {}
    for name in queries:
        sc.setJobGroup(name, name)
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        walls[name] = (round(time.time() - t0, 2), n)
        release_caches()
    spark.stop()
    log = glob.glob(f"/tmp/spark-events/eventlog_v2_{app_id}/events_*")[0]
    stage_group, stages, jobs = {}, {}, {}
    for line in open(log):
        try:
            ev = json.loads(line)
        except Exception:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            grp = ev.get("Properties", {}).get("spark.jobGroup.id")
            jobs.setdefault(ev["Job ID"], {})["grp"] = grp
            jobs[ev["Job ID"]]["t0"] = ev.get("Submission Time", 0)
            jobs[ev["Job ID"]]["stages"] = ev.get("Stage IDs", [])
            for sid in ev.get("Stage IDs", []):
                stage_group[sid] = grp
        elif e == "SparkListenerJobEnd":
            jobs.setdefault(ev["Job ID"], {})["t1"] = ev.get("Completion Time", 0)
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            acc = {a.get("Name"): int(a.get("Value", 0))
                   for a in si.get("Accumulables", [])
                   if str(a.get("Value", "")).lstrip("-").isdigit()}
            stages[si["Stage ID"]] = {
                "name": si.get("Stage Name", "")[:60],
                "tasks": si.get("Number of Tasks"),
                "ms": round((si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1e3, 2),
                "task_ms": acc.get("internal.metrics.executorRunTime", 0),
                "cpu_ms": acc.get("internal.metrics.executorCpuTime", 0) // 1000000,
                "sh_w_mb": round(acc.get("internal.metrics.shuffle.write.bytesWritten", 0) / 1e6, 1),
                "sh_r_mb": round((acc.get("internal.metrics.shuffle.read.localBytesRead", 0)
                                  + acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0)) / 1e6, 1),
                "rows_out": acc.get("internal.metrics.shuffle.write.recordsWritten", 0),
                "spill_mb": round(acc.get("internal.metrics.diskBytesSpilled", 0) / 1e6, 1),
                "gc_s": round(acc.get("internal.metrics.jvmGCTime", 0) / 1e3, 1),
            }
    for name in queries:
        print(f"\n=== {name}  wall={walls[name][0]}s rows={walls[name][1]}")
        myjobs = [(jid, j) for jid, j in sorted(jobs.items()) if j.get("grp") == name]
        for jid, j in myjobs:
            dur = (j.get("t1", 0) - j.get("t0", 0)) / 1e3
            if dur > 0.25:
                print(f"  job{jid:4d} {dur:6.2f}s stages={j.get('stages')}")
        mine = [(sid, s) for sid, s in stages.items() if stage_group.get(sid) == name]
        for sid, s in sorted(mine, key=lambda x: -x[1]["task_ms"])[:12]:
            print(f"  s{sid:4d} wall={s['ms']:7.2f}s task={s['task_ms']/1e3:8.1f}s cpu={s['cpu_ms']/1e3:8.1f}s "
                  f"t={s['tasks']:3d} shW={s['sh_w_mb']:8.1f}MB shR={s['sh_r_mb']:8.1f}MB "
                  f"rows={s['rows_out']:>11d} spill={s['spill_mb']}MB gc={s['gc_s']}s  {s['name']}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
