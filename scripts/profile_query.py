#!/usr/bin/env python
"""Per-stage profiler for a registered query (guide §1: measure
first). Runs the named query with the event log enabled, forces it
with the noop sink (one warm run, then one timed run), and prints a
per-job/per-stage wall breakdown from the event log — submission →
completion wall, task-time sum, shuffle bytes, and the stage's
callsite — so optimization targets the measured stage, not a guess.

Usage: python scripts/profile_query.py <query> [<query> ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/spark-events-profile"


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: profile_query.py <query> [...]", file=sys.stderr)
        return 2
    os.makedirs(EVDIR, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from queryengine_spark.queries import all_queries
    from queryengine_spark.session import get_spark

    extra = {
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": f"file:{EVDIR}",
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    }
    # ad-hoc A/B: SPARK_GRAFT_PROFILE_CONF="k=v,k=v"
    for kv in os.environ.get("SPARK_GRAFT_PROFILE_CONF", "").split(","):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k.strip()] = v.strip()
    spark = get_spark("queryengine-profile", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # warm the session the same way bench.py does (workers + codegen)
    from pyspark.sql import functions as F

    from queryengine_spark.functions.similarity import cosine_similarity

    n_cores = spark.sparkContext.defaultParallelism
    v = F.array(F.lit(1.0), F.lit(2.0))
    spark.range(n_cores, numPartitions=n_cores).select(
        cosine_similarity(v, v)
    ).write.format("noop").mode("overwrite").save()

    sc = spark.sparkContext
    app_id = sc.applicationId

    for name in names:
        fn = queries[name]
        # one warm run (codegen/broadcast one-time costs), untimed
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        import gc

        gc.collect()
        sc._jvm.System.gc()
        time.sleep(0.3)

        tracker = sc.statusTracker()
        before_jobs = set(tracker.getJobIdsForGroup(None) or [])
        sc.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        sc.setJobDescription(None)
        print(f"\n=== {name}: wall {wall:.3f}s (timed run) ===")
        _report(app_id, name, before_jobs)
        gc.collect()
        sc._jvm.System.gc()
        time.sleep(0.3)
    return 0


def _report(app_id: str, name: str, before_jobs: set[int]) -> None:
    # the in-progress event log flushes per event; give it a beat
    time.sleep(0.5)
    # Spark 4 rolling layout: eventlog_v2_<appid>/events_*_<appid>*
    paths: list[str] = []
    for fn in os.listdir(EVDIR):
        full = os.path.join(EVDIR, fn)
        if fn.startswith(f"eventlog_v2_{app_id}") and os.path.isdir(full):
            paths = [
                os.path.join(full, f)
                for f in sorted(os.listdir(full))
                if f.startswith("events_")
            ]
        elif fn.startswith(app_id) and os.path.isfile(full):
            paths = [full]
    if not paths:
        print("  (no event log found)")
        return
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    import itertools

    lines = itertools.chain.from_iterable(open(p) for p in paths)
    if True:
        for line in lines:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "t0": ev["Submission Time"],
                    "desc": props.get("spark.job.description", ""),
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                stages[sid] = {
                    "name": si.get("Stage Name", ""),
                    "t0": si.get("Submission Time"),
                    "t1": si.get("Completion Time"),
                    "n_tasks": si.get("Number of Tasks"),
                    "details": (si.get("Details") or "").split("\n")[0],
                }
    sel = {
        j: v
        for j, v in jobs.items()
        if j not in before_jobs and v.get("desc", "").startswith(f"profile:{name}")
    }
    if not sel:
        # job description may be absent on some actions: fall back to
        # everything after the warm run
        sel = {j: v for j, v in jobs.items() if j not in before_jobs}
    tot = 0.0
    for jid in sorted(sel):
        v = sel[jid]
        if "t1" not in v:
            continue
        jw = (v["t1"] - v["t0"]) / 1000.0
        tot += jw
        print(f"  job {jid:4d}  {jw:7.3f}s")
        for sid in sorted(v["stages"]):
            s = stages.get(sid)
            if s is None or s.get("t0") is None:
                continue
            sw = (s["t1"] - s["t0"]) / 1000.0
            print(
                f"    stage {sid:4d} {sw:7.3f}s  tasks={s['n_tasks']:<4} "
                f"{s['name'][:40]} | {s['details'][:70]}"
            )
    print(f"  Σ job wall {tot:.3f}s over {len(sel)} jobs")


if __name__ == "__main__":
    raise SystemExit(main())
