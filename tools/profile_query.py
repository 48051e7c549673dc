"""Per-job profile of one catalog query via the Spark event log.

Usage: python tools/profile_query.py <query> [sf_dir] [--warm]

Runs the named query once (optionally after a sf0.001 warmup pass of
the same query) in a session with the event log enabled, then prints a
job-by-job timeline: job id, duration, the gap since the previous job
ended (driver-side Python/py4j work), and the job's first stage name.
The sum of gaps vs the sum of job times tells you whether a slow query
is executor-bound (optimize the plan) or driver-bound (optimize the
Python between actions).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/sparkevents"


def main() -> None:
    name = sys.argv[1]
    args = [a for a in sys.argv[2:] if not a.startswith("--")]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    warm = "--warm" in sys.argv
    # --warmfull: warm with a full pass at the MEASURED sf_dir first, so
    # session-scoped caches (the staged-drop cache) are populated and the
    # profiled pass shows the bench's warm best-of-2 shape
    warmfull = "--warmfull" in sys.argv

    os.makedirs(EVDIR, exist_ok=True)
    from cdk_datalake_ingest_upeu_spark import get_spark

    spark = get_spark(
        f"profile_{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{EVDIR}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    from cdk_datalake_ingest_upeu_spark.workloads import QUERIES

    fn = QUERIES[name]
    if warm:
        try:
            fn(spark, "/root/testdata/sf0.001").count()
        except Exception:
            pass
    if warmfull:
        try:
            fn(spark, sf_dir).count()
        except Exception:
            pass

    app_id = spark.sparkContext.applicationId
    tracker = spark.sparkContext.statusTracker()
    first_job = (max(tracker.getJobIdsForGroup(None) or [-1])) + 1

    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    wall = time.perf_counter() - t0

    # flush the event log
    spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
    log_path = os.path.join(EVDIR, app_id)
    if os.path.isdir(os.path.join(EVDIR, f"eventlog_v2_{app_id}")):
        # Spark 4 rolling layout: a directory of events_* part files
        d = os.path.join(EVDIR, f"eventlog_v2_{app_id}")
        parts = sorted(p for p in os.listdir(d) if p.startswith("events_"))
        lines = []
        for p in parts:
            with open(os.path.join(d, p)) as f:
                lines.extend(f.readlines())
    else:
        if not os.path.exists(log_path):
            cands = [p for p in os.listdir(EVDIR) if p.startswith(app_id)]
            if not cands:
                sys.exit(
                    f"no event log for {app_id} under {EVDIR} — did the "
                    f"query run any job before failing?"
                )
            log_path = os.path.join(EVDIR, cands[0])
        with open(log_path) as f:
            lines = f.readlines()

    jobs: dict[int, dict] = {}
    for line in lines:
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jid = ev["Job ID"]
            if jid < first_job:
                continue
            props = ev.get("Properties") or {}
            stages = ev.get("Stage Infos") or []
            jobs[jid] = {
                "start": ev["Submission Time"],
                "desc": props.get("spark.job.description", ""),
                "stage": stages[-1]["Stage Name"] if stages else "",
                "n_stages": len(stages),
            }
        elif e == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                jobs[jid]["end"] = ev["Completion Time"]

    order = sorted(jobs)
    total_job = 0.0
    total_gap = 0.0
    prev_end = None
    rows = []
    for jid in order:
        j = jobs[jid]
        if "end" not in j:
            continue
        dur = (j["end"] - j["start"]) / 1000.0
        gap = (j["start"] - prev_end) / 1000.0 if prev_end is not None else 0.0
        prev_end = j["end"]
        total_job += dur
        total_gap += max(gap, 0.0)
        rows.append((jid, dur, gap, j["n_stages"], (j["desc"] or j["stage"])[:90]))

    print(f"query={name} sf_dir={sf_dir} wall={wall:.2f}s "
          f"jobs={len(rows)} job_time={total_job:.2f}s "
          f"driver_gaps={total_gap:.2f}s")
    for jid, dur, gap, nst, label in rows:
        print(f"  job {jid:>4}  {dur:7.3f}s  gap {gap:7.3f}s  "
              f"stages={nst}  {label}")


if __name__ == "__main__":
    main()
