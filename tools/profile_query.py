"""Per-query stage profiler for the optimization rounds.

Runs named registry queries with the Spark event log enabled, forces
execution with the noop sink (guide §1.4), and prints a per-query
breakdown: wall seconds split into job/stage time, task counts, shuffle
bytes, and the dominant stages — so optimization targets the measured
cost, not a guess. Also reports pure wall time around `.toPandas()`
(what check_oracle pays) when --topandas is given.

Usage:
    python tools/profile_query.py SF_DIR q177 q88 ...
    python tools/profile_query.py SF_DIR --topandas q177
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--topandas"]
    use_topandas = "--topandas" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:]

    log_dir = "/tmp/spark-events-profile"
    os.makedirs(log_dir, exist_ok=True)
    for f in os.listdir(log_dir):
        os.unlink(os.path.join(log_dir, f))

    import __spark_entry__ as entry
    from pandrs_spark.session import get_spark

    spark = get_spark(
        "profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    reg = {}
    for want in names:
        hits = [k for k in qs if k == want or k.startswith(want + "_")]
        if not hits:
            print(f"unknown query {want!r}", file=sys.stderr)
            return 2
        reg[hits[0]] = qs[hits[0]]

    from pandrs_spark.frame import release_persisted

    marks = {}
    for name, fn in reg.items():
        spark.sparkContext.setJobDescription(f"PROFILE:{name}")
        t0 = time.perf_counter()
        t_plan0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_build = time.perf_counter() - t_plan0
        if use_topandas:
            df.toPandas()
        else:
            df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        release_persisted()
        spark.sparkContext.setJobDescription(None)
        marks[name] = {"wall_s": round(wall, 2), "py_build_s": round(t_build, 2)}
        print(f"{name}: wall {wall:.2f}s (python plan-build {t_build:.2f}s)")

    spark.stop()
    time.sleep(1)

    # ---- parse the event log ----
    logs = []
    for f in os.listdir(log_dir):
        p = os.path.join(log_dir, f)
        if os.path.isdir(p):
            logs.extend(
                os.path.join(p, g)
                for g in os.listdir(p)
                if "events" in g or g.startswith("eventLog")
            )
        else:
            logs.append(p)
    events = []
    for lf in logs:
        try:
            with open(lf) as fh:
                for line in fh:
                    try:
                        events.append(json.loads(line))
                    except json.JSONDecodeError:
                        pass
        except (IsADirectoryError, OSError):
            pass

    # job -> description; stage -> job
    job_desc = {}
    job_stages = {}
    stage_info = {}
    for e in events:
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            props = e.get("Properties", {}) or {}
            job_desc[e["Job ID"]] = props.get("spark.job.description", "")
            job_stages[e["Job ID"]] = [
                s["Stage ID"] for s in e.get("Stage Infos", [])
            ]
        elif ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            sid = si["Stage ID"]
            dur = (si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1000.0
            stage_info[sid] = {
                "name": si.get("Stage Name", "")[:90],
                "tasks": si.get("Number of Tasks", 0),
                "dur_s": round(dur, 2),
            }
    # task metrics per stage
    stage_task = {}
    for e in events:
        if e.get("Event") == "SparkListenerTaskEnd":
            sid = e["Stage ID"]
            tm = e.get("Task Metrics") or {}
            agg = stage_task.setdefault(
                sid,
                {"run_ms": 0, "shuffle_read_b": 0, "shuffle_write_b": 0,
                 "input_b": 0, "gc_ms": 0, "deser_ms": 0},
            )
            agg["run_ms"] += tm.get("Executor Run Time", 0)
            agg["gc_ms"] += tm.get("JVM GC Time", 0)
            agg["deser_ms"] += tm.get("Executor Deserialize Time", 0)
            srm = tm.get("Shuffle Read Metrics") or {}
            agg["shuffle_read_b"] += srm.get("Remote Bytes Read", 0) + srm.get("Local Bytes Read", 0)
            swm = tm.get("Shuffle Write Metrics") or {}
            agg["shuffle_write_b"] += swm.get("Shuffle Bytes Written", 0)
            im = tm.get("Input Metrics") or {}
            agg["input_b"] += im.get("Bytes Read", 0)

    # group stages under their profile label
    per_query: dict[str, list] = {}
    for jid, desc in sorted(job_desc.items()):
        if not desc.startswith("PROFILE:"):
            continue
        qname = desc.split(":", 1)[1]
        for sid in job_stages.get(jid, []):
            if sid in stage_info:
                per_query.setdefault(qname, []).append(sid)

    print("\n==== stage breakdown ====")
    for qname, sids in per_query.items():
        sids = sorted(set(sids))
        total_stage = sum(stage_info[s]["dur_s"] for s in sids)
        njobs = sum(1 for j, d in job_desc.items() if d == f"PROFILE:{qname}")
        print(f"\n--- {qname}: wall {marks.get(qname, {}).get('wall_s')}s, "
              f"{njobs} jobs, {len(sids)} stages, stage-sum {total_stage:.2f}s ---")
        top = sorted(sids, key=lambda s: -stage_info[s]["dur_s"])[:12]
        for s in top:
            si = stage_info[s]
            tk = stage_task.get(s, {})
            print(f"  stage {s:4d} {si['dur_s']:7.2f}s  {si['tasks']:4d} tasks  "
                  f"run {tk.get('run_ms', 0)/1000:6.1f}s  "
                  f"shufR {tk.get('shuffle_read_b', 0)/1e6:7.1f}MB  "
                  f"shufW {tk.get('shuffle_write_b', 0)/1e6:7.1f}MB  {si['name']}")
    # driver gap: wall not covered by stages = planning/codegen/driver work
    print("\n==== summary (wall vs stage-sum; gap = driver/planning/codegen) ====")
    for qname in marks:
        sids = sorted(set(per_query.get(qname, [])))
        total_stage = sum(stage_info[s]["dur_s"] for s in sids)
        w = marks[qname]["wall_s"]
        print(f"  {qname}: wall {w:.2f}s, stage-sum {total_stage:.2f}s, "
              f"gap {w - total_stage:.2f}s, py-build {marks[qname]['py_build_s']:.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
