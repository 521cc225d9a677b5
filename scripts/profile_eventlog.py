"""Event-log stage profile of the fused build_graph pass at two
parallelism levels, run SEQUENTIALLY (no co-running JVMs). Parses the
Spark event log of the measured pass and prints per-stage wall time,
task time, and max-task share — the data needed to find which stage
stops scaling between N and 4N cores.

Usage: python scripts/profile_eventlog.py [sf_dir] [repl] [cores ...]
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVDIR = "/tmp/spark-events"

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from graphiti_spark.session import get_spark
from graphiti_spark import transcripts as tr
from graphiti_spark.plans import pipeline as pl
from pyspark.sql import functions as F

cores = int(sys.argv[1]); sf_dir = sys.argv[2]; repl = int(sys.argv[3])
spark = get_spark(app_name=f"ev_{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=cores,
                  extra_conf={{"spark.eventLog.enabled": "true",
                              "spark.eventLog.compress": "false",
                              "spark.eventLog.rolling.enabled": "false",
                              "spark.eventLog.dir": {evdir!r}}})

def transcripts():
    t = tr.transcripts_from_events(spark, sf_dir)
    reps = spark.range(repl).select(F.col("id").alias("rep"))
    return t.crossJoin(reps).withColumn(
        "conv_id", F.concat_ws("-", "conv_id", F.col("rep").cast("string"))
    ).drop("rep")

def one_pass():
    tables = pl.build_graph(transcripts(), with_embeddings=True)
    for name in ("edges", "nodes", "mentions"):
        tables[name].write.format("noop").mode("overwrite").save()

t0 = time.time(); one_pass(); warm = time.time() - t0
t_meas = time.time() * 1000
t0 = time.time(); one_pass(); meas = time.time() - t0
print(json.dumps({{"cores": cores, "warm": round(warm, 2),
                  "measured": round(meas, 2), "meas_start_ms": t_meas,
                  "app_id": spark.sparkContext.applicationId}}), flush=True)
spark.stop()
"""


def parse_eventlog(path: str, cutoff_ms: float) -> list[dict]:
    stages = []
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                if sub is None or comp is None or comp < cutoff_ms:
                    continue
                stages.append(
                    {
                        "stage": si["Stage ID"],
                        "name": si["Stage Name"].split("\n")[0][:60],
                        "wall_s": round((comp - sub) / 1000, 2),
                        "tasks": si["Number of Tasks"],
                    }
                )
    return stages


def task_metrics(path: str, stage_ids: set[int]) -> dict[int, dict]:
    agg: dict[int, dict] = {}
    with open(path) as f:
        for line in f:
            if '"SparkListenerTaskEnd"' not in line:
                continue
            ev = json.loads(line)
            sid = ev["Stage ID"]
            if sid not in stage_ids:
                continue
            tm = ev.get("Task Metrics") or {}
            run = tm.get("Executor Run Time", 0)
            a = agg.setdefault(sid, {"task_ms": 0, "max_ms": 0, "n": 0, "spill": 0})
            a["task_ms"] += run
            a["max_ms"] = max(a["max_ms"], run)
            a["n"] += 1
            a["spill"] += tm.get("Disk Bytes Spilled", 0)
    return agg


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repl = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    levels = [int(x) for x in sys.argv[3:]] or [2, 8]
    os.makedirs(EVDIR, exist_ok=True)

    for cores in levels:
        import time

        t_start = time.time() * 1000
        out = subprocess.run(
            [sys.executable, "-c", CHILD.format(repo=REPO, evdir=EVDIR),
             str(cores), sf_dir, str(repl)],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"CHILD FAILED at {cores} cores:\n{out.stderr[-2000:]}")
            return
        info = json.loads(line[-1])
        print(f"\n=== {cores} cores: warm={info['warm']}s measured={info['measured']}s ===")
        logs = sorted(glob.glob(f"{EVDIR}/*{info['app_id']}*"), key=os.path.getmtime)
        if not logs:
            print("no event log found")
            continue
        if os.path.isdir(logs[-1]):  # eventlog_v2 rolling dir
            inner = sorted(glob.glob(f"{logs[-1]}/events_*"), key=os.path.getmtime)
            if not inner:
                print("no event files in rolling dir")
                continue
            merged = f"/tmp/evmerged_{info['app_id']}.json"
            with open(merged, "w") as out_f:
                for p in inner:
                    with open(p) as in_f:
                        out_f.write(in_f.read())
            logs = [merged]
        del t_start
        cutoff = info["meas_start_ms"]  # stages completing in the measured pass
        stages = parse_eventlog(logs[-1], cutoff)
        metrics = task_metrics(logs[-1], {s["stage"] for s in stages})
        stages.sort(key=lambda s: -s["wall_s"])
        print(f"{'sid':>4} {'wall_s':>7} {'task_s':>8} {'max_task_s':>10} {'n':>4} {'spillMB':>8}  name")
        for s in stages[:18]:
            m = metrics.get(s["stage"], {})
            print(
                f"{s['stage']:>4} {s['wall_s']:>7.1f} {m.get('task_ms', 0)/1000:>8.1f} "
                f"{m.get('max_ms', 0)/1000:>10.1f} {s['tasks']:>4} "
                f"{m.get('spill', 0)/1e6:>8.0f}  {s['name']}"
            )


if __name__ == "__main__":
    main()
