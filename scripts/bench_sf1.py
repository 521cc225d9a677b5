"""Flagship bench at sf1 (10x the driver's largest scale factor) —
the empirical test of the "md5-uniform keys, AQE covers skew, ≤ linear
scaling" claims (VERDICT r4 #2).

Runs the four flagships at sf0.1 (driver parquet) and sf1 (the
deterministic 10x tiling from scripts/make_scaled_data.py — within-
replica duplicate/span/conversation structure preserved, so each
workload's intrinsic size scales exactly 10x) in ONE warm JVM, and
reports per-query wall at both scales, the sf1/sf0.1 ratio (linear =
10), and the top-3 sf1 stages by executor task time from the Spark
event log — the skew check: a skew tail shows up as one stage whose
max-task share dominates its wall.

Usage: python scripts/bench_sf1.py [sf01_dir] [sf1_dir] [reps]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
EVDIR = "/tmp/spark-events-sf1"

from pyspark.sql import functions as F  # noqa: E402

from graphiti_spark.session import get_spark  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf1 = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, ".data/sf1")
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    os.makedirs(EVDIR, exist_ok=True)
    spark = get_spark(
        app_name="bench_sf1", master="local[32]", shuffle_partitions=32,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
            "spark.eventLog.dir": EVDIR,
        },
    )
    app_id = spark.sparkContext.applicationId

    import __spark_entry__ as se
    from graphiti_spark import transcripts as tr
    from graphiti_spark.operators import dataset_dedup as ddp
    from graphiti_spark.plans import pipeline as pl

    def q_kg_pipeline(sf_dir):
        pl.force_outputs(
            pl.build_graph(tr.transcripts_from_events(spark, sf_dir), with_embeddings=True)
        )

    def q_curation_pipeline(sf_dir):
        force(se.q_curation_pipeline(spark, sf_dir))

    def q_minhash_pairs(sf_dir):
        force(
            ddp.minhash_pairs(
                spark.read.parquet(f"{sf_dir}/documents.parquet"),
                band_width=8, threshold=0.9,
            )
        )

    def q_span_removal(sf_dir):
        force(
            ddp.span_removal_plan(
                spark.read.parquet(f"{sf_dir}/documents.parquet"), k=8
            )
        )

    queries = {
        "kg_pipeline": q_kg_pipeline,
        "curation_pipeline": q_curation_pipeline,
        "minhash_pairs": q_minhash_pairs,
        "span_removal_documents": q_span_removal,
    }

    # JIT warmup at the small scale
    for fn in queries.values():
        fn(sf01)

    walls: dict[str, dict] = {}
    windows: dict[str, tuple[float, float]] = {}
    for name, fn in queries.items():
        w01 = []
        for _ in range(reps):
            t0 = time.time()
            fn(sf01)
            w01.append(round(time.time() - t0, 2))
        w1 = []
        best_win = None
        for _ in range(reps):
            t0 = time.time()
            fn(sf1)
            dt = round(time.time() - t0, 2)
            if not w1 or dt < min(w1):
                best_win = (t0 * 1000, time.time() * 1000)
            w1.append(dt)
        windows[name] = best_win
        walls[name] = {
            "sf0.1_best": min(w01),
            "sf1_best": min(w1),
            "ratio": round(min(w1) / min(w01), 2),
            "sf0.1_all": w01,
            "sf1_all": w1,
        }
        print(f"{name}: sf0.1 {min(w01)}s  sf1 {min(w1)}s  ratio {walls[name]['ratio']}x",
              flush=True)

    spark.stop()

    # top-3 sf1 stages by executor task time within each min-pass window
    logs = glob.glob(f"{EVDIR}/{app_id}*")
    stage_meta: dict[int, dict] = {}
    task_agg: dict[int, dict] = {}
    if logs:
        with open(logs[0]) as f:
            for line in f:
                if '"SparkListenerStageCompleted"' in line:
                    si = json.loads(line)["Stage Info"]
                    if si.get("Submission Time") is None:
                        continue
                    stage_meta[si["Stage ID"]] = {
                        "name": si["Stage Name"].split("\n")[0][:50],
                        "sub": si["Submission Time"],
                        "wall_s": round(
                            (si["Completion Time"] - si["Submission Time"]) / 1000, 2
                        ),
                        "tasks": si["Number of Tasks"],
                    }
                elif '"SparkListenerTaskEnd"' in line:
                    ev = json.loads(line)
                    tm = ev.get("Task Metrics") or {}
                    a = task_agg.setdefault(ev["Stage ID"], {"task_ms": 0, "max_ms": 0})
                    run = tm.get("Executor Run Time", 0)
                    a["task_ms"] += run
                    a["max_ms"] = max(a["max_ms"], run)
    top_stages: dict[str, list] = {}
    for name, (lo, hi) in windows.items():
        in_win = [
            (sid, m) for sid, m in stage_meta.items() if lo <= m["sub"] <= hi
        ]
        ranked = sorted(
            in_win, key=lambda x: task_agg.get(x[0], {}).get("task_ms", 0), reverse=True
        )[:3]
        top_stages[name] = [
            {
                "stage": sid,
                "name": m["name"],
                "wall_s": m["wall_s"],
                "tasks": m["tasks"],
                "task_s": round(task_agg.get(sid, {}).get("task_ms", 0) / 1000, 1),
                "max_task_s": round(task_agg.get(sid, {}).get("max_ms", 0) / 1000, 1),
            }
            for sid, m in ranked
        ]

    print(json.dumps({"walls": walls, "top_stages_sf1": top_stages, "reps": reps,
                      "sf01": sf01, "sf1": sf1}, indent=1))


if __name__ == "__main__":
    main()
