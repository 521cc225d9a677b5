"""Per-stage scaling profile of build_graph: which stage fails to scale?

Spawns one idle child JVM per parallelism level (like
bench_scaling_paired.py) and alternates measured passes; each pass
forces the pipeline's checkpoint/stage boundaries one at a time and
reports per-stage wall seconds. Per-stage minima across rounds at each
level give a noise-robust picture of WHERE the serial fraction lives.

Usage: python scripts/profile_stages.py [sf_dir] [repl] [rounds] [N_cores]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from graphiti_spark.session import get_spark
from graphiti_spark import transcripts as tr
from graphiti_spark.plans import pipeline as pl
from pyspark.sql import functions as F

cores = int(sys.argv[1]); sf_dir = sys.argv[2]; repl = int(sys.argv[3])
spark = get_spark(app_name=f"prof_{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=cores)

def transcripts():
    t = tr.transcripts_from_events(spark, sf_dir)
    reps = spark.range(repl).select(F.col("id").alias("rep"))
    return t.crossJoin(reps).withColumn(
        "conv_id", F.concat_ws("-", "conv_id", F.col("rep").cast("string"))
    ).drop("rep")

def noop(df):
    df.write.format("noop").mode("overwrite").save()

def one_pass():
    stages = {{}}
    t0 = time.time()
    tables = pl.build_graph(transcripts(), with_embeddings=True)
    stages["plan"] = round(time.time() - t0, 2)
    # force in dependency order; each incremental force ~= that stage
    t0 = time.time(); noop(tables["uuid_map"])
    stages["extract+dedupe+cc"] = round(time.time() - t0, 2)
    t0 = time.time(); noop(tables["nodes"])
    stages["nodes+embed"] = round(time.time() - t0, 2)
    t0 = time.time(); noop(tables["edges"])
    stages["edges"] = round(time.time() - t0, 2)
    t0 = time.time(); noop(tables["mentions"])
    stages["mentions"] = round(time.time() - t0, 2)
    stages["total"] = round(sum(stages.values()), 2)
    return stages

one_pass()  # warm
print("READY", flush=True)
for line in sys.stdin:
    if line.strip() != "GO":
        break
    print(json.dumps(one_pass()), flush=True)
spark.stop()
"""


def spawn(cores: int, sf_dir: str, repl: int) -> subprocess.Popen:
    p = subprocess.Popen(
        [sys.executable, "-c", CHILD.format(repo=REPO), str(cores), sf_dir, str(repl)],
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd=REPO,
    )
    for line in p.stdout:
        if line.strip() == "READY":
            break
    return p


def one(p: subprocess.Popen) -> dict:
    p.stdin.write("GO\n")
    p.stdin.flush()
    for line in p.stdout:
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError("child died")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repl = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    n_cores = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    n4 = n_cores * 4

    pn = spawn(n_cores, sf_dir, repl)
    p4 = spawn(n4, sf_dir, repl)
    runs = {n_cores: [], n4: []}
    for _ in range(rounds):
        runs[n_cores].append(one(pn))
        runs[n4].append(one(p4))
    for p in (pn, p4):
        p.stdin.close()
        p.wait(timeout=120)

    keys = list(runs[n_cores][0].keys())
    print(f"{'stage':<20} {'N='+str(n_cores):>10} {'4N='+str(n4):>10} {'speedup':>8} {'eff':>6}")
    for k in keys:
        mn = min(r[k] for r in runs[n_cores])
        m4 = min(r[k] for r in runs[n4])
        sp = mn / m4 if m4 > 0 else float("inf")
        print(f"{k:<20} {mn:>10.2f} {m4:>10.2f} {sp:>8.2f} {sp/4:>6.2f}")
    print(json.dumps(runs))


if __name__ == "__main__":
    main()
