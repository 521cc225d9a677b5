"""Two-parallelism scaling run (north rule: N vs 4N executors).

Runs the identical full KG pipeline on the same input at local[8] (N)
and local[32] (4N) in separate JVMs, reports turns/sec at both plus
scaling efficiency = (tput_4N / tput_N) / 4, and appends the result to
BENCH.md. The sandbox has no real cluster; per driver instructions two
local parallelism levels stand in for two cluster sizes.

Usage: python scripts/bench_scaling.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from graphiti_spark.session import get_spark
from graphiti_spark import transcripts as tr
from graphiti_spark.plans import pipeline as pl

cores = int(sys.argv[1]); sf_dir = sys.argv[2]; repl = int(sys.argv[3])
spark = get_spark(app_name=f"scaling_{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=cores)
from pyspark.sql import functions as F

def transcripts():
    # deterministic Spark-side replication: each replica is a distinct set
    # of conversations (conv_id suffixed), so per-group work is unchanged
    # and total work scales by `repl` — big enough that parallel compute
    # dominates fixed driver/JVM overhead at both core counts.
    t = tr.transcripts_from_events(spark, sf_dir)
    if repl > 1:
        reps = spark.range(repl).select(F.col("id").alias("rep"))
        t = t.crossJoin(reps).withColumn(
            "conv_id", F.concat_ws("-", "conv_id", F.col("rep").cast("string"))
        ).drop("rep")
    return t

n_turns = spark.read.parquet(f"{{sf_dir}}/events.parquet").count() * repl
# warm: full pipeline pass amortizes JVM/codegen compilation (executors
# on a long-lived cluster are JIT-warm); then measure steady state.
# Multiple measured passes, best-of — the sandbox VM has noisy CPU and
# a single pass can be inflated 2-3x by neighbor interference; min is
# the steady-state capability number.
warm = pl.build_graph(transcripts(), with_embeddings=True)
pl.force_outputs(warm)
passes = []
for _ in range(int(sys.argv[4])):
    t0 = time.time()
    tables = pl.build_graph(transcripts(), with_embeddings=True)
    pl.force_outputs(tables)
    passes.append(round(time.time() - t0, 3))
wall = min(passes)
print(json.dumps({{"cores": cores, "wall_sec": wall, "passes": passes,
                   "turns": n_turns, "turns_per_sec": round(n_turns / wall, 1)}}))
spark.stop()
"""


def run(cores: int, sf_dir: str, repl: int, trials: int = 3) -> dict:
    script = CHILD.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), sf_dir, str(repl), str(trials)],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=REPO,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repl = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    n = run(8, sf_dir, repl, trials)
    n4 = run(32, sf_dir, repl, trials)
    eff = (n4["turns_per_sec"] / n["turns_per_sec"]) / 4
    result = {
        "sf_dir": sf_dir,
        "replication": repl,
        "N_cores": 8,
        "4N_cores": 32,
        "turns_per_sec_N": n["turns_per_sec"],
        "turns_per_sec_4N": n4["turns_per_sec"],
        "wall_sec_N": n["wall_sec"],
        "wall_sec_4N": n4["wall_sec"],
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(
            f"\n## Scaling run {stamp}\n\n"
            f"| cores | wall sec | turns/sec |\n|---|---|---|\n"
            f"| 8 (N) | {n['wall_sec']} | {n['turns_per_sec']} |\n"
            f"| 32 (4N) | {n4['wall_sec']} | {n4['turns_per_sec']} |\n\n"
            f"Scaling efficiency (tput_4N / tput_N) / 4 = **{eff:.3f}** "
            f"(target ≥ 0.8, BASELINE.md) on {sf_dir} ×{repl} replication "
            f"({n['turns']} turns, full KG pipeline incl. embeddings); "
            f"best of {len(n['passes'])} measured passes per level "
            f"(all passes: N={n['passes']}, 4N={n4['passes']}) — best-of "
            f"because the sandbox VM shows 2-3× neighbor-noise swings.\n"
        )


if __name__ == "__main__":
    main()
