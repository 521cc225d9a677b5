"""Noise-robust N-vs-4N scaling run: temporally paired passes.

The sandbox host shows multi-minute noise windows that swing identical
runs 2-3x, so sequential per-level runs confound level with time.
Here BOTH parallelism levels stay alive as idle Spark JVMs and a
parent alternates single measured passes (N, 4N, N, 4N, ...); each
round yields a temporally adjacent pair, and the reported efficiency
uses the per-level minima across rounds (capability under the same
noise exposure). Appends to BENCH.md like bench_scaling.py.

Usage: python scripts/bench_scaling_paired.py [sf_dir] [repl] [rounds]
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
from pyspark.sql import functions as F

cores = int(sys.argv[1]); sf_dir = sys.argv[2]; repl = int(sys.argv[3])
spark = get_spark(app_name=f"paired_{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=cores)

def transcripts(n_repl):
    t = tr.transcripts_from_events(spark, sf_dir)
    reps = spark.range(n_repl).select(F.col("id").alias("rep"))
    return t.crossJoin(reps).withColumn(
        "conv_id", F.concat_ws("-", "conv_id", F.col("rep").cast("string"))
    ).drop("rep")

def one_pass(n_repl):
    tables = pl.build_graph(transcripts(n_repl), with_embeddings=True)
    pl.force_outputs(tables)

# warm at quarter replication: JIT/codegen/Arrow paths are identical,
# the measured passes below use the full repl
one_pass(max(1, repl // 4))
print("READY", flush=True)
for line in sys.stdin:
    if line.strip() != "GO":
        break
    t0 = time.time()
    one_pass(repl)
    print(json.dumps({{"wall": round(time.time() - t0, 3)}}), flush=True)
spark.stop()
"""


def spawn(cores: int, sf_dir: str, repl: int, cpu_list: str | None = None) -> subprocess.Popen:
    """cpu_list (e.g. "0-1") taskset-pins the child (python + forked JVM
    + pyspark daemon workers) to that many PHYSICAL cpus. Without it a
    local[2] JVM's GC/shuffle/Arrow threads spill past 2 host cores
    (observed 217% CPU), inflating N-level throughput and deflating the
    measured N-vs-4N efficiency — a real 2-core executor cannot exceed
    its 2 cores, so pinning is the honest cluster analog. Disjoint
    pins for the two levels also stop the idle JVM's background threads
    from perturbing the live pass."""
    cmd = [sys.executable, "-c", CHILD.format(repo=REPO), str(cores), sf_dir, str(repl)]
    if cpu_list is not None:
        cmd = ["taskset", "-c", cpu_list] + cmd
    # Two 48g-heap JVMs stay alive for the whole protocol; cap each so
    # the pair plus pyspark workers fits the host (a 16-core ×100 child
    # reached 54g RSS and drew the OOM killer when memory was shared
    # with a third JVM). stderr to a file, not DEVNULL — a dead child
    # must be diagnosable.
    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEMORY", "36g")
    errlog = open(f"/tmp/paired_child_{cores}.err", "w")
    p = subprocess.Popen(
        cmd,
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        stderr=errlog,
        text=True,
        cwd=REPO,
        env=env,
    )
    for line in p.stdout:
        if line.strip() == "READY":
            break
    return p


def one(p: subprocess.Popen) -> float:
    p.stdin.write("GO\n")
    p.stdin.flush()
    for line in p.stdout:
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)["wall"]
    raise RuntimeError("child died")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repl = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    n_cores = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    n4_cores = n_cores * 4

    import duckdb

    n_turns = duckdb.sql(
        f"select count(*) from '{sf_dir}/events.parquet'"
    ).fetchone()[0] * repl

    pin = os.environ.get("SPARK_GRAFT_PIN", "1") != "0"
    ncpu = os.cpu_count() or 32
    pin_n = pin_4n = None
    if pin and n_cores + n4_cores <= ncpu:
        pin_n = f"0-{n_cores - 1}"
        pin_4n = f"{n_cores}-{n_cores + n4_cores - 1}"
    pn = spawn(n_cores, sf_dir, repl, pin_n)
    p4 = spawn(n4_cores, sf_dir, repl, pin_4n)
    n_walls, n4_walls = [], []
    for _ in range(rounds):
        n_walls.append(one(pn))
        n4_walls.append(one(p4))
    for p in (pn, p4):
        p.stdin.close()
        p.wait(timeout=120)

    wn, w4 = min(n_walls), min(n4_walls)
    tn, t4 = n_turns / wn, n_turns / w4
    eff = (t4 / tn) / 4
    result = {
        "sf_dir": sf_dir,
        "replication": repl,
        "turns": n_turns,
        "N_cores": n_cores,
        "4N_cores": n4_cores,
        "walls_N": n_walls,
        "walls_4N": n4_walls,
        "turns_per_sec_N": round(tn, 1),
        "turns_per_sec_4N": round(t4, 1),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(
            f"\n## Scaling run (paired) {stamp}\n\n"
            f"| cores | best wall sec | turns/sec |\n|---|---|---|\n"
            f"| {n_cores} (N) | {wn} | {round(tn, 1)} |\n"
            f"| {n4_cores} (4N) | {w4} | {round(t4, 1)} |\n\n"
            f"Scaling efficiency (tput_4N / tput_N) / 4 = **{eff:.3f}** "
            f"(target ≥ 0.8) on {sf_dir} ×{repl} ({n_turns} turns, full KG "
            f"pipeline incl. embeddings). Temporally PAIRED protocol: both "
            f"JVMs alive, single passes alternate N→4N per round, per-level "
            f"min across {rounds} rounds (all walls: N={n_walls}, "
            f"4N={n4_walls}) — sequential per-level runs confound the "
            f"host's multi-minute noise windows with the core count. "
            f"CPU pinning: N→cpus [{pin_n}], 4N→cpus [{pin_4n}] "
            f"(taskset; 'None' = unpinned legacy mode — unpinned local[k] "
            f"JVMs exceed k host cpus via GC/shuffle/Arrow threads, which "
            f"inflates the small level's throughput).\n"
        )


if __name__ == "__main__":
    main()
