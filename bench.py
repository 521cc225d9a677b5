"""Benchmark harness — one JSON line per run (driver contract).

Headline queries over $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS]. `value` = total wall seconds across the
headline set (per-query BEST of $SPARK_GRAFT_BENCH_REPS passes, default
3, measured back-to-back in one process — the sandbox host shows
multi-minute noise windows that swing single passes 2-5×, so min-of-R
is the capability estimate). Per-query seconds under "queries"; all
raw passes under "queries_all"; process-tree CPU seconds (JVM
executors + pyspark workers + driver) under "queries_cpu" — CPU time
is immune to hypervisor steal, so regressions stay detectable through
wall-clock noise. Execution is forced with the noop sink (full
pipeline runs, nothing collected).

Scaling evidence (north rule: N vs 4N executors) is produced by
scripts/bench_scaling_paired.py which alternates single passes between
two live JVMs (local[N] / local[4N]) and appends to BENCH.md; this
file stays a single-process bench.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _tree_cpu_seconds() -> float:
    """utime+stime of this process and every descendant (JVM, pyspark
    daemon workers) from /proc — one scan, no dependencies. Live
    children are read directly; reaped children fold into cutime."""
    clk = os.sysconf("SC_CLK_TCK")
    procs: dict[int, tuple[int, float]] = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
        except OSError:
            continue
        # after comm: state=0 ppid=1 ... utime=11 stime=12 cutime=13 cstime=14
        ppid = int(parts[1])
        cpu = (int(parts[11]) + int(parts[12]) + int(parts[13]) + int(parts[14])) / clk
        procs[int(pid)] = (ppid, cpu)
    root = os.getpid()
    total = 0.0
    for pid, (ppid, cpu) in procs.items():
        p = pid
        while p > 1:
            if p == root:
                total += cpu
                break
            p = procs.get(p, (0, 0.0))[0]
    return total

from pyspark.sql import functions as F  # noqa: E402

from graphiti_spark import transcripts as tr  # noqa: E402
from graphiti_spark.operators import dataset_ann as ann  # noqa: E402
from graphiti_spark.operators import dataset_dedup as ddp  # noqa: E402
from graphiti_spark.operators import dataset_text as dtx  # noqa: E402
from graphiti_spark.operators import search as srch  # noqa: E402
from graphiti_spark.plans import pipeline as pl  # noqa: E402
from graphiti_spark.session import get_spark  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="graphiti_bench", master=f"local[{cpus}]", shuffle_partitions=cpus)

    read = lambda name: spark.read.parquet(f"{sf_dir}/{name}.parquet")
    n_turns = read("events").count()

    def q_kg_pipeline():
        t = tr.transcripts_from_events(spark, sf_dir)
        tables = pl.build_graph(t, with_embeddings=True)
        pl.force_outputs(tables)

    def q_kg_extraction_only():
        t = tr.transcripts_from_events(spark, sf_dir)
        from graphiti_spark.operators import episodes as ep_ops, extraction as ex

        force(ex.extract_triples(ep_ops.build_episodes(t)))

    def q_bm25():
        force(srch.bm25_search(read("documents"), "text", "data join query spark", id_col="doc_id", limit=10))

    def q_ann_topk():
        embs = read("embeddings")
        probes = embs.filter("vec_id < 8").select(F.col("vec_id").alias("qid"), "embedding")
        force(ann.cosine_topk_join(probes, embs, k=10))

    def q_minhash():
        force(ddp.minhash_pairs(read("documents"), band_width=8, threshold=0.9))

    def q_simhash():
        force(ddp.simhash(read("documents")).select("doc_id", "simhash"))

    def q_text_quality():
        force(dtx.quality_score(dtx.lang_id(read("documents"))))

    def q_tpch_mix():
        li = read("lineitem")
        force(
            li.groupBy("l_returnflag", "l_linestatus").agg(
                F.sum("l_quantity"), F.sum("l_extendedprice"), F.avg("l_discount"), F.count("*")
            )
        )
        o, c = read("orders"), read("customer")
        force(
            o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.sum("o_totalprice"), F.count("*"))
        )

    bench = {
        "kg_pipeline": q_kg_pipeline,
        "kg_extraction_only": q_kg_extraction_only,
        "bm25_documents": q_bm25,
        "ann_topk": q_ann_topk,
        "minhash_pairs": q_minhash,
        "simhash": q_simhash,
        "text_quality": q_text_quality,
        "tpch_mix": q_tpch_mix,
    }

    # one warmup pass of the flagship amortizes JVM/codegen compilation —
    # the steady-state number is the cluster-analog metric (long-running
    # executors are JIT-warm); measured cold-vs-warm delta is ~3×.
    bench["kg_pipeline"]()

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    times: dict[str, float] = {}
    all_times: dict[str, list[float]] = {}
    cpu_times: dict[str, float] = {}
    for name, fn in bench.items():
        walls: list[float] = []
        cpus_used: list[float] = []
        for _ in range(reps):
            c0 = _tree_cpu_seconds()
            t0 = time.time()
            fn()
            walls.append(round(time.time() - t0, 3))
            cpus_used.append(round(_tree_cpu_seconds() - c0, 3))
        all_times[name] = walls
        times[name] = min(walls)
        cpu_times[name] = min(cpus_used)

    total = round(sum(times.values()), 3)
    turns_per_sec = round(n_turns / times["kg_pipeline"], 1) if times.get("kg_pipeline") else None

    # north-rule quality gate, reported alongside throughput
    from graphiti_spark.metrics import triple_precision_recall

    precision, recall = triple_precision_recall(spark)
    print(
        json.dumps(
            {
                "metric": "bench_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "queries_all": all_times,
                "queries_cpu": cpu_times,
                "bench_reps": reps,
                "sf": sf_dir,
                "cpus": cpus,
                "turns_per_sec_kg_pipeline": turns_per_sec,
                "triple_precision": round(precision, 4),
                "triple_recall": round(recall, 4),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
