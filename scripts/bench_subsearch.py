"""Query-time sub-search fan-out latency: sequential vs concurrent.

The reference runs the four object sub-searches (edges/nodes/episodes/
communities) concurrently under one semaphore_gather
(graphiti_core/search/search.py:92-145). Our analog is
search_recipes.collect_results, which submits each sub-search
DataFrame's action from its own thread so the Spark scheduler
interleaves the jobs. This script measures both collection modes on
the same materialized graph at sf0.1 and appends the numbers to
BENCH.md (VERDICT r3 #6 "done" criterion).

Usage: python scripts/bench_subsearch.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from graphiti_spark.session import get_spark
    from graphiti_spark import transcripts as tr
    from graphiti_spark.functions import embeddings as embf
    from graphiti_spark.operators import communities as cm
    from graphiti_spark.operators import search_recipes as sr
    from graphiti_spark.plans import pipeline as pl

    spark = get_spark(app_name="bench_subsearch")
    tables = pl.build_graph(
        tr.transcripts_from_events(spark, sf_dir), with_embeddings=True
    )
    # communities table so the 4th sub-search participates
    communities, _ = cm.build_communities(tables["edges"], tables["nodes"], pl.RUN_TS)
    tables = {
        **tables,
        "communities": embf.attach_embedding(
            communities, "name", "name_embedding"
        ).localCheckpoint(),
    }
    # materialize the graph once; query-time latency must not include
    # the build (checkpoints make repeated sub-searches read-only)
    pl.force_outputs(tables, names=("edges", "nodes", "mentions"))

    def one_query():
        return sr.search(
            tables,
            "Alice works at Acme Corp",
            config="combined_hybrid_search_rrf",
            limit=10,
        )

    seq_walls, conc_walls = [], []
    for _ in range(reps):
        out = one_query()
        t0 = time.time()
        for name in out:
            out[name].collect()
        seq_walls.append(round(time.time() - t0, 3))

        out = one_query()
        t0 = time.time()
        sr.collect_results(out)
        conc_walls.append(round(time.time() - t0, 3))

    seq, conc = min(seq_walls), min(conc_walls)
    speedup = seq / conc if conc else float("nan")
    print(
        {
            "sequential_sec": seq_walls,
            "concurrent_sec": conc_walls,
            "best_seq": seq,
            "best_conc": conc,
            "speedup": round(speedup, 2),
        }
    )
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(
            f"\n## Query-time sub-search fan-out {stamp}\n\n"
            f"`combined_hybrid_search_rrf` (4 object sub-searches) on "
            f"{sf_dir}, graph pre-materialized, min of {reps} reps: "
            f"sequential collection {seq} s vs concurrent "
            f"(`search_recipes.collect_results`, thread-pooled actions "
            f"mirroring the reference's semaphore_gather, "
            f"search/search.py:92-145) {conc} s — **{speedup:.2f}×**. "
            f"All walls: seq={seq_walls}, conc={conc_walls}. Results "
            f"are identical (pytest "
            f"test_collect_results_concurrent_matches_sequential).\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
