"""Dump formatted physical plans for the headline operators and grep
the properties that matter at scale: PushedFilters on parquet scans,
BroadcastHashJoin for small dims, WholeStageCodegen spans, absence of
CartesianProduct where a broadcast was intended.

Usage: python scripts/explain_plans.py [sf_dir] > PLANS.txt
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from graphiti_spark.session import get_spark  # noqa: E402


def show(name: str, df) -> None:
    print(f"\n{'=' * 70}\n## {name}\n{'=' * 70}")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    print(text)
    flags = []
    if "PushedFilters: [" in text and "PushedFilters: []" not in text:
        flags.append("pushdown✓")
    if "BroadcastHashJoin" in text:
        flags.append("broadcast✓")
    if "CartesianProduct" in text:
        flags.append("CARTESIAN⚠")
    if "WholeStageCodegen" in text or "codegen id :" in text:
        flags.append("codegen✓")
    n_exch = text.count("Exchange")
    print(f"--> flags: {flags}, exchanges: {n_exch}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="explain", master="local[4]", shuffle_partitions=4)
    qs = entry.queries()
    for name in [
        "kg_triples",
        "kg_edges",
        "kg_retrieve_episodes",
        "topk_events_per_user",
        "join_nation_revenue",
        "bm25_documents",
        "ann_topk",
        "minhash_pairs_documents",
        "agg_lineitem_pricing",
        "repetition_documents",
        "pii_documents",
        "paragraph_dups_documents",
        "contamination_documents",
        "sample_documents",
        "temperature_mix_documents",
        "unigram_lm_documents",
        "tfidf_top_terms_documents",
        "centroid_outliers",
        "pack_sequences_documents",
        "span_dups_documents",
        "quality_bins_documents",
        "shard_documents",
        "minhash_star_documents",
        "curation_pipeline",
        # round-5 additions
        "source_cap_documents",
        "split_documents",
        "token_budget_documents",
        "contamination_bloom_documents",
    ]:
        show(name, qs[name](spark, sf_dir))
    # pushdown sanity: projection+filter reaches the parquet scan
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    show(
        "pushdown_check",
        li.filter(F.col("l_shipdate") < "1995-01-01").select("l_orderkey", "l_quantity"),
    )
    spark.stop()


if __name__ == "__main__":
    main()
