"""Quality metrics for the north-rule gate (BASELINE.md): triple
extraction precision/recall of the Spark pipeline vs the pure-pandas
rule oracle, on seeded synthetic transcripts with known ground truth.

Multiset P/R over (group, subj, pred, obj) with one occurrence per
provenance episode; names compared on their canonical first token so
alias canonicalization ("Alice Smith" → "Alice") counts as a match,
mirroring the reference's node-dedup semantics.

DEBUG/REPORTING ONLY — this module collects the edge and node tables
to the driver (`toPandas`), which is fine on the bounded seeded
fixture it always runs on (n_convs·turns rows) but must never be
called on a production-scale graph; the pipeline itself never imports
it.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import SparkSession

from graphiti_spark import transcripts as tr
from graphiti_spark.plans import pipeline as pl
from graphiti_spark.schemas import TRANSCRIPTS


def triple_precision_recall(
    spark: SparkSession, n_convs: int = 40, turns_per_conv: int = 10, seed: int = 42
) -> tuple[float, float]:
    pdf = tr.synthesize_transcripts_pdf(
        n_convs=n_convs, turns_per_conv=turns_per_conv, seed=seed
    )
    t = spark.createDataFrame(pdf, schema=TRANSCRIPTS)
    tables = pl.build_graph(t, with_embeddings=False)
    e = tables["edges"].toPandas()
    names = tables["nodes"].toPandas().set_index("uuid")["name"].to_dict()

    got: list[tuple] = []
    for r in e.itertuples():
        for _ in r.episodes:
            got.append(
                (
                    r.group_id,
                    names[r.source_node_uuid].split()[0],
                    r.name,
                    names[r.target_node_uuid].split()[0],
                )
            )
    exp_pdf = tr.ground_truth_triples_pdf(pdf)
    exp = [
        (r.group_id, r.subj_name.split()[0], r.pred, r.obj_name.split()[0])
        for r in exp_pdf.itertuples()
    ]
    got_c, exp_c = Counter(got), Counter(exp)
    tp = sum((got_c & exp_c).values())
    precision = tp / max(sum(got_c.values()), 1)
    recall = tp / max(sum(exp_c.values()), 1)
    return precision, recall
