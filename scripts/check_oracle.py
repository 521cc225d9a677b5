"""Run every queries()/oracle_sql() pair and compare like the driver:
row count + schema (sorted column names) + order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402
from graphiti_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object and len(pdf) and isinstance(pdf[c].iloc[0], (list, np.ndarray)):
            pdf[c] = pdf[c].apply(lambda v: ",".join(map(str, v)))
        elif str(pdf[c].dtype).startswith("float"):
            pdf[c] = pdf[c].round(6)
        elif str(pdf[c].dtype).startswith("datetime"):
            pdf[c] = pdf[c].astype("datetime64[us]")
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="check_oracle")

    def duck_sql(sql: str) -> pd.DataFrame:
        # Fresh connection per oracle query: a single shared connection
        # accumulates buffer-pool pages across all registered queries and,
        # sitting next to the Spark JVM heap, eventually OOMs the
        # sandbox (observed: "Failed to allocate block of 16384 bytes"
        # on queries that pass in isolation). View creation is
        # metadata-only, so the recycle costs ~ms.
        con = duckdb.connect()
        try:
            for t in TABLES:
                con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
            return con.sql(sql).df()
        finally:
            con.close()

    qs, os_ = entry.queries(), entry.oracle_sql()
    failures = []

    # oracle precondition: the pair-component canonical rule in
    # KG_CANONICAL_MAP / KG_EDGES_CANONICAL is exact only for size-2
    # duplicate components — fail loudly if the corpus ever changes
    from graphiti_spark import oracle as _orc  # noqa: E402

    viol = duck_sql(_orc.ASSERT_PAIR_COMPONENTS)
    if len(viol):
        failures.append("assert_pair_components")
        print(f"[PRECOND-FAIL] dedupe components of size >2 exist:\n{viol.head()}")
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = os_.get(name)
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"[SPARK-ERROR] {name}: {type(e).__name__}: {str(e)[:200]}")
            continue
        if sql is None:
            print(f"[rows-only ] {name}: {len(got)} rows")
            if len(got) == 0 and name not in ("kg_uuid_map_alias",):
                print(f"  WARNING: empty result for rows-only {name}")
            continue
        try:
            exp = duck_sql(sql)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"[DUCK-ERROR ] {name}: {type(e).__name__}: {str(e)[:200]}")
            continue
        g, x = normalize(got), normalize(exp)
        status = []
        if len(g) != len(x):
            status.append(f"rowcount {len(g)} vs {len(x)}")
        if list(g.columns) != list(x.columns):
            status.append(f"schema {list(g.columns)} vs {list(x.columns)}")
        if not status:
            try:
                pd.testing.assert_frame_equal(
                    g, x, check_dtype=False, check_exact=False, rtol=1e-6, atol=1e-6
                )
            except AssertionError as e:
                status.append(f"values: {str(e).splitlines()[-1][:160]}")
        if status:
            failures.append(name)
            print(f"[MISMATCH   ] {name}: {'; '.join(status)}")
        else:
            print(f"[OK         ] {name}: {len(g)} rows")
    spark.stop()
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
