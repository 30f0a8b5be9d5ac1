"""Malformed-input robustness gate (empty docs + invalid vectors).

The oracle fixtures happen to contain no empty/NULL/whitespace-only
texts, so a Spark-vs-DuckDB divergence on those inputs is LATENT: it
passes every gate until a fixture regeneration plants one, then fails
as a hash mismatch with no code change (found by review in round 4 —
the quality-classifier oracles dropped zero-token docs the Spark side
scored). This script re-runs every documents-table oracled query over
a copy of the sf0.001 fixture with one empty, one NULL and one
whitespace-only text planted, and requires bit-equality.

Engine-wide canonicalization under test: NULL text ≡ '' (tokens(),
normalized_fingerprint(), and every oracle coalesce the same way).

Also plants one NULL, one empty-array and one wrong-length embedding and sweeps the
similarity family: every operator excludes NULL/wrong-dimension
vectors at entry (``similarity.drop_invalid_vectors``) and every
oracle carries the matching validity predicate.

Usage: python scripts/check_empty_docs.py   (exit 0 = all safe)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pyspark.sql.functions as F

import __spark_entry__ as E
from demv_spark.session import get_spark
from scripts.check_oracle import TABLES, frame_signature


def main() -> int:
    spark = get_spark(
        "empty-doc-check",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    d = tempfile.mkdtemp(prefix="docs_empty_")
    try:
        src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        planted = src.withColumn(
            "text",
            F.when(F.col("doc_id") == 1, F.lit(""))
            .when(F.col("doc_id") == 2, F.lit(None))
            .when(F.col("doc_id") == 3, F.lit("   "))
            .otherwise(F.col("text")),
        ).withColumn(
            # keep the derived unit column CONSISTENT with the planted
            # text: zero-unit documents must exist in the fixture or
            # unit-budget operators (mixture/temperature/cap) never
            # see their zero/degenerate paths — the round-5
            # divide-by-zero in temperature_mixture slipped this gate
            # precisely because planting empty text left n_chars stale
            "n_chars",
            F.length(F.coalesce(F.col("text"), F.lit(""))).cast("long"),
        )
        planted.coalesce(1).write.mode("overwrite").parquet(
            d + "/documents.parquet"
        )
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        emb_planted = emb.withColumn(
            "embedding",
            F.when(F.col("vec_id") == 30, F.lit(None).cast("array<float>"))
            .when(F.col("vec_id") == 31, F.array().cast("array<float>"))
            .when(F.col("vec_id") == 32, F.slice(F.col("embedding"), 1, 63))
            .otherwise(F.col("embedding")),
        )
        emb_planted.coalesce(1).write.mode("overwrite").parquet(
            d + "/embeddings.parquet"
        )
        for t in TABLES:
            if t not in ("documents", "embeddings"):
                p = f"/root/testdata/sf0.001/{t}.parquet"
                if os.path.exists(p):
                    os.symlink(p, f"{d}/{t}.parquet")
        con = duckdb.connect()
        for t in TABLES:
            p = f"{d}/{t}.parquet"
            if os.path.exists(p):
                glob = f"{p}/*.parquet" if os.path.isdir(p) and not os.path.islink(p) else p
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{glob}'")

        qs, oracles = E.queries(), E.oracle_sql()
        doc_queries = [
            n
            for n in qs
            if n in oracles
            and any(w in n for w in ("text", "corpus", "dedup", "web", "quality", "sim", "pii", "warc"))
        ]
        n_fail = 0
        for name in doc_queries:
            try:
                sdf = qs[name](spark, d)
                sn, sr = frame_signature(sdf.columns, [list(r) for r in sdf.collect()])
                # Arrow fetch, same rationale as check_oracle: the
                # typed canon must see HUGEINT-vs-int64 divergence
                dtbl = con.sql(oracles[name]).arrow()
                if hasattr(dtbl, "read_all"):
                    dtbl = dtbl.read_all()
                col_data = [
                    dtbl.column(i).to_pylist() for i in range(dtbl.num_columns)
                ]
                drows = [list(t) for t in zip(*col_data)] if col_data else []
                dn, dr = frame_signature(dtbl.schema.names, drows)
                ok = sn == dn and sr == dr
                msg = "" if ok else f"rows {len(sr)}/{len(dr)}"
            except Exception as e:  # noqa: BLE001 - report and continue
                ok, msg = False, f"error: {e}"
            if not ok:
                n_fail += 1
                print(f"FAIL  {name}: {msg}")
        print(f"{len(doc_queries) - n_fail}/{len(doc_queries)} empty-doc safe")
        return 1 if n_fail else 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
