"""Per-domain boilerplate line removal for web-corpus curation.

Web pages from one site share navigation chrome, cookie banners and
footers; left in the training text they become massively-duplicated
n-grams. The standard fix (RefinedWeb / CCNet-style) is frequency-
based: a LINE that appears in more than ``min_frac`` of a domain's
documents (and at least ``min_docs`` of them) is boilerplate for that
domain and is stripped from every document, preserving the order of
the surviving lines.

Not part of the reference surface; extends the documents-table
curation family (web.py, text.py, pii.py).

Design for 100 TB (shuffle budget spelled out):

1. ``posexplode(split(text, '\\n'))`` — map-side; rows = total lines.
2. Line census per (key, line_fp): ONE shuffle on the (key,
   fingerprint) pair — the fingerprint is ``xxhash64`` (or portable
   md5 for oracle parity), so the shuffle key is a fixed-width long,
   never the line text; counts are distinct-doc counts via the
   (key, fp, doc) pre-aggregate (partial aggregation absorbs
   within-doc repeats map-side).
3. Per-key doc totals ride the SAME census (a grouping-sets-free
   second aggregate over the tiny census table, not the data).
4. Verdict join: lines join the per-(key, fp) verdict table on the
   fixed-width pair. The verdict table is |distinct lines| ≤ |lines|;
   for typical corpora it is orders of magnitude smaller and
   broadcast-able — callers with a known-small verdict set can hint
   it; the default stays a shuffle join because "distinct lines per
   domain" is NOT bounded at 100 TB.
5. Reassembly: groupBy(doc) → ``array_sort(collect_list(struct(pos,
   line)))`` → ``array_join`` — one shuffle on the document id. Line
   order inside a document is restored from the explode position, so
   the operator is deterministic regardless of partitioning.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from demv_spark.functions.compat import portable_hash


def _lines(df: DataFrame, id_col: str, key_col: str, text_col: str) -> DataFrame:
    return df.select(
        id_col, key_col,
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("__pos", "__line"),
    )


def boilerplate_lines(
    df: DataFrame,
    key_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_frac: float = 0.5,
    min_docs: int = 2,
) -> DataFrame:
    """The boilerplate-line table: one row per (key, line) whose
    distinct-document frequency within the key meets BOTH thresholds.
    Returns (key, line, n_docs_with_line, n_docs, doc_frac) — the
    inspectable artifact (review the banner list before stripping).

    Exact distinct-doc counts: (key, line, doc) pre-aggregate, then
    count per (key, line) — two aggregates sharing one shuffle
    lineage, never a count-distinct over the raw explode. The
    per-key doc totals broadcast back onto the census (|keys| rows).
    """
    lines = _lines(df, id_col, key_col, text_col)
    per_doc = lines.select(key_col, "__line", id_col).distinct()
    census = per_doc.groupBy(key_col, "__line").agg(
        F.count(F.lit(1)).alias("n_docs_with_line")
    )
    totals = df.groupBy(key_col).agg(
        F.countDistinct(id_col).alias("n_docs")
    )
    return (
        census.join(F.broadcast(totals), key_col)
        .withColumn(
            "doc_frac", F.col("n_docs_with_line") / F.col("n_docs")
        )
        .filter(
            (F.col("doc_frac") >= F.lit(float(min_frac)))
            & (F.col("n_docs_with_line") >= F.lit(int(min_docs)))
        )
        .withColumnRenamed("__line", "line")
    )


def strip_boilerplate(
    df: DataFrame,
    key_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_frac: float = 0.5,
    min_docs: int = 2,
    out: str | None = None,
) -> DataFrame:
    """Rewrite ``text_col`` with each document's per-key boilerplate
    lines removed, preserving the order of surviving lines (empty
    string when every line was boilerplate). Returns the input
    columns with ``out`` (default ``<text_col>_clean``) appended —
    flag-not-filter composition: downstream decides what to do with
    now-empty documents.

    The verdict join runs on portable md5 fingerprints of (key,
    line) — fixed-width join keys (no fat line text through the
    shuffle) AND an engine-portable twin so the whole operator is
    value-hash oracle-able in any SQL engine.
    """
    out = out or f"{text_col}_clean"
    fp = lambda c: portable_hash(F.concat_ws("\x1f", F.col(key_col), c))  # noqa: E731
    lines = _lines(df, id_col, key_col, text_col).withColumn(
        "__fp", fp(F.col("__line"))
    )
    bp = boilerplate_lines(df, key_col, text_col, id_col, min_frac, min_docs)
    verdicts = bp.select(
        fp(F.col("line")).alias("__fp"), F.lit(1).alias("__bp")
    ).distinct()
    kept = (
        lines.join(verdicts, "__fp", "left_anti")
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__pos", "__line"))
                    ),
                    lambda s: s["__line"],
                ),
                "\n",
            ).alias(out)
        )
    )
    return df.join(kept, id_col, "left").withColumn(
        out, F.coalesce(F.col(out), F.lit(""))
    )
