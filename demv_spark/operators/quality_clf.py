"""Linear text-classifier inference over hashed bag-of-words features.

The standard quality-classifier shape in pre-training pipelines
(fastText-style: GPT-3/LLaMA "quality filtering", CCNet): a linear
model over hashed unigram features, applied to every document of the
corpus. Training happens offline; the engine's job is *inference at
corpus scale*, which is what these operators implement — entirely in
JVM column expressions (no Python UDF), so a 100 TB scoring pass is
one map-only scan.

Not part of the reference surface (giordanoDaloisio/demv has no text
models); extends the documents-table pipeline family.

Two model representations:

- ``hashed_linear_score``: weights are a pure function of the token
  hash (a weight table indexed by a 60-bit portable hash, realized as
  ``hash % (2W+1) − W``). No table to ship, map-only, and — because
  every weight is an integer — the document score is an exact BIGINT,
  reproducible bit-for-bit on any engine (the oracle recomputes it
  from md5 in SQL). This is the deterministic stand-in for a learned
  dense hash-bucket table: the *plumbing* (tokenize → hash → weight →
  reduce) is the production shape, only the weight values are fake.
- ``linear_score_with_table``: weights live in a (bucket, weight)
  DataFrame — the learned-model shape. Tokens explode to hash buckets
  and broadcast-join the table; the only shuffle is the per-doc score
  aggregation.

Scoring uses the bag-of-words convention (duplicate tokens count
multiply), matching fastText's sum-of-embeddings input layer.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from demv_spark.functions.compat import portable_hash
from demv_spark.operators.text import tokens


def hashed_token_weight(
    token: Column, seed: str = "qclf1", w_range: int = 1000
) -> Column:
    """Integer weight in [−w_range, w_range] for a token: the portable
    60-bit md5 hash of ``seed + ':' + token`` reduced mod (2W+1).
    Positive hash ⇒ ``%`` agrees across engines.

    SQL twin:
    ``CAST(concat('0x', substr(md5('seed:' || token), 1, 15)) AS
    BIGINT) % (2*W+1) - W``.
    """
    h = portable_hash(F.concat(F.lit(seed + ":"), token))
    return h % F.lit(2 * w_range + 1) - F.lit(w_range)


def hashed_linear_score(
    df: DataFrame,
    text_col: str = "text",
    seed: str = "qclf1",
    w_range: int = 1000,
    bias: int = 0,
    score_out: str = "score",
    label_out: str = "label",
    nfeat_out: str = "n_feats",
) -> DataFrame:
    """Score every document with the hash-weight linear model and
    threshold at ``bias``: ``label = (Σ_t weight(t) ≥ bias)``.

    Map-only: the per-document reduce is a higher-order ``aggregate``
    over the token array — zero shuffles, zero joins, one scan. The
    score is an exact BIGINT (integer weights, |score| ≤ n_tokens·W),
    so the result value-hashes identically on any engine.

    Contract for empty/NULL text: a row is emitted with
    ``n_feats=0, score=0`` and ``label = (0 ≥ bias)`` — zero-token
    documents are scored, not dropped. (The explode-based
    :func:`linear_score_with_table` DROPS them instead; see its
    docstring when swapping forms in a curation pipeline.)
    """
    toks = F.filter(
        tokens(F.coalesce(F.col(text_col), F.lit(""))), lambda t: t != ""
    )
    score = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + hashed_token_weight(t, seed, w_range),
    )
    return (
        df.withColumn(nfeat_out, F.size(toks).cast("long"))
        .withColumn(score_out, score)
        .withColumn(label_out, (F.col(score_out) >= F.lit(bias)).cast("int"))
    )


def feature_bucket(
    token: Column, n_buckets: int, seed: str = "qclf1"
) -> Column:
    """Hashing-trick feature index in [0, n_buckets): portable hash
    mod table size. SQL twin mirrors :func:`hashed_token_weight`."""
    return portable_hash(F.concat(F.lit(seed + ":"), token)) % F.lit(n_buckets)


def linear_score_with_table(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    seed: str = "qclf1",
    bias: int = 0,
    score_out: str = "score",
    label_out: str = "label",
    nfeat_out: str = "n_feats",
) -> DataFrame:
    """Score documents against an explicit (bucket, weight) model
    table — the learned-model inference shape.

    Contract for empty/NULL text: the explode produces no rows, so
    zero-token documents are ABSENT from the output (unlike
    :func:`hashed_linear_score`, which emits score 0 for them) — left
    join against the source ids if every doc needs a verdict.

    Plan: explode tokens → bucket hash → **broadcast** join the weight
    table (models are ≤ millions of rows — always the small side) →
    one groupBy(id) sum. The single shuffle carries (id, weight)
    pairs; the corpus is scanned once. Tokens hashing to a bucket
    absent from the table contribute weight 0 (left join + coalesce),
    matching a sparse model.
    """
    w = weights.select(
        F.col(weights.columns[0]).cast("long").alias("__bucket"),
        F.col(weights.columns[1]).cast("long").alias("__weight"),
    )
    tok = df.select(
        F.col(id_col),
        F.explode(
            F.filter(
                tokens(F.coalesce(F.col(text_col), F.lit(""))),
                lambda t: t != "",
            )
        ).alias("__token"),
    ).withColumn("__bucket", feature_bucket(F.col("__token"), n_buckets, seed))
    scored = (
        tok.join(F.broadcast(w), "__bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias(nfeat_out),
            F.sum(F.coalesce(F.col("__weight"), F.lit(0))).alias(score_out),
        )
        .withColumn(label_out, (F.col(score_out) >= F.lit(bias)).cast("int"))
    )
    return scored
