"""Corpus-trained bigram surprisal scoring — the perplexity-style
quality filter of a pre-training pipeline (CCNet / CCNet-descendant
curation filters documents by language-model perplexity; this is the
engine-native, exactly-reproducible variant).

Not part of the reference surface; extends the documents-table
curation family (text.py, quality_clf.py, pii.py).

Why not float log-probs: a real per-token ``-log p`` sum goes through
``ln`` — which neither Java's ``Math.log`` nor libm guarantees
correctly rounded (both are "within 1 ulp"), so a value-hash oracle
across engines can flip on the last bit. Instead the model scores in
EXACT INTEGER BITS: the surprisal of bigram (a, b) is

    bits(a, b) = bitlen(C(a·)) − bitlen(C(a, b))

where ``C(a, b)`` is the corpus bigram count, ``C(a·)`` the prefix
(first-token) count, and ``bitlen(n) = length(bin(n))`` — the integer
⌊log2 n⌋+1, computable exactly in any engine (Spark ``bin``, DuckDB
``printf('%b', …)``). That is ``-log2 p`` quantized to whole bits —
the same ranking signal as perplexity at whole-bit resolution, and
every intermediate is an exact integer. Out-of-vocabulary bigrams
(below ``min_count``) cost a flat ``oov_bits``. The per-document mean
(``bits_per_bigram``) is one IEEE division of two exact integers —
correctly rounded, bit-identical across engines.

Design for 100 TB:

- Pass 1 (train): explode bigrams → count per bigram — ONE shuffle on
  the bigram string; prefix counts aggregate FROM the bigram-count
  table (|vocab²∩corpus| rows, far smaller than the corpus), not from
  a second corpus scan. ``min_count`` prunes the long tail so the
  model table is bounded (Zipf: doubling min_count roughly halves it).
- Pass 2 (score): explode again → join the model. The model table
  after pruning is typically broadcast-able (the default here, sized
  for curated vocabularies); pass ``broadcast_model=False`` to fall
  back to a shuffle join when the model outgrows executors.
- Train-on-self is the CCNet shape (score each doc against the corpus
  it lives in); ``score_bigram_surprisal`` also accepts a separately
  trained model DataFrame for the train-on-reference regime.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_TOKENS = (
    "filter(split(trim(lower(coalesce({c}, ''))), '\\\\s+'), t -> t != '')"
)


def _bigram_lines(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, bigram) rows: bigram i = token_i ⊔ ' ' ⊔ token_{i+1}."""
    # sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty — the
    # size<2 case must short-circuit to an empty array explicitly
    bigrams = F.expr(
        "CASE WHEN size({t}) < 2 THEN array() "
        "ELSE transform(sequence(1, size({t}) - 1), "
        "i -> concat_ws(' ', element_at({t}, i), element_at({t}, i + 1))) END"
        .format(t=_TOKENS.format(c=text_col))
    )
    return df.select(F.col(id_col), F.explode(bigrams).alias("bigram"))


def _bitlen(c: Column) -> Column:
    """Exact ⌊log2 n⌋+1 for positive n: length of the binary string.
    SQL twin: ``length(printf('%b', n))``."""
    return F.length(F.bin(c)).cast("int")


def train_bigram_model(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
) -> DataFrame:
    """The model table: (bigram, n_bigram, n_prefix, bits) for every
    corpus bigram with count ≥ ``min_count``. ``bits`` is the exact
    integer surprisal ``bitlen(n_prefix) − bitlen(n_bigram)`` ≥ 0.

    Prefix counts are TOTAL first-token continuations (computed from
    the unpruned bigram census BEFORE the min_count filter), so
    pruning the tail does not inflate surviving bigrams'
    probabilities. They are computed as a window over the census —
    ONE lineage, so the corpus is scanned exactly once for training
    (a prefix self-join would re-derive the whole census from a
    second scan); the window shuffle moves only the vocab-sized
    census, never corpus rows."""
    from pyspark.sql import Window

    lines = _bigram_lines(df, id_col, text_col)
    counts = lines.groupBy("bigram").agg(F.count(F.lit(1)).alias("n_bigram"))
    w = Window.partitionBy(F.substring_index(F.col("bigram"), " ", 1))
    return (
        counts.withColumn(
            "n_prefix", F.sum("n_bigram").over(w).cast("long")
        )
        .filter(F.col("n_bigram") >= F.lit(int(min_count)))
        .select(
            "bigram", "n_bigram", "n_prefix",
            (_bitlen(F.col("n_prefix")) - _bitlen(F.col("n_bigram"))).alias("bits"),
        )
    )


def score_bigram_surprisal(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_bits: int = 20,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document surprisal: (id, n_bigrams, n_oov, total_bits,
    bits_per_bigram). ``total_bits`` charges each in-model bigram its
    integer ``bits`` and each OOV bigram the flat ``oov_bits`` —
    everything integer-exact; ``bits_per_bigram`` is the single IEEE
    division total/n (NULL for documents with no bigrams, i.e. < 2
    tokens — flag-not-filter, downstream decides).

    High bits_per_bigram = improbable text under the corpus model
    (gibberish, OCR noise, wrong language); low = templated or
    boilerplate-heavy. The CCNet recipe keeps the middle band."""
    lines = _bigram_lines(df, id_col, text_col)
    m = model.select("bigram", "bits")
    if broadcast_model:
        m = F.broadcast(m)
    scored = lines.join(m, "bigram", "left").select(
        id_col,
        F.coalesce(F.col("bits"), F.lit(int(oov_bits))).alias("__bits"),
        F.col("bits").isNull().cast("long").alias("__oov"),
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("__oov").alias("n_oov"),
        F.sum("__bits").cast("long").alias("total_bits"),
    )
    out = df.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
        F.coalesce("total_bits", F.lit(0)).alias("total_bits"),
    )
    return out.withColumn(
        "bits_per_bigram",
        F.when(
            F.col("n_bigrams") > 0,
            F.col("total_bits").cast("double") / F.col("n_bigrams"),
        ),
    )


def bigram_surprisal_selfscore(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    oov_bits: int = 20,
    broadcast_model: bool = True,
) -> DataFrame:
    """Train-on-self convenience: CCNet's shape — the corpus is its
    own reference model."""
    model = train_bigram_model(df, text_col, id_col, min_count)
    return score_bigram_surprisal(
        df, model, text_col, id_col, oov_bits, broadcast_model
    )
