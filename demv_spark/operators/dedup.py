"""Deduplication operators for training-data pipelines.

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard near-dup — the four
standard corpus-dedup families, each designed around ONE property:
no pairwise comparison ever touches the full corpus; candidates come
from an equi-join on a bucket key, which Spark executes as a plain
shuffled hash join (linear, skew-handled by AQE).

Engine-portable parts (exact dedup, n-gram Jaccard) carry DuckDB
oracles; hash-based sketches (minhash/simhash) use Spark's xxhash64,
which has no DuckDB twin — those are validated by invariant tests
(identical texts collide, perturbed texts mostly collide) and
rows-only driver checks.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from demv_spark.operators.text import fingerprint, tokens


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", normalized: bool = True
) -> DataFrame:
    """Keep one representative (min id) per distinct text.

    `normalized=True` dedups on the md5 fingerprint of
    whitespace/case-normalized text; False on raw text equality.
    Plan: one groupBy on the key — partial aggregation means the
    shuffle carries (key, min_id) only, not documents."""
    keyed = fingerprint(df, text_col, "__key") if normalized else df.withColumn(
        "__key", F.col(text_col)
    )
    keep = keyed.groupBy("__key").agg(F.min(id_col).alias(id_col))
    return (
        keyed.join(keep, ["__key", id_col], "inner")
        .drop("__key")
        .select(*df.columns)
    )


def shingles(col, n: int = 3):
    """Word n-gram (shingle) array: sliding windows over the token
    array via transform+slice — no UDF, no explode-then-regroup."""
    toks = tokens(col)
    k = F.size(toks) - F.lit(n - 1)
    idx = F.sequence(F.lit(1), F.greatest(k, F.lit(0)))
    return F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs by word-n-gram Jaccard similarity.

    Plan (no quadratic stage):
      1. explode distinct shingles per doc  (linear)
      2. optional document-frequency cap: shingles appearing in more
         than ``max_df`` docs are dropped BEFORE the join — a shingle
         shared by thousands of documents contributes O(df²) pair rows
         while carrying no discriminative signal; this is the lever
         that keeps the join linear on corpora with heavy shingle
         collision (at 100 TB it is mandatory, exactly like stopword
         removal in classic near-dup systems)
      3. self-equi-join on shingle → co-occurrence counts per pair
         (shuffled hash join on the shingle key; residual hot shingles
         are the skew risk — AQE skew-join splits them)
      4. |A∪B| = |A|+|B|−|A∩B| from per-doc distinct-shingle counts
         (over the same capped shingle set, so the metric is
         self-consistent)
      5. filter jaccard >= threshold
    Returns (id_a, id_b, inter, size_a, size_b, jaccard), id_a < id_b.
    """
    sh = (
        df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(shingles(text_col, n))).alias("sh"))
    )
    if max_df is not None:
        dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("__df"))
        sh = (
            sh.join(dfreq.filter(F.col("__df") <= max_df).select("sh"), "sh", "inner")
        )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    pairs = (
        sh.alias("a")
        .join(sh.alias("b"), (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        pairs.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "size_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "size_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter", "size_a", "size_b", "jaccard")
    )
    return out


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature per document: sig[i] = min over shingles of
    xxhash64(i, shingle). One explode + ONE groupBy with num_hashes
    fused min-aggregates — a single shuffle, whole-stage codegen,
    no UDF. Returns (id_col, sig array<long>)."""
    sh = df.select(
        F.col(id_col), F.explode(F.array_distinct(shingles(text_col, shingle_n))).alias("sh")
    )
    mins = sh.groupBy(id_col).agg(
        *[F.min(F.xxhash64(F.lit(i), F.col("sh"))).alias(f"h{i}") for i in range(num_hashes)]
    )
    return mins.select(
        id_col, F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH candidate pairs: split the signature into `bands` rows of
    num_hashes/bands, bucket = hash(band rows); docs sharing any
    band-bucket are candidates. Linear explode (bands per doc) + an
    equi-join on (band, bucket) — never all-pairs. Returns distinct
    (id_a, id_b) candidates with estimated jaccard (signature overlap)."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    banded = sig.select(
        id_col,
        "sig",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice("sig", b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("bucket"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select(id_col, "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
    )
    overlap = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    )
    return cand.select(
        "id_a", "id_b", (overlap / F.lit(num_hashes)).alias("est_jaccard")
    )


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """SimHash per document: per-bit majority vote over token hashes.

    One explode + ONE groupBy with `bits` fused conditional sums; the
    signature is reassembled with bit arithmetic — no UDF. Returns
    (id_col, simhash long)."""
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("t"))
    hashed = tok.withColumn("h", F.xxhash64("t"))
    votes = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    sig = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseXOR(term)
    return votes.select(id_col, sig.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit signature into
    `bands` chunks — any pair within hamming distance < bands shares
    at least one identical band (pigeonhole) — equi-join on (band,
    chunk), then exact hamming filter via bit_count(xor)."""
    sig = simhash(df, text_col, id_col)
    chunk = 64 // bands
    banded = sig.select(
        id_col,
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright(F.col("simhash"), b * chunk)
                    .bitwiseAND(F.lit((1 << chunk) - 1))
                    .alias("chunk"),
                )
                for b in range(bands)
            ])
        ).alias("bc"),
    ).select(id_col, "simhash", F.col("bc.band").alias("band"), F.col("bc.chunk").alias("chunk"))
    pairs = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
