"""Probabilistic membership/frequency structures with EXACT contracts.

Count-min sketches and Bloom filters are the workhorse summaries of a
100 TB pipeline (pre-join pruning, hot-key detection, cheap frequency
service over a corpus too big to index exactly). Their ESTIMATES are
approximate, but given fixed hash functions their state is a pure
integer function of the data — so, like the MinHash/SimHash portable
twins (operators/dedup.py), everything here value-hashes against a
SQL oracle: counters are exact BIGINT sums, filter words exact
bit-ORs, estimates exact MINs. Hashing is the engine-portable
md5-based ``portable_hash`` so the same structure can be built or
probed by any SQL engine.

Scale shape: building either structure is ONE groupBy over
(row × depth/hashes) exploded hash coordinates — a bounded-key
shuffle (depth·width / n_words cells at most), map-side combined.
Probing joins the probe set's coordinates against the structure on
the cell key: candidate-sized, never corpus-sized. No driver state;
the sketch IS a DataFrame, so it unions/persists/broadcasts like any
table (merge two sketches = union + re-aggregate — the counter/word
algebra is associative).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from demv_spark.functions.compat import portable_hash

# 32-bit filter words: positions stay in [0, 31], so every word is a
# positive int64 in BOTH engines (position 63 would flip the sign bit
# — identical two's complement either way, but positive words remove
# the footgun entirely)
_WORD_BITS = 32


def _cm_bucket(key: Column, d: int, width: int, seed: int) -> Column:
    return F.pmod(
        portable_hash(
            F.concat_ws(":", F.lit(f"cm{seed}"), F.lit(str(d)), key.cast("string"))
        ),
        F.lit(int(width)),
    )


def countmin_counters(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 7,
    weight_col: "str | None" = None,
) -> DataFrame:
    """Build a count-min sketch: (d, bucket, counter) for every
    occupied cell — at most depth·width rows regardless of input
    size. ``weight_col`` accumulates a weight instead of row counts
    (token counts, bytes). NULL keys count like any value (they hash
    as the string rendering of NULL → the empty concat); estimates
    are upper bounds: counter ≥ true frequency, with the standard
    (ε=e/width, δ=e^-depth) guarantee."""
    key = F.col(key_col)
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    cells = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("d"),
                    _cm_bucket(key, d, width, seed).alias("bucket"),
                )
                for d in range(depth)
            ])
        ).alias("c"),
        w.alias("__w"),
    )
    return (
        cells.groupBy(F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
        .agg(F.sum("__w").alias("counter"))
    )


def countmin_estimate(
    counters: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 7,
) -> DataFrame:
    """Point-frequency estimates for every probe key: min over the
    depth counters at the key's cells (0 when a cell is empty — the
    sketch never saw anything hashing there). depth/width/seed must
    match the build. Join is on the (d, bucket) cell key —
    probe-sized — then one min per key."""
    key = F.col(key_col)
    pb = probes.select(
        key.alias("__key"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("d"),
                    _cm_bucket(key, d, width, seed).alias("bucket"),
                )
                for d in range(depth)
            ])
        ).alias("c"),
    ).select("__key", F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
    joined = pb.join(counters, ["d", "bucket"], "left")
    return (
        joined.groupBy(F.col("__key").alias(key_col))
        .agg(
            F.min(F.coalesce(F.col("counter"), F.lit(0)))
            .cast("long")
            .alias("est_count")
        )
    )


def _bloom_bit(key: Column, i: int, n_bits: int, seed: int) -> Column:
    return F.pmod(
        portable_hash(
            F.concat_ws(":", F.lit(f"bf{seed}"), F.lit(str(i)), key.cast("string"))
        ),
        F.lit(int(n_bits)),
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Build a Bloom filter as (word_idx, word) rows — 32-bit words
    OR-ed from every key's ``n_hashes`` bit positions; at most
    n_bits/32 rows. Being a DataFrame, the filter broadcasts into a
    probe join (the classic pre-shuffle semi-join prune) and two
    filters over the same config merge by union + re-OR.

    The (n_bits, n_hashes, seed) config is stamped into the ``word``
    column's metadata so a probe with MISMATCHED parameters — which
    silently tests the wrong bit positions and can return false
    NEGATIVES — is rejected loudly in ``bloom_probe``/``bloom_prune``."""
    key = F.col(key_col)
    bits = df.select(
        F.explode(
            F.array(*[
                _bloom_bit(key, i, n_bits, seed) for i in range(n_hashes)
            ])
        ).alias("bit")
    )
    return (
        bits.select(
            F.expr(f"bit div {_WORD_BITS}").alias("word_idx"),
            # shiftleft's bit-count arg must be column-valued here →
            # SQL form (the python helper takes a literal int only)
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"CAST(bit % {_WORD_BITS} AS INT))"
            ).alias("__m"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__m").alias(
            "word",
            metadata={"bloom_n_bits": n_bits, "bloom_n_hashes": n_hashes,
                      "bloom_seed": seed},
        ))
    )


def _check_bloom_config(bloom: DataFrame, n_bits: int, n_hashes: int,
                        seed: int, caller: str) -> None:
    """Raise if the filter was built with different parameters than
    the probe is using — a mismatch probes the wrong bit positions and
    produces false NEGATIVES, the one failure mode a Bloom filter is
    supposed to exclude. Filters from older builds (or unioned/merged
    frames that dropped the metadata) skip the check."""
    try:
        meta = bloom.schema["word"].metadata or {}
    except (KeyError, TypeError):
        return
    built = (meta.get("bloom_n_bits"), meta.get("bloom_n_hashes"),
             meta.get("bloom_seed"))
    if built[0] is None:
        return
    if built != (n_bits, n_hashes, seed):
        raise ValueError(
            f"{caller}: filter was built with (n_bits, n_hashes, seed)"
            f"={built} but probed with {(n_bits, n_hashes, seed)} — "
            "mismatched configs test the wrong bit positions and "
            "produce false negatives"
        )


def bloom_probe(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Membership test for every probe key: ``might_contain`` is true
    iff ALL the key's bits are set (no false negatives; false
    positives at the standard (1−e^{−kn/m})^k rate). Probe bits join
    the word table on word_idx (probe-sized; broadcast the filter —
    it is ≤ n_bits/32 rows); one all-bits-set aggregate per key.
    Raises if the filter's stamped config disagrees with the probe's
    (n_bits, n_hashes, seed)."""
    _check_bloom_config(bloom, n_bits, n_hashes, seed, "bloom_probe")
    key = F.col(key_col)
    pb = probes.select(
        key.alias("__key"),
        F.explode(
            F.array(*[
                _bloom_bit(key, i, n_bits, seed) for i in range(n_hashes)
            ])
        ).alias("bit"),
    ).select(
        "__key",
        F.expr(f"bit div {_WORD_BITS}").alias("word_idx"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), "
            f"CAST(bit % {_WORD_BITS} AS INT))"
        ).alias("__m"),
    )
    joined = pb.join(F.broadcast(bloom), "word_idx", "left")
    hit = (F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("__m")) == F.col("__m"))
    return (
        joined.groupBy(F.col("__key").alias(key_col))
        .agg(F.min(hit.cast("int")).cast("boolean").alias("might_contain"))
    )


# portable_hash is 15 hex chars of md5 = a uniform 60-bit value
_HASH_SPACE = 1 << 60


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: "list[str] | None" = None,
    k: int = 64,
    seed: int = 7,
) -> DataFrame:
    """K-minimum-values distinct-count sketch with an EXACT contract
    (unlike HLL, whose register packing is engine-specific): the
    state is the k smallest portable-hash values of the key domain
    (per group), and the estimate is the classic KMV
    ``(k−1)·SPACE div h_k`` — an exact integer division of exact
    integers, so the whole row value-hashes cross-engine while the
    METHOD stays approximate. Groups with fewer than k distinct
    hashes report their exact distinct count instead (the sketch has
    seen the whole domain). Returns (group…, n_kept, kth_hash,
    est_distinct); merging two sketches = union the hash sets and
    re-take the bottom k (associative, like the other sketches here).

    Scale shape: one distinct over (group, hash) — fixed-width shuffle
    keys — then a bottom-k rank window per group (state k rows/group)
    and a 1-row-per-group aggregate. NULL keys hash like any value."""
    groups = list(group_cols or [])
    key = F.col(key_col)
    h = portable_hash(
        F.concat_ws(":", F.lit(f"kmv{seed}"), key.cast("string"))
    )
    hashed = df.select(*groups, h.alias("__h")).distinct()
    if groups:
        w = Window.partitionBy(*groups).orderBy(F.col("__h").asc())
    else:
        w = Window.partitionBy(F.lit(1)).orderBy(F.col("__h").asc())
    kept = hashed.withColumn("__rk", F.row_number().over(w)).filter(
        F.col("__rk") <= k
    )
    agg_keys = groups if groups else []
    out = kept.groupBy(*agg_keys).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("__h").alias("kth_hash"),
    )
    # (k−1)·2^60 exceeds int64 for k > 8 — the product runs in
    # DECIMAL(38,0) with ONE integer division (the fixed-point
    # cookbook; DuckDB's HUGEINT arithmetic mirrors it exactly)
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("long")
    ).otherwise(
        F.expr(
            f"CAST((CAST({k - 1} AS DECIMAL(38,0)) * {_HASH_SPACE}) "
            f"div kth_hash AS BIGINT)"
        )
    )
    return out.withColumn("est_distinct", est.cast("long"))


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: "list[str] | None" = None,
    p: int = 8,
    seed: int = 7,
) -> DataFrame:
    """HyperLogLog register state with an EXACT contract: registers
    as ROWS (group…, bucket, max_rho) instead of an engine-specific
    packed blob, so the state value-hashes cross-engine like the
    other sketches here. bucket = the hash's top ``p`` bits; rho =
    leading-zero count of the remaining 60−p bits + 1, computed as
    ``61 − p − length(bin(suffix))`` (bin() renders minimal-length in
    both Spark and DuckDB — no float log2 near power-of-two
    boundaries). At most m = 2^p rows per group; merging two sketches
    = union + re-max (associative). One bounded-key groupBy; NULL
    keys hash like any value. p is bounded to [4, 24] (HLL needs
    m ≥ 16 registers; above 24 the 60-bit suffix gets too short for
    rho to discriminate)."""
    groups = list(group_cols or [])
    if not 4 <= p <= 24:
        raise ValueError(f"hll_registers: p must be in [4, 24], got {p}")
    key = F.col(key_col)
    h = portable_hash(
        F.concat_ws(":", F.lit(f"hll{seed}"), key.cast("string"))
    )
    suffix_bits = 60 - p
    bucket = F.expr(f"__h div {1 << suffix_bits}")
    suffix = F.pmod(F.col("__h"), F.lit(1 << suffix_bits))
    rho = F.when(suffix == 0, F.lit(suffix_bits + 1)).otherwise(
        F.lit(61 - p) - F.length(F.bin(suffix))
    )
    hashed = df.select(*groups, h.alias("__h"))
    return (
        hashed.select(
            *groups, bucket.alias("bucket"), rho.cast("int").alias("__rho")
        )
        .groupBy(*groups, "bucket")
        .agg(F.max("__rho").alias("max_rho"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: "list[str] | None" = None,
    p: int = 8,
) -> DataFrame:
    """Raw HyperLogLog estimate from ``hll_registers`` state as ONE
    exact integer division: E = α_m·m²/Σ2^{−M_j} with α_m =
    0.7213/(1 + 1.079/m) kept RATIONAL (7213·1000m / 10000(1000m+1079))
    and the indicator sum cleared of its denominator —
    Σ2^{−M_j} = (Σ2^{R−M_j}) / 2^R with R = 61−p the max rho, absent
    registers contributing 2^R each — so

        est_raw = ⌊7213·1000·m³·2^R / (10000·(1000m+1079)·denom)⌋

    runs in DECIMAL(38,0) (DuckDB: HUGEINT) and value-hashes while
    the METHOD stays approximate (same fixed-point playbook as
    ``kmv_distinct``). Emits (group…, n_registers, n_zero_registers,
    denom, est_raw): the small/large-range bias corrections (linear
    counting when est_raw ≤ 2.5m and zeros exist) involve ln and are
    a downstream scalar decision over these exact components — the
    sketch state and raw estimator are the cross-engine contract.

    The asymptotic α_m above is only valid for m ≥ 128 (p ≥ 7); for
    p ∈ {4,5,6} the paper's tabulated constants α_16 = 0.673,
    α_32 = 0.697, α_64 = 0.709 apply (kept rational as a/1000), and
    p < 4 is rejected — HLL is undefined below 16 registers."""
    groups = list(group_cols or [])
    if not 4 <= p <= 24:
        raise ValueError(f"hll_estimate: p must be in [4, 24], got {p}")
    m = 1 << p
    big_r = 61 - p
    out = registers.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("long").alias("n_registers"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({big_r} - max_rho AS INT))")
        ).cast("long").alias("__present"),
    )
    denom = (
        F.col("__present")
        + (F.lit(m) - F.col("n_registers")) * F.lit(1 << big_r)
    ).cast("long")
    out = out.withColumn("denom", denom).drop("__present")
    if p < 7:
        # Flajolet et al. 2007 tabulated constants for small m
        a_num = {16: 673, 32: 697, 64: 709}[m]
        num = a_num * (m ** 2) * (1 << big_r)
        alpha_den = 1000
    else:
        num = 7213 * 1000 * (m ** 3) * (1 << big_r)
        alpha_den = 10000 * (1000 * m + 1079)
    est = F.expr(
        f"CAST((CAST({num} AS DECIMAL(38,0))) "
        f"div (CAST({alpha_den} AS DECIMAL(38,0)) * denom) AS BIGINT)"
    )
    return (
        out.withColumn("n_zero_registers", (F.lit(m) - F.col("n_registers")).cast("long"))
        .withColumn("est_raw", est)
        .select(*groups, "n_registers", "n_zero_registers", "denom", "est_raw")
    )


def bloom_prune(
    fact: DataFrame,
    bloom: DataFrame,
    key_col: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 4,
    seed: int = 7,
    broadcast_verdicts: bool = False,
) -> DataFrame:
    """Bloom semi-join pruning — THE pre-shuffle trick at 100 TB:
    filter a huge fact table by a Bloom filter built on the dim side's
    keys BEFORE the real join's shuffle, so non-matching fact rows
    (usually the overwhelming majority) never leave their input
    partitions. No false negatives: every matching row survives;
    false positives pass at the filter's standard rate and are
    eliminated by the real join downstream.

    Plan: the fact's DISTINCT keys probe the broadcast word table
    (``bloom_probe``); the membership verdicts then semi-join back
    into the fact on the key. The verdict table is |distinct
    surviving fact keys| rows — it scales with the FACT side, not the
    dim side, so it is NOT force-broadcast by default: AQE picks a
    broadcast semi-join on its own whenever the survivor set is
    actually small (the common case), and falls back to a shuffled
    keys-only semi-join when it isn't. Pass
    ``broadcast_verdicts=True`` only when you can bound the survivor
    count yourself (dim keys + FP·|fact keys| well under the
    broadcast ceiling) and need the fact-never-shuffled plan pinned
    statically. Bits are portable-hash-derived, so WHICH rows pass is a pure
    function of the data — the pruned set value-hashes cross-engine
    (false positives included, deterministically).

    NULL-keyed fact rows are DROPPED, deliberately: the prune exists
    to feed an equi-join, and NULL never equi-joins — keeping such
    rows (the flag-not-filter default elsewhere) would only hand the
    downstream join rows it must discard, and would diverge from the
    SQL oracle's plain-equality semantics."""
    verdicts = bloom_probe(
        bloom,
        fact.select(F.col(key_col)).filter(F.col(key_col).isNotNull()).distinct(),
        key_col,
        n_bits=n_bits,
        n_hashes=n_hashes,
        seed=seed,
    ).filter(F.col("might_contain"))
    keys = verdicts.select(key_col)
    if broadcast_verdicts:
        keys = F.broadcast(keys)
    return fact.join(keys, [key_col], "left_semi")
