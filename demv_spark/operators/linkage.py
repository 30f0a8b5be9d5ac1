"""Record linkage: blocked fuzzy joins for entity resolution.

Not part of the reference surface (it has no string matching) — a
BASELINE.json north-star extension: dedup/linkage across catalogs,
crawls, or user tables where keys are dirty (typos, truncation, OCR
noise) and exact equi-joins miss.

The scale contract is BLOCKING: an edit-distance join is O(|L|·|R|)
if expressed naively — at 100 TB that plan must never exist. Here
candidates are generated only inside equal-block buckets (one
equi-join shuffle), so total work is Σ_b |L_b|·|R_b|: quadratic per
block, linear in blocks. Pick the block key so blocks stay small
(first token, prefix+length band, soundex, …) and diagnose hot
blocks with ``functions.counting.heavy_hitters`` — a single hot
block is the skew hazard, split it with a finer key, never salt
(salting a similarity join drops cross-salt matches).
"""

from __future__ import annotations

from typing import Callable, Optional

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def first_token_block(c: Column) -> Column:
    """Default block key: first whitespace token of the lowercased,
    trimmed string — robust to suffix edits (truncation, appended
    junk), blind to first-word typos (use a char-prefix block for
    those). SQL twin: string_split_regex(lower(trim(x)), '\\s+')[1].
    """
    return F.split(F.lower(F.trim(c)), r"\s+")[0]


def blocked_fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 2,
    block_fn: Optional[Callable[[Column], Column]] = None,
    dist_col: str = "edit_dist",
) -> DataFrame:
    """Fuzzy equi-join: pairs (left row, right row) whose block keys
    match exactly AND levenshtein(left_col, right_col) <= max_dist.

    Left and right column names must be disjoint (alias before
    calling) — the output carries all of both plus ``dist_col``.
    NULL strings never match (their block key is NULL, which an
    equi-join drops — the SQL-standard behavior on both engines).

    Plan: one equi-join shuffle on the block key; the levenshtein
    filter runs inside the join's codegen stage (JVM, no UDF), so
    only true candidate pairs are ever materialized. Recall is
    bounded by the block function: a pair whose block keys differ is
    unreachable by construction — choose ``block_fn`` for the edit
    model you expect (default: ``first_token_block``).
    """
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0 (got {max_dist})")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"left/right column names must be disjoint (shared: {sorted(overlap)})"
        )
    reserved = {"__blk", dist_col}
    clobbered = reserved & (set(left.columns) | set(right.columns))
    if clobbered:
        raise ValueError(
            f"input columns collide with internals {sorted(clobbered)} — "
            f"rename them or pass a different dist_col"
        )
    bl = block_fn or first_token_block
    l = left.withColumn("__blk", bl(F.col(left_col)))
    r = right.withColumn("__blk", bl(F.col(right_col)))
    dist = F.levenshtein(F.col(left_col), F.col(right_col))
    return (
        l.join(r, "__blk")
        .withColumn(dist_col, dist.cast("int"))
        .filter(F.col(dist_col) <= F.lit(int(max_dist)))
        .drop("__blk")
    )


def best_match(
    pairs: DataFrame,
    right_key: str = "pk_b",
    left_key: str = "pk_a",
    dist_col: str = "edit_dist",
) -> DataFrame:
    """Golden-record resolution over fuzzy candidate pairs: for each
    right-side (dirty) record, keep exactly ONE best left-side match
    — smallest distance, ties broken by smallest left key, a total
    order so resolution is deterministic under any partitioning.

    One ``min_by`` aggregate keyed on the right key — NOT a rank
    window: partial (map-side) aggregation means the shuffle carries
    one candidate struct per (partition, right key), and no per-key
    sort ever materializes. Composes with ``blocked_fuzzy_join``:
    block → match → resolve is the full linkage pipeline.

    Output: one row per distinct right key, carrying every pair
    column of the winning candidate.

    Contract: ``left_key`` must identify a unique left record (true
    for any ``blocked_fuzzy_join`` output — blocking emits one key
    per row, so a (left, right) pair occurs at most once). If the
    input carries duplicate (left_key, right_key) rows with
    different payloads, the tie among those payloads is undefined.
    """
    for c in (right_key, left_key, dist_col):
        if c not in pairs.columns:
            raise ValueError(f"column {c!r} not in pairs ({pairs.columns})")
    carry = [c for c in pairs.columns if c != right_key]
    order = F.struct(F.col(dist_col), F.col(left_key))
    agg = pairs.groupBy(right_key).agg(
        F.min_by(F.struct(*carry), order).alias("__best")
    )
    return agg.select(
        right_key, *[F.col(f"__best.{c}").alias(c) for c in carry]
    )


# ------------------------------------------------------------ Soundex

_SOUNDEX_CLASSES = [
    ("[BFPV]", "1"), ("[CGJKQSXZ]", "2"), ("[DT]", "3"),
    ("L", "4"), ("[MN]", "5"), ("R", "6"),
    ("[AEIOUY]", "7"), ("[HW]", "8"),
]


def soundex_code(c: Column) -> Column:
    """American Soundex (the NARA rules) as a pure regexp chain — the
    classic record-linkage BLOCKING key (names that sound alike share
    a code, so the fuzzy join compares within blocks instead of all
    pairs).

    Why not ``F.soundex``: the oracle must recompute the code, and
    this chain is deliberately RE2-safe (no lookaheads, no
    backreferences) so the IDENTICAL regexps run in DuckDB — parity
    with Spark's builtin is pinned by
    tests/test_linkage.py::test_soundex_matches_spark_builtin on the
    canonical NARA examples and a real word corpus.

    Mechanics (bug-for-bug with the builtin, empirically probed):
    a non-letter FIRST character returns the input unchanged; H/W
    vanish from the tail (transparency — same-coded letters across
    H/W merge); every OTHER non-letter becomes the same run-breaking
    marker as a vowel (punctuation/digit-separated repeats code
    twice: 'B-B' → B100, unlike NARA-strip implementations that give
    B000 — hyphenated surnames are prime linkage input); letters map
    to digit classes, runs collapse per digit, the first letter's own
    run drops (the Pfister rule), break markers delete AFTER
    collapsing (the Tymczak rule), pad/truncate to letter+3."""
    s = F.upper(c)
    first = F.substring(s, 1, 1)
    tail = F.regexp_replace(s.substr(F.lit(2), F.length(s)), "[HW]", "")
    # non-letters (incl. digits, which collide with the code
    # alphabet) become '~' BEFORE class mapping, then join the vowel
    # marker: they break runs and emit nothing
    d = F.regexp_replace(F.concat(first, tail), "[^A-Z]", "~")
    for pat, rep in _SOUNDEX_CLASSES:
        d = F.regexp_replace(d, pat, rep)
    d = F.regexp_replace(d, "~", "7")
    for digit in "12345678":
        d = F.regexp_replace(d, digit + "+", digit)
    d = d.substr(F.lit(2), F.length(d))
    d = F.regexp_replace(d, "7", "")
    code = F.concat(first, F.rpad(F.substring(d, 1, 3), 3, "0"))
    return F.when(first.rlike("^[A-Z]$"), code).otherwise(c)


def soundex_sql(expr: str) -> str:
    """The SAME chain rendered for DuckDB (generated from the same
    class table, so the two cannot drift)."""
    s = f"upper({expr})"
    inner = (
        f"regexp_replace(substr({s}, 1, 1) || "
        f"regexp_replace(substr({s}, 2), '[HW]', '', 'g'), "
        f"'[^A-Z]', '~', 'g')"
    )
    d = inner
    for pat, rep in _SOUNDEX_CLASSES:
        d = f"regexp_replace({d}, '{pat}', '{rep}', 'g')"
    d = f"regexp_replace({d}, '~', '7', 'g')"
    for digit in "12345678":
        d = f"regexp_replace({d}, '{digit}+', '{digit}', 'g')"
    d = f"regexp_replace(substr({d}, 2), '7', '', 'g')"
    return (
        f"CASE WHEN regexp_matches(substr({s}, 1, 1), '^[A-Z]$') "
        f"THEN substr({s}, 1, 1) || rpad(substr({d}, 1, 3), 3, '0') "
        f"ELSE {expr} END"
    )
