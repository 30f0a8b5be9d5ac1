"""PII detection / redaction for web-corpus curation.

Standard pre-training hygiene (C4 / RefinedWeb / FineWeb all ship a
variant): find personally-identifying strings in document text, count
them per document and per corpus, and rewrite them to typed
placeholders before the text reaches a training shard.

Not part of the reference surface (giordanoDaloisio/demv has no text
pipeline); extends the documents-table family alongside
operators/text.py and operators/web.py.

Design for 100 TB: every operator here is MAP-ONLY — a chain of
``regexp_count`` / ``regexp_replace`` expressions inside whole-stage
codegen, no shuffle, no UDF; the census is one fused aggregate pass.
The regex subset is chosen to evaluate identically in Java regex
(Spark) and RE2 (DuckDB oracles): character classes, bounded
quantifiers and alternation only — no backreferences, no lookaround
(RE2 has neither), no ``\\d``/``\\w`` shorthands (unicode semantics
differ between engines; explicit ``[0-9]`` classes do not).

Redaction ORDER is load-bearing and fixed (see ``PII_TYPES``):
``credit_card`` and ``ssn`` run before ``phone`` because a 16-digit
card or a 9-digit SSN is also a syntactically-valid phone substring —
replacing phones first would corrupt the longer match and leak its
tail digits around the placeholder. ``email`` runs first: its
local-part may contain digit runs a later pattern would chew up.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# name -> (pattern, placeholder); INSERTION ORDER IS THE REDACTION
# ORDER (see module docstring). Patterns are Java-regex/RE2 common
# subset; each is anchored on non-alphanumeric boundaries where the
# match could otherwise extend into surrounding prose.
PII_TYPES: dict[str, tuple[str, str]] = {
    "email": (
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    "credit_card": (
        r"\b[0-9]{4}[ -][0-9]{4}[ -][0-9]{4}[ -][0-9]{4}\b",
        "<CARD>",
    ),
    "ssn": (
        r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
        "<SSN>",
    ),
    "ipv4": (
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "<IP>",
    ),
    "phone": (
        r"\+[0-9]{1,3}[ -][0-9]{2,4}[ -][0-9]{3,4}[ -][0-9]{3,4}\b",
        "<PHONE>",
    ),
}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def pii_counts(
    df: DataFrame,
    text_col: str = "text",
    types: Sequence[str] | None = None,
) -> DataFrame:
    """Per-document PII hit counts: one ``n_<type>`` int column per
    requested type plus ``n_pii`` (their sum). Map-only —
    ``regexp_count`` per type inside one projection.

    SQL twin per type: ``len(regexp_extract_all(text, pattern))``
    (DuckDB has no regexp_count; extract_all length is the same
    number because the patterns cannot produce empty matches)."""
    names = list(types) if types is not None else list(PII_TYPES)
    t = F.coalesce(_col(text_col), F.lit(""))
    out = df
    for name in names:
        pat, _ = PII_TYPES[name]
        out = out.withColumn(f"n_{name}", F.regexp_count(t, F.lit(pat)))
    total = None
    for name in names:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("n_pii", total.cast("int"))


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out: str | None = None,
    types: Sequence[str] | None = None,
) -> DataFrame:
    """Replace every PII match with its typed placeholder, applying
    the types in ``PII_TYPES``'s documented order (longer/more-
    specific first — see module docstring). Map-only: one chained
    ``regexp_replace`` projection, whole-stage codegen.

    SQL twin: the same ``regexp_replace(..., 'g')`` chain in the same
    order (DuckDB needs the explicit global flag; Spark's
    regexp_replace is global by default)."""
    names = list(types) if types is not None else list(PII_TYPES)
    # preserve the canonical order even if the caller passes a subset
    # in arbitrary order — order is a correctness property here
    names = [n for n in PII_TYPES if n in set(names)]
    c = F.coalesce(_col(text_col), F.lit(""))
    for name in names:
        pat, placeholder = PII_TYPES[name]
        c = F.regexp_replace(c, pat, placeholder)
    return df.withColumn(out or f"{text_col}_redacted", c)


def pii_census(
    df: DataFrame,
    text_col: str = "text",
    types: Sequence[str] | None = None,
) -> DataFrame:
    """Corpus-level PII report in ONE fused aggregate pass: per type
    the total hit count and the number of documents with ≥1 hit, plus
    ``n_docs`` / ``n_docs_any_pii`` overall — the dataset-card
    numbers a curation run records (and the alert threshold a
    streaming monitor would watch). Returns a single row."""
    names = list(types) if types is not None else list(PII_TYPES)
    counted = pii_counts(df, text_col, names)
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for name in names:
        c = F.col(f"n_{name}")
        aggs.append(F.sum(c).cast("long").alias(f"total_{name}"))
        aggs.append(F.sum((c > 0).cast("long")).alias(f"docs_{name}"))
    any_pii = F.col("n_pii") > 0
    aggs.append(F.sum(any_pii.cast("long")).alias("n_docs_any_pii"))
    return counted.agg(*aggs)
