"""Text-analysis operators for large-scale training-data pipelines.

Not part of the reference surface (it has no string analytics) — these
are the BASELINE.json north-star extensions: language-ID, quality
scoring, token counting, document fingerprinting over a `documents`
table (doc_id, text, ...).

All pure column expressions (no UDFs): tokenization is a regex split,
counts are array ops, the fingerprint is md5 over a normalized form —
every operator renders to DuckDB SQL for the oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# tiny per-language stopword marker sets for the n-gram/stopword
# heuristic (public common stopwords)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "que", "des"],
    "es": ["el", "la", "los", "que", "es", "una", "para", "con"],
}

# whitespace tokenization — same regex class semantics in Spark (Java
# regex) and DuckDB (RE2): double-escaped for the Java string layer
_WS = r"\s+"


def tokens(col: Column | str) -> Column:
    """Whitespace token array of lowercased text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(F.lower(c)), _WS)


def token_count(df: DataFrame, text_col: str = "text", out: str = "n_tokens") -> DataFrame:
    """Whitespace token count. SQL: len(string_split_regex(trim(lower(text)), '\\s+'))."""
    return df.withColumn(out, F.size(tokens(text_col)))


def bpe_token_estimate(
    df: DataFrame, text_col: str = "text", out: str = "n_bpe_est"
) -> DataFrame:
    """BPE-ish subword token estimate: alpha runs count ~1 token per
    4 chars (ceil), digit runs 1 per digit-pair, other non-space chars
    1 each. A cheap deterministic proxy for tokenizer budgeting.

    Expressed as pure length arithmetic so it is engine-portable:
    n_alpha/4 rounded up per run is approximated by
    ceil(total_alpha_chars/4) + punct + ceil(digits/2)."""
    alpha = F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
    digit = F.length(F.regexp_replace(F.col(text_col), r"[^0-9]", ""))
    other = F.length(F.regexp_replace(F.col(text_col), r"[A-Za-z0-9\s]", ""))
    est = F.ceil(alpha / F.lit(4.0)) + F.ceil(digit / F.lit(2.0)) + other
    return df.withColumn(out, est.cast("long"))


def quality_score(df: DataFrame, text_col: str = "text", out: str = "quality") -> DataFrame:
    """Heuristic document quality in [0,1] from length, punctuation
    density, mean word length, and whitespace ratio — the standard
    pre-training corpus filters, all engine-portable arithmetic:

        len_score   = least(1, n_chars / 500)
        punct_ratio = punct_chars / n_chars
        space_ratio = spaces / n_chars
        word_len    = n_chars_alpha / n_tokens  (clamped into [0,1]
                      by |word_len - 5| / 5 distance from typical)

        quality = 0.4*len_score + 0.3*(1 - least(1, punct_ratio*10))
                  + 0.3*(1 - least(1, abs(alpha/tokens - 5)/5))
    """
    n_chars = F.length(F.col(text_col)).cast("double")
    punct = F.length(F.regexp_replace(F.col(text_col), r"[A-Za-z0-9\s]", "")).cast("double")
    alpha = F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", "")).cast("double")
    n_tok = F.size(tokens(text_col)).cast("double")
    len_score = F.least(F.lit(1.0), n_chars / F.lit(500.0))
    punct_score = F.lit(1.0) - F.least(F.lit(1.0), punct / n_chars * F.lit(10.0))
    wordlen_score = F.lit(1.0) - F.least(
        F.lit(1.0), F.abs(alpha / n_tok - F.lit(5.0)) / F.lit(5.0)
    )
    q = F.lit(0.4) * len_score + F.lit(0.3) * punct_score + F.lit(0.3) * wordlen_score
    return df.withColumn(out, F.round(q, 6))


def lang_id(
    df: DataFrame,
    text_col: str = "text",
    out: str = "lang_pred",
    markers: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Stopword-marker language ID: per language, count tokens hitting
    that language's marker set; argmax wins, ties broken by language
    code order, no hits → 'und'. One pass, pure array expressions.

    SQL rendering: len(list_filter(tokens, t -> t IN (...))) per
    language + a greatest/CASE argmax."""
    markers = markers or LANG_MARKERS
    toks = tokens(text_col)
    hit_cols = {}
    for lang, words in markers.items():
        arr = F.array(*[F.lit(w) for w in words])
        hit_cols[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    langs = sorted(markers)
    best = None
    for lang in langs:
        score = hit_cols[lang]
        if best is None:
            best = (F.lit(lang), score)
        else:
            prev_lang, prev_score = best
            better = score > prev_score
            best = (
                F.when(better, F.lit(lang)).otherwise(prev_lang),
                F.when(better, score).otherwise(prev_score),
            )
    pred = F.when(best[1] > 0, best[0]).otherwise(F.lit("und"))
    return df.withColumn(out, pred)


def fingerprint(df: DataFrame, text_col: str = "text", out: str = "fp") -> DataFrame:
    """Deterministic content fingerprint: md5 of the whitespace- and
    case-normalized text. Identical in Spark (F.md5) and DuckDB (md5)
    → exact-dedup key that survives formatting noise.
    SQL: md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), _WS, " ")
    return df.withColumn(out, F.md5(norm.cast("binary")))
