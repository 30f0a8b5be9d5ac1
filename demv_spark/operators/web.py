"""URL / domain filtering for web-corpus curation.

Standard first-stage filters in a pre-training data pipeline
(C4 / RefinedWeb / FineWeb style): extract the registered host from a
document URL, then drop documents whose host matches a blocklist of
domains, where a blocked domain also blocks every subdomain
(``example.com`` blocks ``cdn.example.com`` but NOT
``notexample.com`` — matching is on dot boundaries only).

Not part of the reference surface (giordanoDaloisio/demv has no web
analytics); these extend the documents-table pipeline family.

Two shapes, both JVM-only (no Python UDFs):

- ``flag_blocked_domains``: the blocklist is a driver-side literal
  list (the common case — curated blocklists are 10³–10⁶ entries and
  broadcast-able). Map-only: one scan, zero shuffles; the suffix test
  is ``exists(suffixes(host), s -> s IN set)`` rendered as an
  ``arrays_overlap`` against a literal array.
- ``block_by_domain_join``: the blocklist is itself a DataFrame
  (e.g. produced by another job). Dot-suffix explode on the corpus
  side → broadcast semi-join → left-anti on matched ids. Corpus is
  scanned twice but never shuffled on a fat key; the exploded side
  carries (id, suffix) only.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# host = authority portion after '://', up to the first '/', ':', '?',
# or '#'. Same regex semantics in Java regex and RE2 (DuckDB), so the
# oracle can recompute it verbatim.
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)"


def extract_domain(url: Column | str, out: str | None = None) -> Column:
    """Lower-cased host part of a URL (empty string if no scheme).

    SQL twin: ``lower(regexp_extract(url, '...', 1))``.
    """
    c = F.col(url) if isinstance(url, str) else url
    col = F.lower(F.regexp_extract(c, _HOST_RE, 1))
    return col.alias(out) if out else col


def domain_suffixes(domain: Column | str) -> Column:
    """All dot-boundary suffixes of a host, most-specific first:
    ``cdn.a.com`` → ``[cdn.a.com, a.com, com]``. Pure array ops
    (split / sequence / slice / array_join) — no UDF, engine-portable.
    """
    c = F.col(domain) if isinstance(domain, str) else domain
    parts = F.split(c, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n - i + 1), "."),
    )


def flag_blocked_domains(
    df: DataFrame,
    blocked: Sequence[str],
    url_col: str = "url",
    domain_out: str = "domain",
    flag_out: str = "blocked",
) -> DataFrame:
    """Annotate each row with its host and a 0/1 blocklist flag.

    Map-only (single scan, no shuffle, no join): the blocklist rides
    into the plan as one literal array and the dot-suffix test is
    ``arrays_overlap(suffixes(host), blocklist)``. The production
    shape for blocklists up to ~10⁶ entries; use
    :func:`block_by_domain_join` beyond that.
    """
    blocked_arr = F.array(*[F.lit(b.lower()) for b in blocked])
    dom = extract_domain(url_col)
    return df.withColumn(domain_out, dom).withColumn(
        flag_out,
        F.arrays_overlap(domain_suffixes(F.col(domain_out)), blocked_arr)
        .cast("int"),
    )


def block_by_domain_join(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    domain_col: str = "domain",
) -> DataFrame:
    """Drop rows whose host (or any parent domain) appears in
    ``blocklist`` (a 1-column DataFrame of lower-case domains).

    Plan shape: corpus → (id, exploded suffix) → broadcast semi-join
    against the blocklist → distinct blocked ids → left-anti back on
    the corpus. The only shuffle is the distinct over blocked ids,
    which is bounded by the number of *blocked* documents, not the
    corpus size.
    """
    bl = blocklist.select(
        F.lower(F.col(blocklist.columns[0])).alias("__blocked_domain")
    )
    suffixed = df.select(
        F.col(id_col),
        F.explode(domain_suffixes(extract_domain(url_col))).alias("__sfx"),
    )
    blocked_ids = (
        suffixed.join(
            F.broadcast(bl), suffixed["__sfx"] == bl["__blocked_domain"], "left_semi"
        )
        .select(id_col)
        .distinct()
    )
    return df.join(blocked_ids, id_col, "left_anti")


# tracking parameters stripped by canonicalize_url: match is on the
# param NAME (before '='), alternation + anchors only — the same
# pattern compiles identically under Java regex and RE2/DuckDB
_TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid|igshid|ref_src)(=.*)?$"
_PORT_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/:?#]+:([0-9]+)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"^[^#?]*\?([^#]*)"
_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"


def canonicalize_url(url: Column | str, out: str | None = None) -> Column:
    """Canonical URL for dedup/grouping keys: lower-cased scheme and
    host, default ports dropped (http:80, https:443), tracking query
    parameters removed (utm_*, fbclid, gclid, …) with the remaining
    params in original order, trailing path slashes collapsed (bare
    host → '/'), fragment dropped. Path and query VALUE case is
    preserved (case-significant on most servers).

    Pure regexp/array algebra — map-only, no UDF, and every regex is
    in the Java∩RE2 common subset so a SQL oracle recomputes the
    canonical form verbatim. Rows without a '://' scheme pass through
    lower-case-trimmed (opaque keys stay usable as group keys).
    """
    c = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(c, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(c, _HOST_RE, 1))
    port = F.regexp_extract(c, _PORT_RE, 1)
    raw_path = F.regexp_extract(c, _PATH_RE, 1)
    query = F.regexp_extract(c, _QUERY_RE, 1)

    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))

    stripped = F.regexp_replace(raw_path, r"/+$", "")
    path_part = F.when(stripped == "", F.lit("/")).otherwise(stripped)

    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    )
    query_part = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))

    canon = F.when(host == "", F.lower(F.trim(c))).otherwise(
        F.concat(scheme, F.lit("://"), host, port_part, path_part, query_part)
    )
    return canon.alias(out) if out else canon


# html_to_text regex chain — Java∩RE2 common subset, applied in
# order. (?is) = case-insensitive + dotall; non-greedy .*? bounds
# each block. Comments/script/style vanish with their contents;
# every other tag becomes a space (block boundaries must not glue
# words); a small fixed entity set decodes via plain replace.
HTML_STRIP_PATTERNS: "list[tuple[str, str]]" = [
    (r"(?is)<!--.*?-->", " "),
    (r"(?is)<script\b.*?</script\s*>", " "),
    (r"(?is)<style\b.*?</style\s*>", " "),
    (r"(?s)<[^>]*>", " "),
]
HTML_ENTITIES: "list[tuple[str, str]]" = [
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"),  # &amp; LAST
]


def html_to_text(html: Column | str, out: str | None = None) -> Column:
    """Visible text of an HTML document: comments, script and style
    blocks removed WITH their contents, every remaining tag replaced
    by a space, the common entity set decoded (&amp; last, so
    '&amp;lt;' correctly yields '&lt;', not '<'), whitespace
    collapsed and trimmed. The handoff from WARC response bodies
    (``sources.warc.response_texts``) into the text operators —
    intentionally a fast curation-grade stripper, not an HTML5 tree
    parser: malformed nesting degrades to extra spaces, never to an
    error.

    Map-only projection (regexp_replace + replace chain) inside
    whole-stage codegen; every regex is in the Java∩RE2 common
    subset, so the SQL twin is the same chain with
    ``regexp_replace(..., 'gis')`` flags. NULL html → NULL out.
    """
    c = F.col(html) if isinstance(html, str) else html
    for pat, rep in HTML_STRIP_PATTERNS:
        c = F.regexp_replace(c, pat, rep)
    for ent, rep in HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c.alias(out) if out else c


def crawl_frontier(
    candidates: DataFrame,
    authority: DataFrame,
    domain_col: str = "domain",
    url_col: str = "url",
    rank_col: str = "rank_int",
    per_domain: int = 5,
    seed: int = 7,
) -> DataFrame:
    """Politeness-capped crawl frontier: keep at most ``per_domain``
    candidate URLs per domain (the crawl-budget/politeness rule every
    production crawler enforces), chosen by a DETERMINISTIC
    portable-hash priority (reproducible across engines, partitions
    and retries — the seeded-rank convention used by the samplers),
    and annotate each kept URL with its domain's authority score
    (e.g. ``graph.pagerank_integer`` ranks) so a scheduler can order
    domains globally.

    Plan: one window per domain over the CANDIDATE set only (the
    fetched corpus never enters), then one domain-keyed join of the
    per-domain survivor list against the authority table — survivors
    are ≤ per_domain·|domains| rows, authority is |nodes| rows; AQE
    picks the join strategy (neither side is forced broadcast: at
    crawl scale BOTH can be large). Domains absent from the authority
    table score 0 — flag-not-filter, new domains stay crawlable."""
    from demv_spark.functions.compat import portable_hash

    from pyspark.sql import Window

    pri = portable_hash(
        F.concat_ws(":", F.lit(f"frontier{seed}"), F.col(url_col))
    )
    w = Window.partitionBy(domain_col).orderBy(
        pri.asc(), F.col(url_col).asc()
    )
    kept = (
        candidates.select(domain_col, url_col)
        .distinct()
        .withColumn("slot", F.row_number().over(w))
        .filter(F.col("slot") <= int(per_domain))
    )
    auth = authority.select(
        F.col("node").alias(domain_col),
        F.col(rank_col).alias("authority"),
    )
    return kept.join(auth, domain_col, "left").select(
        domain_col,
        url_col,
        F.col("slot").cast("int").alias("slot"),
        F.coalesce("authority", F.lit(0)).cast("long").alias("authority"),
    )


# robots.txt (RFC 9309) — crawl politeness as data. Parsing and URL
# permission checks are pure DataFrame algebra (split/posexplode/
# window/like), so both stages SQL-twin for the oracle and run
# JVM-side at any corpus scale.

_ROBOTS_KEYS = ("user-agent", "allow", "disallow")


def robots_rules(
    robots: DataFrame,
    domain_col: str = "domain",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """Parse robots.txt documents into a rules table:
    ``(domain, agent, group_id, rule, pattern, pattern_len)``.

    RFC 9309 group semantics: a group is one or more consecutive
    ``User-agent`` lines followed by its ``Allow``/``Disallow`` rules;
    a later ``User-agent`` line that directly follows rules STARTS a
    new group. Comments (``#`` to end of line) are stripped, keys are
    case-insensitive, values are trimmed, and empty-pattern rules are
    ignored (an empty ``Disallow:`` means unrestricted, per the RFC).

    Plan shape: one posexplode of lines (bounded by file size — real
    robots.txt is KBs), two windows PARTITIONED BY DOMAIN (lag for
    group starts, running sum for group ids) and one within-domain
    agents×rules join. Nothing global: at crawl scale this is
    embarrassingly domain-parallel."""
    from pyspark.sql import Window

    lines = robots.select(
        F.col(domain_col).alias("domain"),
        F.posexplode(F.split(F.coalesce(F.col(txt_col), F.lit("")), "\n")).alias(
            "pos", "line"
        ),
    )
    cleaned = lines.select(
        "domain",
        "pos",
        F.trim(F.regexp_replace("line", r"#.*$", "")).alias("line"),
    )
    kv = cleaned.select(
        "domain",
        "pos",
        F.lower(F.trim(F.regexp_extract("line", r"^([^:]+):", 1))).alias("key"),
        F.trim(F.regexp_extract("line", r"^[^:]+:(.*)$", 1)).alias("value"),
    ).filter(F.col("key").isin(*_ROBOTS_KEYS))
    w = Window.partitionBy("domain").orderBy("pos")
    grouped = kv.select(
        "domain",
        "pos",
        "key",
        "value",
        (
            (F.col("key") == "user-agent")
            & (
                F.coalesce(F.lag("key").over(w), F.lit("")) != "user-agent"
            )
        ).cast("long").alias("starts"),
    ).select(
        "domain",
        "pos",
        "key",
        "value",
        F.sum("starts").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("group_id"),
    )
    agents = grouped.filter(F.col("key") == "user-agent").select(
        "domain", "group_id", F.lower("value").alias("agent")
    )
    rules = grouped.filter(
        (F.col("key") != "user-agent") & (F.col("value") != "")
    ).select(
        "domain",
        "group_id",
        F.col("key").alias("rule"),
        F.col("value").alias("pattern"),
        F.length("value").cast("long").alias("pattern_len"),
    )
    return agents.join(rules, ["domain", "group_id"]).select(
        "domain", "agent", "group_id", "rule", "pattern", "pattern_len"
    )


def _robots_like(pattern: Column) -> Column:
    """Translate a robots path pattern to a SQL LIKE pattern:
    ``*`` → ``%``, a trailing ``$`` anchors (no trailing ``%``),
    LIKE metacharacters escaped with ``\\``. Mid-pattern ``$`` is a
    literal, per the RFC."""
    anchored = pattern.endswith("$")
    body = F.when(
        anchored, pattern.substr(F.lit(1), F.length(pattern) - 1)
    ).otherwise(pattern)
    esc = F.replace(
        F.replace(
            F.replace(body, F.lit("\\"), F.lit("\\\\")),
            F.lit("%"),
            F.lit("\\%"),
        ),
        F.lit("_"),
        F.lit("\\_"),
    )
    esc = F.replace(esc, F.lit("*"), F.lit("%"))
    return F.when(anchored, esc).otherwise(F.concat(esc, F.lit("%")))


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str,
    url_col: str = "url",
    out: str = "allowed",
) -> DataFrame:
    """Stamp each URL row with ``allowed`` (1/0) and the deciding
    ``matched_len`` (0 when no rule matched) for crawler ``agent``
    under a ``robots_rules`` table.

    Semantics (RFC 9309): the group is the EXACT agent match when the
    domain has one, else the ``*`` group (substring agent matching —
    'googlebot-news' falling back to 'googlebot' — is out of scope,
    documented); among rules whose pattern matches the URL's
    path+query, the LONGEST pattern wins, an ``allow`` beating a
    ``disallow`` of equal length; a URL with no matching rule (or a
    domain with no rules at all) is allowed. Matching is prefix-based
    with ``*`` wildcards and the trailing ``$`` anchor.

    Plan shape: rules pre-shrink to the two candidate agents, one
    domain-keyed join (AQE picks the strategy — both sides can be
    large at crawl scale), LIKE filtering, then ONE aggregation whose
    max-struct encodes the precedence (pattern_len, allow-over-
    disallow) — no window over the URL table."""
    for c in ("__dom", "__path", "__best"):
        if c in urls.columns:
            raise ValueError(
                f"robots_allowed reserves the column name {c!r}; "
                "rename it in the URL table first"
            )
    dom = extract_domain(F.col(url_col))
    path_raw = F.regexp_extract(
        F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1
    )
    path = F.when(path_raw == "", F.lit("/")).otherwise(path_raw)
    u = urls.withColumn("__dom", dom).withColumn("__path", path)

    ours = agent.lower()
    cand = rules.filter(F.col("agent").isin(ours, "*"))
    # exact-agent groups shadow the * group per domain
    has_specific = cand.filter(F.col("agent") == ours).select(
        "domain"
    ).distinct().withColumn("__spec", F.lit(1))
    sel = (
        cand.join(has_specific, "domain", "left")
        .filter(
            ((F.col("__spec") == 1) & (F.col("agent") == ours))
            | (F.col("__spec").isNull() & (F.col("agent") == "*"))
        )
        .select(
            F.col("domain").alias("__dom"),
            "rule",
            "pattern_len",
            _robots_like(F.col("pattern")).alias("__like"),
        )
    )
    matched = (
        u.join(sel, "__dom")
        .filter(F.expr("__path LIKE __like ESCAPE '\\\\'"))
        .groupBy("__dom", "__path")
        .agg(
            F.max(
                F.struct(
                    F.col("pattern_len"),
                    (F.col("rule") == "allow").alias("is_allow"),
                )
            ).alias("__best")
        )
    )
    return (
        u.join(matched, ["__dom", "__path"], "left")
        .select(
            *urls.columns,
            F.when(
                F.col("__best").isNull() | F.col("__best.is_allow"),
                F.lit(1),
            ).otherwise(F.lit(0)).alias(out),
            F.coalesce(F.col("__best.pattern_len"), F.lit(0)).alias(
                "matched_len"
            ),
        )
    )
