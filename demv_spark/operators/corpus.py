"""Corpus mixture construction — the "data mixing" step of a
training-data pipeline.

A pretraining corpus is assembled from heterogeneous sources with
TARGET proportions (e.g. 60% web, 30% code, 10% books), usually in
token units, not document counts. The reference has no analogue (its
datasets are single tables); this operator family generalizes its
stratified resampling idea (demv.py's group-balancing loop) from
"equalize groups" to "hit an arbitrary target mixture".

Everything is deterministic and engine-portable: document selection
order is the md5-based portable hash (functions/compat.py), so the
mixture is a pure function of the data — reproducible across engines,
partitionings, and retries, and verifiable against a DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from demv_spark.functions.compat import portable_hash


def _with_running_units(
    df: DataFrame,
    group_col: str,
    key_cols: Sequence[str],
    unit,
    seed: int,
    out: str = "__before",
) -> DataFrame:
    """Shared admission machinery of the mixture family: the EXCLUSIVE
    per-group running unit sum in portable-hash order. A row is
    admitted while this is still below the group's target (ties and
    ordering are a pure function of the data — reproducible across
    engines/partitionings/retries)."""
    h = portable_hash(
        F.concat_ws("|", *[F.col(c) for c in key_cols], F.lit(str(seed)))
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(h, *key_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return df.withColumn(
        out, F.coalesce(F.sum(unit).over(w), F.lit(0).cast("long"))
    )


def mixture_sample(
    df: DataFrame,
    group_col: str,
    proportions: Mapping[str, float],
    key_cols: Sequence[str],
    unit_col: str | None = None,
    total: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Deterministic mixture sample: pick rows so that group ``g``
    contributes ``floor(proportions[g] * N)`` units of the result.

    ``unit_col`` is the budget unit — None counts rows; a column name
    (token/char counts) budgets by its per-row value, the shape real
    data-mixing runs in. ``total`` fixes the overall budget N in
    units; None takes the LARGEST feasible N, i.e. ``min_g
    floor(avail_g / w_g)`` — the point where the scarcest group is
    exhausted (groups with weight 0 or absent from ``proportions``
    are dropped and don't constrain N).

    Within each group, rows are taken in portable-hash order until the
    group's unit budget is filled: a row enters while the EXCLUSIVE
    running unit sum is still below target, so the group may overshoot
    by at most one row (never undershoots while rows remain) — in row
    units this reduces to exactly ``row_number <= target``.

    Plan shape: one tiny per-group census (partial agg, no raw-row
    shuffle), the global N as a 1-row aggregate broadcast back via
    cross join, then ONE rank window per group over the filtered
    corpus. The census/N subtree never touches row data, so at 100 TB
    the cost is the same single shuffle a stratified sample pays.
    Skew note: a giant group still ranks in one window task — same
    hazard and same remedy (pre-split hot groups) as
    ``etl.stratified_sample``.

    SQL twin (DuckDB): see ``__spark_entry__.oracle_sql
    ()['q_corpus_mixture']`` — VALUES-table weights, FLOOR arithmetic
    on doubles, and the same exclusive running-sum admission rule.
    """
    weights = {k: float(v) for k, v in proportions.items() if v > 0}
    if not weights:
        raise ValueError("proportions must contain at least one positive weight")

    unit = F.col(unit_col).cast("long") if unit_col else F.lit(1).cast("long")
    w_expr = None
    for g, w in weights.items():
        cond = F.col(group_col) == F.lit(g)
        w_expr = F.when(cond, F.lit(w)) if w_expr is None else w_expr.when(cond, F.lit(w))

    scoped = df.filter(F.col(group_col).isin(list(weights))).withColumn("__w", w_expr)

    # tiny census: per-group available units → the feasible budget N
    avail = scoped.groupBy(group_col, "__w").agg(F.sum(unit).alias("__avail"))
    if total is None:
        n_row = avail.select(
            F.min(F.floor(F.col("__avail") / F.col("__w"))).alias("__N")
        )
    else:
        n_row = avail.select(F.lit(int(total)).cast("long").alias("__N")).limit(1)

    taken = (
        _with_running_units(
            scoped.crossJoin(F.broadcast(n_row))
            .withColumn("__target", F.floor(F.col("__w") * F.col("__N"))),
            group_col, key_cols, unit, seed,
        )
        .filter(F.col("__before") < F.col("__target"))
    )
    return taken.drop("__w", "__N", "__target", "__before")


def mixture_sample_epochs(
    df: DataFrame,
    group_col: str,
    proportions: Mapping[str, float],
    key_cols: Sequence[str],
    unit_col: str | None = None,
    total: int | None = None,
    max_epochs: float | None = None,
    seed: int = 42,
) -> DataFrame:
    """Mixture construction WITH upsampling — the multi-epoch variant
    of ``mixture_sample`` for the real pretraining-mix shape where
    small high-quality sources are repeated (>1 epochs) while huge
    sources are subsampled (<1 epoch), Llama/Pile-style.

    Group ``g``'s unit target is ``floor(w_g · N)`` where ``N``
    defaults to the corpus's own total units (re-mix at constant
    size); a target above the group's available units replicates:
    every row gets ``target div avail`` full-epoch copies, and the
    portable-hash-prefix rows (the same exclusive-running-sum
    admission rule as mixture_sample) get one more. ``max_epochs``
    caps ``target ≤ floor(avail · max_epochs)`` — the standard
    "never repeat a source more than k times" guard. Output adds an
    ``epoch`` column (0-based copy index) so downstream shuffles or
    pack steps can interleave copies instead of clustering them.

    Plan: the same tiny census + broadcast as mixture_sample, one
    rank window per group, then ``explode(sequence(0, copies−1))`` —
    duplication happens AFTER the window, so the shuffle carries each
    row once regardless of epoch count. All budget arithmetic is
    exact BIGINT (targets divide integer units), hence the DuckDB
    oracle reproduces it bit-for-bit."""
    weights = {k: float(v) for k, v in proportions.items() if v > 0}
    if not weights:
        raise ValueError("proportions must contain at least one positive weight")

    unit = F.col(unit_col).cast("long") if unit_col else F.lit(1).cast("long")
    w_expr = None
    for g, w in weights.items():
        cond = F.col(group_col) == F.lit(g)
        w_expr = F.when(cond, F.lit(w)) if w_expr is None else w_expr.when(cond, F.lit(w))

    scoped = df.filter(F.col(group_col).isin(list(weights))).withColumn("__w", w_expr)
    avail = scoped.groupBy(group_col, "__w").agg(F.sum(unit).alias("__avail"))
    if total is None:
        n_row = avail.select(F.sum("__avail").alias("__N"))
    else:
        n_row = avail.select(F.lit(int(total)).cast("long").alias("__N")).limit(1)

    target = F.floor(F.col("__w") * F.col("__N"))
    if max_epochs is not None:
        target = F.least(target, F.floor(F.col("__avail") * F.lit(float(max_epochs))))
    budgets = avail.crossJoin(F.broadcast(n_row)).select(
        group_col,
        F.col("__avail"),
        target.alias("__target"),
    )

    full = F.expr("__target div __avail")
    remainder = F.col("__target") - full * F.col("__avail")
    copies = (
        full
        + (F.col("__before") < remainder).cast("long")
    )
    out = (
        _with_running_units(
            scoped.join(F.broadcast(budgets), [group_col]),
            group_col, key_cols, unit, seed,
        )
        .withColumn("__copies", copies)
        .filter(F.col("__copies") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0).cast("long"), F.col("__copies") - 1)))
    )
    return out.drop("__w", "__avail", "__target", "__before", "__copies")


def budget_waterfill(
    census: DataFrame,
    budget: int,
    max_epochs: int = 4,
    source_col: str = "source",
    tokens_col: str = "tokens",
    weight_col: str = "weight",
) -> DataFrame:
    """Token-budget WATER-FILLING across sources with per-source
    epoch caps (round 12, ninth wave) — the data-schedule computation
    behind LLaMA/Pile-style mixtures: each source should receive
    budget proportional to its mixture ``weight``, but never more
    than ``max_epochs`` passes over its own ``tokens``; budget a
    capped source cannot absorb is REDISTRIBUTED proportionally among
    the uncapped ones (``mixture_sample_epochs`` truncates at the cap
    and silently under-spends the budget — this closes the loop).

    Exact algorithm (classic water-filling, integer-exact): sort
    sources ascending by cap/weight; a PREFIX of that order is capped
    (the standard exchange argument), and the first uncapped position
    k* is the first row where ``cap·W_from > B_rem·w`` — with
    ``W_from`` the weight at-and-after the row and ``B_rem`` the
    budget minus the caps before it. Capped rows take their cap;
    uncapped rows take ``floor(B*·w / W*)`` evaluated at k*. Every
    decision and every allocation is a product/compare/div of exact
    integers (decimal(38,0) intermediates — token budgets × weights
    overflow int64), so the output value-hashes cross-engine and the
    oracle replays it bit-for-bit. The cap/weight ORDERING uses one
    IEEE double divide — a single correctly-rounded op, identical in
    any engine (ties break on source).

    Returns (source, tokens, weight, cap, allocated): Σ allocated =
    min(budget, Σ cap) up to the uncapped rows' floor remainders —
    the deterministic integer shape every downstream sampler
    (``mixture_sample``/``mixture_sample_epochs``) consumes directly.

    Scale shape: the input is a per-source CENSUS (thousands of rows
    at most — sources, not documents), so the two full-set windows
    run in one census-sized task by design; never call this on
    row-level data."""
    w_order = Window.orderBy(
        (F.col("cap").cast("double") / F.col(weight_col).cast("double")),
        F.col(source_col),
    )
    dec = "decimal(38,0)"
    base = census.select(
        F.col(source_col).alias("source"),
        F.col(tokens_col).cast("long").alias("tokens"),
        F.col(weight_col).cast("long").alias(weight_col),
        (F.col(tokens_col).cast("long") * int(max_epochs)).alias("cap"),
    )
    ranked = base.select(
        "source", "tokens", F.col(weight_col).alias("weight"), "cap",
        F.row_number().over(w_order).alias("__pos"),
        F.coalesce(
            F.sum("cap").over(
                w_order.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast(dec).alias("__cap_before"),
        F.sum(weight_col).over(
            w_order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        ).cast(dec).alias("__w_from"),
    )
    b_rem = F.lit(int(budget)).cast(dec) - F.col("__cap_before")
    fail = (
        F.col("cap").cast(dec) * F.col("__w_from")
        > b_rem * F.col("weight").cast(dec)
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    flagged = ranked.select(
        "*",
        F.min(F.when(fail, F.col("__pos"))).over(w_all).alias("__kstar"),
    )
    # B*/W* are the remaining budget/weight AT k* — broadcast to every
    # row via conditional window aggregates
    b_star = F.max(
        F.when(F.col("__pos") == F.col("__kstar"), b_rem)
    ).over(w_all)
    w_star = F.max(
        F.when(F.col("__pos") == F.col("__kstar"), F.col("__w_from"))
    ).over(w_all)
    # EXACT floor division: subtract the exact decimal remainder
    # before dividing, so the quotient is an integer and the decimal
    # divide cannot round (a bare floor(num/den) rounds the quotient
    # to the result scale FIRST — half-up — and can flip the floor
    # when the true quotient sits within half an ulp below an integer)
    num = b_star * F.col("weight").cast(dec)
    den = w_star
    alloc = F.when(
        F.col("__kstar").isNull() | (F.col("__pos") < F.col("__kstar")),
        F.col("cap").cast(dec),
    ).otherwise((num - F.pmod(num, den)) / den)
    return (
        flagged.select(
            "source", "tokens", "weight", "cap",
            F.greatest(alloc, F.lit(0).cast(dec))
            .cast("long")
            .alias("allocated"),
        )
    )


def mixture_report(
    df: DataFrame, group_col: str, unit_col: str | None = None
) -> DataFrame:
    """Achieved mixture of a corpus: per-group unit totals and their
    share of the whole (one exact-integer division per group — the
    verification half of mixture_sample; run it on the output to
    audit the mix). Columns: group_col, units, share double."""
    unit = F.col(unit_col).cast("long") if unit_col else F.lit(1).cast("long")
    per = df.groupBy(group_col).agg(F.sum(unit).alias("units"))
    return per.select(
        group_col,
        "units",
        (F.col("units") / F.sum("units").over(Window.partitionBy()))
        .alias("share"),
    )


def quality_weighted_sample(
    df: DataFrame,
    score_col: str,
    max_score: int = 1000,
    key_cols: Sequence[str] = ("doc_id",),
    salt: str = "qws1",
    out: str = "admitted",
) -> DataFrame:
    """Deterministic score-proportional subsampling: admit each row
    with probability ``clamp(score, 0, max_score) / max_score``,
    decided by the row's own portable hash — the curation step that
    keeps high-quality documents more often (FineWeb-Edu-style
    classifier-weighted downsampling) without any RNG state.

    Admission is ``portable_hash(salt ':' keys) % max_score <
    clamp(score)`` — pure integer arithmetic on a 60-bit md5 hash, so
    the sample is a reproducible function of the data: identical
    across engines (SQL-oracle-able), partitionings, retries, and
    re-runs. Map-only, zero shuffles; at 100 TB it costs one scan.

    ``score_col`` must be integer-valued (e.g. the exact BIGINT score
    of ``quality_clf.hashed_linear_score`` after shifting into
    [0, max_score]); rows with NULL score are dropped from the
    admission test (flagged 0).
    """
    key = F.concat_ws(
        ":", F.lit(salt), *[F.col(c).cast("string") for c in key_cols]
    )
    clipped = F.greatest(
        F.lit(0), F.least(F.col(score_col).cast("long"), F.lit(int(max_score)))
    )
    admit = (
        (portable_hash(key) % F.lit(int(max_score))) < clipped
    ) & F.col(score_col).isNotNull()
    return df.withColumn(out, admit.cast("int"))


def cap_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    cap: int,
    id_cols: Sequence[str],
    seed: int = 42,
    skew_salt: int | None = None,
    out: str = "admitted",
) -> DataFrame:
    """Per-key document quota: flag at most ``cap`` rows per key
    (the per-domain cap of CommonCrawl-style curation — a handful of
    hot domains would otherwise dominate the corpus).

    Admission is deterministic: rows rank within their key by
    ``(portable_hash(seed:ids), ids)`` — a pure function of the data,
    reproducible across engines/partitionings/retries and therefore
    SQL-oracle-able (ROW_NUMBER over the same md5 expression).

    ``skew_salt=None``: one ranking window per key (a key's rows sort
    in one task — fine while no key exceeds a few million rows).
    ``skew_salt=k``: two-phase skew-safe rank for hot keys — the
    60-bit hash space splits into k RANGES (bucket = hash div
    ceil(2⁶⁰/k)), so ordering by (bucket, hash) ≡ ordering by hash
    and the result is IDENTICAL to the unsalted path: local rank
    within (key, bucket), then exact prefix offsets from the tiny
    per-bucket census. Rows with local rank > cap are pruned before
    the offset join — a bucket never forwards more than ``cap`` rows.
    """
    pr = portable_hash(
        F.concat_ws(
            ":", F.lit(f"cap{seed}"), *[F.col(c).cast("string") for c in id_cols]
        )
    )
    ids = [F.col(c) for c in id_cols]
    keys = list(key_cols)
    with_pr = df.withColumn("__pr", pr)

    if not skew_salt:
        w = Window.partitionBy(*keys).orderBy(F.col("__pr"), *ids)
        return (
            with_pr.withColumn("__rn", F.row_number().over(w))
            .withColumn(out, (F.col("__rn") <= cap).cast("int"))
            .drop("__pr", "__rn")
        )

    width = -(-(1 << 60) // skew_salt)  # ceil(2^60 / k)
    bucketed = with_pr.withColumn("__bk", (F.col("__pr") / F.lit(width)).cast("int"))
    w_local = Window.partitionBy(*keys, "__bk").orderBy(F.col("__pr"), *ids)
    local = bucketed.withColumn("__lrn", F.row_number().over(w_local))
    counts = local.groupBy(*keys, "__bk").agg(F.count(F.lit(1)).alias("__bn"))
    w_off = (
        Window.partitionBy(*keys)
        .orderBy("__bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__bn").over(w_off), F.lit(0))
    ).drop("__bn")
    # a row with local rank > cap can never be globally admitted, but
    # it must still be RETURNED (this operator flags, not filters):
    # only the ≤cap head of each bucket pays the offset join; the tail
    # short-circuits to admitted=0 — a hot key's bucket never forwards
    # more than cap rows into the join
    # NULL-safe join (shared idiom, compat.null_safe_broadcast_join):
    # a plain equi-join on [*keys, __bk] would drop NULL-keyed rows
    # (NULL = NULL is never true), silently deleting them from the
    # output — this operator flags, never filters
    from demv_spark.functions.compat import null_safe_broadcast_join

    head = (
        null_safe_broadcast_join(
            local.filter(F.col("__lrn") <= cap), offsets,
            keys=keys, eq_cols=["__bk"], carry=["__off"],
        )
        .withColumn(out, ((F.col("__lrn") + F.col("__off")) <= cap).cast("int"))
        .drop("__pr", "__bk", "__lrn", "__off")
    )
    tail = (
        local.filter(F.col("__lrn") > cap)
        .withColumn(out, F.lit(0).cast("int"))
        .drop("__pr", "__bk", "__lrn")
    )
    return head.unionByName(tail)


def split_by_hash(
    df: DataFrame,
    key_cols: Sequence[str],
    fractions: Mapping[str, float],
    seed: int = 42,
    out: str = "split",
) -> DataFrame:
    """Leakage-free train/validation/test assignment: every row with
    the same key lands in the same split (split by URL/domain/doc
    family and near-duplicates can never straddle the boundary), with
    expected proportions ``fractions``.

    bucket = portable_hash(seed:keys) mod 10⁶; split thresholds are
    the exact-integer cumulative fractions, so assignment is pure
    integer arithmetic on an md5 — reproducible across engines
    (SQL-oracle-able as a CASE over the same expression), partitions
    and retries, and stable under corpus growth (adding rows never
    reassigns existing keys — the property a random split lacks).
    Map-only: one scan, zero shuffles at any corpus size.
    """
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1 (got {total})")
    key = F.concat_ws(
        ":", F.lit(f"split{seed}"), *[F.col(c).cast("string") for c in key_cols]
    )
    bucket = portable_hash(key) % F.lit(1_000_000)
    names = list(fractions)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += fractions[name]
        # round, not truncate: float accumulation of e.g. 0.7+0.1
        # yields 0.7999999999999999, and int() would shift the
        # threshold to 799999 — off the exact integer any SQL oracle
        # writes down
        thr = round(cum * 1_000_000)
        cond = bucket < F.lit(thr)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out, expr)


def temperature_mixture(
    df: DataFrame,
    group_col: str,
    key_cols: Sequence[str],
    alpha: float = 0.5,
    unit_col: str | None = None,
    total: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Temperature-weighted data mixing: group ``g`` contributes units
    ∝ ``avail_g**alpha`` — the multilingual-LM sampling scheme that
    up-weights small sources (alpha<1 flattens the distribution;
    alpha=1 is proportional, alpha=0 uniform).

    The mixing weights are derived from the data, NOT passed in, and
    the arithmetic is built to be engine-portable: per-group weight
    q_g = floor(avail_g**alpha · 10⁶ + 0.5) — ONE correctly-rounded
    IEEE op (sqrt at the default alpha=0.5) then an exact half-up
    digitization — so the weight SUM is integer-exact in any engine
    (a raw float Σ of powers is summation-order-dependent and can
    flip a later floor by 1 ulp). Targets are then exact integers:
    target_g = floor(T·q_g / S) with S = Σ q_g; ``total=None`` takes
    the largest feasible T = min_g floor(avail_g·S / q_g). The
    products T·q_g and avail_g·S overflow int64 as early as ~4·10⁸
    units (q ~ 10⁶·√avail, so T·q ~ avail·10⁶·√avail ≥ 2⁶³), well
    inside real corpus sizes — and in default non-ANSI Spark a long
    product wraps SILENTLY. Each product is therefore computed in
    DECIMAL(19,0)×DECIMAL(19,0) (exact 38-digit product — two longs
    can never overflow it) with Spark's ``div`` doing the exact
    integral division, and only the final per-group target — which is
    ≤ avail_g by construction — is cast back to long. Safe for any
    avail/T that themselves fit int64 (ADVICE round 5).

    Only alpha=0.5 (sqrt) carries a bit-reproducibility guarantee
    across engines; other alphas go through pow(), whose last-ulp
    behavior is libm-dependent — fine for production mixing, not for
    a value-hash oracle.

    Admission and plan shape are exactly ``mixture_sample``'s: tiny
    census → broadcast targets → one portable-hash rank window per
    group, exclusive running-sum admission (overshoot ≤ 1 row).

    Group scope: rows with a NULL group and groups whose units sum to
    ≤ 0 are EXCLUDED from the mixture (mirrored in the oracle twin).
    Without the exclusion a tiny NULL/zero group would poison the
    feasible budget — T = min over groups — down to near nothing
    while its own rows could never be admitted, and a zero-unit group
    would divide by zero under ANSI mode.
    """
    unit = F.col(unit_col).cast("long") if unit_col else F.lit(1).cast("long")
    df = df.filter(F.col(group_col).isNotNull())
    avail = (
        df.groupBy(group_col)
        .agg(F.sum(unit).alias("__avail"))
        .filter(F.col("__avail") > 0)
    )
    a = F.col("__avail").cast("double")
    powed = F.sqrt(a) if alpha == 0.5 else F.pow(a, F.lit(float(alpha)))
    q = F.floor(powed * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    wq = avail.withColumn("__q", q)
    # S and feasible T need each other: compute S first, then T from
    # the broadcast-joined census (both are |groups|-sized)
    s_row = wq.agg(F.sum("__q").alias("__S"))
    census = wq.crossJoin(F.broadcast(s_row))
    # exact integer arithmetic throughout: the products are formed in
    # DECIMAL(19,0)×DECIMAL(19,0) (38-digit exact — immune to the
    # silent int64 wrap at ~4e8 units, ADVICE round 5) and `div` (not
    # `/`) performs the exact integral division; `/` on longs is
    # DOUBLE division, which loses exactness past 2^53
    if total is None:
        t_row = census.agg(
            F.min(
                F.expr(
                    "(CAST(__avail AS DECIMAL(19,0)) * CAST(__S AS DECIMAL(19,0)))"
                    " div __q"
                )
            ).cast("long").alias("__T")
        )
    else:
        t_row = s_row.select(F.lit(int(total)).cast("long").alias("__T")).limit(1)
    targets = (
        census.crossJoin(F.broadcast(t_row))
        .select(
            group_col,
            F.expr(
                "(CAST(__T AS DECIMAL(19,0)) * CAST(__q AS DECIMAL(19,0))) div __S"
            ).cast("long").alias("__target"),
        )
    )
    taken = (
        _with_running_units(
            df.join(F.broadcast(targets), group_col),
            group_col, key_cols, unit, seed,
        )
        .filter(F.col("__before") < F.col("__target"))
    )
    return taken.drop("__target", "__before")


def shard_assignment(
    df: DataFrame,
    key_cols: Sequence[str],
    n_shards: int,
    seed: int = 42,
    shard_col: str = "shard",
    pos_col: str = "pos_in_shard",
) -> DataFrame:
    """Deterministic training-shard assignment: every row gets a
    shard id and its exact write position inside that shard — the
    data-ordering contract of a reproducible training run (the same
    corpus always yields the same shard files in the same row order,
    so a resumed or re-run job reads identical batches).

    shard = portable_hash(seed:keys) mod n_shards — map-side, stable
    under corpus growth (an added row never moves an existing row's
    SHARD; only positions after its insertion point shift, which is
    the best any total order can do). pos_in_shard = rank within the
    shard by (hash, keys) — the md5 tiebreak makes the order a pure
    function of the data, never of partitioning, and doubles as an
    intra-shard shuffle (hash order ≈ random order, the property
    training wants — consecutive corpus rows land far apart).

    Scale shape: ONE shuffle (the per-shard rank window). Shards are
    hash-balanced by construction, so the rank tasks are uniform —
    no salting needed (contrast cap_per_key's hot user-keys). Rank
    PARALLELISM equals ``n_shards`` (each shard's rank is one task):
    size shards like output files (1–4 GB), so a 100 TB corpus uses
    tens of thousands of shards and the rank is fully parallel — a
    small ``n_shards`` over a huge corpus concentrates each shard's
    sort in one task (raise n_shards, or skip positions and let the
    writer sort within files). Feed ``shard`` to
    ``write_corpus(partition_cols=["shard"])`` and
    ``sort_cols=[pos_col]`` to materialize the layout.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1 (got {n_shards})")
    h = portable_hash(
        F.concat_ws(
            ":", F.lit(f"shard{seed}"),
            *[F.col(c).cast("string") for c in key_cols],
        )
    )
    out = df.withColumn(shard_col, F.pmod(h, F.lit(int(n_shards))).cast("int"))
    w = Window.partitionBy(shard_col).orderBy(
        h.asc(), *[F.col(c) for c in key_cols]
    )
    return out.withColumn(pos_col, F.row_number().over(w).cast("long"))


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    fp_col: str = "fp",
    verdict_col: str = "verdict",
) -> DataFrame:
    """Snapshot diff between two corpus versions: per key, verdict
    ``added`` (key only in new) / ``removed`` (only in old) /
    ``changed`` (both sides, fingerprint differs) / ``unchanged`` —
    the audit primitive of an incremental 100 TB ingest (what did
    this crawl refresh actually touch?) and the input to incremental
    re-processing (re-embed/re-tokenize only ``added``+``changed``).

    Contract: ``key_cols`` must be unique per side (a snapshot is
    keyed) — pre-check with ``validate.dup_keys`` on ingest.
    Fingerprints compare null-safely (two NULL fps = unchanged), and
    presence is tracked separately from the fingerprint so a present
    row with a NULL fp is never mistaken for an absent row. KEY
    values, by contrast, join null-UNSAFELY (standard SQL, identical
    in the DuckDB twin): a NULL-keyed row on both sides reports as
    one ``removed`` plus one ``added``, never as a match — normalize
    keys upstream if NULL keys are possible.

    Scale shape: ONE full-outer shuffle join on the key. At 100 TB
    store both snapshots bucketed by the key so the join is
    co-located (zero shuffle); fingerprints travel as 32-byte
    strings, never the payload. Output columns: *key_cols, old_fp,
    new_fp, verdict.
    """
    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    o = old.select(
        *keys, F.col(fp_col).alias("old_fp"), F.lit(True).alias("__in_old")
    )
    n = new.select(
        *keys, F.col(fp_col).alias("new_fp"), F.lit(True).alias("__in_new")
    )
    j = o.join(n, on=keys, how="full_outer")
    verdict = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.col("old_fp").eqNullSafe(F.col("new_fp")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(*keys, "old_fp", "new_fp", verdict.alias(verdict_col))


def corpus_diff_census(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    fp_col: str = "fp",
) -> DataFrame:
    """Verdict census of ``corpus_diff`` — the four-row dataset-card
    delta (n added/removed/changed/unchanged). Same single-join plan;
    the census aggregation is map-side partial on top of it."""
    return (
        corpus_diff(old, new, key_cols, fp_col)
        .groupBy("verdict")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def assign_sequences(
    df: DataFrame,
    tokens_col: str,
    seq_len: int,
    key_cols: Sequence[str],
    n_shards: int = 1,
    seed: int = 42,
) -> DataFrame:
    """GPT-style sequence packing: concatenate every document's
    tokens in a deterministic per-shard order and cut the stream
    every ``seq_len`` tokens — documents SPAN sequence boundaries
    (the standard causal-LM pretraining layout; packing_efficiency
    is the no-split planner for the padded alternative). Each doc
    gets its exact coordinates in that layout:

      shard         portable_hash(seed:keys) mod n_shards (the
                    shard_assignment convention — stable, balanced)
      token_offset  tokens before it in its shard's stream
      seq_first     token_offset div seq_len
      seq_last      (token_offset + n_tokens − 1) div seq_len
                    (= seq_first for empty docs: zero tokens occupy
                    no space but keep an auditable coordinate)
      offset_in_seq token_offset mod seq_len

    All integers — a training loader can slice any sequence id
    directly from the shard files without replaying the stream, and
    a resumed run reproduces identical batches.

    Scale shape: ONE shuffle (the per-shard cumulative-sum window,
    hash-balanced like shard_assignment's rank; same n_shards sizing
    guidance). Cumulative sums are int64: a shard would need 2^63
    tokens to overflow."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1 (got {seq_len})")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1 (got {n_shards})")
    h = portable_hash(
        F.concat_ws(
            ":", F.lit(f"pack{seed}"),
            *[F.col(c).cast("string") for c in key_cols],
        )
    )
    out = df.withColumn("shard", F.pmod(h, F.lit(int(n_shards))).cast("int"))
    w = (
        Window.partitionBy("shard")
        .orderBy(h.asc(), *[F.col(c) for c in key_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    nt = F.col(tokens_col).cast("long")
    out = out.withColumn(
        "token_offset",
        F.coalesce(F.sum(nt).over(w), F.lit(0)).cast("long"),
    )
    off = F.col("token_offset")
    last_tok = F.when(nt > 0, off + nt - 1).otherwise(off).cast("long")
    return (
        out.withColumn("__last_tok", last_tok)
        .withColumn("seq_first", F.expr(f"token_offset div {int(seq_len)}"))
        .withColumn("seq_last", F.expr(f"__last_tok div {int(seq_len)}"))
        .withColumn(
            "offset_in_seq", F.pmod(off, F.lit(int(seq_len))).cast("long")
        )
        .drop("__last_tok")
    )


def _dsir_bucket_counts(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int,
    seed: int,
) -> DataFrame:
    """Hashed n-gram featurization (unigrams + bigrams → one of
    ``n_buckets`` portable-hash buckets): (doc_id, bucket, c) counts.
    One explode + one (doc, bucket)-keyed aggregate; empty tokens are
    dropped (the ['']-for-NULL canonical form contributes nothing)."""
    from demv_spark.operators.text import tokens

    d = df.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("__t")
    )
    feats = F.expr(
        "concat(__t, CASE WHEN size(__t) >= 2 THEN "
        "transform(sequence(1, size(__t) - 1), "
        "i -> concat(element_at(__t, i), ' ', element_at(__t, i + 1))) "
        "ELSE array() END)"
    )
    exploded = d.select("doc_id", F.explode(feats).alias("feat")).filter(
        F.col("feat") != ""
    )
    bucket = F.pmod(
        portable_hash(F.concat_ws(":", F.lit(f"dsir{seed}"), F.col("feat"))),
        F.lit(int(n_buckets)),
    )
    return exploded.groupBy("doc_id", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )


def dsir_bucket_census(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    seed: int = 7,
) -> DataFrame:
    """Corpus-level hashed-feature census: (bucket, n) over the
    unigram+bigram buckets — the sufficient statistic DSIR's models
    are built from. Counts are a commutative monoid (sum-mergeable),
    so per-batch censuses fold incrementally — the streaming
    maintainer (``streaming/dsir_stream.py``) appends exactly these
    rows."""
    return (
        _dsir_bucket_counts(df, text_col, id_col, n_buckets, seed)
        .groupBy("bucket")
        .agg(F.sum("c").cast("long").alias("n"))
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    seed: int = 7,
    t_census: DataFrame | None = None,
    q_census: DataFrame | None = None,
) -> DataFrame:
    """DSIR-style importance weights for data selection (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling"): score every RAW document by how much more likely its
    hashed n-gram features are under the TARGET distribution than
    under the raw distribution, log w_i = Σ_k c_ik·(log p_k − log q_k)
    with add-1-smoothed hashed-bigram bucket models p (target) and q
    (raw).

    INTEGER-EXACT variant: log2 is taken at BIT GRANULARITY via
    bitlength — log2(t_k+1) → bitlen(t_k+1), the ``lm.py`` surprisal
    playbook — so the emitted weight

        weight_bits = Σ_k c_ik·(bitlen(t_k+1) − bitlen(q_k+1))
                      + n_i·(bitlen(Q+m) − bitlen(T+m))

    is a deterministic integer (length(bin(x)) is minimal-length in
    Spark AND DuckDB — no float log anywhere), value-hashable
    cross-engine, and rank-equivalent to DSIR's float weight at bit
    resolution. T/Q are total smoothed feature masses; m = n_buckets.

    Plan shape at 100 TB: one explode + (doc, bucket) aggregate per
    corpus, two ≤m-row bucket censuses, one broadcast join of the
    m-row census back onto the raw doc-bucket counts (bounded by
    construction — m is a knob, NOT data-sized), one doc-keyed
    aggregate. The raw corpus itself never joins the target corpus.
    Emits (doc_id, n_feats, weight_bits); docs with no features score
    (0, 0) — flag-not-filter.

    Pass PRECOMPUTED (bucket, n) censuses via ``t_census``/``q_census``
    (``dsir_bucket_census`` shape) to score against maintained models
    instead of recomputing them — the streaming maintainer's read
    surface does exactly this. ``target`` may be omitted when
    ``t_census`` is given."""
    rb = _dsir_bucket_counts(raw, text_col, id_col, n_buckets, seed)
    if q_census is None:
        # rb feeds THREE subtrees below (q_census→census→totals,
        # census again in the broadcast, and the scored join) — an
        # unpersisted rb re-tokenizes and re-explodes the whole raw
        # corpus once per subtree (eager localCheckpoint, round 13:
        # blocks release with the result instead of pinning the
        # session's CacheManager)
        rb = rb.localCheckpoint(eager=True)
    if t_census is None:
        if target is None:
            raise ValueError("dsir_weights: need target or t_census")
        tb = _dsir_bucket_counts(target, text_col, id_col, n_buckets, seed)
        t_census = tb.groupBy("bucket").agg(F.sum("c").alias("t_k"))
    else:
        t_census = t_census.select("bucket", F.col("n").alias("t_k"))
    if q_census is None:
        q_census = rb.groupBy("bucket").agg(F.sum("c").alias("q_k"))
    else:
        q_census = q_census.select("bucket", F.col("n").alias("q_k"))
    census = (
        q_census.join(t_census, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("t_k", F.lit(0)).alias("t_k"),
            F.coalesce("q_k", F.lit(0)).alias("q_k"),
        )
        # ≤ m rows; read twice (the totals collect + the broadcast) —
        # materialized, the target corpus tokenizes exactly once
        .localCheckpoint(eager=True)
    )
    totals = census.agg(
        F.coalesce(F.sum("t_k"), F.lit(0)).cast("long"),
        F.coalesce(F.sum("q_k"), F.lit(0)).cast("long"),
    ).collect()[0]
    m = int(n_buckets)
    norm_bits = int(totals[1] + m).bit_length() - int(totals[0] + m).bit_length()
    bits = (
        F.length(F.bin(F.col("t_k") + 1)) - F.length(F.bin(F.col("q_k") + 1))
    ).cast("long")
    # LEFT join: with precomputed censuses a probe doc can carry a
    # bucket neither model has seen — bitlen(0+1) − bitlen(0+1) = 0
    # bits, exactly what the smoothed ratio gives an unseen feature
    scored = rb.join(
        F.broadcast(census.select("bucket", bits.alias("__bits"))),
        "bucket",
        "left",
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_feats"),
        F.sum(F.col("c") * F.coalesce(F.col("__bits"), F.lit(0)))
        .cast("long").alias("__fb"),
    )
    return (
        raw.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
            (
                F.coalesce("__fb", F.lit(0))
                + F.coalesce("n_feats", F.lit(0)) * F.lit(norm_bits)
            ).cast("long").alias("weight_bits"),
        )
    )
