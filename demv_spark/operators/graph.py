"""Domain-graph authority scoring — integer-exact PageRank.

Web-corpus curation ranks domains by link authority (the Common
Crawl-era heuristic: low-authority link-farm domains are dropped or
down-weighted before text ever reaches a shard). PageRank is the
engine's first ORACLE-ABLE iterative algorithm: KMeans and BPE are
iterative too, but their float/greedy updates aren't SQL-twinnable,
while this formulation is exact in int64 end to end.

Why integer: float PageRank sums contributions in partition order —
non-associative, so two runs (or two engines) disagree in the last
ulps and a value-hash oracle flips. Here ranks live on a fixed
integer scale (1e6 = rank 1.0) and every update is exact:

    contrib(e) = rank(src) div out_degree(src)        (exact int div)
    rank'(v)   = floor(0.15·scale) + (85 · Σ contrib) div 100

Σ of int64 contributions is associative (no wrap: ranks are bounded
by scale·N and N·scale·85 stays far under 2⁶³ for any realistic
domain count); the damping multiply is 85·x div 100 — exact. The
result is bit-identical across engines, partitionings and retries.

Semantics notes (all mirrored by the SQL twin, oracle-checked):
- A fixed ITERATION COUNT, not convergence detection — the 100 TB
  regime runs a known number of passes (convergence tests would need
  a float norm, reintroducing order-dependence).
- Dangling nodes (no out-edges): two regimes, both exact and both
  oracle-twinned. Default (``redistribute_dangling=False``): they
  keep receiving rank but redistribute none — their mass decays into
  the damping floor, so ranks are NOT comparable to textbook
  PageRank numbers (NetworkX/GraphFrames). With
  ``redistribute_dangling=True`` their mass is split uniformly over
  ALL nodes each iteration (the textbook formulation): one extra
  per-iteration scalar aggregate (Σ rank over dangling nodes,
  integer-divided by N), total mass is conserved up to the integer
  remainders, and ranks/scale converge to the standard values.
- Duplicate edges count once (the edge set is made distinct) — link
  COUNTS are spam-sensitive, link EXISTENCE is the authority signal.

Scale shape: per iteration ONE shuffle — contributions group by dst;
the degree table joins in pre-aggregated (|nodes| rows). ``iterations``
is small and fixed (5 default), so the lazy plan is 5 chained
join+agg stages; checkpoint between iterations only if lineage depth
ever matters (it does not at 5).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DAMPING_NUM = 85          # 0.85 as an exact rational 85/100
DAMPING_DEN = 100


def pagerank_integer(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    scale: int = 1_000_000,
    redistribute_dangling: bool = False,
) -> DataFrame:
    """Integer PageRank over a (src, dst) edge table. Returns
    (node, rank_int) for every node appearing on either edge side;
    rank_int is on the ``scale`` grid (scale = rank 1.0 under the
    uniform start). Exact: same integers every run, every engine.

    ``redistribute_dangling=True`` is the TEXTBOOK formulation:
    each iteration's dangling mass (Σ rank over no-out-edge nodes)
    is integer-divided by N and added to every node's incoming sum
    before damping — ranks/scale then match standard PageRank
    (NetworkX/GraphFrames) up to the integer grid. The default keeps
    the round-6 decay semantics (dangling mass bleeds into the
    damping floor) for back-compat with existing oracle rows. Cost
    of the flag: one |nodes|-row filter-aggregate (a 1-row scalar)
    per iteration over the already-materialized ranks — the dangling
    SET is static, so it is a precomputed flag column carried on the
    ranks table, not a per-iteration anti-join (round 9: the
    join-per-iteration shape measured 2.5× the cost of this one on a
    quiet box)."""
    e = edges.select(
        F.col(src).cast("string").alias("src"),
        F.col(dst).cast("string").alias("dst"),
    ).distinct()
    base = int(scale) * (DAMPING_DEN - DAMPING_NUM) // DAMPING_DEN
    if not redistribute_dangling:
        # FUSED plain path (round 12, guide §2.4): the per-iteration
        # |nodes|-sized left join that materialized a full rank table
        # every step is algebraically unnecessary — every e.src has
        # out-edges by construction, so next iteration's contribution
        # pass can read the PREVIOUS contribs table (node, in_sum)
        # through a left join on src and evaluate the damping
        # expression inline; absent nodes coalesce to in_sum = 0,
        # exactly the rank the nodes-join would have given them. One
        # shuffle (the groupBy dst) + one small-side join per
        # iteration instead of two joins + a checkpoint cadence; the
        # full rank table exists only ONCE, at the end. Integer
        # results are plan-invariant (same-box A/B: bit-identical,
        # 2.9 s → 1.3 s on the crawl-frontier fixture). No persists:
        # the distinct-edge exchange is shared across every reference
        # via ReuseExchange, and the linear-depth plan needs no
        # lineage cut at real iteration counts (cadence kept at 8 as
        # insurance for deep chains).
        nodes = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
        )
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
        e_deg = e.join(deg, "src")
        rank_sql = (
            f"({base}L + (({DAMPING_NUM} * coalesce(in_sum, 0L)) "
            f"div {DAMPING_DEN}))"
        )
        contribs = None
        for it in range(int(iterations)):
            if contribs is None:
                src_ranks = e_deg.select(
                    "dst", F.expr(f"{int(scale)}L div out_deg").alias("c")
                )
            else:
                src_ranks = e_deg.join(
                    contribs.select(F.col("node").alias("src"), "in_sum"),
                    "src",
                    "left",
                ).select("dst", F.expr(f"{rank_sql} div out_deg").alias("c"))
            contribs = src_ranks.groupBy(F.col("dst").alias("node")).agg(
                F.sum("c").alias("in_sum")
            )
            if (it + 1) % 8 == 0 and it < int(iterations) - 1:
                contribs = contribs.localCheckpoint(eager=True)
        if contribs is None:  # iterations == 0: uniform start
            return nodes.withColumn(
                "rank_int", F.lit(int(scale)).cast("long")
            )
        return nodes.join(contribs, "node", "left").select(
            "node", F.expr(rank_sql).alias("rank_int")
        )
    # cache the distinct edge set FIRST: nodes, deg and e_deg all
    # derive from it, and each materializes separately below — an
    # unpersisted e re-scans and re-distincts the raw edge input once
    # per derivation AND once per iteration level of the lazy plan
    # (round 9; exact integer results are plan-invariant, oracle
    # unchanged). The redistribute variant keeps the materialized
    # per-iteration rank table: its dangling-mass scalar reads the
    # ranks a second time each step, and the round-12 fused prototype
    # (contribs + scalar threaded separately) measured SLOWER (3.5 →
    # 4.3 s same-box) because the doubled state chain serializes two
    # broadcast materializations per iteration.
    e = e.persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # out_deg is static — pre-join it onto the edges ONCE instead of
    # re-joining deg inside every iteration
    e_deg = e.join(deg, "src")
    e_deg = e_deg.persist()
    # The dangling flag is static
    # per node (no out-edges), computed here once and carried
    # through every rank update so the per-iteration scalar is a
    # filter-agg over materialized ranks, never a join.
    nodes = (
        nodes.join(
            deg.select(F.col("src").alias("node"))
            .withColumn("__out", F.lit(1)),
            "node",
            "left",
        )
        .select("node", F.col("__out").isNull().alias("__dang"))
        .persist()
    )
    n_nodes = nodes.count()
    ranks = nodes.withColumn("rank_int", F.lit(int(scale)).cast("long"))
    for it in range(int(iterations)):
        if it % 2 == 0:
            # the update reads ranks TWICE (contributions + dangling
            # scalar); without materialization the lazy plan doubles
            # per iteration (2^iterations leaf scans). Eager
            # localCheckpoint (the hits_integer/duplicate_clusters
            # pattern) both cuts the lineage — chained cached joins
            # made Catalyst's tree rendering itself OOM at depth ~8 —
            # and lets prior iterations' blocks be released, unlike a
            # persist-per-iteration chain that pins them all. Every
            # SECOND iteration is enough: two lazy levels read the
            # checkpoint ≤4 times, and halving the action count
            # halved the fixture wall-clock (round 9 — per-iteration
            # jobs, not data volume, dominate small graphs)
            ranks = ranks.localCheckpoint(eager=True)
        contribs = (
            e_deg.join(
                ranks.select(
                    F.col("node").alias("src"), "rank_int"
                ),
                "src",
            )
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_int div out_deg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        # the dangling mass stays IN the plan as a broadcast
        # 1-row aggregate (filter-sum over the flagged ranks —
        # no join, no shuffle): a per-iteration collect() was a
        # whole scheduled job on top of the checkpoint job, and
        # on job-overhead-bound graphs those actions, not data,
        # were the cost (round 9). share = __dm div N with N a
        # literal (counted once; N > 0 whenever any rank row
        # exists, so the div is safe — an empty graph yields
        # empty ranks before this expression ever evaluates).
        dang = ranks.filter(F.col("__dang")).agg(
            F.coalesce(F.sum("rank_int"), F.lit(0))
            .cast("long")
            .alias("__dm")
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                "__dang",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"({DAMPING_NUM} * (coalesce(in_sum, 0L) "
                        f"+ (__dm div {max(int(n_nodes or 0), 1)}L))) "
                        f"div {DAMPING_DEN}"
                    )
                ).alias("rank_int"),
            )
        )
    # materialize the final ranks, then RELEASE the static tables: a
    # bare unpersist would silently re-derive them on the caller's
    # first action, and persists without unpersist pin blocks for the
    # session lifetime (round-9 review finding)
    out = ranks.select("node", "rank_int").localCheckpoint(eager=True)
    for cached in (e, e_deg, nodes):
        cached.unpersist()
    return out


def hits_integer(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 4,
    scale: int = 1_000_000,
) -> DataFrame:
    """Integer-exact HITS (Kleinberg hubs & authorities) — the
    complementary authority signal to PageRank for crawl-frontier
    scoring: a good HUB links many good authorities (directory/index
    pages), a good AUTHORITY is linked by many good hubs. Returns
    (node, auth_int, hub_int) on the ``scale`` grid for every node on
    either edge side.

    Exactness: the textbook L2 normalization is irrational, so each
    half-step MAX-normalizes instead — ``x·scale div max`` — keeping
    every value an exact int64 in [0, scale] (bounded: no overflow at
    any iteration count, since a sum is ≤ |edges|·scale ≪ 2⁶³). The
    update order is the classic one: auth from CURRENT hubs, then
    hubs from the NEW auths; each max is a 1-row scalar collected
    driver-side and folded back as a literal (the pagerank
    redistribute pattern — census-sized, keeps each half-step to one
    join+agg). Duplicate edges count once.

    Scale shape: graph tables persist once; per iteration two
    shuffles (auth groupBy dst, hub groupBy src) and two scalar
    aggregates. Fixed iteration count, bit-identical across engines —
    the SQL twin unrolls the same recurrence.

    Round 12 (guide §2.4, the plain-pagerank fusion applied here):
    the per-half-step ``nodes`` left join that materialized a full
    |nodes|-sized score table every time is algebraically
    unnecessary — a node absent from the contribution aggregate has
    score 0, contributes 0 to the next half-step's sums, and 0 never
    changes the max (scores are non-negative), so the iterations run
    on the PARTIAL (contribution-receiving) tables and the full node
    table is built once at the end with coalesce-to-0. Halves the
    per-half-step work and shrinks every checkpoint from |nodes| to
    |receiving nodes|; integer results are plan-invariant."""
    e = edges.select(
        F.col(src).cast("string").alias("src"),
        F.col(dst).cast("string").alias("dst"),
    ).distinct().persist()
    # checkpointed, not persisted: the fused loop below never reads
    # the node table — only the FINAL join-back does — so an eager
    # checkpoint lets e release as before without the output plan
    # re-deriving nodes from the raw edge input
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _norm(scores: DataFrame, col: str) -> DataFrame:
        # eager localCheckpoint per half-step (the duplicate_clusters
        # pattern): the scalar max forces materialization anyway, and
        # plain persist() keeps the full logical tree alive — 8
        # chained cached joins made Catalyst's tree rendering itself
        # OOM. Checkpoint truncates lineage to the materialized rows.
        scores = scores.localCheckpoint(eager=True)
        mx = scores.agg(F.max(col)).collect()[0][0] or 0
        if mx <= 0:
            return scores
        # the product runs in DECIMAL(38,0): pre-norm values reach
        # maxdeg·scale, and ·scale again exceeds int64 once max
        # in-degree passes ~9.2M — routine on web graphs (the
        # kmv_distinct fixed-point pattern; the SQL twin uses HUGEINT)
        return scores.select(
            "node",
            F.expr(
                f"CAST((CAST({col} AS DECIMAL(38,0)) * {int(scale)}) "
                f"div {int(mx)}L AS BIGINT)"
            ).alias(col),
        )

    if int(iterations) <= 0:
        e.unpersist()
        return nodes.select(
            "node",
            F.lit(0).cast("long").alias("auth_int"),
            F.lit(int(scale)).cast("long").alias("hub_int"),
        )
    auth = hub = None
    for it in range(int(iterations)):
        if hub is None:
            # first half-step: every node's hub is `scale`, so the
            # per-dst sum is exactly in_deg · scale — no join needed
            sums = e.groupBy(F.col("dst").alias("node")).agg(
                (F.count(F.lit(1)) * int(scale)).cast("long").alias("auth_int")
            )
        else:
            sums = (
                e.join(hub.withColumnRenamed("node", "src"), "src")
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("hub_int").cast("long").alias("auth_int"))
            )
        auth = _norm(sums, "auth_int")
        hub = _norm(
            e.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth_int").cast("long").alias("hub_int")),
            "hub_int",
        )
    # auth/hub are localCheckpointed by the final _norm calls and
    # nodes is checkpointed, so the edge table can be released
    # without changing the result plan (the pagerank_integer leak
    # fix, applied here too)
    e.unpersist()
    return (
        nodes.join(auth, "node", "left")
        .join(hub, "node", "left")
        .select(
            "node",
            F.coalesce("auth_int", F.lit(0)).cast("long").alias("auth_int"),
            F.coalesce("hub_int", F.lit(0)).cast("long").alias("hub_int"),
        )
    )


def triangle_census(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Exact per-node triangle counts over an undirected simple graph
    (the compact-community / link-farm signal that complements
    PageRank's authority score in web-corpus curation: spam clusters
    are triangle-dense, legitimate topical hubs are star-shaped).
    Returns ``(node, degree, triangles, wedges)`` for every node on
    either edge side — all exact int64, so the row value-hashes
    cross-engine. The local clustering coefficient is the exact
    rational ``2·triangles / wedges`` with ``wedges =
    degree·(degree−1)``; it is left as the integer (numerator-half,
    denominator) pair rather than a float so the census stays
    bit-identical (callers divide at the edge of the system — the
    pagerank_integer convention).

    Algorithm: degree-ordered edge orientation (Cohen 2009 / the
    classic MapReduce triangle enumeration; also Suri & Vassilvitskii
    WWW'11). Every undirected edge is oriented from the endpoint with
    the SMALLER ``(degree, node)`` total order to the larger, which
    makes the oriented out-degree of every node O(√m) on any graph —
    wedge volume is Σ d⁺(v)² ≤ m^1.5 instead of the Σ d(v)² blow-up a
    naive self-join suffers on skewed web graphs (a 10⁷-degree hub
    contributes zero wedges unless BOTH endpoints are equally hot).
    Each triangle is then enumerated EXACTLY ONCE at its lowest-order
    apex, and per-node counts come from exploding the three corners.

    Self-loops are dropped; duplicate/reversed edges collapse (the
    edge SET is the signal, matching pagerank_integer). Scale shape:
    distinct-edge shuffle, one degree agg, two joins to stamp
    endpoint orders, the wedge self-join (shuffled by apex), the
    closing join (shuffled by (lo, hi)) and the final corner census —
    every exchange is on a key whose cardinality grows with the data,
    nothing broadcasts an unbounded side, no cartesian anywhere."""
    # canonical undirected simple edge set: (a, b) with a < b
    s = F.col(src).cast("string")
    d = F.col(dst).cast("string")
    e = (
        edges.select(
            F.least(s, d).alias("a"), F.greatest(s, d).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .persist()
    )
    # stamp each endpoint's degree, then orient by (degree, node):
    # lo = the smaller endpoint under the total order, hi = the larger
    ed = (
        e.join(deg.select(F.col("node").alias("a"), F.col("degree").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("degree").alias("db")), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
        F.when(a_first, F.col("da")).otherwise(F.col("db")).alias("dlo"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dhi"),
    ).persist()
    # wedges at the lowest-order apex u: pairs (v, w) of out-neighbors
    # with order(v) < order(w); a triangle exists iff (v, w) is itself
    # an oriented edge (v is v→w's lo side by transitivity of the
    # total order, so ONE equi-join closes the wedge)
    lhs = oriented.select(
        F.col("lo").alias("u"), F.col("hi").alias("v"), F.col("dhi").alias("dv")
    )
    rhs = oriented.select(
        F.col("lo").alias("u"), F.col("hi").alias("w"), F.col("dhi").alias("dw")
    )
    wedges = lhs.join(rhs, "u").filter(
        (F.col("dv") < F.col("dw"))
        | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    )
    tris = wedges.join(
        oriented.select(F.col("lo").alias("v"), F.col("hi").alias("w")),
        ["v", "w"],
    ).select("u", "v", "w")
    corner_counts = (
        tris.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    # materialize the census, then RELEASE the static tables: persists
    # without unpersist pin blocks for the session lifetime, and a
    # bare unpersist would silently re-derive e/deg/oriented on the
    # caller's first action (the pagerank_integer leak fix, applied
    # here too — round-10 ADVICE finding)
    out = (
        deg.join(corner_counts, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
            (F.col("degree") * (F.col("degree") - 1)).cast("long").alias("wedges"),
        )
        .localCheckpoint(eager=True)
    )
    for cached in (e, deg, oriented):
        cached.unpersist()
    return out


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 100,
) -> DataFrame:
    """k-core decomposition (membership form): iteratively peel nodes
    of degree < k until the remaining subgraph — the k-core — is
    stable, and return its nodes with their IN-CORE degree. The
    standard web/graph-curation prefilter (Seidman 1983; crawl-graph
    spam rings and dense citation cores are k-core structures), and a
    cheaper precursor to triangle/community analysis at 100 TB scale:
    each peel round only needs a degree census and a semi-join.

    Reference scope note: the reference engine ships no graph
    operators; this extends the repo's web/graph curation family
    (pagerank_integer, hits_integer, triangle_census).

    Self-loops are dropped; duplicate/reversed edges collapse (the
    edge SET is the signal, matching triangle_census). Determinism:
    the k-core is a unique fixpoint — peel order cannot change the
    result — so the output is a pure function of the edge set.

    Scale shape: per round, one degree aggregation (map-side partial)
    over the live edge set plus one broadcast-or-shuffle semi-join of
    edges against the surviving-node census; the live edge set only
    shrinks. Rounds are bounded by the peeling depth (graph diameter
    in practice, ≤ ``max_iter`` hard cap); lineage is cut with an
    eager localCheckpoint per round (the pagerank/duplicate_clusters
    cadence), so the iterated plan stays flat and cached blocks are
    released on return."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    s = F.col(src).cast("string")
    d = F.col(dst).cast("string")
    live = (
        edges.select(
            F.least(s, d).alias("a"), F.greatest(s, d).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = live.count()
    converged = n_edges == 0
    for _ in range(max_iter):
        if n_edges == 0:
            break
        deg = (
            live.select(F.col("a").alias("node"))
            .unionAll(live.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("degree"))
        )
        good = deg.filter(F.col("degree") >= k).select("node")
        nxt = (
            live.join(good.withColumnRenamed("node", "a"), "a", "leftsemi")
            .join(good.withColumnRenamed("node", "b"), "b", "leftsemi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        n_nxt = nxt.count()
        if n_nxt == n_edges:
            live = nxt
            converged = True
            break
        live, n_edges = nxt, n_nxt
        if n_edges == 0:
            converged = True
            break
    if not converged:
        # A long chain at k=2 peels only its endpoints per round, so
        # crawl-graph tails can need O(path length) rounds; returning
        # the partially-peeled set would silently violate the unique-
        # fixpoint contract in the docstring (round-10 ADVICE).
        raise RuntimeError(
            f"kcore(k={k}) did not converge within max_iter={max_iter} "
            f"rounds ({n_edges} live edges remain); raise max_iter — the "
            "peel is monotone, so resuming strictly shrinks the edge set"
        )
    return (
        live.select(F.col("a").alias("node"))
        .unionAll(live.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
