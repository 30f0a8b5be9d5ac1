"""Synthetic oversampling strategies — SURVEY.md §2.5 D11.

The replication scripts' extended API supports
``strategy ∈ {uniform, smote, adasyn}`` (generatemetrics.py:57,133;
uniform is the only one in the shipped library; smote/adasyn came
from imbalanced-learn). Here both synthetic strategies are
implemented natively (imblearn is not a dependency): per-group
k-NN interpolation inside a grouped ``applyInPandas`` — the Arrow
grouped-map path, which is the right Spark shape because every
(sensitive…, label) group must see all its own rows to pick
neighbors, and groups are partitions of a classification table
(bounded size by construction).

Undersampling is shared with the uniform strategy (random exact
deletion); only the oversample delta is synthesized.

Scale path: ``synthetic_rebalance_lsh`` — when a single group
outgrows an executor, the in-group exact k-NN swaps for a
p-stable-style euclidean LSH neighbor join, pure DataFrame algebra
with no Python UDF at all; candidates come from (group, table,
bucket) equi-joins, so no task ever holds a whole group and the cost
is candidates-not-all-pairs.
"""

from __future__ import annotations

import zlib
from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from demv_spark.operators.balancer import rebalance


_KNN_CHUNK = 1024
# groups beyond this size estimate neighbors against a deterministic
# evenly-strided subsample instead of all n rows, bounding the k-NN at
# O(n·cap) work — below the cap the pass is exact
_KNN_REF_CAP = 8192


def _knn_chunked(
    x: np.ndarray,
    rows: np.ndarray,
    kk: int,
    want_dist: bool,
    ref: np.ndarray | None = None,
    threads: int | None = None,
) -> tuple[np.ndarray, np.ndarray | None]:
    """k-NN for the given row indices against ``ref`` (all rows when
    None), GEMM-formulated (‖a‖²+‖b‖²−2a·b) and chunked so peak memory
    is O(chunk·|ref|) — never the (n, n, dim) broadcast the naive form
    materializes, which at ~20k-row groups is gigabytes per task.
    Returned neighbor indices are into ``x`` (mapped through ref).
    Ties at the k-th boundary break by index (argpartition is
    deterministic for a fixed numpy; the within-k order is re-sorted
    by (distance, index) so downstream choice is reproducible).

    Chunks are INDEPENDENT (each writes its own nn/dm slice), so they
    run on a small thread pool (round 12, guide §4.2): the heavy ops
    (GEMM, the elementwise distance fusion, argpartition) all release
    the GIL, and one applyInPandas group is otherwise a single
    Spark task pinning one core while the rest idle. Results are
    bit-identical to the sequential loop — per-chunk arithmetic and
    output slots don't depend on execution order."""
    xr = x if ref is None else x[ref]
    sqr = (xr * xr).sum(axis=1)
    sq = (x * x).sum(axis=1)
    nn = np.empty((len(rows), kk), dtype=np.int64)
    dm = np.empty(len(rows)) if want_dist else None

    def _one(s: int) -> None:
        r = rows[s : s + _KNN_CHUNK]
        # in-place fusion: the GEMM output buffer becomes d2 directly
        # (the naive `sq + sqr - 2*g` allocates two more chunk-sized
        # temporaries and is memory-bandwidth bound — measured ~40% of
        # the kernel)
        d2 = x[r] @ xr.T
        d2 *= -2.0
        d2 += sq[r][:, None]
        d2 += sqr[None, :]
        if ref is None:
            d2[np.arange(len(r)), r] = np.inf
        else:
            # mask self-matches: ref is sorted, so locate each row
            pos = np.searchsorted(ref, r)
            ok = (pos < len(ref)) & (ref[np.minimum(pos, len(ref) - 1)] == r)
            d2[np.arange(len(r))[ok], pos[ok]] = np.inf
        part = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
        pd2 = np.take_along_axis(d2, part, axis=1)
        order = np.lexsort((part, pd2), axis=1)
        sel = np.take_along_axis(part, order, axis=1)
        nn[s : s + len(r)] = sel if ref is None else ref[sel]
        if want_dist:
            dm[s : s + len(r)] = np.sqrt(
                np.maximum(np.take_along_axis(pd2, order, axis=1), 0.0)
            ).mean(axis=1)

    starts = list(range(0, len(rows), _KNN_CHUNK))
    n_threads = _knn_threads(threads)
    if len(starts) <= 1 or n_threads <= 1:
        for s in starts:
            _one(s)
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=n_threads) as pool:
            list(pool.map(_one, starts))
    return nn, dm


def _knn_threads(hint: int | None = None) -> int:
    """Thread count for the chunk pool. Priority: the
    DEMV_SPARK_KNN_THREADS env override, then ``hint`` (the caller's
    driver-side fair share — see ``_knn_thread_share``), then a
    conservative local fallback. The r12 default (cpu_count/2 capped
    at 8 *per task*) assumed a mostly-idle executor; under a full
    local[32] task wave that is up to 8×32 runnable threads and the
    driver's bench measured the oversubscription (VERDICT r12 item 2),
    so an unhinted call now stays modest."""
    import os

    try:
        env = int(os.environ.get("DEMV_SPARK_KNN_THREADS", "0"))
    except ValueError:
        env = 0
    if env > 0:
        return env
    if hint is not None and hint > 0:
        return min(8, hint)
    return max(1, min(4, (os.cpu_count() or 2) // 8))


def _knn_thread_share(df: DataFrame, n_groups: int) -> int:
    """Driver-side fair-share thread hint for the grouped-kNN pool:
    executor cores divided by the group tasks expected to run
    concurrently on one executor (guide §5 — size per-task threads to
    the cores a task can actually claim, not to the machine). With
    fewer groups than task slots the spare cores are real (a group's
    task pins one slot while the rest idle), so the share rises; with
    ≥ slots groups it clamps to spark.task.cpus."""
    sc = df.sparkSession.sparkContext
    conf = sc.getConf()
    task_cpus = max(1, int(conf.get("spark.task.cpus", "1")))
    master = conf.get("spark.master", "")
    cores = None
    if master.startswith("local"):
        import os as _os
        import re as _re

        m = _re.match(r"local\[([0-9*]+)", master)
        if m:
            cores = _os.cpu_count() if m.group(1) == "*" else int(m.group(1))
    if cores is None:
        try:
            cores = int(conf.get("spark.executor.cores", "0")) or None
        except ValueError:
            cores = None
    if not cores:
        return task_cpus
    slots = max(1, cores // task_cpus)
    concurrent = max(1, min(int(n_groups), slots))
    return max(task_cpus, cores // concurrent)


def _ref_subsample(n: int) -> np.ndarray | None:
    """Deterministic neighbor-candidate set for huge groups: every
    ceil(n/cap)-th row (None = use all rows)."""
    if n <= _KNN_REF_CAP:
        return None
    step = -(-n // _KNN_REF_CAP)
    return np.arange(0, n, step)


def _interpolate_group(
    pdf: pd.DataFrame,
    n_new: int,
    feature_cols: list[str],
    k: int,
    seed: int,
    adaptive: bool,
    threads: int | None = None,
) -> pd.DataFrame:
    """SMOTE-style synthesis: new = x + gap·(neighbor − x) over the
    numeric feature space. ``adaptive=True`` (ADASYN flavor) biases
    the base-point choice toward sparser points (larger mean k-NN
    distance) instead of uniform."""
    rng = np.random.RandomState(seed)
    x = pdf[feature_cols].to_numpy(dtype=float)
    n = len(x)
    if n == 1:
        # degenerate group: duplicate the single row
        return pdf.iloc[np.zeros(n_new, dtype=int)].copy()
    kk = min(k, n - 1)
    ref = _ref_subsample(n)
    if ref is not None:
        # d2 has len(ref) columns and one may be the self-match — a
        # caller k above the subsample size must clamp, not crash
        kk = min(kk, len(ref) - 1)

    if adaptive:
        # ADASYN needs every point's sparsity, so the k-NN pass covers
        # all n rows; the reference subsample bounds it at O(n·cap)
        # for huge groups (exact O(n²) below the cap)
        nn_all, density = _knn_chunked(
            x, np.arange(n), kk, want_dist=True, ref=ref, threads=threads
        )
        w = density / density.sum() if density.sum() > 0 else None
        base = rng.choice(n, size=n_new, p=w)
        neigh = nn_all[base, rng.randint(0, kk, size=n_new)]
    else:
        # SMOTE only interpolates from chosen base rows: k-NN runs for
        # the distinct bases (≤ min(n, n_new)), not all n rows
        base = rng.randint(0, n, size=n_new)
        pick = rng.randint(0, kk, size=n_new)
        uniq, inv = np.unique(base, return_inverse=True)
        nn_u, _ = _knn_chunked(x, uniq, kk, want_dist=False, ref=ref, threads=threads)
        neigh = nn_u[inv, pick]
    gap = rng.uniform(size=(n_new, 1))
    synth_x = x[base] + gap * (x[neigh] - x[base])

    out = pdf.iloc[base].copy().reset_index(drop=True)
    for j, c in enumerate(feature_cols):
        vals = synth_x[:, j]
        if not pd.api.types.is_float_dtype(pdf[c]):
            # integer feature: interpolation rounds back to the domain
            vals = np.rint(vals)
        out[c] = vals.astype(pdf[c].dtype, copy=False)
    return out


def synthetic_rebalance(
    df: DataFrame,
    sensitive: Sequence[str],
    label: str,
    targets: list[dict],
    strategy: str = "smote",
    k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Rebalance with synthetic oversampling (smote/adasyn):
    shrinking groups use the exact random-deletion path (shared with
    uniform); growing groups keep all original rows and append
    interpolated synthetic rows up to the target."""
    keys = [*sensitive, label]
    feature_cols = [
        f.name
        for f in df.schema.fields
        if f.name not in keys
        and f.dataType.typeName() in ("double", "float", "integer", "long", "short")
    ]
    if not feature_cols:
        raise ValueError("no numeric feature columns to interpolate")

    shrink = [t for t in targets if t["target"] <= t["n"]]
    grow = [t for t in targets if t["target"] > t["n"]]

    out = rebalance(df, sensitive, label, shrink, seed=seed) if shrink else None

    if grow:
        from demv_spark.operators.balancer import _join_targets

        grow_df = _join_targets(df, keys, grow)
        adaptive = strategy == "adasyn"
        # fair-share thread hint computed ON THE DRIVER (the worker
        # can't see task concurrency): cores / concurrent group tasks
        threads = _knn_thread_share(df, len(grow))

        def synth(pdf: pd.DataFrame) -> pd.DataFrame:
            n_new = int(pdf["__target"].iloc[0] - pdf["__n"].iloc[0])
            base = pdf.drop(columns=["__n", "__target"])
            if n_new <= 0:
                return base
            # stable per-group seed (python hash() is process-dependent)
            key_repr = repr(tuple(pdf[k2].iloc[0] for k2 in keys)).encode()
            gseed = (seed + zlib.crc32(key_repr)) % (2**31)
            new_rows = _interpolate_group(
                base, n_new, feature_cols, k, gseed, adaptive, threads=threads
            )
            return pd.concat([base, new_rows], ignore_index=True)

        grown = grow_df.groupBy(*keys).applyInPandas(synth, schema=df.schema)
        out = grown if out is None else out.unionByName(grown)
    return out if out is not None else df.limit(0)


def synthetic_rebalance_lsh(
    df: DataFrame,
    sensitive: Sequence[str],
    label: str,
    targets: list[dict],
    id_cols: Sequence[str],
    k: int = 5,
    seed: int = 42,
    n_tables: int = 4,
    n_projs: int = 4,
    bucket_width: float | None = None,
    max_bucket: int | None = None,
    strategy: str = "smote",
) -> DataFrame:
    """SMOTE-style rebalance for groups too large for one executor —
    the scale path promised by the module docstring, now implemented.

    ``strategy="adasyn"`` switches BASE-POINT selection from the
    uniform seeded-rank round-robin to density-weighted apportionment
    (the ADASYN idea — synthesize more where the space is sparse):
    each row's density proxy is its mean approximate-kNN distance²,
    each row's quota of the group's (target − n) synthetic rows is
    ``n_new·dens/Σdens`` apportioned by largest remainder (overflow
    wraps round-robin over the remainder rank, so the group emits
    EXACTLY n_new rows even when n_new ≫ n or every density is 0 —
    the zero-density degenerate falls back to the uniform split).
    Deterministic like everything here: the density sums are
    decimal-stable, the remainder rank ties break on portable hashes
    — a pure function of the data across engines and partitionings.
    Neighbor choice, λ and the interpolant are SHARED with the smote
    path, so the planted-line invariants hold for both.

    The exact path's grouped ``applyInPandas`` must hold a whole
    (sensitive…, label) group in one worker and pays O(n²) for the
    in-group kNN. This variant is pure DataFrame algebra end-to-end
    (NO Python UDF of any kind), so no task ever owns more than one
    LSH bucket of one group and the cost is candidates-not-all-pairs:

    1. p-stable-style euclidean LSH: per table t, a row's bucket key
       is ``floor(x·g_{t,i} / w)`` over ``n_projs`` deterministic
       projections (the literal-coefficient generator shared with the
       SRP signatures); neighbors = same (group, table, bucket) —
       an equi-join, never a cross join.
    2. approximate kNN: candidates rank by exact squared distance,
       row_number ≤ k per base row (window keyed by (group, base)).
    3. synthesis: each growing group emits exactly ``target − n``
       rows; base rows are chosen by the portable-hash rank with
       round-robin wraparound (the same seeded-rank machinery the
       uniform resampler uses), the neighbor and the interpolation
       gap λ ∈ [0,1) derive from per-(row, ordinal) portable hashes.
       Rows whose bucket holds no neighbor fall back to duplication
       (the exact path's n==1 semantics).

    Candidate volume is CAPPED (the ``hamming_near_dup`` lesson,
    dedup.py): the neighbor SIDE of the bucket self-join keeps at
    most ``max_bucket`` rows per (group, table, bucket), chosen by a
    deterministic portable-hash rank — so a degenerate bucket (a
    dense cluster at corpus scale) costs |bucket|·max_bucket, never
    |bucket|², and total candidates are ≤ rows·n_tables·max_bucket —
    strictly LINEAR in the data (the 8× probe: 4.4× wall at the old
    flat 256 cap vs ~7.8× uncapped; the k-tied default below holds
    it near-linear because per-base candidate count is constant
    across scales once buckets saturate). Default ``max_bucket=None``
    auto-sizes to ``max(8·k, 40)`` — a kNN needs k neighbors, so a
    deterministic 8k-row sample of each bucket (×n_tables tables)
    loses recall only when a row's true kNN all fall outside it;
    raise ``max_bucket`` to trade cost for within-bucket exactness.

    Every choice is a pure function of the data (md5-derived), so the
    output is reproducible across engines, partitionings and retries.
    Integer feature columns round half-to-even (``bround``), matching
    the exact path's ``np.rint``. ``bucket_width=None`` auto-sizes w
    to half the feature-space standard deviation from one
    decimal-stable aggregate (a 1-row collect), keeping bucket
    occupancy scale-free; tune DOWN for denser data / more recall.
    Shrinking groups share the uniform exact-deletion path.
    """
    from demv_spark.functions.compat import portable_hash, stable_sum
    from demv_spark.operators.balancer import _join_targets, rebalance
    from demv_spark.operators.similarity import _hyperplanes

    if strategy not in ("smote", "adasyn"):
        raise ValueError(f"unknown strategy: {strategy}")
    keys = [*sensitive, label]
    # id_cols are identity, not geometry: excluded from interpolation
    # (synthetic rows inherit their base row's ids)
    feature_cols = [
        f.name
        for f in df.schema.fields
        if f.name not in keys
        and f.name not in set(id_cols)
        and f.dataType.typeName() in ("double", "float", "integer", "long", "short")
    ]
    if not feature_cols:
        raise ValueError("no numeric feature columns to interpolate")
    dim = len(feature_cols)

    shrink = [t for t in targets if t["target"] <= t["n"]]
    grow = [t for t in targets if t["target"] > t["n"]]
    out = rebalance(df, sensitive, label, shrink, seed=seed) if shrink else None
    if not grow:
        return out if out is not None else df.limit(0)

    if bucket_width is None:
        # w ≈ ‖σ‖/2 from one fused decimal-stable aggregate (exact ⇒
        # deterministic under any partitioning)
        aggs = []
        for c in feature_cols:
            x = F.col(c).cast("double")
            aggs += [
                stable_sum(x).alias(f"__s_{c}"),
                stable_sum(x * x).alias(f"__ss_{c}"),
                F.count(x).alias(f"__n_{c}"),
            ]
        st = df.agg(*aggs).collect()[0]
        var_sum = 0.0
        for c in feature_cols:
            n_c = st[f"__n_{c}"]
            if n_c and n_c > 1:
                m = st[f"__s_{c}"] / n_c
                var_sum += max(0.0, st[f"__ss_{c}"] / n_c - m * m)
        bucket_width = max(1e-9, 0.5 * var_sum ** 0.5)

    grow_df = _join_targets(df, keys, grow)
    fid = F.concat_ws("|", *[F.col(c).cast("string") for c in id_cols])
    x_arr = F.array(*[F.col(c).cast("double") for c in feature_cols])
    rows = grow_df.withColumn("__fid", fid).withColumn("__x", x_arr)

    planes = _hyperplanes(dim, n_tables * n_projs, seed)

    def _bucket_key(t: int):
        parts = []
        for i in range(n_projs):
            g = planes[t * n_projs + i]
            d = F.aggregate(
                F.zip_with(
                    F.col("__x"),
                    F.array(*[F.lit(v) for v in g]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            parts.append(F.floor(d / F.lit(float(bucket_width))).cast("string"))
        return F.concat_ws(",", *parts)

    banded = rows.select(
        *keys, "__fid", "__x",
        F.explode(
            F.array(*[
                F.struct(F.lit(t).alias("t"), _bucket_key(t).alias("bk"))
                for t in range(n_tables)
            ])
        ).alias("tb"),
    ).select(*keys, "__fid", "__x", F.col("tb.t").alias("__t"), F.col("tb.bk").alias("__bk"))

    # role-renamed projections (the embedding_near_dup pattern) keep
    # the self-join unambiguous. The NEIGHBOR side is capped per
    # (group, table, bucket) by a deterministic portable-hash rank —
    # see the docstring's candidate-volume contract; ranking a
    # degenerate bucket is O(n log n) in one task vs the O(n²) join
    # it prevents
    if max_bucket is None:
        max_bucket = max(8 * k, 40)
    w_cap = Window.partitionBy(*keys, "__t", "__bk").orderBy(
        portable_hash(F.concat(F.lit("cap:"), F.col("__fid")))
    )
    capped = (
        banded.withColumn("__cn", F.row_number().over(w_cap))
        .filter(F.col("__cn") <= max_bucket)
        .drop("__cn")
    )
    left = banded
    right = capped.select(
        *[F.col(c).alias(f"__r_{i}") for i, c in enumerate(keys)],
        F.col("__fid").alias("__nfid"),
        F.col("__x").alias("__nx"),
        F.col("__t").alias("__rt"),
        F.col("__bk").alias("__rbk"),
    )
    cond = (F.col("__t") == F.col("__rt")) & (F.col("__bk") == F.col("__rbk"))
    cond = cond & (F.col("__fid") != F.col("__nfid"))
    for i, c in enumerate(keys):
        cond = cond & F.col(c).eqNullSafe(F.col(f"__r_{i}"))
    d2 = F.aggregate(
        F.zip_with(F.col("__x"), F.col("__nx"), lambda p, q: (p - q) * (p - q)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # MULTI-table candidates dedup and rank on NARROW rows (ids + the
    # scalar d²); neighbor vectors join back only for the ≤k
    # survivors per base row — shuffling the full __nx array at
    # candidate volume through distinct+window was the anti-pattern
    # embedding_near_dup's first-band rule removed on the cosine
    # side. At n_tables == 1 there is no dedup exchange, so carrying
    # __nx through the single w_knn shuffle is strictly cheaper than
    # the nvecs re-join it replaces (two exchanges + a join, and the
    # downstream groupBy then rides the window's (keys, fid)
    # partitioning exchange-free) — round-10 VERDICT item 1.
    carry_nx = n_tables == 1
    nx_cols = [F.col("__nx")] if carry_nx else []
    cand = left.join(right, cond).select(
        *keys, "__fid", "__nfid", d2.alias("__d2"), *nx_cols
    )
    if n_tables > 1:
        # a (base, nbr) pair appears at most once PER TABLE (each row
        # has exactly one bucket key per table), so the dedup shuffle
        # only pays for itself across tables — at n_tables=1 it is a
        # provable no-op and is skipped (a full exchange at candidate
        # volume, the single heaviest stage of the one-table plan)
        cand = cand.distinct()
    # partition on __fid ALONE: it is globally unique (concat of
    # id_cols), so it determines the group — (keys, __fid) and
    # (__fid) induce the same partitions of the data, but the
    # fid-only spec lets the downstream groupBy (grouping keys ⊇
    # __fid) AND the density join (keyed on __fid) both reuse this
    # one exchange instead of re-shuffling (round-12: the r11 driver
    # row was AQE-job-bound, not data-bound)
    w_knn = Window.partitionBy("__fid").orderBy(
        F.col("__d2").asc(), portable_hash(F.col("__nfid"))
    )
    topk = cand.withColumn("__rk", F.row_number().over(w_knn)).filter(
        F.col("__rk") <= k
    )
    if not carry_nx:
        # multi-table path: re-attach neighbor vectors to the ≤k
        # survivors (1:1 — each __nfid is unique)
        nvecs = rows.select(
            F.col("__fid").alias("__nfid"), F.col("__x").alias("__nx")
        )
        topk = topk.join(nvecs, "__nfid")
    # ONE aggregation over the top-k candidates yields both the
    # neighbor list and (for adasyn) the density census — the r10
    # plan computed them as two groupBys over a persisted topk, which
    # cost an extra candidate-volume shuffle, an extra join at rows
    # volume AND a session-lifetime cache entry (round-10 VERDICT
    # item 1). Aggregating after the 1:1 vector attach leaves the
    # density sums unchanged.
    nbrs = (
        topk.groupBy(*keys, "__fid")
        .agg(
            F.sort_array(F.collect_list(F.struct("__rk", "__nx"))).alias("__nbrs"),
            stable_sum(F.col("__d2")).alias("__ds"),
            F.count(F.lit(1)).alias("__dk"),
        )
    )

    n_new = (F.col("__target") - F.col("__n")).cast("long")
    if strategy == "adasyn":
        # density-weighted apportionment (see docstring): quota =
        # floor(n_new·dens/W) + largest-remainder bonus, overflow
        # wrapped round-robin over the remainder rank so the group
        # emits exactly n_new ordinals in every regime. The density
        # AND the neighbor list ride the same single left join below
        # (dens_tbl IS nbrs), so the candidate pipeline runs exactly
        # once with no persist and seeds carry __nbrs directly.
        dens_tbl = nbrs.select("__fid", "__nbrs", "__ds", "__dk")
        wsum = Window.partitionBy(*keys)
        w_rem = Window.partitionBy(*keys).orderBy(
            F.col("__rem").desc(),
            portable_hash(F.concat(F.lit(f"adasyn{seed}:"), F.col("__fid"))),
        )
        # two selects, not eight withColumns: each withColumn
        # re-analyzes the whole window-heavy plan on the driver, and
        # at this plan size the analysis chatter was a measurable
        # slice of the per-fit wall (round-11 profile)
        dens = F.coalesce(F.col("__ds") / F.col("__dk"), F.lit(0.0))
        # order-independent float sum: decimal-cast window total
        wtot = (
            F.sum(dens.cast("decimal(38,18)")).over(wsum).cast("double")
        )
        share = F.when(wtot > 0, n_new * dens / wtot).otherwise(F.lit(0.0))
        q_ = F.floor(share).cast("long")
        stage1 = rows.join(dens_tbl, "__fid", "left").select(
            "*",
            q_.alias("__q"),
            (share - q_).alias("__rem"),
            (n_new - F.sum(q_).over(wsum)).alias("__L"),
        )
        rows_d = stage1.select(
            "*",
            (F.row_number().over(w_rem) - 1).alias("__rr"),
        ).select(
            "*",
            (
                F.col("__q")
                + F.expr("__L div __n")
                + F.when(
                    F.col("__rr") < F.pmod(F.col("__L"), F.col("__n")),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("__rep"),
        )
        seeds_df = (
            rows_d.filter(F.col("__rep") > 0)
            .withColumn("__e", F.explode(F.sequence(F.lit(1), F.col("__rep"))))
            .withColumn("__j", F.col("__rr") + (F.col("__e") - 1) * F.col("__n"))
            .drop("__ds", "__dk", "__q", "__rem", "__L", "__rr")
        )  # __nbrs already aboard — no second join below
    else:
        # seeded-rank base selection with round-robin wraparound:
        # group g of size n emits exactly (target − n) ordinals
        w_rank = Window.partitionBy(*keys).orderBy(
            portable_hash(F.concat(F.lit(f"smote{seed}:"), F.col("__fid")))
        )
        r = F.row_number().over(w_rank) - 1
        repeats = F.when(
            n_new > r, ((n_new - r - F.lit(1)) / F.col("__n")).cast("long") + 1
        ).otherwise(F.lit(0))
        seeds_df = (
            rows.withColumn("__r", r)
            .withColumn("__rep", repeats)
            .filter(F.col("__rep") > 0)
            .withColumn("__e", F.explode(F.sequence(F.lit(1), F.col("__rep"))))
            .withColumn("__j", F.col("__r") + (F.col("__e") - 1) * F.col("__n"))
        )

    # join on __fid ALONE: it is globally unique (concat of id_cols),
    # so it determines the group — and a [*keys, __fid] equi-join
    # would be null-UNSAFE, silently missing NULL-keyed groups and
    # degrading their synthesis to duplication. The adasyn branch
    # already carried __nbrs in through its density join.
    if strategy == "adasyn":
        picked = seeds_df
    else:
        picked = seeds_df.join(nbrs.select("__fid", "__nbrs"), "__fid", "left")
    jtag = F.concat(F.col("__fid"), F.lit(":"), F.col("__j").cast("string"))
    k_eff = F.coalesce(F.size("__nbrs"), F.lit(0))
    idx = (portable_hash(F.concat(F.lit("nb:"), jtag)) % F.greatest(k_eff, F.lit(1))) + 1
    lam = (portable_hash(F.concat(F.lit("lam:"), jtag)) % F.lit(1_000_000)) / F.lit(1e6)
    nx = F.when(k_eff > 0, F.element_at("__nbrs", idx.cast("int"))["__nx"]).otherwise(
        F.col("__x")
    )
    newx = F.zip_with(F.col("__x"), nx, lambda p, q: p + lam * (q - p))
    synth = picked.withColumn("__newx", newx)
    for i, c in enumerate(feature_cols):
        v = F.element_at("__newx", i + 1)
        if df.schema[c].dataType.typeName() in ("integer", "long", "short"):
            v = F.bround(v).cast(df.schema[c].dataType)
        else:
            v = v.cast(df.schema[c].dataType)
        synth = synth.withColumn(c, v)
    synth = synth.select(*df.columns)

    grown = grow_df.select(*df.columns).unionByName(synth)
    return grown if out is None else out.unionByName(grown)
