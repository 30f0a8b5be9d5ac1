"""Skew-mitigated joins.

AQE's skew-join handling only splits SORT-MERGE join partitions that
materialize as skewed at runtime; when you already KNOW the hot keys
(from ``counting.heavy_hitters`` — the standard pre-pass on web/event
data where one domain or user dwarfs the rest), salting the join
up-front bounds the largest task deterministically and works for any
join strategy.

``salted_join`` implements the classic recipe: the small side's rows
for HOT keys replicate once per salt, the big side's hot rows pick a
deterministic salt from their row hash, and COLD keys keep salt 0 —
so the replication cost is |hot dim rows|·n_salts, never a full-table
blow-up, and the result is row-for-row identical to the plain join
(pinned by tests and the q_skew_salted_join census oracle).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_SALT = "__salt"


def salted_join(
    facts: DataFrame,
    dims: DataFrame,
    keys: "Sequence[str] | str",
    n_salts: int = 16,
    hot_keys: "Sequence | None" = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``facts`` (big, possibly skewed) with ``dims``
    (small) on ``keys``, salting the HOT keys so no single reduce
    task carries a hot key's entire fact mass.

    ``hot_keys``: values of the (single-column) hot key set, e.g.
    the output of ``heavy_hitters``; None salts EVERY key (correct,
    but costs |dims|·n_salts replication — use the hot list when you
    have it). Multi-column keys salt on the full tuple.

    Determinism: the fact-side salt is ``pmod(xxhash64(keys...,
    fact columns...), n_salts)`` — a pure function of row content, so
    retries and engines agree. Any salt assignment is CORRECT (each
    fact row meets every dim row of its key exactly once because the
    dim replica set covers all salts); the hash only balances load.

    ``how``: 'inner' or 'left' (facts-preserving). Dim-preserving
    joins would need the reverse salting — out of scope."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    keys = [keys] if isinstance(keys, str) else list(keys)
    n = int(n_salts)
    if n < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    if hot_keys is not None and len(keys) != 1:
        raise ValueError("hot_keys pruning supports single-column keys")
    for side, cols in (("facts", facts.columns), ("dims", dims.columns)):
        if _SALT in cols:
            raise ValueError(
                f"salted_join reserves the column name {_SALT!r}; "
                f"rename it in {side} first"
            )

    dims_s = _salted_dims(dims, keys, n, hot_keys)
    if hot_keys is None:
        fact_salt = F.pmod(F.xxhash64(*[F.col(c) for c in facts.columns]), F.lit(n))
    else:
        hot = [F.lit(v) for v in hot_keys]
        is_hot_fact = F.col(keys[0]).isin(*hot) if hot else F.lit(False)
        fact_salt = F.when(
            is_hot_fact,
            F.pmod(F.xxhash64(*[F.col(c) for c in facts.columns]), F.lit(n)),
        ).otherwise(F.lit(0))
    facts_s = facts.withColumn(_SALT, fact_salt.cast("int"))
    return facts_s.join(dims_s, keys + [_SALT], how).drop(_SALT)


def _salted_dims(dims: DataFrame, keys, n: int, hot_keys) -> DataFrame:
    """The replicated small side: HOT rows once per salt, COLD rows a
    single salt-0 replica — the cost contract (|hot|·n_salts, never a
    table blow-up) that test_salted_join_replication_is_hot_only pins
    directly."""
    salts = dims.sparkSession.range(n).select(
        F.col("id").cast("int").alias(_SALT)
    )
    if hot_keys is None:
        return dims.crossJoin(F.broadcast(salts))
    hot = [F.lit(v) for v in hot_keys]
    is_hot = F.col(keys[0]).isin(*hot) if hot else F.lit(False)
    return (
        dims.filter(is_hot).crossJoin(F.broadcast(salts))
    ).unionByName(dims.filter(~is_hot).withColumn(_SALT, F.lit(0)))
