"""Composed streaming corpus ingest — the end-to-end curation
pipeline run incrementally.

The batch curation chain (`__spark_entry__.q_corpus_curation_e2e`:
canonical URL → blocklist → quality → quota, with split assignment
composed downstream of the verdicts) is built from
operators that are individually stream-safe: the hygiene/scoring/
split steps are stateless column algebra (identical plans under
``readStream``), and the quota is the one genuinely stateful step
(`stateful.streaming_quota_admission`). This module composes them
into one streaming DAG, so a crawl feed curates incrementally with
EXACTLY the batch semantics:

- admission verdicts are append-only (replaying more of the stream
  never revokes one — the streaming-quota property);
- every map-only column (canon URL, blocked flag, quality, split) is
  a pure function of the row, so stream and batch emit identical
  values row-for-row;
- the composition is tested for stream==batch equality end-to-end
  (tests/test_stateful_streaming.py), not just per-operator.

At 100 TB-a-day crawl scale this is the shape you want: the scoring
scan is map-only (no shuffle, watermark-free), and the only state is
one counter per key — O(domains), not O(rows).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from demv_spark.operators import web
from demv_spark.operators.text import quality_score
from demv_spark.streaming.stateful import streaming_quota_admission


def streaming_curate(
    df: DataFrame,
    url_col: str,
    text_col: str,
    id_col: str,
    cap_per_domain: int,
    blocklist: Sequence[str] = (),
    min_quality: float = 0.0,
) -> DataFrame:
    """Incremental curation verdicts for a streaming document feed.

    Returns (key, id, admitted) from the stateful quota: rows REJECTED
    by hygiene (blocked domain, quality below threshold) never reach
    the quota — they are absent from the output, mirroring the batch
    chain where the quota ranks survivors only. Works identically on a
    batch DataFrame (the quota falls back to its single-pass batch
    twin), which is what the equivalence test pins.

    Split assignment composes DOWNSTREAM, not here: the quota
    operator's output is projected to its verdict schema, so apply
    ``corpus.split_by_hash(verdicts, ["key"])`` on the admitted rows
    — it is a pure map-only function of the key, hence identical under
    streaming or batch, and putting it before the quota would compute
    md5 splits for rows the quota then drops from the output anyway.
    """
    if blocklist:
        d = web.flag_blocked_domains(
            df, blocklist, url_col=url_col,
            domain_out="__domain", flag_out="__blocked",
        ).filter(F.col("__blocked") == 0).drop("__blocked")
    else:
        d = df.withColumn("__domain", web.extract_domain(F.col(url_col)))
    d = quality_score(d, text_col, out="__q").filter(
        F.col("__q") >= F.lit(float(min_quality))
    )
    return streaming_quota_admission(d, "__domain", id_col, cap=cap_per_domain)
