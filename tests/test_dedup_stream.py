"""Streaming incremental dedup: first-wins index maintenance across
micro-batches, batch/stream symmetry, and replay idempotence."""

import shutil
import tempfile
import time

import pyspark.sql.functions as F
import pytest

from demv_spark.operators import dedup
from demv_spark.streaming.dedup_stream import streaming_dedup_maintainer

PREFIX = "t_dedupstream"


def _drop_index(spark, prefix=PREFIX):
    from tests.conftest import drop_table_and_dir

    for suffix in ("_sigs", "_bands", "_matches", "__meta"):
        drop_table_and_dir(spark, f"{prefix}{suffix}")


@pytest.fixture()
def index(spark):
    _drop_index(spark)
    yield PREFIX
    _drop_index(spark)


def _run(spark, docs_dir, index_prefix, **kw):
    schema = spark.read.parquet(docs_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    q = streaming_dedup_maintainer(stream, index_prefix, **kw)
    q.awaitTermination(120)


def test_cross_batch_planted_dups(spark, index):
    d = tempfile.mkdtemp(prefix="demv_dstream_")
    try:
        texts = [
            (i, f"unique document number {i} with several distinct tokens inside it")
            for i in range(10)
        ]
        batch1 = spark.createDataFrame(texts, "doc_id long, text string")
        batch1.coalesce(1).write.mode("append").parquet(d)
        time.sleep(1.1)  # distinct mtimes → deterministic file order
        # 10..14 duplicate 0..4 exactly; 15..19 fresh
        batch2 = spark.createDataFrame(
            [(i + 10, texts[i][1]) for i in range(5)]
            + [(i, f"completely fresh text number {i} nothing like the others")
               for i in range(15, 20)],
            "doc_id long, text string",
        )
        batch2.coalesce(1).write.mode("append").parquet(d)

        _run(spark, d, index)

        matches = {
            r["doc_id"]: r["dup_of"]
            for r in spark.table(f"{index}_matches").collect()
        }
        assert matches == {10: 0, 11: 1, 12: 2, 13: 3, 14: 4}
        accepted = {r["doc_id"] for r in spark.table(f"{index}_sigs").collect()}
        assert accepted == set(range(10)) | set(range(15, 20))
        # exact duplicates estimate jaccard 1.0
        ests = [r["est_jaccard"] for r in spark.table(f"{index}_matches").collect()]
        assert all(e == 1.0 for e in ests)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_single_batch_equals_batch_rule(spark, index):
    """One micro-batch must reject exactly the docs that pair with a
    smaller id at/above threshold in the batch pipeline."""
    d = tempfile.mkdtemp(prefix="demv_dstream_")
    try:
        rows = [(i, "the quick brown fox jumps over the lazy dog variant " + str(i % 4))
                for i in range(24)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        docs.coalesce(1).write.mode("append").parquet(d)
        _run(spark, d, index, threshold=0.7)

        pairs = dedup.minhash_lsh_pairs(docs, num_hashes=32, bands=8)
        expect_rejected = {
            r["id_b"]
            for r in pairs.filter(F.col("est_jaccard") >= 0.7).collect()
        }
        got_rejected = {
            r["doc_id"] for r in spark.table(f"{index}_matches").collect()
        }
        assert got_rejected == expect_rejected
        accepted = {r["doc_id"] for r in spark.table(f"{index}_sigs").collect()}
        assert accepted == set(range(24)) - expect_rejected
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_short_docs_accepted_but_not_banded(spark, index):
    d = tempfile.mkdtemp(prefix="demv_dstream_")
    try:
        docs = spark.createDataFrame(
            [(1, "tiny"), (2, "tiny"), (3, "a long enough document with many tokens here")],
            "doc_id long, text string",
        )
        docs.coalesce(1).write.mode("append").parquet(d)
        _run(spark, d, index)
        accepted = {r["doc_id"] for r in spark.table(f"{index}_sigs").collect()}
        assert accepted == {1, 2, 3}  # short docs never near-dup candidates
        banded = {r["doc_id"] for r in spark.table(f"{index}_bands").collect()}
        assert banded == {3}
        assert spark.table(f"{index}_matches").count() == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_replayed_batch_is_skipped(spark, index):
    """foreachBatch replay (same batch_id) must not double-append."""
    from demv_spark.streaming import dedup_stream as ds

    docs = spark.createDataFrame(
        [(1, "some sufficiently long document text for shingling")],
        "doc_id long, text string",
    )
    # drive the merge closure directly, as the engine would on replay
    captured = {}

    def fake_start():
        raise AssertionError("not used")

    # build the closure via the public API without starting a stream
    class _FakeWriter:
        def __init__(self):
            self.fn = None

        def outputMode(self, _):
            return self

        def foreachBatch(self, fn):
            captured["fn"] = fn
            return self

        def trigger(self, **_):
            return self

        def start(self):
            return None

    class _FakeStream:
        writeStream = _FakeWriter()

    streaming_dedup_maintainer(_FakeStream(), PREFIX)
    merge = captured["fn"]
    merge(docs, 0)
    n1 = spark.table(f"{PREFIX}_sigs").count()
    merge(docs, 0)  # replay
    assert spark.table(f"{PREFIX}_sigs").count() == n1


ADM_PREFIX = "t_admstream"


def _drop_admission(spark, prefix=ADM_PREFIX):
    from tests.conftest import drop_table_and_dir

    for suffix in ("_verdicts", "__meta"):
        drop_table_and_dir(spark, f"{prefix}{suffix}")


@pytest.fixture()
def adm_index(spark):
    _drop_admission(spark)
    yield ADM_PREFIX
    _drop_admission(spark)


def _run_admission(spark, docs_dir, index_prefix, **kw):
    from demv_spark.streaming.dedup_stream import streaming_admission_maintainer

    schema = spark.read.parquet(docs_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    q = streaming_admission_maintainer(stream, index_prefix, **kw)
    q.awaitTermination(120)
    # foreachBatch writes run in a cloned session; refresh the outer
    # session's file-index cache before reading (see admitted_fps)
    spark.catalog.refreshTable(f"{index_prefix}_verdicts")


def test_streaming_admission_equals_batch_admitted_set(spark, adm_index):
    from demv_spark.streaming.dedup_stream import admitted_fps

    d = tempfile.mkdtemp(prefix="demv_admstream_")
    try:
        # fps with planted dups across and within batches
        rows = [(i, f"fp{i % 7}") for i in range(20)]
        b1 = spark.createDataFrame(rows[:8], "doc_id long, fp string")
        b1.coalesce(1).write.mode("append").parquet(d)
        time.sleep(1.1)
        b2 = spark.createDataFrame(rows[8:], "doc_id long, fp string")
        b2.coalesce(1).write.mode("append").parquet(d)

        _run_admission(spark, d, adm_index)

        got = {
            r["doc_id"]
            for r in spark.table(f"{adm_index}_verdicts")
            .filter("verdict = 'admitted'")
            .collect()
        }
        # batch twin over the whole feed at once
        whole = spark.createDataFrame(rows, "doc_id long, fp string")
        empty = spark.createDataFrame([], "fp string")
        want = {
            r["doc_id"]
            for r in dedup.incremental_admission(whole, empty)
            .filter("verdict = 'admitted'")
            .collect()
        }
        assert got == want == set(range(7))   # first id per fp wins
        # every input row got exactly one verdict
        assert spark.table(f"{adm_index}_verdicts").count() == 20
        # the derived store holds exactly the admitted fingerprints
        fps = {r["fp"] for r in admitted_fps(spark, adm_index).collect()}
        assert fps == {f"fp{i}" for i in range(7)}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_admission_replay_is_idempotent(spark, adm_index):
    d = tempfile.mkdtemp(prefix="demv_admstream_")
    try:
        b1 = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "b")], "doc_id long, fp string"
        )
        b1.coalesce(1).write.mode("append").parquet(d)
        _run_admission(spark, d, adm_index)
        n_verdicts = spark.table(f"{adm_index}_verdicts").count()

        # replay: a fresh run on the same directory restarts batch
        # ids at 0 (new implicit checkpoint), so every batch id is
        # <= the stored high-water mark and merge() must skip it —
        # the verdict log must be EXACTLY unchanged
        _run_admission(spark, d, adm_index)
        assert spark.table(f"{adm_index}_verdicts").count() == n_verdicts
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_admission_crash_replay_duplicates_exactly(spark, adm_index):
    """Simulated crash-before-meta-advance: drop the high-water mark
    after a completed run and replay the whole feed. Every batch must
    recompute BYTE-IDENTICAL verdict rows (store = admitted of
    strictly-earlier batches only), so the log holds exactly 2x each
    original row — never a contradictory verdict — and the DISTINCT
    read surface (admitted_fps) is unchanged: admission stays
    exactly-once even though delivery is at-least-once."""
    from collections import Counter

    from demv_spark.streaming.dedup_stream import admitted_fps

    d = tempfile.mkdtemp(prefix="demv_admstream_")
    try:
        rows = [(i, f"fp{i % 3}") for i in range(6)]
        b1 = spark.createDataFrame(rows[:4], "doc_id long, fp string")
        b1.coalesce(1).write.mode("append").parquet(d)
        time.sleep(1.1)
        b2 = spark.createDataFrame(rows[4:], "doc_id long, fp string")
        b2.coalesce(1).write.mode("append").parquet(d)
        _run_admission(spark, d, adm_index)
        before = Counter(
            map(tuple, spark.table(f"{adm_index}_verdicts").collect())
        )
        fps_before = sorted(
            r["fp"] for r in admitted_fps(spark, adm_index).collect()
        )

        spark.sql(f"DROP TABLE IF EXISTS {adm_index}__meta")  # the crash
        _run_admission(spark, d, adm_index)

        after = Counter(
            map(tuple, spark.table(f"{adm_index}_verdicts").collect())
        )
        assert after == Counter({k: 2 * v for k, v in before.items()})
        assert sorted(
            r["fp"] for r in admitted_fps(spark, adm_index).collect()
        ) == fps_before
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_dedup_maintainer_crash_replay_duplicates_exactly(spark, index):
    """ADVICE r6: a crash between the three appends and the __meta
    advance used to leave PERMANENT duplicate index rows. With the
    batch_id-tagged derived-store design, a replayed batch recomputes
    byte-identical rows (its own partial append is excluded by
    batch_id < current), so the logs gain only exact duplicates and
    the deduping read surfaces are unchanged."""
    from collections import Counter

    from demv_spark.streaming import dedup_stream as ds

    captured = {}

    class _FakeWriter:
        def outputMode(self, _):
            return self

        def foreachBatch(self, fn):
            captured["fn"] = fn
            return self

        def trigger(self, **_):
            return self

        def start(self):
            return None

    class _FakeStream:
        writeStream = _FakeWriter()

    ds.streaming_dedup_maintainer(_FakeStream(), PREFIX)
    merge = captured["fn"]

    texts = [
        (i, f"unique document number {i} with several distinct tokens inside it")
        for i in range(6)
    ]
    b0 = spark.createDataFrame(texts[:4], "doc_id long, text string")
    # 10 duplicates doc 0 (cross-batch), 4/5 fresh
    b1 = spark.createDataFrame(
        [(10, texts[0][1])] + texts[4:], "doc_id long, text string"
    )
    merge(b0, 0)
    merge(b1, 1)
    accepted_before = sorted(
        (r["doc_id"],) for r in ds.dedup_accepted(spark, PREFIX).collect()
    )
    matches_before = sorted(
        map(tuple, ds.dedup_matches(spark, PREFIX).collect())
    )
    sig_counts = Counter(
        r["doc_id"] for r in spark.table(f"{PREFIX}_sigs").collect()
    )
    assert matches_before == [(10, 0, 1.0)]

    # the crash: batch 1's appends landed but __meta still says 0
    spark.createDataFrame([(0,)], "last_batch_id long").write.mode(
        "overwrite"
    ).saveAsTable(f"{PREFIX}__meta")
    merge(b1, 1)  # replay

    # logs: batch-1 rows exactly doubled, batch-0 rows untouched
    sig_counts_after = Counter(
        r["doc_id"] for r in spark.table(f"{PREFIX}_sigs").collect()
    )
    for doc in (0, 1, 2, 3):
        assert sig_counts_after[doc] == sig_counts[doc]
    for doc in (4, 5):
        assert sig_counts_after[doc] == 2 * sig_counts[doc]
    # verdicts: same single match, never contradictory, read surfaces unchanged
    assert sorted(
        map(tuple, ds.dedup_matches(spark, PREFIX).collect())
    ) == matches_before
    assert sorted(
        (r["doc_id"],) for r in ds.dedup_accepted(spark, PREFIX).collect()
    ) == accepted_before


def test_admission_store_is_bucketed_and_join_reuses_distribution(
    spark, adm_index
):
    """The verdict store is fp-bucketed (round-10 VERDICT item 5):
    the per-batch store read scans Bucketed, so the fp-keyed distinct
    and join get the history already hash-distributed — only the
    batch side exchanges."""
    import re

    from demv_spark.operators.dedup import incremental_admission
    from demv_spark.plans.introspect import explain_str

    d = tempfile.mkdtemp(prefix="demv_admbuck_")
    try:
        rows = [(i, f"fp{i % 40}") for i in range(100)]
        spark.createDataFrame(rows, "doc_id long, fp string").coalesce(
            1
        ).write.mode("append").parquet(d)
        _run_admission(spark, d, adm_index)
        store = (
            spark.table(f"{adm_index}_verdicts")
            .filter((F.col("verdict") == "admitted") & (F.col("batch_id") < 1))
            .select("fp")
        )
        batch = spark.createDataFrame(
            [(200 + i, f"fp{i}") for i in range(30)], "doc_id long, fp string"
        )
        plan = explain_str(incremental_admission(batch, store), "simple")
        assert "Bucketed: true" in plan, plan
        # one hash exchange (the batch's fp window); the store side is
        # either bucketed-SMJ (no exchange) or broadcast at this size
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_append_state_table_legacy_layout_fallback(spark):
    """ADVICE r11: a maintainer resuming over a state table created
    by the PRE-bucketed code must not die — append_state_table
    retries the append in the table's existing (plain) layout when
    the bucket/partition spec mismatches, and only then."""
    from tests.conftest import drop_table_and_dir

    from demv_spark.streaming.state import append_state_table

    t = "t_legacy_state"
    drop_table_and_dir(spark, t)
    try:
        # legacy table: PLAIN append, no bucketing
        spark.createDataFrame(
            [(1, "fp1", "admitted", 0)],
            "doc_id long, fp string, verdict string, batch_id long",
        ).write.mode("append").saveAsTable(t)
        nxt = spark.createDataFrame(
            [(2, "fp2", "admitted", 1)],
            "doc_id long, fp string, verdict string, batch_id long",
        )
        # bucketed append over the legacy table: falls back, appends
        append_state_table(nxt, t, bucket_cols=["fp"])
        assert spark.table(t).count() == 2
        # a REAL analysis error (missing column) must still raise
        bad = spark.createDataFrame([(3,)], "doc_id long")
        with pytest.raises(Exception):
            append_state_table(bad, t, bucket_cols=["fp"])
    finally:
        drop_table_and_dir(spark, t)
    # fresh table: the helper creates it in the bucketed layout
    t2 = "t_fresh_state"
    drop_table_and_dir(spark, t2)
    try:
        append_state_table(
            spark.createDataFrame(
                [(1, "fp1", "admitted", 0)],
                "doc_id long, fp string, verdict string, batch_id long",
            ),
            t2, bucket_cols=["fp"],
        )
        desc = {
            r["col_name"]: r["data_type"]
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {t2}").collect()
        }
        assert desc.get("Num Buckets") == "32", desc
    finally:
        drop_table_and_dir(spark, t2)


def test_admission_maintainer_survives_legacy_plain_store(spark, adm_index):
    """End-to-end ADVICE r11 scenario: verdicts were written by the
    pre-bucketed maintainer (plain layout); the upgraded maintainer
    appends new batches into the same table instead of raising, and
    admission semantics against the legacy store are unchanged."""
    d = tempfile.mkdtemp(prefix="demv_admlegacy_")
    try:
        rows = [(i, f"fp{i % 7}") for i in range(20)]
        b1 = spark.createDataFrame(rows[:8], "doc_id long, fp string")
        b1.coalesce(1).write.mode("append").parquet(d)
        _run_admission(spark, d, adm_index)

        # downgrade the store to the legacy plain layout in place
        vt = f"{adm_index}_verdicts"
        legacy_rows = spark.table(vt).collect()
        from tests.conftest import drop_table_and_dir

        drop_table_and_dir(spark, vt)
        spark.createDataFrame(
            legacy_rows,
            "doc_id long, fp string, verdict string, batch_id long",
        ).write.mode("append").saveAsTable(vt)

        time.sleep(1.1)
        b2 = spark.createDataFrame(rows[8:], "doc_id long, fp string")
        b2.coalesce(1).write.mode("append").parquet(d)
        _run_admission(spark, d, adm_index)

        got = {
            r["doc_id"]
            for r in spark.table(vt).filter("verdict = 'admitted'").collect()
        }
        whole = spark.createDataFrame(rows, "doc_id long, fp string")
        empty = spark.createDataFrame([], "fp string")
        want = {
            r["doc_id"]
            for r in dedup.incremental_admission(whole, empty)
            .filter("verdict = 'admitted'")
            .collect()
        }
        assert got == want == set(range(7))
    finally:
        shutil.rmtree(d, ignore_errors=True)
