"""Keep the driver contract and docs honest:
- every oracle_sql key has a queries() twin;
- every q_* name cited in COVERAGE.md exists;
- every query runs at sf0.001 and returns a stable schema (what the
  driver's smoke check assumes)."""

import re

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_every_oracle_has_a_query():
    qs = set(entrymod.queries())
    missing = set(entrymod.oracle_sql()) - qs
    assert not missing, f"oracle_sql keys without queries(): {missing}"


def test_coverage_doc_names_real_queries():
    qs = set(entrymod.queries())
    doc = open("COVERAGE.md").read()
    cited = set(re.findall(r"`(q_\w+)`", doc))
    unknown = cited - qs
    assert not unknown, f"COVERAGE.md cites unknown queries: {unknown}"


def test_all_queries_run_and_have_columns(spark):
    qs = entrymod.queries()
    for name, fn in qs.items():
        df = fn(spark, SF)
        assert df.columns, name
        # driver hash-compares sorted column names — they must be unique
        assert len(df.columns) == len(set(df.columns)), name


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert len(df.collect()) > 0


def test_window_slots_are_all_oracled():
    """Round-3 policy: the driver value-checks the FIRST 50 queries();
    a rows-only query in the window burns a slot that can never turn
    green (CORRECTNESS_r02's no_oracle row) — every slot must carry an
    oracle."""
    qs = list(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    window = qs[:50]
    missing = [name for name in window if name not in oracles]
    assert not missing, f"window slots without oracles: {missing}"
