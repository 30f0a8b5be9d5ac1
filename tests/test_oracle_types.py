"""Arrow-types regression gate for every DuckDB oracle.

The only driver failure mode observed across rounds 1-4 was a TYPE
mismatch invisible to fetchall(): DuckDB ``SUM()`` over an integer
column returns HUGEINT, which serializes as ``decimal128(38,0)``
through Arrow while Spark emits int64 — a typed value hasher sees
``Decimal(5) != int(5)`` even though fetchall() coerces both to 5.

This test runs EVERY oracle through DuckDB at sf0.001, materializes
its Arrow schema, and fails if any output column is a decimal type.
Engine outputs are int64/float64/string/bool/date by construction, so
a decimal column in an oracle is always an uncast aggregate bug.

It also snapshots the full Arrow type signature per oracle so any
future type drift (e.g. an edit that turns a BIGINT into a DOUBLE)
fails loudly here before the driver sees it.
"""

import json
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()
SNAPSHOT = os.path.join(os.path.dirname(__file__), "oracle_types_snapshot.json")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return c


@pytest.fixture(scope="module")
def arrow_schemas(con):
    out = {}
    for name, sql in entrymod.oracle_sql().items():
        tbl = con.sql(sql).arrow()
        if hasattr(tbl, "read_all"):
            tbl = tbl.read_all()
        out[name] = {f.name: str(f.type) for f in tbl.schema}
    return out


def test_no_oracle_emits_decimal(arrow_schemas):
    bad = {
        name: {c: t for c, t in schema.items() if "decimal" in t}
        for name, schema in arrow_schemas.items()
    }
    bad = {k: v for k, v in bad.items() if v}
    assert not bad, (
        "oracles emitting decimal128 (uncast HUGEINT aggregate — wrap in "
        f"CAST(... AS BIGINT)): {json.dumps(bad, indent=2)}"
    )


def test_oracle_types_match_snapshot(arrow_schemas):
    """Snapshot check: regenerate with
    ``python -m pytest tests/test_oracle_types.py --snapshot-update``
    is intentionally NOT provided — edit the JSON deliberately when an
    oracle's contract changes, so type drift is always a reviewed diff."""
    if not os.path.exists(SNAPSHOT):
        with open(SNAPSHOT, "w") as f:
            json.dump(arrow_schemas, f, indent=1, sort_keys=True)
        pytest.skip("snapshot created — commit tests/oracle_types_snapshot.json")
    with open(SNAPSHOT) as f:
        want = json.load(f)
    drift = {}
    for name, schema in arrow_schemas.items():
        if name not in want:
            drift[name] = {"new_oracle": schema}
        elif want[name] != schema:
            drift[name] = {"was": want[name], "now": schema}
    assert not drift, (
        "oracle Arrow type drift (update tests/oracle_types_snapshot.json "
        f"deliberately if intended): {json.dumps(drift, indent=2)}"
    )
