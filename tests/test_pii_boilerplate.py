"""PII redaction + per-domain boilerplate removal (round-6 curation
additions)."""

import pyspark.sql.functions as F
import pytest

from demv_spark.operators import pii
from demv_spark.operators.boilerplate import boilerplate_lines, strip_boilerplate
from demv_spark.plans.introspect import plan_stats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "contact me at alice@example.com or +1 555 867 5309 ok"),
        (1, "server at 192.168.1.100 and card 4111 1111 1111 1111"),
        (2, "ssn 123-45-6789 appears here twice 123-45-6789"),
        (3, "no pii at all in this one"),
        (4, None),
        (5, "bob@sub.domain.org and carol@x.io emails only"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_pii_counts_per_type(docs):
    got = {r["doc_id"]: r for r in pii.pii_counts(docs).collect()}
    assert got[0]["n_email"] == 1 and got[0]["n_phone"] == 1
    assert got[1]["n_ipv4"] == 1 and got[1]["n_credit_card"] == 1
    assert got[2]["n_ssn"] == 2
    assert got[3]["n_pii"] == 0
    assert got[4]["n_pii"] == 0          # NULL text = no hits, row kept
    assert got[5]["n_email"] == 2
    assert got[0]["n_pii"] == 2


def test_redact_replaces_with_placeholders(docs):
    got = {r["doc_id"]: r["text_redacted"] for r in pii.redact_pii(docs).collect()}
    assert got[0] == "contact me at <EMAIL> or <PHONE> ok"
    assert got[1] == "server at <IP> and card <CARD>"
    assert got[2] == "ssn <SSN> appears here twice <SSN>"
    assert got[3] == "no pii at all in this one"
    assert got[4] == ""                  # NULL text redacts to empty


def test_redact_order_card_before_phone(spark):
    """A 16-digit card must become ONE <CARD>, not a corrupted mix of
    phone placeholder and leftover digits — the documented ordering
    property."""
    df = spark.createDataFrame(
        [(0, "pay 4111 1111 1111 1111 now")], ["doc_id", "text"]
    )
    got = pii.redact_pii(df).collect()[0]["text_redacted"]
    assert got == "pay <CARD> now"
    assert "1111" not in got


def test_pii_ops_are_map_only(docs):
    s = plan_stats(pii.redact_pii(pii.pii_counts(docs)))
    assert s["n_exchanges"] == 0
    assert not s["has_python_udf"]


def test_pii_census_single_row(docs):
    row = pii.pii_census(docs).collect()
    assert len(row) == 1
    r = row[0]
    assert r["n_docs"] == 6
    assert r["total_email"] == 3 and r["docs_email"] == 2
    assert r["total_ssn"] == 2 and r["docs_ssn"] == 1
    assert r["n_docs_any_pii"] == 4
    # one fused aggregate pass
    s = plan_stats(pii.pii_census(docs))
    assert len(s["read_schemas"]) <= 1
    assert s["n_exchanges"] <= 2         # partial + final only


@pytest.fixture(scope="module")
def sites(spark):
    """3 docs on site a share a header; footer on 2 of 3; body unique.
    Site b has its own header on both docs — thresholds are per-key."""
    rows = [
        (0, "a", "WELCOME TO A\nbody zero\nfooter-x"),
        (1, "a", "WELCOME TO A\nbody one\nfooter-x"),
        (2, "a", "WELCOME TO A\nbody two"),
        (3, "b", "B HOME\nbody three"),
        (4, "b", "B HOME\nbody four\nWELCOME TO A"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "site", "text"])


def test_boilerplate_lines_thresholds(sites):
    bp = {(r["site"], r["line"]) for r in
          boilerplate_lines(sites, "site", min_frac=0.6, min_docs=2).collect()}
    # header on a: 3/3 docs; footer-x: 2/3 = 0.66 >= 0.6; bodies: 1/3
    assert ("a", "WELCOME TO A") in bp
    assert ("a", "footer-x") in bp
    assert ("b", "B HOME") in bp
    # a's header on ONE b doc is 1/2 = 0.5 < 0.6 -> not boilerplate FOR b
    assert ("b", "WELCOME TO A") not in bp
    assert not any(l.startswith("body") for _, l in bp)


def test_strip_preserves_line_order(sites):
    got = {r["doc_id"]: r["text_clean"] for r in
           strip_boilerplate(sites, "site", min_frac=0.6, min_docs=2).collect()}
    assert got[0] == "body zero"
    assert got[1] == "body one"
    assert got[2] == "body two"
    assert got[3] == "body three"
    # b kept a's header (below b's threshold), order preserved
    assert got[4] == "body four\nWELCOME TO A"


def test_strip_all_boilerplate_doc_becomes_empty(spark):
    df = spark.createDataFrame(
        [(0, "s", "same"), (1, "s", "same"), (2, "s", "same\nextra")],
        ["doc_id", "site", "text"],
    )
    got = {r["doc_id"]: r["text_clean"] for r in
           strip_boilerplate(df, "site", min_frac=0.9, min_docs=2).collect()}
    assert got[0] == "" and got[1] == ""
    assert got[2] == "extra"


def test_strip_no_python_udf(sites):
    s = plan_stats(strip_boilerplate(sites, "site"))
    assert not s["has_python_udf"]


def test_strip_identity_when_nothing_flagged(spark):
    """Split→census→join→reassemble must be LOSSLESS when no line
    meets the thresholds: awkward shapes (leading/trailing/double
    newlines = empty lines, repeated line inside ONE doc, NULL text)
    round-trip exactly."""
    rows = [
        (0, "s", "\nleading empty"),
        (1, "s", "trailing empty\n"),
        (2, "s", "a\n\nb"),
        (3, "s", "dup\ndup\nmiddle\ndup"),
        (4, "s", ""),
        (5, "s", None),
        (6, "t", "x"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "site", "text"])
    got = {r["doc_id"]: r["text_clean"] for r in
           strip_boilerplate(df, "site", min_frac=0.99, min_docs=99).collect()}
    for doc_id, _, text in rows:
        assert got[doc_id] == (text or ""), doc_id


def test_pii_counts_match_duckdb_on_fuzz(spark):
    """Cross-engine regex parity under deterministic fuzz: the same
    pattern strings must count identically in Java regex and RE2 over
    adversarial inputs (near-miss PII, boundary digits, punctuation
    runs, unicode)."""
    import random

    import duckdb

    rng = random.Random(7)
    alphabet = "ab1@.- +()é京\n<>:/0345"
    rows = [(i, "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60))))
            for i in range(40)]
    rows += [
        (100, "x 4111 1111 1111 1111 y 123-45-6789 z a@b.co +1 23 456 7890"),
        (101, "192.168.0.1.2.3 10.0.0.256 999-99-9999"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in pii.pii_counts(df).collect()}
    con = duckdb.connect()
    for doc_id, text in rows:
        for name, (pat, _) in pii.PII_TYPES.items():
            (n,) = con.execute(
                "SELECT len(regexp_extract_all(coalesce(?, ''), ?))",
                [text, pat],
            ).fetchone()
            assert got[doc_id][f"n_{name}"] == n, (doc_id, name, text)


def test_redact_identity_when_no_pii(spark):
    """The ordered regexp_replace chain must be byte-identity on text
    with lookalike-but-not-matching content."""
    rows = [
        (0, "almost@ an email but no tld dot"),
        (1, "1234 5678 is not a full card"),
        (2, "v1.2.3.4000 is no ip (4-digit octet ok? 4000 > 999 but regex allows 1-3 digits only)"),
        (3, "ssn-ish 123-45-678 too short"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["text_redacted"] for r in pii.redact_pii(df).collect()}
    for doc_id, text in rows:
        assert got[doc_id] == text, doc_id


def test_dedup_lines_keeps_first_occurrence_order(spark):
    from demv_spark.operators.text import dedup_lines

    df = spark.createDataFrame(
        [
            (1, "alpha\nnav bar\nbeta\nnav bar\nalpha\ngamma"),
            (2, "only one line"),
            (3, None),
            (4, "x\n\nx\n\ny"),   # blank lines dedupe too
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_lines"], r["n_unique"], r["text_dedup"])
           for r in dedup_lines(df).collect()}
    assert got[1] == (6, 4, "alpha\nnav bar\nbeta\ngamma")
    assert got[2] == (1, 1, "only one line")
    assert got[3] == (1, 1, "")
    assert got[4] == (5, 3, "x\n\ny")


def test_dedup_lines_map_only(spark):
    from demv_spark.operators.text import dedup_lines
    from demv_spark.plans.introspect import plan_stats

    df = spark.createDataFrame([(1, "a\nb")], "doc_id long, text string")
    s = plan_stats(dedup_lines(df))
    assert not s["has_python_udf"]
