"""Native XLSX reader (sources/xlsx.py + readers.read_excel, S4):
write genuine workbooks with the stdlib writer (shared-string AND
inline-string variants), read them back through the Spark promotion,
and check the crime-loader semantics (header row, '?' NA sentinel,
pandas-like column typing)."""

import pytest

from demv_spark.sources.readers import read_excel
from demv_spark.sources.xlsx import parse_xlsx, read_excel_table, write_xlsx

HEADER = ["state", "pop", "score", "flagged", "note"]
ROWS = [
    ["CA", 100, 1.5, True, "ok"],
    ["NY", 200, 2.0, False, "?"],
    ["TX", 300, 2.5, True, None],
]


@pytest.mark.parametrize("shared", [True, False])
def test_xlsx_roundtrip_both_string_modes(tmp_path, shared):
    p = str(tmp_path / f"t_{shared}.xlsx")
    write_xlsx(p, HEADER, ROWS, use_shared_strings=shared)
    grid = parse_xlsx(p)
    assert grid[0] == HEADER
    assert grid[1] == ROWS[0]
    assert grid[2][4] == "?"          # sentinel survives the raw parse
    assert grid[3][4] is None          # empty cell -> None


def test_read_excel_table_applies_na_sentinel(tmp_path):
    p = str(tmp_path / "t.xlsx")
    write_xlsx(p, HEADER, ROWS)
    header, data = read_excel_table(p, na_values=("?",))
    assert header == HEADER
    assert data[1][4] is None          # '?' -> None, like pd na_values
    assert data[0][4] == "ok"


def test_read_excel_spark_types_and_values(spark, tmp_path):
    p = str(tmp_path / "t.xlsx")
    write_xlsx(p, HEADER, ROWS)
    df = read_excel(spark, p)
    assert dict(df.dtypes) == {
        "state": "string", "pop": "bigint", "score": "double",
        "flagged": "boolean", "note": "string",
    }
    rows = {r["state"]: r for r in df.collect()}
    assert rows["NY"]["note"] is None and rows["CA"]["note"] == "ok"
    assert rows["TX"]["pop"] == 300 and rows["CA"]["score"] == 1.5


def test_read_excel_mixed_int_float_promotes_to_double(spark, tmp_path):
    p = str(tmp_path / "t.xlsx")
    write_xlsx(p, ["x"], [[1], [2.5], [3]])
    df = read_excel(spark, p)
    assert dict(df.dtypes) == {"x": "double"}
    assert sorted(r["x"] for r in df.collect()) == [1.0, 2.5, 3.0]


def test_parse_xlsx_sheet_by_name(tmp_path):
    p = str(tmp_path / "t.xlsx")
    write_xlsx(p, ["a"], [[1]])
    assert parse_xlsx(p, sheet="Sheet1")[0] == ["a"]
    with pytest.raises(KeyError):
        parse_xlsx(p, sheet="Nope")
