"""Native XLSX read/write with zero third-party deps — SURVEY.md §2.1 S4.

The reference loads the crime dataset with ``pd.read_excel(path,
na_values='?')`` (replication_package/src/getdataset.py:167). Spark has
no Excel source and this container has no pandas Excel engine, but an
.xlsx file is just a ZIP of SpreadsheetML XML — stdlib ``zipfile`` +
``xml.etree`` parse it completely:

- ``xl/workbook.xml``       sheet names → relationship ids
- ``xl/_rels/workbook.xml.rels``  relationship ids → sheet paths
- ``xl/sharedStrings.xml``  shared-string table (cells with t="s")
- ``xl/worksheets/sheetN.xml``    rows of cells; each cell carries its
  A1-style ref, an optional type (s=shared, inlineStr, str=formula
  string, b=bool, e=error; absent=numeric) and a value

Excel inputs are config-scale (one crime workbook, ~2k rows), never
data-scale, so parsing happens driver-side and promotes to a Spark
DataFrame — the same topology pandas-based loaders use, minus the
engine dependency. The writer exists so tests and fixtures can produce
genuine workbooks (both shared-string and inline-string variants).
"""

from __future__ import annotations

import re
import zipfile
from collections.abc import Sequence
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """A1-style column letters → 0-based index (A=0, Z=25, AA=26)."""
    m = _CELL_REF.match(ref)
    idx = 0
    for ch in m.group(1):
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _text_of(elem) -> str:
    """Concatenated text of every <t> descendant (rich-text runs)."""
    return "".join(t.text or "" for t in elem.iter() if t.tag.endswith("}t"))


def parse_xlsx(path: str, sheet: int | str = 0) -> list[list]:
    """Parse one worksheet into a dense list of rows (Python values:
    str/int/float/bool/None). ``sheet`` selects by position or name."""
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rel_target = {
            r.get("Id"): r.get("Target") for r in rels if r.tag.endswith("}Relationship")
        }
        sheets = []  # (name, path-in-zip)
        for s in wb.iter():
            if not s.tag.endswith("}sheet"):
                continue
            rid = s.get(
                "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
            )
            target = rel_target[rid].lstrip("/")
            if not target.startswith("xl/"):
                target = "xl/" + target
            sheets.append((s.get("name"), target))
        if isinstance(sheet, str):
            target = dict(sheets)[sheet]
        else:
            target = sheets[sheet][1]

        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            sst = ET.fromstring(z.read("xl/sharedStrings.xml"))
            shared = [_text_of(si) for si in sst if si.tag.endswith("}si")]

        ws = ET.fromstring(z.read(target))

    rows: list[dict[int, object]] = []
    width = 0
    for row in ws.iter():
        if not row.tag.endswith("}row"):
            continue
        cells: dict[int, object] = {}
        for c in row:
            if not c.tag.endswith("}c"):
                continue
            ref = c.get("r")
            ci = _col_index(ref) if ref else (max(cells) + 1 if cells else 0)
            ctype = c.get("t", "n")
            v = None
            for child in c:
                if child.tag.endswith("}v"):
                    v = child.text
                elif child.tag.endswith("}is"):  # inline string
                    v = _text_of(child)
                    ctype = "_inline"
            if v is None:
                val = None
            elif ctype == "s":
                val = shared[int(v)]
            elif ctype in ("_inline", "str"):
                val = v
            elif ctype == "b":
                val = v == "1"
            elif ctype == "e":
                val = None
            else:  # numeric
                f = float(v)
                val = int(f) if f.is_integer() and "." not in v and "E" not in v.upper() else f
            cells[ci] = val
            width = max(width, ci + 1)
        rows.append(cells)
    return [[r.get(i) for i in range(width)] for r in rows]


def read_excel_table(
    path: str,
    na_values: Sequence[str] = ("?",),
    sheet: int | str = 0,
) -> tuple[list[str], list[list]]:
    """First row → header, NA sentinels → None — the shape
    ``pd.read_excel(path, na_values=...)`` produces for the crime
    loader. Returns (column names, data rows)."""
    grid = parse_xlsx(path, sheet=sheet)
    if not grid:
        return [], []
    header = [str(h) if h is not None else f"_c{i}" for i, h in enumerate(grid[0])]
    na = set(na_values)
    data = [
        [None if (isinstance(v, str) and v in na) else v for v in row]
        for row in grid[1:]
    ]
    return header, data


def write_xlsx(
    path: str,
    header: Sequence[str],
    rows: Sequence[Sequence],
    use_shared_strings: bool = True,
) -> None:
    """Write a minimal genuine .xlsx (one sheet). Strings go through
    the shared-string table or inline — both variants exercised in
    tests so the reader covers real-world producers of either kind."""
    shared: dict[str, int] = {}

    def cell_xml(ref: str, v) -> str:
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v!r}</v></c>'
        s = str(v)
        if use_shared_strings:
            idx = shared.setdefault(s, len(shared))
            return f'<c r="{ref}" t="s"><v>{idx}</v></c>'
        return f'<c r="{ref}" t="inlineStr"><is><t>{escape(s)}</t></is></c>'

    def col_letter(i: int) -> str:
        out = ""
        i += 1
        while i:
            i, rem = divmod(i - 1, 26)
            out = chr(ord("A") + rem) + out
        return out

    all_rows = [list(header)] + [list(r) for r in rows]
    row_xml = []
    for ri, row in enumerate(all_rows, start=1):
        cells = "".join(
            cell_xml(f"{col_letter(ci)}{ri}", v) for ci, v in enumerate(row)
        )
        row_xml.append(f'<row r="{ri}">{cells}</row>')

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{ns}"><sheetData>{"".join(row_xml)}</sheetData></worksheet>'
    )
    sst_items = "".join(
        f"<si><t>{escape(s)}</t></si>"
        for s, _ in sorted(shared.items(), key=lambda kv: kv[1])
    )
    sst = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<sst xmlns="{ns}" count="{len(shared)}" uniqueCount="{len(shared)}">{sst_items}</sst>'
    )
    rel_ns = "http://schemas.openxmlformats.org/package/2006/relationships"
    doc_rel = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    workbook = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{ns}" xmlns:r="{doc_rel}">'
        f'<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{rel_ns}">'
        f'<Relationship Id="rId1" Type="{doc_rel}/worksheet" Target="worksheets/sheet1.xml"/>'
        f'<Relationship Id="rId2" Type="{doc_rel}/sharedStrings" Target="sharedStrings.xml"/>'
        f"</Relationships>"
    )
    root_rels = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{rel_ns}">'
        f'<Relationship Id="rId1" Type="{doc_rel}/officeDocument" Target="xl/workbook.xml"/>'
        f"</Relationships>"
    )
    ctypes = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        '<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>'
        "</Types>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", ctypes)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
        z.writestr("xl/sharedStrings.xml", sst)
