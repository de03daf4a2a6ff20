"""Minimal pure-stdlib XLSX reader/writer — the engine fallback that
un-gates Excel IO in environments without openpyxl.

Covers the reference's Excel surface (read/write a sheet of scalars —
/root/reference src/io/excel.rs:185,378) for the driver-scale workbooks
Excel files actually are: xlsx is a ZIP of XML parts with no splittable
layout, so parsing on the driver and parallelizing the rows is the
honest distributed story (the cluster path is "convert to parquet
upstream").

Writer emits inline strings (no sharedStrings part) — always valid,
no string-table bookkeeping. Reader handles both inline strings and
the sharedStrings table so files produced by real Excel/openpyxl load
too. Formulas/styles/dates-as-serials are out of scope (same stance as
the reference, which round-trips values, not formatting).
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"

def _content_types(n_sheets: int) -> str:
    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i}.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.'
        'spreadsheetml.worksheet+xml"/>'
        for i in range(1, n_sheets + 1)
    )
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        f"{overrides}</Types>"
    )


_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""


def _workbook_rels(n_sheets: int) -> str:
    rels = "".join(
        f'<Relationship Id="rId{i}" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        f'Target="worksheets/sheet{i}.xml"/>'
        for i in range(1, n_sheets + 1)
    )
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        f"{rels}</Relationships>"
    )


def _workbook_xml(sheet_names: list[str]) -> str:
    sheets = "".join(
        # attribute context: double quotes must be escaped too (sax
        # escape() alone leaves them, corrupting name="...")
        f'<sheet name="{escape(name, {chr(34): "&quot;"})}" sheetId="{i}" r:id="rId{i}"/>'
        for i, name in enumerate(sheet_names, start=1)
    )
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{sheets}</sheets></workbook>"
    )


def _col_letter(i: int) -> str:
    """0-based column index → A1 letters."""
    out = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _col_index(ref: str) -> int:
    """A1 cell ref → 0-based column index."""
    letters = re.match(r"([A-Z]+)", ref).group(1)
    i = 0
    for ch in letters:
        i = i * 26 + (ord(ch) - ord("A") + 1)
    return i - 1


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        if isinstance(value, float) and value != value:  # NaN → blank
            return ""
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{escape(str(value))}</t></is></c>'


def _sheet_xml(columns: list[str], rows: list[tuple]) -> str:
    body = []
    header_cells = "".join(
        _cell_xml(f"{_col_letter(c)}1", name) for c, name in enumerate(columns)
    )
    body.append(f'<row r="1">{header_cells}</row>')
    for r, row in enumerate(rows, start=2):
        cells = "".join(
            _cell_xml(f"{_col_letter(c)}{r}", v) for c, v in enumerate(row)
        )
        body.append(f'<row r="{r}">{cells}</row>')
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f'<sheetData>{"".join(body)}</sheetData></worksheet>'
    )


def write_xlsx_multi(
    path: str, sheets: "dict[str, tuple[list[str], list[tuple]]]"
) -> None:
    """Write a multi-sheet workbook: ``{sheet_name: (columns, rows)}``
    in dict order (reference multi-sheet Excel surface,
    src/io/excel.rs:480).

    Scope note: the reference's presentation-layer write options
    (column-width hints, cell style/type hints — src/io/excel.rs:378)
    are deliberately out of scope. They are cosmetic workbook styling
    with no effect on round-tripped VALUES, and carrying a style engine
    in a pure-stdlib writer isn't warranted for an analytics sink;
    every reader (including ours) infers types from cell content. Data
    fidelity — multi-sheet, header row, string/number/bool/null cells —
    is fully covered and round-trip-tested."""
    if not sheets:
        raise ValueError("write_xlsx_multi: at least one sheet required")
    names = list(sheets)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _content_types(len(names)))
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _workbook_xml(names))
        z.writestr("xl/_rels/workbook.xml.rels", _workbook_rels(len(names)))
        for i, name in enumerate(names, start=1):
            cols, rows = sheets[name]
            z.writestr(f"xl/worksheets/sheet{i}.xml", _sheet_xml(cols, rows))


def write_xlsx(path: str, columns: list[str], rows: list[tuple], sheet_name: str = "Sheet1") -> None:
    """Write one sheet of scalar rows as a valid xlsx workbook."""
    write_xlsx_multi(path, {sheet_name: (columns, rows)})


def _cell_value(cell, shared: list[str]):
    t = cell.get("t", "n")
    if t == "inlineStr":
        node = cell.find(f"{_NS}is/{_NS}t")
        return node.text or "" if node is not None else ""
    v = cell.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return bool(int(v.text))
    if t == "str":
        return v.text
    num = float(v.text)
    return int(num) if num.is_integer() and "." not in v.text and "e" not in v.text.lower() else num


_R_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


def _sheet_targets(z: zipfile.ZipFile) -> list[tuple[str, str]]:
    """Ordered (sheet_name, zip_part_path) from workbook.xml + its rels
    — workbook order, NOT filename sort (sheet10 would sort before
    sheet2). Falls back to numeric filename order for workbooks missing
    the parts."""
    try:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rel_ns = "{http://schemas.openxmlformats.org/package/2006/relationships}"
        target_by_id = {
            rel.get("Id"): rel.get("Target") for rel in rels.iter(f"{rel_ns}Relationship")
        }
        out = []
        for sheet in wb.iter(f"{_NS}sheet"):
            rid = sheet.get(f"{_R_NS}id")
            target = target_by_id.get(rid)
            if target is None:
                continue
            # OPC target resolution: absolute targets ('/xl/...') are
            # package-rooted; relative ones resolve against xl/
            if target.startswith("/"):
                part = target.lstrip("/")
            elif target.startswith("xl/"):
                part = target
            else:
                part = f"xl/{target}"
            out.append((sheet.get("name"), part))
        if out:
            return out
    except (KeyError, ET.ParseError):
        pass
    parts = [
        n for n in z.namelist() if re.match(r"xl/worksheets/sheet\d+\.xml$", n)
    ]
    parts.sort(key=lambda n: int(re.search(r"(\d+)\.xml$", n).group(1)))
    return [(f"Sheet{i}", p) for i, p in enumerate(parts, start=1)]


def list_sheets(path: str) -> list[str]:
    """Sheet names in workbook order (reference sheet listing,
    src/io/excel.rs:480)."""
    with zipfile.ZipFile(path) as z:
        return [name for name, _ in _sheet_targets(z)]


def sheet_info(path: str) -> list[dict]:
    """Per-sheet metadata: name, n_rows (excluding nothing — raw row
    count), n_cols (widest row) — the reference's workbook-info surface
    (src/io/excel.rs:823)."""
    out = []
    with zipfile.ZipFile(path) as z:
        for name, part in _sheet_targets(z):
            tree = ET.fromstring(z.read(part))
            rows = tree.find(f"{_NS}sheetData").findall(f"{_NS}row")
            width = 0
            for row in rows:
                for pos, cell in enumerate(row.findall(f"{_NS}c")):
                    ref = cell.get("r")
                    ci = _col_index(ref) if ref else pos
                    width = max(width, ci + 1)
            out.append({"name": name, "n_rows": len(rows), "n_cols": width})
    return out


def read_xlsx(
    path: str, sheet: int | str = 0, header: bool = True
) -> tuple[list[str], list[list]]:
    """Read one sheet (by 0-based index or by NAME) → (column_names,
    rows). Ragged rows are padded with None to the widest row."""
    with zipfile.ZipFile(path) as z:
        targets = _sheet_targets(z)
        if isinstance(sheet, str):
            by_name = {name: part for name, part in targets}
            if sheet not in by_name:
                raise KeyError(
                    f"sheet {sheet!r} not found; workbook has {list(by_name)}"
                )
            part = by_name[sheet]
        else:
            part = targets[sheet][1]
        tree = ET.fromstring(z.read(part))
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            sroot = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in sroot.findall(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    raw_rows: list[dict[int, object]] = []
    for row in tree.find(f"{_NS}sheetData").findall(f"{_NS}row"):
        cells = {}
        for pos, cell in enumerate(row.findall(f"{_NS}c")):
            ref = cell.get("r")
            ci = _col_index(ref) if ref else pos
            cells[ci] = _cell_value(cell, shared)
        raw_rows.append(cells)
    if not raw_rows:
        return [], []
    width = max(max(r) + 1 for r in raw_rows if r) if any(raw_rows) else 0
    grid = [[r.get(i) for i in range(width)] for r in raw_rows]
    if header:
        cols = [str(c) if c is not None else f"col{i}" for i, c in enumerate(grid[0])]
        return cols, grid[1:]
    return [f"col{i}" for i in range(width)], grid


def analyze_sheet(path: str, sheet: int | str = 0, header: bool = True) -> list[dict]:
    """Per-column analysis of one sheet (reference per-sheet analysis
    tier, src/io/excel.rs:1094): inferred type, non-null/null counts,
    distinct count, and min/max for numeric columns. Driver-side by
    design — xlsx is a zipped XML DOM, inherently driver-scale; ingest
    to parquet for anything distributed."""
    cols, rows = read_xlsx(path, sheet, header)
    out = []
    for i, name in enumerate(cols):
        values = [r[i] for r in rows]
        present = [v for v in values if v is not None]
        types = {type(v).__name__ for v in present}
        if not present:
            inferred = "empty"
        elif types <= {"int"}:
            inferred = "int"
        elif types <= {"int", "float"}:
            inferred = "float"
        elif types == {"bool"}:
            inferred = "bool"
        elif types == {"str"}:
            inferred = "str"
        else:
            inferred = "mixed"
        info = {
            "column": name,
            "dtype": inferred,
            "n_rows": len(values),
            "n_valid": len(present),
            "n_null": len(values) - len(present),
            "n_distinct": len(set(present)),
        }
        if inferred in ("int", "float"):
            info["min"] = min(present)
            info["max"] = max(present)
        out.append(info)
    return out


def analyze_workbook(path: str, header: bool = True) -> dict[str, list[dict]]:
    """Workbook-wide analysis: {sheet_name: analyze_sheet(...)} over
    every sheet in workbook order (src/io/excel.rs:823,1094)."""
    return {
        name: analyze_sheet(path, name, header) for name in list_sheets(path)
    }
