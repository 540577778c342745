"""Minimal self-contained XLSX codec (no third-party Excel libs).

XLSX is a ZIP of XML parts (ECMA-376 SpreadsheetML). This module
implements the small subset the reference's Excel extractor/loader
exercises (reference:src/etl_framework/plugins/extractors/excel_extractor.py,
plugins/loaders/file_loader.py:262-280): one rectangular sheet, first
row = header, string/number cells. It exists so the Excel path is fully
TESTABLE in environments without openpyxl — ``sources.readers.read_excel``
prefers pandas+openpyxl when present and falls back to this parser.

Scale note: Excel files are small by construction (the format caps at
~10^6 rows); both directions run driver-side and the parsed frame is
Arrow-converted into a distributed DataFrame immediately.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


def _col_index(cell_ref: str) -> int:
    """'A1' -> 0, 'AB12' -> 27."""
    letters = re.match(r"[A-Z]+", cell_ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _cell_value(c: ET.Element, shared: list[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        tnode = c.find(f"{_NS}is/{_NS}t")
        return None if tnode is None else tnode.text or ""
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "str":
        return v.text
    if t == "b":
        return v.text == "1"
    num = float(v.text)
    return int(num) if num.is_integer() else num


def parse_xlsx(path: str, sheet: int | str = 0) -> tuple[list[str], list[list]]:
    """Parse one sheet -> (header, rows). Rows are padded to header
    width; first sheet row is the header (pandas ``read_excel``
    default)."""
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rel_target = {
            r.get("Id"): r.get("Target").lstrip("/") for r in rels
        }
        sheets = wb.find(f"{_NS}sheets")
        chosen = None
        for i, s in enumerate(sheets):
            if (isinstance(sheet, int) and i == sheet) or s.get("name") == sheet:
                chosen = rel_target[s.get(f"{_REL_NS}id")]
                break
        if chosen is None:
            raise ValueError(f"sheet {sheet!r} not found")
        if not chosen.startswith("xl/"):
            chosen = "xl/" + chosen
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            ss = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in ss:
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        ws = ET.fromstring(z.read(chosen))
        grid: list[list] = []
        for row in ws.find(f"{_NS}sheetData") or []:
            cells: dict[int, object] = {}
            for c in row.findall(f"{_NS}c"):
                ref = c.get("r")
                ci = _col_index(ref) if ref else len(cells)
                cells[ci] = _cell_value(c, shared)
            width = max(cells) + 1 if cells else 0
            grid.append([cells.get(i) for i in range(width)])
    if not grid:
        return [], []
    width = max(len(r) for r in grid)
    grid = [r + [None] * (width - len(r)) for r in grid]
    header = [str(h) if h is not None else f"col{i}" for i, h in enumerate(grid[0])]
    return header, grid[1:]


def write_xlsx(path: str, header: list[str], rows: list[list], sheet_name: str = "Sheet1") -> None:
    """Write one sheet (inline strings — no sharedStrings part)."""

    def esc(s: str) -> str:
        return (
            str(s)
            .replace("&", "&amp;")
            .replace("<", "&lt;")
            .replace(">", "&gt;")
        )

    def cell(v) -> str:
        if v is None:
            return "<c/>"
        if isinstance(v, bool):
            return f'<c t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, (int, float)):
            return f"<c><v>{v}</v></c>"
        return f'<c t="inlineStr"><is><t xml:space="preserve">{esc(v)}</t></is></c>'

    body = "".join(
        "<row>" + "".join(cell(v) for v in r) + "</row>"
        for r in [list(header)] + [list(r) for r in rows]
    )
    ws = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{body}</sheetData></worksheet>"
    )
    wb = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{esc(sheet_name)}" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" '
        'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/worksheets/sheet1.xml", ws)
