"""Minimal self-contained PDF table codec (no third-party PDF libs).

Counterpart of ``sources/xlsx.py`` for the PDF path (reference S4): a
writer that emits simple single-font, uncompressed-content-stream PDFs
with one text cell per ``BT..Td..Tj..ET`` block, and a parser that
recovers (page, row, cells) by scanning content streams for positioned
text and clustering by y coordinate (same-row cells share a baseline;
columns order by x). This covers the machine-generated report PDFs the
reference's extractor targets; scanned/compressed documents still need
pdfplumber, which ``readers.read_pdf_tables`` prefers when installed.

Scale note: like Excel, single PDFs are small; the DISTRIBUTED part of
the pipeline is the ``binaryFile`` scan + ``mapInPandas`` decode in
``readers.read_pdf_tables`` — this module is the per-document codec
those executor batches call.
"""

from __future__ import annotations

import re
import zlib


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _unesc(s: str) -> str:
    return (
        s.replace(r"\(", "(").replace(r"\)", ")").replace(r"\\", "\\")
    )


def write_simple_pdf(path: str, pages: list[list[list[str]]]) -> None:
    """Write one table per page: ``pages[p][r][c]`` is the cell text.

    Layout: column c at x = 50 + 110c, row r at y = 760 - 18r, 10 pt
    Helvetica, uncompressed content streams, correct xref."""
    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)  # 1-based object number

    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    page_ids: list[tuple[int, int]] = []
    for rows in pages:
        parts = []
        for r, row in enumerate(rows):
            for c, cell in enumerate(row):
                if cell is None:
                    continue
                x, y = 50 + 110 * c, 760 - 18 * r
                parts.append(
                    f"BT /F1 10 Tf {x} {y} Td ({_esc(str(cell))}) Tj ET"
                )
        stream = "\n".join(parts).encode()
        content = add(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        )
        page_ids.append((content, 0))
    pages_obj_num = len(objs) + len(pages) + 1
    real_page_ids = []
    for content, _ in page_ids:
        pid = add(
            (
                f"<< /Type /Page /Parent {pages_obj_num} 0 R "
                f"/MediaBox [0 0 612 792] /Contents {content} 0 R "
                f"/Resources << /Font << /F1 {font} 0 R >> >> >>"
            ).encode()
        )
        real_page_ids.append(pid)
    kids = " ".join(f"{p} 0 R" for p in real_page_ids)
    pages_obj = add(
        f"<< /Type /Pages /Kids [{kids}] /Count {len(real_page_ids)} >>".encode()
    )
    assert pages_obj == pages_obj_num
    catalog = add(f"<< /Type /Catalog /Pages {pages_obj} 0 R >>".encode())

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, catalog, xref_at)
    )
    with open(path, "wb") as f:
        f.write(bytes(out))


_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.S)
_TEXT_RE = re.compile(
    rb"([\d.+-]+)\s+([\d.+-]+)\s+Td\s*\((.*?(?<!\\))\)\s*Tj", re.S
)


def parse_simple_pdf_tables(
    data: bytes, y_tolerance: float = 3.0
) -> list[list[list[str]]]:
    """Recover tables from a simple PDF: one table per page; cells
    sharing a text baseline (|dy| <= y_tolerance) form a row; rows
    order top-down, cells left-to-right. Handles uncompressed and
    Flate-compressed content streams."""
    pages: list[list[list[str]]] = []
    for m in _STREAM_RE.finditer(data):
        meta, stream = m.group(1), m.group(2)
        if b"FlateDecode" in meta:
            try:
                stream = zlib.decompress(stream.strip(b"\r\n"))
            except zlib.error:
                continue
        cells = [
            (float(t.group(2)), float(t.group(1)), _unesc(t.group(3).decode("latin-1")))
            for t in _TEXT_RE.finditer(stream)
        ]
        if not cells:
            continue
        rows: list[list[tuple[float, str]]] = []
        row_y: list[float] = []
        for y, x, text in sorted(cells, key=lambda c: (-c[0], c[1])):
            if row_y and abs(row_y[-1] - y) <= y_tolerance:
                rows[-1].append((x, text))
            else:
                rows.append([(x, text)])
                row_y.append(y)
        pages.append([[t for _, t in sorted(r)] for r in rows])
    return pages
