"""CSV parsing through a REAL foreign backend (the stdlib ``csv`` module's
C-accelerated reader/writer).

A CSV file is exactly one table, so the span model is a single ``table``
span whose text uses the suite's canonical grid encoding (rows joined by
newline, cells by " | " — the same encoding docx/xlsx tables use, see
kernels/office.py). ``render_csv`` emits RFC-4180 CSV via ``csv.writer``
(quoting makes cells containing commas/quotes/newlines round-trip
exactly); ``parse_csv`` recovers the grid via ``csv.reader``. This is the
third-party-parser seam proof for tabular input, alongside docutils (rst),
expat (html), charset_normalizer (decode) and Pygments (code enrichment).

Reference analog: docling's CSV backend converts a .csv into a
one-table DoclingDocument (format router in
docling_serve/docling_conversion.py:72-79 delegates per-format).
"""

from __future__ import annotations

import csv
import io

CSV_KINDS = {"table"}


def render_csv(spans: list[dict]) -> bytes:
    """The document's single table span → CSV bytes (generator side)."""
    tables = [s for s in spans if s["kind"] == "table"]
    if len(tables) != 1:
        raise ValueError(f"a CSV document is exactly one table, got {len(tables)}")
    rows = [r.split(" | ") for r in tables[0]["text"].split("\n")]
    buf = io.StringIO()
    w = csv.writer(buf, lineterminator="\n")
    w.writerows(rows)
    return buf.getvalue().encode("utf-8")


def parse_csv(payload: bytes, doc_id: str) -> list[dict]:
    """CSV payload → the one ``table`` span, via ``csv.reader``. An empty
    file yields an empty-grid table (one empty cell), matching what
    ``render_csv`` produces for it.

    Grid-injectivity contract: the canonical encoding joins cells with
    " | " and rows with a newline, so an RFC-4180 quoted cell that itself
    contains the cell delimiter or an embedded newline CANNOT be
    represented losslessly — it would silently corrupt cell/row
    boundaries (the render_csv round-trip stops being injective). Such
    cells are REJECTED loudly here; convert_document turns the raise into
    a failure row with the cell coordinates, the same continue-on-error
    path malformed utf-8 takes."""
    text = payload.decode("utf-8")
    rows = [r for r in csv.reader(io.StringIO(text))]
    if not rows:
        rows = [[""]]
    # short-circuit: a cell can only break the grid if the raw text holds a
    # pipe, a quote (the only way to embed a newline), or a bare CR
    needs_scan = "|" in text or '"' in text or "\r" in text
    for ri, r in enumerate(rows) if needs_scan else ():
        for ci, cell in enumerate(r):
            if " | " in cell or "\n" in cell or "\r" in cell:
                raise ValueError(
                    f"csv cell r{ri}c{ci} contains the grid delimiter or a "
                    "newline — not representable in the canonical ' | ' grid "
                    "encoding (doc would corrupt on round-trip)"
                )
    span = {"kind": "table", "text": "\n".join(" | ".join(r) for r in rows)}

    from .office import _finalize

    return _finalize([span], doc_id)
