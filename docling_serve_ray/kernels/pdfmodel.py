"""Synthetic-PDF page-model parsing: layout segmentation, column detection,
reading-order sort, block merge, table-structure recovery, OCR application.

The payload of a synthetic PDF document is a deterministic JSON page model —
the stand-in for parsed PDF geometry (FIXTURES.md T1):

    {"tagged": bool,
     "pages": [{"page_no": 1, "width": W, "height": H,
                "cells": [{"x0","y0","x1","y1","font","text","glyphs",
                           "is_bitmap","from_ocr"}, ...]}]}

The kernels here are the engine's analogs of the reference's model-backed
stages (SURVEY.md §2.3): `classify_cells` + `reading_order` play the layout
model A1 (geometric segmentation + region classification + reading-order
sort), `recover_tables` plays the table-structure model A3 (lattice
clustering of grid cells), and OCR decode (glyph codebook, kernels/glyphs.py)
plays A2/A8. The *pipeline semantics* — gates, modes, ordering — mirror the
reference exactly; the models themselves are deterministic heuristics
(SURVEY.md §7.3 faithfulness boundary).
"""

from __future__ import annotations

import json

HEADER_BAND = 50  # y < margin → page_header region
FOOTER_BAND = 50  # y > height - margin → page_footer region
BLOCK_MERGE_GAP = 20  # vertical gap (pt) under which same-font cells merge
TABLE_CLUSTER_GAP = 30  # vertical gap separating two tables

FONT_KIND = {
    "bold-xlarge": "title",
    "bold-large": "section_header",
    "mono": "code",
    "math": "formula",
    "italic-small": "caption",
}


def parse_payload(payload: bytes) -> dict:
    """Payload → page-model dict. Synthetic corpora ship the model as
    JSON; REAL PDF bytes (%PDF- magic) route through the pypdfium2 seam
    (kernels/pdfreal.py — import-guarded; absent lib → ImportError →
    failure row), after which every downstream kernel runs unchanged."""
    from .pdfreal import PDF_MAGIC, parse_pdf_bytes

    if payload[: len(PDF_MAGIC)] == PDF_MAGIC:
        return parse_pdf_bytes(payload)
    return json.loads(payload.decode("utf-8"))


def page_embedded_texts(doc: dict) -> list[str]:
    """Per-page embedded text layer (non-bitmap cells, geometric order) —
    the analog of pdfplumber page.extract_text() feeding the quality
    analyzer (reference pdf_analysis.py:56-66)."""
    texts = []
    for page in doc["pages"]:
        cells = [c for c in page["cells"] if not c.get("is_bitmap")]
        cells.sort(key=lambda c: (c["y0"], c["x0"]))
        texts.append("\n".join(c["text"] for c in cells if c["text"]))
    return texts


def _cell_effective_text(cell: dict, ocr_mode: str, reverse_codebook) -> str:
    """Apply the OCR mode to one cell (reference mode semantics,
    ocrmypdf_middleware.py:131-168 / docling force_ocr):

    - skip: trust the embedded text layer
    - redo: re-OCR only cells that are bitmaps or whose text came from a
      previous OCR pass (from_ocr)
    - force: re-OCR everything from the rasterized glyphs
    """
    from .glyphs import decode_glyphs

    if ocr_mode == "force":
        return decode_glyphs(cell.get("glyphs", ""), reverse_codebook)
    if ocr_mode == "redo" and (cell.get("is_bitmap") or cell.get("from_ocr")):
        return decode_glyphs(cell.get("glyphs", ""), reverse_codebook)
    if cell.get("is_bitmap"):
        # bitmap-only region with no text layer: OCR it in any mode (docling
        # runs OCR on bitmap-only regions even without force)
        return decode_glyphs(cell.get("glyphs", ""), reverse_codebook)
    return cell["text"]


def detect_columns(body_cells: list[dict], width: float) -> int:
    """2-column iff both halves are populated and no body cell crosses the
    midline. Header/footer band cells are excluded by the caller."""
    if not body_cells:
        return 1
    mid = width / 2.0
    left = [c for c in body_cells if c["x1"] <= mid]
    right = [c for c in body_cells if c["x0"] >= mid]
    if left and right and len(left) + len(right) == len(body_cells):
        return 2
    return 1


def reading_order(cells: list[dict], width: float, height: float) -> list[dict]:
    """Geometric reading order: header band (top→bottom), then body in
    column-major order (left column fully, then right), then footer band."""
    header = [c for c in cells if c["y1"] <= HEADER_BAND]
    footer = [c for c in cells if c["y0"] >= height - FOOTER_BAND]
    inband = {id(c) for c in header} | {id(c) for c in footer}
    body = [c for c in cells if id(c) not in inband]

    ncols = detect_columns(body, width)
    key = lambda c: (c["y0"], c["x0"])
    header.sort(key=key)
    footer.sort(key=key)
    if ncols == 2:
        mid = width / 2.0
        left = sorted((c for c in body if c["x1"] <= mid), key=key)
        right = sorted((c for c in body if c["x0"] >= mid), key=key)
        body = left + right
    else:
        body.sort(key=key)
    return header + body + footer


def merge_blocks(ordered: list[dict]) -> list[dict]:
    """Merge consecutive line-cells of the same font and column into one
    logical block (the segmentation step): body lines joined with spaces,
    mono (code) lines joined with newlines. A vertical gap > BLOCK_MERGE_GAP
    or a font/column change starts a new block."""
    blocks: list[dict] = []
    for c in ordered:
        prev = blocks[-1] if blocks else None
        # line cells merge whether their text came from the embedded layer or
        # from OCR (font "image" = pictures never reaches here: not body/mono)
        joinable = (
            prev is not None
            and prev["font"] == c["font"]
            and prev["font"] in ("body", "mono")
            and abs(c["x0"] - prev["x0"]) < 1.0
            and 0 <= (c["y0"] - prev["_y_last"]) <= BLOCK_MERGE_GAP
        )
        if joinable:
            sep = "\n" if c["font"] == "mono" else " "
            prev["text"] = prev["text"] + sep + c["text"] if c["text"] else prev["text"]
            prev["_y_last"] = c["y0"]
        else:
            blk = dict(c)
            blk["_y_last"] = c["y0"]
            blocks.append(blk)
    return blocks


def recover_tables(table_cells: list[dict]) -> list[dict]:
    """Table-structure recovery (A3 analog): cluster grid cells into tables
    by vertical gaps, then reconstruct the lattice from distinct y0 (rows)
    and x0 (columns) and serialize row-major — rows joined by newline,
    cells by ' | ' (the engine's canonical table text)."""
    if not table_cells:
        return []
    cells = sorted(table_cells, key=lambda c: (c["y0"], c["x0"]))
    clusters: list[list[dict]] = [[cells[0]]]
    for c in cells[1:]:
        if c["y0"] - max(x["y0"] for x in clusters[-1]) > TABLE_CLUSTER_GAP:
            clusters.append([c])
        else:
            clusters[-1].append(c)
    tables = []
    for cluster in clusters:
        rows_y = sorted({c["y0"] for c in cluster})
        row_map = {y: i for i, y in enumerate(rows_y)}
        grid: dict[int, list[dict]] = {}
        for c in cluster:
            grid.setdefault(row_map[c["y0"]], []).append(c)
        lines = []
        for r in sorted(grid):
            row_cells = sorted(grid[r], key=lambda c: c["x0"])
            lines.append(" | ".join(c["_etext"] for c in row_cells))
        anchor = min(cluster, key=lambda c: (c["y0"], c["x0"]))
        tables.append({"y0": anchor["y0"], "x0": anchor["x0"], "text": "\n".join(lines)})
    return tables


def parse_page(
    page: dict,
    ocr_mode: str,
    reverse_codebook,
    *,
    describe_pictures: bool = True,
    picture_area_threshold: float = 0.0,
) -> list[dict]:
    """Convert ONE page dict → span dicts (kind, text) in reading order —
    no offsets, media refs or page breaks (those are document-level,
    assigned by finalize_document_spans). This is the unit of work for the
    page fan-out path (G2 in SURVEY.md §2.4).

    Picture description (A5): a picture span's text is the description the
    vision model produces from the image region (here the deterministic
    glyph decode plays the local VLM — §7.3 faithfulness boundary). The
    reference gates description by relative picture area
    (picture_area_threshold, convert.py:351-357: pictures smaller than the
    given fraction of the page are not described): below-threshold
    pictures keep an empty description.

    Ownership: cells must be exclusively owned by the caller (this
    function mutates them in place — adds ``_etext``, overwrites ``text``
    with OCR-substituted text). Parse fresh JSON per call; do not reuse a
    parsed doc across calls."""
    width, height = page.get("width", 612), page.get("height", 792)
    page_area = max(width * height, 1.0)
    spans: list[dict] = []

    # cells come from this document's own json.loads — mutating them in
    # place is safe and saves a dict copy per cell (hot path)
    regular, tablecells = [], []
    for c in page["cells"]:
        if c["font"] == "image":
            area_frac = (c["x1"] - c["x0"]) * (c["y1"] - c["y0"]) / page_area
            if describe_pictures and area_frac >= picture_area_threshold:
                c["_etext"] = _cell_effective_text(c, ocr_mode, reverse_codebook)
            else:
                c["_etext"] = ""
            regular.append(c)
            continue
        c["_etext"] = _cell_effective_text(c, ocr_mode, reverse_codebook)
        (tablecells if c["font"] == "table" else regular).append(c)

    tables = recover_tables(tablecells)
    # tables join the stream as synthetic full-cells at their anchor pos
    for t in tables:
        regular.append(
            {"x0": t["x0"], "y0": t["y0"], "x1": t["x0"] + 1, "y1": t["y0"] + 1,
             "font": "table-block", "text": t["text"], "_etext": t["text"],
             "is_bitmap": False, "from_ocr": False}
        )

    ordered = reading_order(regular, width, height)
    # substitute effective text before merge so joins use OCR-corrected text
    for c in ordered:
        c["text"] = c["_etext"]
    blocks = merge_blocks(ordered)

    for blk in blocks:
        font = blk["font"]
        if blk["y1"] <= HEADER_BAND:
            kind = "page_header"
        elif blk["y0"] >= height - FOOTER_BAND:
            kind = "page_footer"
        elif font == "table-block":
            kind = "table"
        elif font == "image":
            kind = "picture"
        elif font in FONT_KIND:
            kind = FONT_KIND[font]
        elif blk["text"].startswith("• "):
            kind = "list_item"
            blk["text"] = blk["text"][2:]
        else:
            kind = "paragraph"
        spans.append({"kind": kind, "text": blk["text"], "media_ref": ""})
    return spans


def finalize_document_spans(page_spans: list[list[dict]], doc_id: str) -> list[dict]:
    """Page span lists (page order) → final document span sequence:
    page_break between pages, deterministic media_ref assignment in reading
    order, dense offset ranking. Shared by the whole-doc path and the page
    fan-in reassembly — identical output by construction."""
    spans: list[dict] = []
    for pi, pspans in enumerate(page_spans):
        if pi > 0:
            spans.append({"kind": "page_break", "text": "", "media_ref": ""})
        spans.extend(dict(s) for s in pspans)
    out = []
    media_k = 0
    for i, s in enumerate(spans):
        if s["kind"] in ("picture", "table"):
            s["media_ref"] = f"media-{doc_id}-{media_k}"
            media_k += 1
        else:
            s["media_ref"] = ""
        s["offset"] = i
        out.append(s)
    return out


def select_pages(doc: dict, page_range: tuple = (1, 2**31 - 1)) -> list[dict]:
    return [p for p in doc["pages"] if page_range[0] <= p["page_no"] <= page_range[1]]


def parse_pdf(
    payload: bytes,
    doc_id: str,
    ocr_mode: str,
    reverse_codebook,
    page_range: tuple = (1, 2**31 - 1),
    **kwargs,
) -> list[dict]:
    """Full PDF conversion for one document → ordered span dicts:
    per-page OCR-mode text resolution → table recovery → geometric reading
    order → block merge → kind classification (parse_page), then
    page_break insertion + media-ref assignment + dense offset ranking
    (finalize_document_spans)."""
    return parse_pdf_doc(
        parse_payload(payload), doc_id, ocr_mode, reverse_codebook, page_range, **kwargs
    )


def parse_pdf_doc(
    doc: dict,
    doc_id: str,
    ocr_mode: str,
    reverse_codebook,
    page_range: tuple = (1, 2**31 - 1),
    *,
    describe_pictures: bool = True,
    picture_area_threshold: float = 0.0,
) -> list[dict]:
    """Consumes ``doc`` (parse_page mutates cells in place — callers must
    not reuse the parsed doc afterwards)."""
    pages = select_pages(doc, page_range)
    page_spans = [
        parse_page(
            p, ocr_mode, reverse_codebook,
            describe_pictures=describe_pictures,
            picture_area_threshold=picture_area_threshold,
        )
        for p in pages
    ]
    return finalize_document_spans(page_spans, doc_id)
