"""Arrow schemas for the engine's tables.

Data model mapping (see SURVEY.md §1.3): the reference's ``DocumentStream``
(name, bytes) becomes a row ``(doc_id, format, payload)``; the reference's
``DoclingDocument`` ordered item tree (reference: docling-serve
``response_preparation.py:87-105`` export surface) flattens to an ordered
span list ``list<struct<kind, text, media_ref, offset>>`` — one global
reading order per document.
"""

from __future__ import annotations

import pyarrow as pa

# Span kinds — the docling item labels observable through the reference's
# export surface (doctags assertions in reference tests/test_1-file-all-outputs.py:118-122,
# markdown heading assertions :74-79) plus the boilerplate kinds that HTML
# extraction must REMOVE (never present in output spans).
CONTENT_KINDS = (
    "title",
    "section_header",
    "paragraph",
    "list_item",
    "table",
    "picture",
    "code",
    "formula",
    "page_header",
    "page_footer",
    "caption",
    "page_break",
)
BOILERPLATE_KINDS = ("boilerplate_nav", "boilerplate_ad", "boilerplate_footer")
ALL_KINDS = CONTENT_KINDS + BOILERPLATE_KINDS

# Kinds excluded from markdown / plain-text exports ("furniture" in docling
# terms: page decorations are kept in the span stream but not in prose
# exports, mirroring docling's default ExportLabels).
FURNITURE_KINDS = frozenset({"page_header", "page_footer", "page_break"})

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
SPANS_TYPE = pa.list_(SPAN_STRUCT)

# T1 input table (FIXTURES.md): one row per raw document.
INPUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", SPANS_TYPE),  # raw interleaved content incl. boilerplate
        ("format", pa.string()),  # html | pdf | docx | md
        ("payload", pa.large_binary()),  # serialized raw form rendered from spans
        ("lang", pa.string()),  # en | ar | el
        ("quality", pa.string()),  # PDFs: tagged_good|untagged_good|poor|no_text; else ""
        ("byte_size", pa.int64()),
    ]
)

# Pipeline output: converted document.
OUTPUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", SPANS_TYPE),  # extracted, ordered, boilerplate-free
        ("format", pa.string()),
        ("lang", pa.string()),
        ("ocr_mode", pa.string()),  # skip | redo | force | "" (non-PDF)
        ("status", pa.string()),  # success | failure
        ("errors", pa.list_(pa.string())),
        ("md_content", pa.string()),
        ("text_content", pa.string()),
        ("doctags_content", pa.string()),
        ("html_content", pa.string()),
        ("json_content", pa.string()),
        ("num_spans", pa.int32()),
        ("processing_time", pa.float64()),  # per-doc wall seconds (reference
        # ConversionResult.timings surface, responses.py:31-36)
    ]
)

# T4 media sidecar table.
MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("doc_id", pa.string()),
        ("bytes", pa.large_binary()),
        ("mime", pa.string()),
    ]
)


def spans_to_pylist(spans_column) -> list:
    """Arrow list<struct> column → list of list-of-dict (one per row)."""
    return spans_column.to_pylist()


def empty_output_table() -> pa.Table:
    return OUTPUT_SCHEMA.empty_table()
