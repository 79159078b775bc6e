"""Conversion pipeline stages (SURVEY.md §7.1 target shape).

P0/P1  AnalyzeBatch   — stateless map_batches: format gate + PDF quality
                        analysis (M1/M2) → ``ocr_mode`` column.
P2/P3  ConvertActor   — actor-pool map_batches: format-routed parse with the
                        OCR glyph codebook held in actor state (the model-
                        residency analog of the reference's converter cache,
                        docling_conversion.py:67-85); emits spans + exports.

Batches are Arrow in / Arrow out. Document parsing is inherently per-row
(each payload is one independent parse, exactly as in the reference's
per-document conversion loop); the vectorized work (column assembly, span
list construction) uses pyarrow builders. Heavy per-doc compute dominates,
so the per-batch Python loop is the work itself, not overhead.
"""

from __future__ import annotations

import pyarrow as pa

from ..kernels.document import (
    analyze_document,
    convert_document,
    convert_document_preemptive,
)
from ..options import JobOptions
from ..schema import OUTPUT_SCHEMA, SPANS_TYPE


class AnalyzeBatch:
    """Stateless quality-analysis stage. Usable as a plain function too —
    carrying options in the instance keeps the closure pickle-small.

    Note: this separate stage re-parses each PDF payload (the downstream
    convert parses again). The DEFAULT pipeline fuses analysis into
    ConvertActor (fuse_analyze=True), where convert_document parses each
    PDF exactly once for both the analyzer and the converter; use this
    stage only when per-stage timings in ds.stats() are worth the extra
    parse."""

    def __init__(self, options: JobOptions):
        self.options = options

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts = batch["format"].to_pylist()
        payloads = batch["payload"].to_pylist()
        modes = [analyze_document(f, p, self.options) for f, p in zip(fmts, payloads)]
        return batch.append_column("ocr_mode", pa.array(modes, type=pa.string()))


class ConvertActor:
    """Actor-pool conversion stage. __init__ = model load (glyph reverse
    codebook for the synthetic OCR engine); __call__ = one batch of docs."""

    def __init__(self, options: JobOptions):
        from ..kernels.glyphs import build_reverse_codebook

        self.options = options
        self.reverse_codebook = build_reverse_codebook()

    def __call__(self, batch: pa.Table) -> pa.Table:
        opts = self.options
        doc_ids = batch["doc_id"].to_pylist()
        fmts = batch["format"].to_pylist()
        payloads = batch["payload"].to_pylist()
        langs = (
            batch["lang"].to_pylist() if "lang" in batch.column_names else [""] * len(doc_ids)
        )
        modes = (
            batch["ocr_mode"].to_pylist()
            if "ocr_mode" in batch.column_names
            else [None] * len(doc_ids)
        )
        # preemptive_timeout routes each doc through a kill-able subprocess
        # (hang-prone real backends); default is the in-process kernel
        conv = convert_document_preemptive if opts.preemptive_timeout else convert_document
        rows = [
            conv(d, f, p, l, opts, self.reverse_codebook, ocr_mode=m)
            for d, f, p, l, m in zip(doc_ids, fmts, payloads, langs, modes)
        ]
        return rows_to_output_table(rows)


def rows_to_output_table(rows: list[dict]) -> pa.Table:
    arrays = [
        pa.array([r["doc_id"] for r in rows], type=pa.string()),
        pa.array([r["spans"] for r in rows], type=SPANS_TYPE),
        pa.array([r["format"] for r in rows], type=pa.string()),
        pa.array([r["lang"] for r in rows], type=pa.string()),
        pa.array([r["ocr_mode"] or "" for r in rows], type=pa.string()),
        pa.array([r["status"] for r in rows], type=pa.string()),
        pa.array([r["errors"] for r in rows], type=pa.list_(pa.string())),
        pa.array([r["md_content"] for r in rows], type=pa.string()),
        pa.array([r["text_content"] for r in rows], type=pa.string()),
        pa.array([r["doctags_content"] for r in rows], type=pa.string()),
        pa.array([r["html_content"] for r in rows], type=pa.string()),
        pa.array([r["json_content"] for r in rows], type=pa.string()),
        pa.array([r["num_spans"] for r in rows], type=pa.int32()),
        pa.array([r.get("processing_time", 0.0) for r in rows], type=pa.float64()),
    ]
    return pa.Table.from_arrays(arrays, schema=OUTPUT_SCHEMA)
