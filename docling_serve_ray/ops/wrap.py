"""Adapter: flat (doc_id, text, source) documents → interleaved HTML
documents → flagship conversion pipeline → exploded span rows.

This is how the engine's flagship extraction pipeline is exercised against
the driver's test tables: each document row is deterministically rendered
into a *realistic boilerplate-wrapped HTML page* (nav + ads + footer around
the content — the same renderer the synthetic corpus uses), pushed through
the full conversion pipeline (Readability-style extraction, actor pool),
and the resulting ordered spans are exploded to one row per span.

The construction rule is simple enough to have an exact SQL twin:
title = 'Document {doc_id} from {source}', paragraphs = consecutive
20-word chunks of the text — so the whole extraction round-trip has a
DuckDB oracle.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..kernels.html import render_html
from ..options import JobOptions
from ..pipelines.convert import build_convert_pipeline
from ..schema import SPANS_TYPE

CHUNK_WORDS = 20

_BOILER_NAV = "Home About Contact Products"
_BOILER_AD = "Limited offer discount today"
_BOILER_FOOTER = "Privacy Terms Copyright"


def wrap_row_to_html(doc_id: str, text: str, source: str) -> bytes:
    """Deterministic interleaved HTML page for one flat document row."""
    words = text.split(" ")
    spans = [
        {"kind": "boilerplate_nav", "text": _BOILER_NAV, "media_ref": ""},
        {
            "kind": "title",
            "text": f"Document {doc_id} from {source}",
            "media_ref": "",
        },
    ]
    for i in range(0, len(words), CHUNK_WORDS):
        spans.append(
            {"kind": "paragraph", "text": " ".join(words[i : i + CHUNK_WORDS]), "media_ref": ""}
        )
        if i == 0:
            spans.append({"kind": "boilerplate_ad", "text": _BOILER_AD, "media_ref": ""})
    spans.append({"kind": "boilerplate_footer", "text": _BOILER_FOOTER, "media_ref": ""})
    return render_html(spans, doc_id).encode("utf-8")


def _wrap_batch(batch: pa.Table) -> pa.Table:
    doc_ids = [str(d) for d in batch["doc_id"].to_pylist()]
    texts = batch["text"].to_pylist()
    sources = batch["source"].to_pylist()
    payloads = [wrap_row_to_html(d, t, s) for d, t, s in zip(doc_ids, texts, sources)]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "format": pa.array(["html"] * len(doc_ids), pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "lang": pa.array(["en"] * len(doc_ids), pa.string()),
        }
    )


def _explode_spans(batch: pa.Table) -> pa.Table:
    """(doc_id, spans) → one row per span, flattened struct fields.
    Zero-copy Arrow: doc_id repeated by list lengths, struct children
    pulled via flatten — no Python loop over spans (this stage touches
    every span of the corpus)."""
    import numpy as np
    import pyarrow.compute as pc

    spans = batch["spans"].combine_chunks()
    lengths = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    flat = spans.flatten()  # struct array, zero-copy
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(doc_ids, lengths), pa.string()),
            "kind": flat.field("kind"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
            "offset": flat.field("offset"),
        }
    )


def convert_documents_table(
    sf_dir: str, options: JobOptions = JobOptions()
) -> ray.data.Dataset:
    """Flagship: wrap → convert → explode. Returns span rows."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    ds = ds.map_batches(_wrap_batch, batch_format="pyarrow")
    ds = build_convert_pipeline(ds, options)
    ds = ds.select_columns(["doc_id", "spans"])
    return ds.map_batches(_explode_spans, batch_format="pyarrow")


def convert_documents_markdown(sf_dir: str) -> ray.data.Dataset:
    """Same pipeline, markdown export column instead of span rows."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    ds = ds.map_batches(_wrap_batch, batch_format="pyarrow")
    ds = build_convert_pipeline(ds, JobOptions(to_formats=("md",)))
    return ds.select_columns(["doc_id", "md_content"])


def convert_documents_html(sf_dir: str) -> ray.data.Dataset:
    """Same pipeline, HTML export column (reference html_content surface:
    extraction output re-serialized as a clean content-only page)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    ds = ds.map_batches(_wrap_batch, batch_format="pyarrow")
    ds = build_convert_pipeline(ds, JobOptions(to_formats=("html",)))
    return ds.select_columns(["doc_id", "html_content"])


def convert_documents_text(sf_dir: str) -> ray.data.Dataset:
    """Same pipeline, strict plain-text export column (reference
    strict_text surface, response_preparation.py:94-98: markdown syntax
    stripped, prose only)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    ds = ds.map_batches(_wrap_batch, batch_format="pyarrow")
    ds = build_convert_pipeline(ds, JobOptions(to_formats=("text",)))
    return ds.select_columns(["doc_id", "text_content"])


def convert_documents_doctags(sf_dir: str) -> ray.data.Dataset:
    """Same pipeline, lossless doctags export column (the reference's
    golden-asserted `<doctag>` serialization shape)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    ds = ds.map_batches(_wrap_batch, batch_format="pyarrow")
    ds = build_convert_pipeline(ds, JobOptions(to_formats=("doctags",)))
    return ds.select_columns(["doc_id", "doctags_content"])


def convert_documents_json(sf_dir: str) -> ray.data.Dataset:
    """Same pipeline, lossless DoclingDocument-shaped JSON export column.
    The oracle rebuilds the EXACT string with DuckDB's to_json (verified
    bit-identical to Python's compact json.dumps: key order, escaping,
    raw non-ASCII)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    ds = ds.map_batches(_wrap_batch, batch_format="pyarrow")
    ds = build_convert_pipeline(ds, JobOptions(to_formats=("json",)))
    return ds.select_columns(["doc_id", "json_content"])
