"""Page-level fan-out / ordered fan-in for page-heavy PDFs.

The reference processes whole documents serially; its one fan-out/fan-in
pattern is the AI-vision path — pages processed independently, then joined
in page order keyed by doc_id (reference ai_vision_middleware.py:231-272;
G2 in SURVEY.md §2.4). At cluster scale this matters because a 2000-page
scan and a 1-page memo must not be the same unit of work (SURVEY.md §4
"skew / stragglers").

Topology — ONE pass over ONE column-pruned read (no branch, no union):

    read ── SplitConvertActor ──────────── PageConvertActor ── fan-in ── out
            small docs → finished rows      pages → page-span    bucketed
            big docs   → page rows          rows; finished       groupby
            (guards + OCR-mode decision     rows pass through    (doc_id)
             once per doc, HERE)            untouched

    All rows flow through one unified schema (output columns + page
    columns + an ``is_page`` discriminator). The fan-in groupby(doc_id)
    reassembles page groups (in-group page_no sort → finalize → exports)
    and passes single-row finished groups through unchanged.

Why single-pass beats the two-branch / two-read design: the payload column
(the dominant bytes at 100 TB) is scanned ONCE and never shuffled — the
fan-in moves extracted text spans only, which for real documents is far
smaller than the raw payload; a second read would cost 2× storage bandwidth
on every payload byte. The fan-in is THE genuine shuffle of the ingest path
and uses the bucketed grouped reduce (ops/shuffle.py) so doc_id cardinality
doesn't hit Ray's per-key reduce.

Option guards (from_formats, max_file_size, max_num_pages, page_range,
document_timeout, abort_on_error row semantics) are enforced identically to
the whole-doc path: small docs via convert_document itself; big docs in
SplitConvertActor (failure rows, never failing tasks), with
document_timeout applied post-hoc to the summed per-page parse time at
reassembly. Equality with the whole-doc path is guaranteed by construction:
both call parse_page per page and finalize_document_spans per document
(tests/test_fanout.py asserts byte-equality).

Cost model (measured, 100k-doc corpus, 32 CPUs): with the deterministic
stand-in kernels a page parses in ~2 ms — on par with shipping the page to
another worker — so fan-out runs ~2.5-3× the whole-doc wall even on
corpora with 10k-page documents (Amdahl: the per-doc payload parse + page
serialization is serial and comparable to the stand-in's total work).
The path pays off when per-page compute dominates per-page IO — real
layout/OCR/VLM models at 50-500 ms/page, where a 2000-page document is a
100-1000 s serial straggler that this pipeline spreads across the
cluster. That is exactly the reference's AI-vision deployment shape; keep
``page_fanout_threshold=0`` (disabled) for fast-parse corpora.
"""

from __future__ import annotations

import pickle
import time

import pandas as pd
import pyarrow as pa
import ray.data

from ..options import DEFAULT_OPTIONS, JobOptions
from ..schema import SPANS_TYPE
from ..stages.convert import ConvertActor, rows_to_output_table
from .convert import read_input, safe_concurrency, tune_data_context

PAGE_SPANS_TYPE = SPANS_TYPE  # page rows reuse the span struct (offset=-1)

_PAGE_DEFAULTS = {
    "page_idx": -1,
    "n_pages": -1,
    "page_blob": b"",
    "page_secs": 0.0,
    "is_page": False,
}
# intermediate rows carry NO export strings — exports are serialized once,
# after the fan-in, so only spans (the source text, once) cross the shuffle
_OUT_DEFAULTS = {
    "spans": [],
    "status": "",
    "errors": [],
    "num_spans": 0,
    "processing_time": 0.0,
}


def _mixed_table(rows: list[dict]) -> pa.Table:
    """Unified intermediate schema: span-level output columns + page
    columns (no export strings — see _OUT_DEFAULTS)."""
    return pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.string()),
            "spans": pa.array([r["spans"] for r in rows], PAGE_SPANS_TYPE),
            "format": pa.array([r["format"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
            "ocr_mode": pa.array([r["ocr_mode"] or "" for r in rows], pa.string()),
            "status": pa.array([r["status"] for r in rows], pa.string()),
            "errors": pa.array([r["errors"] for r in rows], pa.list_(pa.string())),
            "num_spans": pa.array([r["num_spans"] for r in rows], pa.int32()),
            "processing_time": pa.array(
                [r.get("processing_time", 0.0) for r in rows], pa.float64()
            ),
            "page_idx": pa.array([r["page_idx"] for r in rows], pa.int32()),
            "n_pages": pa.array([r["n_pages"] for r in rows], pa.int32()),
            "page_blob": pa.array([r["page_blob"] for r in rows], pa.large_binary()),
            "page_secs": pa.array([r["page_secs"] for r in rows], pa.float64()),
            "is_page": pa.array([r["is_page"] for r in rows], pa.bool_()),
        }
    )


class SplitConvertActor(ConvertActor):
    """Single-pass splitter: docs at or under the page threshold are
    converted HERE (convert_document — all option guards apply natively);
    bigger PDFs are exploded to one row per selected page after the same
    guards. The per-doc OCR-mode decision (M1) also runs here, once per
    document — it needs the whole document (cross-page sampling + tagged
    flag), exactly like the reference's whole-file analysis pre-pass
    (worker.py:98-169)."""

    def __init__(self, options: JobOptions, threshold: int):
        super().__init__(options)
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernels.document import analyze_document, convert_document
        from ..kernels.pdfmodel import parse_payload, select_pages

        opts = self.options
        rows: list[dict] = []
        langs = (
            batch["lang"].to_pylist()
            if "lang" in batch.column_names
            else [""] * batch.num_rows
        )
        for doc_id, fmt, payload, lang in zip(
            batch["doc_id"].to_pylist(), batch["format"].to_pylist(),
            batch["payload"].to_pylist(), langs,
        ):
            # one parse serves the page count, the analyzer and (small
            # docs) the converter — PDFs are never parsed twice here
            doc = None
            if fmt == "pdf":
                try:
                    doc = parse_payload(payload)
                except Exception:
                    doc = None
            n_pages = len(doc.get("pages", [])) if doc is not None else 0
            if n_pages <= self.threshold:
                out = convert_document(
                    doc_id, fmt, payload, lang, opts, self.reverse_codebook,
                    parsed_doc=doc, with_exports=False,
                )
                rows.append({**out, **_PAGE_DEFAULTS})
                continue
            # big-doc branch: mirror convert_document's guard semantics —
            # a guard violation yields a failure ROW, never a failing task
            try:
                if fmt not in opts.from_formats:
                    raise ValueError(f"format {fmt!r} not in from_formats")
                if len(payload) > opts.max_file_size:
                    raise ValueError("max_file_size exceeded")
                mode = analyze_document(fmt, payload, opts, doc)
                if n_pages > opts.max_num_pages:
                    raise ValueError("max_num_pages exceeded")
                pages = select_pages(doc, opts.page_range)
            except Exception as exc:
                rows.append(
                    {
                        "doc_id": doc_id, "format": fmt, "lang": lang,
                        "ocr_mode": "", **_OUT_DEFAULTS,
                        "status": "failure",
                        "errors": [f"{type(exc).__name__}: {exc}"],
                        **_PAGE_DEFAULTS,
                    }
                )
                continue
            if not pages:
                # page_range selected nothing: the whole-doc path emits a
                # 0-span success row — so do we
                rows.append(
                    {
                        "doc_id": doc_id, "format": fmt, "lang": lang,
                        "ocr_mode": mode, **_OUT_DEFAULTS, "status": "success",
                        **_PAGE_DEFAULTS,
                    }
                )
                continue
            for idx, page in enumerate(pages):
                rows.append(
                    {
                        "doc_id": doc_id, "format": fmt, "lang": lang,
                        "ocr_mode": mode, **_OUT_DEFAULTS,
                        "page_idx": idx, "n_pages": len(pages),
                        "page_blob": pickle.dumps(page), "page_secs": 0.0,
                        "is_page": True,
                    }
                )
        return _mixed_table(rows)


class PageConvertActor:
    """One page row → page span list (no offsets/media refs); finished
    rows pass through untouched. OCR codebook pinned in actor state, same
    as ConvertActor. A page parse exception becomes an error marker on the
    row (the document fails at reassembly — abort_on_error=False
    semantics), never a failing task."""

    def __init__(self, options: JobOptions):
        from ..kernels.glyphs import build_reverse_codebook

        self.options = options
        self.reverse_codebook = build_reverse_codebook()

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..kernels.pdfmodel import parse_page

        mask = batch["is_page"]
        if not pc.any(mask).as_py():
            return batch  # finished rows: zero-copy pass-through
        passthrough = batch.filter(pc.invert(mask))
        rows = batch.filter(mask).to_pylist()
        for r in rows:
            t0 = time.monotonic()
            try:
                spans = parse_page(
                    pickle.loads(r["page_blob"]), r["ocr_mode"] or "skip",
                    self.reverse_codebook,
                    describe_pictures=self.options.do_picture_description,
                    picture_area_threshold=self.options.picture_area_threshold,
                )
                r["spans"] = [
                    {"kind": s["kind"], "text": s["text"], "media_ref": "", "offset": -1}
                    for s in spans
                ]
            except Exception as exc:
                r["errors"] = [f"{type(exc).__name__}: {exc}"]
            r["page_secs"] = time.monotonic() - t0
            r["page_blob"] = b""  # drop the raw page before the shuffle
        converted = _mixed_table(rows)
        if passthrough.num_rows == 0:
            return converted
        return pa.concat_tables([passthrough, converted])


def _reassemble_factory(options: JobOptions):
    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        from ..kernels.document import make_exports
        from ..kernels.pdfmodel import finalize_document_spans

        rows = []
        # finished rows: one output row each — no per-doc grouping needed,
        # just export serialization (deferred to here so export strings
        # never crossed the shuffle)
        fin = g[~g["is_page"]]
        for doc_id, spans, fmt, lang, mode, status, errors, secs in zip(
            fin["doc_id"], fin["spans"], fin["format"], fin["lang"],
            fin["ocr_mode"], fin["status"], fin["errors"],
            fin["processing_time"],
        ):
            spans = [dict(s) for s in spans]
            rows.append(
                {
                    "doc_id": doc_id, "spans": spans, "format": fmt,
                    "lang": lang, "ocr_mode": mode, "status": status,
                    "errors": list(errors),
                    **make_exports(spans, options, doc_id),
                    "num_spans": len(spans),
                    "processing_time": float(secs),
                }
            )

        for doc_id, gd in g[g["is_page"]].groupby("doc_id", sort=False):
            gd = gd.sort_values("page_idx")
            page_errors = [e for errs in gd["errors"] for e in errs]
            if page_errors:
                rows.append(
                    {
                        "doc_id": doc_id, "format": gd["format"].iloc[0],
                        "lang": gd["lang"].iloc[0],
                        "ocr_mode": gd["ocr_mode"].iloc[0],
                        **_OUT_DEFAULTS, "status": "failure",
                        "errors": page_errors,
                        **make_exports([], options, doc_id),
                    }
                )
                continue
            page_spans = [[dict(s) for s in ps] for ps in gd["spans"].tolist()]
            spans = finalize_document_spans(page_spans, doc_id)
            exports = make_exports(spans, options, doc_id)
            status = "success"
            errors: list[str] = []
            total_secs = float(gd["page_secs"].sum())
            if total_secs > options.document_timeout:
                # post-hoc timeout marking, same semantics as the whole-doc
                # path (summed page parse time stands in for doc wall time)
                status = "partial_success"
                errors = [f"document_timeout exceeded ({options.document_timeout}s)"]
            rows.append(
                {
                    "doc_id": doc_id,
                    "spans": spans,
                    "format": gd["format"].iloc[0],
                    "lang": gd["lang"].iloc[0],
                    "ocr_mode": gd["ocr_mode"].iloc[0],
                    "status": status,
                    "errors": errors,
                    **exports,
                    "num_spans": len(spans),
                    # summed per-page parse seconds stands in for the
                    # whole-doc wall time on the fanned-out path
                    "processing_time": round(total_secs, 6),
                }
            )
        # return Arrow (not pandas) so downstream sees the exact OUTPUT_SCHEMA
        return rows_to_output_table(rows)

    return reassemble


def convert_with_page_fanout(
    input_path,
    options: JobOptions = DEFAULT_OPTIONS,
    *,
    threshold: int | None = None,
    conc_split: int | None = None,
    conc_pages: int | None = None,
) -> ray.data.Dataset:
    """Single-read conversion with page fan-out for PDFs over ``threshold``
    pages. Returns the same schema as the plain pipeline; row-for-row
    identical output (order aside), including guard/failure semantics.

    conc_split / conc_pages size the two actor pools; the default splits
    the safe cluster budget between them weighted toward the splitter
    (which converts every small doc; page actors only see exploded
    pages)."""
    from ..ops.shuffle import (
        bucketed_group_agg,
        input_bytes_estimate,
        scaled_num_buckets,
    )

    tune_data_context()
    thr = threshold if threshold is not None else (options.page_fanout_threshold or 8)
    # the two actor pools share the cluster budget so neither starves the
    # read stage or each other
    conc = safe_concurrency(None)
    total = conc if isinstance(conc, int) else conc[1]
    if conc_split is None:
        conc_split = max(1, (2 * total) // 3)
    if conc_pages is None:
        conc_pages = max(1, total - conc_split)

    mixed = (
        read_input(input_path)
        .map_batches(
            SplitConvertActor,
            fn_constructor_args=(options, thr),
            batch_format="pyarrow",
            batch_size=options.actor_batch_size,
            concurrency=conc_split,
            num_cpus=1,
        )
        .map_batches(
            PageConvertActor,
            fn_constructor_args=(options,),
            batch_format="pyarrow",
            batch_size=64,  # pages, not docs: smaller unit of work
            concurrency=conc_pages,
            num_cpus=1,
        )
    )
    # the fan-in is THE genuine shuffle of the ingest path: scale its
    # bucket count with input bytes so one reassemble task's pandas frame
    # stays bounded at any corpus size (a fixed count grows linearly)
    paths = input_path if isinstance(input_path, (list, tuple)) else [input_path]
    return bucketed_group_agg(
        mixed,
        ["doc_id"],
        _reassemble_factory(options),
        num_buckets=scaled_num_buckets(input_bytes_estimate(*paths)),
    )
