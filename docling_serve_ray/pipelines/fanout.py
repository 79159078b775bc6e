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
"""

from __future__ import annotations

import json
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
    "page_json": "",
    "page_secs": 0.0,
    "is_page": False,
}
_OUT_DEFAULTS = {
    "spans": [],
    "status": "",
    "errors": [],
    "md_content": "",
    "text_content": "",
    "doctags_content": "",
    "html_content": "",
    "json_content": "",
    "num_spans": 0,
    "processing_time": 0.0,
}


def _page_count(fmt: str, payload: bytes) -> int:
    if fmt != "pdf":
        return 0
    try:
        return len(json.loads(payload.decode("utf-8"))["pages"])
    except Exception:
        return 0


def _mixed_table(rows: list[dict]) -> pa.Table:
    """Unified intermediate schema: OUTPUT columns + page columns."""
    return pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.string()),
            "spans": pa.array([r["spans"] for r in rows], PAGE_SPANS_TYPE),
            "format": pa.array([r["format"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
            "ocr_mode": pa.array([r["ocr_mode"] or "" for r in rows], pa.string()),
            "status": pa.array([r["status"] for r in rows], pa.string()),
            "errors": pa.array([r["errors"] for r in rows], pa.list_(pa.string())),
            "md_content": pa.array([r["md_content"] for r in rows], pa.string()),
            "text_content": pa.array([r["text_content"] for r in rows], pa.string()),
            "doctags_content": pa.array([r["doctags_content"] for r in rows], pa.string()),
            "html_content": pa.array([r["html_content"] for r in rows], pa.string()),
            "json_content": pa.array([r["json_content"] for r in rows], pa.string()),
            "num_spans": pa.array([r["num_spans"] for r in rows], pa.int32()),
            "processing_time": pa.array(
                [r.get("processing_time", 0.0) for r in rows], pa.float64()
            ),
            "page_idx": pa.array([r["page_idx"] for r in rows], pa.int32()),
            "n_pages": pa.array([r["n_pages"] for r in rows], pa.int32()),
            "page_json": pa.array([r["page_json"] for r in rows], pa.string()),
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
            if _page_count(fmt, payload) <= self.threshold:
                out = convert_document(
                    doc_id, fmt, payload, lang, opts, self.reverse_codebook
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
                mode = analyze_document(fmt, payload, opts)
                doc = parse_payload(payload)
                if len(doc.get("pages", [])) > opts.max_num_pages:
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
                out = {
                    "doc_id": doc_id, "format": fmt, "lang": lang,
                    "ocr_mode": mode, **_OUT_DEFAULTS, "status": "success",
                }
                from ..kernels.document import make_exports

                out.update(make_exports([], opts, doc_id))
                rows.append({**out, **_PAGE_DEFAULTS})
                continue
            for idx, page in enumerate(pages):
                rows.append(
                    {
                        "doc_id": doc_id, "format": fmt, "lang": lang,
                        "ocr_mode": mode, **_OUT_DEFAULTS,
                        "page_idx": idx, "n_pages": len(pages),
                        "page_json": json.dumps(page), "page_secs": 0.0,
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
        from ..kernels.pdfmodel import parse_page

        rows = batch.to_pylist()
        for r in rows:
            if not r["is_page"]:
                continue
            t0 = time.monotonic()
            try:
                spans = parse_page(
                    json.loads(r["page_json"]), r["ocr_mode"] or "skip",
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
            r["page_json"] = ""  # drop the raw page before the shuffle
        return _mixed_table(rows)


def _reassemble_factory(options: JobOptions):
    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        from ..kernels.document import make_exports
        from ..kernels.pdfmodel import finalize_document_spans

        rows = []
        for doc_id, gd in g.groupby("doc_id", sort=False):
            if not gd["is_page"].iloc[0]:
                # finished row (single-row group): pass through
                r = gd.iloc[0].to_dict()
                r["spans"] = [dict(s) for s in r["spans"]]
                r["errors"] = list(r["errors"])
                rows.append({k: r[k] for k in _OUT_COLUMNS})
                continue
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


_OUT_COLUMNS = [
    "doc_id", "spans", "format", "lang", "ocr_mode", "status", "errors",
    "md_content", "text_content", "doctags_content", "html_content",
    "json_content", "num_spans", "processing_time",
]


def convert_with_page_fanout(
    input_path,
    options: JobOptions = DEFAULT_OPTIONS,
    *,
    threshold: int | None = None,
) -> ray.data.Dataset:
    """Single-read conversion with page fan-out for PDFs over ``threshold``
    pages. Returns the same schema as the plain pipeline; row-for-row
    identical output (order aside), including guard/failure semantics."""
    from ..ops.shuffle import bucketed_group_agg

    tune_data_context()
    thr = threshold if threshold is not None else (options.page_fanout_threshold or 8)
    # the two actor pools share the cluster budget so neither starves the
    # read stage or each other
    conc = safe_concurrency(None)
    total = conc if isinstance(conc, int) else conc[1]
    conc_split = max(1, total // 2)
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
    return bucketed_group_agg(
        mixed, ["doc_id"], _reassemble_factory(options), num_buckets=256
    )
