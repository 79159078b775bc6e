"""Page-level fan-out / ordered fan-in for page-heavy PDFs.

The reference processes whole documents serially; its one fan-out/fan-in
pattern is the AI-vision path — pages processed independently, then joined
in page order keyed by doc_id (reference ai_vision_middleware.py:231-272;
G2 in SURVEY.md §2.4). At cluster scale this matters because a 2000-page
scan and a 1-page memo must not be the same unit of work (SURVEY.md §4
"skew / stragglers").

Topology (two branches over a column-pruned read, union at the end):

    read ─┬─ small docs (pages ≤ threshold) ── ConvertActor ──────────┐
          └─ big docs ── explode to page rows ── PageConvertActor      ├─ union
                         (pages spread across the pool via streaming   │
                          re-batching — no shuffle needed for fan-OUT) │
                         ── bucketed groupby(doc_id) fan-IN ───────────┘
                            (in-group page_no sort → finalize → exports)

The fan-in is THE genuine shuffle of the ingest path; it moves page span
lists (text), never raw payloads, and uses the bucketed grouped reduce
(ops/shuffle.py) so doc_id cardinality doesn't hit Ray's per-key reduce.
The two branches each read the input (column-pruned, page-count gate is a
cheap header parse); the heavy work — conversion — runs exactly once per
document. Equality with the whole-doc path is guaranteed by construction:
both call parse_page per page and finalize_document_spans per document
(tests/test_fanout.py asserts byte-equality).
"""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa
import ray.data

from ..options import DEFAULT_OPTIONS, JobOptions
from ..schema import SPANS_TYPE
from ..stages.convert import ConvertActor, rows_to_output_table
from .convert import read_input, safe_concurrency, tune_data_context

PAGE_SPANS_TYPE = SPANS_TYPE  # page rows reuse the span struct (offset=-1)


def _page_count(fmt: str, payload: bytes) -> int:
    if fmt != "pdf":
        return 0
    try:
        return len(json.loads(payload.decode("utf-8"))["pages"])
    except Exception:
        return 0


class SmallDocActor(ConvertActor):
    """Branch 1: converts docs under the page threshold, drops the rest."""

    def __init__(self, options: JobOptions, threshold: int):
        super().__init__(options)
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep = [
            _page_count(f, p) <= self.threshold
            for f, p in zip(batch["format"].to_pylist(), batch["payload"].to_pylist())
        ]
        return super().__call__(batch.filter(pa.array(keep)))


class PageExploder:
    """Branch 2 stage 1: big docs → one row per page. The per-doc OCR-mode
    decision (M1) runs HERE, once per document — it needs the whole
    document (cross-page sampling + tagged flag), exactly like the
    reference's whole-file analysis pre-pass (worker.py:98-169)."""

    def __init__(self, options: JobOptions, threshold: int):
        self.options = options
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernels.document import analyze_document
        from ..kernels.pdfmodel import parse_payload, select_pages

        out = {"doc_id": [], "lang": [], "ocr_mode": [], "page_idx": [],
               "n_pages": [], "page_json": []}
        for doc_id, fmt, payload, lang in zip(
            batch["doc_id"].to_pylist(), batch["format"].to_pylist(),
            batch["payload"].to_pylist(), batch["lang"].to_pylist(),
        ):
            if _page_count(fmt, payload) <= self.threshold:
                continue
            mode = analyze_document(fmt, payload, self.options)
            doc = parse_payload(payload)
            pages = select_pages(doc, self.options.page_range)
            for idx, page in enumerate(pages):
                out["doc_id"].append(doc_id)
                out["lang"].append(lang)
                out["ocr_mode"].append(mode)
                out["page_idx"].append(idx)
                out["n_pages"].append(len(pages))
                out["page_json"].append(json.dumps(page))
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.string()),
                "lang": pa.array(out["lang"], pa.string()),
                "ocr_mode": pa.array(out["ocr_mode"], pa.string()),
                "page_idx": pa.array(out["page_idx"], pa.int32()),
                "n_pages": pa.array(out["n_pages"], pa.int32()),
                "page_json": pa.array(out["page_json"], pa.string()),
            }
        )


class PageConvertActor:
    """Branch 2 stage 2: one page → page span list (no offsets/media refs).
    OCR codebook pinned in actor state, same as ConvertActor."""

    def __init__(self, options: JobOptions):
        from ..kernels.glyphs import build_reverse_codebook

        self.options = options
        self.reverse_codebook = build_reverse_codebook()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernels.pdfmodel import parse_page

        spans_col = []
        for page_json, mode in zip(
            batch["page_json"].to_pylist(), batch["ocr_mode"].to_pylist()
        ):
            spans = parse_page(json.loads(page_json), mode, self.reverse_codebook)
            spans_col.append(
                [
                    {"kind": s["kind"], "text": s["text"], "media_ref": "", "offset": -1}
                    for s in spans
                ]
            )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "ocr_mode": batch["ocr_mode"],
                "page_idx": batch["page_idx"],
                "n_pages": batch["n_pages"],
                "page_spans": pa.array(spans_col, PAGE_SPANS_TYPE),
            }
        )


def _reassemble_factory(options: JobOptions):
    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        from ..kernels.document import make_exports
        from ..kernels.pdfmodel import finalize_document_spans

        rows = []
        for doc_id, gd in g.groupby("doc_id", sort=False):
            gd = gd.sort_values("page_idx")
            page_spans = [
                [dict(s) for s in ps] for ps in gd["page_spans"].tolist()
            ]
            spans = finalize_document_spans(page_spans, doc_id)
            exports = make_exports(spans, options, doc_id)
            rows.append(
                {
                    "doc_id": doc_id,
                    "spans": spans,
                    "format": "pdf",
                    "lang": gd["lang"].iloc[0],
                    "ocr_mode": gd["ocr_mode"].iloc[0],
                    "status": "success",
                    "errors": [],
                    **exports,
                    "num_spans": len(spans),
                }
            )
        # return Arrow (not pandas) so the union sees the exact OUTPUT_SCHEMA
        return rows_to_output_table(rows)

    return reassemble


def convert_with_page_fanout(
    input_path,
    options: JobOptions = DEFAULT_OPTIONS,
    *,
    threshold: int | None = None,
) -> ray.data.Dataset:
    """Two-branch conversion with page fan-out for PDFs over ``threshold``
    pages. Returns the same schema as the plain pipeline; row-for-row
    identical output (order aside)."""
    from ..ops.shuffle import bucketed_group_agg

    tune_data_context()
    thr = threshold if threshold is not None else (options.page_fanout_threshold or 8)
    # both branches execute concurrently under the union — their actor
    # pools must SHARE the cluster budget or they deadlock the executor
    conc = safe_concurrency(None)
    total = conc if isinstance(conc, int) else conc[1]
    conc_small = max(1, total // 2)
    conc_pages = max(1, total - conc_small)

    small = read_input(input_path).map_batches(
        SmallDocActor,
        fn_constructor_args=(options, thr),
        batch_format="pyarrow",
        batch_size=options.actor_batch_size,
        concurrency=conc_small,
        num_cpus=1,
    )

    pages = (
        read_input(input_path)
        .map_batches(
            PageExploder(options, thr),
            batch_format="pyarrow",
            batch_size=options.batch_size,
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
    big = bucketed_group_agg(
        pages, ["doc_id"], _reassemble_factory(options), num_buckets=256
    )
    return small.union(big)
