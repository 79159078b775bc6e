"""Job options — the engine's analog of the reference's ConvertDocumentsOptions.

The reference configures a whole conversion job with one Pydantic model of
~30 knobs (reference: docling_serve/datamodel/convert.py:114-479). Here the
same role is played by a frozen dataclass: ONE options object per job,
captured in UDF closures / actor constructor args (never a per-row column),
hash-identified like the reference's converter cache key
(docling_conversion.py:44-64).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class JobOptions:
    # --- format routing (reference convert.py:114-125: defaults to ALL
    # supported input formats docx/pptx/html/image/pdf/asciidoc/md/xlsx;
    # "rst" is this suite's own extension, parsed by the real docutils
    # backend — kernels/rst.py) ---
    from_formats: tuple = (
        "html", "pdf", "docx", "md", "pptx", "xlsx", "asciidoc", "image", "rst",
        "csv", "yaml", "toml", "ini", "ipynb",
    )
    # reference default is Markdown only (convert.py:127-137 "defaults to
    # Markdown"); text/doctags are opt-in export columns
    to_formats: tuple = ("md",)

    # --- OCR (reference convert.py:153-198, ocrmypdf middleware) ---
    do_ocr: bool = True
    force_ocr: bool = False  # user override; analyzer may set per-doc mode
    ocr_lang: tuple = ("en",)
    auto_ocr_mode: bool = True  # run the PDF quality analyzer (M1)

    # --- PDF pipeline (reference convert.py:200-305) ---
    pipeline: str = "standard"  # standard | vlm (reference convert.py:225-228):
                                # vlm = whole-page vision model replaces
                                # layout+OCR -> every PDF page is re-read
                                # from the rasterized form (mode force)
    do_table_structure: bool = True
    table_mode: str = "fast"  # fast | accurate (TableFormerMode analog)
    page_range: tuple = (1, 2**31 - 1)
    max_num_pages: int = 2**31 - 1
    max_file_size: int = 2**63 - 1
    md_page_break_placeholder: str = ""
    document_timeout: float = float("inf")  # seconds per document (reference
                                # convert.py:238-245); Python work is not
                                # preemptible, so enforcement is post-hoc:
                                # over-budget docs are marked partial_success
    preemptive_timeout: bool = False  # escape hatch for hang-prone REAL
                                # parser backends: run each document's parse
                                # in a kill-able subprocess and hard-stop it
                                # at document_timeout (kernels/document.py:
                                # convert_document_preemptive). Default off:
                                # the deterministic stand-in kernels cannot
                                # hang, and the fork+pipe round trip costs
                                # ~1 ms/doc

    # --- enrichment (reference convert.py:307-381) ---
    do_picture_description: bool = True
    picture_area_threshold: float = 0.0
    # code-language enrichment (reference do_code_enrichment): when on,
    # markdown code fences carry the classified language tag. Backend seam
    # kernels/codelang.py CODE_CLASSIFIERS: "heuristic" (deterministic
    # stand-in) | "pygments" (real foreign engine, opt-in)
    do_code_enrichment: bool = False
    code_classifier: str = "heuristic"

    # --- media export (reference ImageRefMode, convert.py:139-151) ---
    # referenced: exports point at sidecar paths (assets/<media_ref>.png)
    # placeholder: a fixed "<!-- image -->" marker replaces every picture
    # embedded: data-URI embedding — serializers emit the referenced form
    #   and pipelines.media.embed_media_exports rewrites refs to data URIs
    #   by joining the media sidecar table (bytes are not available at
    #   serialization time by design: they stay out of the convert path)
    image_export_mode: str = "referenced"

    # --- parser backend seam (kernels/html.py HTML_PARSERS) ---
    html_backend: str = "fast"  # fast | stdlib | expat — expat is the
                                # real-foreign-engine smoke path (libexpat C
                                # parser); a docling/bs4/lxml client plugs in
    # --- byte-decode seam (kernels/decode.py TEXT_DECODERS) ---
    text_decoder: str = "strict"  # strict (utf-8) | charset-normalizer
                                  # (real foreign detection engine, opt-in)
                                # at the same seam

    # --- post-processing (reference convert.py:456-466, worker.py:238-257) ---
    enable_bidi_processing: bool = True
    enable_arabic_correction: bool = False

    # --- error semantics (reference convert.py:247-255) ---
    abort_on_error: bool = False

    # --- execution tuning (ours; no reference analog — Ray-side knobs) ---
    batch_size: int = 64  # docs per batch for stateless stages
    actor_batch_size: int = 64  # docs per batch for actor-pool stages
    # actor pool sizing is cluster-derived by default (pipelines.convert.
    # safe_concurrency(None) → (2, cluster_cpus-1)); set a concurrency
    # explicitly on the pipeline call to pin it
    page_fanout_threshold: int = 0  # 0 = disabled; else PDFs with more pages fan out per-page
    target_partition_bytes: int = 64 * 1024 * 1024  # byte-balanced partitioning budget

    def options_hash(self) -> str:
        """SHA-1 of canonical JSON — mirrors the reference's converter cache
        key semantics (docling_conversion.py:44-64): distinct options must
        hash differently."""
        payload = json.dumps(asdict(self), sort_keys=True, default=str)
        return hashlib.sha1(payload.encode("utf-8")).hexdigest()


DEFAULT_OPTIONS = JobOptions()
