"""Deterministic synthetic corpus generator (FIXTURES.md T1/T2/T4).

Generates the interleaved-document input table — one row per document with
``(doc_id, spans, format, payload, lang, quality, byte_size)`` — plus the
expected extraction output (the ground-truth content span sequence) and the
media sidecar table. Generation is per-document deterministic: row i of a
corpus with seed s depends only on (s, i), so the generator itself scales as
a Ray `map_batches` over a range dataset (see pipelines/gen.py) and any
subset of docs can be regenerated independently.

The round-trip invariant the whole engine is tested against: for every
generated document,

    pipeline(payload) == oracle(payload) == expected content spans

where expected = the content spans the payload was rendered from, with
boilerplate removed and offsets re-ranked densely (FIXTURES.md T2).
"""

from __future__ import annotations

import hashlib
import json
import random

from .kernels.glyphs import encode_glyphs

DEFAULT_SEED = 42

EN_WORDS = (
    "the data pipeline document layout model stream batch engine arrow table "
    "page text block order span media index shuffle partition worker actor "
    "cluster node memory object store read write parse extract render merge "
    "sort filter group join count scale fast slow large small deep wide clean "
    "raw final total value record field column schema result"
).split()

AR_WORDS = (
    "الوثيقة النص المحرك البيانات الصفحة الجدول الصورة التحليل النظام "
    "المعالجة السريع الكبير ترتيب قراءة كتابة تحويل استخراج دمج فرز تجميع "
    "العمود السجل القيمة النتيجة الفهرس الذاكرة العقدة الدفعة التدفق الدقة"
).split()

EL_WORDS = (
    "δεδομένα έγγραφο σελίδα κείμενο πίνακας εικόνα μηχανή ροή τμήμα σειρά "
    "ανάλυση εξαγωγή συγχώνευση ταξινόμηση ομάδα κόμβος μνήμη γρήγορο μεγάλο "
    "μικρό στήλη εγγραφή τιμή αποτέλεσμα δείκτης"
).split()

WORD_POOLS = {"en": EN_WORDS, "ar": AR_WORDS, "el": EL_WORDS}

NAV_WORDS = ["Home", "About", "Contact", "Products", "Blog", "Careers", "Support"]
AD_TEXTS = [
    "Buy now great deals",
    "Limited offer discount today",
    "Subscribe and save big",
    "Click here to win",
]
FOOTER_WORDS = ["Privacy", "Terms", "Copyright", "Sitemap", "Legal"]

CONTENT_KIND_WEIGHTS = [
    ("paragraph", 0.53),
    ("section_header", 0.12),
    ("list_item", 0.15),
    ("table", 0.06),
    ("picture", 0.04),
    ("code", 0.04),
    ("formula", 0.03),
    ("caption", 0.03),
]
MD_KINDS = {"paragraph", "section_header", "list_item", "code"}
DOCX_KINDS = MD_KINDS | {"table", "picture", "caption"}
PPTX_KINDS = {"paragraph", "section_header", "list_item", "table", "picture", "caption"}
XLSX_KINDS = {"section_header", "table"}
ADOC_KINDS = MD_KINDS
RST_KINDS = MD_KINDS  # title/section_header/paragraph/list_item/code

# geometry constants shared with kernels/pdfmodel.py semantics
PAGE_W = 612.0
COL1_X = 72.0
COL2_X = 320.0
LINE_H = 12.0
LINE_STEP = 14.0
BLOCK_GAP = 28.0
TABLE_EXTRA_GAP = 45.0  # > TABLE_CLUSTER_GAP so adjacent tables don't cluster


def _pick(rng: random.Random, weighted: list[tuple[str, float]]) -> str:
    x = rng.random()
    acc = 0.0
    for name, w in weighted:
        acc += w
        if x < acc:
            return name
    return weighted[-1][0]


def _sentence(rng: random.Random, lang: str, n_lo=6, n_hi=14) -> str:
    pool = WORD_POOLS[lang]
    n = rng.randint(n_lo, n_hi)
    words = [rng.choice(pool) for _ in range(n)]
    if lang == "ar" and rng.random() < 0.15:
        words.append(str(rng.randint(10, 9999)))  # digits inside RTL → bidi work
    return " ".join(words)


def _paragraph(rng: random.Random, lang: str) -> str:
    return " ".join(_sentence(rng, lang) for _ in range(rng.randint(1, 3)))


def _table_text(rng: random.Random, lang: str) -> str:
    pool = WORD_POOLS[lang]
    rows = rng.randint(2, 4)
    cols = rng.randint(2, 4)
    return "\n".join(
        " | ".join(rng.choice(pool) for _ in range(cols)) for _ in range(rows)
    )


def _code_text(rng: random.Random) -> str:
    n = rng.randint(1, 4)
    return "\n".join(
        f"def f{rng.randint(0, 99)}(x):\n    return x + {rng.randint(0, 99)}"
        for _ in range(n)
    )


def _content_spans(rng: random.Random, doc_id: str, lang: str, fmt: str, n_spans: int) -> list[dict]:
    """Ordered content spans with media_ref already assigned by the content
    ordering rule (media-{doc_id}-{k}, k over picture/table spans)."""
    allowed = {
        "md": MD_KINDS,
        "docx": DOCX_KINDS,
        "pptx": PPTX_KINDS,
        "xlsx": XLSX_KINDS,
        "asciidoc": ADOC_KINDS,
        "rst": RST_KINDS,
        "ipynb": MD_KINDS,
    }.get(fmt)
    spans = [{"kind": "title", "text": _sentence(rng, lang, 3, 7), "media_ref": ""}]
    while len(spans) < n_spans:
        kind = _pick(rng, CONTENT_KIND_WEIGHTS)
        if allowed and kind not in allowed:
            continue
        if kind == "table":
            text = _table_text(rng, lang)
        elif kind == "code":
            text = _code_text(rng)
        elif kind == "picture":
            text = _sentence(rng, lang, 2, 5)
        elif kind == "formula":
            text = f"E_{rng.randint(1, 9)} = x^{rng.randint(2, 5)} + {rng.randint(1, 99)}"
        elif kind in ("section_header", "caption"):
            text = _sentence(rng, lang, 2, 6)
        elif kind == "list_item":
            text = _sentence(rng, lang, 3, 8)
        else:
            text = _paragraph(rng, lang)
        spans.append({"kind": kind, "text": text, "media_ref": ""})
    media_k = 0
    for s in spans:
        if s["kind"] in ("picture", "table"):
            s["media_ref"] = f"media-{doc_id}-{media_k}"
            media_k += 1
    return spans


# ---------------------------------------------------------------------------
# PDF page-model rendering
# ---------------------------------------------------------------------------

def _wrap(text: str, width: int) -> list[str]:
    lines, cur = [], ""
    for w in text.split(" "):
        if not cur:
            cur = w
        elif len(cur) + 1 + len(w) <= width:
            cur += " " + w
        else:
            lines.append(cur)
            cur = w
    if cur:
        lines.append(cur)
    return lines or [""]


def _render_pdf(
    rng: random.Random,
    doc_id: str,
    content: list[dict],
    quality: str,
    single_page: bool = False,
) -> tuple[bytes, list[dict]]:
    """Render content spans into the synthetic page model. Returns
    (payload, full_span_list) where full_span_list adds page_header /
    page_footer / page_break structure — this extended list is both the raw
    input span list and (since PDFs carry no boilerplate) the expected
    output span sequence (before offset re-ranking)."""
    # paginate: title page gets the title + blocks; 3-8 blocks per page
    # (single_page: everything on one page — the "image" format is a
    # bitmap scan of exactly one page)
    pages_blocks: list[list[dict]] = []
    i = 0
    while i < len(content):
        take = len(content) if single_page else rng.randint(3, 8)
        pages_blocks.append(content[i : i + take])
        i += take

    all_spans: list[dict] = []
    pages_json = []
    no_text = quality == "no_text"
    tagged = quality == "tagged_good"

    for page_no, blocks in enumerate(pages_blocks, start=1):
        if page_no > 1:
            all_spans.append({"kind": "page_break", "text": "", "media_ref": ""})
        has_header = rng.random() < 0.7
        has_footer = rng.random() < 0.7
        texty = all(
            b["kind"] in ("paragraph", "list_item", "section_header") for b in blocks
        )
        two_col = texty and len(blocks) >= 4 and rng.random() < 0.25

        cells = []
        header_text = f"{doc_id} · p{page_no}"
        if has_header:
            all_spans.append({"kind": "page_header", "text": header_text, "media_ref": ""})
            cells.append(_mk_cell(COL1_X, 20.0, header_text, "body", no_text))

        def layout_column(col_blocks, col_x, wrap_w, y0):
            y = y0
            prev_table = False
            for blk in col_blocks:
                kind, text = blk["kind"], blk["text"]
                if prev_table:
                    y += TABLE_EXTRA_GAP
                    prev_table = False
                if kind == "table":
                    rows = [r.split(" | ") for r in text.split("\n")]
                    for r, row in enumerate(rows):
                        for ccol, cell_text in enumerate(row):
                            cells.append(
                                _mk_cell(
                                    col_x + ccol * 110.0, y + r * 18.0, cell_text,
                                    "table", no_text, w=100.0,
                                )
                            )
                    y += len(rows) * 18.0 + BLOCK_GAP
                    prev_table = True
                elif kind == "picture":
                    c = _mk_cell(col_x, y, "", "image", True)
                    c["glyphs"] = encode_glyphs(text)
                    c["x1"], c["y1"] = col_x + 200.0, y + 80.0
                    cells.append(c)
                    y += 80.0 + BLOCK_GAP
                elif kind == "code":
                    for line in text.split("\n"):
                        cells.append(_mk_cell(col_x, y, line, "mono", no_text))
                        y += LINE_STEP
                    y += BLOCK_GAP - LINE_STEP + LINE_STEP
                elif kind in ("title", "section_header", "formula", "caption"):
                    font = {
                        "title": "bold-xlarge",
                        "section_header": "bold-large",
                        "formula": "math",
                        "caption": "italic-small",
                    }[kind]
                    cells.append(_mk_cell(col_x, y, text, font, no_text, two_col=two_col))
                    y += LINE_STEP + BLOCK_GAP - LINE_STEP + LINE_STEP
                else:  # paragraph / list_item
                    x = col_x + (18.0 if kind == "list_item" else 0.0)
                    lines = _wrap(("• " + text) if kind == "list_item" else text, wrap_w)
                    for line in lines:
                        cells.append(_mk_cell(x, y, line, "body", no_text, two_col=two_col))
                        y += LINE_STEP
                    y += BLOCK_GAP
            return y

        if two_col:
            half = (len(blocks) + 1) // 2
            y_left = layout_column(blocks[:half], COL1_X, 26, 60.0)
            y_right = layout_column(blocks[half:], COL2_X, 26, 60.0)
            y_end = max(y_left, y_right)
        else:
            y_end = layout_column(blocks, COL1_X, 60, 60.0)

        all_spans.extend(blocks)

        height = max(792.0, y_end + 80.0)
        footer_text = f"Page {page_no}"
        if has_footer:
            all_spans.append({"kind": "page_footer", "text": footer_text, "media_ref": ""})
            cells.append(_mk_cell(COL1_X, height - 40.0, footer_text, "body", no_text))

        # quality corruption of the embedded text layer (glyphs stay clean)
        if quality == "poor":
            body_cells = [c for c in cells if not c["is_bitmap"] and c["y0"] >= 50.0]
            if not body_cells:  # picture-only page: corrupt header/footer instead
                body_cells = [c for c in cells if not c["is_bitmap"] and c["text"]]
            if body_cells:
                first = min(body_cells, key=lambda c: (c["y0"], c["x0"]))
                first["text"] = "\\ab\\cd\\ef\\12\\34\\56\\78 �" + first["text"]
        elif quality == "untagged_good":
            for c in cells:
                if not c["is_bitmap"] and c["text"] and rng.random() < 0.3:
                    c["from_ocr"] = True
                    idx = rng.randrange(len(c["text"]))
                    c["text"] = c["text"][:idx] + "·" + c["text"][idx + 1 :]

        pages_json.append(
            {"page_no": page_no, "width": PAGE_W, "height": height, "cells": cells}
        )

    payload = json.dumps({"tagged": tagged, "pages": pages_json}, ensure_ascii=False).encode("utf-8")
    return payload, all_spans


def _mk_cell(x0, y0, text, font, no_text, w=None, two_col=False):
    if two_col:
        x1 = x0 + 160.0
    elif w is not None:
        x1 = x0 + w
    else:
        x1 = x0 + min(6.0 * max(len(text), 1), 468.0)
    cell = {
        "x0": x0, "y0": y0, "x1": x1, "y1": y0 + LINE_H,
        "font": font, "text": "" if no_text else text,
        "glyphs": encode_glyphs(text),
        "is_bitmap": bool(no_text or font == "image"),
        "from_ocr": False,
    }
    return cell


# ---------------------------------------------------------------------------
# Whole-document generation
# ---------------------------------------------------------------------------

def generate_doc(i: int, seed: int = DEFAULT_SEED) -> dict:
    """Generate document i → dict with input row + expected spans + media."""
    rng = random.Random(f"{seed}:{i}")
    doc_id = f"doc-{i:08d}"
    fmt = _pick(
        rng,
        [
            # rst rides at 1%: docutils is a REAL parser at ~20 ms/doc —
            # 500× the synthetic-format kernels — so its corpus share is
            # kept small enough not to dominate the flagship wall time
            # while still exercising the foreign backend end to end
            ("html", 0.26), ("pdf", 0.26), ("docx", 0.12), ("md", 0.05),
            ("pptx", 0.09), ("xlsx", 0.06), ("asciidoc", 0.05), ("image", 0.05),
            ("rst", 0.01), ("csv", 0.01), ("yaml", 0.01), ("toml", 0.01),
            ("ini", 0.01), ("ipynb", 0.01),
        ],
    )
    lang = _pick(rng, [("en", 0.6), ("ar", 0.25), ("el", 0.15)])
    tier = _pick(rng, [("small", 0.90), ("medium", 0.08), ("large", 0.02)])
    n_spans = {
        "small": rng.randint(1, 20),
        "medium": rng.randint(50, 200),
        "large": rng.randint(500, 2000),
    }[tier]
    if fmt == "image":
        n_spans = min(n_spans, 8)  # one photographed/scanned page
    quality = (
        _pick(
            rng,
            [("tagged_good", 0.4), ("untagged_good", 0.3), ("poor", 0.2), ("no_text", 0.1)],
        )
        if fmt == "pdf"
        else ""
    )

    content = _content_spans(rng, doc_id, lang, fmt, n_spans)

    if fmt == "html":
        from .kernels.html import render_html

        raw = [{"kind": "boilerplate_nav", "text": " ".join(rng.sample(NAV_WORDS, 4)), "media_ref": ""}]
        n_ads = rng.randint(0, 3)
        ad_positions = sorted(rng.randint(1, len(content)) for _ in range(n_ads))
        ci = 0
        for pos in range(len(content) + 1):
            for p in ad_positions:
                if p == pos:
                    raw.append({"kind": "boilerplate_ad", "text": rng.choice(AD_TEXTS), "media_ref": ""})
            if pos < len(content):
                raw.append(content[pos])
        raw.append({"kind": "boilerplate_footer", "text": " ".join(rng.sample(FOOTER_WORDS, 3)), "media_ref": ""})
        payload = render_html(raw, doc_id, title_hint=content[0]["text"]).encode("utf-8")
        expected = content
    elif fmt == "pdf":
        payload, raw = _render_pdf(rng, doc_id, content, quality)
        expected = raw  # PDFs have no boilerplate: full structure is expected
    elif fmt == "image":
        # one-page all-bitmap page model (a scan): same renderer as PDF
        # with no embedded text layer, everything on a single page
        payload, raw = _render_pdf(rng, doc_id, content, "no_text", single_page=True)
        expected = raw
    elif fmt == "docx":
        from .kernels.office import render_docx

        raw = content
        payload = render_docx(content)
        expected = content
    elif fmt == "pptx":
        from .kernels.office import render_pptx

        raw = content
        payload = render_pptx(content)
        expected = content
    elif fmt == "xlsx":
        from .kernels.office import render_xlsx

        raw = content
        payload = render_xlsx(content)
        expected = content
    elif fmt == "asciidoc":
        from .kernels.office import render_asciidoc

        raw = content
        payload = render_asciidoc(content)
        expected = content
    elif fmt == "rst":
        from .kernels.rst import render_rst

        raw = content
        payload = render_rst(content)
        expected = content
    elif fmt == "csv":
        # a CSV document IS one table: the grid scales with the size tier
        # (not with _content_spans, whose title a CSV cannot carry)
        from .kernels.csvfmt import render_csv

        pool = WORD_POOLS[lang]
        cols = rng.randint(2, 6)
        n_rows = max(2, min(n_spans, 200))
        grid = "\n".join(
            " | ".join(rng.choice(pool) for _ in range(cols)) for _ in range(n_rows)
        )
        content = [{"kind": "table", "text": grid, "media_ref": f"media-{doc_id}-0"}]
        raw = content
        payload = render_csv(content)
        expected = content
    elif fmt in ("yaml", "toml", "ini"):
        # config documents: root pairs then [section] tables, 2-level,
        # unique keys per mapping; values are int literals or word phrases
        from .kernels.configfmt import render_ini, render_toml, render_yaml

        pool = WORD_POOLS[lang]
        kseq = 0

        def _key() -> str:
            nonlocal kseq
            kseq += 1
            return f"{rng.choice(pool)}_{kseq}"

        def _val() -> str:
            if rng.random() < 0.5:
                return str(rng.randint(0, 99999))
            return " ".join(rng.choice(pool) for _ in range(rng.randint(2, 4)))

        content = []
        budget = max(2, min(n_spans, 60))
        for _ in range(rng.randint(0, 3)):  # root pairs come FIRST (TOML rule)
            content.append(
                {"kind": "list_item", "text": f"{_key()} = {_val()}", "media_ref": ""}
            )
        while len(content) < budget:
            content.append(
                {"kind": "section_header", "text": _key(), "media_ref": ""}
            )
            for _ in range(rng.randint(1, 8)):
                content.append(
                    {"kind": "list_item", "text": f"{_key()} = {_val()}", "media_ref": ""}
                )
        content = content[:budget]
        if content[-1]["kind"] == "section_header" and len(content) > 1:
            content.pop()  # a trailing empty section cannot round-trip
        raw = content
        payload = {"yaml": render_yaml, "toml": render_toml, "ini": render_ini}[
            fmt
        ](content)
        expected = content
    elif fmt == "ipynb":
        from .kernels.ipynbfmt import render_ipynb

        raw = content
        payload = render_ipynb(content)
        expected = content
    else:
        from .kernels.office import render_markdown_doc

        raw = content
        payload = render_markdown_doc(content)
        expected = content

    raw_spans = [
        {"kind": s["kind"], "text": s["text"], "media_ref": s["media_ref"], "offset": k}
        for k, s in enumerate(raw)
    ]
    expected_spans = [
        {"kind": s["kind"], "text": s["text"], "media_ref": s["media_ref"], "offset": k}
        for k, s in enumerate(expected)
    ]
    media = [
        {
            "media_ref": s["media_ref"],
            "doc_id": doc_id,
            "bytes": _media_bytes(s["media_ref"]),
            "mime": "image/png" if s["kind"] == "picture" else "application/json",
        }
        for s in expected
        if s["media_ref"]
    ]
    return {
        "doc_id": doc_id,
        "spans": raw_spans,
        "format": fmt,
        "payload": payload,
        "lang": lang,
        "quality": quality,
        "byte_size": len(payload),
        "expected_spans": expected_spans,
        "media": media,
    }


def _media_bytes(media_ref: str) -> bytes:
    h = hashlib.sha1(media_ref.encode()).digest()
    return (h * 13)[:256]


def generate_batch(indices, seed: int = DEFAULT_SEED) -> list[dict]:
    return [generate_doc(int(i), seed) for i in indices]
