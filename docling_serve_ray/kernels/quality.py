"""PDF text-quality analysis + OCR-mode decision tree.

Reimplements the reference's deterministic quality kernel with identical
thresholds and decision branches (reference: docling_serve/pdf_analysis.py:
indicators :74-111, score :113-120, decision tree :127-141, default force on
error :146-149). The reference extracts page text with pdfplumber; here the
caller supplies per-page text strings (our synthetic page model carries the
embedded text layer directly).

This is the M1 operator in SURVEY.md §2.2 — a pure function applied via
stateless map_batches.
"""

from __future__ import annotations

import re
import unicodedata

_ESCAPE_RE = re.compile(r"\\[0-9a-fA-F]{2}")
_SPACES_RE = re.compile(r"[ ]{1,10}")
_REPL_RE = re.compile("�")

# Reference thresholds (pdf_analysis.py:79,87,93,103,115)
CONTROL_RATIO_MAX = 0.03
SYMBOL_RATIO_MAX = 0.30
ESCAPE_COUNT_MAX = 5
AVG_SPACE_LEN_MAX = 2.5
POOR_SCORE_THRESHOLD = 0.8
SAMPLE_CHARS = 2000
SAMPLE_HEAD_PAGES = 5


def sample_pages(page_texts: list[str]) -> list[str]:
    """Reference sampling rule (pdf_analysis.py:58-66): pages with text count
    toward coverage; the first 5 pages plus every ~N/10-th page are sampled
    (first 2000 chars each)."""
    pages_total = len(page_texts)
    samples = []
    stride = max(1, int(pages_total / 10))
    for page_num, text in enumerate(page_texts):
        page_text = text.strip()
        if len(page_text) > 0:
            if page_num < SAMPLE_HEAD_PAGES or page_num % stride == 0:
                samples.append(page_text[:SAMPLE_CHARS])
    return samples


def poor_quality_indicators(sample: str) -> int:
    """Language-agnostic per-sample indicator count (pdf_analysis.py:75-111)."""
    from collections import Counter

    indicators = 0
    n = max(len(sample), 1)

    # count per UNIQUE character (samples repeat a small alphabet) — exactly
    # the same totals as a per-character loop, ~30× fewer category() calls
    char_counts = Counter(sample)
    control_chars = 0
    symbols = 0
    for c, cnt in char_counts.items():
        cat0 = unicodedata.category(c)[0]
        if cat0 == "C":
            control_chars += cnt
        elif cat0 in ("P", "S"):
            symbols += cnt
    if control_chars / n > CONTROL_RATIO_MAX:
        indicators += 1
    if symbols / n > SYMBOL_RATIO_MAX:
        indicators += 1

    escapes = len(_ESCAPE_RE.findall(sample))
    if escapes > ESCAPE_COUNT_MAX:
        indicators += 2  # reference weights escape sequences higher

    runs = _SPACES_RE.findall(sample)
    if runs:
        avg_space_len = sum(len(s) for s in runs) / len(runs)
        if avg_space_len > AVG_SPACE_LEN_MAX:
            indicators += 1

    indicators += len(_REPL_RE.findall(sample))
    return indicators


def analyze_page_texts(page_texts: list[str], is_tagged: bool) -> dict:
    """Full analysis → dict(needs_ocr, has_text, is_tagged, text_quality,
    recommended_mode). Semantics of pdf_analysis.py:10-149 with the
    file-parsing replaced by the already-extracted text layer."""
    result = {
        "needs_ocr": True,
        "has_text": False,
        "is_tagged": bool(is_tagged),
        "text_quality": "unknown",
        "recommended_mode": "force",  # default, incl. on any error
    }
    try:
        samples = sample_pages(page_texts)
        if samples:
            result["has_text"] = True
            total = sum(poor_quality_indicators(s) for s in samples)
            quality_score = total / max(len(samples), 1)
            result["text_quality"] = (
                "poor" if quality_score > POOR_SCORE_THRESHOLD else "good"
            )

        # Decision tree — pdf_analysis.py:127-141, branch order preserved.
        if result["is_tagged"] and result["has_text"] and result["text_quality"] != "poor":
            result["needs_ocr"] = False
            result["recommended_mode"] = "skip"
        elif result["has_text"] and result["text_quality"] == "poor":
            result["recommended_mode"] = "force"
        elif result["has_text"] and not result["is_tagged"]:
            result["recommended_mode"] = "redo"
        else:
            result["recommended_mode"] = "force"
        return result
    except Exception:
        return result


def recommended_ocr_mode(page_texts: list[str], is_tagged: bool) -> str:
    return analyze_page_texts(page_texts, is_tagged)["recommended_mode"]
