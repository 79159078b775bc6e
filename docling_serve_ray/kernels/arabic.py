"""Arabic LLM OCR-correction stage (A10 in SURVEY.md §2.3) — gate logic +
injectable correction client.

Reference semantics (arabic_correction_middleware.py): the correction runs
only when the content has ≥ 10 words and language-detects as Arabic on a
sample of the first 100 words (:69-97); the LLM call uses fully
deterministic decoding (temp 0, top_k 1, fixed seed — :119-135); on any
client failure the original text passes through unchanged (:171-180).

The sandbox has no LLM, so the default client is a deterministic text
normalizer that performs real (if simple) Arabic OCR cleanup: strip
tatweel (U+0640), fold Arabic presentation forms to base letters, and
normalize alef variants — the same *shape* of transformation a correction
model applies, behind the same client protocol a real model would use.
"""

from __future__ import annotations

import re
import unicodedata

ARABIC_CHAR_RE = re.compile(r"[؀-ۿ]")
MIN_WORDS = 10
SAMPLE_WORDS = 100
ARABIC_RATIO_THRESHOLD = 0.5  # langdetect stand-in: majority-Arabic sample

_TATWEEL = "ـ"
_ALEF_VARIANTS = {"آ": "ا", "أ": "ا", "إ": "ا"}


def detect_arabic(text: str) -> bool:
    """Gate: ≥10 words and the first-100-word sample is majority Arabic
    (the reference calls langdetect on the same sample,
    arabic_correction_middleware.py:89)."""
    words = text.split()
    if len(words) < MIN_WORDS:
        return False
    sample = " ".join(words[:SAMPLE_WORDS])
    letters = [c for c in sample if c.isalpha()]
    if not letters:
        return False
    arabic = sum(1 for c in letters if ARABIC_CHAR_RE.match(c))
    return arabic / len(letters) >= ARABIC_RATIO_THRESHOLD


class DeterministicArabicCorrector:
    """Default injectable client: deterministic Arabic normalization.
    Generation params mirror the reference's deterministic decoding config
    (temp 0 / top_k 1 / seed 42) as metadata for parity."""

    generation_params = {"temperature": 0, "top_k": 1, "seed": 42}

    def correct(self, text: str) -> str:
        out = text.replace(_TATWEEL, "")
        out = "".join(_ALEF_VARIANTS.get(c, c) for c in out)
        # fold presentation forms (U+FB50–U+FEFF) to base letters
        if any("ﭐ" <= c <= "﻿" for c in out):
            out = unicodedata.normalize("NFKC", out)
        return out


def correct_content(text: str, client) -> tuple[str, bool]:
    """Apply the client to Arabic content; passthrough on failure
    (reference :171-180) or when the gate rejects. Returns (text, applied)."""
    if not text or not detect_arabic(text):
        return text, False
    try:
        corrected = client.correct(text)
        return corrected, corrected != text
    except Exception:
        return text, False
