"""Scalar text functions from the reference's inventory (SURVEY.md §2.7).

- ``scrub_markdown`` — M6: the AI-vision plain-text export scrub
  (reference response_preparation.py:60-65): strip markdown tokens,
  collapse newline runs.
- ``options_fingerprint`` — G4: SHA-1 of canonical JSON
  (docling_conversion.py:44-64) — exposed on JobOptions.options_hash too.
- ``rolling_fingerprint`` — polynomial rolling hash over tokens (document
  fingerprinting for the text-analysis suite).
"""

from __future__ import annotations

import re

_MD_TOKENS_RE = re.compile(r"(^#{1,6}\s+|\*\*|\*|`{1,3}|^>\s?|^[-+]\s+|!\[|\]\([^)]*\))", re.M)
_NEWLINE_RUN_RE = re.compile(r"\n{2,}")

ROLL_BASE = 1000003
ROLL_MOD = (1 << 61) - 1


def scrub_markdown(text: str) -> str:
    """Markdown → plain text: token strip + newline collapse (M6)."""
    out = _MD_TOKENS_RE.sub("", text)
    out = _NEWLINE_RUN_RE.sub("\n", out)
    return out.strip()


def rolling_fingerprint(text: str) -> int:
    """Order-sensitive polynomial rolling hash over whitespace tokens —
    a 61-bit document fingerprint (equal docs ⇒ equal fingerprints;
    near-dups differ, unlike bag-of-words hashes)."""
    h = 0
    for tok in text.split():
        th = 0
        for ch in tok:
            th = (th * 31 + ord(ch)) % ROLL_MOD
        h = (h * ROLL_BASE + th + 1) % ROLL_MOD
    return h
