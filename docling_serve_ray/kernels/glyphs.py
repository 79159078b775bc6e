"""Synthetic glyph encoding — the deterministic stand-in for rasterized text.

The sandbox has no OCR engine or layout model (SURVEY.md §7.3 faithfulness
boundary), so bitmap regions in the synthetic PDF page model carry their
text as a *glyph-id stream*: each codepoint is mapped through a seeded
substitution codebook to an integer id, and the stream is the space-joined
ids. "OCR" is then a real (if small) stateful computation: an engine that
builds the reverse codebook once per actor (the model-load analog —
reference holds EasyOCR/Tesseract engines in per-process converter caches,
docling_conversion.py:67-85) and decodes glyph streams per batch.

The codebook is keyed by GLYPH_SEED so encode/decode are reproducible
everywhere without sharing state.
"""

from __future__ import annotations

import random

GLYPH_SEED = 20260817

# Codepoints the corpus can contain: ASCII printable + Arabic block + Greek
# block + a few specials used by the quality-corruption fixtures.
_RANGES = [
    (0x20, 0x7E),  # ASCII printable
    (0x0600, 0x06FF),  # Arabic
    (0x0370, 0x03FF),  # Greek
]
_EXTRA = ["\n", "\t", "�", "•", "—", "–", "·"]


def _alphabet() -> list[str]:
    chars = [chr(c) for lo, hi in _RANGES for c in range(lo, hi + 1)]
    chars.extend(_EXTRA)
    return chars


def build_codebook() -> dict[str, int]:
    """char → glyph-id; deterministic permutation seeded by GLYPH_SEED."""
    chars = _alphabet()
    ids = list(range(1000, 1000 + len(chars)))
    rng = random.Random(GLYPH_SEED)
    rng.shuffle(ids)
    return dict(zip(chars, ids))


def build_reverse_codebook() -> dict[int, str]:
    return {v: k for k, v in build_codebook().items()}


_ENC: dict[str, int] | None = None


def encode_glyphs(text: str) -> str:
    """Text → space-joined glyph ids. Unknown chars map to id 0 (dropped on
    decode — mirrors real OCR losing unsupported glyphs)."""
    global _ENC
    if _ENC is None:
        _ENC = build_codebook()
    return " ".join(str(_ENC.get(c, 0)) for c in text)


def decode_glyphs(glyphs: str, reverse: dict[int, str]) -> str:
    """Glyph-id stream → text, using a prebuilt reverse codebook (actor state)."""
    if not glyphs:
        return ""
    out = []
    for tok in glyphs.split(" "):
        c = reverse.get(int(tok))
        if c is not None:
            out.append(c)
    return "".join(out)
