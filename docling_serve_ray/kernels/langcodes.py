"""OCR language-code normalization (M7 in SURVEY.md §2.2).

Behavioral twin of the reference's ocr_language_utils.py: lower/strip each
code, pass through codes already valid for Tesseract, map common ISO codes,
drop unknowns, dedup preserving order (:129-181), '+'-join for the
ocrmypdf-style consumer (:184-194). Applied once to job options on the
driver — not a data-plane operator.
"""

from __future__ import annotations

# Common ISO-639-1 (and a few verbose names) → Tesseract codes. Covers the
# languages the synthetic corpus and the reference's test corpus exercise;
# same mapping semantics as the reference's 90-entry table.
ISO_TO_TESSERACT = {
    "en": "eng", "ar": "ara", "fr": "fra", "de": "deu", "es": "spa",
    "it": "ita", "pt": "por", "ru": "rus", "zh": "chi_sim", "zh-cn": "chi_sim",
    "zh-tw": "chi_tra", "ja": "jpn", "ko": "kor", "hi": "hin", "th": "tha",
    "vi": "vie", "tr": "tur", "pl": "pol", "nl": "nld", "sv": "swe",
    "da": "dan", "no": "nor", "fi": "fin", "cs": "ces", "hu": "hun",
    "ro": "ron", "bg": "bul", "hr": "hrv", "sk": "slk", "sl": "slv",
    "et": "est", "lv": "lav", "lt": "lit", "uk": "ukr", "el": "ell",
    "he": "heb", "fa": "fas", "ur": "urd", "bn": "ben", "ta": "tam",
    "te": "tel", "ml": "mal", "kn": "kan", "gu": "guj", "pa": "pan",
    "ne": "nep", "si": "sin", "my": "mya", "km": "khm", "lo": "lao",
    "ka": "kat", "am": "amh", "is": "isl", "mt": "mlt", "cy": "cym",
    "ga": "gle", "gd": "gla", "eu": "eus", "ca": "cat", "gl": "glg",
    "la": "lat", "eo": "epo",
    "english": "eng", "arabic": "ara", "french": "fra", "german": "deu",
    "spanish": "spa", "italian": "ita", "portuguese": "por", "russian": "rus",
    "japanese": "jpn", "korean": "kor", "hindi": "hin",
    "chinese": "chi_sim", "chinese-simplified": "chi_sim",
    "chinese-traditional": "chi_tra",
}

TESSERACT_CODES = frozenset(
    {
        "afr", "amh", "ara", "asm", "aze", "bel", "ben", "bod", "bos", "bre",
        "bul", "cat", "ceb", "ces", "chi_sim", "chi_tra", "chr", "cym", "dan",
        "deu", "div", "dzo", "ell", "eng", "enm", "epo", "est", "eus", "fao",
        "fas", "fin", "fra", "frk", "frm", "fry", "gla", "gle", "glg", "grc",
        "guj", "hat", "heb", "hin", "hrv", "hun", "hye", "iku", "ind", "isl",
        "ita", "jav", "jpn", "kan", "kat", "kaz", "khm", "kir", "kor", "kur",
        "lao", "lat", "lav", "lit", "ltz", "mal", "mar", "mkd", "mlt", "mon",
        "mri", "msa", "mya", "nep", "nld", "nor", "oci", "ori", "pan", "pol",
        "por", "pus", "que", "ron", "rus", "san", "sin", "slk", "slv", "snd",
        "spa", "sqi", "srp", "sun", "swa", "swe", "syr", "tam", "tat", "tel",
        "tgk", "tgl", "tha", "tir", "ton", "tur", "uig", "ukr", "urd", "uzb",
        "vie", "yid", "yor",
    }
)


def convert_to_tesseract_codes(ocr_languages) -> list[str]:
    """lower/strip → passthrough valid → map ISO → drop unknown → ordered dedup."""
    if not ocr_languages:
        return []
    converted = []
    for lang in ocr_languages:
        lang = lang.lower().strip()
        if not lang:
            continue
        if lang in TESSERACT_CODES:
            converted.append(lang)
        elif lang in ISO_TO_TESSERACT:
            converted.append(ISO_TO_TESSERACT[lang])
        # unknown codes are skipped
    unique = []
    for lang in converted:
        if lang not in unique:
            unique.append(lang)
    return unique


def format_for_ocrmypdf(tesseract_languages: list[str]) -> str:
    return "+".join(tesseract_languages) if tesseract_languages else ""
