"""Unit tests for the deterministic kernels (reference-semantics vectors
from FIXTURES.md 'Unit-test vectors')."""

from docling_serve_ray.kernels import bidi, langcodes, quality
from docling_serve_ray.kernels.glyphs import (
    build_reverse_codebook,
    decode_glyphs,
    encode_glyphs,
)
from docling_serve_ray.kernels.serialize import (
    spans_to_doctags,
    spans_to_markdown,
    spans_to_text,
)


class TestQualityDecisionTree:
    """Branches of pdf_analysis.py:127-141 with the exact thresholds."""

    def test_tagged_good_text_skips(self):
        r = quality.analyze_page_texts(["This is a perfectly normal page of text."], True)
        assert r["recommended_mode"] == "skip"
        assert not r["needs_ocr"]

    def test_untagged_good_text_redo(self):
        r = quality.analyze_page_texts(["This is a perfectly normal page of text."], False)
        assert r["recommended_mode"] == "redo"

    def test_no_text_forces(self):
        assert quality.analyze_page_texts(["", "   "], True)["recommended_mode"] == "force"
        assert quality.analyze_page_texts([], False)["recommended_mode"] == "force"

    def test_escape_sequences_force(self):
        # >5 \xx escapes → +2 indicators per sample → score 2 > 0.8 → poor
        sample = r"\ab\cd\ef\12\34\56\78 some text"
        r = quality.analyze_page_texts([sample], True)
        assert r["text_quality"] == "poor"
        assert r["recommended_mode"] == "force"

    def test_five_escapes_not_poor(self):
        sample = r"\ab\cd\ef\12\34 ordinary words follow here"  # exactly 5: not > 5
        r = quality.analyze_page_texts([sample], False)
        assert r["text_quality"] == "good"
        assert r["recommended_mode"] == "redo"

    def test_replacement_chars_counted_each(self):
        r = quality.analyze_page_texts(["ok text �", "clean page here"], True)
        # 1 indicator / 2 samples = 0.5 → good → tagged skip
        assert r["recommended_mode"] == "skip"
        r2 = quality.analyze_page_texts(["bad ��� page"], True)
        # symbol-light but 3 replacement chars → score 3 → poor → force
        assert r2["recommended_mode"] == "force"

    def test_control_char_ratio(self):
        good = "abcdefghij" * 10
        bad = "abc\x01\x02\x03defg" * 10  # 30% control chars > 3%
        assert quality.poor_quality_indicators(good) == 0
        assert quality.poor_quality_indicators(bad) >= 1

    def test_symbol_ratio(self):
        bad = "!!!???***" + "ab"  # >30% punctuation/symbols
        assert quality.poor_quality_indicators(bad) >= 1

    def test_spacing_runs(self):
        bad = "word    word     word    word"  # mean run of spaces > 2.5
        assert quality.poor_quality_indicators(bad) >= 1

    def test_sampling_rule(self):
        # 20 pages: first 5 sampled + every 2nd page (stride = 20//10)
        pages = [f"page {i} text" for i in range(20)]
        samples = quality.sample_pages(pages)
        assert len(samples) == 5 + sum(
            1 for i in range(5, 20) if i % 2 == 0
        )


class TestGlyphs:
    def test_roundtrip(self):
        rev = build_reverse_codebook()
        for text in ["Hello, World! 123", "النص العربي", "δεδομένα εδώ", "• bullet\nline"]:
            assert decode_glyphs(encode_glyphs(text), rev) == text


class TestLangCodes:
    def test_fixture_vector(self):
        assert langcodes.convert_to_tesseract_codes(["en", "ar", "zh", "bogus", "eng"]) == [
            "eng",
            "ara",
            "chi_sim",
        ]

    def test_passthrough_and_case(self):
        assert langcodes.convert_to_tesseract_codes([" ENG ", "fra", "FR"]) == ["eng", "fra"]

    def test_ocrmypdf_join(self):
        assert langcodes.format_for_ocrmypdf(["eng", "ara"]) == "eng+ara"
        assert langcodes.format_for_ocrmypdf([]) == ""


class TestBidi:
    def test_ltr_untouched(self):
        text = "# Heading\n\nplain english paragraph\n"
        out, applied = bidi.apply_bidi_if_changed(text)
        assert out == text and not applied

    def test_markdown_prefix_preserved(self):
        line = "## النص العربي\n"
        out = bidi.process_line(line)
        assert out.startswith("## ")
        assert out.endswith("\n")
        # body is reordered (reversed for pure-RTL)
        assert out[3:-1] == bidi.get_display("النص العربي")

    def test_pure_rtl_reversed(self):
        s = "ابج"
        assert bidi.get_display(s) == s[::-1]

    def test_mixed_run_keeps_latin(self):
        s = "ابج abc"
        out = bidi.get_display(s)
        assert "abc" in out  # LTR run not reversed
        assert out.index("abc") == 0  # visually first in RTL base order

    def test_digits_keep_order(self):
        s = "ابج 123"
        out = bidi.get_display(s)
        assert "123" in out

    def test_bullet_prefix(self):
        out = bidi.process_line("- النص\n")
        assert out.startswith("- ")

    def test_only_rtl_lines_changed(self):
        text = "english line\nالنص العربي\nanother english\n"
        out = bidi.process_markdown(text)
        lines = out.split("\n")
        assert lines[0] == "english line"
        assert lines[2] == "another english"
        assert lines[1] == bidi.get_display("النص العربي")


SPANS = [
    {"kind": "title", "text": "Doc Title", "media_ref": "", "offset": 0},
    {"kind": "page_header", "text": "hdr", "media_ref": "", "offset": 1},
    {"kind": "section_header", "text": "Intro", "media_ref": "", "offset": 2},
    {"kind": "paragraph", "text": "Hello world.", "media_ref": "", "offset": 3},
    {"kind": "list_item", "text": "first", "media_ref": "", "offset": 4},
    {"kind": "table", "text": "a | b\nc | d", "media_ref": "media-x-0", "offset": 5},
    {"kind": "picture", "text": "alt text", "media_ref": "media-x-1", "offset": 6},
    {"kind": "code", "text": "x = 1", "media_ref": "", "offset": 7},
    {"kind": "formula", "text": "E = mc^2", "media_ref": "", "offset": 8},
    {"kind": "page_break", "text": "", "media_ref": "", "offset": 9},
    {"kind": "page_footer", "text": "Page 1", "media_ref": "", "offset": 10},
]


class TestSerializers:
    def test_markdown(self):
        md = spans_to_markdown(SPANS)
        assert "# Doc Title" in md
        assert "## Intro" in md
        assert "- first" in md
        assert "| a | b |" in md
        assert "![alt text](media-x-1)" in md
        assert "```\nx = 1\n```" in md
        assert "$$E = mc^2$$" in md
        # furniture excluded from markdown
        assert "hdr" not in md and "Page 1" not in md

    def test_page_break_placeholder(self):
        md = spans_to_markdown(SPANS, page_break_placeholder="<!-- pb -->")
        assert "<!-- pb -->" in md
        assert "<!-- pb -->" not in spans_to_markdown(SPANS)

    def test_text_strips_markdown(self):
        txt = spans_to_text(SPANS)
        assert "Doc Title" in txt and "#" not in txt
        assert "first" in txt and "- first" not in txt
        assert "hdr" not in txt

    def test_doctags_shape(self):
        dt = spans_to_doctags(SPANS)
        assert dt.startswith("<doctag><title><loc_0>")
        assert "<page_header><loc_1>hdr</page_header>" in dt
        assert "<ref_media-x-1>" in dt
        assert dt.endswith("</doctag>")
