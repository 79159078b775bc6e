"""Sequential round-trip: payload → kernels → spans == ground truth.

No Ray — this is the pure-Python oracle path over the synthetic corpus
(FIXTURES.md T2 invariant), plus targeted per-format and per-quality cases.
"""

import json

import pytest

from docling_serve_ray.corpus import generate_doc
from docling_serve_ray.kernels.document import analyze_document, convert_document
from docling_serve_ray.kernels.glyphs import build_reverse_codebook
from docling_serve_ray.kernels.html import container_score, extract_html, parse_dom
from docling_serve_ray.options import JobOptions

OPTS = JobOptions()
REV = build_reverse_codebook()


def _convert(d, options=OPTS, **kw):
    return convert_document(
        d["doc_id"], d["format"], d["payload"], d["lang"], options, REV, **kw
    )


class TestOracleEquality:
    def test_400_docs_exact_span_equality(self):
        mismatches = []
        for i in range(400):
            d = generate_doc(i)
            out = _convert(d)
            assert out["status"] == "success", (i, out["errors"])
            if out["spans"] != d["expected_spans"]:
                mismatches.append(d["doc_id"])
        assert mismatches == []

    def test_mode_families(self):
        """Analyzer output stays within the family the fixture's quality
        tier implies (symbol-dense pages may legitimately escalate to
        force — same behavior as the reference's indicator thresholds)."""
        allowed = {
            "tagged_good": {"skip", "force"},
            "untagged_good": {"redo", "force"},
            "poor": {"force"},
            "no_text": {"force"},
        }
        seen = set()
        for i in range(400):
            d = generate_doc(i)
            if d["format"] != "pdf":
                continue
            mode = analyze_document("pdf", d["payload"], OPTS)
            assert mode in allowed[d["quality"]], (d["doc_id"], d["quality"], mode)
            seen.add(d["quality"])
        assert seen == set(allowed)  # all four tiers exercised


class TestOcrModes:
    """The OCR mode gates are observable: wrong modes give wrong text."""

    def _corrupted_pdf(self):
        for i in range(400):
            d = generate_doc(i)
            if d["format"] == "pdf" and d["quality"] == "untagged_good":
                # ensure the payload really is corrupted vs ground truth
                raw = json.loads(d["payload"].decode())
                if any(
                    c.get("from_ocr") for p in raw["pages"] for c in p["cells"]
                ):
                    return d
        pytest.skip("no corrupted untagged doc in range")

    def test_skip_keeps_corruption_redo_fixes_it(self):
        d = self._corrupted_pdf()
        skip_out = _convert(d, ocr_mode="skip")
        redo_out = _convert(d, ocr_mode="redo")
        assert redo_out["spans"] == d["expected_spans"]
        assert skip_out["spans"] != d["expected_spans"]  # '·' corruption kept

    def test_force_equals_redo_on_corrupted(self):
        d = self._corrupted_pdf()
        assert _convert(d, ocr_mode="force")["spans"] == d["expected_spans"]

    def test_force_ocr_option_propagates(self):
        d = self._corrupted_pdf()
        out = _convert(d, options=JobOptions(force_ocr=True))
        assert out["ocr_mode"] == "force"
        assert out["spans"] == d["expected_spans"]


class TestHtmlExtraction:
    def test_boilerplate_dropped(self):
        html = """<html><body>
        <nav class="nav"><a href="/">Home</a> <a href="/a">About</a></nav>
        <section class="content-block"><h1>Title Here</h1>
        <p>A long enough paragraph of real content with many words in it to score well.</p>
        </section>
        <div class="ad banner"><a href="#">Buy now cheap deals</a></div>
        <footer class="footer"><a href="/p">Privacy</a></footer>
        </body></html>"""
        spans = extract_html(html, "t")
        kinds = [s["kind"] for s in spans]
        assert kinds == ["title", "paragraph"]

    def test_link_density_drops_unlabeled_container(self):
        # no class hints at all: pure link-density call
        html = """<html><body>
        <div><a href="/1">one</a> <a href="/2">two</a> <a href="/3">three</a></div>
        <div><p>This block is almost entirely plain prose text, long enough to
        be treated as the main content of the page by the scorer.</p></div>
        </body></html>"""
        spans = extract_html(html, "t")
        assert len(spans) == 1 and spans[0]["kind"] == "paragraph"

    def test_content_with_some_links_kept(self):
        html = """<html><body><article>
        <p>Mostly prose with one <a href="/ref">reference link</a> inside a
        long paragraph that should still easily be kept as content text.</p>
        </article></body></html>"""
        spans = extract_html(html, "t")
        assert [s["kind"] for s in spans] == ["paragraph"]

    def test_container_scores(self):
        nav = parse_dom('<nav class="nav menu"><a href="/">Home</a></nav>').children[0]
        art = parse_dom(
            "<article><p>"
            + "text content words here " * 10
            + "</p></article>"
        ).children[0]
        assert container_score(nav) < 0 < container_score(art)

    def test_media_ref_assignment(self):
        html = """<html><body><section class="content-block">
        <p>Intro paragraph that is long enough to pass the content scorer.</p>
        <figure><img src="x.png" alt="first pic"/></figure>
        <table><tr><td>a</td><td>b</td></tr></table>
        <figure><img src="y.png" alt="second pic"/></figure>
        </section></body></html>"""
        spans = extract_html(html, "docZ")
        refs = [s["media_ref"] for s in spans if s["media_ref"]]
        assert refs == ["media-docZ-0", "media-docZ-1", "media-docZ-2"]


class TestErrorSemantics:
    def test_bad_payload_yields_failure_row(self):
        out = convert_document("x", "pdf", b"not json", "en", OPTS, REV, ocr_mode="skip")
        assert out["status"] == "failure"
        assert out["errors"]
        assert out["spans"] == []

    def test_unsupported_format(self):
        out = convert_document("x", "xlsx", b"", "en", OPTS, REV)
        assert out["status"] == "failure"

    def test_format_allowlist(self):
        opts = JobOptions(from_formats=("pdf",))
        d = next(generate_doc(i) for i in range(50) if generate_doc(i)["format"] == "html")
        out = convert_document(d["doc_id"], "html", d["payload"], "en", opts, REV)
        assert out["status"] == "failure"


class TestPageRange:
    def test_page_range_windows_pdf(self):
        d = None
        for i in range(400):
            c = generate_doc(i)
            if c["format"] == "pdf":
                raw = json.loads(c["payload"].decode())
                if len(raw["pages"]) >= 3:
                    d = c
                    break
        assert d is not None
        out = _convert(d, options=JobOptions(page_range=(1, 1)))
        full = _convert(d)
        assert 0 < len(out["spans"]) < len(full["spans"])
        assert all(s["kind"] != "page_break" for s in out["spans"])
