"""Tests for the remaining reference-operator surface: Arabic correction
gate (A10), VLM pipeline route (A7), URL-manifest fetch source (S1),
markdown scrub (M6), conversion summary (G1), max_num_pages guard."""

import json

import pyarrow as pa
import pytest
import ray.data

from docling_serve_ray.corpus import generate_doc
from docling_serve_ray.functions.textproc import rolling_fingerprint, scrub_markdown
from docling_serve_ray.kernels.arabic import (
    DeterministicArabicCorrector,
    correct_content,
    detect_arabic,
)
from docling_serve_ray.kernels.document import convert_document
from docling_serve_ray.kernels.glyphs import build_reverse_codebook
from docling_serve_ray.options import JobOptions
from docling_serve_ray.pipelines.summary import raise_if_failures, summarize_conversion
from docling_serve_ray.sources.fetch import DictFetcher, fetch_manifest

REV = build_reverse_codebook()

AR_TEXT = "النص العربي طويل بما يكفي لتجاوز حد الكلمات العشر في البوابة المطلوبة"


class TestArabicCorrection:
    def test_gate_rejects_short(self):
        assert not detect_arabic("النص قصير")

    def test_gate_rejects_latin(self):
        assert not detect_arabic("this is a long enough english sentence with many words here")

    def test_gate_accepts_arabic(self):
        assert detect_arabic(AR_TEXT)

    def test_corrector_normalizes(self):
        c = DeterministicArabicCorrector()
        assert c.correct("الـــنص") == "النص"  # tatweel stripped
        assert c.correct("أحمد إلى آخر") == "احمد الى اخر"  # alef folding

    def test_passthrough_on_failure(self):
        class Broken:
            def correct(self, text):
                raise RuntimeError("llm down")

        out, applied = correct_content(AR_TEXT, Broken())
        assert out == AR_TEXT and not applied

    def test_correction_applied_via_options(self):
        d = next(
            generate_doc(i)
            for i in range(200)
            if generate_doc(i)["lang"] == "ar" and generate_doc(i)["format"] == "md"
        )
        opts = JobOptions(enable_arabic_correction=True, enable_bidi_processing=False)
        base = JobOptions(enable_arabic_correction=False, enable_bidi_processing=False)
        out_c = convert_document(d["doc_id"], "md", d["payload"], "ar", opts, REV)
        out_b = convert_document(d["doc_id"], "md", d["payload"], "ar", base, REV)
        # spans never touched by the correction stage
        assert out_c["spans"] == out_b["spans"]


class TestVlmRoute:
    def test_vlm_forces_ocr_and_matches_ground_truth(self):
        d = next(
            generate_doc(i) for i in range(200) if generate_doc(i)["format"] == "pdf"
        )
        out = convert_document(
            d["doc_id"], "pdf", d["payload"], d["lang"],
            JobOptions(pipeline="vlm"), REV,
        )
        assert out["ocr_mode"] == "force"
        assert out["spans"] == d["expected_spans"]


class TestMaxNumPages:
    def test_guard_fails_oversized_doc(self):
        d = None
        for i in range(300):
            c = generate_doc(i)
            if c["format"] == "pdf" and len(json.loads(c["payload"])["pages"]) >= 3:
                d = c
                break
        out = convert_document(
            d["doc_id"], "pdf", d["payload"], d["lang"],
            JobOptions(max_num_pages=2), REV,
        )
        assert out["status"] == "failure"
        assert "max_num_pages" in out["errors"][0]


class TestFetchSource:
    def test_fetch_and_convert(self, ray_session):
        docs = [generate_doc(i) for i in range(12)]
        blobs = {f"mem://{d['doc_id']}": d["payload"] for d in docs}
        manifest = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": [d["doc_id"] for d in docs],
                    "url": list(blobs.keys()),
                    "format": [d["format"] for d in docs],
                    "lang": [d["lang"] for d in docs],
                }
            )
        )
        fetched = fetch_manifest(manifest, DictFetcher(blobs))
        rows = fetched.take_all()
        assert all(r["fetch_status"] == "success" for r in rows)
        assert len(rows) == 12

        from docling_serve_ray.pipelines.convert import build_convert_pipeline

        out = build_convert_pipeline(
            fetch_manifest(manifest, DictFetcher(blobs)), concurrency=2
        ).take_all()
        expected = {d["doc_id"]: d["expected_spans"] for d in docs}
        assert all([dict(s) for s in r["spans"]] == expected[r["doc_id"]] for r in out)

    def test_fetch_failure_survives(self, ray_session):
        manifest = ray.data.from_arrow(
            pa.table({"doc_id": ["x"], "url": ["mem://missing"], "format": ["html"], "lang": ["en"]})
        )
        rows = fetch_manifest(manifest, DictFetcher({}), drop_failures=False).take_all()
        assert rows[0]["fetch_status"].startswith("failure")
        assert rows[0]["payload"] == b""


class TestScrubAndFingerprint:
    def test_scrub(self):
        md = "# Title\n\n**bold** and `code`\n\n\n- item\n> quote"
        out = scrub_markdown(md)
        assert "#" not in out and "**" not in out and "`" not in out
        assert "\n\n" not in out

    def test_rolling_fingerprint_order_sensitive(self):
        assert rolling_fingerprint("a b c") != rolling_fingerprint("c b a")
        assert rolling_fingerprint("a b c") == rolling_fingerprint("a  b\tc")


class TestSummary:
    def test_summarize_and_abort(self, ray_session, small_corpus):
        from docling_serve_ray.pipelines.convert import build_convert_pipeline, read_input

        out = build_convert_pipeline(read_input(small_corpus), concurrency=2)
        df = summarize_conversion(out)
        assert set(df["status"]) == {"success"}
        assert df["n_docs"].sum() == 200
        raise_if_failures(out)  # no failures → no raise

        bad = build_convert_pipeline(
            read_input(small_corpus),
            options=JobOptions(from_formats=("pdf",)),  # html/docx/md rows fail
            concurrency=2,
        )
        with pytest.raises(RuntimeError, match="failed conversion"):
            raise_if_failures(bad)


class TestDocumentTimeout:
    def test_post_hoc_marking(self):
        d = generate_doc(3)
        out = convert_document(
            d["doc_id"], d["format"], d["payload"], d["lang"],
            JobOptions(document_timeout=0.0), REV,
        )
        assert out["status"] == "partial_success"
        assert "document_timeout" in out["errors"][0]
        # spans are still the full conversion (post-hoc budget check)
        assert out["spans"] == d["expected_spans"]

    def test_default_no_timeout(self):
        d = generate_doc(3)
        out = convert_document(d["doc_id"], d["format"], d["payload"], d["lang"], JobOptions(), REV)
        assert out["status"] == "success"

    def test_preemptive_kills_hanging_kernel_within_budget(self):
        """VERDICT r02 #7: a deliberately hanging kernel must come back
        partial_success within the timeout budget — the subprocess is
        hard-killed, not awaited (post-hoc marking can never do this)."""
        import time as _time

        from docling_serve_ray.kernels.document import convert_document_preemptive

        def hanging_kernel(*a, **kw):
            _time.sleep(60)

        d = generate_doc(3)
        opts = JobOptions(document_timeout=0.5, preemptive_timeout=True)
        t0 = _time.monotonic()
        out = convert_document_preemptive(
            d["doc_id"], d["format"], d["payload"], d["lang"], opts, REV,
            kernel=hanging_kernel,
        )
        wall = _time.monotonic() - t0
        assert out["status"] == "partial_success"
        assert "subprocess killed" in out["errors"][0]
        assert out["spans"] == []
        assert wall < 5  # killed at ~0.5s, far within the 60s hang

    def test_preemptive_fast_doc_unchanged(self):
        """A document finishing inside the budget must produce the exact
        row of the in-process kernel (same spans, success)."""
        from docling_serve_ray.kernels.document import convert_document_preemptive

        d = generate_doc(4)
        opts = JobOptions(document_timeout=30.0, preemptive_timeout=True)
        out = convert_document_preemptive(
            d["doc_id"], d["format"], d["payload"], d["lang"], opts, REV,
        )
        assert out["status"] == "success"
        assert out["spans"] == d["expected_spans"]

    def test_preemptive_child_crash_is_failure_row(self):
        from docling_serve_ray.kernels.document import convert_document_preemptive

        def crashing_kernel(*a, **kw):
            raise RuntimeError("wedged parser")

        d = generate_doc(5)
        opts = JobOptions(document_timeout=10.0, preemptive_timeout=True)
        out = convert_document_preemptive(
            d["doc_id"], d["format"], d["payload"], d["lang"], opts, REV,
            kernel=crashing_kernel,
        )
        assert out["status"] == "failure"
        assert "wedged parser" in out["errors"][0]


class TestBase64Ingest:
    def test_decode_then_convert(self, ray_session):
        """S2 base64 ingest: a base64-string payload column decodes to
        binary and converts identically to the raw-bytes path; a corrupt
        row degrades to decode_status='failure', not a failing job."""
        import base64

        from docling_serve_ray.pipelines.convert import build_convert_pipeline
        from docling_serve_ray.sources.fetch import decode_base64_payloads

        docs = [generate_doc(i) for i in range(6)]
        t = pa.table(
            {
                "doc_id": pa.array([d["doc_id"] for d in docs] + ["bad-doc"]),
                "format": pa.array([d["format"] for d in docs] + ["md"]),
                "payload_b64": pa.array(
                    [base64.b64encode(d["payload"]).decode() for d in docs]
                    + ["!!!not-base64!!!"]
                ),
                "lang": pa.array([d["lang"] for d in docs] + ["en"]),
            }
        )
        ds = decode_base64_payloads(ray.data.from_arrow(t))
        rows = {r["doc_id"]: r for r in ds.take_all()}
        assert rows["bad-doc"]["decode_status"] == "failure"
        assert all(
            rows[d["doc_id"]]["payload"] == d["payload"] for d in docs
        )
        converted = {
            r["doc_id"]: r
            for r in build_convert_pipeline(
                ds.filter(lambda r: r["decode_status"] == "success")
            ).take_all()
        }
        for d in docs:
            assert [dict(s) for s in converted[d["doc_id"]]["spans"]] == d["expected_spans"]
