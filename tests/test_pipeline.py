"""Distributed pipeline tests: span equality under parallelism, stage
fusion equivalence, export integrity."""

import pyarrow.dataset as pads
import pytest

from docling_serve_ray.options import JobOptions
from docling_serve_ray.pipelines.convert import build_convert_pipeline, read_input


def _expected_map(corpus_dir):
    t = pads.dataset(corpus_dir).to_table(columns=["doc_id", "expected_spans"])
    return {r["doc_id"]: r["expected_spans"] for r in t.to_pylist()}


def _spans_of(rows):
    return {r["doc_id"]: [dict(s) for s in r["spans"]] for r in rows}


ALL_FORMATS = JobOptions(to_formats=("md", "text", "doctags"))


@pytest.fixture(scope="module")
def converted(ray_session, small_corpus):
    ds = build_convert_pipeline(read_input(small_corpus), options=ALL_FORMATS)
    return ds.take_all()


class TestPipelineEquality:
    def test_all_success(self, converted):
        assert all(r["status"] == "success" for r in converted)

    def test_span_equality_vs_ground_truth(self, converted, small_corpus):
        expected = _expected_map(small_corpus)
        got = _spans_of(converted)
        assert set(got) == set(expected)
        bad = [d for d in got if got[d] != expected[d]]
        assert bad == []

    def test_offsets_dense(self, converted):
        for r in converted:
            offs = [s["offset"] for s in r["spans"]]
            assert offs == list(range(len(offs)))

    def test_exports_populated(self, converted):
        assert all(r["doctags_content"].startswith("<doctag>") for r in converted)
        assert any("# " in r["md_content"] for r in converted)

    def test_no_boilerplate_in_output(self, converted):
        kinds = {s["kind"] for r in converted for s in r["spans"]}
        assert not any(k.startswith("boilerplate") for k in kinds)


class TestParallelismDeterminism:
    def test_concurrency_levels_identical(self, ray_session, small_corpus):
        outs = []
        for conc in (1, 4):
            ds = build_convert_pipeline(read_input(small_corpus), concurrency=conc)
            outs.append(_spans_of(ds.take_all()))
        assert outs[0] == outs[1]

    def test_fused_equals_unfused(self, ray_session, small_corpus):
        fused = build_convert_pipeline(read_input(small_corpus), fuse_analyze=True)
        unfused = build_convert_pipeline(read_input(small_corpus), fuse_analyze=False)
        a = {r["doc_id"]: (r["ocr_mode"], [dict(s) for s in r["spans"]]) for r in fused.take_all()}
        b = {r["doc_id"]: (r["ocr_mode"], [dict(s) for s in r["spans"]]) for r in unfused.take_all()}
        assert a == b


class TestOptionsPlumbing:
    def test_options_hash_sensitivity(self):
        # reference tests/test_options_serialization.py:12-55 analog
        a, b = JobOptions(), JobOptions(force_ocr=True)
        assert a.options_hash() != b.options_hash()
        assert JobOptions().options_hash() == a.options_hash()

    def test_to_formats_prunes_exports(self, ray_session, small_corpus):
        opts = JobOptions(to_formats=("doctags",))
        ds = build_convert_pipeline(read_input(small_corpus), options=opts)
        rows = ds.limit(10).take_all()
        assert all(r["md_content"] == "" and r["text_content"] == "" for r in rows)
        assert all(r["doctags_content"] for r in rows)
