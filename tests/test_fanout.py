"""Page fan-out/fan-in equality: the two-branch pipeline must produce
byte-identical converted documents to the whole-doc pipeline."""

import pytest

from docling_serve_ray.options import JobOptions
from docling_serve_ray.pipelines.convert import build_convert_pipeline, read_input
from docling_serve_ray.pipelines.fanout import convert_with_page_fanout

OPTS = JobOptions(to_formats=("md", "doctags"))


def _index(rows):
    return {
        r["doc_id"]: (
            [dict(s) for s in r["spans"]],
            r["md_content"],
            r["doctags_content"],
            r["ocr_mode"],
            r["status"],
        )
        for r in rows
    }


@pytest.fixture(scope="module")
def both(ray_session, small_corpus):
    plain = build_convert_pipeline(read_input(small_corpus), options=OPTS).take_all()
    fanout = convert_with_page_fanout(small_corpus, options=OPTS, threshold=3).take_all()
    return _index(plain), _index(fanout)


class TestFanoutEquality:
    def test_same_docs(self, both):
        plain, fanout = both
        assert set(plain) == set(fanout)

    def test_identical_output(self, both):
        plain, fanout = both
        diff = [d for d in plain if plain[d] != fanout[d]]
        assert diff == []

    def test_fanout_actually_triggered(self, ray_session, small_corpus):
        # with threshold 3, the corpus's medium/large PDFs must take the
        # page branch — verify some docs really were exploded
        import json

        import pyarrow.dataset as pads

        t = pads.dataset(small_corpus).to_table(columns=["format", "payload"])
        n_big = sum(
            1
            for f, p in zip(t["format"].to_pylist(), t["payload"].to_pylist())
            if f == "pdf" and len(json.loads(p.decode())["pages"]) > 3
        )
        assert n_big > 0, "corpus has no page-heavy PDFs; test is vacuous"


class TestFanoutWithCheckpoint:
    def test_checkpointed_fanout_run(self, ray_session, small_corpus, tmp_path):
        """run_partitioned composes with the fan-out pipeline; output equals
        the plain pipeline's."""
        import glob
        import os

        import pyarrow.dataset as pads

        from docling_serve_ray.state.checkpoint import run_partitioned

        files = sorted(glob.glob(os.path.join(small_corpus, "*.parquet")))
        out = str(tmp_path / "out")
        r = run_partitioned(
            files,
            out,
            lambda fs: convert_with_page_fanout(fs, options=OPTS, threshold=3),
            num_partitions=2,
        )
        assert r["total_rows"] == 200
        got = pads.dataset(
            glob.glob(os.path.join(out, "part=*", "*.parquet"))
        ).to_table(columns=["doc_id", "spans"]).to_pylist()
        plain = build_convert_pipeline(read_input(small_corpus), options=OPTS).take_all()
        gm = {r["doc_id"]: [dict(s) for s in r["spans"]] for r in got}
        pm = {r["doc_id"]: [dict(s) for s in r["spans"]] for r in plain}
        assert gm == pm


class TestFanoutGuards:
    """Option guards must behave identically on the fan-out path (the
    reference enforces them per document regardless of execution shape)."""

    def _by_id(self, rows):
        return {r["doc_id"]: r for r in rows}

    def test_max_num_pages_failure_row(self, ray_session, small_corpus):
        opts = JobOptions(to_formats=("md",), max_num_pages=3)
        plain = self._by_id(
            build_convert_pipeline(read_input(small_corpus), options=opts).take_all()
        )
        fanout = self._by_id(
            convert_with_page_fanout(small_corpus, options=opts, threshold=3).take_all()
        )
        assert set(plain) == set(fanout)
        over = [d for d in plain if plain[d]["status"] == "failure"]
        assert over, "corpus has no >3-page PDFs; test is vacuous"
        for d in over:
            assert fanout[d]["status"] == "failure"
            assert fanout[d]["spans"] == []

    def test_page_range_zero_pages_success_row(self, ray_session, small_corpus):
        # a page_range beyond every document selects zero pages: the
        # whole-doc path emits a 0-span success row — fan-out must too
        opts = JobOptions(to_formats=("md",), page_range=(10_000, 10_001))
        plain = self._by_id(
            build_convert_pipeline(read_input(small_corpus), options=opts).take_all()
        )
        fanout = self._by_id(
            convert_with_page_fanout(small_corpus, options=opts, threshold=3).take_all()
        )
        assert set(plain) == set(fanout)
        for d, p in plain.items():
            assert fanout[d]["status"] == p["status"]
            assert [dict(s) for s in fanout[d]["spans"]] == [dict(s) for s in p["spans"]]

    def test_from_formats_gate_applies_to_big_docs(self, ray_session, small_corpus):
        opts = JobOptions(to_formats=("md",), from_formats=("html",))
        fanout = convert_with_page_fanout(
            small_corpus, options=opts, threshold=3
        ).take_all()
        by_fmt_status = {(r["format"], r["status"]) for r in fanout}
        assert ("pdf", "failure") in by_fmt_status
        assert all(s == "failure" for f, s in by_fmt_status if f != "html")
        assert ("html", "success") in by_fmt_status

    def test_single_read_in_plan(self, ray_session, small_corpus):
        """The fan-out pipeline must read the input exactly once (the old
        two-branch design read it twice: 2x scan amplification)."""
        ds = convert_with_page_fanout(small_corpus, options=OPTS, threshold=3)
        stats = ds.materialize().stats()
        assert stats.count("ReadParquet") == 1, stats
