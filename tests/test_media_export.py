"""ImageRefMode export modes (reference convert.py:139-151) and the
per-document processing_time column (reference ConversionResult.timings)."""

import base64

import pyarrow as pa
import ray.data

from docling_serve_ray.corpus import generate_doc
from docling_serve_ray.kernels.document import convert_document
from docling_serve_ray.kernels.glyphs import build_reverse_codebook
from docling_serve_ray.kernels.serialize import IMAGE_PLACEHOLDER, spans_to_markdown
from docling_serve_ray.options import JobOptions
from docling_serve_ray.schema import MEDIA_SCHEMA

REV = build_reverse_codebook()

SPANS = [
    {"kind": "title", "text": "T", "media_ref": "", "offset": 0},
    {"kind": "picture", "text": "alt text", "media_ref": "media-x-0", "offset": 1},
    {"kind": "paragraph", "text": "body", "media_ref": "", "offset": 2},
]


class TestImageModes:
    def test_referenced_default(self):
        md = spans_to_markdown(SPANS)
        assert "![alt text](media-x-0)" in md

    def test_placeholder(self):
        md = spans_to_markdown(SPANS, image_mode="placeholder")
        assert IMAGE_PLACEHOLDER in md
        assert "media-x-0" not in md

    def test_option_plumbs_through_convert(self):
        d = None
        for i in range(3000):
            c = generate_doc(i)
            if c["format"] == "docx" and any(
                s["kind"] == "picture" for s in c["expected_spans"]
            ):
                d = c
                break
        assert d is not None
        opts = JobOptions(image_export_mode="placeholder")
        r = convert_document(d["doc_id"], d["format"], d["payload"], d["lang"], opts, REV)
        assert IMAGE_PLACEHOLDER in r["md_content"]
        assert "](media-" not in r["md_content"]


class TestEmbeddedMode:
    def test_embed_media_exports_data_uris(self, ray_session):
        from docling_serve_ray.pipelines.media import embed_media_exports
        from docling_serve_ray.stages.convert import rows_to_output_table

        docs, media_rows = [], []
        for i in range(3000):
            d = generate_doc(i)
            if d["format"] == "docx" and d["media"]:
                docs.append(d)
                media_rows.extend(d["media"])
            elif d["format"] == "md":
                docs.append(d)  # a no-media doc must pass through untouched
            if len(docs) >= 6 and media_rows:
                break

        opts = JobOptions(to_formats=("md", "html"), image_export_mode="embedded")
        rows = [
            convert_document(d["doc_id"], d["format"], d["payload"], d["lang"], opts, REV)
            for d in docs
        ]
        out_ds = ray.data.from_arrow(rows_to_output_table(rows))
        media_ds = ray.data.from_arrow(
            pa.Table.from_pylist(media_rows, schema=MEDIA_SCHEMA)
        )
        res = {r["doc_id"]: r for r in embed_media_exports(out_ds, media_ds).take_all()}
        assert set(res) == {d["doc_id"] for d in docs}

        with_pics = [d for d in docs if d["media"]]
        assert with_pics
        for d in with_pics:
            md = res[d["doc_id"]]["md_content"]
            pic_refs = {
                s["media_ref"]
                for s in d["expected_spans"]
                if s["kind"] == "picture" and s["media_ref"]
            }
            for m in d["media"]:
                if m["media_ref"] not in pic_refs:
                    continue  # table media are not linked from markdown
                uri = f"data:{m['mime']};base64,{base64.b64encode(m['bytes']).decode()}"
                assert f"]({uri})" in md
            assert "](media-" not in md
        # no-media docs unchanged
        for d in docs:
            if not d["media"]:
                assert "data:" not in res[d["doc_id"]]["md_content"]


class TestProcessingTime:
    def test_column_present_and_positive(self):
        d = generate_doc(1)
        r = convert_document(
            d["doc_id"], d["format"], d["payload"], d["lang"], JobOptions(), REV
        )
        assert r["processing_time"] > 0
        from docling_serve_ray.schema import OUTPUT_SCHEMA

        assert "processing_time" in OUTPUT_SCHEMA.names


class TestPictureDescription:
    """A6 remote-API description stage: injectable client, batched actor
    pool, passthrough-on-failure."""

    def _media_ds(self):
        media = []
        for i in range(3000):
            d = generate_doc(i)
            media.extend(d["media"])
            if len(media) >= 20:
                break
        return ray.data.from_arrow(pa.Table.from_pylist(media, schema=MEDIA_SCHEMA))

    def test_deterministic_default_client(self, ray_session):
        from docling_serve_ray.pipelines.media import describe_pictures

        rows = describe_pictures(self._media_ds()).take_all()
        assert rows and all(r["description"].startswith("picture[") for r in rows)
        # deterministic: same input → same description
        again = describe_pictures(self._media_ds()).take_all()
        assert {r["media_ref"]: r["description"] for r in rows} == {
            r["media_ref"]: r["description"] for r in again
        }

    def test_client_failure_passthrough(self, ray_session):
        from docling_serve_ray.pipelines.media import describe_pictures

        class Flaky:
            def describe(self, data, mime):
                if len(data) % 2 == 0:
                    raise RuntimeError("remote API down")
                return "ok"

        rows = describe_pictures(self._media_ds(), client_factory=Flaky).take_all()
        # even-length payloads fail → empty description, row preserved
        assert all(r["description"] in ("", "ok") for r in rows)
        assert any(r["description"] == "" for r in rows)
