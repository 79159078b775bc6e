"""Multimodal sidecar pipeline: decode/thumbnail/embed plumbing + the
span↔media hash join."""

import numpy as np
import pytest
import ray.data

from docling_serve_ray.corpus import generate_doc
from docling_serve_ray.pipelines.media import (
    attach_media_meta,
    media_embeddings,
    media_meta_pipeline,
)
from docling_serve_ray.schema import MEDIA_SCHEMA
from docling_serve_ray.stages.media import resize_dims


class TestResizeDims:
    def test_no_upscale(self):
        assert resize_dims(100, 50, 2048) == (100, 50)

    def test_aspect_preserved(self):
        w, h = resize_dims(4096, 2048, 2048)
        assert (w, h) == (2048, 1024)

    def test_min_one_pixel(self):
        assert resize_dims(10000, 1, 256) == (256, 1)
        assert resize_dims(1, 10000, 4)[0] == 1


@pytest.fixture(scope="module")
def media_ds(ray_session):
    import pyarrow as pa

    rows = []
    for i in range(120):
        rows.extend(generate_doc(i)["media"])
    assert rows, "corpus generated no media spans"
    return ray.data.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))


class TestMediaPipeline:
    def test_meta_schema_and_determinism(self, media_ds):
        meta = media_meta_pipeline(media_ds, max_dim=256).take_all()
        assert all(r["width"] >= 64 and r["height"] >= 64 for r in meta)
        assert all(max(r["thumb_w"], r["thumb_h"]) <= 256 for r in meta)
        assert all(r["thumb_bytes"] for r in meta)
        again = media_meta_pipeline(media_ds, max_dim=256).take_all()
        key = lambda rs: sorted((r["media_ref"], r["width"], r["thumb_w"]) for r in rs)
        assert key(meta) == key(again)

    def test_embeddings_unit_norm(self, media_ds):
        embs = media_embeddings(media_ds).take_all()
        for r in embs[:10]:
            v = np.array(r["embedding"], dtype=np.float64)
            assert len(v) == 64
            assert abs(np.linalg.norm(v) - 1.0) < 1e-5

    def test_attach_media_meta_join(self, ray_session, media_ds):
        import pyarrow as pa

        # exploded span rows for the same docs
        span_rows = []
        for i in range(120):
            d = generate_doc(i)
            for s in d["expected_spans"]:
                span_rows.append(
                    {"doc_id": d["doc_id"], "kind": s["kind"], "media_ref": s["media_ref"]}
                )
        spans = ray.data.from_arrow(pa.Table.from_pylist(span_rows))
        meta = media_meta_pipeline(media_ds, max_dim=256).drop_columns(["doc_id"])
        joined = attach_media_meta(spans, meta, num_partitions=4).take_all()
        n_media_spans = sum(1 for r in span_rows if r["media_ref"])
        assert len(joined) == n_media_spans
        assert all(r["width"] >= 64 for r in joined)
