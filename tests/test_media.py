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


class TestFrameSampling:
    def test_frames_per_video_and_passthrough(self, ray_session):
        import pyarrow as pa
        import ray.data

        from docling_serve_ray.pipelines.media import sample_video_frames
        from docling_serve_ray.schema import MEDIA_SCHEMA

        rows = [
            {"media_ref": "m-v0", "doc_id": "d0", "bytes": b"v" * 5000, "mime": "video/mp4"},
            {"media_ref": "m-i0", "doc_id": "d0", "bytes": b"i" * 100, "mime": "image/png"},
            {"media_ref": "m-v1", "doc_id": "d1", "bytes": b"w" * 9000, "mime": "video/webm"},
        ]
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))
        out = sample_video_frames(ds, n_frames=4).take_all()
        by_ref = {}
        for r in out:
            by_ref.setdefault(r["media_ref"], []).append(r)
        # images are passed over, each video yields exactly n_frames rows
        assert set(by_ref) == {"m-v0", "m-v1"}
        for ref, frames in by_ref.items():
            assert sorted(f["frame_idx"] for f in frames) == [0, 1, 2, 3]
            ts = [f["ts_ms"] for f in sorted(frames, key=lambda f: f["frame_idx"])]
            assert ts == sorted(ts) and len(set(ts)) == 4  # evenly spaced, increasing
            assert all(f["frame_bytes"] for f in frames)
        # deterministic
        again = sample_video_frames(ds, n_frames=4).take_all()
        key = lambda r: (r["media_ref"], r["frame_idx"])
        assert sorted(((r["media_ref"], r["frame_idx"], r["frame_bytes"]) for r in out)) == \
               sorted(((r["media_ref"], r["frame_idx"], r["frame_bytes"]) for r in again))
