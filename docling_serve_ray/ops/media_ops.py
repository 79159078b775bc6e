"""Driver-contract queries for the multimodal pipeline: build a
deterministic media table from the flat documents table (bytes = UTF-8 of
the text — the no-image-libs stand-in payload) and run the real decode →
thumbnail plumbing over it.

The stub decoder's dimension rule is pure arithmetic on byte length, so the
whole pipeline has an exact SQL twin (MEDIA_META_SQL) — the plumbing
(actor pool, binary columns, batch sizing) is exercised for real while the
"model" stays deterministic.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..pipelines.media import media_meta_pipeline

THUMB_CAP = 256

MEDIA_META_SQL = """
WITH m AS (
  SELECT 'm-' || doc_id AS media_ref,
         strlen(text) AS L  -- byte length (DuckDB)
  FROM documents
),
d AS (
  SELECT media_ref,
         CAST(64 + L % 997 AS INTEGER) AS width,
         CAST(64 + (L * 31) % 997 AS INTEGER) AS height,
         CAST(L AS BIGINT) AS n_bytes
  FROM m
)
SELECT media_ref, width, height, n_bytes,
       CAST(greatest(1, floor(width  * least(1.0, 256.0 / greatest(width, height)))) AS INTEGER) AS thumb_w,
       CAST(greatest(1, floor(height * least(1.0, 256.0 / greatest(width, height)))) AS INTEGER) AS thumb_h
FROM d
"""


def _fake_media(batch: pa.Table) -> pa.Table:
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    return pa.table(
        {
            "media_ref": pa.array([f"m-{d}" for d in doc_ids], pa.string()),
            "doc_id": pa.array([str(d) for d in doc_ids], pa.string()),
            "bytes": pa.array([t.encode("utf-8") for t in texts], pa.large_binary()),
            "mime": pa.array(["image/png"] * len(doc_ids), pa.string()),
        }
    )


def media_meta(sf_dir: str) -> ray.data.Dataset:
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    media = docs.map_batches(_fake_media, batch_format="pyarrow")
    meta = media_meta_pipeline(media, max_dim=THUMB_CAP)
    return meta.select_columns(
        ["media_ref", "width", "height", "n_bytes", "thumb_w", "thumb_h"]
    )
