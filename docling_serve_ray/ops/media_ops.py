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


# ---------------------------------------------------------------------------
# media_dedup: exact content-hash dedup over the binary media column
# ---------------------------------------------------------------------------

# Copy-augmentation shared with the SQL twin (the dedup-suite convention:
# the synthetic table has no duplicate payloads, so both engines construct
# the same duplicates — every doc_id % 9 == 0 gets a second media row with
# identical bytes under media_ref 'm-<doc_id>-c').
MEDIA_DEDUP_SQL = """
WITH m AS (
  SELECT 'm-' || doc_id AS media_ref, text FROM documents
  UNION ALL
  SELECT 'm-' || doc_id || '-c' AS media_ref, text
  FROM documents WHERE doc_id % 9 = 0
),
g AS (SELECT media_ref, md5(text) AS fp FROM m)
SELECT media_ref,
       CAST(CASE WHEN media_ref = MIN(media_ref) OVER (PARTITION BY fp)
            THEN 1 ELSE 0 END AS BIGINT) AS is_keeper
FROM g
"""


def media_dedup(sf_dir: str) -> ray.data.Dataset:
    """Exact duplicate detection over BINARY media payloads — the
    image-dedup step every multimodal training pipeline runs before
    decode (hashing bytes is ~100× cheaper than decoding them). Same
    min-keeper rule as exact_dedup, applied to the sidecar: per-batch
    content md5 (the only payload-touching step — after it only
    (fp, media_ref) string rows move), one bucketed reduce keyed on the
    fingerprint assigns keepers. Payload bytes never cross the shuffle."""
    import hashlib

    import pandas as pd

    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        refs = [f"m-{d}" for d in ids]
        payloads = [t.encode("utf-8") for t in texts]
        for d, t in zip(ids, texts):
            if d % 9 == 0:
                refs.append(f"m-{d}-c")
                payloads.append(t.encode("utf-8"))
        return pa.table(
            {
                "media_ref": pa.array(refs, pa.string()),
                "fp": pa.array(
                    [hashlib.md5(p).hexdigest() for p in payloads], pa.string()
                ),
            }
        )

    def keepers(g: "pd.DataFrame") -> "pd.DataFrame":
        keep = g.groupby("fp")["media_ref"].transform("min") == g["media_ref"]
        return pd.DataFrame(
            {
                "media_ref": g["media_ref"],
                "is_keeper": keep.astype("int64"),
            }
        )

    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/documents.parquet"))
    return bucketed_group_agg(
        docs.map_batches(rows, batch_format="pyarrow"),
        ["fp"], keepers, num_buckets=nb,
    )
