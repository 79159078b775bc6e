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

import numpy as np
import pandas as pd
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


# ---------------------------------------------------------------------------
# video_frame_sample: the frame-sampling stage as a driver-contract query
# ---------------------------------------------------------------------------

# Every doc_id % 3 == 0 document becomes a synthetic "video" (bytes = UTF-8
# text, mime video/mp4 — the no-ffmpeg stand-in payload, same convention as
# _fake_media). The stub decoder's duration rule and the evenly-spaced
# timestamp arithmetic are exact integer math, so the sampling schedule has
# a SQL twin; frame BYTES are exercised on the Ray side (sha1-derived) but
# the oracle checks their deterministic length (20-byte digest + ≤32-byte
# prefix) — hashing the frames themselves needs sha1-over-binary, which
# DuckDB lacks.
FRAME_SAMPLE_SQL = """
WITH m AS (
  SELECT 'v-' || doc_id AS media_ref, strlen(text) AS L
  FROM documents WHERE doc_id % 3 = 0
),
f AS (
  SELECT media_ref,
         CAST(k.k AS BIGINT) AS frame_idx,
         CAST(((1000 + (L % 9973) * 10) * (2 * k.k + 1)) // 16 AS BIGINT) AS ts_ms,
         CAST(20 + least(32, L) AS BIGINT) AS frame_bytes_len
  FROM m, (SELECT UNNEST(generate_series(0, 7)) AS k) k
)
SELECT media_ref, frame_idx, ts_ms, frame_bytes_len FROM f
"""


def video_frame_sample(sf_dir: str) -> ray.data.Dataset:
    """Frame sampling as a first-class query: synthetic video rows (every
    third document) through the REAL actor-pool stage
    (stages/media.FrameSampleActor — decoder pinned in actor state, small
    batches for the large binary rows) → 8 evenly-spaced frames each,
    verified against the integer sampling-schedule oracle. The frame
    payloads are produced and measured (length column) — the plumbing a
    real ffmpeg decoder would drop into unchanged."""
    from ..pipelines.media import sample_video_frames

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def fake_video(batch: pa.Table) -> pa.Table:
        ids = [d for d in batch["doc_id"].to_pylist() if d % 3 == 0]
        texts = [
            t for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist())
            if d % 3 == 0
        ]
        return pa.table(
            {
                "media_ref": pa.array([f"v-{d}" for d in ids], pa.string()),
                "doc_id": pa.array([str(d) for d in ids], pa.string()),
                "bytes": pa.array([t.encode("utf-8") for t in texts], pa.large_binary()),
                "mime": pa.array(["video/mp4"] * len(ids), pa.string()),
            }
        )

    frames = sample_video_frames(docs.map_batches(fake_video, batch_format="pyarrow"))

    def finalize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "media_ref": batch["media_ref"],
                "frame_idx": pc.cast(batch["frame_idx"], pa.int64()),
                "ts_ms": pc.cast(batch["ts_ms"], pa.int64()),
                "frame_bytes_len": pc.cast(
                    pc.binary_length(batch["frame_bytes"]), pa.int64()
                ),
            }
        )

    return frames.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# audio_chunk_plan: fixed-window chunking plan for audio/video assets — the
# placement step an ASR / caption pipeline runs before decoding: every
# asset becomes ceil((dur-W)/S)+1 windows of width W at stride S (overlap
# W-S), each a decode-actor work unit. The duration is derived
# deterministically from the payload byte length (no codecs in this
# container — the plan arithmetic and plumbing are the real part, the
# probe is the stub, same boundary as media_meta's dimensions).
# ---------------------------------------------------------------------------

CHUNK_W_MS = 30_000
CHUNK_S_MS = 25_000

AUDIO_CHUNK_PLAN_SQL = f"""
WITH m AS (
  SELECT 'm-' || doc_id AS media_ref,
         CAST((strlen(text) * 7) % 120000 + 1000 AS BIGINT) AS dur
  FROM documents
),
g AS (
  SELECT media_ref, dur,
         UNNEST(generate_series(0, dur - 1, {CHUNK_S_MS})) AS start_ms
  FROM m
)
SELECT media_ref,
       CAST(start_ms // {CHUNK_S_MS} AS BIGINT) AS chunk_idx,
       CAST(start_ms AS BIGINT) AS start_ms,
       CAST(LEAST(start_ms + {CHUNK_W_MS}, dur) AS BIGINT) AS end_ms
FROM g
"""


def audio_chunk_plan(sf_dir: str) -> ray.data.Dataset:
    """(media_ref, chunk_idx, start_ms, end_ms) decode windows.

    Scale shape: stateless per-batch arithmetic expansion (repeat +
    offset arange — no Python loop); output rows ∝ total media DURATION,
    not asset count, so the plan streams straight into the decode actor
    pool with chunk-sized work units regardless of how skewed individual
    asset lengths are — the skew defusal IS the op."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def plan(b: pa.Table) -> pd.DataFrame:
        ids = b["doc_id"].to_pylist()
        L = np.array(
            [len(t.encode("utf-8")) for t in b["text"].to_pylist()], dtype="int64"
        )
        dur = (L * 7) % 120_000 + 1000
        n = (dur + CHUNK_S_MS - 1) // CHUNK_S_MS  # = |starts in [0, dur)|
        total = int(n.sum())
        ref = np.repeat(np.array([f"m-{d}" for d in ids], dtype=object), n)
        starts_base = np.repeat(np.concatenate([[0], np.cumsum(n)[:-1]]), n)
        idx = np.arange(total) - starts_base
        start = idx * CHUNK_S_MS
        end = np.minimum(start + CHUNK_W_MS, np.repeat(dur, n))
        return pd.DataFrame(
            {
                "media_ref": ref,
                "chunk_idx": idx.astype("int64"),
                "start_ms": start.astype("int64"),
                "end_ms": end.astype("int64"),
            }
        )

    return docs.map_batches(plan, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# aspect_bucket_plan: NaViT/SDXL-style aspect-ratio bucket assignment — every
# multi-resolution image-training pipeline groups images into a fixed set of
# aspect buckets so a batch shares one tensor shape; the assignment must be
# deterministic and skew-visible (one bucket hoarding the corpus means padding
# waste). Dims come from the same deterministic stub rule as media_meta (no
# image libs in this container — the probe boundary is identical).
# ---------------------------------------------------------------------------

ASPECT_BUCKETS = (
    (1024, 1024), (1152, 896), (896, 1152), (1216, 832), (832, 1216),
    (1344, 768), (768, 1344), (1536, 640), (640, 1536),
)

ASPECT_BUCKET_PLAN_SQL = f"""
WITH m AS (
  SELECT doc_id, strlen(text) AS L FROM documents
),
d AS (
  SELECT doc_id,
         CAST(64 + L % 997 AS BIGINT) AS w,
         CAST(64 + (L * 31) % 997 AS BIGINT) AS h
  FROM m
),
b(idx, bw, bh) AS (VALUES {", ".join(f"({i},{w},{h})" for i, (w, h) in enumerate(ASPECT_BUCKETS))}),
a AS (
  SELECT d.w, d.h, b.bw, b.bh,
         row_number() OVER (
           PARTITION BY d.doc_id ORDER BY abs(d.w * b.bh - d.h * b.bw), b.idx
         ) AS rn
  FROM d CROSS JOIN b
)
SELECT CAST(bw AS BIGINT) AS bucket_w, CAST(bh AS BIGINT) AS bucket_h,
       CAST(count(*) AS BIGINT) AS n_images,
       CAST(sum(w * h) AS BIGINT) AS sum_src_pixels
FROM a WHERE rn = 1 GROUP BY bw, bh
"""


def aspect_bucket_plan(sf_dir: str) -> ray.data.Dataset:
    """Per-aspect-bucket image counts + source-pixel mass. Assignment
    minimizes the exact integer cross-product |w·bh − h·bw| (equivalent
    to nearest aspect ratio, with no float-division boundary risk); ties
    break to the lower bucket index. Scale shape: a stateless vectorized
    map computes each batch's (len × |buckets|) difference matrix and
    argmin (numpy argmin = first minimum = the tie rule), collapses to a
    ≤|buckets|-cell partial, and ONE merge task finishes — the bucket
    taxonomy is structurally bounded, so no shuffle at all."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )
    bw = np.array([b[0] for b in ASPECT_BUCKETS], dtype="int64")
    bh = np.array([b[1] for b in ASPECT_BUCKETS], dtype="int64")

    def partial(b: pa.Table) -> pd.DataFrame:
        L = np.array(
            [len(t.encode("utf-8")) for t in b["text"].to_pylist()], dtype="int64"
        )
        w = 64 + L % 997
        h = 64 + (L * 31) % 997
        diff = np.abs(w[:, None] * bh[None, :] - h[:, None] * bw[None, :])
        idx = diff.argmin(axis=1)
        n = np.bincount(idx, minlength=len(ASPECT_BUCKETS))
        px = np.zeros(len(ASPECT_BUCKETS), dtype="int64")  # exact int64,
        np.add.at(px, idx, w * h)  # not bincount's float64 weights
        keep = n > 0
        return pd.DataFrame(
            {"idx": np.flatnonzero(keep).astype("int64"),
             "n": n[keep].astype("int64"), "px": px[keep]}
        )

    merged = docs.map_batches(partial, batch_format="pyarrow")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("idx", as_index=False).agg(
            n_images=("n", "sum"), sum_src_pixels=("px", "sum")
        )
        i = s["idx"].to_numpy()
        return pd.DataFrame(
            {"bucket_w": bw[i], "bucket_h": bh[i],
             "n_images": s["n_images"].astype("int64"),
             "sum_src_pixels": s["sum_src_pixels"].astype("int64")}
        )

    return merged.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None
    )
