"""Multimodal sidecar stages: decode → feature-extract → thumbnail over the
media table (media_ref, doc_id, bytes, mime) — T4 in FIXTURES.md.

Image/audio decode libraries are not in this container, so the DECODERS are
deterministic fakes behind injectable factories (clearly marked; swap in a
PIL/ffmpeg-backed decoder in production — same callable signature). The
Ray-side plumbing is real and tested: actor pools with the decoder pinned
in actor state, small batches for large binary rows (SURVEY.md §4 memory
pressure), Arrow binary columns end-to-end, deterministic output layout.

Reference analogs: the image handling inside the AI-vision path — pdf→image
at dpi 200, LANCZOS downscale to ≤2048 px, JPEG re-encode
(ai_vision_middleware.py:84-153) — and ImageRefMode embedded/referenced
artifacts (convert.py:139-151).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MAX_DIM_DEFAULT = 2048  # reference cap: ai_vision_middleware.py:101-105


class StubImageDecoder:
    """DETERMINISTIC FAKE decoder (no image libs in this sandbox): derives
    plausible dimensions from the byte length. A real decoder returns the
    same dict from actual pixel data."""

    def decode(self, data: bytes, mime: str) -> dict:
        n = len(data)
        return {
            "width": 64 + n % 997,
            "height": 64 + (n * 31) % 997,
            "channels": 3,
            "n_bytes": n,
        }


def resize_dims(width: int, height: int, max_dim: int) -> tuple[int, int]:
    """Aspect-preserving downscale cap (reference LANCZOS ≤2048 rule):
    scale = min(1, max_dim / max(w, h)), floor, at least 1 px."""
    scale = min(1.0, max_dim / max(width, height))
    return max(1, int(width * scale)), max(1, int(height * scale))


class MediaDecodeActor:
    """Actor-pool stage: bytes → metadata columns. Decoder built once per
    actor (the model-load slot)."""

    def __init__(self, decoder_factory=StubImageDecoder):
        self.decoder = decoder_factory()

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = [
            self.decoder.decode(b, m)
            for b, m in zip(batch["bytes"].to_pylist(), batch["mime"].to_pylist())
        ]
        return pa.table(
            {
                "media_ref": batch["media_ref"],
                "doc_id": batch["doc_id"],
                "mime": batch["mime"],
                "width": pa.array([m["width"] for m in metas], pa.int32()),
                "height": pa.array([m["height"] for m in metas], pa.int32()),
                "channels": pa.array([m["channels"] for m in metas], pa.int32()),
                "n_bytes": pa.array([m["n_bytes"] for m in metas], pa.int64()),
            }
        )


class ThumbnailActor:
    """Actor-pool stage: metadata (+bytes) → capped thumbnail dims and a
    deterministic fake thumbnail payload (real impl: LANCZOS resample +
    JPEG encode, ai_vision_middleware.py:132-153)."""

    def __init__(self, max_dim: int = MAX_DIM_DEFAULT):
        self.max_dim = max_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        tw, th, blobs = [], [], []
        for w, h, data in zip(
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
            batch["bytes"].to_pylist() if "bytes" in batch.column_names else [b""] * batch.num_rows,
        ):
            a, b = resize_dims(w, h, self.max_dim)
            tw.append(a)
            th.append(b)
            blobs.append(bytes([a % 256, b % 256]) + (data[:62] if data else b""))
        cols = {name: batch[name] for name in batch.column_names if name != "bytes"}
        cols["thumb_w"] = pa.array(tw, pa.int32())
        cols["thumb_h"] = pa.array(th, pa.int32())
        cols["thumb_bytes"] = pa.array(blobs, pa.large_binary())
        return pa.table(cols)


class DeterministicDescriptionClient:
    """DETERMINISTIC FAKE of a remote vision-description API (A6; the
    reference calls a configured remote VLM endpoint,
    convert.py:358-381). A real client implements describe(bytes, mime)
    -> str over HTTP; the signature is the protocol."""

    def describe(self, data: bytes, mime: str) -> str:
        h = hashlib.sha1(data).hexdigest()[:8]
        return f"picture[{mime};{len(data)}B;{h}]"


class PictureDescriptionActor:
    """Actor-pool stage (A6): media sidecar rows → remote-API picture
    descriptions. Client built once per actor; a per-item client failure
    yields an empty description, never a failing task (the reference's
    enable_remote_services path degrades the same way — description is
    enrichment, not conversion)."""

    def __init__(self, client_factory=DeterministicDescriptionClient):
        self.client = client_factory()

    def __call__(self, batch: pa.Table) -> pa.Table:
        descs = []
        for b, m in zip(batch["bytes"].to_pylist(), batch["mime"].to_pylist()):
            try:
                descs.append(self.client.describe(b, m))
            except Exception:
                descs.append("")  # passthrough-on-failure
        return pa.table(
            {
                "media_ref": batch["media_ref"],
                "doc_id": batch["doc_id"],
                "description": pa.array(descs, pa.string()),
            }
        )


class MediaEmbedActor:
    """Actor-pool stage: bytes → 64-dim unit embedding (deterministic
    byte-chunk hashing — a real impl runs a vision encoder here). Output
    feeds the similarity-search ops (ann_topk / embedding_neardup)."""

    DIM = 64

    def __init__(self):
        self._salt = b"media-embed-v1"

    def _embed(self, data: bytes) -> list[float]:
        h = hashlib.sha256(self._salt + data).digest()
        # expand to DIM floats via counter-mode hashing
        raw = b"".join(
            hashlib.sha256(h + i.to_bytes(2, "big")).digest() for i in range((self.DIM * 4) // 32 + 1)
        )
        v = np.frombuffer(raw[: self.DIM * 4], dtype=np.uint32).astype(np.float64)
        v = (v / 2**32) - 0.5
        n = np.linalg.norm(v)
        return (v / n).astype(np.float32).tolist()

    def __call__(self, batch: pa.Table) -> pa.Table:
        embs = [self._embed(b) for b in batch["bytes"].to_pylist()]
        return pa.table(
            {
                "media_ref": batch["media_ref"],
                "doc_id": batch["doc_id"],
                "embedding": pa.array(embs, pa.list_(pa.float32())),
            }
        )


class StubVideoDecoder:
    """DETERMINISTIC FAKE video decoder (no ffmpeg in this sandbox):
    derives duration/fps from the byte length. A real decoder probes the
    container; the dict contract is the protocol."""

    def probe(self, data: bytes, mime: str) -> dict:
        n = len(data)
        return {"duration_ms": 1000 + (n % 9973) * 10, "fps": 24.0, "n_bytes": n}

    def frame_at(self, data: bytes, ts_ms: int) -> bytes:
        # real impl: seek + decode + JPEG-encode the frame
        h = hashlib.sha1(data[:64] + ts_ms.to_bytes(8, "big")).digest()
        return h + data[:32]


class FrameSampleActor:
    """Actor-pool stage: video rows → N evenly-spaced frame rows
    (media_ref, doc_id, frame_idx, ts_ms, frame_bytes). Decoder pinned in
    actor state; small batches (large binary rows). Non-video mimes pass
    through silently with zero frames — one media table can mix
    image/video rows."""

    def __init__(self, n_frames: int = 8, decoder_factory=StubVideoDecoder):
        self.n_frames = n_frames
        self.decoder = decoder_factory()

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, docs, idxs, tss, frames = [], [], [], [], []
        for ref, doc, data, mime in zip(
            batch["media_ref"].to_pylist(), batch["doc_id"].to_pylist(),
            batch["bytes"].to_pylist(), batch["mime"].to_pylist(),
        ):
            if not mime.startswith("video/"):
                continue
            meta = self.decoder.probe(data, mime)
            # evenly spaced sample timestamps across the duration
            for k in range(self.n_frames):
                ts = (meta["duration_ms"] * (2 * k + 1)) // (2 * self.n_frames)
                refs.append(ref)
                docs.append(doc)
                idxs.append(k)
                tss.append(ts)
                frames.append(self.decoder.frame_at(data, ts))
        return pa.table(
            {
                "media_ref": pa.array(refs, pa.string()),
                "doc_id": pa.array(docs, pa.string()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "ts_ms": pa.array(tss, pa.int64()),
                "frame_bytes": pa.array(frames, pa.large_binary()),
            }
        )
