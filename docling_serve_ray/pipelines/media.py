"""Media sidecar pipelines: decode/thumbnail/embed over the media table and
the span↔media join.

Media bytes stay OUT of the document conversion hot path (sidecar table
keyed by media_ref — SURVEY.md §1.3/§4 "wide rows"); these pipelines
process them separately with small batches (large binary rows) and join
results back to spans by key when needed.
"""

from __future__ import annotations

import ray.data

from ..stages.media import MediaDecodeActor, MediaEmbedActor, ThumbnailActor
from .convert import safe_concurrency, tune_data_context

MEDIA_BATCH = 16  # large binary rows → small batches (memory-aware)


def media_meta_pipeline(
    media_ds: ray.data.Dataset, *, max_dim: int = 2048, with_thumbs: bool = True
) -> ray.data.Dataset:
    """bytes → (width, height, channels, n_bytes[, thumb_*])."""
    tune_data_context()
    conc = safe_concurrency(None)
    decoded = media_ds.map_batches(
        MediaDecodeActor,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH,
        concurrency=conc,
        num_cpus=1,
    )
    if not with_thumbs:
        return decoded
    # thumbnails need the original bytes: re-attach via zip of the same read
    # is wasteful — instead run decode+thumbnail fused on the raw table
    return media_ds.map_batches(
        _DecodeThenThumb(max_dim),
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH,
        concurrency=conc,
        num_cpus=1,
    )


class _DecodeThenThumb:
    """Fused decode→thumbnail (one pass over the heavy bytes column)."""

    def __init__(self, max_dim: int):
        self.decode = MediaDecodeActor()
        self.thumb = ThumbnailActor(max_dim)

    def __call__(self, batch):
        meta = self.decode(batch)
        meta = meta.append_column("bytes", batch["bytes"])
        return self.thumb(meta)


def media_embeddings(media_ds: ray.data.Dataset) -> ray.data.Dataset:
    tune_data_context()
    return media_ds.map_batches(
        MediaEmbedActor,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH,
        concurrency=safe_concurrency(None),
        num_cpus=1,
    )


def attach_media_meta(
    span_rows: ray.data.Dataset, media_meta: ray.data.Dataset, *, num_partitions: int = 32
) -> ray.data.Dataset:
    """Join exploded span rows (with media_ref) to media metadata — a
    big-big hash join on media_ref (both sides scale with the corpus, so no
    broadcast; Ray's hash-partitioned join)."""
    import pyarrow.compute as pc

    from ..ops.shuffle import join_partitions

    refs = span_rows.map_batches(
        lambda t: t.filter(pc.not_equal(t["media_ref"], "")), batch_format="pyarrow"
    )
    P, jkw = join_partitions(cap=num_partitions)
    return refs.join(media_meta, "inner", P, on=("media_ref",), **jkw)
