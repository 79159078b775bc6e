"""Media sidecar pipelines: decode/thumbnail/embed over the media table and
the span↔media join.

Media bytes stay OUT of the document conversion hot path (sidecar table
keyed by media_ref — SURVEY.md §1.3/§4 "wide rows"); these pipelines
process them separately with small batches (large binary rows) and join
results back to spans by key when needed.
"""

from __future__ import annotations

import ray.data

from ..stages.media import (
    MediaDecodeActor,
    MediaEmbedActor,
    PictureDescriptionActor,
    ThumbnailActor,
)
from .convert import safe_concurrency, tune_data_context

MEDIA_BATCH = 16  # large binary rows → small batches (memory-aware)


def _stage_resources(num_gpus: float, concurrency) -> dict:
    """Per-stage resource knobs for model-backed media actors (TODO: real
    VLM deployment runs these stages on GPU workers — reference A5/A6
    picture description). num_gpus > 0 reserves GPU slices per actor;
    concurrency pins the pool size (default: cluster-derived)."""
    kw = {"concurrency": safe_concurrency(concurrency)}
    if num_gpus > 0:
        kw["num_gpus"] = num_gpus
        kw["num_cpus"] = 0  # GPU-bound stage: don't double-reserve CPUs
    else:
        kw["num_cpus"] = 1
    return kw


def media_meta_pipeline(
    media_ds: ray.data.Dataset,
    *,
    max_dim: int = 2048,
    with_thumbs: bool = True,
    num_gpus: float = 0,
    concurrency=None,
) -> ray.data.Dataset:
    """bytes → (width, height, channels, n_bytes[, thumb_*])."""
    tune_data_context()
    res = _stage_resources(num_gpus, concurrency)
    decoded = media_ds.map_batches(
        MediaDecodeActor,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH,
        **res,
    )
    if not with_thumbs:
        return decoded
    # thumbnails need the original bytes: re-attach via zip of the same read
    # is wasteful — instead run decode+thumbnail fused on the raw table
    return media_ds.map_batches(
        _DecodeThenThumb(max_dim),
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH,
        **res,
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


def media_embeddings(
    media_ds: ray.data.Dataset, *, num_gpus: float = 0, concurrency=None
) -> ray.data.Dataset:
    tune_data_context()
    return media_ds.map_batches(
        MediaEmbedActor,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH,
        **_stage_resources(num_gpus, concurrency),
    )


def describe_pictures(
    media_ds: ray.data.Dataset,
    *,
    client_factory=None,
    num_gpus: float = 0,
    concurrency=None,
) -> ray.data.Dataset:
    """A6 remote-API picture description over the media sidecar →
    (media_ref, doc_id, description). Inject a real HTTP client via
    client_factory; num_gpus/concurrency size the pool for a GPU-backed
    local VLM serving the same protocol."""
    tune_data_context()
    kwargs = {}
    if client_factory is not None:
        kwargs["fn_constructor_args"] = (client_factory,)
    return media_ds.map_batches(
        PictureDescriptionActor,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH,
        **_stage_resources(num_gpus, concurrency),
        **kwargs,
    )


def embed_media_exports(
    out_ds: ray.data.Dataset,
    media_ds: ray.data.Dataset,
    *,
    columns: tuple = ("md_content", "html_content"),
) -> ray.data.Dataset:
    """ImageRefMode "embedded" (reference convert.py:139-151 +
    response_preparation.py:87): rewrite referenced picture links in the
    export columns to ``data:`` URIs with the actual media bytes.

    Media bytes live in the sidecar table, not in the converted rows, so
    embedding is a join: media rows are first packed one-row-per-document
    (bucketed grouped reduce — the join then moves each document's media
    exactly once, never one joined row per picture duplicating the export
    strings), left-outer-joined onto the output rows by doc_id, and a
    vectorized rewrite substitutes each media_ref."""
    import base64
    import pickle

    import pandas as pd

    from ..ops.shuffle import bucketed_group_agg, join_partitions

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, gd in g.groupby("doc_id", sort=False):
            rows.append(
                {
                    "doc_id": doc_id,
                    "media_blob": pickle.dumps(
                        list(zip(gd["media_ref"], gd["mime"], gd["bytes"]))
                    ),
                }
            )
        return pd.DataFrame(rows, columns=["doc_id", "media_blob"])

    packed = bucketed_group_agg(
        media_ds.select_columns(["doc_id", "media_ref", "mime", "bytes"]),
        ["doc_id"],
        pack,
    )

    # Ray's hash join rejects list-typed non-key fields: every list column
    # (spans, errors, ...) is pickled to a binary column for the join hop
    # and restored after (same bytes move either way)
    import pyarrow as pa

    from ..schema import SPANS_TYPE

    known_types = {"spans": SPANS_TYPE, "errors": pa.list_(pa.string())}
    _PKL = "__pkl__"

    def pack_lists(t: pa.Table) -> pa.Table:
        for name in list(t.column_names):
            if pa.types.is_list(t.schema.field(name).type) or pa.types.is_large_list(
                t.schema.field(name).type
            ):
                blobs = [pickle.dumps(v) for v in t[name].to_pylist()]
                t = t.drop_columns([name]).append_column(
                    _PKL + name, pa.array(blobs, pa.large_binary())
                )
        return t

    P, jkw = join_partitions()
    j = out_ds.map_batches(pack_lists, batch_format="pyarrow").join(
        packed, "left_outer", P, on=("doc_id",), **jkw
    )

    def rewrite(batch: pd.DataFrame) -> pd.DataFrame:
        for i in batch.index:
            blob = batch.at[i, "media_blob"]
            if not isinstance(blob, bytes):
                continue  # no media for this doc (left-outer null)
            for ref, mime, data in pickle.loads(blob):
                uri = f"data:{mime};base64,{base64.b64encode(data).decode()}"
                for col in columns:
                    val = batch.at[i, col] if col in batch.columns else None
                    if val:
                        batch.at[i, col] = val.replace(f"]({ref})", f"]({uri})").replace(
                            f'src="assets/{ref}.png"', f'src="{uri}"'
                        )
        return batch.drop(columns=["media_blob"])

    rewritten = j.map_batches(rewrite, batch_format="pandas")

    def unpack_lists(t: pa.Table) -> pa.Table:
        for name in list(t.column_names):
            if not name.startswith(_PKL):
                continue
            orig = name[len(_PKL):]
            values = [pickle.loads(b) for b in t[name].to_pylist()]
            arr = (
                pa.array(values, known_types[orig])
                if orig in known_types
                else pa.array(values)
            )
            t = t.drop_columns([name]).append_column(orig, arr)
        return t

    return rewritten.map_batches(unpack_lists, batch_format="pyarrow")


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


def sample_video_frames(
    media_ds: ray.data.Dataset,
    *,
    n_frames: int = 8,
    decoder_factory=None,
    num_gpus: float = 0,
    concurrency=None,
) -> ray.data.Dataset:
    """Video → evenly-spaced frame rows (decode/frame-sample stage for
    downstream per-frame embedding or captioning). Actor pool with the
    decoder in actor state; frame explosion is embarrassingly parallel
    and streams — no shuffle at any scale."""
    from ..stages.media import FrameSampleActor, StubVideoDecoder

    tune_data_context()
    return media_ds.map_batches(
        FrameSampleActor,
        fn_constructor_args=(n_frames, decoder_factory or StubVideoDecoder),
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH,
        **_stage_resources(num_gpus, concurrency),
    )
