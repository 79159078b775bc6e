"""Distributed corpus generation: write the synthetic T1/T2/T4 tables.

Generation is per-document deterministic (corpus.generate_doc), so it runs
as a Ray pipeline over a range dataset — each block of indices generates its
documents independently; no shared state, no shuffle.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data

from ..corpus import DEFAULT_SEED, generate_doc
from ..schema import INPUT_SCHEMA, MEDIA_SCHEMA, SPANS_TYPE


def _gen_batch(batch: pa.Table, seed: int) -> pa.Table:
    docs = [generate_doc(int(i), seed) for i in batch["id"].to_pylist()]
    cols = {
        "doc_id": pa.array([d["doc_id"] for d in docs], pa.string()),
        "spans": pa.array([d["spans"] for d in docs], SPANS_TYPE),
        "format": pa.array([d["format"] for d in docs], pa.string()),
        "payload": pa.array([d["payload"] for d in docs], pa.large_binary()),
        "lang": pa.array([d["lang"] for d in docs], pa.string()),
        "quality": pa.array([d["quality"] for d in docs], pa.string()),
        "byte_size": pa.array([d["byte_size"] for d in docs], pa.int64()),
        "expected_spans": pa.array([d["expected_spans"] for d in docs], SPANS_TYPE),
    }
    return pa.Table.from_pydict(cols)


def generate_corpus(
    out_dir: str,
    n_docs: int,
    seed: int = DEFAULT_SEED,
    *,
    with_media: bool = False,
    num_files: int | None = None,
) -> dict:
    """Write input.parquet/ (T1 + expected_spans column for tests) and
    optionally media/ (T4) under out_dir. Returns paths."""
    os.makedirs(out_dir, exist_ok=True)
    input_dir = os.path.join(out_dir, "input")
    num_files = num_files or max(1, n_docs // 2500)
    rows_per_file = -(-n_docs // num_files)
    ds = ray.data.range(n_docs, override_num_blocks=num_files)
    gen = ds.map_batches(
        _gen_batch, batch_format="pyarrow", batch_size=256, fn_args=(seed,)
    )
    # pin file granularity so checkpoint partitioning has real units to bin
    gen.write_parquet(
        input_dir, min_rows_per_file=rows_per_file, max_rows_per_file=rows_per_file
    )

    paths = {"input": input_dir}
    if with_media:
        media_dir = os.path.join(out_dir, "media")

        def _media_batch(batch: pa.Table) -> pa.Table:
            rows = []
            for i in batch["id"].to_pylist():
                rows.extend(generate_doc(int(i), seed)["media"])
            if not rows:
                return MEDIA_SCHEMA.empty_table()
            return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)

        ray.data.range(n_docs).map_batches(
            _media_batch, batch_format="pyarrow", batch_size=256
        ).write_parquet(media_dir)
        paths["media"] = media_dir
    return paths
