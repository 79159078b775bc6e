"""URL-manifest document source (S1 in SURVEY.md §2.1).

The reference accepts ``HttpSource`` rows — a URL plus per-source headers —
and fetches them inside the conversion call (reference
datamodel/requests.py:16-30, docling_conversion.py:248-254). As a batch
engine, the equivalent is a *manifest table* ``(doc_id, url, headers_json,
format, lang)`` and a stateless fetch stage that downloads each source and
emits the standard input schema ``(doc_id, format, payload, lang)``.

The sandbox has no network, so the fetcher is injectable: production would
pass an HTTP client; tests pass ``LocalDirFetcher`` (url = file path) or a
dict-backed fake. Fetch failures follow the engine's continue-on-error
rule: the row survives with ``fetch_status='failure'`` and an empty
payload, so one dead URL cannot kill a 10^12-row crawl manifest.
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data


class LocalDirFetcher:
    """url = local file path (the no-network stand-in for an HTTP client).
    A real fetcher implements the same callable: (url, headers) -> bytes."""

    def __call__(self, url: str, headers: dict) -> bytes:
        with open(url, "rb") as fh:
            return fh.read()


class DictFetcher:
    def __init__(self, blobs: dict):
        self.blobs = blobs

    def __call__(self, url: str, headers: dict) -> bytes:
        return self.blobs[url]


class FetchStage:
    """map_batches callable: manifest rows → input rows. Stateless per row;
    the fetcher client is actor state when used with concurrency= (e.g. a
    connection pool), task-closure state otherwise."""

    def __init__(self, fetcher):
        self.fetcher = fetcher

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads, statuses = [], []
        headers_col = (
            batch["headers_json"].to_pylist()
            if "headers_json" in batch.column_names
            else [None] * batch.num_rows
        )
        for url, hdrs in zip(batch["url"].to_pylist(), headers_col):
            try:
                headers = json.loads(hdrs) if hdrs else {}
                payloads.append(self.fetcher(url, headers))
                statuses.append("success")
            except Exception as exc:
                payloads.append(b"")
                statuses.append(f"failure: {type(exc).__name__}")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "format": batch["format"],
                "payload": pa.array(payloads, pa.large_binary()),
                "lang": (
                    batch["lang"]
                    if "lang" in batch.column_names
                    else pa.array([""] * batch.num_rows, pa.string())
                ),
                "fetch_status": pa.array(statuses, pa.string()),
            }
        )


def fetch_manifest(
    manifest: ray.data.Dataset,
    fetcher,
    *,
    concurrency=None,
    drop_failures: bool = True,
) -> ray.data.Dataset:
    """Manifest table → input table, ready for build_convert_pipeline.

    drop_failures=True (default) removes rows whose fetch failed — an empty
    payload would otherwise convert as a vacuous 0-span success. Pass False
    to keep them (fetch_status column) for dead-link accounting."""
    import pyarrow.compute as pc

    kwargs = {"batch_format": "pyarrow", "batch_size": 64}
    if concurrency is not None:
        ds = manifest.map_batches(
            FetchStage, fn_constructor_args=(fetcher,), concurrency=concurrency, **kwargs
        )
    else:
        ds = manifest.map_batches(FetchStage(fetcher), **kwargs)
    if drop_failures:
        ds = ds.map_batches(
            lambda t: t.filter(pc.equal(t["fetch_status"], "success")),
            batch_format="pyarrow",
        )
    return ds


def decode_base64_payloads(
    ds: ray.data.Dataset, *, column: str = "payload_b64", out_column: str = "payload"
) -> ray.data.Dataset:
    """File/base64 ingest (S2; reference datamodel/requests.py:46-48 —
    ``FileSource.base64_string`` is decoded to raw bytes before
    conversion): a base64-string column becomes the binary payload
    column. Stateless vectorized map_batches; invalid base64 follows the
    continue-on-error rule (empty payload + ``decode_status='failure'``
    so one bad row cannot kill an ingest job)."""
    import base64
    import binascii

    def decode(batch: pa.Table) -> pa.Table:
        payloads, status = [], []
        for s in batch[column].to_pylist():
            try:
                payloads.append(base64.b64decode(s, validate=True))
                status.append("success")
            except (binascii.Error, TypeError, ValueError):
                payloads.append(b"")
                status.append("failure")
        cols = {n: batch[n] for n in batch.column_names if n != column}
        cols[out_column] = pa.array(payloads, pa.large_binary())
        cols["decode_status"] = pa.array(status, pa.string())
        return pa.table(cols)

    return ds.map_batches(decode, batch_format="pyarrow")
