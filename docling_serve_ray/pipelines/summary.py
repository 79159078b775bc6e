"""Conversion-result aggregation (G1 in SURVEY.md §2.4): success/failure
counting across a job — the reference's response/progress counters
(response_preparation.py:125-182, task_meta.py:1-8) as a tiny grouped
aggregate over the output table."""

from __future__ import annotations

import pandas as pd
import ray.data


def summarize_conversion(out_ds: ray.data.Dataset) -> pd.DataFrame:
    """(format, status) → n_docs, total_spans. Key cardinality is tiny
    (formats × 2), so the native grouped aggregate is fine here; partial
    aggregation happens in a map stage first so the shuffle carries a few
    rows per block."""
    from ray.data.aggregate import Sum

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(["format", "status"], as_index=False).agg(
            n=("doc_id", "size"), spans=("num_spans", "sum")
        )

    agg = (
        out_ds.select_columns(["doc_id", "format", "status", "num_spans"])
        .map_batches(partial, batch_format="pandas")
        .groupby(["format", "status"])
        .aggregate(Sum("n", alias_name="n_docs"), Sum("spans", alias_name="total_spans"))
    )
    df = agg.to_pandas()
    df["n_docs"] = df["n_docs"].astype("int64")
    df["total_spans"] = df["total_spans"].astype("int64")
    return df.sort_values(["format", "status"]).reset_index(drop=True)


def raise_if_failures(out_ds: ray.data.Dataset) -> None:
    """abort_on_error=True driver semantics (reference convert.py:247-255):
    after execution, raise if any document failed."""
    failures = out_ds.select_columns(["status"]).map_batches(
        lambda b: b[b["status"] != "success"], batch_format="pandas"
    )
    n = failures.count()
    if n:
        raise RuntimeError(f"{n} documents failed conversion (abort_on_error)")
