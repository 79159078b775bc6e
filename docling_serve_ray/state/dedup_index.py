"""Streaming dedup index: a sharded mutable membership set for INCREMENTAL
ingest — the one dedup shape the Dataset API cannot express.

``ops/dedup.exact_dedup`` dedups a corpus it can see end-to-end (groupby
over content hashes). A continuously-ingesting pipeline instead asks "have
I EVER seen this content, in any previous run?" — that is shared mutable
state across Datasets, so this module drops to raw Ray actors exactly as
the build rules allow (everything else in this repo is Dataset-first).

Design:
- N ``_IndexShard`` actors, each owning the fingerprints whose hash routes
  to it. The actor model serializes check-and-insert per shard, so when two
  concurrent batches carry the same new fingerprint, exactly ONE wins —
  no locks, no read-modify-write race.
- ``mark_new`` is a ``map_batches`` stage: per batch it md5-folds the
  content column, routes fingerprints to shards (one call per shard per
  batch, vectorized masks), and appends an ``is_first`` int64 column.
  ``dedup`` filters to the winners.

Scale honesty: each shard holds its fingerprint partition in plain RAM
(~8 bytes × n/shards + set overhead). That is the right shape for
session/stream-scale ingest (billions of fingerprints across a cluster's
aggregate RAM with enough shards); a 100-TB *batch* dedup should use the
``exact_dedup`` groupby op instead — no resident index, pure shuffle.

Reference parity note: docling-serve's options-hash dedup
(``docling_conversion.py``) is per-request exact dedup; the cross-request
index has no reference counterpart and is this suite's own rung.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray
import ray.data


@ray.remote(num_cpus=0.1)
class _IndexShard:
    """Owns one hash partition of the fingerprint set. check_insert is
    atomic per actor: first caller of a fingerprint gets True."""

    def __init__(self) -> None:
        self._seen: set[int] = set()

    def check_insert(self, fps: list[int]) -> list[bool]:
        seen = self._seen
        out = []
        for f in fps:
            if f in seen:
                out.append(False)
            else:
                seen.add(f)
                out.append(True)
        return out

    def size(self) -> int:
        return len(self._seen)


def _fp64(texts) -> np.ndarray:
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "little")
            for t in texts
        ),
        dtype=np.uint64,
        count=len(texts),
    )


class StreamingDedupIndex:
    """Driver-side handle over the shard actors. Survives across any number
    of Dataset runs in the session; shard handles are serializable, so the
    map_batches closure carries them to every worker."""

    def __init__(self, num_shards: int = 8):
        self.num_shards = num_shards
        self.shards = [_IndexShard.remote() for _ in range(num_shards)]

    def mark_new(
        self, ds: ray.data.Dataset, *, text_col: str = "text"
    ) -> ray.data.Dataset:
        """Append is_first (int64 0/1): 1 iff this row's content was never
        seen before — across ALL datasets this index has processed.

        The result is MATERIALIZED before returning: the insert is a side
        effect, so the transform must execute exactly once per call — a
        lazy result re-executed by a second consumption (count() then
        write_parquet()) would find every fingerprint already present and
        mark genuinely-first rows 0. Remaining caveat (documented, not
        solved): a Ray task retry after its shard inserts committed has
        the same effect for that task's rows — at-least-once insertion is
        inherent to side-effecting tasks; pipelines needing exactly-once
        under worker loss should use the batch `exact_dedup` op."""
        shards = self.shards
        n = self.num_shards

        def f(batch: pd.DataFrame) -> pd.DataFrame:
            fps = _fp64(batch[text_col].tolist())
            route = (fps % np.uint64(n)).astype(np.int64)
            is_first = np.zeros(len(fps), dtype=np.int64)
            # duplicates WITHIN the batch: only the first occurrence may
            # claim novelty; later ones are known-dups without an RPC
            uniq_fp, first_idx = np.unique(fps, return_index=True)
            uniq_route = route[first_idx]
            refs, masks = [], []
            for s in range(n):
                m = uniq_route == s
                if m.any():
                    refs.append(shards[s].check_insert.remote(uniq_fp[m].tolist()))
                    masks.append(first_idx[m])
            for ref, idx in zip(ray.get(refs), masks):
                is_first[idx] = np.asarray(ref, dtype=np.int64)
            return batch.assign(is_first=is_first)

        return ds.map_batches(f, batch_format="pandas").materialize()

    def dedup(
        self, ds: ray.data.Dataset, *, text_col: str = "text"
    ) -> ray.data.Dataset:
        """Rows whose content is globally first-seen (the streaming
        survivor stream)."""
        marked = self.mark_new(ds, text_col=text_col)
        return marked.map_batches(
            lambda b: b.loc[b["is_first"] == 1].drop(columns=["is_first"]),
            batch_format="pandas",
        )

    def size(self) -> int:
        """Total fingerprints held (driver-side diagnostic)."""
        return sum(ray.get([s.size.remote() for s in self.shards]))
