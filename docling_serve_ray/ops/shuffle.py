"""Bucketed high-cardinality grouped aggregation.

Measured on this Ray version (2.49, local mode): a native
``groupby(k).aggregate(...)`` over 1.7M rows takes ~100 s at 10k distinct
keys and does not finish at ~1M distinct keys, under BOTH sort- and
hash-shuffle strategies — the reduce step is per-key Python. Fine-grained
``map_groups`` has the same profile (per-group UDF calls).

The scalable pattern, used by every high-cardinality grouped op in this
repo: hash the key columns into a bounded number of buckets, shuffle ONCE on
the bucket column (few hundred groups — cheap), and aggregate each bucket
with one vectorized pandas ``groupby`` call. Combine with per-batch partial
aggregation upstream so the shuffle carries partial rows, not raw rows.

At multi-node scale this is exactly a hash-partitioned aggregation with a
fixed partition count: every bucket is complete on one worker, per-bucket
work is vectorized, and skew is bounded by the key-hash distribution.
"""

from __future__ import annotations

import pandas as pd
import ray.data

DEFAULT_NUM_BUCKETS = 512


def add_bucket_column(
    batch: pd.DataFrame, key_cols: list, num_buckets: int
) -> pd.DataFrame:
    """Deterministic int32 bucket from the key columns (stable across
    processes: pandas hash_pandas_object with the default fixed hash_key)."""
    h = pd.util.hash_pandas_object(batch[list(key_cols)], index=False)
    return batch.assign(_bucket=(h % num_buckets).astype("int32"))


def bucketed_group_agg(
    ds: ray.data.Dataset,
    key_cols: list,
    final_fn,
    *,
    partial_fn=None,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    """groupby(key_cols) with high key cardinality.

    partial_fn: optional per-batch combiner, pd.DataFrame -> pd.DataFrame
        (must keep key_cols). Shrinks the shuffle.
    final_fn: per-bucket reducer, pd.DataFrame -> pd.DataFrame — sees every
        row of each key it sees (bucket = complete groups), must aggregate
        over key_cols itself (one vectorized pandas groupby, NOT per-key
        Python).
    """
    key_cols = list(key_cols)

    def prepare(batch: pd.DataFrame) -> pd.DataFrame:
        if partial_fn is not None:
            batch = partial_fn(batch)
        return add_bucket_column(batch, key_cols, num_buckets)

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return final_fn(g.drop(columns=["_bucket"]))

    return (
        ds.map_batches(prepare, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


def join_partitions(cap: int = 16) -> tuple[int, dict]:
    """Cluster-scaled num_partitions + remote-args for Dataset.join: each
    join spawns an aggregator actor pool, and full-CPU aggregators at high
    partition counts deadlock small clusters (measured: two 16-partition
    joins hang a 4-CPU cluster). Fractional-CPU aggregators + P ≈ cpus/2."""
    try:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        ncpu = 4
    P = max(2, min(cap, ncpu // 2))
    return P, {"aggregator_ray_remote_args": {"num_cpus": 0.25}}
