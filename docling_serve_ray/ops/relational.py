"""Relational operator family: grouped aggregates (with map-side partial
aggregation), broadcast joins, global top-k, tumbling windows, distinct
counting. These are the wide-operation building blocks a training-data
pipeline composes around the conversion core.

Scale patterns used:
- **Partial aggregation (combiner)**: every grouped aggregate first reduces
  inside map_batches (one row per key per batch), so the groupby shuffle
  carries ~keys×batches rows instead of the full table.
- **Broadcast join**: the small side (customer, 150×SF rows) is ray.put once
  and mapped per batch — no shuffle at all.
- **Top-k**: per-batch k-selection → tiny global sort of batches×k rows.

Money columns are emitted as integer cents — rounded PER ROW with
floor(x*100+0.5), then summed as exact integers — so the DuckDB oracle
compares bit-exactly regardless of floating summation order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Sum

# Money is rounded to integer cents PER ROW with floor(x*100 + 0.5) — the
# same IEEE double ops on both engines — then summed exactly as integers.
# Rounding a float *sum* instead is not reproducible across engines
# (summation order differs), and round() itself differs (half-even in
# numpy/pandas vs half-away in DuckDB).
AGG_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_c,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_disc_c,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

JOIN_REVENUE_SQL = """
SELECT c.c_mktsegment,
       CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""

TOP_ORDERS_SQL = """
SELECT o.o_orderkey, c.c_name,
       CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS totalprice_c
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 10
"""

EVENTS_WINDOW_SQL = """
SELECT event_type,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_c
FROM events
GROUP BY event_type, date_trunc('hour', ts)
"""

DISTINCT_BRAND_TYPES_SQL = """
SELECT p_brand, CAST(count(DISTINCT p_type) AS BIGINT) AS n_types
FROM part GROUP BY p_brand
"""


def agg_pricing(sf_dir: str) -> ray.data.Dataset:
    """TPC-H-Q1-style pricing summary. Partial aggregation inside
    map_batches (vectorized pandas groupby per batch) → small groupby."""
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_shipdate",
        ],
        filter=(pc.field("l_shipdate") <= pa.scalar(pd.Timestamp("1998-09-02"))),
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch["qty_c"] = np.floor(batch["l_quantity"] * 100 + 0.5).astype("int64")
        batch["base_c"] = np.floor(batch["l_extendedprice"] * 100 + 0.5).astype("int64")
        batch["disc_c"] = np.floor(
            batch["l_extendedprice"] * (1 - batch["l_discount"]) * 100 + 0.5
        ).astype("int64")
        g = batch.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            p_qty=("qty_c", "sum"),
            p_base=("base_c", "sum"),
            p_disc=("disc_c", "sum"),
            p_cnt=("qty_c", "size"),
        )
        return g

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("p_qty", alias_name="sum_qty"),
            Sum("p_base", alias_name="sum_base"),
            Sum("p_disc", alias_name="sum_disc"),
            Sum("p_cnt", alias_name="count_order"),
        )
    )

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty_c": batch["sum_qty"].astype("int64"),
                "sum_base_c": batch["sum_base"].astype("int64"),
                "sum_disc_c": batch["sum_disc"].astype("int64"),
                "count_order": batch["count_order"].astype("int64"),
            }
        )

    return agg.map_batches(finalize, batch_format="pandas")


# Broadcast a dimension table only while one worker's copy stays cheap; a
# TPC-H customer table SCALES with the corpus (~10^9 rows / ~10 GB per
# worker at 100 TB), so past this bound the ops fall back to the
# hash-partitioned Dataset.join they share with join_priority_revenue.
BROADCAST_MAX_BYTES = 1 << 30


def _customer_lookup(sf_dir: str, value_col: str):
    """Small-side lookup: sorted (keys, values) numpy arrays for a
    vectorized searchsorted probe — broadcast via ray.put ONCE and read
    zero-copy in every task (a dict-of-rows would pickle per-object and
    fall over at a 10^8-row dimension table)."""
    df = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", value_col]
    ).to_pandas()
    keys = df["c_custkey"].to_numpy()
    order = np.argsort(keys)
    return keys[order], df[value_col].to_numpy()[order]


def _lookup(ref, probe: np.ndarray) -> np.ndarray:
    """searchsorted probe WITH presence check: a key absent from the lookup
    yields None/NaN (matching the dict.map semantics this replaced) instead
    of silently returning an adjacent key's value."""
    keys, values = ray.get(ref)
    idx = np.clip(np.searchsorted(keys, probe), 0, len(keys) - 1)
    hit = keys[idx] == probe
    out = values[idx]
    if out.dtype == object or out.dtype.kind in "US":
        return np.where(hit, out, None)
    if out.dtype.kind in "iu":
        # Integer values must NOT round-trip through float64 to carry the
        # missing-key NaN: values >= 2^53 would silently corrupt. Nullable
        # masked extension array keeps exact integers and pd.NA for misses.
        wide = "int64" if out.dtype.kind == "i" else "uint64"
        return pd.arrays.IntegerArray(out.astype(wide), mask=~hit)
    return np.where(hit, out.astype("float64"), np.nan)


def _customer_small_enough(sf_dir: str, threshold_bytes: int) -> bool:
    from .shuffle import input_bytes_estimate

    est = input_bytes_estimate(f"{sf_dir}/customer.parquet")
    return bool(est) and est <= threshold_bytes


def join_revenue(
    sf_dir: str, *, broadcast_threshold_bytes: int = BROADCAST_MAX_BYTES
) -> ray.data.Dataset:
    """orders ⋈ customer → revenue by market segment. Join strategy is
    size-gated: broadcast-probe while the customer table fits comfortably in
    a worker (≤ broadcast_threshold_bytes estimated in-memory), else the
    hash-partitioned Dataset.join path (same shape as
    join_priority_revenue). Both paths produce identical output (forced in
    tests)."""
    if not _customer_small_enough(sf_dir, broadcast_threshold_bytes):
        return _join_revenue_hash(sf_dir)
    ref = ray.put(_customer_lookup(sf_dir, "c_mktsegment"))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        seg = _lookup(ref, batch["o_custkey"].to_numpy())
        cents = np.floor(batch["o_totalprice"] * 100 + 0.5).astype("int64")
        g = (
            pd.DataFrame({"c_mktsegment": seg, "price_c": cents})
            .groupby("c_mktsegment", as_index=False)
            .agg(p_rev=("price_c", "sum"), p_cnt=("price_c", "size"))
        )
        return g

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("c_mktsegment")
        .aggregate(Sum("p_rev", alias_name="rev"), Sum("p_cnt", alias_name="n_orders"))
    )
    return agg.map_batches(
        lambda b: pd.DataFrame(
            {
                "c_mktsegment": b["c_mktsegment"],
                "revenue_c": b["rev"].astype("int64"),
                "n_orders": b["n_orders"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )


def _join_revenue_hash(sf_dir: str) -> ray.data.Dataset:
    """Hash-join fallback for join_revenue when customer is too big to
    broadcast: orders ⋈ customer via the hash-partitioned Dataset.join,
    then the standard partial → small-groupby aggregate."""
    from .shuffle import input_bytes_estimate, join_partitions

    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    c = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    P, jkw = join_partitions(
        size_bytes=input_bytes_estimate(f"{sf_dir}/orders.parquet")
    )
    j = o.join(c, "inner", P, on=("o_custkey",), right_on=("c_custkey",), **jkw)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(batch["o_totalprice"] * 100 + 0.5).astype("int64")
        return (
            pd.DataFrame({"c_mktsegment": batch["c_mktsegment"], "price_c": cents})
            .groupby("c_mktsegment", as_index=False)
            .agg(p_rev=("price_c", "sum"), p_cnt=("price_c", "size"))
        )

    agg = (
        j.map_batches(partial, batch_format="pandas")
        .groupby("c_mktsegment")
        .aggregate(Sum("p_rev", alias_name="rev"), Sum("p_cnt", alias_name="n_orders"))
    )
    return agg.map_batches(
        lambda b: pd.DataFrame(
            {
                "c_mktsegment": b["c_mktsegment"],
                "revenue_c": b["rev"].astype("int64"),
                "n_orders": b["n_orders"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )


def top_orders(
    sf_dir: str, *, broadcast_threshold_bytes: int = BROADCAST_MAX_BYTES
) -> ray.data.Dataset:
    """Global top-10 orders by totalprice with customer name: per-batch
    k-selection → global sort of the tiny candidate set → limit. The
    customer-name attachment is size-gated like join_revenue: broadcast
    probe under the threshold, else a hash join of the K winner rows
    against the customer table."""
    K = 10

    def per_batch_top(batch: pd.DataFrame) -> pd.DataFrame:
        top = batch.nlargest(K, "o_totalprice")
        return top[["o_orderkey", "o_custkey", "o_totalprice"]]

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    cands = ds.map_batches(per_batch_top, batch_format="pandas")
    top = cands.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(K)

    if not _customer_small_enough(sf_dir, broadcast_threshold_bytes):
        return _top_orders_attach_hash(sf_dir, top)

    ref = ray.put(_customer_lookup(sf_dir, "c_name"))

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": batch["o_orderkey"].astype("int64"),
                "c_name": _lookup(ref, batch["o_custkey"].to_numpy()),
                "totalprice_c": np.floor(batch["o_totalprice"] * 100 + 0.5).astype("int64"),
            }
        )

    return top.map_batches(finalize, batch_format="pandas")


def _top_orders_attach_hash(sf_dir: str, top: ray.data.Dataset) -> ray.data.Dataset:
    """Attach c_name to the K winner rows with a hash-partitioned join —
    the fallback when customer cannot be broadcast (the customer side
    shuffles once; the probe side is K rows)."""
    from .shuffle import input_bytes_estimate, join_partitions

    c = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    P, jkw = join_partitions(
        size_bytes=input_bytes_estimate(f"{sf_dir}/customer.parquet")
    )
    j = top.join(c, "inner", P, on=("o_custkey",), right_on=("c_custkey",), **jkw)

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": batch["o_orderkey"].astype("int64"),
                "c_name": batch["c_name"],
                "totalprice_c": np.floor(batch["o_totalprice"] * 100 + 0.5).astype("int64"),
            }
        )

    return j.map_batches(finalize, batch_format="pandas")


def events_window(sf_dir: str) -> ray.data.Dataset:
    """Tumbling 1-hour window aggregate per event_type. Ray Data has no
    event-time windows (neither does the reference — SURVEY.md §2.4); the
    window key is computed per batch (ts floor) and the aggregation is the
    standard partial → groupby pattern."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch["ts"].dt.floor("h").dt.strftime("%Y-%m-%d %H:%M:%S")
        cents = np.floor(batch["value"] * 100 + 0.5).astype("int64")
        g = (
            pd.DataFrame({"event_type": batch["event_type"], "window_start": w, "value_c": cents})
            .groupby(["event_type", "window_start"], as_index=False)
            .agg(p_cnt=("value_c", "size"), p_sum=("value_c", "sum"))
        )
        return g

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["event_type", "window_start"], as_index=False).agg(
            n_events=("p_cnt", "sum"), sum_value_c=("p_sum", "sum")
        )
        out["n_events"] = out["n_events"].astype("int64")
        out["sum_value_c"] = out["sum_value_c"].astype("int64")
        return out

    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )
    # window count scales with data span → bucketed grouped reduce, with
    # the bucket count scaled to the input so one bucket's frame stays
    # bounded at any corpus size
    return bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type", "window_start"],
        final,
        num_buckets=scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/events.parquet")),
    )


def distinct_brand_types(sf_dir: str) -> ray.data.Dataset:
    """count(DISTINCT p_type) per brand: per-batch distinct pairs → groupby
    brand → unique count (exact distinct via pair dedup, not a sketch)."""

    def distinct_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["p_brand", "p_type"]].drop_duplicates()

    def count_unique(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "p_brand": [g["p_brand"].iloc[0]],
                "n_types": pd.Series([g["p_type"].nunique()], dtype="int64"),
            }
        )

    ds = ray.data.read_parquet(f"{sf_dir}/part.parquet", columns=["p_brand", "p_type"])
    return (
        ds.map_batches(distinct_pairs, batch_format="pandas")
        .groupby("p_brand")
        .map_groups(count_unique, batch_format="pandas")
    )


JOIN_PRIORITY_REVENUE_SQL = """
SELECT o.o_orderpriority,
       CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS revenue_c,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


def join_priority_revenue(sf_dir: str) -> ray.data.Dataset:
    """Big-big hash join: lineitem ⋈ orders on orderkey (both sides scale
    with the corpus — no broadcast; Ray's hash-partitioned Dataset.join),
    then the standard partial→small-groupby aggregate."""
    l = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    from .shuffle import join_partitions

    P, jkw = join_partitions()
    j = l.join(o, "inner", P, on=("l_orderkey",), right_on=("o_orderkey",), **jkw)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(
            batch["l_extendedprice"] * (1 - batch["l_discount"]) * 100 + 0.5
        ).astype("int64")
        g = (
            pd.DataFrame({"o_orderpriority": batch["o_orderpriority"], "c": cents})
            .groupby("o_orderpriority", as_index=False)
            .agg(p_rev=("c", "sum"), p_n=("c", "size"))
        )
        return g

    agg = (
        j.map_batches(partial, batch_format="pandas")
        .groupby("o_orderpriority")
        .aggregate(Sum("p_rev", alias_name="rev"), Sum("p_n", alias_name="n_lines"))
    )
    return agg.map_batches(
        lambda b: pd.DataFrame(
            {
                "o_orderpriority": b["o_orderpriority"],
                "revenue_c": b["rev"].astype("int64"),
                "n_lines": b["n_lines"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )


SESSIONIZE_SQL = """
WITH o AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, value,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_c
FROM s GROUP BY user_id, sid
"""

SESSION_GAP = pd.Timedelta(minutes=30)

# Single-key skew guard (VERDICT r03 #5): byte-scaled buckets bound the
# AVERAGE reduce frame of the keyed-log ops, but one pathological key (a
# bot user holding half the corpus) still lands whole in one task. Each op
# therefore (a) raises an informative error — not an OOM — when one key's
# group exceeds max_group_rows on the default single-shuffle path, and
# (b) offers a time-sliced path (slice_width=...) that shuffles by
# (user, time-slice) so a hot user spreads over many tasks, with exact
# boundary reconciliation: sessionize stitches boundary sessions,
# range_join replicates a window-deep halo, asof_join forward-carries the
# latest click. Oracle output is identical on every path (test-forced).
DEFAULT_MAX_GROUP_ROWS = 5_000_000


def auto_slice_width(
    events_path: str,
    max_group_rows: int,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    min_width: "pd.Timedelta | None" = None,
    target_fill: float = 0.25,
) -> "str | None":
    """Resolve ``slice_width="auto"`` for the keyed-log ops: one THIN
    pre-pass (per-batch (key, count, tmin, tmax) partials → bucketed
    per-key sum → per-bucket max → tiny driver reduce; only int64/ts
    summary rows ever shuffle) finds the hottest key's EXACT row count
    and the corpus time span. If the hot key fits ``max_group_rows`` the
    single-shuffle path wins (returns None — no slicing tax); otherwise
    the returned width spreads the hot key over enough slices that one
    (key, slice) group targets ``target_fill × max_group_rows`` rows,
    assuming the hot key's events spread across the corpus span (a bursty
    hot key may still trip the sliced guard — which raises, not OOMs).

    min_width: per-op floor (sessionize needs > the session gap,
    range_join ≥ its window). The width is clamped up to it; a clamped
    width may leave oversized groups, again caught by the sliced guard.
    Raises when the hot key exceeds the limit but the corpus has no time
    span to slice over (single-timestamp skew is not time-separable)."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    ds = ray.data.read_parquet(events_path, columns=[key_col, ts_col])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(key_col, as_index=False).agg(
            cnt=(ts_col, "size"), tmin=(ts_col, "min"), tmax=(ts_col, "max")
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby(key_col, as_index=False).agg(
            cnt=("cnt", "sum"), tmin=("tmin", "min"), tmax=("tmax", "max")
        )
        # one summary row per bucket: its hottest key + its time extent
        return pd.DataFrame(
            {
                "cnt": [int(a["cnt"].max())],
                "tmin": [a["tmin"].min()],
                "tmax": [a["tmax"].max()],
            }
        )

    nb = scaled_num_buckets(input_bytes_estimate(events_path))
    summary = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas"),
        [key_col], per_bucket, num_buckets=nb,
    ).to_pandas()  # ≤ nb rows
    if summary.empty:  # zero events: trivially fits the single-shuffle path
        return None
    max_cnt = int(summary["cnt"].max())
    if max_cnt <= max_group_rows:
        return None
    span = summary["tmax"].max() - summary["tmin"].min()
    span_us = int(span.value // 1000) if hasattr(span, "value") else 0
    if span_us <= 0:
        raise ValueError(
            f"auto_slice_width: hottest key holds {max_cnt} rows "
            f"(> max_group_rows={max_group_rows}) but the corpus has no "
            "time span — single-timestamp skew cannot be time-sliced."
        )
    per_slice = max(1, int(max_group_rows * target_fill))
    n_slices = -(-max_cnt // per_slice)
    width_us = max(1, -(-span_us // n_slices))
    if min_width is not None:
        width_us = max(width_us, int(min_width.value // 1000) + 1)
    return f"{width_us}us"


def _resolve_slice_width(
    slice_width, sf_dir: str, max_group_rows: int, min_width=None
):
    if slice_width == "auto":
        return auto_slice_width(
            f"{sf_dir}/events.parquet", max_group_rows, min_width=min_width
        )
    return slice_width


def _guard_group_rows(g: pd.DataFrame, keys: list, limit: int, op: str) -> None:
    if len(g) <= limit:  # cheap short-circuit: a bucket smaller than the
        return  # limit cannot contain an oversized group
    sizes = g.groupby(keys, sort=False).size()
    if int(sizes.max()) > limit:
        hot = sizes.idxmax()
        raise ValueError(
            f"{op}: key {hot!r} holds {int(sizes.max())} rows "
            f"(> max_group_rows={limit}); one reduce task would "
            f"materialize it whole. Re-run with slice_width= (time-sliced "
            f"skew path) or raise max_group_rows explicitly."
        )


def _fmt_session(out: pd.DataFrame) -> pd.DataFrame:
    out["session_start"] = out["session_start"].dt.strftime("%Y-%m-%d %H:%M:%S.%f")
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value_c"] = out["sum_value_c"].astype("int64")
    out["user_id"] = out["user_id"].astype("int64")
    return out[["user_id", "session_start", "n_events", "sum_value_c"]]


def sessionize(
    sf_dir: str,
    *,
    slice_width: str | None = None,
    max_group_rows: int = DEFAULT_MAX_GROUP_ROWS,
) -> ray.data.Dataset:
    """Gap-based sessionization (30-min inactivity) per user — the
    stream-shaped operator family. Ray Data has no event-time windows
    (neither does the reference, SURVEY.md §2.4); the input is treated as a
    keyed log: bucketed groupby(user_id), in-group sort by (ts, event_id),
    vectorized gap-diff → session ids → per-session aggregate. The bucket
    count scales with input bytes so a bucket's pandas frame stays bounded
    on average; a single key above ``max_group_rows`` raises instead of
    OOMing, pointing at ``slice_width``.

    slice_width (e.g. "1D"): the skew-proof path — shuffle by
    (user, ts-floor(slice_width)) so a hot user's events spread across
    tasks. Sessions are computed per slice; a session touching a slice
    edge (within SESSION_GAP of it) is a BOUNDARY candidate and goes
    through one thin per-user stitching reduce (candidates are ≤2 per
    user-slice — bounded by the calendar, not the event count); interior
    sessions are provably unmergeable (the nearest other-slice event is
    > gap away) and ship straight to the output. Result is exactly the
    single-shuffle output."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )
    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/events.parquet"))
    slice_width = _resolve_slice_width(
        slice_width, sf_dir, max_group_rows, min_width=SESSION_GAP
    )
    if slice_width is not None:
        return _sessionize_sliced(ds, slice_width, nb, max_group_rows)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        _guard_group_rows(g, ["user_id"], max_group_rows, "sessionize")
        g = g.sort_values(["user_id", "ts", "event_id"])
        new_user = g["user_id"].ne(g["user_id"].shift())
        gap = g["ts"].diff() > SESSION_GAP
        sid = (new_user | gap).cumsum()
        g = g.assign(
            _sid=sid,
            _cents=np.floor(g["value"] * 100 + 0.5).astype("int64"),
        )
        out = g.groupby(["user_id", "_sid"], as_index=False).agg(
            session_start=("ts", "min"),
            n_events=("event_id", "size"),
            sum_value_c=("_cents", "sum"),
        )
        return _fmt_session(out)

    return bucketed_group_agg(ds, ["user_id"], per_bucket, num_buckets=nb)


def _sessionize_sliced(
    ds: ray.data.Dataset, slice_width: str, nb: int, max_group_rows: int
) -> ray.data.Dataset:
    from .shuffle import bucketed_group_agg

    width = pd.Timedelta(slice_width)
    if width <= SESSION_GAP:
        raise ValueError("slice_width must exceed the session gap")

    def add_slice(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(_slice=b["ts"].dt.floor(width))

    def per_slice(g: pd.DataFrame) -> pd.DataFrame:
        _guard_group_rows(g, ["user_id", "_slice"], max_group_rows, "sessionize")
        g = g.sort_values(["user_id", "_slice", "ts", "event_id"], kind="stable")
        key_change = g["user_id"].ne(g["user_id"].shift()) | g["_slice"].ne(
            g["_slice"].shift()
        )
        gap_break = g["ts"].diff() > SESSION_GAP
        sid = (key_change | gap_break).cumsum()
        g = g.assign(
            _sid=sid, _cents=np.floor(g["value"] * 100 + 0.5).astype("int64")
        )
        s = g.groupby(["user_id", "_slice", "_sid"], as_index=False).agg(
            first_ts=("ts", "min"),
            last_ts=("ts", "max"),
            n_events=("event_id", "size"),
            sum_value_c=("_cents", "sum"),
        )
        first_sid = s.groupby(["user_id", "_slice"])["_sid"].transform("min")
        last_sid = s.groupby(["user_id", "_slice"])["_sid"].transform("max")
        near_start = s["first_ts"] <= s["_slice"] + SESSION_GAP
        near_end = s["last_ts"] >= s["_slice"] + (width - SESSION_GAP)
        cand = ((s["_sid"] == first_sid) & near_start) | (
            (s["_sid"] == last_sid) & near_end
        )
        return pd.DataFrame(
            {
                "user_id": s["user_id"].astype("int64"),
                "first_ts": s["first_ts"],
                "last_ts": s["last_ts"],
                "n_events": s["n_events"].astype("int64"),
                "sum_value_c": s["sum_value_c"].astype("int64"),
                "_cand": cand.astype("int64"),
            }
        )

    # session-level rows, far smaller than the event log; materialized once
    # because both the interior and the stitching consumer read them
    sessions = bucketed_group_agg(
        ds.map_batches(add_slice, batch_format="pandas"),
        ["user_id", "_slice"],
        per_slice,
        num_buckets=nb,
    ).materialize()

    def interior_rows(b: pd.DataFrame) -> pd.DataFrame:
        out = b.loc[b["_cand"] == 0, ["user_id", "first_ts", "n_events", "sum_value_c"]]
        out = out.rename(columns={"first_ts": "session_start"})
        return _fmt_session(out)

    def cand_rows(b: pd.DataFrame) -> pd.DataFrame:
        return b.loc[b["_cand"] == 1].drop(columns=["_cand"])

    def stitch(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "first_ts"], kind="stable")
        new_user = g["user_id"].ne(g["user_id"].shift())
        gap_break = (g["first_ts"] - g["last_ts"].shift()) > SESSION_GAP
        gid = (new_user | gap_break).cumsum()
        out = g.assign(_gid=gid).groupby(["user_id", "_gid"], as_index=False).agg(
            session_start=("first_ts", "min"),
            n_events=("n_events", "sum"),
            sum_value_c=("sum_value_c", "sum"),
        )
        return _fmt_session(out)

    interior = sessions.map_batches(interior_rows, batch_format="pandas")
    stitched = bucketed_group_agg(
        sessions.map_batches(cand_rows, batch_format="pandas"),
        ["user_id"],
        stitch,
        num_buckets=min(nb, 16),
    )
    return interior.union(stitched)


GROUPED_TOPK_K = 3

GROUPED_TOPK_SQL = """
SELECT o_orderpriority, o_orderkey,
       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS totalprice_c,
       CAST(rnk AS BIGINT) AS rank
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
)
WHERE rnk <= 3
"""


def grouped_topk(sf_dir: str) -> ray.data.Dataset:
    """Top-3 orders per priority class (the windowed-ranking family:
    row_number() OVER (PARTITION BY ...) ≤ k). Scale shape: per-batch
    per-group k-selection (combiner — the shuffle carries ≤ groups×k rows
    per batch) → small per-group final top-k. No global sort; group
    cardinality is the priority classes, so the final groupby is tiny."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
            .groupby("o_orderpriority", as_index=False, sort=False)
            .head(GROUPED_TOPK_K)
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        top = g.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True]).head(
            GROUPED_TOPK_K
        )
        return pd.DataFrame(
            {
                "o_orderpriority": top["o_orderpriority"].to_numpy(),
                "o_orderkey": top["o_orderkey"].astype("int64").to_numpy(),
                "totalprice_c": np.floor(top["o_totalprice"] * 100 + 0.5)
                .astype("int64")
                .to_numpy(),
                "rank": pd.Series(range(1, len(top) + 1), dtype="int64"),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )
    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("o_orderpriority")
        .map_groups(final, batch_format="pandas")
    )


# Exact grouped percentiles over DISCRETE values (integer cents): per-batch
# (group, value) histograms are the combiner — the shuffle carries one row
# per distinct (group, value) per batch, never raw rows — and quantiles are
# read off the merged histogram's cumulative counts. This is the exact,
# fully scalable alternative to sort-based percentiles (no global sort) and
# to sketches (no approximation), valid whenever the value domain is
# bounded/discrete. Quantile rule (shared literally with the SQL twin):
# value at 1-based cumulative rank floor((total-1)*q) + 1 of the ascending
# value order — the "lower interpolation" discrete quantile.
GROUPED_QUANTILES_SQL = """
WITH c AS (
  SELECT l_returnflag, CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS v,
         count(*) AS n
  FROM lineitem GROUP BY l_returnflag, v
),
t AS (
  SELECT l_returnflag, v,
         SUM(n) OVER (PARTITION BY l_returnflag ORDER BY v) AS cum,
         SUM(n) OVER (PARTITION BY l_returnflag) AS tot
  FROM c
)
SELECT l_returnflag,
       CAST(MIN(CASE WHEN cum >= CAST(floor((tot-1) * 0.5) AS BIGINT) + 1 THEN v END) AS BIGINT) AS p50_c,
       CAST(MIN(CASE WHEN cum >= CAST(floor((tot-1) * 0.95) AS BIGINT) + 1 THEN v END) AS BIGINT) AS p95_c,
       CAST(MIN(tot) AS BIGINT) AS n_rows
FROM t GROUP BY l_returnflag
"""


def grouped_quantiles(sf_dir: str) -> ray.data.Dataset:
    """Exact p50/p95 of quantity cents per returnflag via distributed
    histogram merge (see GROUPED_QUANTILES_SQL note)."""
    from .shuffle import bucketed_group_agg

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = np.floor(batch["l_quantity"] * 100 + 0.5).astype("int64")
        g = (
            pd.DataFrame({"l_returnflag": batch["l_returnflag"], "v": v})
            .groupby(["l_returnflag", "v"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return g

    def merge_hist(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["l_returnflag", "v"], as_index=False).agg(n=("n", "sum"))

    hist = bucketed_group_agg(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_quantity"]
        ).map_batches(partial, batch_format="pandas"),
        ["l_returnflag", "v"],
        merge_hist,
        partial_fn=lambda b: b.groupby(["l_returnflag", "v"], as_index=False).agg(
            n=("n", "sum")
        ),
    )

    def quantiles(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("v")
        cum = g["n"].cumsum().to_numpy()
        tot = int(cum[-1])
        vs = g["v"].to_numpy()

        def q(p):
            rank = (tot - 1) * p // 1 + 1  # floor((tot-1)*p) + 1, 1-based
            return int(vs[np.searchsorted(cum, rank)])

        return pd.DataFrame(
            {
                "l_returnflag": [g["l_returnflag"].iloc[0]],
                "p50_c": pd.Series([q(0.5)], dtype="int64"),
                "p95_c": pd.Series([q(0.95)], dtype="int64"),
                "n_rows": pd.Series([tot], dtype="int64"),
            }
        )

    # returnflag cardinality is tiny: the final per-group reduce sees the
    # merged histogram (distinct values), never raw rows
    return hist.groupby("l_returnflag").map_groups(quantiles, batch_format="pandas")


# --- as-of join (time-series attribution) -----------------------------------
#
# Ray Data has no ASOF join (the reference has no joins at all — its data
# plane is per-document; SURVEY.md §2.4). Implemented as the canonical
# distributed as-of: hash-partition BOTH sides on the equi-key (user), then
# one vectorized pandas merge_asof per bucket. One shuffle total; within a
# bucket both sides of each key are complete, so the time lookup is local.
# Partitioning assumption (documented contract): all events of one user fit
# one bucket task — bucket count scales with input bytes, so per-bucket frame
# size stays bounded as the corpus grows.
#
# Tie-break is explicit so the oracle can mirror it exactly: among clicks
# with the same timestamp the max event_id wins (right side is sorted by
# (ts, event_id) ascending and merge_asof takes the last equal-ts row; the
# SQL orders c.ts DESC, c.event_id DESC and takes row 1). No-match rows keep
# the purchase with sentinel -1 (CSV-stable across engines, unlike NULL).
ASOF_JOIN_SQL = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
m AS (
  SELECT p.event_id, c.event_id AS c_eid, c.ts AS c_ts,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
  FROM p JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
)
SELECT p.event_id, p.user_id,
       CAST(COALESCE(m.c_eid, -1) AS BIGINT) AS click_event_id,
       CAST(COALESCE(date_diff('microsecond', m.c_ts, p.ts), -1) AS BIGINT) AS lag_us
FROM p LEFT JOIN m ON m.event_id = p.event_id AND m.rn = 1
"""


def _asof_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Shared as-of core: purchases merge_asof'd against clicks within one
    reduce frame (sentinel keeps the id column int64 end-to-end). Used by
    both the single-shuffle and the sliced+carry paths."""
    p = g.loc[g["event_type"] == "purchase", ["event_id", "user_id", "ts"]]
    c = g.loc[g["event_type"] == "click", ["event_id", "user_id", "ts"]]
    if p.empty:
        return pd.DataFrame(
            {
                "event_id": pd.Series(dtype="int64"),
                "user_id": pd.Series(dtype="int64"),
                "click_event_id": pd.Series(dtype="int64"),
                "lag_us": pd.Series(dtype="int64"),
            }
        )
    p = p.sort_values("ts", kind="stable")
    # one sentinel click (event_id -1) per purchase user, earlier than
    # every real timestamp: every purchase then matches SOMETHING, so
    # merge_asof never introduces NaN and the id column stays int64
    # end-to-end (a float64 round-trip would corrupt ids >= 2^53)
    sentinel_ts = g["ts"].min() - pd.Timedelta(microseconds=1)
    sent = pd.DataFrame(
        {
            "event_id": np.int64(-1),
            "user_id": p["user_id"].unique(),
            "ts": sentinel_ts,
        }
    ).astype({"ts": g["ts"].dtype})
    # ascending (ts, event_id) → merge_asof's last-equal-ts row is the
    # max event_id: the documented tie-break
    c = pd.concat([sent, c], ignore_index=True).sort_values(
        ["ts", "event_id"], kind="stable"
    )
    c = c.assign(c_ts=c["ts"])
    m = pd.merge_asof(
        p, c, on="ts", by="user_id", direction="backward", suffixes=("", "_c")
    )
    click_id = m["event_id_c"].to_numpy()
    assert click_id.dtype == np.int64, click_id.dtype  # sentinel contract
    matched = click_id >= 0
    lag = np.full(len(m), -1, dtype="int64")
    lag[matched] = (
        (m.loc[matched, "ts"].to_numpy() - m.loc[matched, "c_ts"].to_numpy())
        .astype("timedelta64[us]")
        .astype("int64")
    )
    return pd.DataFrame(
        {
            "event_id": m["event_id"].astype("int64"),
            "user_id": m["user_id"].astype("int64"),
            "click_event_id": click_id,
            "lag_us": lag,
        }
    )


def asof_join(
    sf_dir: str,
    *,
    slice_width: str | None = None,
    max_group_rows: int = DEFAULT_MAX_GROUP_ROWS,
) -> ray.data.Dataset:
    """Attribution as-of join: each purchase event joined to the same
    user's most recent click at-or-before it (backward as-of, exact
    matches allowed). Output is all purchases; unmatched rows carry
    click_event_id = lag_us = -1.

    slice_width (e.g. "1D"): the skew-proof path — shuffle by
    (user, ts-floor(slice_width)). The as-of lookback is unbounded, so a
    thin CARRY pre-pass computes, per (user, slice-with-purchases), the
    latest click of any EARLIER slice (one combiner + one per-user reduce
    over per-slice summary rows — bounded by the calendar, not the event
    count) and injects it into the slice as an extra click row; the local
    merge_asof then sees everything it needs. Clicks from other slices
    that share a reduce bucket are harmless: earlier ones are dominated by
    the carry, later ones are beyond the purchase's timestamp. Identical
    output to the single-shuffle path (test-forced). The default path
    raises (not OOMs) when one user exceeds ``max_group_rows``."""
    import pyarrow.compute as pc

    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
        filter=pc.field("event_type").isin(["purchase", "click"]),
    )
    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/events.parquet"))
    slice_width = _resolve_slice_width(slice_width, sf_dir, max_group_rows)
    if slice_width is not None:
        return _asof_join_sliced(ds, slice_width, nb, max_group_rows)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        _guard_group_rows(g, ["user_id"], max_group_rows, "asof_join")
        return _asof_bucket(g)

    return bucketed_group_agg(ds, ["user_id"], per_bucket, num_buckets=nb)


def _asof_join_sliced(
    ds: ray.data.Dataset, slice_width: str, nb: int, max_group_rows: int
) -> ray.data.Dataset:
    """Skew-proof as-of join: (user, time-slice) shuffle + a carry pre-pass
    injecting each purchase-slice's latest earlier click (see asof_join
    docstring)."""
    from .shuffle import bucketed_group_agg

    width = pd.Timedelta(slice_width)

    def add_slice(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(_slice=b["ts"].dt.floor(width))

    sliced = ds.map_batches(add_slice, batch_format="pandas")

    # --- carry pre-pass: summary rows are one per (user, slice) per batch,
    # so the per-user reduce frame scales with the CALENDAR, not the events
    def summary_partial(b: pd.DataFrame) -> pd.DataFrame:
        is_c = b["event_type"] == "click"
        clicks = (
            b.loc[is_c, ["user_id", "_slice", "ts", "event_id"]]
            .sort_values(["user_id", "_slice", "ts", "event_id"], kind="stable")
            .groupby(["user_id", "_slice"], as_index=False)
            .last()
            .rename(columns={"ts": "click_ts", "event_id": "click_id"})
        )
        purch = (
            b.loc[~is_c, ["user_id", "_slice"]]
            .drop_duplicates()
            .assign(has_p=np.int8(1))
        )
        m = clicks.merge(purch, on=["user_id", "_slice"], how="outer")
        m["has_p"] = m["has_p"].fillna(0).astype("int8")
        m["click_id"] = m["click_id"].fillna(-1).astype("int64")
        return m

    def carry_final(g: pd.DataFrame) -> pd.DataFrame:
        # merge batch partials per (user, slice): max (click_ts, click_id),
        # any purchase flag. NaT-first sort so .last() lands on the winner.
        g = g.sort_values(
            ["user_id", "_slice", "click_ts", "click_id"],
            kind="stable",
            na_position="first",
        )
        agg = g.groupby(["user_id", "_slice"], as_index=False).agg(
            click_ts=("click_ts", "last"),
            click_id=("click_id", "last"),
            has_p=("has_p", "max"),
        )
        agg = agg.sort_values(["user_id", "_slice"], kind="stable")
        # latest click at-or-before each slice, positionally (no float ids):
        # click timestamps strictly increase across a user's slices, so the
        # most recent click row index forward-fills correctly
        pos = pd.Series(
            np.where(agg["click_ts"].notna(), np.arange(len(agg), dtype="float64"), np.nan),
            index=agg.index,
        )
        filled = pos.groupby(agg["user_id"], sort=False).ffill()
        prev = filled.groupby(agg["user_id"], sort=False).shift(1)
        take = agg["has_p"].astype(bool).to_numpy() & prev.notna().to_numpy()
        idx = prev.to_numpy()[take].astype("int64")
        return pd.DataFrame(
            {
                "user_id": agg["user_id"].to_numpy()[take],
                "_slice": agg["_slice"].to_numpy()[take],
                "carry_ts": agg["click_ts"].to_numpy()[idx],
                "carry_id": agg["click_id"].to_numpy()[idx],
            }
        )

    carry = bucketed_group_agg(
        sliced,
        ["user_id"],
        carry_final,
        partial_fn=summary_partial,
        num_buckets=min(nb, 64),
    )

    def carry_as_clicks(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": b["carry_id"].astype("int64"),
                "user_id": b["user_id"].astype("int64"),
                "ts": b["carry_ts"],
                "event_type": "click",
                "_slice": b["_slice"],
            }
        )

    full = sliced.union(carry.map_batches(carry_as_clicks, batch_format="pandas"))

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        _guard_group_rows(g, ["user_id", "_slice"], max_group_rows, "asof_join")
        return _asof_bucket(g)

    return bucketed_group_agg(full, ["user_id", "_slice"], per_group, num_buckets=nb)


# --- range join (sliding preceding window) -----------------------------------
#
# Band/interval join: for each purchase, aggregate all events of the same
# user in the half-open window [ts - 1h, ts). Same single-shuffle
# hash-partition-by-key shape as asof_join; within a bucket the window
# lookup is two vectorized searchsorted calls over a composite
# (user, time) key plus a prefix-sum read — no per-row or per-user Python
# loop, and never a per-user cross join (the naive merge-then-filter
# materializes |orders_u| × |events_u| rows per user; this stays linear).
RANGE_JOIN_SQL = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
SELECT p.event_id, p.user_id,
       CAST(count(e.event_id) AS BIGINT) AS n_prev_1h,
       CAST(COALESCE(SUM(CAST(floor(e.value * 100 + 0.5) AS BIGINT)), 0) AS BIGINT)
         AS sum_prev_value_c
FROM p LEFT JOIN events e
  ON e.user_id = p.user_id AND e.ts >= p.ts - INTERVAL 1 HOUR AND e.ts < p.ts
GROUP BY p.event_id, p.user_id
"""

RANGE_WINDOW_US = 3_600_000_000  # 1 hour
# composite-key ceiling; patchable in tests to force the segment fallback
_RANGE_COMP_MAX = np.iinfo(np.int64).max


def range_join(
    sf_dir: str,
    *,
    comp_max: int = _RANGE_COMP_MAX,
    slice_width: str | None = None,
    max_group_rows: int = DEFAULT_MAX_GROUP_ROWS,
) -> ray.data.Dataset:
    """Preceding-window activity per purchase: count + value-cents sum of
    ALL events of the same user in [purchase_ts - 1h, purchase_ts).
    Window bounds: lower inclusive, upper exclusive (an event sharing the
    purchase's exact timestamp — including the purchase itself — is out).

    ``comp_max`` caps the composite (user, time) key; buckets whose
    users × time-span would exceed it take the per-user-segment fallback
    (tests shrink it to force that path).

    slice_width (≥ the 1 h window, e.g. "6h"): the skew-proof path —
    shuffle by (user, ts-floor(slice_width)). Because the window is
    BOUNDED, no stitching pass is needed: every event within one window
    of a slice's end is replicated into the next slice as a halo row
    (≤ window/slice_width duplication), so each purchase's full window is
    local to its home slice; purchases are evaluated only in their home
    slice. Identical output to the single-shuffle path (test-forced).
    The default path raises (not OOMs) when one user exceeds
    ``max_group_rows`` — see _guard_group_rows."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    )
    slice_width = _resolve_slice_width(
        slice_width, sf_dir, max_group_rows,
        min_width=pd.Timedelta(microseconds=RANGE_WINDOW_US),
    )
    if slice_width is not None:
        return _range_join_sliced(ds, sf_dir, slice_width, comp_max, max_group_rows)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        _guard_group_rows(g, ["user_id"], max_group_rows, "range_join")
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        is_p = (g["event_type"] == "purchase").to_numpy()
        if not is_p.any():
            return pd.DataFrame(
                {
                    "event_id": pd.Series(dtype="int64"),
                    "user_id": pd.Series(dtype="int64"),
                    "n_prev_1h": pd.Series(dtype="int64"),
                    "sum_prev_value_c": pd.Series(dtype="int64"),
                }
            )
        # composite monotone key: user index × stride + µs offset, stride >
        # max offset + window so windows can never cross a user boundary
        uid = g["user_id"].to_numpy()
        uidx = np.cumsum(np.r_[0, uid[1:] != uid[:-1]]).astype("int64")
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        rel = ts_us - ts_us.min()
        stride = int(rel.max()) + RANGE_WINDOW_US + 2
        cents = np.floor(g["value"].to_numpy() * 100 + 0.5).astype("int64")
        csum = np.concatenate(([0], np.cumsum(cents)))
        if int(uidx[-1]) >= (comp_max - stride) // stride:
            # users-per-bucket × time-span would overflow the composite key
            # (possible only when bucket scaling is defeated, e.g. remote
            # paths with unknown byte size): fall back to per-user segments
            # — a loop over users, searchsorted within each user's slice.
            starts = np.r_[0, np.flatnonzero(uid[1:] != uid[:-1]) + 1, len(uid)]
            outs = []
            for s, e in zip(starts[:-1], starts[1:]):
                seg_p = is_p[s:e]
                if not seg_p.any():
                    continue
                t = ts_us[s:e]
                pt = t[seg_p]
                lo = np.searchsorted(t, pt - RANGE_WINDOW_US, side="left") + s
                hi = np.searchsorted(t, pt, side="left") + s
                outs.append(
                    pd.DataFrame(
                        {
                            "event_id": g["event_id"].to_numpy()[s:e][seg_p],
                            "user_id": uid[s:e][seg_p],
                            "n_prev_1h": (hi - lo).astype("int64"),
                            "sum_prev_value_c": csum[hi] - csum[lo],
                        }
                    )
                )
            return pd.concat(outs, ignore_index=True)
        comp = uidx * stride + rel
        p_comp = comp[is_p]
        lo = np.searchsorted(comp, p_comp - RANGE_WINDOW_US, side="left")
        hi = np.searchsorted(comp, p_comp, side="left")
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy()[is_p],
                "user_id": uid[is_p],
                "n_prev_1h": (hi - lo).astype("int64"),
                "sum_prev_value_c": csum[hi] - csum[lo],
            }
        )

    return bucketed_group_agg(
        ds,
        ["user_id"],
        per_bucket,
        num_buckets=scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/events.parquet")),
    )


_RANGE_EMPTY = {
    "event_id": "int64",
    "user_id": "int64",
    "n_prev_1h": "int64",
    "sum_prev_value_c": "int64",
}


def _range_join_sliced(
    ds: ray.data.Dataset,
    sf_dir: str,
    slice_width: str,
    comp_max: int,
    max_group_rows: int,
) -> ray.data.Dataset:
    """Skew-proof range join: shuffle by (user, time-slice) with a
    window-deep halo (see range_join docstring)."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    width = pd.Timedelta(slice_width)
    win = pd.Timedelta(microseconds=RANGE_WINDOW_US)
    if width < win:
        raise ValueError("slice_width must be >= the window (1h)")

    def add_slice_halo(b: pd.DataFrame) -> pd.DataFrame:
        sl = b["ts"].dt.floor(width)
        home = b.assign(_slice=sl, _home=np.int8(1))
        tail = (b["ts"] >= (sl + (width - win))).to_numpy()
        halo = b.loc[tail].assign(_slice=(sl[tail] + width), _home=np.int8(0))
        return pd.concat([home, halo], ignore_index=True)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        _guard_group_rows(g, ["user_id", "_slice"], max_group_rows, "range_join")
        g = g.sort_values(["user_id", "_slice", "ts", "event_id"], kind="stable")
        is_p = ((g["event_type"] == "purchase") & (g["_home"] == 1)).to_numpy()
        if not is_p.any():
            return pd.DataFrame({c: pd.Series(dtype=t) for c, t in _RANGE_EMPTY.items()})
        key_change = (
            g["user_id"].ne(g["user_id"].shift())
            | g["_slice"].ne(g["_slice"].shift())
        ).to_numpy()
        key_change[0] = False
        gidx = np.cumsum(key_change).astype("int64")
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        rel = ts_us - ts_us.min()
        stride = int(rel.max()) + RANGE_WINDOW_US + 2
        cents = np.floor(g["value"].to_numpy() * 100 + 0.5).astype("int64")
        csum = np.concatenate(([0], np.cumsum(cents)))
        if int(gidx[-1]) >= (comp_max - stride) // stride:
            # composite overflow: per-(user,slice)-segment searchsorted
            starts = np.r_[0, np.flatnonzero(key_change) , len(gidx)]
            starts = np.unique(starts)
            outs = []
            for s, e in zip(starts[:-1], starts[1:]):
                seg_p = is_p[s:e]
                if not seg_p.any():
                    continue
                t = ts_us[s:e]
                pt = t[seg_p]
                lo = np.searchsorted(t, pt - RANGE_WINDOW_US, side="left") + s
                hi = np.searchsorted(t, pt, side="left") + s
                outs.append(
                    pd.DataFrame(
                        {
                            "event_id": g["event_id"].to_numpy()[s:e][seg_p],
                            "user_id": g["user_id"].to_numpy()[s:e][seg_p],
                            "n_prev_1h": (hi - lo).astype("int64"),
                            "sum_prev_value_c": csum[hi] - csum[lo],
                        }
                    )
                )
            return pd.concat(outs, ignore_index=True)
        comp = gidx * stride + rel
        p_comp = comp[is_p]
        lo = np.searchsorted(comp, p_comp - RANGE_WINDOW_US, side="left")
        hi = np.searchsorted(comp, p_comp, side="left")
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy()[is_p],
                "user_id": g["user_id"].to_numpy()[is_p],
                "n_prev_1h": (hi - lo).astype("int64"),
                "sum_prev_value_c": csum[hi] - csum[lo],
            }
        )

    return bucketed_group_agg(
        ds.map_batches(add_slice_halo, batch_format="pandas"),
        ["user_id", "_slice"],
        per_group,
        num_buckets=scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/events.parquet")),
    )


# --- anti-join ----------------------------------------------------------------

INACTIVE_CUSTOMERS_SQL = """
SELECT c.c_custkey
FROM customer c
LEFT JOIN (SELECT DISTINCT user_id FROM events) e ON e.user_id = c.c_custkey
WHERE e.user_id IS NULL
"""


def inactive_customers(sf_dir: str) -> ray.data.Dataset:
    """Customers with NO event activity — the distributed anti-join as a
    first-class query (ops/shuffle.anti_join_ids: tag both sides, one
    bucketed grouped reduce on the id; Dataset.join has no anti mode and
    broadcasting the event-user set stops scaling once events outgrow a
    worker's heap)."""
    from .shuffle import anti_join_ids, input_bytes_estimate, scaled_num_buckets

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).map_batches(
        lambda b: b.rename(columns={"c_custkey": "key"}), batch_format="pandas"
    )
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id"]
    ).map_batches(
        lambda b: b.rename(columns={"user_id": "key"}), batch_format="pandas"
    )
    nb = scaled_num_buckets(
        input_bytes_estimate(
            f"{sf_dir}/customer.parquet", f"{sf_dir}/events.parquet"
        )
    )
    out = anti_join_ids(cust, ev, "key", num_buckets=nb)
    return out.map_batches(
        lambda b: b.rename(columns={"key": "c_custkey"}), batch_format="pandas"
    )


# --- funnel analysis (ordered sequence matching) -------------------------------

FUNNEL_STAGES_SQL = """
WITH s AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s ON s.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > s.t1
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
  GROUP BY e.user_id
),
u AS (SELECT DISTINCT user_id FROM events)
SELECT u.user_id,
       CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                 WHEN c.user_id IS NOT NULL THEN 2
                 WHEN s.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS funnel_stage
FROM u
LEFT JOIN s ON s.user_id = u.user_id
LEFT JOIN c ON c.user_id = u.user_id
LEFT JOIN p ON p.user_id = u.user_id
"""

FUNNEL_SEQUENCE = ("signup", "click", "purchase")


def funnel_stages(sf_dir: str) -> ray.data.Dataset:
    """Ordered-funnel analysis: per user, the furthest stage of
    signup → click → purchase reached IN ORDER (each stage's earliest
    event must be strictly after the previous stage's earliest qualifying
    event). Stage 0 = user has events but never signed up.

    The sequence-matching operator family (neither Ray Data nor the
    reference has one). Same single-shuffle shape as sessionize: hash
    -partition by user, then per bucket the stage times resolve with one
    vectorized pass per stage (groupby-min + map; no per-user Python
    loop)."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        users = pd.DataFrame({"user_id": g["user_id"].unique()})
        stage = pd.Series(np.int64(0), index=users["user_id"].to_numpy())
        prev_t = None  # per-user time of the previous stage (pd.Series)
        for depth, etype in enumerate(FUNNEL_SEQUENCE, start=1):
            ev = g.loc[g["event_type"] == etype, ["user_id", "ts"]]
            if prev_t is not None:
                cutoff = ev["user_id"].map(prev_t)
                ev = ev.loc[cutoff.notna().to_numpy() & (ev["ts"] > cutoff).to_numpy()]
            if ev.empty:
                break
            t = ev.groupby("user_id")["ts"].min()
            stage.loc[t.index] = np.int64(depth)
            prev_t = t
        return pd.DataFrame(
            {
                "user_id": stage.index.to_numpy().astype("int64"),
                "funnel_stage": stage.to_numpy(),
            }
        )

    return bucketed_group_agg(
        ds,
        ["user_id"],
        per_bucket,
        num_buckets=scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/events.parquet")),
    )


# --- retention cohorts ----------------------------------------------------------

RETENTION_COHORTS_SQL = """
WITH f AS (
  SELECT user_id, date_trunc('day', min(ts)) AS cohort FROM events GROUP BY user_id
),
a AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events)
SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_day,
       CAST(date_diff('day', f.cohort, a.day) AS BIGINT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM f JOIN a ON a.user_id = f.user_id
GROUP BY f.cohort, date_diff('day', f.cohort, a.day)
"""


def retention_cohorts(sf_dir: str) -> ray.data.Dataset:
    """Cohort retention matrix: users grouped by first-seen day, distinct
    active users counted per (cohort_day, day_offset) — the retention
    triangle every product pipeline publishes.

    Two-level combine: hash-partition by user (each user's cohort and
    active-day set resolve bucket-locally, one vectorized pass), emitting
    one (cohort, offset) row per user-day; the final count is a tiny
    grouped sum (cohorts × offsets cells ≪ users)."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/events.parquet"))

    def per_user_bucket(g: pd.DataFrame) -> pd.DataFrame:
        day = g["ts"].dt.floor("D")
        cohort = day.groupby(g["user_id"]).transform("min")
        rows = pd.DataFrame(
            {
                "cohort_day": cohort.dt.strftime("%Y-%m-%d"),
                "day_offset": ((day - cohort).dt.days).astype("int64"),
                "user_id": g["user_id"],
            }
        ).drop_duplicates()  # one row per user per active day
        out = rows.groupby(["cohort_day", "day_offset"], as_index=False).agg(
            n_users=("user_id", "size")
        )
        return out.astype({"n_users": "int64"})

    per_bucket = bucketed_group_agg(ds, ["user_id"], per_user_bucket, num_buckets=nb)

    # final merge: cells are cohorts × offsets (tiny) — one more bucketed sum
    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["cohort_day", "day_offset"], as_index=False)["n_users"].sum()
        return out.astype({"day_offset": "int64", "n_users": "int64"})

    return bucketed_group_agg(
        per_bucket, ["cohort_day", "day_offset"], merge, num_buckets=64
    )


# --- windowed running totals / lag deltas (keyed-log window functions) ---------

RUNNING_TOTALS_SQL = """
SELECT event_id, user_id,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_value_c
FROM events
"""


def running_totals(
    sf_dir: str,
    *,
    slice_width: str | None = None,
    max_group_rows: int = DEFAULT_MAX_GROUP_ROWS,
) -> ray.data.Dataset:
    """Per-user running sum of value-cents in (ts, event_id) order — the
    cumulative window function (SUM OVER PARTITION BY ... ROWS UNBOUNDED
    PRECEDING). Same keyed-log shape as sessionize: one bucketed shuffle
    by user, vectorized sort + groupby-cumsum per bucket, byte-scaled
    bucket count, oversized-key guard.

    slice_width: the skew-proof path — the classic two-phase distributed
    prefix sum. A thin combiner pass computes per-(user, slice) cent
    totals, one small per-user reduce turns them into exclusive-prefix
    CARRY rows, and the event shuffle (by user AND slice) adds carry +
    local cumsum per slice. Identical output to the single-shuffle path
    (test-forced)."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )
    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/events.parquet"))
    slice_width = _resolve_slice_width(slice_width, sf_dir, max_group_rows)
    if slice_width is not None:
        return _running_totals_sliced(ds, slice_width, nb, max_group_rows)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        _guard_group_rows(g, ["user_id"], max_group_rows, "running_totals")
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        cents = np.floor(g["value"].to_numpy() * 100 + 0.5).astype("int64")
        run = pd.Series(cents).groupby(g["user_id"].to_numpy()).cumsum()
        return pd.DataFrame(
            {
                "event_id": g["event_id"].astype("int64").to_numpy(),
                "user_id": g["user_id"].astype("int64").to_numpy(),
                "running_value_c": run.to_numpy(),
            }
        )

    return bucketed_group_agg(ds, ["user_id"], per_bucket, num_buckets=nb)


def _running_totals_sliced(
    ds: ray.data.Dataset, slice_width: str, nb: int, max_group_rows: int
) -> ray.data.Dataset:
    from .shuffle import bucketed_group_agg

    width = pd.Timedelta(slice_width)

    def add_slice(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(
            _slice=b["ts"].dt.floor(width), _carry_c=np.int64(0)
        )

    sliced = ds.map_batches(add_slice, batch_format="pandas")

    def totals_partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["value"].to_numpy() * 100 + 0.5).astype("int64")
        f = pd.DataFrame(
            {"user_id": b["user_id"], "_slice": b["_slice"], "c": cents}
        )
        return f.groupby(["user_id", "_slice"], as_index=False)["c"].sum()

    def carry_final(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["user_id", "_slice"], as_index=False)["c"].sum()
        agg = agg.sort_values(["user_id", "_slice"], kind="stable")
        grp = agg.groupby("user_id", sort=False)["c"]
        carry = grp.cumsum() - agg["c"]  # exclusive prefix per user
        take = carry.to_numpy() != 0  # slice 0 carries nothing: skip
        return pd.DataFrame(
            {
                "user_id": agg["user_id"].to_numpy()[take],
                "_slice": agg["_slice"].to_numpy()[take],
                "carry_c": carry.to_numpy()[take].astype("int64"),
            }
        )

    carry = bucketed_group_agg(
        sliced,
        ["user_id"],
        carry_final,
        partial_fn=totals_partial,
        num_buckets=min(nb, 64),
    )

    def carry_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": np.int64(-1),
                "user_id": b["user_id"].astype("int64"),
                "ts": pd.Series(b["_slice"].to_numpy()),  # dummy, unused
                "value": np.float64(0),
                "_slice": b["_slice"],
                "_carry_c": b["carry_c"].astype("int64"),
            }
        )

    full = sliced.union(carry.map_batches(carry_rows, batch_format="pandas"))

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        _guard_group_rows(g, ["user_id", "_slice"], max_group_rows, "running_totals")
        is_carry = (g["event_id"] == -1).to_numpy()
        carries = (
            g.loc[is_carry]
            .set_index(["user_id", "_slice"])["_carry_c"]
            .groupby(level=[0, 1])
            .sum()  # exactly 0 or 1 carry row per (user, slice)
        )
        e = g.loc[~is_carry].sort_values(
            ["user_id", "_slice", "ts", "event_id"], kind="stable"
        )
        cents = np.floor(e["value"].to_numpy() * 100 + 0.5).astype("int64")
        uid = e["user_id"].to_numpy()
        sl = e["_slice"].to_numpy()
        new = np.r_[True, (uid[1:] != uid[:-1]) | (sl[1:] != sl[:-1])]
        gid = np.cumsum(new) - 1
        csum = np.cumsum(cents)
        start_excl = np.r_[0, csum[:-1]][new]  # csum before each group
        local = csum - start_excl[gid]  # segmented cumsum
        starts = pd.MultiIndex.from_arrays([uid[new], sl[new]])
        base = carries.reindex(starts, fill_value=0).to_numpy()[gid]
        return pd.DataFrame(
            {
                "event_id": e["event_id"].astype("int64").to_numpy(),
                "user_id": uid.astype("int64"),
                "running_value_c": (local + base).astype("int64"),
            }
        )

    return bucketed_group_agg(full, ["user_id", "_slice"], per_group, num_buckets=nb)


EVENT_DELTAS_SQL = """
SELECT event_id, user_id,
       CAST(COALESCE(date_diff('microsecond',
                               lag(ts) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id),
                               ts), -1) AS BIGINT) AS since_prev_us
FROM events
"""


def event_deltas(
    sf_dir: str,
    *,
    slice_width: str | None = None,
    max_group_rows: int = DEFAULT_MAX_GROUP_ROWS,
) -> ray.data.Dataset:
    """Per-event time since the user's previous event (µs; first event =
    -1) — the LAG window function, vectorized as a per-bucket shifted
    diff. Same keyed-log shape and guard as running_totals.

    slice_width: the skew-proof path — LAG only needs ONE value across a
    slice edge (the previous slice's last timestamp), so a thin
    per-(user, slice) last-ts combiner + per-user shift produces carry
    rows, and the (user, slice) event shuffle computes local diffs with
    the carry as the first event's predecessor. Equal-ts ties carry no
    ambiguity: the delta is 0 either way."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/events.parquet"))
    slice_width = _resolve_slice_width(slice_width, sf_dir, max_group_rows)
    if slice_width is not None:
        return _event_deltas_sliced(ds, slice_width, nb, max_group_rows)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        _guard_group_rows(g, ["user_id"], max_group_rows, "event_deltas")
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        delta = np.empty(len(g), dtype="int64")
        delta[0] = -1
        delta[1:] = ts_us[1:] - ts_us[:-1]
        uid = g["user_id"].to_numpy()
        delta[np.r_[True, uid[1:] != uid[:-1]]] = -1  # first event per user
        return pd.DataFrame(
            {
                "event_id": g["event_id"].astype("int64").to_numpy(),
                "user_id": uid.astype("int64"),
                "since_prev_us": delta,
            }
        )

    return bucketed_group_agg(ds, ["user_id"], per_bucket, num_buckets=nb)


def _event_deltas_sliced(
    ds: ray.data.Dataset, slice_width: str, nb: int, max_group_rows: int
) -> ray.data.Dataset:
    from .shuffle import bucketed_group_agg

    width = pd.Timedelta(slice_width)

    def add_slice(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(_slice=b["ts"].dt.floor(width))

    sliced = ds.map_batches(add_slice, batch_format="pandas")

    def last_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["user_id", "_slice"], as_index=False)["ts"].max()

    def carry_final(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["user_id", "_slice"], as_index=False)["ts"].max()
        agg = agg.sort_values(["user_id", "_slice"], kind="stable")
        prev = agg.groupby("user_id", sort=False)["ts"].shift(1)
        take = prev.notna().to_numpy()
        return pd.DataFrame(
            {
                "user_id": agg["user_id"].to_numpy()[take],
                "_slice": agg["_slice"].to_numpy()[take],
                "prev_ts": prev.to_numpy()[take],
            }
        )

    carry = bucketed_group_agg(
        sliced,
        ["user_id"],
        carry_final,
        partial_fn=last_partial,
        num_buckets=min(nb, 64),
    )

    def carry_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": np.int64(-1),
                "user_id": b["user_id"].astype("int64"),
                "ts": pd.Series(b["prev_ts"].to_numpy()),
                "_slice": b["_slice"],
            }
        )

    full = sliced.union(carry.map_batches(carry_rows, batch_format="pandas"))

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        _guard_group_rows(g, ["user_id", "_slice"], max_group_rows, "event_deltas")
        # carry rows (event_id -1, ts = previous slice's last event) sort
        # BEFORE every real event of the group (their ts is strictly
        # smaller), so the shifted diff uses them as the predecessor of
        # the group's first event — then they are dropped from the output
        g = g.sort_values(["user_id", "_slice", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        sl = g["_slice"].to_numpy()
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        delta = np.empty(len(g), dtype="int64")
        delta[0] = -1
        delta[1:] = ts_us[1:] - ts_us[:-1]
        new_group = np.r_[True, (uid[1:] != uid[:-1]) | (sl[1:] != sl[:-1])]
        is_carry = (g["event_id"] == -1).to_numpy()
        # a group's first ROW: -1 unless it is a carry (then the next real
        # row correctly diffs against it)
        delta[new_group] = -1
        keep = ~is_carry
        return pd.DataFrame(
            {
                "event_id": g["event_id"].astype("int64").to_numpy()[keep],
                "user_id": uid.astype("int64")[keep],
                "since_prev_us": delta[keep],
            }
        )

    return bucketed_group_agg(full, ["user_id", "_slice"], per_group, num_buckets=nb)


# --- three-way broadcast join -------------------------------------------------

REVENUE_BY_NATION_SQL = """
SELECT n.n_name,
       CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS revenue_c,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


def revenue_by_nation(
    sf_dir: str, *, broadcast_threshold_bytes: int = BROADCAST_MAX_BYTES
) -> ray.data.Dataset:
    """orders ⋈ customer ⋈ nation → revenue per nation name: the
    multi-dimension star join. While customer fits the broadcast gate,
    both dimension hops are ONE composed lookup (custkey → nationkey →
    name built driver-side from the two small dims, shipped via ray.put
    once), so the fact table streams through a single map_batches with a
    per-batch partial aggregate — no shuffle of fact rows at all; the
    final groupby is ~25 nation rows. Past the gate (customer SCALES
    with the corpus) the custkey hop degrades to the bucketed tag-union
    hash join: customer ships thin (custkey, nationkey) rows and orders
    ship per-batch (custkey, rev, cnt) partials into shared key buckets,
    the per-bucket reduce attaches nationkey and pre-aggregates to the
    25-row nation domain — only the always-tiny nation name map ever
    broadcasts. Both paths produce identical output (forced in tests)."""
    nat = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nation_names = dict(zip(nat["n_nationkey"], nat["n_name"]))

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_name": b["n_name"],
                "revenue_c": b["revenue_c"].astype("int64"),
                "n_orders": b["n_orders"].astype("int64"),
            }
        )

    if _customer_small_enough(sf_dir, broadcast_threshold_bytes):
        cust = ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        ).to_pandas()
        keys = cust["c_custkey"].to_numpy()
        order = np.argsort(keys)
        # compose the two hops once: custkey -> nation NAME (object array)
        names = cust["c_nationkey"].map(nation_names).to_numpy(dtype=object)[order]
        ref = ray.put((keys[order], names))

        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            name = _lookup(ref, batch["o_custkey"].to_numpy())
            cents = np.floor(batch["o_totalprice"] * 100 + 0.5).astype("int64")
            g = (
                pd.DataFrame({"n_name": name, "price_c": cents})
                .groupby("n_name", as_index=False)
                .agg(p_rev=("price_c", "sum"), p_cnt=("price_c", "size"))
            )
            return g

        agg = (
            ds.map_batches(partial, batch_format="pandas")
            .groupby("n_name")
            .aggregate(
                Sum("p_rev", alias_name="revenue_c"),
                Sum("p_cnt", alias_name="n_orders"),
            )
        )
        return agg.map_batches(finalize, batch_format="pandas")

    # hash-join fallback: tag-union on custkey, nation attach in-bucket
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    def order_partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["o_totalprice"] * 100 + 0.5).astype("int64")
        g = (
            pd.DataFrame({"key": b["o_custkey"].astype("int64"), "rev": cents})
            .groupby("key", as_index=False)
            .agg(rev=("rev", "sum"), cnt=("rev", "size"))
        )
        return g.assign(nk=np.int64(-1)).astype(
            {"key": "int64", "rev": "int64", "cnt": "int64", "nk": "int64"}
        )

    cust_rows = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "key": b["c_custkey"].astype("int64"),
                "rev": np.int64(0),
                "cnt": np.int64(0),
                "nk": b["c_nationkey"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )
    names_ref = ray.put(nation_names)  # 25 rows — always broadcastable

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        nk = g.loc[g["nk"] >= 0].set_index("key")["nk"]
        facts = g.loc[g["nk"] < 0]
        nmap = ray.get(names_ref)
        name = facts["key"].map(nk).map(nmap)
        out = (
            pd.DataFrame({"n_name": name, "rev": facts["rev"], "cnt": facts["cnt"]})
            .groupby("n_name", as_index=False)
            .agg(revenue_c=("rev", "sum"), n_orders=("cnt", "sum"))
        )
        return out

    nb = scaled_num_buckets(
        input_bytes_estimate(
            f"{sf_dir}/orders.parquet", f"{sf_dir}/customer.parquet"
        )
    )
    partials = bucketed_group_agg(
        ds.map_batches(order_partial, batch_format="pandas").union(cust_rows),
        ["key"], attach, num_buckets=nb,
    )

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby("n_name", as_index=False).agg(
            revenue_c=("revenue_c", "sum"), n_orders=("n_orders", "sum")
        )
        return finalize(out)

    # nation domain is ~25 rows — one-task merge
    return partials.repartition(1).map_batches(merge, batch_format="pandas")


# --- daily active users ---------------------------------------------------------

DAILY_ACTIVE_USERS_SQL = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_events
FROM events
GROUP BY date_trunc('day', ts)
"""


def daily_active_users(sf_dir: str) -> ray.data.Dataset:
    """DAU: distinct active users + event volume per calendar day — the
    daily engagement roll-up. Exact distinct without shipping every event:
    the combiner dedupes (day, user) pairs per batch AND partial-sums the
    raw event count, so the shuffle carries at most one row per (day,
    user) per batch plus one count row; the per-day reduce nunique-counts
    users and sums events. Day cardinality is calendar-bounded, so the
    reduce is tiny regardless of corpus size."""
    from .shuffle import bucketed_group_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = b["ts"].dt.floor("D")
        f = pd.DataFrame({"day": day, "user_id": b["user_id"]})
        users = f.drop_duplicates().assign(n_events=np.int64(0))
        counts = (
            f.groupby("day", as_index=False)
            .size()
            .rename(columns={"size": "n_events"})
            .assign(user_id=np.int64(-1))  # ids are non-negative: count rows
        )
        return pd.concat([users, counts[["day", "user_id", "n_events"]]],
                         ignore_index=True)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        users = g.loc[g["user_id"] >= 0].groupby("day")["user_id"].nunique()
        events = g.loc[g["user_id"] < 0].groupby("day")["n_events"].sum()
        out = pd.DataFrame(
            {
                "day": users.index,
                "n_users": users.to_numpy().astype("int64"),
                "n_events": events.reindex(users.index).to_numpy().astype("int64"),
            }
        )
        out["day"] = out["day"].dt.strftime("%Y-%m-%d")
        return out.reset_index(drop=True)

    return bucketed_group_agg(ds.map_batches(partial, batch_format="pandas"),
                              ["day"], final, num_buckets=16)


# --- EXISTS semi-join: orders with returned items, by priority (Q4 shape) --------

PRIORITY_WITH_RETURNS_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def priority_with_returns(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q4 shape: orders having AT LEAST ONE qualifying lineitem
    (here: a returned item), counted per priority — the EXISTS semi-join,
    the one join flavor the suite didn't yet carry (anti-join's mirror).

    Same tag-union core as inactive_customers, inverted: the lineitem
    side pushes its predicate into the parquet read, per-batch-distincts
    its orderkeys (a returned order with 10^6 lines ships ONE row per
    batch), and the per-bucket reduce keeps order rows whose key saw any
    lineitem tag. Counts pre-aggregate per bucket; the final merge is one
    task over the 5-row priority domain."""
    import pyarrow.compute as pc

    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {"key": b["o_orderkey"].astype("int64"),
             "pri": b["o_orderpriority"], "_t": np.int64(0)}
        ),
        batch_format="pandas",
    )

    def li_partial(b: pd.DataFrame) -> pd.DataFrame:
        ks = b["l_orderkey"].drop_duplicates().astype("int64")
        return pd.DataFrame({"key": ks, "pri": "", "_t": np.int64(1)})

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey"],
        filter=pc.field("l_returnflag") == "R",
    ).map_batches(li_partial, batch_format="pandas")

    nb = scaled_num_buckets(
        input_bytes_estimate(f"{sf_dir}/orders.parquet",
                             f"{sf_dir}/lineitem.parquet")
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        has_ret = g.groupby("key")["_t"].transform("max") == 1
        kept = g.loc[(g["_t"] == 0) & has_ret]
        out = kept.groupby("pri", as_index=False).size()
        return out.rename(
            columns={"pri": "o_orderpriority", "size": "n_orders"}
        ).astype({"n_orders": "int64"})

    partials = bucketed_group_agg(
        orders.union(lineitem), ["key"], per_bucket, num_buckets=nb
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("o_orderpriority", as_index=False)["n_orders"].sum()
        return out.astype({"n_orders": "int64"})

    # priority domain is 5 values — one-task merge, no second all-to-all
    return partials.repartition(1).map_batches(
        merge, batch_format="pandas", batch_size=None
    )


# --- customer order-count distribution (TPC-H Q13 shape) -------------------------

ORDER_COUNT_DISTRIBUTION_SQL = """
WITH oc AS (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS order_count
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
)
SELECT order_count, CAST(count(*) AS BIGINT) AS n_customers
FROM oc GROUP BY order_count
"""


def order_count_distribution(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q13 shape: orders per customer INCLUDING zero-order customers
    (the left-outer-join semantics), folded into the distribution histogram
    (order_count → n_customers).

    No Dataset.join: both sides are tagged and hash-bucketed on the
    customer key (the sentinel-tag core shared with
    ops/shuffle.anti_join_ids, keeping counts instead of membership).
    Orders pre-aggregate per batch, so the shuffle carries (custkey,
    partial_count) int64 rows — never order payload; a customer row rides
    along as count 0 and left-outer semantics fall out of the tag. The
    per-bucket reduce emits partial histogram cells; a second tiny reduce
    on order_count (domain ≈ max orders per customer, calendar-bounded)
    finishes. Two thin int64 shuffles total."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {"key": b["c_custkey"].astype("int64"), "cnt": np.int64(0),
             "_t": np.int64(0)}
        ),
        batch_format="pandas",
    )

    def orders_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("o_custkey", as_index=False).size()
        return pd.DataFrame(
            {"key": g["o_custkey"].astype("int64"),
             "cnt": g["size"].astype("int64"), "_t": np.int64(1)}
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    ).map_batches(orders_partial, batch_format="pandas")

    nb = scaled_num_buckets(
        input_bytes_estimate(f"{sf_dir}/customer.parquet",
                             f"{sf_dir}/orders.parquet")
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # keep only keys present on the customer side (tag 0); an order
        # row with no customer (referential noise) must not invent one
        agg = g.groupby("key").agg(total=("cnt", "sum"), tmin=("_t", "min"))
        totals = agg.loc[agg["tmin"] == 0, "total"]
        h = totals.value_counts()
        return pd.DataFrame(
            {"order_count": h.index.to_numpy().astype("int64"),
             "n_customers": h.to_numpy().astype("int64")}
        )

    partial_hist = bucketed_group_agg(
        cust.union(orders), ["key"], per_bucket, num_buckets=nb
    )

    from .shuffle import histogram_merge

    return histogram_merge(partial_hist, "order_count", "n_customers")


# --- session length histogram -----------------------------------------------------

SESSION_LENGTH_HISTOGRAM_SQL = f"""
WITH sess AS ({SESSIONIZE_SQL})
SELECT n_events, CAST(count(*) AS BIGINT) AS n_sessions
FROM sess GROUP BY n_events
"""


def session_length_histogram(sf_dir: str) -> ray.data.Dataset:
    """Distribution of session lengths (events per session → session
    count) — the roll-up a sessionization pipeline actually publishes.
    Composes the sessionize operator (its keyed shuffle does the heavy
    lifting), then a per-batch value_counts combiner and one tiny reduce
    over the length domain (bounded by the longest session, not the
    corpus)."""
    sess = sessionize(sf_dir)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        h = b["n_events"].value_counts()
        return pd.DataFrame(
            {"n_events": h.index.to_numpy().astype("int64"),
             "n_sessions": h.to_numpy().astype("int64")}
        )

    from .shuffle import histogram_merge

    return histogram_merge(
        sess.map_batches(partial, batch_format="pandas"), "n_events", "n_sessions"
    )


# --- monthly revenue with trailing window ----------------------------------------

MONTHLY_REVENUE_MA_SQL = """
WITH m AS (
  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_c
  FROM orders GROUP BY 1
)
SELECT month, revenue_c,
       CAST(SUM(revenue_c) OVER (ORDER BY month
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS rev3_c
FROM m
"""


def monthly_revenue_ma(sf_dir: str) -> ray.data.Dataset:
    """Monthly revenue time-series with a 3-month trailing window sum —
    the aggregate-then-window family (window over an AGGREGATED series,
    unlike running_totals' window over raw rows). The distributed part is
    the per-month cent sum (per-batch combiner → tiny keyed reduce); the
    trailing window then runs over the month table, whose cardinality is
    calendar-bounded (decades → hundreds of rows), in ONE ordered task via
    repartition(1) — a deliberate, size-justified serialization, the same
    rationale as a driver-side collect but kept inside the Dataset. Sum
    (not mean) keeps it integer-exact."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
        f = pd.DataFrame(
            {"month": b["o_orderdate"].dt.strftime("%Y-%m"), "c": cents}
        )
        return f.groupby("month", as_index=False)["c"].sum()

    def merge_window(b: pd.DataFrame) -> pd.DataFrame:
        # merge the per-batch partials AND run the window in the same
        # one-task stage: partial cells are ≤ n_batches × n_months rows
        # (calendar-bounded), so a second all-to-all buys nothing
        b = b.groupby("month", as_index=False)["c"].sum()
        b = b.sort_values("month", kind="stable").reset_index(drop=True)
        rev = b["c"].to_numpy().astype("int64")
        rev3 = pd.Series(rev).rolling(3, min_periods=1).sum().to_numpy()
        return pd.DataFrame(
            {"month": b["month"], "revenue_c": rev,
             "rev3_c": rev3.astype("int64")}
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .repartition(1)
        .map_batches(merge_window, batch_format="pandas", batch_size=None)
    )


# --- semi-structured props extraction (JSON column) ------------------------------

JSON_PROPS_STATS_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
GROUP BY event_type
"""

# events.props is a flat JSON object with a numeric field — the common
# "properties bag" of product analytics logs. The extraction is a single
# compiled-regex vectorized pull of $.k (pandas str.extract, C path); a
# corpus with nested/escaped JSON would swap in a real parser actor here —
# the stage seam (per-batch extract feeding the same partial aggregate)
# does not change.
_PROPS_K_RE = r'"k"\s*:\s*(-?\d+)'


def json_props_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-event-type stats over a JSON property extracted from the props
    column — the semi-structured ingestion shape. Stateless vectorized
    extract + per-batch partial aggregate; the final groupby is one row
    per event type."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        k = b["props"].str.extract(_PROPS_K_RE, expand=False).astype("int64")
        return (
            pd.DataFrame({"event_type": b["event_type"], "k": k})
            .groupby("event_type", as_index=False)
            .agg(n=("k", "size"), s=("k", "sum"), mn=("k", "min"), mx=("k", "max"))
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("event_type", as_index=False).agg(
            n=("n", "sum"), s=("s", "sum"), mn=("mn", "min"), mx=("mx", "max")
        )
        return pd.DataFrame(
            {
                "event_type": s["event_type"],
                "n_events": s["n"].astype("int64"),
                "sum_k": s["s"].astype("int64"),
                "min_k": s["mn"].astype("int64"),
                "max_k": s["mx"].astype("int64"),
            }
        )

    from .shuffle import bucketed_group_agg

    return bucketed_group_agg(ds.map_batches(partial, batch_format="pandas"),
                              ["event_type"], final, num_buckets=4)


# --- exact statistical outliers (2-sigma rule in pure integer arithmetic) --------

# |x - mean| > 2*std, multiplied through by n^2 so no division or sqrt ever
# happens: (n*x_c - S)^2 > 4*(n*SS - S^2), with x_c integer cents,
# S = sum(x_c), SS = sum(x_c^2). Both engines evaluate the SAME integer
# predicate — bit-exact by construction (int128 in DuckDB, object->int64
# guarded in numpy; magnitudes here stay < 2^63).
VALUE_OUTLIERS_SQL = """
WITH c AS (
  SELECT event_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c
  FROM events
),
s AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(value_c) AS BIGINT) AS sv,
         CAST(SUM(value_c * value_c) AS BIGINT) AS ss
  FROM c GROUP BY event_type
)
SELECT c.event_id, c.event_type, c.value_c
FROM c JOIN s ON c.event_type = s.event_type
WHERE CAST(s.n * c.value_c - s.sv AS HUGEINT) * (s.n * c.value_c - s.sv)
      > 4 * (CAST(s.n AS HUGEINT) * s.ss - CAST(s.sv AS HUGEINT) * s.sv)
"""


def value_outliers(sf_dir: str) -> ray.data.Dataset:
    """Events whose value lies more than two standard deviations from
    their type's mean — the data-quality outlier flagging pass, computed
    EXACTLY: the 2σ test is multiplied through by n² into the integer
    predicate (n·x−S)² > 4·(n·SS−S²), so no mean, no division, no sqrt —
    and therefore no float drift between engines. Two streaming passes:
    pass 1 reduces (n, Σx, Σx²) per type through a per-batch combiner (a
    handful of rows — event-type domain is tiny), the moments broadcast,
    and pass 2 filters per batch with numpy object-int arithmetic (the
    squared terms exceed int64 at corpus scale; Python ints don't wrap)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )

    def moment_partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = np.floor(b["value"] * 100 + 0.5).astype("int64")
        f = pd.DataFrame({"event_type": b["event_type"], "v": vc, "v2": vc * vc})
        return f.groupby("event_type", as_index=False).agg(
            n=("v", "size"), sv=("v", "sum"), ss=("v2", "sum")
        )

    moments = (
        ds.map_batches(moment_partial, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"), Sum("sv", alias_name="sv"),
                   Sum("ss", alias_name="ss"))
        .to_pandas()
    )
    # exact per-type thresholds as arbitrary-precision ints (n*SS - S^2
    # reaches ~10^21 at 10^9 events — past int64, fine as Python ints)
    stats = {
        r.event_type: (int(r.n), int(r.sv), 4 * (int(r.n) * int(r.ss) - int(r.sv) ** 2))
        for r in moments.itertuples()
    }
    ref = ray.put(stats)

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(ref)
        vc = np.floor(b["value"] * 100 + 0.5).astype("int64")
        ns = np.empty(len(b), dtype=object)
        svs = np.empty(len(b), dtype=object)
        rhs = np.empty(len(b), dtype=object)
        types = b["event_type"].to_numpy()
        for t, (n, sv, r4) in st.items():
            m = types == t
            ns[m], svs[m], rhs[m] = n, sv, r4
        lhs = (ns * vc.astype(object) - svs) ** 2
        keep = lhs > rhs
        return pd.DataFrame(
            {
                "event_id": b.loc[keep, "event_id"].astype("int64"),
                # plain-str dtype: Ray's size estimator chokes on an EMPTY
                # object column (np.vectorize size-0), and no-outlier
                # batches are the common case
                "event_type": b.loc[keep, "event_type"].astype(str),
                "value_c": pd.Series(vc[keep.to_numpy()], index=b.index[keep]).astype("int64"),
            }
        )

    return ds.map_batches(flag, batch_format="pandas")


# --- sliding-window distinct: 7-day rolling active users -------------------------

WAU_WINDOW_DAYS = 7

WEEKLY_ACTIVE_USERS_SQL = f"""
WITH du AS (
  SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
),
bounds AS (
  SELECT min(date_trunc('day', ts)) AS d0, max(date_trunc('day', ts)) AS d1
  FROM events
),
win AS (
  SELECT du.user_id, du.day + to_days(CAST(o.o AS INTEGER)) AS window_day
  FROM du, LATERAL (
    SELECT UNNEST(generate_series(0, {WAU_WINDOW_DAYS - 1})) AS o
  ) o
),
agg AS (
  SELECT window_day, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
  FROM win GROUP BY window_day
)
SELECT strftime(a.window_day, '%Y-%m-%d') AS day, a.n_users
FROM agg a, bounds b
WHERE a.window_day <= b.d1
"""


def weekly_active_users(sf_dir: str) -> ray.data.Dataset:
    """Rolling 7-day active users per day — the sliding-window DISTINCT,
    which no per-window partial can merge (distinct is not decomposable
    across overlapping windows). The scale-safe shape: dedupe to (day,
    user) pairs per batch (the only corpus-sized reduction), explode each
    pair into the ≤7 window-days it serves — a bounded 7× blowup of the
    PAIR stream, not the event stream — then an exact distinct count in
    two bounded stages (VERDICT r4 #5): the bucketed reduce is keyed on
    the (day, user) PAIR, so one reduce task's frame holds pairs/N_buckets
    rows (byte-scaled), never a whole day's user set — it dedupes its
    complete pair groups and emits per-day partial counts; the per-day
    partials then merge in one task over a calendar-bounded domain
    (days × N_buckets rows). A day-keyed reduce would instead hand one
    task ~users-per-window rows (~10^9 at 100 TB). Days beyond the corpus
    max are trimmed with one scalar driver bound (calendar metadata, not
    data)."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    d1 = ds.map_batches(
        lambda b: pd.DataFrame({"mx": [b["ts"].dt.floor("D").max()]}),
        batch_format="pandas",
    ).max("mx")

    def explode_windows(b: pd.DataFrame) -> pd.DataFrame:
        pairs = pd.DataFrame(
            {"day": b["ts"].dt.floor("D"), "user_id": b["user_id"]}
        ).drop_duplicates()
        frames = []
        for o in range(WAU_WINDOW_DAYS):
            w = pairs["day"] + pd.Timedelta(days=o)
            keep = w <= d1
            frames.append(
                pd.DataFrame({"day": w[keep], "user_id": pairs["user_id"][keep]})
            )
        return pd.concat(frames, ignore_index=True).drop_duplicates()

    def pair_dedup_count(g: pd.DataFrame) -> pd.DataFrame:
        # complete (day, user) groups per bucket → local drop_duplicates
        # IS the exact global distinct; emit bounded per-day partials
        s = g.drop_duplicates(["day", "user_id"]).groupby("day").size()
        return pd.DataFrame(
            {
                "day": s.index.strftime("%Y-%m-%d"),
                "n": s.to_numpy().astype("int64"),
            }
        )

    nb = scaled_num_buckets(
        input_bytes_estimate(f"{sf_dir}/events.parquet") * WAU_WINDOW_DAYS
    )
    partials = bucketed_group_agg(
        ds.map_batches(explode_windows, batch_format="pandas"),
        ["day", "user_id"], pair_dedup_count, num_buckets=nb,
    )

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        s = b.groupby("day", as_index=False)["n"].sum()
        return pd.DataFrame(
            {"day": s["day"], "n_users": s["n"].astype("int64")}
        )

    return partials.repartition(1).map_batches(merge, batch_format="pandas")


# --- sliding (hopping) window aggregate -------------------------------------------

SLIDING_WINDOW_HOURS = 6  # window width; hop = 1 hour

SLIDING_WINDOW_COUNTS_SQL = f"""
SELECT e.event_type,
       strftime(date_trunc('hour', e.ts) - h.r * INTERVAL 1 HOUR,
                '%Y-%m-%d %H:%M:%S') AS window_start,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_value_c
FROM events e
CROSS JOIN (SELECT unnest(generate_series(0, {SLIDING_WINDOW_HOURS - 1})) AS r) h
GROUP BY 1, 2
"""


def sliding_window_counts(sf_dir: str) -> ray.data.Dataset:
    """Hopping-window aggregate: a 6-hour window sliding by 1 hour, per
    event_type — every event contributes to SIX overlapping windows (the
    streaming-window shape events_window's tumbling variant can't express;
    neither Ray Data nor the reference has event-time windows).

    Ray-Data-first decomposition: the window replication is a per-batch
    vectorized tile (numpy repeat of the hop offsets — no per-row Python,
    no join against a generate_series table), after which it is exactly
    events_window's partial → byte-scaled bucketed reduce, with the
    shuffle carrying per-(type, window) partial rows — the ×6 replication
    collapses inside the batch before anything moves. Boundary windows
    (the width-1 partial windows before the first full hour) are kept,
    matching the CROSS JOIN oracle exactly."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    K = SLIDING_WINDOW_HOURS

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        w0 = batch["ts"].dt.floor("h").to_numpy()
        cents = np.floor(batch["value"].to_numpy() * 100 + 0.5).astype("int64")
        hops = np.repeat(np.arange(K, dtype="int64"), n)
        ws = np.tile(w0, K) - hops * np.timedelta64(1, "h")
        g = (
            pd.DataFrame(
                {
                    "event_type": np.tile(batch["event_type"].to_numpy(), K),
                    "window_start": pd.Series(ws).dt.strftime("%Y-%m-%d %H:%M:%S"),
                    "value_c": np.tile(cents, K),
                }
            )
            .groupby(["event_type", "window_start"], as_index=False)
            .agg(p_cnt=("value_c", "size"), p_sum=("value_c", "sum"))
        )
        return g

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["event_type", "window_start"], as_index=False).agg(
            n_events=("p_cnt", "sum"), sum_value_c=("p_sum", "sum")
        )
        return out.astype({"n_events": "int64", "sum_value_c": "int64"})

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )
    nb = scaled_num_buckets(
        input_bytes_estimate(f"{sf_dir}/events.parquet") * K
    )
    return bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type", "window_start"], final, num_buckets=nb,
    )


# --- Bloom-pushdown semi-join ------------------------------------------------------

BLOOM_JOIN_BITS = 1 << 23  # 1 MiB packed — sized for ~10^6 build keys at k=4
BLOOM_JOIN_K = 4
# ray.put cost of the dense bitset; past this the build side is too big for
# a driver-resident bloom — raise loudly (the knn_graph contract) and point
# at the pure tag-union join which needs no broadcast at all.
BLOOM_JOIN_MAX_BITS = 1 << 33  # 1 GiB packed

BLOOM_SEMI_JOIN_SQL = """
SELECT l.l_returnflag,
       CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                AS BIGINT)) AS BIGINT) AS revenue_c,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_orderkey = l.l_orderkey
                AND o.o_orderpriority = '1-URGENT')
GROUP BY l.l_returnflag
"""

_BLOOM_JOIN_SEEDS = np.uint64(
    [0x243F6A8885A308D3, 0x13198A2E03707344, 0xA4093822299F31D0,
     0x082EFA98EC4E6C89]
)


def bloom_semi_join(
    sf_dir: str, *, bloom_bits: int = BLOOM_JOIN_BITS, bloom_k: int = BLOOM_JOIN_K,
    verify: str = "auto",
) -> ray.data.Dataset:
    """Semi-join with a Bloom-filter pushdown: revenue of lineitems whose
    order is URGENT, where the fact scan is pre-filtered by a compact
    Bloom bitset of the qualifying orderkeys BEFORE anything shuffles —
    the classic distributed runtime-filter join (Spark/Impala/Presto all
    ship it; Ray Data has no runtime filters).

    Three stages, all bounded:
      1. build — qualifying orderkeys (predicate pushed into the read)
         hash into sparse (word, bits) rows per batch; a bucketed OR-
         reduce merges them. The driver then densifies AT MOST
         bloom_bits/64 words (bounded by the FILTER size, never by build
         cardinality) and ships ONE ray.put bitset. A build side that
         needs more than BLOOM_JOIN_MAX_BITS raises loudly.
      2. probe — each fact batch tests membership with k vectorized
         splitmix64 probes and drops non-members immediately: the ×(1/σ)
         bulk of the fact table never leaves the scan stage (no false
         negatives, so nothing true is lost).
      3. verify — Bloom false positives are removed EXACTLY. When the
         build-side dimension passes the broadcast gate (the
         _customer_small_enough convention), the exact orderkey set ships
         once via ray.put and membership is a vectorized searchsorted
         inside the SAME probe map — zero shuffles end-to-end. Past the
         gate (``verify="shuffle"`` forces it; tests do), the tag-union
         semi-join (priority_with_returns' core) runs over the surviving
         thin rows only. Either way the output is bit-exact vs the
         oracle at ANY bloom_bits (tested down to 64 bits where almost
         everything is a false positive).
    """
    from .dedup import _splitmix64
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    import pyarrow.compute as pc

    if bloom_bits > BLOOM_JOIN_MAX_BITS:
        raise ValueError(
            f"bloom_bits={bloom_bits} exceeds BLOOM_JOIN_MAX_BITS "
            f"({BLOOM_JOIN_MAX_BITS}): a driver-resident runtime filter "
            "must stay object-store-small — use the pure tag-union join "
            "(relational.priority_with_returns shape) instead"
        )
    m = np.uint64(bloom_bits)
    seeds = _BLOOM_JOIN_SEEDS[:bloom_k]
    ord_path = f"{sf_dir}/orders.parquet"
    li_path = f"{sf_dir}/lineitem.parquet"

    use_broadcast = verify == "auto" and input_bytes_estimate(
        ord_path
    ) <= BROADCAST_MAX_BYTES

    def build_partial(b: pd.DataFrame) -> pd.DataFrame:
        ks = b["o_orderkey"].drop_duplicates().to_numpy(dtype="uint64")
        p = _splitmix64(ks[None, :] ^ seeds[:, None]).ravel() % m
        part = pd.DataFrame(
            {
                "word": (p >> np.uint64(6)).astype("int64"),
                "bits": np.uint64(1) << (p & np.uint64(63)),
            }
        )
        return part.groupby("word", as_index=False)["bits"].agg(
            np.bitwise_or.reduce
        )

    exact = None
    if use_broadcast:
        # broadcast mode: the build side passed the gate, so ONE read
        # yields the exact key set AND the bitset (built driver-side with
        # the identical splitmix64 probes) — no build pipeline at all
        exact = np.sort(
            ray.data.read_parquet(
                ord_path,
                columns=["o_orderkey"],
                filter=pc.field("o_orderpriority") == "1-URGENT",
            ).to_pandas()["o_orderkey"].to_numpy(dtype="int64")
        )
        pos = _splitmix64(
            exact.astype("uint64")[None, :] ^ seeds[:, None]
        ).ravel() % m
        dense = np.zeros(bloom_bits >> 6, dtype="uint64")
        np.bitwise_or.at(
            dense, (pos >> np.uint64(6)).astype("int64"),
            np.uint64(1) << (pos & np.uint64(63)),
        )
    else:
        build = ray.data.read_parquet(
            ord_path,
            columns=["o_orderkey"],
            filter=pc.field("o_orderpriority") == "1-URGENT",
        ).map_batches(build_partial, batch_format="pandas")

        def or_words(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby("word", as_index=False)["bits"].agg(
                np.bitwise_or.reduce
            )
            return out.astype({"word": "int64"})

        # word domain ≤ bloom_bits/64 (131k at the default) and per-batch
        # partials are already OR-collapsed — one merge task beats a
        # bucketed exchange (the per-shuffle fixed-tax lesson, TODO #3)
        sparse = (
            build.repartition(1)
            .map_batches(or_words, batch_format="pandas", batch_size=None)
            .to_pandas()
        )
        dense = np.zeros(bloom_bits >> 6, dtype="uint64")
        dense[sparse["word"].to_numpy()] = sparse["bits"].to_numpy(dtype="uint64")
    bloom_ref = ray.put(dense)

    def probe(b: pd.DataFrame) -> pd.DataFrame:
        bits = ray.get(bloom_ref)
        ks = b["l_orderkey"].to_numpy(dtype="uint64")
        hit = np.ones(len(ks), dtype=bool)
        for s in seeds:
            p = _splitmix64(ks ^ s) % m
            hit &= (bits[(p >> np.uint64(6)).astype("int64")]
                    >> (p & np.uint64(63))) & np.uint64(1) == 1
        kept = b.loc[hit]
        cents = np.floor(
            kept["l_extendedprice"].to_numpy()
            * (1 - kept["l_discount"].to_numpy()) * 100 + 0.5
        ).astype("int64")
        return pd.DataFrame(
            {
                "key": kept["l_orderkey"].to_numpy().astype("int64"),
                "flag": kept["l_returnflag"].to_numpy(),
                "cents": cents,
                "_t": np.int64(1),
            }
        )

    fact = ray.data.read_parquet(
        li_path, columns=["l_orderkey", "l_extendedprice", "l_discount",
                          "l_returnflag"]
    )

    if use_broadcast:
        exact_ref = ray.put(exact)

        def probe_exact(b: pd.DataFrame) -> pd.DataFrame:
            t = probe(b)  # bloom pass first — the scan-reduction layer
            keys = ray.get(exact_ref)
            pos = np.searchsorted(keys, t["key"].to_numpy())
            ok = (pos < len(keys)) & (keys[np.minimum(pos, len(keys) - 1)]
                                      == t["key"].to_numpy())
            kept = t.loc[ok]
            out = kept.groupby("flag", as_index=False).agg(
                revenue_c=("cents", "sum"), n_lines=("cents", "size")
            )
            return out.rename(columns={"flag": "l_returnflag"}).astype(
                {"revenue_c": "int64", "n_lines": "int64"}
            )

        partials = fact.map_batches(probe_exact, batch_format="pandas")

        def merge(b: pd.DataFrame) -> pd.DataFrame:
            out = b.groupby("l_returnflag", as_index=False).agg(
                revenue_c=("revenue_c", "sum"), n_lines=("n_lines", "sum")
            )
            return out.astype({"revenue_c": "int64", "n_lines": "int64"})

        return partials.repartition(1).map_batches(merge, batch_format="pandas")

    survivors = fact.map_batches(probe, batch_format="pandas")

    def order_tags(b: pd.DataFrame) -> pd.DataFrame:
        ks = b["o_orderkey"].drop_duplicates().astype("int64")
        return pd.DataFrame(
            {"key": ks, "flag": "", "cents": np.int64(0), "_t": np.int64(0)}
        )

    tags = ray.data.read_parquet(
        ord_path,
        columns=["o_orderkey"],
        filter=pc.field("o_orderpriority") == "1-URGENT",
    ).map_batches(order_tags, batch_format="pandas")

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        is_true = g.groupby("key")["_t"].transform("min") == 0
        kept = g.loc[(g["_t"] == 1) & is_true]
        if kept.empty:
            return pd.DataFrame(
                {"l_returnflag": pd.Series([], dtype=object),
                 "revenue_c": pd.Series([], dtype="int64"),
                 "n_lines": pd.Series([], dtype="int64")}
            )
        out = kept.groupby("flag", as_index=False).agg(
            revenue_c=("cents", "sum"), n_lines=("cents", "size")
        )
        return out.rename(columns={"flag": "l_returnflag"}).astype(
            {"revenue_c": "int64", "n_lines": "int64"}
        )

    nb = scaled_num_buckets(input_bytes_estimate(li_path))
    partials = bucketed_group_agg(
        survivors.union(tags), ["key"], verify, num_buckets=nb
    )

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby("l_returnflag", as_index=False).agg(
            revenue_c=("revenue_c", "sum"), n_lines=("n_lines", "sum")
        )
        return out.astype({"revenue_c": "int64", "n_lines": "int64"})

    return partials.repartition(1).map_batches(merge, batch_format="pandas")


# --- first-touch attribution -----------------------------------------------------

FIRST_TOUCH_ATTRIBUTION_SQL = """
WITH conv AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
firsts AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT f.event_type AS first_touch, CAST(count(*) AS BIGINT) AS n_users
FROM firsts f JOIN conv c ON f.user_id = c.user_id
WHERE f.rn = 1
GROUP BY f.event_type
"""


def first_touch_attribution(sf_dir: str) -> ray.data.Dataset:
    """Marketing first-touch attribution: for every CONVERTING user (one
    with ≥1 'purchase' event), which event type opened their history —
    the per-entity argmin + converter semi-join shape. The per-batch
    combiner collapses each user to ONE candidate row (batch-local first
    event by (ts, event_id) plus a batch-local converted flag), so the
    user-bucketed shuffle carries ≤ one row per (user, batch), never raw
    events; each bucket then resolves the global first + converted flag
    per user with two vectorized groupbys and emits per-type partial
    counts — the final groupby is |event types| rows."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    ev_path = f"{sf_dir}/events.parquet"
    ds = ray.data.read_parquet(
        ev_path, columns=["user_id", "ts", "event_id", "event_type"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        firsts = b.sort_values(["user_id", "ts", "event_id"]).drop_duplicates(
            "user_id"
        )[["user_id", "ts", "event_id", "event_type"]]
        conv = (
            b.assign(conv=(b["event_type"] == "purchase").astype("int8"))
            .groupby("user_id", as_index=False)["conv"].max()
        )
        return firsts.merge(conv, on="user_id")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        firsts = g.sort_values(["user_id", "ts", "event_id"]).drop_duplicates(
            "user_id"
        )
        conv = g.groupby("user_id", as_index=False)["conv"].max()
        f = firsts.drop(columns=["conv"]).merge(conv, on="user_id")
        f = f.loc[f["conv"] == 1]
        out = (
            f.groupby("event_type", as_index=False).size()
            .rename(columns={"event_type": "first_touch", "size": "p_users"})
        )
        out["p_users"] = out["p_users"].astype("int64")
        return out

    nb = scaled_num_buckets(input_bytes_estimate(ev_path))
    partials = bucketed_group_agg(
        ds, ["user_id"], per_bucket, partial_fn=partial, num_buckets=nb
    )
    agg = partials.groupby("first_touch").aggregate(
        Sum("p_users", alias_name="n_users")
    )
    return agg.map_batches(
        lambda b: pd.DataFrame(
            {"first_touch": b["first_touch"],
             "n_users": b["n_users"].astype("int64")}
        ),
        batch_format="pandas",
    )


# --- event-type transition counts (Markov behavior model) ------------------------

EVENT_TRANSITIONS_SQL = """
WITH s AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT prev AS from_type, event_type AS to_type, CAST(count(*) AS BIGINT) AS n_pairs
FROM s WHERE prev IS NOT NULL
GROUP BY prev, event_type
"""


def event_transitions(
    sf_dir: str,
    *,
    slice_width: str | None = None,
    max_group_rows: int = DEFAULT_MAX_GROUP_ROWS,
) -> ray.data.Dataset:
    """First-order Markov transition counts over per-user event streams:
    for every consecutive (by ts, event_id) pair of events of one user,
    count (from_type → to_type) — the behavior-model / session-language
    statistic (and the LAG window shape reduced to a bounded output:
    |event types|² rows, so the final aggregate is tiny no matter the
    corpus). Default path: one bucketed shuffle on user_id, per-bucket
    vectorized sort + shift; single-key guard raises past
    ``max_group_rows`` pointing at ``slice_width``.

    slice_width (or "auto"): the skew-proof path. Transitions inside a
    (user, time-slice) group are local; the ONLY cross-slice pair is
    (last event of a user's slice → first event of the user's next
    non-empty slice). Each user-slice contributes exactly two boundary
    rows (its min and max event), so the stitching reduce is bounded by
    the calendar — slices are disjoint ts ranges, hence equal-ts ties
    never straddle an edge and the (ts, event_id) order stays exact."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )
    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/events.parquet"))
    slice_width = _resolve_slice_width(slice_width, sf_dir, max_group_rows)

    def pair_counts(g: pd.DataFrame, group_cols: list) -> pd.DataFrame:
        """Vectorized consecutive-pair counts within each group of the
        (already sorted) frame."""
        if len(g) < 2:
            return pd.DataFrame(
                {"from_type": pd.Series(dtype="object"),
                 "to_type": pd.Series(dtype="object"),
                 "pn": pd.Series(dtype="int64")}
            )
        same = np.ones(len(g) - 1, dtype=bool)
        for c in group_cols:
            v = g[c].to_numpy()
            same &= v[1:] == v[:-1]
        et = g["event_type"].to_numpy()
        f = pd.DataFrame({"from_type": et[:-1][same], "to_type": et[1:][same]})
        out = f.groupby(["from_type", "to_type"], as_index=False).size()
        return out.rename(columns={"size": "pn"}).astype({"pn": "int64"})

    if slice_width is None:
        def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
            _guard_group_rows(g, ["user_id"], max_group_rows, "event_transitions")
            g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
            return pair_counts(g, ["user_id"])

        partials = bucketed_group_agg(ds, ["user_id"], per_bucket, num_buckets=nb)
    else:
        width = pd.Timedelta(slice_width)

        def add_slice(b: pd.DataFrame) -> pd.DataFrame:
            return b.assign(_slice=b["ts"].dt.floor(width))

        sliced = ds.map_batches(add_slice, batch_format="pandas")

        def local_pairs(g: pd.DataFrame) -> pd.DataFrame:
            _guard_group_rows(
                g, ["user_id", "_slice"], max_group_rows, "event_transitions"
            )
            g = g.sort_values(["user_id", "_slice", "ts", "event_id"], kind="stable")
            return pair_counts(g, ["user_id", "_slice"])

        local = bucketed_group_agg(
            sliced, ["user_id", "_slice"], local_pairs, num_buckets=nb
        )

        def boundary_partial(b: pd.DataFrame) -> pd.DataFrame:
            # per (user, slice): the batch-local min and max event rows
            s = b.sort_values(["user_id", "_slice", "ts", "event_id"], kind="stable")
            first = s.drop_duplicates(["user_id", "_slice"], keep="first")
            last = s.drop_duplicates(["user_id", "_slice"], keep="last")
            return pd.concat([first, last], ignore_index=True)[
                ["user_id", "_slice", "ts", "event_id", "event_type"]
            ]

        def edge_pairs(g: pd.DataFrame) -> pd.DataFrame:
            # g holds ≤ 2 boundary rows per (user, slice, input batch);
            # re-reduce to the true per-slice first/last, then pair each
            # slice's LAST with the next slice's FIRST per user
            s = g.sort_values(["user_id", "_slice", "ts", "event_id"], kind="stable")
            first = s.drop_duplicates(["user_id", "_slice"], keep="first")
            last = s.drop_duplicates(["user_id", "_slice"], keep="last")
            uid = last["user_id"].to_numpy()
            same_user = uid[:-1] == uid[1:]
            f = pd.DataFrame(
                {
                    "from_type": last["event_type"].to_numpy()[:-1][same_user],
                    "to_type": first["event_type"].to_numpy()[1:][same_user],
                }
            )
            out = f.groupby(["from_type", "to_type"], as_index=False).size()
            return out.rename(columns={"size": "pn"}).astype({"pn": "int64"})

        edges = bucketed_group_agg(
            sliced,
            ["user_id"],
            edge_pairs,
            partial_fn=boundary_partial,
            num_buckets=min(nb, 64),
        )
        partials = local.union(edges)

    agg = partials.groupby(["from_type", "to_type"]).aggregate(
        Sum("pn", alias_name="n_pairs")
    )
    return agg.map_batches(
        lambda b: pd.DataFrame(
            {
                "from_type": b["from_type"],
                "to_type": b["to_type"],
                "n_pairs": b["n_pairs"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )


# --- referential-integrity audit (full outer join shape) -------------------------

ORPHAN_AUDIT_SQL = """
WITH oc AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY o_custkey
)
SELECT
  CAST(count(*) FILTER (c.c_custkey IS NOT NULL AND oc.o_custkey IS NOT NULL)
    AS BIGINT) AS n_matched_customers,
  CAST(count(*) FILTER (oc.o_custkey IS NULL) AS BIGINT) AS n_customers_no_orders,
  CAST(COALESCE(SUM(oc.n) FILTER (c.c_custkey IS NULL), 0) AS BIGINT)
    AS n_orphan_orders
FROM customer c FULL OUTER JOIN oc ON c.c_custkey = oc.o_custkey
"""


def orphan_audit(sf_dir: str) -> ray.data.Dataset:
    """Referential-integrity audit — the FULL OUTER JOIN shape: customers
    matched by ≥1 order, customers with no orders, and order rows whose
    custkey has no customer (asserting the last is ZERO is the audit's
    point). Both sides collapse to per-key partials before the shuffle
    (customer → presence row, orders → per-batch counts), ride ONE
    bucketed tag-union on custkey — the same sentinel-tag machinery as
    anti_join — and each bucket emits three partial counters; the final
    reduce is a 3-int sum."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    nb = scaled_num_buckets(
        input_bytes_estimate(f"{sf_dir}/orders.parquet", f"{sf_dir}/customer.parquet")
    )

    def tag_cust(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"k": b["c_custkey"].astype("int64"), "n": np.int64(-1)}
        )

    def tag_orders(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("o_custkey", as_index=False).size()
        return pd.DataFrame(
            {"k": g["o_custkey"].astype("int64"), "n": g["size"].astype("int64")}
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized two-sided membership — never a per-key Python agg
        cust_keys = pd.Index(g.loc[g["n"] < 0, "k"].unique())
        ord_side = g.loc[g["n"] >= 0]
        ord_counts = ord_side.groupby("k")["n"].sum()
        in_cust = ord_counts.index.isin(cust_keys)
        matched = int(in_cust.sum())
        no_orders = int(len(cust_keys)) - int(cust_keys.isin(ord_counts.index).sum())
        orphans = int(ord_counts[~in_cust].sum())
        return pd.DataFrame(
            {"p_m": [matched], "p_no": [no_orders], "p_or": [orphans]}
        ).astype("int64")

    partials = bucketed_group_agg(
        cust.map_batches(tag_cust, batch_format="pandas").union(
            orders.map_batches(tag_orders, batch_format="pandas")
        ),
        ["k"], per_bucket, num_buckets=nb,
    )

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_matched_customers": [int(b["p_m"].sum())],
                "n_customers_no_orders": [int(b["p_no"].sum())],
                "n_orphan_orders": [int(b["p_or"].sum())],
            }
        ).astype("int64")

    return partials.repartition(1).map_batches(
        merge, batch_format="pandas", batch_size=None
    )


# --- time-to-conversion distribution ----------------------------------------------

TIME_TO_PURCHASE_SQL = """
WITH f AS (
  SELECT user_id,
         MIN(ts) AS first_ts,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events GROUP BY user_id
)
SELECT CAST(date_diff('day', first_ts, first_purchase) AS BIGINT) AS days_to_purchase,
       CAST(count(*) AS BIGINT) AS n_users
FROM f WHERE first_purchase IS NOT NULL
GROUP BY date_diff('day', first_ts, first_purchase)
"""


def time_to_purchase(sf_dir: str) -> ray.data.Dataset:
    """Time-to-conversion distribution: for every converting user, whole
    days between their FIRST event and FIRST purchase, histogrammed — the
    activation-latency funnel metric. Dual per-entity argmin: per-batch
    combiners emit one (user, min_ts, min_purchase_ts) row each, the
    user-bucketed reduce resolves the global pair, and the output domain
    is calendar-bounded days — a tiny histogram_merge finish, never a
    high-cardinality groupby."""
    from .shuffle import (
        bucketed_group_agg,
        histogram_merge,
        input_bytes_estimate,
        scaled_num_buckets,
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/events.parquet"))
    _SENTINEL = pd.Timestamp("2262-01-01")  # > any event ts, < pandas max

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        p_ts = b["ts"].where(b["event_type"] == "purchase", _SENTINEL)
        f = pd.DataFrame({"user_id": b["user_id"], "t": b["ts"], "p": p_ts})
        return f.groupby("user_id", as_index=False).agg(
            t=("t", "min"), p=("p", "min")
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("user_id", as_index=False).agg(t=("t", "min"), p=("p", "min"))
        a = a.loc[a["p"] < _SENTINEL]
        # DuckDB date_diff('day') counts CALENDAR-day boundaries crossed,
        # not 24 h periods — normalize both stamps to dates first
        days = (
            a["p"].dt.normalize() - a["t"].dt.normalize()
        ).dt.days.astype("int64")
        s = days.value_counts()
        return pd.DataFrame(
            {"days_to_purchase": s.index.astype("int64"),
             "c": s.to_numpy().astype("int64")}
        )

    partials = bucketed_group_agg(ds, ["user_id"], per_bucket, partial_fn=partial,
                                  num_buckets=nb)
    out = histogram_merge(partials, "days_to_purchase", "c")
    return out.map_batches(
        lambda b: pd.DataFrame(
            {"days_to_purchase": b["days_to_purchase"].astype("int64"),
             "n_users": b["c"].astype("int64")}
        ),
        batch_format="pandas",
    )


# --- PIVOT: per-user event-type count matrix --------------------------------------

USER_EVENT_PIVOT_SQL = """
SELECT user_id,
       CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
       CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error
FROM events GROUP BY user_id
"""

_PIVOT_TYPES = ("click", "view", "purchase", "signup", "error")


def user_event_pivot(sf_dir: str) -> ray.data.Dataset:
    """PIVOT: the per-user event-type count matrix (long → wide), the
    feature-vector layout a model-training join consumes. The pivoted
    column set is the bounded event-type taxonomy — fixed at plan time,
    never data-dependent (a data-dependent pivot must enumerate its
    columns in a tiny pre-pass first). Per-batch combiners emit already-
    wide partial rows, so the single user-bucketed shuffle carries one
    int64 row per (user, batch) and the reduce is a vectorized sum."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    cols = [f"n_{t}" for t in _PIVOT_TYPES]
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/events.parquet"))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        et = b["event_type"].to_numpy()
        f = pd.DataFrame({"user_id": b["user_id"].astype("int64")})
        for t, c in zip(_PIVOT_TYPES, cols):
            f[c] = (et == t).astype("int64")
        return f.groupby("user_id", as_index=False)[cols].sum()

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("user_id", as_index=False)[cols].sum()
        return out.astype({c: "int64" for c in ["user_id", *cols]})

    return bucketed_group_agg(ds, ["user_id"], per_bucket, partial_fn=partial,
                              num_buckets=nb)


# --- windowed COUNT DISTINCT: unique users per hopping window ---------------------

SLIDING_UNIQUE_USERS_SQL = f"""
SELECT strftime(date_trunc('hour', e.ts) - h.r * INTERVAL 1 HOUR,
                '%Y-%m-%d %H:%M:%S') AS window_start,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM events e
CROSS JOIN (SELECT unnest(generate_series(0, {SLIDING_WINDOW_HOURS - 1})) AS r) h
GROUP BY 1
"""


def sliding_unique_users(sf_dir: str) -> ray.data.Dataset:
    """Windowed COUNT DISTINCT: unique users per 6-hour hopping window
    (1-hour hop) — the concurrency/MAU-style metric sliding_window_counts'
    additive sums cannot express (distinct is not a sum). Hot-window-safe
    decomposition (weekly_active_users' pattern applied from the start):
    the per-batch tile replicates each event to its 6 windows and
    IMMEDIATELY collapses to distinct (window, user) pairs; the bucketed
    shuffle is keyed on the PAIR, so even a window holding 10^9 users
    spreads across tasks (no reduce frame ever holds one window's whole
    user set); each pair bucket dedups exactly and emits per-window
    partial counts, and the calendar-bounded window domain merges in one
    histogram task."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/events.parquet"))

    def tile(b: pd.DataFrame) -> pd.DataFrame:
        base = b["ts"].dt.floor("h")
        n = len(b)
        k = SLIDING_WINDOW_HOURS
        starts = (
            base.to_numpy().repeat(k)
            - np.tile(np.arange(k, dtype="timedelta64[h]"), n)
        )
        f = pd.DataFrame(
            {"window_start": starts,
             "user_id": b["user_id"].to_numpy().repeat(k)}
        )
        return f.drop_duplicates()

    def pair_counts(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["window_start", "user_id"])
        s = d.groupby("window_start").size()
        return pd.DataFrame(
            {"window_start": s.index, "c": s.to_numpy().astype("int64")}
        )

    partials = bucketed_group_agg(
        ds.map_batches(tile, batch_format="pandas"),
        ["window_start", "user_id"], pair_counts, num_buckets=nb,
    )

    # calendar-bounded window domain: one-task merge (histogram_merge's
    # shape, inlined because its int64 key cast rejects datetimes)
    def merge(b: pd.DataFrame) -> pd.DataFrame:
        s = b.groupby("window_start", as_index=False)["c"].sum()
        return pd.DataFrame(
            {
                "window_start": s["window_start"].dt.strftime("%Y-%m-%d %H:%M:%S"),
                "n_users": s["c"].astype("int64"),
            }
        )

    return partials.repartition(1).map_batches(
        merge, batch_format="pandas", batch_size=None
    )


# --- second-order paths: consecutive event-type trigrams per user ----------------

EVENT_TRIGRAMS_SQL = """
WITH seq AS (
  SELECT event_type AS e1,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n_paths
FROM seq WHERE e3 IS NOT NULL
GROUP BY e1, e2, e3
"""


def event_trigrams(
    sf_dir: str,
    *,
    slice_width: str | None = None,
    max_group_rows: int = DEFAULT_MAX_GROUP_ROWS,
) -> ray.data.Dataset:
    """Second-order path counts over per-user event streams: every three
    CONSECUTIVE (by ts, event_id) events of one user contribute one
    (e1, e2, e3) trigram — event_transitions' Markov model one order up,
    with the same bounded output (|event types|³ rows). Default path:
    one bucketed shuffle on user_id, per-bucket vectorized sort + double
    shift; the single-key guard raises past ``max_group_rows``.

    slice_width (or "auto"): the skew-proof path. Trigrams fully inside a
    (user, time-slice) group are counted locally. A cross-slice trigram
    can only use events within distance 2 of a slice edge, i.e. each
    slice's global FIRST-2 / LAST-2 events — per-batch partials emit
    those candidates (a batch-local top-2 always contains the global
    top-2) plus per-slice counts, so the per-user stitch frame is ≤ 4
    rows per non-empty slice (calendar-bounded, hot-user-safe). Within a
    slice the kept rows are positions {0, 1, n-2, n-1}: when n ≤ 4 they
    are ALL the slice's events (every adjacent link consecutive); when
    n > 4 exactly the link between kept positions 1 and 2 is
    non-consecutive. Adjacent kept rows across a slice boundary are
    always consecutive (any event between them would be a kept row of an
    intermediate slice). Triples over the kept sequence with both links
    consecutive, minus the all-one-slice ones already counted locally,
    are exactly the cross-slice trigrams."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )
    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/events.parquet"))
    slice_width = _resolve_slice_width(slice_width, sf_dir, max_group_rows)

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {"e1": pd.Series(dtype="object"), "e2": pd.Series(dtype="object"),
             "e3": pd.Series(dtype="object"), "tn": pd.Series(dtype="int64")}
        )

    def triple_counts(g: pd.DataFrame, group_cols: list) -> pd.DataFrame:
        if len(g) < 3:
            return _empty()
        same = np.ones(len(g) - 2, dtype=bool)
        for c in group_cols:
            v = g[c].to_numpy()
            same &= (v[2:] == v[1:-1]) & (v[1:-1] == v[:-2])
        et = g["event_type"].to_numpy()
        f = pd.DataFrame(
            {"e1": et[:-2][same], "e2": et[1:-1][same], "e3": et[2:][same]}
        )
        out = f.groupby(["e1", "e2", "e3"], as_index=False).size()
        return out.rename(columns={"size": "tn"}).astype({"tn": "int64"})

    if slice_width is None:
        def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
            _guard_group_rows(g, ["user_id"], max_group_rows, "event_trigrams")
            g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
            return triple_counts(g, ["user_id"])

        partials = bucketed_group_agg(ds, ["user_id"], per_bucket, num_buckets=nb)
    else:
        width = pd.Timedelta(slice_width)

        def add_slice(b: pd.DataFrame) -> pd.DataFrame:
            return b.assign(_slice=b["ts"].dt.floor(width))

        sliced = ds.map_batches(add_slice, batch_format="pandas")

        def local_triples(g: pd.DataFrame) -> pd.DataFrame:
            _guard_group_rows(
                g, ["user_id", "_slice"], max_group_rows, "event_trigrams"
            )
            g = g.sort_values(["user_id", "_slice", "ts", "event_id"], kind="stable")
            return triple_counts(g, ["user_id", "_slice"])

        local = bucketed_group_agg(
            sliced, ["user_id", "_slice"], local_triples, num_buckets=nb
        )

        def boundary_partial(b: pd.DataFrame) -> pd.DataFrame:
            # per (user, slice): batch-local first-2/last-2 candidate rows
            # (cnt = 0) + one per-slice batch-count row (cnt = rows seen)
            s = b.sort_values(["user_id", "_slice", "ts", "event_id"], kind="stable")
            grp = s.groupby(["user_id", "_slice"], sort=False)
            rs = grp.cumcount().to_numpy()
            re_ = grp.cumcount(ascending=False).to_numpy()
            cand = s.loc[(rs < 2) | (re_ < 2)].copy()
            cand["cnt"] = np.int64(0)
            counts = grp.size().reset_index().rename(columns={0: "cnt"})
            counts["ts"] = pd.Timestamp(0)
            counts["event_id"] = np.int64(-1)
            counts["event_type"] = ""
            cols = ["user_id", "_slice", "ts", "event_id", "event_type", "cnt"]
            return pd.concat([cand[cols], counts[cols]], ignore_index=True).astype(
                {"cnt": "int64"}
            )

        def edge_triples(g: pd.DataFrame) -> pd.DataFrame:
            # complete per-user boundary sets: rebuild each slice's true
            # first-2/last-2 + exact slice size, then walk the kept
            # sequence (≤ 4 rows per non-empty slice)
            n_by_slice = (
                g.loc[g["cnt"] > 0]
                .groupby(["user_id", "_slice"])["cnt"].sum()
            )
            cand = g.loc[g["cnt"] == 0].sort_values(
                ["user_id", "_slice", "ts", "event_id"], kind="stable"
            )
            grp = cand.groupby(["user_id", "_slice"], sort=False)
            rs = grp.cumcount().to_numpy()
            re_ = grp.cumcount(ascending=False).to_numpy()
            kept = cand.loc[(rs < 2) | (re_ < 2)].copy()
            if len(kept) < 3:
                return _empty()
            kept["r"] = kept.groupby(["user_id", "_slice"], sort=False).cumcount()
            kept["n"] = pd.MultiIndex.from_frame(
                kept[["user_id", "_slice"]]
            ).map(n_by_slice)
            u = kept["user_id"].to_numpy()
            sl = kept["_slice"].to_numpy()
            r = kept["r"].to_numpy()
            n = kept["n"].to_numpy(dtype="int64")
            et = kept["event_type"].to_numpy()
            same_slice = (u[1:] == u[:-1]) & (sl[1:] == sl[:-1])
            # non-consecutive link: same slice, n > 4, between kept
            # positions 1 and 2 (the global gap) — everything else links
            link_ok = ~same_slice | (n[:-1] <= 4) | (r[:-1] != 1)
            tri = (
                (u[2:] == u[:-2])
                & link_ok[:-1]
                & link_ok[1:]
                & ~((sl[2:] == sl[:-2]) & (sl[1:-1] == sl[:-2]))
            )
            if not tri.any():
                return _empty()
            f = pd.DataFrame(
                {"e1": et[:-2][tri], "e2": et[1:-1][tri], "e3": et[2:][tri]}
            )
            out = f.groupby(["e1", "e2", "e3"], as_index=False).size()
            return out.rename(columns={"size": "tn"}).astype({"tn": "int64"})

        edges = bucketed_group_agg(
            sliced,
            ["user_id"],
            edge_triples,
            partial_fn=boundary_partial,
            num_buckets=min(nb, 64),
        )
        partials = local.union(edges)

    agg = partials.groupby(["e1", "e2", "e3"]).aggregate(
        Sum("tn", alias_name="n_paths")
    )
    return agg.map_batches(
        lambda b: pd.DataFrame(
            {"e1": b["e1"], "e2": b["e2"], "e3": b["e3"],
             "n_paths": b["n_paths"].astype("int64")}
        ),
        batch_format="pandas",
    )


# --- gaps-and-islands: longest consecutive-day activity streak ----------------------

ACTIVITY_STREAKS_SQL = """
WITH du AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
isl AS (
  SELECT user_id,
         day - to_days(CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                            AS INTEGER)) AS anchor
  FROM du
),
st AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS len
  FROM isl GROUP BY user_id, anchor
),
mx AS (SELECT user_id, max(len) AS max_streak FROM st GROUP BY user_id)
SELECT max_streak, CAST(count(*) AS BIGINT) AS n_users
FROM mx GROUP BY max_streak
"""


def activity_streaks(sf_dir: str) -> ray.data.Dataset:
    """Longest consecutive-day activity streak per user, reported as a
    histogram (max_streak → n_users) — the classic gaps-and-islands
    window query (``day - row_number`` island anchors), which Ray Data
    has no window function for.

    Ray-Data-first decomposition: per-batch dedupe to (user, epoch-day)
    pairs (the only corpus-sized reduction), one bucketed shuffle on
    user_id — complete per-user groups per bucket, and a user's frame is
    bounded by the CALENDAR (≤ corpus-span days), so no single-key skew
    guard is needed (contrast event_transitions, where one user's raw
    events are unbounded). The per-bucket reducer is one vectorized
    pass: sort by (user, day), anchor = day − per-user cumcount, streak
    lengths via a (user, anchor) groupby size, per-user max, then each
    bucket emits a partial (max_streak → n_users) histogram; partials
    merge in one task over a calendar-bounded domain (streak ≤ span
    days). Driver holds nothing; output is the tiny histogram."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["ts"].to_numpy().astype("datetime64[D]").astype("int64"))
        return pd.DataFrame(
            {"user_id": b["user_id"].astype("int64"), "day": day}
        ).drop_duplicates()

    def bucket_hist(g: pd.DataFrame) -> pd.DataFrame:
        p = g.drop_duplicates(["user_id", "day"]).sort_values(
            ["user_id", "day"], kind="mergesort"
        )
        rk = p.groupby("user_id").cumcount().to_numpy()
        p = p.assign(anchor=p["day"].to_numpy() - rk)
        streaks = (
            p.groupby(["user_id", "anchor"], as_index=False)
            .size()
            .groupby("user_id", as_index=False)["size"]
            .max()
        )
        h = streaks.groupby("size", as_index=False).agg(n=("size", "count"))
        return pd.DataFrame(
            {"max_streak": h["size"].astype("int64"),
             "n_users": h["n"].astype("int64")}
        )

    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/events.parquet"))
    partials = bucketed_group_agg(
        ds.map_batches(pair_partial, batch_format="pandas"),
        ["user_id"], bucket_hist, num_buckets=nb,
    )

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        s = b.groupby("max_streak", as_index=False)["n_users"].sum()
        return s.astype({"max_streak": "int64", "n_users": "int64"})

    return partials.repartition(1).map_batches(merge, batch_format="pandas")


# --- merged-interval coverage: per-customer covered order-activity days -------------

INTERVAL_COVERAGE_SQL = """
WITH iv AS (
  SELECT o.o_custkey AS custkey,
         CAST(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS s,
         greatest(
           CAST(CAST(max(l.l_shipdate) AS DATE) - DATE '1970-01-01' AS BIGINT),
           CAST(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)) AS e
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_custkey, o.o_orderkey, o.o_orderdate
),
m AS (
  SELECT custkey, s, e,
         max(e) OVER (PARTITION BY custkey ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
  FROM iv
),
g AS (
  SELECT custkey, s, e,
         SUM(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
           OVER (PARTITION BY custkey ORDER BY s, e) AS isl
  FROM m
),
c AS (
  SELECT custkey, isl, max(e) - min(s) + 1 AS len FROM g GROUP BY custkey, isl
)
SELECT custkey, CAST(SUM(len) AS BIGINT) AS covered_days
FROM c GROUP BY custkey
"""


def interval_coverage(sf_dir: str) -> ray.data.Dataset:
    """Per-customer merged-interval coverage: each order spans
    [orderdate, last shipdate]; overlapping spans union, and the op
    reports the total covered days per customer — the interval-union
    sweep (running-max islands) behind SLA/uptime/exposure analytics,
    inexpressible in Ray Data's aggregate API.

    Two bucketed shuffles, both byte-scaled: (1) order assembly — a
    tag-union on orderkey (orders row carries custkey+orderdate, line
    rows carry shipdate; complete per-order groups reduce to one
    interval row each — no broadcast: both sides are corpus-scaled);
    (2) the sweep — intervals bucket on custkey (complete per-customer
    groups; a customer's frame is their order count, the same
    per-entity bound rfm_features rides). The per-bucket sweep is fully
    vectorized: sort by (cust, s, e), previous running max end via
    shifted per-group cummax, island ids by cumsum of gap flags, then
    one groupby over (cust, island) and a per-cust sum. Output is one
    row per active customer."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )

    def order_tag(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "orderkey": b["o_orderkey"].astype("int64"),
                "custkey": b["o_custkey"].astype("int64"),
                "d": b["o_orderdate"].to_numpy().astype("datetime64[D]").astype("int64"),
                "_t": np.int64(0),
            }
        )

    def line_tag(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "orderkey": b["l_orderkey"].astype("int64"),
                "d": b["l_shipdate"].to_numpy().astype("datetime64[D]").astype("int64"),
            }
        ).groupby("orderkey", as_index=False)["d"].max()  # per-batch partial max
        return g.assign(custkey=np.int64(-1), _t=np.int64(1))[
            ["orderkey", "custkey", "d", "_t"]
        ]

    tagged = orders.map_batches(order_tag, batch_format="pandas").union(
        lines.map_batches(line_tag, batch_format="pandas")
    )

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        o = g.loc[g["_t"] == 0]
        mx = g.loc[g["_t"] == 1].groupby("orderkey")["d"].max()
        e = o["orderkey"].map(mx)
        keep = e.notna()  # orders with no lines have no interval (inner join)
        o = o.loc[keep]
        s = o["d"].to_numpy()
        return pd.DataFrame(
            {
                "custkey": o["custkey"].to_numpy(),
                "s": s,
                "e": np.maximum(e.loc[keep].to_numpy().astype("int64"), s),
            }
        )

    nb = scaled_num_buckets(
        input_bytes_estimate(f"{sf_dir}/lineitem.parquet")
        + input_bytes_estimate(f"{sf_dir}/orders.parquet")
    )
    intervals = bucketed_group_agg(tagged, ["orderkey"], assemble, num_buckets=nb)

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["custkey", "s", "e"], kind="mergesort")
        # vectorized per-group running max: cythonized groupby cummax,
        # global shift, first-row-of-group masked (no per-group lambda)
        pm = g.groupby("custkey")["e"].cummax().shift(1)
        first = g["custkey"].ne(g["custkey"].shift(1))
        pm[first.to_numpy()] = np.nan
        new_isl = pm.isna() | (g["s"] > pm)
        isl = new_isl.groupby(g["custkey"].to_numpy()).cumsum()
        g = g.assign(isl=isl.to_numpy())
        spans = g.groupby(["custkey", "isl"], as_index=False).agg(
            s=("s", "min"), e=("e", "max")
        )
        out = spans.assign(len=spans["e"] - spans["s"] + 1).groupby(
            "custkey", as_index=False
        )["len"].sum()
        return pd.DataFrame(
            {"custkey": out["custkey"].astype("int64"),
             "covered_days": out["len"].astype("int64")}
        )

    return bucketed_group_agg(intervals, ["custkey"], sweep, num_buckets=nb)


# --- upsert-log compaction: latest value per (user, event_type) ---------------------

UPSERT_COMPACTION_SQL = """
WITH r AS (
  SELECT user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id, event_type) AS nv
  FROM events
)
SELECT user_id, event_type,
       CAST(floor(value * 100 + 0.5) AS BIGINT) AS last_value_c,
       CAST(nv AS BIGINT) AS n_versions
FROM r WHERE rn = 1
"""


def upsert_compaction(sf_dir: str) -> ray.data.Dataset:
    """Compact an append-only event log into its latest-writer-wins state
    table: per (user, event_type) key, the value of the newest event
    (ties on ts broken by the larger event_id — a total order, so the
    winner is engine-independent) plus the superseded-version count —
    the CDC/upsert compaction every lakehouse table service runs
    (Hudi/Delta compaction; Ray Data has no upsert primitive).

    The argmax is decomposable: each batch keeps ONE candidate row and a
    partial version count per key it sees (per-batch sort +
    drop_duplicates — vectorized), so the shuffle carries ≤ one row per
    (batch, key); the bucketed final applies the same rule over complete
    key groups and sums the partial counts. Same per-entity frame bound
    as first_touch_attribution, on a composite key."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "ts", "event_id", "value"],
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(
            value_c=np.floor(b["value"].to_numpy() * 100 + 0.5).astype("int64"),
            nv=np.int64(1),
        )
        s = b.sort_values(
            ["user_id", "event_type", "ts", "event_id"],
            ascending=[True, True, False, False],
            kind="mergesort",
        )
        top = s.drop_duplicates(["user_id", "event_type"])
        cnt = b.groupby(["user_id", "event_type"], as_index=False)["nv"].sum()
        return top[["user_id", "event_type", "ts", "event_id", "value_c"]].merge(
            cnt, on=["user_id", "event_type"]
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(
            ["user_id", "event_type", "ts", "event_id"],
            ascending=[True, True, False, False],
            kind="mergesort",
        )
        top = s.drop_duplicates(["user_id", "event_type"])
        cnt = g.groupby(["user_id", "event_type"], as_index=False)["nv"].sum()
        out = top[["user_id", "event_type", "value_c"]].merge(
            cnt, on=["user_id", "event_type"]
        )
        return pd.DataFrame(
            {
                "user_id": out["user_id"].astype("int64"),
                "event_type": out["event_type"],
                "last_value_c": out["value_c"].astype("int64"),
                "n_versions": out["nv"].astype("int64"),
            }
        )

    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/events.parquet"))
    return bucketed_group_agg(
        ds, ["user_id", "event_type"], final, partial_fn=partial, num_buckets=nb
    )


# --- conversion funnel (staged sequential EXISTS) ---------------------------------

# Stage semantics: a user completes stage k when an event of that type
# exists STRICTLY AFTER their stage-(k-1) completion event in the total
# per-user order (ts, event_id) — the classic product-analytics funnel,
# which is NOT the consecutive-pair/trigram question event_transitions /
# event_trigrams answer (arbitrary other events may intervene).
FUNNEL_STAGES = ("view", "click", "purchase")

FUNNEL_CONVERSION_SQL = """
WITH e AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
s1 AS (SELECT user_id, min(rn) AS r1 FROM e WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(e.rn) AS r2 FROM e JOIN s1 USING (user_id)
       WHERE e.event_type = 'click' AND e.rn > s1.r1 GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(e.rn) AS r3 FROM e JOIN s2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.rn > s2.r2 GROUP BY e.user_id)
SELECT 'view' AS stage, CAST(1 AS BIGINT) AS stage_idx,
       CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
UNION ALL
SELECT 'click', CAST(2 AS BIGINT), CAST((SELECT count(*) FROM s2) AS BIGINT)
UNION ALL
SELECT 'purchase', CAST(3 AS BIGINT), CAST((SELECT count(*) FROM s3) AS BIGINT)
"""


def _funnel_after(left: pd.DataFrame, right: pd.DataFrame) -> pd.Series:
    """Vectorized strict (ts, event_id) tuple comparison left > right
    (columns ts/event_id vs ts_r/event_id_r, row-aligned)."""
    return (left["ts"] > right["ts_r"]) | (
        (left["ts"] == right["ts_r"]) & (left["event_id"] > right["event_id_r"])
    )


def funnel_conversion(sf_dir: str) -> ray.data.Dataset:
    """view → click → purchase conversion funnel: per stage, how many
    users completed it (stage k = an event of that type strictly after
    the user's stage-(k-1) completion in (ts, event_id) order).

    Distributed shape — one user-bucketed shuffle over a COMPACTED
    stream: per batch, views collapse to the per-user minimum and
    purchases to the per-user maximum (stage-1 membership needs only the
    global first view; stage-3 membership is `max purchase > r2`, an
    EXISTS against the first qualifying click, so only the per-user max
    purchase can decide it). Clicks cannot be compacted batch-locally —
    the first click AFTER the global first view depends on a cross-batch
    minimum — so they ride through filtered + projected (≤1/5 of events,
    4 thin columns). Each bucket holds complete user groups and resolves
    the three stages with vectorized sorts/merges (no per-user Python);
    output partials are 3 counts per bucket, summed in one tiny task.
    A pathologically hot user's clicks concentrate in one bucket — the
    keyed-log time-sliced stitch (event_transitions) is the documented
    escape hatch if a real corpus ever exhibits one."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    ev_path = f"{sf_dir}/events.parquet"
    ds = ray.data.read_parquet(
        ev_path, columns=["user_id", "ts", "event_id", "event_type"]
    )
    kind_of = {s: np.int8(i) for i, s in enumerate(FUNNEL_STAGES)}

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.loc[b["event_type"].isin(FUNNEL_STAGES)]
        k = b["event_type"].map(kind_of).astype("int8")
        b = b.assign(kind=k)[["user_id", "kind", "ts", "event_id"]]
        s = b.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        views = s.loc[s["kind"] == 0].drop_duplicates("user_id")  # batch min
        purch = s.loc[s["kind"] == 2].drop_duplicates("user_id", keep="last")
        clicks = b.loc[b["kind"] == 1]
        return pd.concat([views, clicks, purch], ignore_index=True)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        r1 = (
            s.loc[s["kind"] == 0]
            .drop_duplicates("user_id")[["user_id", "ts", "event_id"]]
            .rename(columns={"ts": "ts_r", "event_id": "event_id_r"})
        )
        c = s.loc[s["kind"] == 1, ["user_id", "ts", "event_id"]].merge(
            r1, on="user_id"
        )
        c = c.loc[_funnel_after(c, c)]
        r2 = c.drop_duplicates("user_id")[["user_id", "ts", "event_id"]].rename(
            columns={"ts": "ts_r", "event_id": "event_id_r"}
        )
        p = (
            s.loc[s["kind"] == 2]
            .drop_duplicates("user_id", keep="last")[["user_id", "ts", "event_id"]]
            .merge(r2, on="user_id")
        )
        n3 = int(_funnel_after(p, p).sum())
        return pd.DataFrame(
            {
                "stage": list(FUNNEL_STAGES),
                "stage_idx": np.arange(1, 4, dtype="int64"),
                "n": np.array([len(r1), len(r2), n3], dtype="int64"),
            }
        )

    nb = scaled_num_buckets(input_bytes_estimate(ev_path))
    partials = bucketed_group_agg(
        ds, ["user_id"], per_bucket, partial_fn=partial, num_buckets=nb
    )

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby(["stage", "stage_idx"], as_index=False)["n"].sum()
        out = out.sort_values("stage_idx")
        return pd.DataFrame(
            {
                "stage": out["stage"],
                "stage_idx": out["stage_idx"].astype("int64"),
                "n_users": out["n"].astype("int64"),
            }
        )

    return partials.repartition(1).map_batches(merge, batch_format="pandas")


# --- LOCF gap fill: per-user daily grid with forward-filled last value --------------
#
# The observation→panel densification step every feature store / timeseries
# training-prep pipeline runs: expand each entity's sparse event record onto
# a complete daily grid and carry the last observed value forward (LOCF).
# Ray Data has no window function or series generator; the decomposition is
# per-batch (user, day) compaction → ONE bucketed shuffle on user_id →
# vectorized grid expansion + ffill inside complete per-user groups.

GAP_FILL_LOCF_SQL = """
WITH e AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, value,
         row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
),
d AS (SELECT user_id, day, value FROM e WHERE rn = 1),
span AS (SELECT user_id, MIN(day) AS lo, MAX(day) AS hi FROM d GROUP BY user_id),
grid AS (
  SELECT user_id,
         CAST(UNNEST(generate_series(CAST(lo AS TIMESTAMP),
                                     CAST(hi AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM span
)
SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS day,
       LAST_VALUE(d.value IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
FROM grid g LEFT JOIN d ON d.user_id = g.user_id AND d.day = g.day
"""


def gap_fill_locf(sf_dir: str) -> ray.data.Dataset:
    """Per-user daily LOCF panel: one row per (user, calendar day) from
    the user's first to last active day; ``value`` is the value of the
    latest event (by ts, then event_id) on or before that day. The float
    is CARRIED, never combined, so it crosses engines bit-exactly.

    Scale shape: the combiner compacts each batch to one row per
    (user, day) — the only corpus-sized reduction; after it, per-user
    frames are CALENDAR-bounded (≤ span days, same no-skew-guard
    argument as activity_streaks) even for a pathologically hot user.
    One bucketed shuffle on user_id; the reducer re-resolves the per-day
    argmax across partials (ts/event_id travel with the row), then builds
    each user's grid arithmetically (repeat + offset arange — no Python
    loop) and forward-fills with a grouped ffill. Output rows are
    grid-sized (≤ users × span), written streaming per bucket."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"],
    )

    def day_partial(b: pd.DataFrame) -> pd.DataFrame:
        p = pd.DataFrame(
            {
                "user_id": b["user_id"].astype("int64"),
                "day": b["ts"].to_numpy().astype("datetime64[D]").astype("int64"),
                "ts": b["ts"].to_numpy().astype("datetime64[us]").astype("int64"),
                "event_id": b["event_id"].astype("int64"),
                "value": b["value"].astype("float64"),
            }
        )
        p = p.sort_values(["user_id", "day", "ts", "event_id"], kind="mergesort")
        return p.drop_duplicates(["user_id", "day"], keep="last")

    def fill(g: pd.DataFrame) -> pd.DataFrame:
        # finish the per-(user, day) argmax across combiner partials
        g = g.sort_values(["user_id", "day", "ts", "event_id"], kind="mergesort")
        g = g.drop_duplicates(["user_id", "day"], keep="last")
        span = g.groupby("user_id", sort=True).agg(
            lo=("day", "min"), hi=("day", "max")
        )
        lens = (span["hi"] - span["lo"] + 1).to_numpy()
        total = int(lens.sum())
        users = np.repeat(span.index.to_numpy(), lens)
        starts = np.repeat(np.concatenate([[0], np.cumsum(lens)[:-1]]), lens)
        days = np.arange(total) - starts + np.repeat(span["lo"].to_numpy(), lens)
        grid = pd.DataFrame({"user_id": users, "day": days})
        out = grid.merge(g[["user_id", "day", "value"]], how="left",
                         on=["user_id", "day"])
        out["value"] = out.groupby("user_id", sort=False)["value"].ffill()
        return pd.DataFrame(
            {
                "user_id": out["user_id"].astype("int64"),
                "day": np.datetime_as_string(
                    out["day"].to_numpy().astype("datetime64[D]"), unit="D"
                ),
                "value": out["value"].astype("float64"),
            }
        )

    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/events.parquet"))
    return bucketed_group_agg(
        ds.map_batches(day_partial, batch_format="pandas"),
        ["user_id"], fill, num_buckets=nb,
    )


# --- time-weighted average value (TWAP) per user ------------------------------------
#
# The financial/feature-store step-function integral: each event's value is
# in effect until the user's next event; TWAP = ∫value dt / span. Carried as
# the exact INTEGER pair (cents·µs numerator, µs denominator) — the division
# is the consumer's. Same keyed-log contract as event_deltas: the default
# path shuffles whole users (guarded), and slice_width= gives the skew-proof
# time-sliced path whose carry is the previous slice's last (ts, value) —
# LAG state, ONE row per (user, slice).

TIME_WEIGHTED_VALUE_SQL = """
WITH o AS (
  SELECT user_id, ts, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
)
SELECT user_id,
       CAST(COALESCE(SUM(CASE WHEN nxt IS NOT NULL
             THEN cents * (epoch_us(nxt) - epoch_us(ts)) END), 0) AS BIGINT)
         AS twap_num,
       CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS twap_den
FROM o GROUP BY user_id
"""


def _twap_local(g: pd.DataFrame) -> pd.DataFrame:
    """Per-(user[, slice]) step integral on sorted rows; carry rows
    (event_id == -1) contribute their segment but are not counted as
    span endpoints (the span is a separate exact combiner)."""
    g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
    uid = g["user_id"].to_numpy()
    ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    cents = g["cents"].to_numpy()
    seg = cents[:-1] * (ts_us[1:] - ts_us[:-1])
    same = uid[1:] == uid[:-1]
    out = pd.DataFrame({"user_id": uid[:-1][same], "num": seg[same]})
    return out.groupby("user_id", as_index=False)["num"].sum()


def time_weighted_value(
    sf_dir: str,
    *,
    slice_width: str | None = None,
    max_group_rows: int = DEFAULT_MAX_GROUP_ROWS,
) -> ray.data.Dataset:
    """(user_id, twap_num, twap_den): exact integer time-weighted value.

    Scale shape: the numerator is slice-decomposable (each inter-event
    segment belongs to exactly one (user, slice) once the previous
    slice's last (ts, value) is carried in — the identical carry shape
    as _event_deltas_sliced), so the sliced path never co-locates a hot
    user's full history; the denominator is a plain per-user (min, max)
    combiner. Default path shuffles whole users with the group-size
    guard."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )
    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/events.parquet"))
    slice_width = _resolve_slice_width(slice_width, sf_dir, max_group_rows)

    def to_cents(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": b["event_id"].astype("int64"),
                "user_id": b["user_id"].astype("int64"),
                "ts": b["ts"],
                "cents": np.floor(
                    b["value"].to_numpy(dtype="float64") * 100 + 0.5
                ).astype("int64"),
            }
        )

    events = ds.map_batches(to_cents, batch_format="pandas")

    if slice_width is None:
        # whole users co-locate anyway -> numerator AND span in ONE pass
        def per_user(g: pd.DataFrame) -> pd.DataFrame:
            _guard_group_rows(g, ["user_id"], max_group_rows, "time_weighted_value")
            num = _twap_local(g)
            ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            span = (
                pd.DataFrame({"user_id": g["user_id"].to_numpy(), "t": ts_us})
                .groupby("user_id", as_index=False)
                .agg(lo=("t", "min"), hi=("t", "max"))
            )
            out = span.merge(num, on="user_id", how="left")
            return pd.DataFrame(
                {
                    "user_id": out["user_id"].astype("int64"),
                    "twap_num": out["num"].fillna(0).astype("int64"),
                    "twap_den": (out["hi"] - out["lo"]).astype("int64"),
                }
            )

        return bucketed_group_agg(events, ["user_id"], per_user, num_buckets=nb)

    # exact per-user span: plain (min, max) combiner, never skew-bound
    def span_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("user_id", as_index=False).agg(
            lo=("ts", "min"), hi=("ts", "max")
        )

    def span_final(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("user_id", as_index=False).agg(lo=("lo", "min"), hi=("hi", "max"))
        den = (
            s["hi"].to_numpy().astype("datetime64[us]").astype("int64")
            - s["lo"].to_numpy().astype("datetime64[us]").astype("int64")
        )
        return pd.DataFrame(
            {"user_id": s["user_id"].astype("int64"), "twap_den": den}
        )

    spans = bucketed_group_agg(
        events, ["user_id"], span_final, partial_fn=span_partial,
        num_buckets=min(nb, 64),
    )

    width = pd.Timedelta(slice_width)
    sliced = events.map_batches(
        lambda b: b.assign(_slice=b["ts"].dt.floor(width)),
        batch_format="pandas",
    )

    def last_partial(b: pd.DataFrame) -> pd.DataFrame:
        p = b.sort_values(["user_id", "_slice", "ts", "event_id"],
                          kind="stable")
        return p.drop_duplicates(["user_id", "_slice"], keep="last")

    def carry_final(g: pd.DataFrame) -> pd.DataFrame:
        a = g.sort_values(["user_id", "_slice", "ts", "event_id"],
                          kind="stable")
        a = a.drop_duplicates(["user_id", "_slice"], keep="last")
        nxt_slice = a.groupby("user_id", sort=False)["_slice"].shift(-1)
        take = nxt_slice.notna().to_numpy()
        return pd.DataFrame(
            {
                "event_id": np.full(int(take.sum()), -1, dtype="int64"),
                "user_id": a["user_id"].to_numpy()[take],
                "ts": pd.Series(a["ts"].to_numpy()[take]),
                "cents": a["cents"].to_numpy()[take],
                "_slice": nxt_slice.to_numpy()[take],
            }
        )

    carry = bucketed_group_agg(
        sliced, ["user_id"], carry_final, partial_fn=last_partial,
        num_buckets=min(nb, 64),
    )
    full = sliced.union(carry)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        _guard_group_rows(
            g, ["user_id", "_slice"], max_group_rows, "time_weighted_value"
        )
        # the carry's segment (prev slice's last event -> this slice's
        # first) lands here; its ts < every in-slice ts by construction
        return _twap_local(g)

    partials = bucketed_group_agg(
        full, ["user_id", "_slice"], per_group, num_buckets=nb
    )

    def num_final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("user_id", as_index=False)["num"].sum()

    nums = bucketed_group_agg(
        partials, ["user_id"], num_final, num_buckets=min(nb, 64)
    )

    # span rows exist for every user; numerator rows only for multi-event
    # users — tag-union merge keyed on user_id
    def to_tagged_num(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": b["user_id"].astype("int64"),
             "num": b["num"].astype("int64"),
             "den": np.int64(-1)}
        )

    def to_tagged_span(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": b["user_id"].astype("int64"),
             "num": np.int64(0),
             "den": b["twap_den"].astype("int64")}
        )

    tagged = nums.map_batches(to_tagged_num, batch_format="pandas").union(
        spans.map_batches(to_tagged_span, batch_format="pandas")
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("user_id", as_index=False).agg(
            twap_num=("num", "sum"), den=("den", "max")
        )
        return pd.DataFrame(
            {
                "user_id": out["user_id"].astype("int64"),
                "twap_num": out["twap_num"].astype("int64"),
                "twap_den": out["den"].astype("int64"),
            }
        )

    return bucketed_group_agg(tagged, ["user_id"], merge, num_buckets=min(nb, 64))


# --- robust outliers: exact median/MAD rule in pure integer arithmetic -----------

# The 2-sigma rule (value_outliers) is itself skewed by the outliers it
# hunts; the robust form is |x - median| > 3 * MAD. Both medians can be
# half-integers on even counts, so the whole predicate is multiplied
# through by 4: with med2 = (two middle values summed) and dev = |2x - med2|
# (an exact integer), MAD = median(dev)/4·2 ... precisely:
# |x - med| = dev/2 and 3·MAD = 3·dev_med2/4, so the integer predicate is
# 2·dev > 3·dev_med2. Both engines evaluate the SAME integers — bit-exact.
MAD_OUTLIERS_SQL = """
WITH v AS (
  SELECT event_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY c) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM v
),
m AS (
  SELECT event_type,
         SUM(CASE WHEN rn = (n - 1) // 2 + 1 THEN c ELSE 0 END)
       + SUM(CASE WHEN rn = n // 2 + 1 THEN c ELSE 0 END) AS med2
  FROM r GROUP BY event_type
),
d AS (
  SELECT v.event_id, v.event_type, v.c,
         abs(2 * v.c - m.med2) AS dev
  FROM v JOIN m USING (event_type)
),
dr AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM d
),
dm AS (
  SELECT event_type,
         SUM(CASE WHEN rn = (n - 1) // 2 + 1 THEN dev ELSE 0 END)
       + SUM(CASE WHEN rn = n // 2 + 1 THEN dev ELSE 0 END) AS dev_med2
  FROM dr GROUP BY event_type
)
SELECT d.event_id, d.event_type, CAST(d.c AS BIGINT) AS value_c,
       CAST(d.dev AS BIGINT) AS dev2
FROM d JOIN dm USING (event_type)
WHERE 2 * d.dev > 3 * dm.dev_med2
"""


def mad_outliers(sf_dir: str) -> ray.data.Dataset:
    """Median/MAD robust outliers per event_type — the outlier screen
    that is not corrupted by its own targets (value_outliers' 2-sigma
    threshold inflates with every extreme value; median and MAD are
    50%-breakdown estimators). Exact by construction: the value domain
    is 2-decimal cents, so per-(type, cents) histograms are complete
    sufficient statistics; the deviation histogram is a pure relabeling
    of the value histogram (dev = |2c − med2|), so BOTH medians come
    from the same table with zero extra passes over the data.

    Scale shape: per-batch (type, cents) partial counts → one bucketed
    reduce → ONE stats task (cell domain = types × distinct cents — a
    data-grid property, not corpus-sized) computes med2/dev_med2 per
    type by cumsum + searchsorted; the tiny per-type table broadcasts
    (ray.put) into a stateless vectorized filter pass. Two scans of the
    fact table, one thin int64 shuffle, O(cells) driver state."""
    from .shuffle import bucketed_group_agg

    path = f"{sf_dir}/events.parquet"

    def cents(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"event_id": b["event_id"], "event_type": b["event_type"],
             "c": np.floor(b["value"].to_numpy() * 100 + 0.5).astype("int64")}
        )

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["event_type", "c"], as_index=False).size()
        return g.rename(columns={"size": "n"}).astype({"n": "int64"})

    ds = ray.data.read_parquet(path, columns=["event_id", "event_type", "value"])
    cells = bucketed_group_agg(
        ds.map_batches(cents, batch_format="pandas").map_batches(
            hist_partial, batch_format="pandas"
        ),
        ["event_type", "c"],
        lambda g: g.groupby(["event_type", "c"], as_index=False)["n"].sum(),
        num_buckets=64,
    )

    def per_type_stats(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t, g in b.groupby("event_type"):
            g = g.sort_values("c")
            cv = g["c"].to_numpy(dtype="int64")
            cn = g["n"].to_numpy(dtype="int64")
            cum = np.cumsum(cn)
            n = int(cum[-1])
            lo, hi = (n - 1) // 2, n // 2  # 0-indexed middle positions
            med2 = int(cv[np.searchsorted(cum, lo + 1)]) + int(
                cv[np.searchsorted(cum, hi + 1)]
            )
            dev = np.abs(2 * cv - med2)
            o = np.argsort(dev, kind="stable")
            dcum = np.cumsum(cn[o])
            dev_med2 = int(dev[o][np.searchsorted(dcum, lo + 1)]) + int(
                dev[o][np.searchsorted(dcum, hi + 1)]
            )
            rows.append((t, med2, dev_med2))
        return pd.DataFrame(rows, columns=["event_type", "med2", "dev_med2"])

    stats = (
        cells.repartition(1)
        .map_batches(per_type_stats, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    ref = ray.put(
        {r.event_type: (int(r.med2), int(r.dev_med2)) for r in stats.itertuples()}
    )

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(ref)
        b = cents(b)
        med2 = b["event_type"].map(lambda t: st[t][0]).to_numpy(dtype="int64")
        thr = b["event_type"].map(lambda t: st[t][1]).to_numpy(dtype="int64")
        dev = np.abs(2 * b["c"].to_numpy() - med2)
        out = b.loc[2 * dev > 3 * thr].copy()
        out["dev2"] = dev[2 * dev > 3 * thr]
        return out.rename(columns={"c": "value_c"}).astype(
            {"value_c": "int64", "dev2": "int64"}
        )

    return ds.map_batches(pick, batch_format="pandas")


# --- linear multi-touch attribution ------------------------------------------------

LINEAR_ATTRIBUTION_SQL = """
WITH p AS (
  SELECT user_id, ts,
         CAST(floor(value * 100 + 0.5) AS BIGINT) * 10000 AS v_micro,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type = 'purchase'
),
conv AS (SELECT user_id, ts AS cts, v_micro FROM p WHERE rn = 1),
t AS (
  SELECT e.user_id, e.event_type, e.ts, e.event_id, c.v_micro
  FROM events e JOIN conv c ON e.user_id = c.user_id
  WHERE e.ts < c.cts AND e.event_type <> 'purchase'
),
tn AS (
  SELECT *, count(*) OVER (PARTITION BY user_id) AS n,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM t
)
SELECT event_type,
       CAST(SUM(v_micro // n
                + CASE WHEN rn = 1 THEN v_micro % n ELSE 0 END) AS BIGINT)
         AS credit_micro,
       CAST(count(*) AS BIGINT) AS n_touches
FROM tn GROUP BY event_type
"""


def _la_vmicro(value) -> np.ndarray:
    return (np.floor(np.asarray(value, dtype="float64") * 100 + 0.5)
            .astype("int64") * 10_000)


def _la_credit(f: pd.DataFrame) -> pd.DataFrame:
    """Per-user credit split, vectorized over a frame of touch summaries:
    columns user_id, event_type, cnt, v_micro, n (per-user total), is_first
    (this row's type holds the user's earliest touch)."""
    base = (f["v_micro"] // f["n"]) * f["cnt"]
    rem = np.where(f["is_first"].to_numpy(), (f["v_micro"] % f["n"]).to_numpy(), 0)
    out = pd.DataFrame(
        {"event_type": f["event_type"],
         "credit_micro": (base.to_numpy() + rem).astype("int64"),
         "p_touches": f["cnt"].astype("int64")}
    )
    return out.groupby("event_type", as_index=False).agg(
        credit_micro=("credit_micro", "sum"), p_touches=("p_touches", "sum")
    )


def linear_attribution(
    sf_dir: str,
    *,
    slice_width: str | None = None,
    max_group_rows: int = DEFAULT_MAX_GROUP_ROWS,
) -> ray.data.Dataset:
    """Linear multi-touch attribution: each converting user's FIRST
    purchase (by ts, event_id) distributes its value equally over the
    user's touches — the non-purchase events strictly before the
    conversion ts — in exact integer micro-units (v//n per touch, the
    division remainder to the earliest touch by (ts, event_id), so the
    per-user credits sum to v exactly and both engines agree bit-for-bit).
    Output: per event_type total credit + touch count.

    Default path: ONE bucketed shuffle on user_id over thin projected
    rows (conversion detection and credit split happen inside the
    complete-user group); single-key guard raises past ``max_group_rows``.

    slice_width (or "auto"): the skew-proof exact path. Every per-user
    quantity decomposes over time slices: slices strictly before the
    conversion slice contribute ALL their non-purchase events (any event
    there is < the conversion ts by slice disjointness), the conversion
    slice contributes its locally-compared prefix, later slices nothing —
    so shuffle #1 groups (user, slice) and emits bounded per-slice
    summaries (local first purchase, per-type all/before counts,
    slice-earliest touches), and shuffle #2 reduces each user over
    O(slices × types) summary rows, never raw events."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    ev_path = f"{sf_dir}/events.parquet"
    ds = ray.data.read_parquet(
        ev_path, columns=["event_id", "user_id", "ts", "event_type", "value"]
    )
    nb = scaled_num_buckets(input_bytes_estimate(ev_path))
    slice_width = _resolve_slice_width(slice_width, sf_dir, max_group_rows)

    def thin(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": b["user_id"].astype("int64"),
             "ts": b["ts"], "event_id": b["event_id"].astype("int64"),
             "event_type": b["event_type"],
             "v_micro": _la_vmicro(b["value"])}
        )

    if slice_width is None:
        def per_user(g: pd.DataFrame) -> pd.DataFrame:
            _guard_group_rows(g, ["user_id"], max_group_rows,
                              "linear_attribution")
            g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
            conv = g.loc[g["event_type"] == "purchase"].drop_duplicates(
                "user_id", keep="first"
            )[["user_id", "ts", "v_micro"]].rename(
                columns={"ts": "cts", "v_micro": "cv"}
            )
            t = g.loc[g["event_type"] != "purchase"].merge(conv, on="user_id")
            t = t.loc[t["ts"] < t["cts"]].sort_values(
                ["user_id", "ts", "event_id"], kind="stable"
            )
            if t.empty:
                return pd.DataFrame(
                    {"event_type": pd.Series(dtype="object"),
                     "credit_micro": pd.Series(dtype="int64"),
                     "p_touches": pd.Series(dtype="int64")}
                )
            # t is still (ts, event_id)-sorted within user
            t["n"] = t.groupby("user_id")["event_id"].transform("size")
            first = t.drop_duplicates("user_id", keep="first")[
                ["user_id", "event_id"]
            ].assign(is_first=True)
            cnt = t.groupby(
                ["user_id", "event_type"], as_index=False
            ).agg(cnt=("event_id", "size"), v_micro=("cv", "first"),
                  n=("n", "first"), first_eid=("event_id", "first"))
            cnt = cnt.merge(
                first.rename(columns={"event_id": "first_eid"}),
                on=["user_id", "first_eid"], how="left",
            )
            cnt["is_first"] = cnt["is_first"].fillna(False)
            return _la_credit(cnt)

        def pre(b: pd.DataFrame) -> pd.DataFrame:
            t = thin(b)
            # purchases keep their own value; touches ride with the value
            # of their CONVERSION, attached inside the complete-user group
            t.loc[t["event_type"] != "purchase", "v_micro"] = 0
            return t

        partials = bucketed_group_agg(
            ds.map_batches(pre, batch_format="pandas"), ["user_id"], per_user,
            num_buckets=nb,
        )
    else:
        width = pd.Timedelta(slice_width)

        def slice_partial(g: pd.DataFrame) -> pd.DataFrame:
            _guard_group_rows(g, ["user_id", "_slice"], max_group_rows,
                              "linear_attribution")
            g = g.sort_values(["user_id", "_slice", "ts", "event_id"],
                              kind="stable")
            key = ["user_id", "_slice"]
            is_p = g["event_type"] == "purchase"
            p = g.loc[is_p].drop_duplicates(key, keep="first")
            t = g.loc[~is_p]
            rows = [
                p[key + ["ts", "event_id", "v_micro"]].assign(
                    kind="p", event_type="", n=np.int64(0)
                )
            ]
            if len(t):
                a = t.groupby(key + ["event_type"], as_index=False).agg(
                    n=("event_id", "size")
                ).assign(kind="a", ts=pd.NaT, event_id=np.int64(0),
                         v_micro=np.int64(0))
                ea = t.drop_duplicates(key, keep="first")[
                    key + ["ts", "event_id", "event_type"]
                ].assign(kind="ea", n=np.int64(0), v_micro=np.int64(0))
                rows += [a, ea]
                m = t.merge(
                    p[key + ["ts"]].rename(columns={"ts": "pts"}), on=key
                )
                m = m.loc[m["ts"] < m["pts"]]
                if len(m):
                    bcnt = m.groupby(key + ["event_type"], as_index=False).agg(
                        n=("event_id", "size")
                    ).assign(kind="b", ts=pd.NaT, event_id=np.int64(0),
                             v_micro=np.int64(0))
                    eb = m.drop_duplicates(key, keep="first")[
                        key + ["ts", "event_id", "event_type"]
                    ].assign(kind="eb", n=np.int64(0), v_micro=np.int64(0))
                    rows += [bcnt, eb]
            cols = key + ["kind", "event_type", "ts", "event_id", "v_micro", "n"]
            rows = [r for r in rows if len(r)]  # empty frames poison concat dtypes
            if not rows:
                return pd.DataFrame(
                    {c: pd.Series(dtype=d) for c, d in zip(
                        cols, ["int64", "datetime64[us]", "object", "object",
                               "datetime64[us]", "int64", "int64", "int64"])}
                )
            return pd.concat(rows, ignore_index=True)[cols]

        def add_slice(b: pd.DataFrame) -> pd.DataFrame:
            t = thin(b)
            t.loc[t["event_type"] != "purchase", "v_micro"] = 0
            return t.assign(_slice=t["ts"].dt.floor(width))

        summaries = bucketed_group_agg(
            ds.map_batches(add_slice, batch_format="pandas"),
            ["user_id", "_slice"], slice_partial, num_buckets=nb,
        )

        def per_user_summary(g: pd.DataFrame) -> pd.DataFrame:
            p = g.loc[g["kind"] == "p"].sort_values(
                ["user_id", "ts", "event_id"], kind="stable"
            ).drop_duplicates("user_id", keep="first")[
                ["user_id", "_slice", "v_micro"]
            ].rename(columns={"_slice": "cslice"})
            if p.empty:
                return pd.DataFrame(
                    {"event_type": pd.Series(dtype="object"),
                     "credit_micro": pd.Series(dtype="int64"),
                     "p_touches": pd.Series(dtype="int64")}
                )
            m = g.merge(p, on="user_id", suffixes=("", "_c"))
            use = ((m["kind"] == "a") & (m["_slice"] < m["cslice"])) | (
                (m["kind"] == "b") & (m["_slice"] == m["cslice"])
            )
            cnt = m.loc[use].groupby(
                ["user_id", "event_type"], as_index=False
            ).agg(cnt=("n", "sum"), v_micro=("v_micro_c", "first"))
            if cnt.empty:
                return pd.DataFrame(
                    {"event_type": pd.Series(dtype="object"),
                     "credit_micro": pd.Series(dtype="int64"),
                     "p_touches": pd.Series(dtype="int64")}
                )
            cnt["n"] = cnt.groupby("user_id")["cnt"].transform("sum")
            euse = ((m["kind"] == "ea") & (m["_slice"] < m["cslice"])) | (
                (m["kind"] == "eb") & (m["_slice"] == m["cslice"])
            )
            e = m.loc[euse].sort_values(
                ["user_id", "ts", "event_id"], kind="stable"
            ).drop_duplicates("user_id", keep="first")[["user_id", "event_type"]]
            cnt = cnt.merge(
                e.assign(is_first=True), on=["user_id", "event_type"], how="left"
            )
            cnt["is_first"] = cnt["is_first"].fillna(False)
            return _la_credit(cnt)

        partials = bucketed_group_agg(
            summaries, ["user_id"], per_user_summary, num_buckets=min(nb, 64)
        )

    agg = partials.groupby("event_type").aggregate(
        Sum("credit_micro", alias_name="credit_micro_s"),
        Sum("p_touches", alias_name="n_touches"),
    )
    return agg.map_batches(
        lambda b: pd.DataFrame(
            {"event_type": b["event_type"],
             "credit_micro": b["credit_micro_s"].astype("int64"),
             "n_touches": b["n_touches"].astype("int64")}
        ),
        batch_format="pandas",
    )


# --- SCD-2 history build: per-user event-type validity intervals -------------------

SCD2_INTERVALS_SQL = """
WITH s AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
              ) IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
  FROM events
),
g AS (
  SELECT *, SUM(chg) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS seg
  FROM s
)
SELECT user_id, event_type,
       min(ts) AS valid_from, max(ts) AS valid_to,
       CAST(count(*) AS BIGINT) AS n_events
FROM g GROUP BY user_id, event_type, seg
"""


def scd2_intervals(
    sf_dir: str,
    *,
    slice_width: str | None = None,
    max_group_rows: int = DEFAULT_MAX_GROUP_ROWS,
) -> ray.data.Dataset:
    """Slowly-changing-dimension (type 2) history build: each user's
    event stream, ordered by (ts, event_id), collapses into maximal runs
    of one event_type — (user_id, event_type, valid_from, valid_to,
    n_events) rows, the CDC-style validity table a warehouse keeps for
    every mutable attribute. Gaps-and-islands with a LAG change flag.

    Default path: one bucketed shuffle on user_id (complete-user groups;
    vectorized shift + cumsum segments); single-key guard raises past
    ``max_group_rows``. slice_width (or "auto"): the skew-proof exact
    path — runs interior to a (user, slice) group are FINAL (adjacent
    segments differ in type by construction, so a slice's first and last
    run never merge with each other); only each slice's edge runs (≤ 2
    rows per present slice) enter a per-user stitch, which chains a
    slice's last run into the next present slice's first run when the
    type persists — event_transitions' boundary-stitch shape, group size
    bounded by the calendar."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    ev_path = f"{sf_dir}/events.parquet"
    ds = ray.data.read_parquet(
        ev_path, columns=["event_id", "user_id", "ts", "event_type"]
    )
    nb = scaled_num_buckets(input_bytes_estimate(ev_path))
    slice_width = _resolve_slice_width(slice_width, sf_dir, max_group_rows)

    OUT = ["user_id", "event_type", "valid_from", "valid_to", "n_events"]

    def segs_of(g: pd.DataFrame, keys: list) -> pd.DataFrame:
        """Vectorized run segmentation of a (keys, ts, event_id)-sorted
        frame; returns one row per run with pos flags within keys."""
        if g.empty:
            return pd.DataFrame(
                {"user_id": pd.Series(dtype="int64"),
                 "event_type": pd.Series(dtype="object"),
                 "valid_from": pd.Series(dtype="datetime64[us]"),
                 "valid_to": pd.Series(dtype="datetime64[us]"),
                 "n_events": pd.Series(dtype="int64"),
                 "_slice": pd.Series(dtype="int64"),
                 "first_of": pd.Series(dtype="bool"),
                 "last_of": pd.Series(dtype="bool")}
            )
        same_key = np.ones(len(g), dtype=bool)
        same_key[0] = False
        for c in keys:
            v = g[c].to_numpy()
            same_key[1:] &= v[1:] == v[:-1]
        et = g["event_type"].to_numpy()
        chg = np.ones(len(g), dtype=bool)
        chg[1:] = et[1:] != et[:-1]
        new_seg = ~same_key | chg
        seg = np.cumsum(new_seg)
        f = g.assign(_seg=seg)
        runs = f.groupby("_seg", as_index=False).agg(
            user_id=("user_id", "first"), event_type=("event_type", "first"),
            valid_from=("ts", "min"), valid_to=("ts", "max"),
            n_events=("ts", "size"),
            _slice=("_slice", "first") if "_slice" in f.columns else ("user_id", "size"),
        )
        # pos flags: run index within its (keys) group
        grp = runs.groupby([c for c in ("user_id", "_slice") if c in runs],
                           sort=False)
        idx = grp.cumcount().to_numpy()
        cnt = grp["n_events"].transform("size").to_numpy()
        return runs.assign(
            first_of=idx == 0, last_of=idx == cnt - 1,
            n_events=runs["n_events"].astype("int64"),
        )

    if slice_width is None:
        def per_user(g: pd.DataFrame) -> pd.DataFrame:
            _guard_group_rows(g, ["user_id"], max_group_rows, "scd2_intervals")
            g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
            return segs_of(g, ["user_id"])[OUT]

        return bucketed_group_agg(ds, ["user_id"], per_user, num_buckets=nb)

    width = pd.Timedelta(slice_width)

    def add_slice(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(
            _slice=b["ts"].dt.floor(width).to_numpy().astype("int64")
        )

    sliced = ds.map_batches(add_slice, batch_format="pandas")

    def slice_runs(g: pd.DataFrame) -> pd.DataFrame:
        _guard_group_rows(g, ["user_id", "_slice"], max_group_rows,
                          "scd2_intervals")
        g = g.sort_values(["user_id", "_slice", "ts", "event_id"], kind="stable")
        return segs_of(g, ["user_id", "_slice"])

    runs = bucketed_group_agg(
        sliced, ["user_id", "_slice"], slice_runs, num_buckets=nb
    )

    def keep_interior(b: pd.DataFrame) -> pd.DataFrame:
        return b.loc[~(b["first_of"] | b["last_of"]), OUT]

    def keep_edges(b: pd.DataFrame) -> pd.DataFrame:
        return b.loc[b["first_of"] | b["last_of"]]

    runs = runs.materialize()
    interior = runs.map_batches(keep_interior, batch_format="pandas")
    edges = runs.map_batches(keep_edges, batch_format="pandas")

    def stitch(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "valid_from", "_slice", "first_of"],
                          kind="stable")
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        # prev row may extend iff it closed its slice; cur may accept iff
        # it opens its slice (same-slice first/last never merge: adjacent
        # runs differ in type, non-adjacent are separated by interior runs)
        prev_open = np.roll(g["last_of"].to_numpy(), 1)
        cur_accept = g["first_of"].to_numpy()
        same_slice = np.roll(g["_slice"].to_numpy(), 1) == g["_slice"].to_numpy()
        merge = np.zeros(len(g), dtype=bool)
        if len(g) > 1:
            merge[1:] = (
                (uid[1:] == uid[:-1]) & (et[1:] == et[:-1])
                & prev_open[1:] & cur_accept[1:] & ~same_slice[1:]
            )
        chain = np.cumsum(~merge)
        f = g.assign(_chain=chain)
        out = f.groupby("_chain", as_index=False).agg(
            user_id=("user_id", "first"), event_type=("event_type", "first"),
            valid_from=("valid_from", "min"), valid_to=("valid_to", "max"),
            n_events=("n_events", "sum"),
        )
        return out[OUT].astype({"n_events": "int64"})

    stitched = bucketed_group_agg(
        edges, ["user_id"], stitch, num_buckets=min(nb, 64)
    )
    return interior.union(stitched)


# --- weekday × hour activity profile ---------------------------------------------

WEEKDAY_HOUR_PROFILE_SQL = """
SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
       CAST(hour(ts) AS BIGINT) AS hod,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS value_c
FROM events GROUP BY 1, 2
"""


def weekday_hour_profile(sf_dir: str) -> ray.data.Dataset:
    """Weekday × hour-of-day activity heat grid (event count + value
    mass) — the seasonality profile behind capacity planning and
    anomaly baselines. Scale shape: the 7×24 cell domain is structurally
    bounded, so per-batch crosstab partials + ONE merge task; dow uses
    DuckDB's Sunday=0 convention (pandas' Monday=0 shifted by
    (wd + 1) % 7 — the cross-engine calendar detail the oracle pins)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        dow = ((b["ts"].dt.weekday + 1) % 7).astype("int64")  # Sunday=0
        f = pd.DataFrame(
            {"dow": dow, "hod": b["ts"].dt.hour.astype("int64"),
             "n_events": np.int64(1),
             "value_c": np.floor(
                 b["value"].to_numpy() * 100 + 0.5).astype("int64")}
        )
        return f.groupby(["dow", "hod"], as_index=False).agg(
            n_events=("n_events", "sum"), value_c=("value_c", "sum")
        )

    parts = ds.map_batches(partial, batch_format="pandas")

    def final(b: pd.DataFrame) -> pd.DataFrame:
        s = b.groupby(["dow", "hod"], as_index=False).agg(
            n_events=("n_events", "sum"), value_c=("value_c", "sum")
        )
        return s.astype({"dow": "int64", "hod": "int64",
                         "n_events": "int64", "value_c": "int64"})

    return parts.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None
    )
