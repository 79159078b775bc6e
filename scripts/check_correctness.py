"""Local replica of the driver's correctness gate: run each queries() entry
and its oracle_sql() twin on the same sf dir, compare row count + schema +
order-insensitive value hash.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    return hashlib.sha1(
        df.to_csv(index=False, float_format="%.9g").encode()
    ).hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(
        address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR"
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = canonicalize(to_pandas(fn(sf_dir)))
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(f"FAIL {name}: ray error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        t_ray = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?  {name}: rows={len(ray_df)} (rows-only, no oracle) [{t_ray:.1f}s]")
            continue
        try:
            ora_df = canonicalize(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            failures.append(name)
            continue
        problems = []
        if len(ray_df) != len(ora_df):
            problems.append(f"rows {len(ray_df)} vs {len(ora_df)}")
        if list(ray_df.columns) != list(ora_df.columns):
            problems.append(f"cols {list(ray_df.columns)} vs {list(ora_df.columns)}")
        elif value_hash(ray_df) != value_hash(ora_df):
            problems.append("value-hash mismatch")
            merged = ray_df.merge(ora_df, how="outer", indicator=True)
            diff = merged[merged["_merge"] != "both"]
            print(diff.head(6).to_string())
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} [{t_ray:.1f}s]")
            failures.append(name)
        else:
            print(f"PASS {name}: rows={len(ray_df)} [{t_ray:.1f}s]")
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all good")


if __name__ == "__main__":
    main()
