"""Connected-components cluster resolution (ops/cluster.py)."""

import numpy as np
import pandas as pd
import pytest
import ray

from docling_serve_ray.ops.cluster import connected_components

SF = "/root/testdata/sf0.001"


def _run(pairs_df: pd.DataFrame) -> pd.DataFrame:
    ds = ray.data.from_pandas(pairs_df)
    return (
        connected_components(ds)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_transitive_chain(ray_session):
    # a-b, b-c must land in ONE cluster (transitive closure, not pair dedup)
    out = _run(pd.DataFrame({"doc_a": [1, 2], "doc_b": [2, 3]}))
    assert out["doc_id"].tolist() == [1, 2, 3]
    assert out["cluster_id"].tolist() == [1, 1, 1]
    assert out["is_keeper"].tolist() == [1, 0, 0]


def test_multiple_components_min_keeper(ray_session):
    out = _run(
        pd.DataFrame({"doc_a": [5, 4, 10, 20, 21], "doc_b": [4, 3, 11, 21, 22]})
    )
    by_cluster = out.groupby("cluster_id")["doc_id"].apply(set).to_dict()
    assert by_cluster == {3: {3, 4, 5}, 10: {10, 11}, 20: {20, 21, 22}}
    keepers = set(out.loc[out["is_keeper"] == 1, "doc_id"])
    assert keepers == {3, 10, 20}


def test_long_chain_pointer_doubling(ray_session):
    # diameter 40: hop-only propagation needs 40 rounds; with pointer
    # doubling the loop converges well inside the 30-round cap
    n = 41
    out = _run(
        pd.DataFrame(
            {"doc_a": np.arange(n - 1) + 100, "doc_b": np.arange(1, n) + 100}
        )
    )
    assert len(out) == n
    assert (out["cluster_id"] == 100).all()
    assert out["is_keeper"].sum() == 1


def test_duplicate_and_reversed_pairs(ray_session):
    # the same edge listed twice / in both orders must not disturb anything
    out = _run(pd.DataFrame({"doc_a": [1, 2, 2], "doc_b": [2, 1, 3]}))
    assert out["cluster_id"].tolist() == [1, 1, 1]


def test_neardup_clusters_contains_augmented_copies(ray_session):
    """Every augmented near-dup copy (doc_id+2_000_000) must share a cluster
    with its original, with the original as keeper (min id)."""
    from docling_serve_ray.ops.cluster import neardup_clusters

    out = neardup_clusters(SF).to_pandas()
    lookup = out.set_index("doc_id")["cluster_id"].to_dict()
    copies = [d for d in lookup if d >= 2_000_000]
    assert copies, "augmentation should produce near-dup pairs"
    for c in copies:
        orig = c - 2_000_000
        assert lookup.get(orig) == lookup[c]
        assert lookup[c] <= orig  # keeper is the min id of the component
    keepers = out.loc[out["is_keeper"] == 1, "doc_id"]
    assert (keepers == out.loc[out["is_keeper"] == 1, "cluster_id"]).all()
