"""StreamingDedupIndex: cross-run mutable membership — the raw-actor
escape hatch (everything else is Dataset-first)."""

import pandas as pd
import ray.data


def _ds(texts, start_id=0):
    return ray.data.from_pandas(
        pd.DataFrame(
            {"doc_id": range(start_id, start_id + len(texts)), "text": texts}
        )
    )


class TestStreamingDedupIndex:
    def test_cross_run_dedup(self, ray_session):
        from docling_serve_ray.state.dedup_index import StreamingDedupIndex

        idx = StreamingDedupIndex(num_shards=4)
        first = idx.dedup(_ds(["aa", "bb", "cc"])).to_pandas()
        assert sorted(first["text"]) == ["aa", "bb", "cc"]
        # second RUN: overlap with the first run must be dropped — state
        # survives across Datasets, which no groupby can express
        second = idx.dedup(_ds(["bb", "dd", "aa", "ee"], 100)).to_pandas()
        assert sorted(second["text"]) == ["dd", "ee"]
        assert idx.size() == 5

    def test_within_batch_and_concurrent_duplicates(self, ray_session):
        from docling_serve_ray.state.dedup_index import StreamingDedupIndex

        idx = StreamingDedupIndex(num_shards=2)
        # 40 copies of the same text spread over several blocks processed
        # concurrently: exactly ONE survivor globally (actor serialization)
        texts = ["same content"] * 40 + [f"unique {i}" for i in range(10)]
        ds = _ds(texts).repartition(8)
        out = idx.dedup(ds).to_pandas()
        assert (out["text"] == "same content").sum() == 1
        assert len(out) == 11

    def test_mark_new_column(self, ray_session):
        from docling_serve_ray.state.dedup_index import StreamingDedupIndex

        idx = StreamingDedupIndex(num_shards=2)
        marked = idx.mark_new(_ds(["x", "y", "x"])).to_pandas()
        by_id = marked.sort_values("doc_id")["is_first"].tolist()
        assert by_id == [1, 1, 0]  # in-batch duplicate is not first
