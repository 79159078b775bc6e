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

    def test_save_kill_restore(self, ray_session, tmp_path):
        """VERDICT r03 #3: cross-run must mean cross-RESTART. Snapshot the
        index, hard-kill every shard actor (the restart analog), restore
        from the snapshot: previously-seen content still marks is_first=0
        and new content is still first exactly once."""
        import os

        import ray

        from docling_serve_ray.state.dedup_index import StreamingDedupIndex

        snap = str(tmp_path / "dedup_index")
        idx = StreamingDedupIndex(num_shards=4)
        idx.dedup(_ds(["aa", "bb", "cc", "dd"])).to_pandas()
        manifest = idx.save(snap)
        assert manifest == {"num_shards": 4, "counts": manifest["counts"], "total": 4}
        assert os.path.exists(os.path.join(snap, "_INDEX_MANIFEST.json"))

        for s in idx.shards:  # the restart: all in-RAM state is gone
            ray.kill(s)

        idx2 = StreamingDedupIndex.load(snap)
        assert idx2.size() == 4
        out = idx2.dedup(_ds(["bb", "ee", "aa", "ff"], 100)).to_pandas()
        assert sorted(out["text"]) == ["ee", "ff"]  # old content still known

        # a second save must atomically REPLACE the first snapshot
        idx2.save(snap)
        idx3 = StreamingDedupIndex.load(snap)
        assert idx3.size() == 6

    def test_load_reshard(self, ray_session, tmp_path):
        """Restoring into a different shard count re-routes fingerprints by
        the new modulus — same membership answers, different layout."""
        from docling_serve_ray.state.dedup_index import StreamingDedupIndex

        snap = str(tmp_path / "dedup_index")
        idx = StreamingDedupIndex(num_shards=2)
        idx.dedup(_ds([f"doc {i}" for i in range(20)])).to_pandas()
        idx.save(snap)

        wide = StreamingDedupIndex.load(snap, num_shards=8)
        assert wide.num_shards == 8 and wide.size() == 20
        out = wide.dedup(
            _ds([f"doc {i}" for i in range(15, 25)], 100)
        ).to_pandas()
        assert sorted(out["text"]) == [f"doc {i}" for i in range(20, 25)]
