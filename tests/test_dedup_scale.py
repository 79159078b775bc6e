"""Scale-path tests for the dedup suite (VERDICT r01 items 1/2):

- DF-capped ngram_jaccard candidates + exact verify equals the uncapped
  exact path when no shingle exceeds the cap.
- A corpus with one boilerplate shingle shared by EVERY doc completes
  under the cap without quadratic pair emission (the uncapped path would
  emit ~n²/2 pair rows from that single shingle).
- embedding_neardup's LSH path finds exact-copy pairs on a synthetic table
  (recall 1 for identical vectors: identical sign bits in every band).
"""

import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _pairs(ds):
    df = ds.to_pandas()
    return sorted(map(tuple, df[["doc_a", "doc_b"]].to_numpy().tolist()))


class TestNgramDFCap:
    def test_capped_equals_uncapped_when_cap_unreached(self, ray_session):
        from docling_serve_ray.ops.dedup import ngram_jaccard_dedup

        base = ngram_jaccard_dedup(SF).to_pandas()
        capped = ngram_jaccard_dedup(SF, max_shingle_df=1_000_000).to_pandas()
        key = ["doc_a", "doc_b", "jaccard_micro"]
        assert sorted(map(tuple, base[key].to_numpy().tolist())) == sorted(
            map(tuple, capped[key].to_numpy().tolist())
        )

    def test_boilerplate_shingle_no_quadratic_blowup(self, ray_session, tmp_path):
        """400 docs, every one sharing the same leading boilerplate shingle;
        docs 2k/2k+1 are real near-dups. Uncapped, the boilerplate shingle
        alone emits C(400·1.x, 2) ≈ 90k pair rows; capped candidates come
        only from the content shingles, and exact verification still finds
        exactly the near-dup pairs."""
        from docling_serve_ray.ops.dedup import ngram_jaccard_dedup

        n = 400
        boiler = "all rights reserved"
        ids, texts = [], []
        for i in range(n):
            # disjoint per-pair vocab; pair (2k, 2k+1) differs by one word
            words = [f"w{i // 2}n{j}" for j in range(12)]
            if i % 2:
                words[-1] = "changed"
            ids.append(i)
            texts.append(boiler + " " + " ".join(words))
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts}),
            tmp_path / "documents.parquet",
        )

        t0 = time.monotonic()
        res = ngram_jaccard_dedup(str(tmp_path), max_shingle_df=16).to_pandas()
        elapsed = time.monotonic() - t0
        got = sorted(map(tuple, res[["doc_a", "doc_b", "jaccard_micro"]].to_numpy().tolist()))
        # the boilerplate shingle alone links cross-family docs only at
        # J = 1/(12+12-1) << 0.5, so dropping it loses no pair: capped
        # equals the exact uncapped result (which pays the ~C(440,2)
        # boilerplate self-merge this path avoids)
        exact = ngram_jaccard_dedup(str(tmp_path)).to_pandas()
        want = sorted(map(tuple, exact[["doc_a", "doc_b", "jaccard_micro"]].to_numpy().tolist()))
        assert got == want
        pair_set = {(a, b) for a, b, _ in got}
        assert all((2 * k, 2 * k + 1) in pair_set for k in range(n // 2))
        assert elapsed < 120


class TestEmbeddingNeardupLSH:
    def test_copy_pairs_found_on_synthetic_table(self, ray_session, tmp_path):
        from docling_serve_ray.ops.similarity import embedding_neardup

        rng = np.random.RandomState(3)
        n, dim = 300, 64
        X = rng.normal(size=(n, dim)).astype(np.float32)
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(np.arange(n), pa.int64()),
                    "embedding": pa.array(X.tolist(), pa.list_(pa.float32())),
                    "label": pa.array(np.zeros(n, dtype=np.int32), pa.int32()),
                }
            ),
            tmp_path / "embeddings.parquet",
        )
        res = embedding_neardup(str(tmp_path)).to_pandas()
        got = sorted(map(tuple, res[["vec_a", "vec_b"]].to_numpy().tolist()))
        # augmentation: vec_id % 10 == 0 gets an exact copy at +1_000_000;
        # random 64-dim vectors produce no other pairs at cosine >= 0.99
        want = sorted((i, i + 1_000_000) for i in range(0, n, 10))
        assert got == want

    def test_no_driver_materialization(self):
        """The similarity module's neardup path must not take_all() the
        embeddings table (the round-1 scale-killer)."""
        import inspect

        from docling_serve_ray.ops import similarity

        src = inspect.getsource(similarity.embedding_neardup)
        assert "take_all" not in src


class TestScaledBuckets:
    def test_bucket_count_grows_with_input(self):
        from docling_serve_ray.ops.shuffle import scaled_num_buckets

        small = scaled_num_buckets(10 * 1024**3)
        big = scaled_num_buckets(20 * 1024**3)
        assert big == 2 * small
        # floors and ceilings
        assert scaled_num_buckets(0) == 64
        assert scaled_num_buckets(1) == 64
        assert scaled_num_buckets(1 << 60) == 1 << 16

    def test_input_bytes_estimate_counts_files(self, tmp_path):
        from docling_serve_ray.ops.shuffle import input_bytes_estimate

        (tmp_path / "a.parquet").write_bytes(b"x" * 1000)
        (tmp_path / "b.parquet").write_bytes(b"x" * 500)
        assert input_bytes_estimate(str(tmp_path)) == 1500 * 4
        assert input_bytes_estimate(str(tmp_path / "a.parquet")) == 1000 * 4


def test_containment_catches_quoted_subset_jaccard_misses(ray_session, tmp_path):
    """A short doc quoted verbatim inside a much longer one: containment
    (min denominator) fires, Jaccard (union denominator) does not — the
    directed signal is the op's reason to exist. Oracle-checked on a
    purpose-built corpus."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_serve_ray.ops.dedup import (
        NGRAM_CONTAINMENT_SQL,
        ngram_containment,
        ngram_jaccard_dedup,
    )

    short = " ".join(f"tok{i}" for i in range(30))
    long = short + " " + " ".join(f"pad{i}" for i in range(300))
    other = " ".join(f"zzz{i}" for i in range(40))
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([short, long, other]),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["t"] * 3),
            "n_chars": pa.array([len(short), len(long), len(other)], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")

    cont = ngram_containment(str(tmp_path)).to_pandas()
    jac = ngram_jaccard_dedup(str(tmp_path)).to_pandas()
    assert [(1, 2)] == list(zip(cont["doc_a"], cont["doc_b"]))
    assert cont["containment_micro"].iloc[0] == 1_000_000  # fully contained
    jac_pairs = (
        set(zip(jac["doc_a"], jac["doc_b"])) if "doc_a" in jac.columns else set()
    )
    assert (1, 2) not in jac_pairs

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.sql(NGRAM_CONTAINMENT_SQL).df().sort_values(["doc_a", "doc_b"])
    got = cont.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    assert got.values.tolist() == want.values.tolist()


def test_paragraph_dedup_apply_drops_repeat_only_doc(ray_session, tmp_path):
    """A document consisting ONLY of paragraphs first seen elsewhere must
    vanish from the rebuilt corpus; a partial-overlap doc keeps exactly
    its novel paragraphs, in order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_serve_ray.ops.dedup import paragraph_dedup_apply

    para_a = " ".join(f"a{i}" for i in range(20))
    para_b = " ".join(f"b{i}" for i in range(20))
    para_c = " ".join(f"c{i}" for i in range(20))
    docs = {
        1: f"{para_a} {para_b}",          # owns a and b
        2: f"{para_a} {para_c}",          # a is a repeat -> keeps only c
        3: f"{para_a} {para_b}",          # nothing novel -> vanishes
    }
    tbl = pa.table(
        {
            "doc_id": pa.array(list(docs), pa.int64()),
            "text": pa.array(list(docs.values())),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["t"] * 3),
            "n_chars": pa.array([len(t) for t in docs.values()], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")

    out = paragraph_dedup_apply(str(tmp_path)).to_pandas()
    got = dict(zip(out["doc_id"], out["clean_text"]))
    assert got == {1: f"{para_a} {para_b}", 2: para_c}
    assert dict(zip(out["doc_id"], out["n_kept"])) == {1: 2, 2: 1}
