"""Unit tests for ops/curation.py with crafted adversarial rows (the
corpus-vs-oracle equality runs in test_ops.py / check_correctness.py)."""

import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")


def _write_docs(tmp_path, rows):
    """rows: list of (doc_id, text[, lang, source])."""
    full = [
        (r[0], r[1], r[2] if len(r) > 2 else "en", r[3] if len(r) > 3 else "src1")
        for r in rows
    ]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in full], pa.int64()),
            "text": pa.array([r[1] for r in full], pa.string()),
            "lang": pa.array([r[2] for r in full], pa.string()),
            "source": pa.array([r[3] for r in full], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in full], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


WORDS30 = " ".join(f"tok{i % 9} word{i}" for i in range(15))  # 30 tokens, distinct-ish


class TestQualityFilter:
    def test_each_rule_fires_independently(self, ray_session, tmp_path):
        from docling_serve_ray.ops.curation import quality_filter

        rows = [
            (1, "the a " + " ".join(f"word{i}" for i in range(28))),  # passes all
            (2, "the a short doc"),  # < 20 words -> r_nwords=0
            (3, "the a " + " ".join("x" for _ in range(28))),  # mean len < 3, repetition
            (4, " ".join(f"word{i}" for i in range(30))),  # no stopwords -> r_stop=0
            (5, "the a " + " ".join("verylongtoken" * 2 for _ in range(28))),  # mean len > 10
        ]
        sf = _write_docs(tmp_path, rows)
        out = (
            quality_filter(sf).to_pandas().set_index("doc_id").sort_index()
        )
        assert out.loc[1, "passes"] == 1
        assert out.loc[2, "r_nwords"] == 0 and out.loc[2, "passes"] == 0
        assert out.loc[3, "r_wordlen"] == 0 and out.loc[3, "r_distinct"] == 0
        assert out.loc[4, "r_stop"] == 0
        assert out.loc[5, "r_wordlen"] == 0


class TestWeightedMix:
    def test_deterministic_and_rate_monotone(self, ray_session, tmp_path):
        from docling_serve_ray.ops.curation import weighted_mix

        # src0 keeps 3/16, src9 keeps 12/16 of the same id population
        rows = [(i, "t", "en", "src0") for i in range(0, 400, 2)] + [
            (i, "t", "en", "src9") for i in range(1, 400, 2)
        ]
        sf = _write_docs(tmp_path, rows)
        a = weighted_mix(sf).to_pandas()
        b = weighted_mix(sf).to_pandas()
        key = lambda d: sorted(map(tuple, d.to_numpy().tolist()))
        assert key(a) == key(b)  # rerun-identical
        frac0 = (a["source"] == "src0").sum() / 200
        frac9 = (a["source"] == "src9").sum() / 200
        assert frac0 < frac9  # 3/16 vs 12/16
        assert 0.05 < frac0 < 0.35 and 0.55 < frac9 < 0.95


class TestDupNgramCoverage:
    def test_shared_and_internal_ngrams(self, ray_session, tmp_path):
        from docling_serve_ray.ops.curation import dup_ngram_coverage

        shared = "alpha beta gamma delta epsilon"  # one shared 5-gram
        rows = [
            (1, shared + " u1 u2 u3 u4 u5"),
            (2, shared + " v1 v2 v3 v4 v5"),
            # internal repeat: same 5-gram twice within ONE doc only
            (3, "p q r s t zz p q r s t"),
            (4, "only four words here unique1 unique2"),
        ]
        sf = _write_docs(tmp_path, rows)
        out = dup_ngram_coverage(sf).to_pandas().set_index("doc_id").sort_index()
        # docs 1/2: 6 positional 5-grams each, exactly 1 is cross-doc shared
        assert out.loc[1, "n_ngrams"] == 6 and out.loc[1, "dup_positions"] == 1
        assert out.loc[2, "n_ngrams"] == 6 and out.loc[2, "dup_positions"] == 1
        # doc 3: 7 positions, 'p q r s t' occurs twice but only in this doc
        assert out.loc[3, "n_ngrams"] == 7 and out.loc[3, "dup_positions"] == 0
        assert out.loc[4, "dup_positions"] == 0

    def test_short_docs_excluded(self, ray_session, tmp_path):
        from docling_serve_ray.ops.curation import dup_ngram_coverage

        sf = _write_docs(tmp_path, [(1, "one two three four"), (2, "a b c d e")])
        out = dup_ngram_coverage(sf).to_pandas()
        assert set(out["doc_id"]) == {2}  # doc 1 has < 5 tokens


class TestKeywordSearch:
    def test_tf_scoring_and_deterministic_ties(self, ray_session, tmp_path):
        from docling_serve_ray.ops.curation import keyword_search

        rows = [(i, "spark hash filler%d" % i) for i in range(30)]  # all score 2
        rows.append((99, "spark spark hash merge sort"))  # score 5
        sf = _write_docs(tmp_path, rows)
        out = keyword_search(sf).to_pandas()
        assert len(out) == 20
        assert out.iloc[0]["doc_id"] == 99 and out.iloc[0]["score"] == 5
        # tie at score 2 must cut deterministically by ascending doc_id
        assert sorted(out["doc_id"][1:]) == list(range(19))


class TestDedupApply:
    def test_exact_then_near_then_survivors(self, ray_session, tmp_path):
        from docling_serve_ray.ops.curation import dedup_apply

        base = " ".join(f"w{i} t{i % 5}" for i in range(20))  # 40 tokens
        # ids chosen to dodge the %7/%10 augmentation (adds nothing here)
        rows = [
            (1, base + " uniq-one"),
            (2, base + " uniq-one"),        # exact dup of 1 -> dropped
            (3, base + " uniq-three"),      # near-dup of 1 (1 token differs)
            (5, "totally different short text with enough words to shingle ok"),
        ]
        sf = _write_docs(tmp_path, rows)
        kept = sorted(dedup_apply(sf).to_pandas()["doc_id"].tolist())
        # 2 dropped by exact stage; 3 clustered with 1 -> min-keeper 1; 5 free
        assert kept == [1, 5]

    def test_survivor_spill_dir_matches_materialize(self, ray_session, tmp_path):
        from docling_serve_ray.ops.curation import dedup_apply

        base = " ".join(f"w{i} t{i % 5}" for i in range(20))
        rows = [(1, base + " uniq-one"), (2, base + " uniq-one"), (5, base + " uniq-five")]
        (tmp_path / "sf").mkdir(exist_ok=True)
        sf = _write_docs(tmp_path / "sf", rows)
        a = sorted(dedup_apply(sf).to_pandas()["doc_id"].tolist())
        b = sorted(
            dedup_apply(sf, survivor_spill_dir=str(tmp_path / "spill"))
            .to_pandas()["doc_id"]
            .tolist()
        )
        assert a == b

    def test_no_duplicates_keeps_everything(self, ray_session, tmp_path):
        """A corpus with zero near-dup pairs must be a valid result, not a
        crash: the empty candidate side reaches Ray's hash join as a
        schema-less table without the sentinel seeding in
        ops/shuffle.join_pair_payloads (ArrowInvalid FieldRef)."""
        from docling_serve_ray.ops.curation import dedup_apply

        rows = [
            (i, " ".join(f"doc{i}tok{j} uniq{i}x{j}" for j in range(20)))
            for i in (1, 2, 3)
        ]
        sf = _write_docs(tmp_path, rows)
        kept = sorted(dedup_apply(sf).to_pandas()["doc_id"].tolist())
        assert kept == [1, 2, 3]

    def test_augmentation_rules_applied(self, ray_session, tmp_path):
        from docling_serve_ray.ops.curation import dedup_apply

        base = " ".join(f"q{i} z{i % 4}" for i in range(25))
        # id 70 triggers BOTH families: +1M exact copy and +2M near copy
        sf = _write_docs(tmp_path, [(70, base)])
        kept = sorted(dedup_apply(sf).to_pandas()["doc_id"].tolist())
        assert kept == [70]  # copies at 1000070 / 2000070 both dropped


def test_normalize_text_adversarial(ray_session, tmp_path):
    """Decomposed unicode composes (NFC), whitespace runs collapse,
    padding trims, all-whitespace empties — identically to the SQL twin."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_serve_ray.ops.curation import NORMALIZE_TEXT_SQL, normalize_text

    texts = [
        "e\u0301cole",  # decomposed é → composed (shorter)
        "a  b\tc\nd\r\ne",   # mixed whitespace runs
        "  padded  ",
        " \t\n ",            # all whitespace → empty
        "already clean",
    ]
    pq.write_table(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
        ),
        tmp_path / "documents.parquet",
    )
    got = (
        normalize_text(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.sql(NORMALIZE_TEXT_SQL).df().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )
    assert got.loc[0, "text"] == "école"  # composed, one char shorter
    assert got.loc[0, "changed"] == 1
    assert got.loc[0, "n_chars_removed"] == 1
    assert got.loc[1, "text"] == "a b c d e"
    assert got.loc[3, "text"] == ""
    assert got.loc[4, "changed"] == 0


def test_weighted_mix_explicit_weights_file(ray_session, tmp_path):
    """weights_path parquet drives the rates (real deployment shape);
    sources absent from the table keep nothing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_serve_ray.ops.curation import weighted_mix

    rows = (
        [(i, "t", "en", "keepall") for i in range(100)]
        + [(i + 100, "t", "en", "keepnone") for i in range(100)]
        + [(i + 200, "t", "en", "unlisted") for i in range(100)]
    )
    sf = _write_docs(tmp_path, rows)
    wp = tmp_path / "weights.parquet"
    pq.write_table(
        pa.table({"source": ["keepall", "keepnone"], "rate16": [16, 0]}), wp
    )
    out = weighted_mix(sf, weights_path=str(wp)).to_pandas()
    assert (out["source"] == "keepall").sum() == 100
    assert (out["source"] == "keepnone").sum() == 0
    assert (out["source"] == "unlisted").sum() == 0
