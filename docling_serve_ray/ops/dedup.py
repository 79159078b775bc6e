"""Deduplication suite: exact, MinHash+LSH, n-gram Jaccard, SimHash.

The driver's test corpus contains no duplicates, so each op first applies a
deterministic augmentation (shared literally with the SQL oracles):

- exact copies:  every doc with doc_id % 7 == 0 gets a copy at doc_id+1_000_000
- near-dup copies: every doc with doc_id % 10 == 0 gets a copy at
  doc_id+2_000_000 with ``' extra token appended'`` suffixed (high-Jaccard pair)

Scale notes (10^12-doc design):
- exact_dedup: hash → groupby(hash) → min-keeper. One shuffle of (hash, id)
  pairs only, never payloads.
- ngram_jaccard: shingle-explode → groupby(shingle) pair-emit →
  groupby(pair) count — the classic distributed inverted-index join. Shingle
  rows carry 64-bit hashes, not strings, to keep the shuffle thin.
- minhash LSH: per-doc signatures are embarrassingly parallel; candidates
  come from a groupby on (band, band_key); candidate verification is exact
  Jaccard so the final pair set is LSH-parameter-independent (given recall),
  which is what makes the SQL oracle (exact pairs at the same τ) valid.
  32 bands × 4 rows → P(miss) = (1-J⁴)³² ≈ 1.5e-4 at exactly J = 0.7 (the
  op's threshold) and ≤ 4.8e-8 at J ≥ 0.8; the augmented test pairs sit at
  J ≈ 0.97+ where P(miss) < 1e-40, so oracle equality holds in practice.
- simhash: TF-weighted 64-bit sketch, 4×16-bit chunk banding (pigeonhole:
  hamming ≤ 3 ⇒ ≥ 1 chunk equal), verify hamming on candidates. SQL twin
  SIMHASH_PAIRS_SQL: DuckDB's md5_number_upper equals _md5_64's
  little-endian fold, and full pigeonhole recall makes the banded op equal
  the brute-force pair set.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

JACCARD_THRESHOLD = 0.5
MINHASH_THRESHOLD = 0.7  # minhash reports pairs above a HIGHER bar: LSH
                         # recall at the 0.5 floor cannot be driven to ~1;
                         # with 32x4 banding P(miss) is 1.5e-4 at exactly
                         # J=0.7, <=4.8e-8 at J>=0.8 (test pairs: J~0.97)
SHINGLE_K = 3
NUM_PERM = 128
LSH_BANDS = 32
LSH_ROWS = 4  # bands * rows == NUM_PERM
SIMHASH_BITS = 64
SIMHASH_MAX_HAMMING = 3

_MERSENNE = (1 << 61) - 1


def _docs(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )


def _augment_exact(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    out_id, out_text = list(ids), list(texts)
    for i, t in zip(ids, texts):
        if i % 7 == 0:
            out_id.append(i + 1_000_000)
            out_text.append(t)
    return pa.table({"doc_id": pa.array(out_id, pa.int64()), "text": pa.array(out_text, pa.string())})


def _augment_neardup(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    out_id, out_text = list(ids), list(texts)
    for i, t in zip(ids, texts):
        if i % 10 == 0:
            out_id.append(i + 2_000_000)
            out_text.append(t + " extra token appended")
    return pa.table({"doc_id": pa.array(out_id, pa.int64()), "text": pa.array(out_text, pa.string())})


def _md5_64(s: str) -> int:
    """First 8 md5 bytes as little-endian uint64 — bit-identical to
    DuckDB's md5_number_upper(), which is what makes the simhash SQL
    oracle possible (any injective 64-bit fold works for the ops
    themselves; this one is the SQL-reachable choice)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little", signed=False)


# Per-process token→hash memo: corpus vocabularies repeat heavily (words by
# orders of magnitude, shingles by duplication + the near-dup augmentation,
# and minhash hashes every shingle TWICE — band rows and the verify-side
# shingle-set table). Values are bit-identical (_md5_64 fills misses); the
# cap bounds worker memory and simply resets on overflow (memo, not state).
_MD5_MEMO: dict = {}
_MD5_MEMO_CAP = 1 << 21


def _md5_64_memo(s: str) -> int:
    h = _MD5_MEMO.get(s)
    if h is None:
        if len(_MD5_MEMO) >= _MD5_MEMO_CAP:
            _MD5_MEMO.clear()
        h = _MD5_MEMO[s] = _md5_64(s)
    return h


def _shingle_hashes(text: str) -> np.ndarray:
    """Distinct 3-word shingles → uint64 hashes (memoized per process)."""
    words = text.split(" ")
    shingles = {
        " ".join(words[i : i + SHINGLE_K]) for i in range(len(words) - SHINGLE_K + 1)
    }
    if not shingles:
        return np.empty(0, dtype=np.uint64)
    return np.fromiter((_md5_64_memo(s) for s in shingles), dtype=np.uint64)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

EXACT_DEDUP_SQL = """
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
)
SELECT md5(text) AS fp,
       MIN(doc_id) AS keeper,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM aug GROUP BY md5(text)
"""


def exact_dedup(sf_dir: str) -> ray.data.Dataset:
    """Content-hash dedup: one row per distinct content with the minimum
    doc_id as the keeper. Shuffle carries (fp, doc_id) only; the grouped
    reduce is bucketed (fp cardinality ≈ n_docs — see ops/shuffle.py)."""
    from .shuffle import bucketed_group_agg

    def add_fp(batch: pa.Table) -> pa.Table:
        aug = _augment_exact(batch)
        fps = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in aug["text"].to_pylist()]
        return pa.table({"fp": pa.array(fps, pa.string()), "doc_id": aug["doc_id"]})

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("fp", as_index=False).agg(
            keeper=("doc_id", "min"), n_copies=("doc_id", "size")
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("fp", as_index=False).agg(
            keeper=("keeper", "min"), n_copies=("n_copies", "sum")
        )
        out["n_copies"] = out["n_copies"].astype("int64")
        return out

    ds = _docs(sf_dir).map_batches(add_fp, batch_format="pyarrow")
    return bucketed_group_agg(ds, ["fp"], final, partial_fn=partial)


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard pairs (shared oracle for minhash_dedup too)
# ---------------------------------------------------------------------------

JACCARD_PAIRS_SQL = """
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000, text || ' extra token appended'
  FROM documents WHERE doc_id % 10 = 0
),
w AS (SELECT doc_id, string_split(text, ' ') AS words FROM aug),
sh AS (
  SELECT DISTINCT doc_id,
         words[i+1] || ' ' || words[i+2] || ' ' || words[i+3] AS shingle
  FROM w, LATERAL (SELECT UNNEST(generate_series(0, len(words)-3)) AS i)
),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter_n
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       CAST(floor(inter_n * 1000000.0 / (ca.n + cb.n - inter_n) + 0.5) AS BIGINT)
         AS jaccard_micro
FROM inter
JOIN cnt ca ON ca.doc_id = inter.doc_a
JOIN cnt cb ON cb.doc_id = inter.doc_b
WHERE inter_n * 1.0 / (ca.n + cb.n - inter_n) >= 0.5
"""

# Same pair computation at the minhash op's higher threshold.
MINHASH_PAIRS_SQL = JACCARD_PAIRS_SQL.replace(">= 0.5", ">= 0.7")


def _shingle_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → exploded (shingle_h, doc_id, n) distinct rows.

    ``n`` = the document's TOTAL distinct-shingle count, known at explode
    time and carried on every shingle row (one extra int per row through
    the shuffle). Union sizes for the Jaccard denominator then ride along
    with the pair emission — no per-doc count table, no broadcast, no
    join."""
    aug = _augment_neardup(batch)
    out_h: list[np.ndarray] = []
    out_d: list[int] = []
    out_n: list[int] = []
    for d, t in zip(aug["doc_id"].to_pylist(), aug["text"].to_pylist()):
        hs = _shingle_hashes(t)
        out_h.append(hs)
        out_d.extend([d] * len(hs))
        out_n.extend([len(hs)] * len(hs))
    return pa.table(
        {
            "shingle_h": pa.array(
                np.concatenate(out_h) if out_h else np.empty(0, np.uint64)
            ),
            "doc_id": pa.array(out_d, pa.int64()),
            "n": pa.array(out_n, pa.int32()),
        }
    )


def _shingle_set_table(sf_dir: str) -> ray.data.Dataset:
    """(id, hashes) Dataset: augmented doc_id → distinct shingle hashes as
    packed uint64 bytes (Ray's hash join does not support list-typed
    non-key fields; binary payloads are fine). The join side of exact
    Jaccard verification, shared by minhash_dedup and DF-capped
    ngram_jaccard_dedup."""

    def sets(batch: pa.Table) -> pa.Table:
        aug = _augment_neardup(batch)
        return pa.table(
            {
                "id": aug["doc_id"],
                "hashes": pa.array(
                    [_shingle_hashes(t).tobytes() for t in aug["text"].to_pylist()],
                    pa.binary(),
                ),
            }
        )

    return _docs(sf_dir).map_batches(sets, batch_format="pyarrow")


def _exact_jaccard_verify(
    joined: ray.data.Dataset, threshold: float
) -> ray.data.Dataset:
    """Vectorized-per-candidate exact Jaccard over a join_pair_payloads
    result carrying packed shingle sets → (doc_a, doc_b, jaccard_micro)."""

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        ha_col = "hashes" if "hashes" in batch.columns else "hashes_a"
        rows = []
        for doc_a, doc_b, ha, hb in zip(
            batch["id_a"], batch["id_b"], batch[ha_col], batch["hashes_b"]
        ):
            sa = np.frombuffer(ha, dtype=np.uint64)
            sb = np.frombuffer(hb, dtype=np.uint64)
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            if union and inter / union >= threshold:
                rows.append(
                    (int(doc_a), int(doc_b), int(inter * 1_000_000.0 / union + 0.5))
                )
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard_micro"]).astype(
            {"doc_a": "int64", "doc_b": "int64", "jaccard_micro": "int64"}
        )

    return joined.map_batches(verify, batch_format="pandas").select_columns(
        ["doc_a", "doc_b", "jaccard_micro"]
    )


NUM_BUCKETS = 512  # groupby key-space reduction: millions of per-shingle
                   # groups → NUM_BUCKETS groups, each processed with ONE
                   # vectorized pandas self-merge (per-group Python overhead
                   # is the scaling killer for fine-grained map_groups)


def _pair_intersections(sh: ray.data.Dataset) -> ray.data.Dataset:
    """Exploded shingle rows → per-pair (doc_a, doc_b, inter_n, n_a, n_b)
    via the bucketed inverted-index self-join: groupby(shingle bucket) with
    one vectorized pandas self-merge per bucket, then a bucketed pair-count
    reduce. Per-doc totals ride the shingle rows, so the output carries
    everything any set-overlap measure (Jaccard, containment) needs — the
    shared middle of ngram_jaccard_dedup and ngram_containment."""
    from .shuffle import bucketed_group_agg

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = pa.array(
            (batch["shingle_h"].to_numpy(zero_copy_only=False) % NUM_BUCKETS).astype("int32")
        )
        return batch.append_column("bucket", b)

    def pairs_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = ["shingle_h", "doc_id", "n"]
        m = g[cols].merge(g[cols], on="shingle_h")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        return pd.DataFrame(
            {
                "doc_a": m["doc_id_x"].astype("int64"),
                "doc_b": m["doc_id_y"].astype("int64"),
                "n_a": m["n_x"].astype("int32"),
                "n_b": m["n_y"].astype("int32"),
            }
        )

    pairs = (
        sh.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_of_bucket, batch_format="pandas")
    )

    def count_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(["doc_a", "doc_b"], as_index=False).agg(
            pn=("doc_a", "size"), n_a=("n_a", "first"), n_b=("n_b", "first")
        )

    def count_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["doc_a", "doc_b"], as_index=False).agg(
            inter_n=("pn", "sum"), n_a=("n_a", "first"), n_b=("n_b", "first")
        )
        out["inter_n"] = out["inter_n"].astype("int64")
        return out

    return bucketed_group_agg(
        pairs, ["doc_a", "doc_b"], count_final, partial_fn=count_partial
    )


def ngram_jaccard_dedup(
    sf_dir: str, *, max_shingle_df: int | None = None
) -> ray.data.Dataset:
    """Exact Jaccard ≥ 0.5 pairs via distributed inverted-index join.

    Default path (max_shingle_df=None, exact recall): shingle-explode →
    bucketed groupby(shingle) pair-emit (vectorized self-merge per bucket)
    → groupby(pair) count → jaccard. Per-doc shingle totals ride on the
    shingle rows themselves (one int per row), so union sizes need no
    broadcast, no count table, and no join — nothing materializes on the
    driver and no extra shuffle stage exists.

    Capped path (max_shingle_df=k, the 100-TB web-corpus setting): a
    shingle shared by k docs emits k² pair rows, and boilerplate shingles
    reach k ~ 10^6, so candidate generation drops shingles whose posting
    list exceeds the cap (applied locally inside the bucket — each bucket
    holds complete posting lists, so no extra shuffle) and candidates are
    then verified with EXACT Jaccard via joins against the shingle-set
    table. Emitted values are exact regardless of the cap; a pair is missed
    only if EVERY shingle it shares is above the cap (standard
    inverted-index-join practice; document-level recall effect)."""
    from .shuffle import (
        band_pair_candidates,
        bucketed_group_agg,
        input_bytes_estimate,
        join_pair_payloads,
    )

    sh = _docs(sf_dir).map_batches(_shingle_rows, batch_format="pyarrow")

    if max_shingle_df is not None:
        cand = band_pair_candidates(
            sh.select_columns(["shingle_h", "doc_id"]),
            ["shingle_h"],
            "doc_id",
            max_band_df=max_shingle_df,
        )
        joined = join_pair_payloads(
            cand,
            _shingle_set_table(sf_dir),
            size_bytes=input_bytes_estimate(f"{sf_dir}/documents.parquet"),
        )
        return _exact_jaccard_verify(joined, JACCARD_THRESHOLD)

    inter = _pair_intersections(sh)

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        union = batch["n_a"].astype("int64") + batch["n_b"] - batch["inter_n"]
        keep = batch["inter_n"] / union >= JACCARD_THRESHOLD
        return pd.DataFrame(
            {
                "doc_a": batch.loc[keep, "doc_a"].astype("int64"),
                "doc_b": batch.loc[keep, "doc_b"].astype("int64"),
                "jaccard_micro": np.floor(
                    batch.loc[keep, "inter_n"] * 1_000_000.0 / union[keep] + 0.5
                ).astype("int64"),
            }
        )

    return inter.map_batches(finalize, batch_format="pandas").select_columns(
        ["doc_a", "doc_b", "jaccard_micro"]
    )


# ---------------------------------------------------------------------------
# n-gram containment (directed subset / quote detection)
# ---------------------------------------------------------------------------

# containment C = inter / min(|A|,|B|) ≥ 0.8, evaluated as the INTEGER
# predicate inter*5 ≥ 4*min — no float comparison crosses engines.
CONTAINMENT_NUM, CONTAINMENT_DEN = 4, 5

NGRAM_CONTAINMENT_SQL = """
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000, text || ' extra token appended'
  FROM documents WHERE doc_id % 10 = 0
),
w AS (SELECT doc_id, string_split(text, ' ') AS words FROM aug),
sh AS (
  SELECT DISTINCT doc_id,
         words[i+1] || ' ' || words[i+2] || ' ' || words[i+3] AS shingle
  FROM w, LATERAL (SELECT UNNEST(generate_series(0, len(words)-3)) AS i)
),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter_n
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       CAST(floor(inter_n * 1000000.0 / least(ca.n, cb.n) + 0.5) AS BIGINT)
         AS containment_micro
FROM inter
JOIN cnt ca ON ca.doc_id = inter.doc_a
JOIN cnt cb ON cb.doc_id = inter.doc_b
WHERE inter_n * 5 >= 4 * least(ca.n, cb.n)
"""


def ngram_containment(sf_dir: str) -> ray.data.Dataset:
    """Shingle-containment pairs: C(A,B) = |A∩B| / min(|A|,|B|) ≥ 0.8 —
    the directed near-dup signal Jaccard misses when a short document is
    quoted inside a much longer one (the union denominator dilutes it;
    the min denominator does not). Same distributed inverted-index join
    as ngram_jaccard_dedup (shared ``_pair_intersections``), different
    threshold arithmetic — and that arithmetic is pure-integer
    (inter*5 ≥ 4*min), so the oracle comparison is exact by construction."""
    sh = _docs(sf_dir).map_batches(_shingle_rows, batch_format="pyarrow")
    inter = _pair_intersections(sh)

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        mn = np.minimum(batch["n_a"].astype("int64"), batch["n_b"].astype("int64"))
        keep = batch["inter_n"] * CONTAINMENT_DEN >= CONTAINMENT_NUM * mn
        return pd.DataFrame(
            {
                "doc_a": batch.loc[keep, "doc_a"].astype("int64"),
                "doc_b": batch.loc[keep, "doc_b"].astype("int64"),
                "containment_micro": np.floor(
                    batch.loc[keep, "inter_n"] * 1_000_000.0 / mn[keep] + 0.5
                ).astype("int64"),
            }
        )

    return inter.map_batches(finalize, batch_format="pandas").select_columns(
        ["doc_a", "doc_b", "containment_micro"]
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _perm_params() -> tuple[np.ndarray, np.ndarray]:
    """Per-permutation 64-bit seeds for the splitmix mixer. (An affine
    (a*x+b) mod p scheme with word-sized a barely wraps the modulus, so its
    ordering stays correlated with x and the min-wise property collapses —
    measured agreement 0.5 at true J 0.82. A full-avalanche mixer per
    permutation gives agreement ≈ J.)"""
    rng = np.random.RandomState(1729)
    seeds = rng.randint(0, 1 << 62, size=NUM_PERM).astype(np.uint64)
    return seeds, seeds  # second value kept for signature stability


def _splitmix64(z: np.ndarray) -> np.ndarray:
    # wrapping uint64 arithmetic == arithmetic mod 2^64 (exact in numpy)
    z = z + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _minhash_signature(hashes: np.ndarray, seeds: np.ndarray, _unused=None) -> np.ndarray:
    """sig[p] = min over shingles of splitmix64(x ^ seed_p) — (perm ×
    shingle) outer matrix, fully vectorized."""
    if len(hashes) == 0:
        return np.full(NUM_PERM, np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        v = _splitmix64(hashes[None, :].astype(np.uint64) ^ seeds[:, None])
    return v.min(axis=1)


def _batch_signatures(hash_arrays: list[np.ndarray], seeds: np.ndarray) -> np.ndarray:
    """Signatures for a whole batch of documents at once → (n_docs, NUM_PERM)
    uint64. One (NUM_PERM × total_shingles) splitmix pass over the
    concatenated hash arrays, then a segmented min (np.minimum.reduceat) per
    document — the per-doc Python loop of the naive version collapses to
    two vectorized kernels. Empty documents get the all-max signature."""
    n = len(hash_arrays)
    sigs = np.full((n, NUM_PERM), np.iinfo(np.uint64).max, dtype=np.uint64)
    lens = np.array([len(h) for h in hash_arrays], dtype=np.int64)
    nonempty = np.nonzero(lens)[0]
    if not len(nonempty):
        return sigs
    H = np.concatenate([hash_arrays[i] for i in nonempty]).astype(np.uint64)
    # reduceat segment starts; zero-length segments are excluded above
    # (reduceat mishandles empty segments)
    starts = np.concatenate([[0], np.cumsum(lens[nonempty])[:-1]])
    with np.errstate(over="ignore"):
        V = _splitmix64(H[None, :] ^ seeds[:, None])  # (NUM_PERM, S)
    sigs[nonempty] = np.minimum.reduceat(V, starts, axis=1).T
    return sigs


def _band_keys(sigs: np.ndarray) -> np.ndarray:
    """(n_docs, NUM_PERM) signatures → (n_docs, LSH_BANDS) uint64 band keys:
    each band's LSH_ROWS chunk is folded with a sequential splitmix mix —
    vectorized across the whole (docs × bands) matrix, no per-band hashing."""
    chunks = sigs.reshape(sigs.shape[0], LSH_BANDS, LSH_ROWS)
    with np.errstate(over="ignore"):
        acc = _splitmix64(chunks[:, :, 0])
        for r in range(1, LSH_ROWS):
            acc = _splitmix64(acc ^ chunks[:, :, r])
    return acc


def minhash_pairs(
    docs: ray.data.Dataset, *, size_bytes: int | None = None
) -> ray.data.Dataset:
    """MinHash(128) + LSH(32 bands × 4 rows) candidates over an arbitrary
    (doc_id, text) Dataset, verified with EXACT Jaccard ≥ 0.7 — the final
    pair set is LSH-parameter-independent (given recall), which is what
    makes the shared SQL oracle valid. Core of ``minhash_dedup`` (file +
    augmentation wrapper) and reused mid-pipeline by
    ``ops/curation.dedup_apply``.

    Fully distributed, including verification: candidate pairs are joined
    (hash-partitioned Dataset.join, ops/shuffle.join_pair_payloads) against
    the per-doc shingle-set table twice, then a vectorized stage computes
    exact Jaccard per candidate. No driver-side set materialization — the
    whole path scales with the corpus.

    The per-batch hot path is fully vectorized: one splitmix pass over the
    batch's concatenated shingle hashes + a segmented min for signatures
    (_batch_signatures), and a (docs × bands) uint64 fold for band keys
    (_band_keys) — no per-doc/per-band Python hashing."""
    seeds, _ = _perm_params()

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        hash_arrays = [_shingle_hashes(t) for t in batch["text"].to_pylist()]
        # zero-shingle docs (<3 tokens) all share the all-max signature →
        # identical keys in EVERY band → O(k²) candidate blowup on short-doc
        # corpora; they can never pass the Jaccard threshold (union would
        # need their empty set), so skip their band rows entirely
        nonempty = np.array([len(h) > 0 for h in hash_arrays], dtype=bool)
        ids = ids[nonempty]
        hash_arrays = [h for h in hash_arrays if len(h)]
        keys = _band_keys(_batch_signatures(hash_arrays, seeds))  # (n, bands)
        n = len(ids)
        return pa.table(
            {
                "band_id": pa.array(np.tile(np.arange(LSH_BANDS, dtype=np.int32), n)),
                "band_key": pa.array(keys.reshape(-1).view(np.int64)),
                "doc_id": pa.array(np.repeat(ids, LSH_BANDS)),
            }
        )

    def sets(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": batch["doc_id"],
                "hashes": pa.array(
                    [_shingle_hashes(t).tobytes() for t in batch["text"].to_pylist()],
                    pa.binary(),
                ),
            }
        )

    from .shuffle import band_pair_candidates, join_pair_payloads

    bands = docs.map_batches(band_rows, batch_format="pyarrow", batch_size=256)
    cand = band_pair_candidates(bands, ["band_id", "band_key"], "doc_id")
    joined = join_pair_payloads(
        cand,
        docs.map_batches(sets, batch_format="pyarrow"),
        size_bytes=size_bytes,
    )
    return _exact_jaccard_verify(joined, MINHASH_THRESHOLD)


def minhash_dedup(sf_dir: str) -> ray.data.Dataset:
    """File-level wrapper: augmented documents table → minhash_pairs."""
    from .shuffle import input_bytes_estimate

    docs = _docs(sf_dir).map_batches(_augment_neardup, batch_format="pyarrow")
    return minhash_pairs(
        docs, size_bytes=input_bytes_estimate(f"{sf_dir}/documents.parquet")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

# Exact SQL twin of the TF-weighted simhash: word hash = md5_number_upper
# (== _md5_64's little-endian fold), per-bit weighted votes, strict acc>0
# bit set, then all-pairs hamming ≤ 3 via bit_count(xor(...)). The 4×16-bit
# chunk banding in the Ray op has FULL recall at hamming ≤ 3 (pigeonhole),
# so the op's output equals this brute-force pair set exactly.
SIMHASH_PAIRS_SQL = """
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000, text || ' extra token appended'
  FROM documents WHERE doc_id % 10 = 0
),
tf AS (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM aug)
  GROUP BY doc_id, word
),
h AS (SELECT doc_id, c, md5_number_upper(word) AS hw FROM tf),
bits AS (
  SELECT doc_id, bit,
         SUM(CASE WHEN (hw >> bit) & 1 = 1 THEN c ELSE -c END) AS acc
  FROM h, LATERAL (SELECT UNNEST(generate_series(0, 63)) AS bit)
  GROUP BY doc_id, bit
),
sh AS (
  SELECT doc_id,
         SUM(CASE WHEN acc > 0 THEN (CAST(1 AS UBIGINT) << bit)
                  ELSE CAST(0 AS UBIGINT) END) AS simhash
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""

def _simhash(text: str) -> int:
    """Term-frequency-weighted 64-bit SimHash (Charikar). TF weighting
    (each token's ±1 vote scaled by its in-doc count) is essential on
    small-vocabulary corpora: unweighted set-of-words simhash collapses —
    measured on the sf0.01 table, set-weighting finds 2/50 true near-dup
    pairs against 1 597 spurious hamming≤3 pairs of unrelated docs, while
    TF-weighting finds 22/50 against 12. Fully vectorized (one bit-matrix
    per doc)."""
    from collections import Counter

    counts = Counter(text.split(" "))
    if not counts:
        return 0
    hs = np.fromiter((_md5_64_memo(w) for w in counts), dtype=np.uint64, count=len(counts))
    tf = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
    bits = ((hs[:, None] >> np.arange(SIMHASH_BITS, dtype=np.uint64)) & np.uint64(1)).astype(
        np.int64
    )
    acc = (tf[:, None] * (2 * bits - 1)).sum(axis=0)
    return int(((acc > 0).astype(np.uint64) << np.arange(SIMHASH_BITS, dtype=np.uint64)).sum())


def simhash_dedup(sf_dir: str) -> ray.data.Dataset:
    """SimHash near-dup pairs (hamming ≤ 3) via 4×16-bit chunk banding.
    Chunk equality is a necessary condition at hamming ≤ 3 (pigeonhole),
    so banding has full recall and the output equals the brute-force pair
    set — which is what SIMHASH_PAIRS_SQL computes (exact oracle)."""

    def hash_rows(batch: pa.Table) -> pa.Table:
        aug = _augment_neardup(batch)
        out = {"chunk_id": [], "chunk_val": [], "doc_id": [], "simhash": []}
        for d, t in zip(aug["doc_id"].to_pylist(), aug["text"].to_pylist()):
            sh = _simhash(t)
            for c in range(4):
                out["chunk_id"].append(c)
                out["chunk_val"].append((sh >> (16 * c)) & 0xFFFF)
                out["doc_id"].append(d)
                out["simhash"].append(sh - (1 << 63))  # store as int64
        return pa.table(
            {
                "chunk_id": pa.array(out["chunk_id"], pa.int32()),
                "chunk_val": pa.array(out["chunk_val"], pa.int32()),
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "simhash": pa.array(out["simhash"], pa.int64()),
            }
        )

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch["bucket"] = (
            (batch["chunk_val"].to_numpy().astype("int64") * 4 + batch["chunk_id"].to_numpy())
            % NUM_BUCKETS
        ).astype("int32")
        return batch

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        cols = ["chunk_id", "chunk_val", "doc_id", "simhash"]
        m = g[cols].merge(g[cols], on=["chunk_id", "chunk_val"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        if not len(m):
            return pd.DataFrame(
                {
                    "doc_a": pd.Series(dtype="int64"),
                    "doc_b": pd.Series(dtype="int64"),
                    "hamming": pd.Series(dtype="int64"),
                }
            )
        x = m["simhash_x"].to_numpy().astype("uint64")
        y = m["simhash_y"].to_numpy().astype("uint64")
        ham = np.array([bin(int(a) ^ int(b)).count("1") for a, b in zip(x, y)])
        keep = ham <= SIMHASH_MAX_HAMMING
        return pd.DataFrame(
            {
                "doc_a": m.loc[keep, "doc_id_x"].astype("int64"),
                "doc_b": m.loc[keep, "doc_id_y"].astype("int64"),
                "hamming": pd.Series(ham[keep], index=m.index[keep], dtype="int64"),
            }
        ).drop_duplicates(["doc_a", "doc_b"])

    from .shuffle import bucketed_group_agg

    rows = _docs(sf_dir).map_batches(hash_rows, batch_format="pyarrow").map_batches(
        add_bucket, batch_format="pandas"
    )
    pairs = rows.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")

    def dedupe_min(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["doc_a", "doc_b"], as_index=False).agg(hamming=("hamming", "min"))
        out["hamming"] = out["hamming"].astype("int64")
        return out

    # a pair can match in several chunks → bucketed min-dedupe
    return bucketed_group_agg(pairs, ["doc_a", "doc_b"], dedupe_min, partial_fn=dedupe_min)


# ---------------------------------------------------------------------------
# Sub-document dedup: paragraph-level exact + prefix fingerprint
# ---------------------------------------------------------------------------

# Paragraphs are the extraction pipeline's own 20-word units (see
# kernels/document.py / convert_spans), so this is the dedup a user would
# run over the converter's output. The keeper is the globally FIRST
# occurrence ordered by (doc_id, para_idx), carried through the shuffle as
# one integer (doc_id * _PARA_POS_BASE + para_idx) so the composite min is
# a plain int64 MIN on both engines.
PARA_WORDS = 20
_PARA_POS_BASE = 100_000  # para_idx bound: a doc would need 2M words to break it

PARAGRAPH_DEDUP_SQL = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
p AS (
  SELECT md5(array_to_string(words[i*20+1 : (i+1)*20], ' ')) AS fp,
         doc_id * 100000 + i AS pos_code
  FROM w, LATERAL (
    SELECT UNNEST(generate_series(0, CAST(floor((len(words)-1)/20.0) AS BIGINT))) AS i
  )
)
SELECT fp,
       CAST(MIN(pos_code) // 100000 AS BIGINT) AS keeper_doc,
       CAST(MIN(pos_code) % 100000 AS BIGINT) AS keeper_idx,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM p GROUP BY fp
"""


def paragraph_dedup(sf_dir: str) -> ray.data.Dataset:
    """Paragraph-level exact dedup (the sub-document pass of RefinedWeb /
    CCNet-style curation): every 20-word paragraph is fingerprinted and
    the global first occurrence (doc order, then position) kept. The
    explode is an embarrassingly parallel flat-map; the shuffle carries
    only (fp, pos_code int64) rows pre-combined per batch; the grouped
    reduce is byte-scaled bucketed (fp cardinality ≈ total paragraphs)."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        fps: list = []
        codes: list = []
        for d, text in zip(batch["doc_id"], batch["text"]):
            words = text.split(" ")
            n_paras = (len(words) - 1) // PARA_WORDS + 1
            if n_paras >= _PARA_POS_BASE:  # contract, not a silent wrap
                raise ValueError(f"doc {d}: {n_paras} paragraphs exceeds pos encoding")
            base = int(d) * _PARA_POS_BASE
            for i in range(n_paras):
                seg = " ".join(words[i * PARA_WORDS : (i + 1) * PARA_WORDS])
                fps.append(hashlib.md5(seg.encode("utf-8")).hexdigest())
                codes.append(base + i)
        return pd.DataFrame({"fp": fps, "pos_code": pd.Series(codes, dtype="int64")})

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("fp", as_index=False).agg(
            pos_code=("pos_code", "min"), n=("pos_code", "size")
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if "n" not in g.columns:
            g = g.assign(n=np.int64(1))
        s = g.groupby("fp", as_index=False).agg(
            pos_code=("pos_code", "min"), n=("n", "sum")
        )
        return pd.DataFrame(
            {
                "fp": s["fp"],
                "keeper_doc": (s["pos_code"] // _PARA_POS_BASE).astype("int64"),
                "keeper_idx": (s["pos_code"] % _PARA_POS_BASE).astype("int64"),
                "n_copies": s["n"].astype("int64"),
            }
        )

    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/documents.parquet"))
    rows = _docs(sf_dir).map_batches(explode, batch_format="pandas")
    return bucketed_group_agg(rows, ["fp"], final, partial_fn=partial, num_buckets=nb)


# Prefix fingerprinting catches template boilerplate (mirror sites, scraped
# article farms) that exact whole-content dedup misses once trailing junk
# differs; the augmented corpus (same injection as exact_dedup) guarantees
# the oracle exercises multi-member groups.
PREFIX_CHARS = 240

PREFIX_DUP_SQL = """
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
),
f AS (
  SELECT doc_id, md5(substr(text, 1, 240)) AS fp FROM aug
)
SELECT fp,
       CAST(MIN(doc_id) AS BIGINT) AS keeper,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM f GROUP BY fp HAVING COUNT(*) >= 2
"""


def prefix_dup(sf_dir: str) -> ray.data.Dataset:
    """Prefix-fingerprint near-dup groups: docs sharing their first 240
    characters (md5'd), groups of ≥2 only, min doc_id as keeper. Stateless
    hash map → thin (fp, doc_id) shuffle → bucketed group count; the ≥2
    filter runs inside the reduce so singleton groups never leave it."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    def hash_prefix(batch: pa.Table) -> pd.DataFrame:
        batch = _augment_exact(batch)
        texts = batch["text"].to_pylist()
        fps = [hashlib.md5(t[:PREFIX_CHARS].encode("utf-8")).hexdigest() for t in texts]
        return pd.DataFrame(
            {"fp": fps, "doc_id": pd.Series(batch["doc_id"].to_pylist(), dtype="int64")}
        )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("fp", as_index=False).agg(
            doc_id=("doc_id", "min"), n=("doc_id", "size")
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("fp", as_index=False).agg(doc_id=("doc_id", "min"), n=("n", "sum"))
        s = s.loc[s["n"] >= 2]
        return pd.DataFrame(
            {
                "fp": s["fp"],
                "keeper": s["doc_id"].astype("int64"),
                "n_docs": s["n"].astype("int64"),
            }
        )

    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/documents.parquet"))
    rows = _docs(sf_dir).map_batches(hash_prefix, batch_format="pyarrow")
    return bucketed_group_agg(rows, ["fp"], final, partial_fn=partial, num_buckets=nb)


PARAGRAPH_DEDUP_APPLY_SQL = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
p AS (
  SELECT doc_id, CAST(i AS BIGINT) AS para_idx,
         array_to_string(words[i*20+1 : (i+1)*20], ' ') AS ptext,
         md5(array_to_string(words[i*20+1 : (i+1)*20], ' ')) AS fp,
         doc_id * 100000 + i AS pos_code
  FROM w, LATERAL (
    SELECT UNNEST(generate_series(0, CAST(floor((len(words)-1)/20.0) AS BIGINT))) AS i
  )
),
k AS (SELECT fp, MIN(pos_code) AS keeper FROM p GROUP BY fp)
SELECT p.doc_id,
       string_agg(p.ptext, ' ' ORDER BY p.para_idx) AS clean_text,
       CAST(count(*) AS BIGINT) AS n_kept
FROM p JOIN k ON p.fp = k.fp AND p.pos_code = k.keeper
GROUP BY p.doc_id
"""


def paragraph_dedup_apply(sf_dir: str) -> ray.data.Dataset:
    """The end-to-end sub-document deliverable (RefinedWeb-style line/
    paragraph dedup APPLIED): rebuild each document from only the
    paragraphs whose global first occurrence it owns; documents made of
    nothing but repeats vanish. Two corpus passes (same residency contract
    as curation.dedup_apply): pass 1 explodes thin (fp, pos_code) rows and
    reduces to keeper pos_codes; pass 2 re-explodes with text and
    hash-joins on the int64 pos_code — so paragraph TEXT crosses the wire
    exactly once (the join), never through the keeper reduce — then a
    byte-scaled bucketed group by doc_id stitches survivors in order."""
    from .shuffle import (
        bucketed_group_agg,
        input_bytes_estimate,
        join_partitions,
        scaled_num_buckets,
    )

    docs_bytes = input_bytes_estimate(f"{sf_dir}/documents.parquet")
    nb = scaled_num_buckets(docs_bytes)

    def explode_thin(batch: pd.DataFrame) -> pd.DataFrame:
        fps: list = []
        codes: list = []
        for d, text in zip(batch["doc_id"], batch["text"]):
            words = text.split(" ")
            n_paras = (len(words) - 1) // PARA_WORDS + 1
            if n_paras >= _PARA_POS_BASE:  # shared pos_code contract (ADVICE r4)
                raise ValueError(f"doc {d}: {n_paras} paragraphs exceeds pos encoding")
            base = int(d) * _PARA_POS_BASE
            for i in range(n_paras):
                seg = " ".join(words[i * PARA_WORDS : (i + 1) * PARA_WORDS])
                fps.append(hashlib.md5(seg.encode("utf-8")).hexdigest())
                codes.append(base + i)
        return pd.DataFrame({"fp": fps, "pos_code": pd.Series(codes, dtype="int64")})

    def keeper_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("fp", as_index=False).agg(pos_code=("pos_code", "min"))

    def keeper_final(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("fp", as_index=False).agg(pos_code=("pos_code", "min"))
        return pd.DataFrame({"kc": s["pos_code"].astype("int64")})

    keepers = bucketed_group_agg(
        _docs(sf_dir).map_batches(explode_thin, batch_format="pandas"),
        ["fp"], keeper_final, partial_fn=keeper_partial, num_buckets=nb,
    )

    def explode_text(batch: pd.DataFrame) -> pd.DataFrame:
        out_d: list = []
        out_i: list = []
        out_c: list = []
        out_t: list = []
        for d, text in zip(batch["doc_id"], batch["text"]):
            words = text.split(" ")
            n_paras = (len(words) - 1) // PARA_WORDS + 1
            if n_paras >= _PARA_POS_BASE:  # shared pos_code contract (ADVICE r4)
                raise ValueError(f"doc {d}: {n_paras} paragraphs exceeds pos encoding")
            base = int(d) * _PARA_POS_BASE
            for i in range(n_paras):
                out_d.append(int(d))
                out_i.append(i)
                out_c.append(base + i)
                out_t.append(" ".join(words[i * PARA_WORDS : (i + 1) * PARA_WORDS]))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(out_d, dtype="int64"),
                "para_idx": pd.Series(out_i, dtype="int64"),
                "pos_code": pd.Series(out_c, dtype="int64"),
                "ptext": out_t,
            }
        )

    paras = _docs(sf_dir).map_batches(explode_text, batch_format="pandas")
    P, jkw = join_partitions(size_bytes=docs_bytes)
    surv = paras.join(keepers, "inner", P, on=("pos_code",), right_on=("kc",), **jkw)

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(["doc_id", "para_idx"])
        out = s.groupby("doc_id", as_index=False).agg(
            clean_text=("ptext", " ".join), n_kept=("ptext", "size")
        )
        return out.astype({"doc_id": "int64", "n_kept": "int64"})

    return bucketed_group_agg(surv, ["doc_id"], rebuild, num_buckets=nb)


# --- exact-substring duplicate-span removal (ExactSubstr-style) ---------------------
#
# Lee et al., "Deduplicating Training Data Makes Language Models Better"
# (ACL 2022): remove every duplicated substring occurrence except its global
# first. The paper's engine is a corpus-wide suffix array; the bounded-window
# re-expression here marks every stride-1 window of SPAN_W tokens whose
# fingerprint occurs elsewhere (keeping the global-min occurrence), merges
# the marked windows per document into maximal intervals, and rebuilds the
# document from the uncovered tokens — so an L-token duplicated passage
# (L ≥ SPAN_W) is removed in full from every non-first occurrence, exactly
# like ExactSubstr with the paper's length threshold playing SPAN_W's role.

SPAN_W = 8  # window width in tokens: the minimum duplicated run that triggers removal
_SPAN_POS_BASE = 1_000_000  # position bound: a doc would need 1M tokens to break it

DUP_SPAN_REMOVAL_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
g AS (
  SELECT doc_id, CAST(i AS BIGINT) AS p,
         md5(array_to_string(words[i+1 : i+{SPAN_W}], ' ')) AS fp,
         doc_id * {_SPAN_POS_BASE} + i AS pos_code
  FROM w, LATERAL (
    SELECT UNNEST(range(0, len(words) - {SPAN_W} + 1)) AS i
  )
),
k AS (SELECT fp, MIN(pos_code) AS keeper FROM g GROUP BY fp),
d AS (
  SELECT g.doc_id, g.p AS s, g.p + {SPAN_W} AS e
  FROM g JOIN k ON g.fp = k.fp
  WHERE g.pos_code <> k.keeper
),
m AS (
  SELECT doc_id, s, e,
         max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
  FROM d
),
isl AS (
  SELECT doc_id, s, e,
         SUM(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY s, e) AS island
  FROM m
),
spans AS (
  SELECT doc_id, island, MIN(s) AS s, MAX(e) AS e
  FROM isl GROUP BY doc_id, island
),
stats AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_spans,
         CAST(SUM(e - s) AS BIGINT) AS dup_tokens
  FROM spans GROUP BY doc_id
),
covered AS (
  SELECT doc_id, CAST(pp AS BIGINT) AS p
  FROM spans, LATERAL (SELECT UNNEST(range(s, e)) AS pp)
),
toks AS (
  SELECT doc_id, CAST(i AS BIGINT) AS p, words[i+1] AS tok
  FROM w, LATERAL (SELECT UNNEST(range(0, len(words))) AS i)
),
kept AS (
  SELECT t.doc_id, t.p, t.tok
  FROM toks t ANTI JOIN covered c ON t.doc_id = c.doc_id AND t.p = c.p
),
clean AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text
  FROM kept GROUP BY doc_id
),
n AS (SELECT doc_id, CAST(len(words) AS BIGINT) AS n_tokens FROM w)
SELECT st.doc_id, n.n_tokens, st.dup_spans, st.dup_tokens,
       COALESCE(c.clean_text, '') AS clean_text
FROM stats st
JOIN n ON n.doc_id = st.doc_id
LEFT JOIN clean c ON c.doc_id = st.doc_id
"""


def dup_span_removal(sf_dir: str) -> ray.data.Dataset:
    """ExactSubstr-style duplicate-span removal APPLIED: every stride-1
    SPAN_W-token window is fingerprinted; windows whose fingerprint occurs
    anywhere else in the corpus (or earlier in the same document) are
    marked in all but the global-first occurrence; marked windows merge
    into maximal per-doc intervals, and each affected document is rebuilt
    from its uncovered tokens. Output is one row per document that lost at
    least one span: (doc_id, n_tokens, dup_spans, dup_tokens, clean_text).

    Scale shape (two corpus passes, text crosses the wire once):
      1. thin explode — (md5 fp, int64 pos_code) per window, nothing else;
         the per-fp bucketed reduce holds complete occurrence groups and
         emits NON-keeper pos_codes directly (no second keeper join). The
         window stream is the honest cost vs the paper's suffix array:
         ×SPAN_W fingerprint bytes on a 24-byte/window stream, never text.
         A boilerplate fingerprint repeated everywhere is one hot group —
         same residency bound paragraph_dedup carries (its reduce is a
         transform+filter, linear in the group).
      2. rebuild — doc rows (text) union mark rows (doc_id, start) tagged
         into the same doc_id buckets (interval_coverage's tag-union);
         per-doc interval merge is vectorized (sort + cummax islands +
         reduceat), then one mask pass rebuilds the text. Docs with no
         marks never surface from the reduce.
    """
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    docs_bytes = input_bytes_estimate(f"{sf_dir}/documents.parquet")
    nb = scaled_num_buckets(docs_bytes)
    docs = _docs(sf_dir)

    def explode_fps(batch: pd.DataFrame) -> pd.DataFrame:
        fps: list = []
        codes: list = []
        for d, text in zip(batch["doc_id"], batch["text"]):
            words = text.split(" ")
            npos = len(words) - SPAN_W + 1
            if npos >= _SPAN_POS_BASE:  # shared pos_code contract (ADVICE r4)
                raise ValueError(f"doc {d}: {npos} window positions exceed pos encoding")
            base = int(d) * _SPAN_POS_BASE
            for i in range(max(0, npos)):
                fps.append(
                    hashlib.md5(" ".join(words[i : i + SPAN_W]).encode("utf-8")).hexdigest()
                )
                codes.append(base + i)
        return pd.DataFrame({"fp": fps, "pos_code": pd.Series(codes, dtype="int64")})

    def non_keepers(g: pd.DataFrame) -> pd.DataFrame:
        keeper = g.groupby("fp")["pos_code"].transform("min")
        nk = g.loc[g["pos_code"] != keeper, "pos_code"]
        return pd.DataFrame(
            {
                "doc_id": (nk // _SPAN_POS_BASE).astype("int64"),
                "s": (nk % _SPAN_POS_BASE).astype("int64"),
            }
        )

    marks = bucketed_group_agg(
        docs.map_batches(explode_fps, batch_format="pandas"),
        ["fp"], non_keepers, num_buckets=nb,
    )

    def doc_tag(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "s": np.int64(-1),
                "text": b["text"].astype("string"),
            }
        )

    def mark_tag(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "s": b["s"].astype("int64"),
                "text": pd.array([""] * len(b), dtype="string"),
            }
        )

    tagged = docs.map_batches(doc_tag, batch_format="pandas").union(
        marks.map_batches(mark_tag, batch_format="pandas")
    )

    span_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("dup_spans", pa.int64()),
            ("dup_tokens", pa.int64()),
            ("clean_text", pa.string()),
        ]
    )

    def rebuild(g: pd.DataFrame) -> pa.Table:
        texts = g.loc[g["s"] < 0].set_index("doc_id")["text"]
        ms = g.loc[g["s"] >= 0]
        out_d: list = []
        out_n: list = []
        out_sp: list = []
        out_dt: list = []
        out_t: list = []
        for d, sub in ms.groupby("doc_id"):
            starts = np.sort(sub["s"].to_numpy())
            ends = starts + SPAN_W
            run_max = np.maximum.accumulate(ends)
            new_isl = np.ones(len(starts), dtype=bool)
            new_isl[1:] = starts[1:] > run_max[:-1]
            isl_starts = np.flatnonzero(new_isl)
            s0 = starts[new_isl]
            e0 = np.maximum.reduceat(ends, isl_starts)
            words = texts.loc[d].split(" ")
            mask = np.ones(len(words), dtype=bool)
            for a, b_ in zip(s0, e0):
                mask[a:b_] = False
            out_d.append(int(d))
            out_n.append(len(words))
            out_sp.append(len(s0))
            out_dt.append(int((e0 - s0).sum()))
            out_t.append(" ".join(w for w, m in zip(words, mask) if m))
        return pa.Table.from_pydict(
            {
                "doc_id": out_d,
                "n_tokens": out_n,
                "dup_spans": out_sp,
                "dup_tokens": out_dt,
                "clean_text": out_t,
            },
            schema=span_schema,
        )

    return bucketed_group_agg(tagged, ["doc_id"], rebuild, num_buckets=nb)


# --- fuzzy prefix pairs (character-level near-match blocking) ----------------------
#
# Entity-resolution-style fuzzy string join: document pairs whose padded
# 18-char text prefixes are within Hamming distance 2 — the character-level
# near-match primitive (the other dedup ops work at token/shingle/vector
# granularity). Blocking is pigeonhole-COMPLETE, not probabilistic: the
# prefix splits into 3 disjoint aligned 6-char segments, and ≤2
# substitutions leave ≥1 segment untouched, so every qualifying pair shares
# at least one (idx, segment) band key — unlike simhash's radius-bounded
# recall there is NO recall loss at the configured distance. The engine and
# the DuckDB twin implement the identical rule (rpad + fixed segment join +
# hamming), so the oracle is exact.

FUZZY_PREFIX_LEN = 18
FUZZY_SEG_LEN = 6
FUZZY_MAX_HAMMING = 2

FUZZY_PREFIX_PAIRS_SQL = f"""
WITH p AS (
  SELECT doc_id, rpad(substring(text, 1, {FUZZY_PREFIX_LEN}), {FUZZY_PREFIX_LEN}, '#') AS pref
  FROM documents
),
segs AS (
  SELECT doc_id, pref, 1 AS idx, substring(pref, 1, {FUZZY_SEG_LEN}) AS seg FROM p
  UNION ALL SELECT doc_id, pref, 2, substring(pref, {FUZZY_SEG_LEN + 1}, {FUZZY_SEG_LEN}) FROM p
  UNION ALL SELECT doc_id, pref, 3, substring(pref, {2 * FUZZY_SEG_LEN + 1}, {FUZZY_SEG_LEN}) FROM p
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pref AS pa, b.pref AS pb
  FROM segs a JOIN segs b ON a.idx = b.idx AND a.seg = b.seg AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(hamming(pa, pb) AS BIGINT) AS dist
FROM cand WHERE hamming(pa, pb) <= {FUZZY_MAX_HAMMING}
"""


def fuzzy_prefix_pairs(
    sf_dir: str, *, max_band_df: int | None = None
) -> ray.data.Dataset:
    """(doc_a, doc_b, dist) pairs with prefix Hamming distance ≤ 2 (see
    module comment: pigeonhole-complete 3-segment blocking).

    Scale shape: the 18-char prefix payload RIDES the segment rows into
    the band shuffle (3 rows × 18 chars per doc — thinner than one
    payload-join partition), so each complete-band bucket self-merges,
    Hamming-verifies inline with one vectorized (n, 18) char-matrix
    compare, and emits only true pairs; the former two-sided
    join_pair_payloads hash join (two Dataset.joins ≈ 1 s fixed tax per
    partition — TODO #3) is gone. A pair matching in k ≤ 3 segments is
    verified k times (bounded, cheap — the r03 #8 pre-verify-dedupe
    lesson inverts when the dup factor is 3 and the payload is 18 bytes);
    the final bucketed reduce dedupes verified pairs. ``max_band_df``
    caps a segment's posting list for boilerplate-heavy corpora (default
    None = exact, matching the oracle; capping trades recall for the
    quadratic bound exactly like minhash's knob)."""
    from .shuffle import (
        add_bucket_column,
        bucketed_group_agg,
        input_bytes_estimate,
        scaled_num_buckets,
    )

    doc_path = f"{sf_dir}/documents.parquet"
    nb = scaled_num_buckets(input_bytes_estimate(doc_path))

    def prefix(series: pd.Series) -> pd.Series:
        return (
            series.str.slice(0, FUZZY_PREFIX_LEN)
            .str.pad(FUZZY_PREFIX_LEN, side="right", fillchar="#")
        )

    def seg_rows(b: pd.DataFrame) -> pd.DataFrame:
        pref = prefix(b["text"])
        frames = [
            pd.DataFrame(
                {
                    "idx": np.int64(i + 1),
                    "seg": pref.str.slice(i * FUZZY_SEG_LEN, (i + 1) * FUZZY_SEG_LEN),
                    "doc_id": b["doc_id"].astype("int64"),
                    "pref": pref,
                }
            )
            for i in range(3)
        ]
        out = pd.concat(frames, ignore_index=True)
        return add_bucket_column(out, ["idx", "seg"], nb)

    def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_bucket"])
        if max_band_df is not None:
            sizes = g.groupby(["idx", "seg"], sort=False)["doc_id"].transform(
                "size"
            )
            g = g[sizes <= max_band_df]
        m = g.merge(g, on=["idx", "seg"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        m = m.drop_duplicates(["doc_id_x", "doc_id_y"])
        if m.empty:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"),
                 "doc_b": pd.Series([], dtype="int64"),
                 "dist": pd.Series([], dtype="int64")}
            )
        a = np.array([list(x) for x in m["pref_x"]])
        b = np.array([list(x) for x in m["pref_y"]])
        dist = (a != b).sum(axis=1).astype("int64")
        keep = dist <= FUZZY_MAX_HAMMING
        return pd.DataFrame(
            {
                "doc_a": m["doc_id_x"].to_numpy()[keep],
                "doc_b": m["doc_id_y"].to_numpy()[keep],
                "dist": dist[keep],
            }
        )

    pairs = (
        _docs(sf_dir)
        .map_batches(seg_rows, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(verify_bucket, batch_format="pandas")
    )
    return bucketed_group_agg(
        pairs,
        ["doc_a", "doc_b"],
        lambda g: g.drop_duplicates(["doc_a", "doc_b"]),
        partial_fn=lambda b: b.drop_duplicates(["doc_a", "doc_b"]),
        num_buckets=64,
    )


# ---------------------------------------------------------------------------
# Boilerplate report: the most-duplicated paragraphs across the corpus
# ---------------------------------------------------------------------------

BOILERPLATE_TOP_K = 20

BOILERPLATE_PARAGRAPHS_SQL = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
p AS (
  SELECT array_to_string(words[i*20+1 : (i+1)*20], ' ') AS para
  FROM w, LATERAL (
    SELECT UNNEST(generate_series(0, CAST(floor((len(words)-1)/20.0) AS BIGINT))) AS i
  )
),
c AS (
  SELECT md5(para) AS fp, MIN(para) AS para, CAST(count(*) AS BIGINT) AS n_copies
  FROM p GROUP BY md5(para)
)
SELECT fp, para, n_copies,
       CAST(row_number() OVER (ORDER BY n_copies DESC, fp) AS BIGINT) AS rank
FROM c WHERE n_copies >= 2
QUALIFY row_number() OVER (ORDER BY n_copies DESC, fp) <= 20
"""


def boilerplate_paragraphs(sf_dir: str) -> ray.data.Dataset:
    """Top-20 most-duplicated paragraphs — the boilerplate detector
    (navigation chrome, license blurbs, cookie banners surface exactly
    here; CCNet strips them by this signal). Same 20-word paragraph units
    and md5 fingerprints as paragraph_dedup; the shuffle carries
    (fp, para, partial count) where para is ≤ 20 words — a bounded
    payload, and fp→para is 1:1 so MIN(para) is deterministic on both
    engines. Per-bucket top-k candidates (n_copies ≥ 2) feed one tiny
    final merge of buckets×k rows."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    path = f"{sf_dir}/documents.parquet"
    nb = scaled_num_buckets(input_bytes_estimate(path))

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        fps: list = []
        paras: list = []
        for text in batch["text"]:
            words = text.split(" ")
            n_paras = (len(words) - 1) // PARA_WORDS + 1
            for i in range(n_paras):
                seg = " ".join(words[i * PARA_WORDS : (i + 1) * PARA_WORDS])
                fps.append(hashlib.md5(seg.encode("utf-8")).hexdigest())
                paras.append(seg)
        f = pd.DataFrame({"fp": fps, "para": paras})
        return f.groupby("fp", as_index=False).agg(
            para=("para", "min"), pn=("para", "size")
        ).astype({"pn": "int64"})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("fp", as_index=False).agg(
            para=("para", "min"), n_copies=("pn", "sum")
        )
        out = out.loc[out["n_copies"] >= 2].astype({"n_copies": "int64"})
        return out.sort_values(
            ["n_copies", "fp"], ascending=[False, True]
        ).head(BOILERPLATE_TOP_K)

    cands = bucketed_group_agg(
        ray.data.read_parquet(path, columns=["text"]).map_batches(
            explode, batch_format="pandas"
        ),
        ["fp"], per_bucket, num_buckets=nb,
    )

    def final_top(b: pd.DataFrame) -> pd.DataFrame:
        top = b.sort_values(["n_copies", "fp"], ascending=[False, True]).head(
            BOILERPLATE_TOP_K
        )
        return pd.DataFrame(
            {
                "fp": top["fp"].to_numpy(),
                "para": top["para"].to_numpy(),
                "n_copies": top["n_copies"].astype("int64").to_numpy(),
                "rank": pd.Series(range(1, len(top) + 1), dtype="int64"),
            }
        )

    return cands.repartition(1).map_batches(
        final_top, batch_format="pandas", batch_size=None
    )


# ---------------------------------------------------------------------------
# Per-source duplicate-rate report
# ---------------------------------------------------------------------------
#
# The curation dashboard number: for each source, how many docs it
# contributed and how many of them are exact duplicates of earlier content
# (keeper = corpus-wide minimum doc_id per content hash — the exact_dedup
# rule). Uses the suite's standard deterministic mirror augment (doc_id % 7
# copies shifted by +1,000,000, keeping their source) so the rate is
# non-trivial on the synthetic corpus.

DUP_RATE_BY_SOURCE_SQL = """
WITH aug AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text, source FROM documents WHERE doc_id % 7 = 0
),
f AS (
  SELECT doc_id, source, md5(text) AS fp FROM aug
),
k AS (
  SELECT fp, MIN(doc_id) AS keeper FROM f GROUP BY fp
)
SELECT f.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN f.doc_id <> k.keeper THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dups
FROM f JOIN k ON f.fp = k.fp
GROUP BY f.source
"""


def dup_rate_by_source(sf_dir: str) -> ray.data.Dataset:
    """(source, n_docs, n_dups): per-source exact-duplicate rate.

    Scale shape: the shuffle carries (fp, doc_id, source) only; fp groups
    are complete per bucket (the exact_dedup machinery), so the keeper and
    each row's dup flag resolve in-bucket with one vectorized
    transform('min'); each bucket emits per-source partial counts and the
    final groupby is |sources| rows. The rate itself is left to the
    consumer (two exact integer columns hash deterministically)."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    path = f"{sf_dir}/documents.parquet"
    nb = scaled_num_buckets(input_bytes_estimate(path))

    def add_fp(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        srcs = batch["source"].to_pylist()
        out_id, out_text, out_src = list(ids), list(texts), list(srcs)
        for i, t, s in zip(ids, texts, srcs):
            if i % 7 == 0:
                out_id.append(i + 1_000_000)
                out_text.append(t)
                out_src.append(s)
        fps = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in out_text]
        return pa.table(
            {
                "fp": pa.array(fps, pa.string()),
                "doc_id": pa.array(out_id, pa.int64()),
                "source": pa.array(out_src, pa.string()),
            }
        )

    rows = ray.data.read_parquet(
        path, columns=["doc_id", "text", "source"]
    ).map_batches(add_fp, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        keeper = g.groupby("fp")["doc_id"].transform("min")
        is_dup = (g["doc_id"] != keeper).astype("int64")
        out = pd.DataFrame({"source": g["source"], "n": np.int64(1), "d": is_dup})
        return out.groupby("source", as_index=False).agg(
            n=("n", "sum"), d=("d", "sum")
        )

    from ray.data.aggregate import Sum

    partials = bucketed_group_agg(rows, ["fp"], per_bucket, num_buckets=nb)
    agg = partials.groupby("source").aggregate(
        Sum("n", alias_name="n_docs"), Sum("d", alias_name="n_dups")
    )
    return agg.map_batches(
        lambda b: pd.DataFrame(
            {
                "source": b["source"],
                "n_docs": b["n_docs"].astype("int64"),
                "n_dups": b["n_dups"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# FastSS edit-distance-1 similarity join (Bocek et al. 2007): all pairs of
# DISTINCT catalog strings within Levenshtein distance 1, found WITHOUT the
# quadratic self-join — every string is indexed under itself plus each
# single-character deletion; any ed<=1 pair provably shares a key
# (equal-length substitutions share the deletion at the differing position;
# insert/delete pairs share the shorter string itself), and candidates are
# verified exactly. The workhorse of typo clustering / catalog conflation.

EDIT_DISTANCE_PAIRS_SQL = """
WITH n AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS name_a, b.p_name AS name_b
FROM n a JOIN n b ON a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 1
"""


def _ed_le1(a: str, b: str) -> bool:
    """Exact ed(a,b) <= 1 verify for a != b (one O(len) scan)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:  # exactly one substitution
        return sum(1 for x, y in zip(a, b) if x != y) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0  # a is shorter: one insertion into a makes b
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def edit_distance_pairs(sf_dir: str) -> ray.data.Dataset:
    """(name_a < name_b) pairs of distinct part names with ed <= 1.

    Scale shape: the corpus-sized part table first collapses to DISTINCT
    names (one bucketed reduce on the name hash — the only corpus-scale
    exchange); each distinct name then emits <= len+1 deletion-key rows,
    a second bucketed reduce on the 64-bit key hash gathers candidate
    groups (group size is bounded by local neighborhood density, not
    corpus size), pairs inside a group are verified with the exact
    O(len) check, and a final thin reduce on the pair key dedupes pairs
    discovered under several shared keys. Verification is a Python loop
    over CANDIDATES — the rare survivors of the key filter — never over
    the cross product."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    part = ray.data.read_parquet(f"{sf_dir}/part.parquet", columns=["p_name"])
    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/part.parquet"), lo=16)

    def distinct_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates()

    def distinct_final(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates()

    names = bucketed_group_agg(
        part, ["p_name"], distinct_final, partial_fn=distinct_partial,
        num_buckets=nb,
    )

    def emit_keys(b: pd.DataFrame) -> pd.DataFrame:
        keys: list[int] = []
        out_names: list[str] = []
        for s in b["p_name"]:
            variants = {s}
            variants.update(s[:i] + s[i + 1 :] for i in range(len(s)))
            for v in variants:
                keys.append(_md5_64(v) - (1 << 63))
                out_names.append(s)
        return pd.DataFrame(
            {"k": pd.array(keys, dtype="int64"), "p_name": out_names}
        )

    keyed = names.map_batches(emit_keys, batch_format="pandas")

    def candidate_pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, grp in g.groupby("k", sort=False):
            u = sorted(set(grp["p_name"]))
            for i in range(len(u)):
                for j in range(i + 1, len(u)):
                    if _ed_le1(u[i], u[j]):
                        rows.append((u[i], u[j]))
        return pd.DataFrame(rows, columns=["name_a", "name_b"])

    pairs = bucketed_group_agg(keyed, ["k"], candidate_pairs, num_buckets=nb)

    def dedupe(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates()

    return bucketed_group_agg(pairs, ["name_a", "name_b"], dedupe, num_buckets=16)


# ---------------------------------------------------------------------------
# MinHash calibration audit: for every TRUE near-dup pair (exact Jaccard
# >= 0.5 over 3-word shingles, copy-augmented corpus as in
# JACCARD_PAIRS_SQL), the 16-permutation salted-minhash signature
# agreement next to the exact intersection/union — the report that tells
# you whether your sketch's estimate tracks truth before you trust its
# bands at 100 TB. E[est_matches / n_perms] = true Jaccard.

MINHASH_CAL_PERMS = 16

MINHASH_CALIBRATION_SQL = """
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000, text || ' extra token appended'
  FROM documents WHERE doc_id % 10 = 0
),
w AS (SELECT doc_id, string_split(text, ' ') AS words FROM aug),
sh AS (
  SELECT DISTINCT doc_id,
         words[i+1] || ' ' || words[i+2] || ' ' || words[i+3] AS shingle
  FROM w, LATERAL (SELECT UNNEST(generate_series(0, len(words)-3)) AS i)
),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter_n
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT doc_a, doc_b, inter_n, ca.n + cb.n - inter_n AS union_n
  FROM inter JOIN cnt ca ON ca.doc_id = inter.doc_a
             JOIN cnt cb ON cb.doc_id = inter.doc_b
  WHERE inter_n * 1.0 / (ca.n + cb.n - inter_n) >= 0.5
),
pd AS (SELECT doc_a AS doc_id FROM pairs UNION SELECT doc_b FROM pairs),
perms AS (SELECT UNNEST(generate_series(0, 15)) AS p),
sig AS (
  SELECT sh.doc_id, perms.p,
         MIN(md5_number_upper(sh.shingle || '|' || perms.p)) AS mh
  FROM sh JOIN pd USING (doc_id), perms
  GROUP BY sh.doc_id, perms.p
),
est AS (
  SELECT pr.doc_a, pr.doc_b,
         CAST(SUM(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS BIGINT)
           AS est_matches
  FROM pairs pr JOIN sig sa ON sa.doc_id = pr.doc_a
                JOIN sig sb ON sb.doc_id = pr.doc_b AND sb.p = sa.p
  GROUP BY pr.doc_a, pr.doc_b
)
SELECT p.doc_a, p.doc_b, e.est_matches,
       CAST(16 AS BIGINT) AS n_perms,
       CAST(p.inter_n AS BIGINT) AS inter_n,
       CAST(p.union_n AS BIGINT) AS union_n
FROM pairs p JOIN est e USING (doc_a, doc_b)
"""


def minhash_calibration(sf_dir: str) -> ray.data.Dataset:
    """(doc_a, doc_b, est_matches, n_perms, inter_n, union_n) for every
    exact-Jaccard >= 0.5 pair.

    Scale shape: TWO independent runs of the bucketed inverted-index
    self-join machinery (_pair_intersections) — once over shingle rows
    (exact side), once over 16 signature SLOT rows per doc (a doc's
    signature collapses its whole shingle set to 16 uint64s, so the
    estimate side is radically thinner) — merged by a tag-union bucketed
    reduce on the pair key. Slot equality is keyed by md5(p|minhash):
    the same 64-bit collision budget as every hash-keyed op here; a true
    pair sharing ZERO slots (p ≈ (1-J)^16) still reports, with
    est_matches = 0, because the exact side anchors the merge."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    sh = _docs(sf_dir).map_batches(_shingle_rows, batch_format="pyarrow")
    exact = _pair_intersections(sh)

    def exact_rows(b: pd.DataFrame) -> pd.DataFrame:
        union = b["n_a"].astype("int64") + b["n_b"] - b["inter_n"]
        keep = b["inter_n"] / union >= JACCARD_THRESHOLD
        return pd.DataFrame(
            {
                "doc_a": b.loc[keep, "doc_a"].astype("int64"),
                "doc_b": b.loc[keep, "doc_b"].astype("int64"),
                "inter_n": b.loc[keep, "inter_n"].astype("int64"),
                "union_n": union[keep].astype("int64"),
                "est": np.zeros(int(keep.sum()), dtype="int64"),
                "tag": np.ones(int(keep.sum()), dtype="int64"),
            }
        )

    exact_t = exact.map_batches(exact_rows, batch_format="pandas")

    def sig_rows(batch: pa.Table) -> pa.Table:
        aug = _augment_neardup(batch)
        out_h: list[int] = []
        out_d: list[int] = []
        for d, t in zip(aug["doc_id"].to_pylist(), aug["text"].to_pylist()):
            words = t.split(" ")
            shingles = {
                " ".join(words[i : i + SHINGLE_K])
                for i in range(len(words) - SHINGLE_K + 1)
            }
            if not shingles:
                continue
            for p in range(MINHASH_CAL_PERMS):
                mh = min(_md5_64_memo(f"{s}|{p}") for s in shingles)
                out_h.append(_md5_64_memo(f"{p}|{mh}"))
                out_d.append(d)
        return pa.table(
            {
                "shingle_h": pa.array(np.array(out_h, dtype=np.uint64)),
                "doc_id": pa.array(out_d, pa.int64()),
                "n": pa.array(
                    np.full(len(out_d), MINHASH_CAL_PERMS, dtype=np.int32)
                ),
            }
        )

    slots = _docs(sf_dir).map_batches(sig_rows, batch_format="pyarrow")
    est = _pair_intersections(slots)

    def est_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_a": b["doc_a"].astype("int64"),
                "doc_b": b["doc_b"].astype("int64"),
                "inter_n": np.zeros(len(b), dtype="int64"),
                "union_n": np.zeros(len(b), dtype="int64"),
                "est": b["inter_n"].astype("int64"),
                "tag": np.zeros(len(b), dtype="int64"),
            }
        )

    est_t = est.map_batches(est_rows, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["doc_a", "doc_b"], as_index=False).agg(
            inter_n=("inter_n", "max"), union_n=("union_n", "max"),
            est_matches=("est", "sum"), tag=("tag", "max"),
        )
        out = out[out["tag"] == 1]
        return pd.DataFrame(
            {
                "doc_a": out["doc_a"].astype("int64"),
                "doc_b": out["doc_b"].astype("int64"),
                "est_matches": out["est_matches"].astype("int64"),
                "n_perms": np.full(len(out), MINHASH_CAL_PERMS, dtype="int64"),
                "inter_n": out["inter_n"].astype("int64"),
                "union_n": out["union_n"].astype("int64"),
            }
        )

    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/documents.parquet"))
    return bucketed_group_agg(
        exact_t.union(est_t), ["doc_a", "doc_b"], merge, num_buckets=nb
    )


# ---------------------------------------------------------------------------
# C4 line filter: drop EVERY occurrence of a ≥3-times-repeated paragraph
# ---------------------------------------------------------------------------

C4_LINE_MIN_COPIES = 3

C4_LINE_FILTER_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
p AS (
  SELECT doc_id, CAST(i AS BIGINT) AS para_idx,
         array_to_string(words[i*20+1 : (i+1)*20], ' ') AS ptext,
         md5(array_to_string(words[i*20+1 : (i+1)*20], ' ')) AS fp
  FROM w, LATERAL (
    SELECT UNNEST(generate_series(0, CAST(floor((len(words)-1)/20.0) AS BIGINT))) AS i
  )
),
c AS (SELECT fp, count(*) AS n FROM p GROUP BY fp),
t AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS tot FROM p GROUP BY doc_id),
k AS (
  SELECT p.doc_id, p.para_idx, p.ptext
  FROM p JOIN c ON c.fp = p.fp WHERE c.n < {C4_LINE_MIN_COPIES}
)
SELECT k.doc_id,
       string_agg(k.ptext, ' ' ORDER BY k.para_idx) AS clean_text,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(t.tot - count(*) AS BIGINT) AS n_dropped
FROM k JOIN t ON t.doc_id = k.doc_id
GROUP BY k.doc_id, t.tot
"""


def c4_line_filter(sf_dir: str) -> ray.data.Dataset:
    """C4's line-repetition rule APPLIED (Raffel et al. 2020: any line
    occurring ≥ 3 times in the corpus is removed EVERYWHERE — unlike
    paragraph_dedup_apply's keep-first rule, the repeat's first occurrence
    dies too, which is what kills navigation chrome and cookie banners).
    Same 20-word paragraph units and md5 fingerprints as the paragraph
    suite; documents reduced to nothing vanish; n_dropped per doc is the
    audit column.

    Scale shape, three byte-scaled exchanges none of which carries text
    twice: (1) thin (fp) partial counts reduce to the banned-or-not
    verdict per fingerprint; (2) paragraph text rows and (fp, n) count
    rows tag-union on fp — complete fp groups keep text rows only where
    the group's count stays under the threshold (text crosses HERE,
    once); (3) survivors stitch per doc_id in paragraph order. Per-doc
    totals ride pass 2's text rows, so the n_dropped audit needs no
    extra pass."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    docs_bytes = input_bytes_estimate(f"{sf_dir}/documents.parquet")
    nb = scaled_num_buckets(docs_bytes)

    def explode_counts(batch: pd.DataFrame) -> pd.DataFrame:
        fps: list = []
        for text in batch["text"]:
            words = text.split(" ")
            n_paras = (len(words) - 1) // PARA_WORDS + 1
            for i in range(n_paras):
                seg = " ".join(words[i * PARA_WORDS : (i + 1) * PARA_WORDS])
                fps.append(hashlib.md5(seg.encode("utf-8")).hexdigest())
        f = pd.DataFrame({"fp": fps})
        g = f.groupby("fp", as_index=False).size()
        return g.rename(columns={"size": "pn"}).astype({"pn": "int64"})

    def count_final(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("fp", as_index=False)["pn"].sum()
        # only fingerprints at/over the threshold matter downstream: the
        # ban list is the (rare) boilerplate set, so the union stays thin
        s = s.loc[s["pn"] >= C4_LINE_MIN_COPIES]
        return pd.DataFrame({"fp": s["fp"], "banned": np.int64(1)})

    banned = bucketed_group_agg(
        _docs(sf_dir).map_batches(explode_counts, batch_format="pandas"),
        ["fp"], count_final, partial_fn=lambda b: b, num_buckets=nb,
    )

    def explode_text(batch: pd.DataFrame) -> pd.DataFrame:
        out_d: list = []
        out_i: list = []
        out_t: list = []
        out_n: list = []
        fps: list = []
        for d, text in zip(batch["doc_id"], batch["text"]):
            words = text.split(" ")
            n_paras = (len(words) - 1) // PARA_WORDS + 1
            for i in range(n_paras):
                out_d.append(int(d))
                out_i.append(i)
                out_n.append(n_paras)
                seg = " ".join(words[i * PARA_WORDS : (i + 1) * PARA_WORDS])
                out_t.append(seg)
                fps.append(hashlib.md5(seg.encode("utf-8")).hexdigest())
        return pd.DataFrame(
            {"fp": fps, "doc_id": pd.Series(out_d, dtype="int64"),
             "para_idx": pd.Series(out_i, dtype="int64"),
             "tot": pd.Series(out_n, dtype="int64"), "ptext": out_t,
             "banned": np.int64(0)}
        )

    paras = _docs(sf_dir).map_batches(explode_text, batch_format="pandas")

    def keep_unbanned(g: pd.DataFrame) -> pd.DataFrame:
        bad = g.groupby("fp")["banned"].transform("max") == 1
        kept = g.loc[(g["banned"] == 0) & ~bad]
        return kept[["doc_id", "para_idx", "tot", "ptext"]]

    def pad_tag(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(
            doc_id=np.int64(-1), para_idx=np.int64(-1), tot=np.int64(0),
            ptext="",
        )[["fp", "doc_id", "para_idx", "tot", "ptext", "banned"]]

    survivors = bucketed_group_agg(
        paras.union(banned.map_batches(pad_tag, batch_format="pandas")),
        ["fp"], keep_unbanned, num_buckets=nb,
    )

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(["doc_id", "para_idx"])
        out = s.groupby("doc_id", as_index=False).agg(
            clean_text=("ptext", " ".join), n_kept=("ptext", "size"),
            tot=("tot", "first"),
        )
        out["n_dropped"] = (out["tot"] - out["n_kept"]).astype("int64")
        return out.drop(columns=["tot"]).astype({"n_kept": "int64"})

    return bucketed_group_agg(survivors, ["doc_id"], rebuild, num_buckets=nb)


# ---------------------------------------------------------------------------
# SimHash calibration: per-true-pair hamming + chunk-band detectability
# ---------------------------------------------------------------------------

SIMHASH_CALIBRATION_SQL = """
WITH base AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
),
var AS (
  SELECT doc_id, 0 AS which, text FROM base
  UNION ALL
  SELECT doc_id, 1 AS which, text || ' extra token appended' FROM base
),
tf AS (
  SELECT doc_id, which, word, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT doc_id, which, UNNEST(string_split(text, ' ')) AS word
        FROM var)
  GROUP BY doc_id, which, word
),
bits AS (
  SELECT doc_id, which, bit,
         SUM(CASE WHEN (md5_number_upper(word) >> bit) & 1 = 1
                  THEN c ELSE -c END) AS acc
  FROM tf, LATERAL (SELECT UNNEST(generate_series(0, 63)) AS bit)
  GROUP BY doc_id, which, bit
),
sh AS (
  SELECT doc_id, which,
         SUM(CASE WHEN acc > 0 THEN (CAST(1 AS UBIGINT) << bit)
                  ELSE CAST(0 AS UBIGINT) END) AS simhash
  FROM bits GROUP BY doc_id, which
),
pair AS (
  SELECT a.doc_id, a.simhash AS s1, b.simhash AS s2
  FROM sh a JOIN sh b ON b.doc_id = a.doc_id
  WHERE a.which = 0 AND b.which = 1
)
SELECT doc_id,
       CAST(bit_count(xor(s1, s2)) AS BIGINT) AS hamming,
       CAST((CASE WHEN (s1 >> 0) & 65535 = (s2 >> 0) & 65535 THEN 1 ELSE 0 END)
          + (CASE WHEN (s1 >> 16) & 65535 = (s2 >> 16) & 65535 THEN 1 ELSE 0 END)
          + (CASE WHEN (s1 >> 32) & 65535 = (s2 >> 32) & 65535 THEN 1 ELSE 0 END)
          + (CASE WHEN (s1 >> 48) & 65535 = (s2 >> 48) & 65535 THEN 1 ELSE 0 END)
         AS BIGINT) AS n_chunks_equal,
       CAST(CASE WHEN bit_count(xor(s1, s2)) <= 3 THEN 1 ELSE 0 END AS BIGINT)
         AS caught
FROM pair
"""


def simhash_calibration(sf_dir: str) -> ray.data.Dataset:
    """SimHash recall audit, the sketch-quality twin of
    minhash_calibration: for every TRUE near-dup pair (the augment rule's
    one-token-append variant), the exact 64-bit TF-simhash Hamming
    distance, how many of the 4 banding chunks still agree, and whether
    the hamming ≤ 3 detector fires — the measurement behind TODO #4's
    "~half of 3-token-edit dups" recall note, now a first-class
    oracle-checked report.

    Scale shape: the augment constructs each pair FROM ITS BASE ROW, so
    both variants hash inside the same batch — the whole audit is ONE
    stateless vectorized map over the documents read, zero shuffles
    (contrast minhash_calibration, which must self-join because its
    ground truth is corpus-wide)."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def audit(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        rows = []
        for d, t in zip(ids, texts):
            if d % 10 != 0:
                continue
            s1 = _simhash(t)
            s2 = _simhash(t + " extra token appended")
            ham = bin(s1 ^ s2).count("1")
            eq = sum(
                1 for c in range(4)
                if (s1 >> (16 * c)) & 0xFFFF == (s2 >> (16 * c)) & 0xFFFF
            )
            rows.append((d, ham, eq, 1 if ham <= SIMHASH_MAX_HAMMING else 0))
        return pd.DataFrame(
            rows, columns=["doc_id", "hamming", "n_chunks_equal", "caught"]
        ).astype({"doc_id": "int64", "hamming": "int64",
                  "n_chunks_equal": "int64", "caught": "int64"})

    return docs.map_batches(audit, batch_format="pyarrow")
