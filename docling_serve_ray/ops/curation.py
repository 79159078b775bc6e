"""Corpus-curation operators: the filter / mix / audit / apply stages a
large-scale training-data pipeline runs between raw ingest and tokenization.

- quality_filter      Gopher-style composite heuristic rules (per-doc flags)
- weighted_mix        deterministic per-source sampling (dataset mixing)
- corpus_stats        per-(source, lang) corpus audit aggregates
- dup_ngram_coverage  duplicated-5-gram coverage signal (Lee et al. 2022,
                      "Deduplicating Training Data Makes LMs Better" —
                      public-paper method, re-expressed as two thin shuffles)
- keyword_search      inverted-scan term search, integer TF ranking
- dedup_apply         the END-TO-END dedup deliverable: corpus → exact-hash
                      dedup → minhash near-dup pairs → connected components
                      → surviving doc_ids ("rows to keep")

Every rule constant is mirrored literally in the SQL twins below; all
integer outputs (micro-scaled where ratios are needed) keep the value-hash
comparison fp-exact.

Scale notes (100-TB design):
- quality_filter / weighted_mix are stateless vectorized map_batches — no
  shuffle at all; mixing uses hash-of-stable-id (no RNG, no coordination).
- corpus_stats: per-batch partial aggregates ride a (source, lang)-bucketed
  reduce; the shuffle carries one partial row per (batch × group).
- dup_ngram_coverage: positional 5-grams carry (hash, doc_id, n_pos) — the
  classic two-pass DF computation: bucketed DF count on the hash, then a
  bucketed per-doc sum. Both shuffles carry int64 triples, never text.
- dedup_apply moves payload exactly twice: the survivor semi-join (ids ⋈
  docs) and minhash's candidate verification joins — both hash-partitioned
  Dataset.joins with cluster-scaled partitions. The final anti-join is a
  sentinel-tag bucketed group over ids only.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from .text import STOPWORDS

# ---------------------------------------------------------------------------
# shared constants (mirrored literally in the SQL twins)
# ---------------------------------------------------------------------------

QF_MIN_WORDS = 20
QF_MAX_WORDS = 5000
QF_MIN_MEAN_WORD_LEN = 3   # inclusive lower bound, integer-safe comparison
QF_MAX_MEAN_WORD_LEN = 10  # inclusive upper bound
QF_MIN_STOPWORDS = 2
NGRAM_N = 5
SEARCH_TERMS = ("spark", "hash", "merge", "sort")
SEARCH_TOP_K = 20
MIX_SALT = ":mix"


def _docs(sf_dir: str, columns=("doc_id", "text")) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


# ---------------------------------------------------------------------------
# quality_filter — Gopher-style composite heuristics
# ---------------------------------------------------------------------------

QUALITY_FILTER_SQL = """
WITH t AS (
  SELECT doc_id, length(text) AS n_chars, string_split(text, ' ') AS words
  FROM documents
),
f AS (
  SELECT doc_id,
         len(words) AS n_tokens,
         n_chars - (len(words) - 1) AS sum_tok,
         len(list_filter(words, w -> w IN ('the','a','and','of','to'))) AS n_stop,
         len(list_distinct(words)) AS n_distinct
  FROM t
)
SELECT doc_id,
  CAST(CASE WHEN n_tokens >= 20 AND n_tokens <= 5000 THEN 1 ELSE 0 END AS BIGINT) AS r_nwords,
  CAST(CASE WHEN sum_tok >= 3 * n_tokens AND sum_tok <= 10 * n_tokens THEN 1 ELSE 0 END AS BIGINT) AS r_wordlen,
  CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS BIGINT) AS r_stop,
  CAST(CASE WHEN 2 * n_distinct >= n_tokens THEN 1 ELSE 0 END AS BIGINT) AS r_distinct,
  CAST(CASE WHEN n_tokens >= 20 AND n_tokens <= 5000
             AND sum_tok >= 3 * n_tokens AND sum_tok <= 10 * n_tokens
             AND n_stop >= 2
             AND 2 * n_distinct >= n_tokens THEN 1 ELSE 0 END AS BIGINT) AS passes
FROM f
"""


def quality_filter(sf_dir: str) -> ray.data.Dataset:
    """Per-doc heuristic quality gates in the Gopher / C4 style (public
    rule families): word-count window, mean-word-length window (integer
    cross-multiplied — no float ratio), minimum stopword evidence, and a
    repetition gate (≥ half the tokens distinct). Emits one flag column per
    rule plus the conjunction, so downstream pipelines can tune by rule.
    Stateless vectorized map_batches — at 100 TB this is a pure streaming
    scan with no shuffle."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.split(" ")
        n_tokens = toks.str.len().astype("int64")
        n_chars = batch["text"].str.len().astype("int64")
        sum_tok = n_chars - (n_tokens - 1)  # single-space-join invariant
        stops = set(STOPWORDS)
        n_stop = toks.map(lambda ws: sum(1 for w in ws if w in stops)).astype("int64")
        n_distinct = toks.map(lambda ws: len(set(ws))).astype("int64")

        r_nwords = ((n_tokens >= QF_MIN_WORDS) & (n_tokens <= QF_MAX_WORDS)).astype("int64")
        r_wordlen = (
            (sum_tok >= QF_MIN_MEAN_WORD_LEN * n_tokens)
            & (sum_tok <= QF_MAX_MEAN_WORD_LEN * n_tokens)
        ).astype("int64")
        r_stop = (n_stop >= QF_MIN_STOPWORDS).astype("int64")
        r_distinct = (2 * n_distinct >= n_tokens).astype("int64")
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "r_nwords": r_nwords,
                "r_wordlen": r_wordlen,
                "r_stop": r_stop,
                "r_distinct": r_distinct,
                "passes": (r_nwords & r_wordlen & r_stop & r_distinct).astype("int64"),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pandas")


# ---------------------------------------------------------------------------
# weighted_mix — deterministic per-source sampling (dataset mixing)
# ---------------------------------------------------------------------------

WEIGHTED_MIX_SQL = """
SELECT doc_id, source
FROM documents
WHERE strpos('0123456789abcdef',
             substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 1)) - 1
      < 3 + (CAST(substr(source, 4) AS INTEGER) % 10)
"""


def weighted_mix(
    sf_dir: str, *, weights_path: str | None = None
) -> ray.data.Dataset:
    """Per-source sampling for dataset mixing. The keep decision hashes the
    stable doc_id (salted so it is independent of the train/val/test split
    hash), so the mix is reproducible across runs, engines and shard
    layouts — no RNG, no shuffle, no coordination.

    ``weights_path``: optional (source, rate16) parquet — the real
    deployment shape: per-source keep rates out of 16, broadcast to every
    task (weight tables are KB-scale). Sources absent from the table keep
    nothing. Default is the stand-in rule ``srcN`` keeps (3 + N % 10)/16,
    which the self-contained SQL oracle mirrors."""
    rates_ref = None
    if weights_path is not None:
        import pyarrow.parquet as pq

        wt = pq.read_table(weights_path).to_pydict()
        rates_ref = ray.put(dict(zip(wt["source"], wt["rate16"])))

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        hv = batch["doc_id"].map(
            lambda d: int(hashlib.md5((str(d) + MIX_SALT).encode()).hexdigest()[0], 16)
        )
        if rates_ref is None:
            rate16 = 3 + (batch["source"].str.slice(3).astype("int64") % 10)
        else:
            rates = ray.get(rates_ref)
            rate16 = batch["source"].map(lambda s: rates.get(s, 0))
        keep = hv < rate16
        return batch.loc[keep, ["doc_id", "source"]]

    return _docs(sf_dir, columns=("doc_id", "source")).map_batches(
        f, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# corpus_stats — per-(source, lang) audit aggregates
# ---------------------------------------------------------------------------

CORPUS_STATS_SQL = """
SELECT source, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
       CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
       CAST(MIN(len(string_split(text, ' '))) AS BIGINT) AS min_tokens,
       CAST(MAX(len(string_split(text, ' '))) AS BIGINT) AS max_tokens
FROM documents
GROUP BY source, lang
"""


def corpus_stats(sf_dir: str) -> ray.data.Dataset:
    """Corpus audit: per-(source, lang) doc/token/char totals and token
    extrema — the report a data pipeline publishes per ingest batch.
    Map-side partial aggregation (one row per group per batch) → bucketed
    merge; the shuffle carries partials, never documents."""
    from .shuffle import bucketed_group_agg

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        n_tokens = batch["text"].str.split(" ").str.len().astype("int64")
        n_chars = batch["text"].str.len().astype("int64")
        g = pd.DataFrame(
            {
                "source": batch["source"],
                "lang": batch["lang"],
                "n_docs": np.int64(1),
                "sum_tokens": n_tokens,
                "sum_chars": n_chars,
                "min_tokens": n_tokens,
                "max_tokens": n_tokens,
            }
        )
        return g.groupby(["source", "lang"], as_index=False).agg(
            n_docs=("n_docs", "sum"),
            sum_tokens=("sum_tokens", "sum"),
            sum_chars=("sum_chars", "sum"),
            min_tokens=("min_tokens", "min"),
            max_tokens=("max_tokens", "max"),
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["source", "lang"], as_index=False).agg(
            n_docs=("n_docs", "sum"),
            sum_tokens=("sum_tokens", "sum"),
            sum_chars=("sum_chars", "sum"),
            min_tokens=("min_tokens", "min"),
            max_tokens=("max_tokens", "max"),
        )

    return bucketed_group_agg(
        _docs(sf_dir, columns=("source", "lang", "text")),
        ["source", "lang"],
        final,
        partial_fn=partial,
        num_buckets=64,
    )


# ---------------------------------------------------------------------------
# dup_ngram_coverage — duplicated-5-gram coverage (Lee et al. 2022 signal)
# ---------------------------------------------------------------------------

DUP_NGRAM_COVERAGE_SQL = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
ng AS (
  SELECT doc_id, array_to_string(words[i+1 : i+5], ' ') AS ngram
  FROM w, LATERAL (SELECT UNNEST(generate_series(0, len(words) - 5)) AS i)
  WHERE len(words) >= 5
),
df AS (SELECT ngram, COUNT(DISTINCT doc_id) AS df FROM ng GROUP BY ngram)
SELECT ng.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_ngrams,
       CAST(SUM(CASE WHEN df.df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_positions
FROM ng JOIN df USING (ngram)
GROUP BY ng.doc_id
"""


def dup_ngram_coverage(sf_dir: str) -> ray.data.Dataset:
    """Per-doc duplicated-n-gram coverage: how many of a document's
    positional 5-grams also occur in at least one OTHER document (the
    exact-substring duplication signal of Lee et al. 2022; a high ratio
    marks boilerplate / template text for removal before training).

    Emits integers (n_ngrams, dup_positions) so the comparison stays
    fp-exact; coverage = dup_positions / n_ngrams downstream.

    Two thin shuffles: (hash, doc_id, n_pos) rows → bucketed distinct-doc
    DF count on the 64-bit n-gram hash (same collision budget as the
    n-gram Jaccard op) → bucketed per-doc position sums. Text never leaves
    the first map stage."""
    from .dedup import _md5_64_memo
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    def ngram_rows(batch: pa.Table) -> pa.Table:
        ids_out: list[np.ndarray] = []
        hs_out: list[np.ndarray] = []
        np_out: list[np.ndarray] = []
        for i, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            words = t.split(" ")
            if len(words) < NGRAM_N:
                continue
            grams = [
                " ".join(words[j : j + NGRAM_N])
                for j in range(len(words) - NGRAM_N + 1)
            ]
            h = np.fromiter(
                (_md5_64_memo(g) for g in grams), dtype=np.uint64, count=len(grams)
            )
            uh, counts = np.unique(h, return_counts=True)
            ids_out.append(np.full(len(uh), i, dtype=np.int64))
            hs_out.append(uh.view(np.int64))
            np_out.append(counts.astype(np.int64))
        if not ids_out:
            return pa.table(
                {
                    "h": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "n_pos": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "h": pa.array(np.concatenate(hs_out)),
                "doc_id": pa.array(np.concatenate(ids_out)),
                "n_pos": pa.array(np.concatenate(np_out)),
            }
        )

    nb = scaled_num_buckets(
        input_bytes_estimate(f"{sf_dir}/documents.parquet")
    )
    rows = _docs(sf_dir).map_batches(ngram_rows, batch_format="pyarrow")

    # DF per n-gram hash (rows are already distinct per (h, doc) → group
    # size == distinct-doc count), then flag and push back to the doc side.
    def df_final(g: pd.DataFrame) -> pd.DataFrame:
        df = g.groupby("h")["doc_id"].transform("size")
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].astype("int64"),
                "n_pos": g["n_pos"].astype("int64"),
                "dup_pos": np.where(df > 1, g["n_pos"], 0).astype("int64"),
            }
        )

    flagged = bucketed_group_agg(rows, ["h"], df_final, num_buckets=nb)

    def doc_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("doc_id", as_index=False).agg(
            n_ngrams=("n_pos", "sum"), dup_positions=("dup_pos", "sum")
        )

    def doc_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("doc_id", as_index=False).agg(
            n_ngrams=("n_ngrams", "sum"), dup_positions=("dup_positions", "sum")
        )
        out["n_ngrams"] = out["n_ngrams"].astype("int64")
        out["dup_positions"] = out["dup_positions"].astype("int64")
        return out

    return bucketed_group_agg(
        flagged, ["doc_id"], doc_final, partial_fn=doc_partial, num_buckets=nb
    )


# ---------------------------------------------------------------------------
# keyword_search — integer TF ranking over an inverted scan
# ---------------------------------------------------------------------------

KEYWORD_SEARCH_SQL = """
WITH s AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '),
                              w -> w IN ('spark','hash','merge','sort')))
              AS BIGINT) AS score
  FROM documents
)
SELECT doc_id, score FROM s
WHERE score > 0
ORDER BY score DESC, doc_id
LIMIT 20
"""


def keyword_search(sf_dir: str) -> ray.data.Dataset:
    """Term search: total occurrences of the query terms per doc (integer
    TF score — deterministic, fp-free), global top-20 by (score DESC,
    doc_id ASC). The (score, doc_id) sort key is unique, so the top-k cut
    is deterministic on both sides.

    Per-batch partial top-k (each batch forwards at most k candidate rows)
    → tiny global sort → limit. At 100 TB the sort input is k × n_batches
    rows, not the corpus."""
    terms = set(SEARCH_TERMS)

    def score_top(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.split(" ")
        score = toks.map(lambda ws: sum(1 for w in ws if w in terms)).astype("int64")
        out = pd.DataFrame({"doc_id": batch["doc_id"], "score": score})
        out = out[out["score"] > 0]
        return out.sort_values(
            ["score", "doc_id"], ascending=[False, True]
        ).head(SEARCH_TOP_K)

    return (
        _docs(sf_dir)
        .map_batches(score_top, batch_format="pandas")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(SEARCH_TOP_K)
    )


# ---------------------------------------------------------------------------
# dedup_apply — end-to-end: exact dedup → near-dup clusters → kept ids
# ---------------------------------------------------------------------------

# The one deliverable a training pipeline actually consumes: which rows
# survive BOTH exact and near-dup deduplication. The corpus is augmented
# with BOTH copy families (exact at %7 → +1M, near at %10 → +2M, both
# derived from ORIGINAL rows — mirrored literally below), exact-hash dedup
# keeps the min doc_id per content, then minhash pairs over the survivors
# feed connected components whose non-keepers are dropped.
DEDUP_APPLY_SQL = """
WITH RECURSIVE aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 2000000, text || ' extra token appended'
  FROM documents WHERE doc_id % 10 = 0
),
surv_ids AS (SELECT MIN(doc_id) AS doc_id FROM aug GROUP BY md5(text)),
s AS (SELECT a.doc_id, a.text FROM aug a JOIN surv_ids USING (doc_id)),
w AS (SELECT doc_id, string_split(text, ' ') AS words FROM s),
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
  SELECT doc_a, doc_b
  FROM inter
  JOIN cnt ca ON ca.doc_id = inter.doc_a
  JOIN cnt cb ON cb.doc_id = inter.doc_b
  WHERE inter_n * 1.0 / (ca.n + cb.n - inter_n) >= 0.7
),
e AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
nodes AS (SELECT DISTINCT a AS node FROM e),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.node
),
drops AS (
  SELECT node FROM reach GROUP BY node HAVING node != MIN(r)
)
SELECT s.doc_id FROM s
LEFT JOIN drops ON s.doc_id = drops.node
WHERE drops.node IS NULL
"""


def _augment_both(batch: pa.Table) -> pa.Table:
    """BOTH copy families, each derived from the original rows only (an
    exact copy is never near-copied and vice versa — matches the SQL)."""
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    out_id, out_text = list(ids), list(texts)
    for i, t in zip(ids, texts):
        if i % 7 == 0:
            out_id.append(i + 1_000_000)
            out_text.append(t)
        if i % 10 == 0:
            out_id.append(i + 2_000_000)
            out_text.append(t + " extra token appended")
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "text": pa.array(out_text, pa.string()),
        }
    )


def dedup_apply(sf_dir: str, *, survivor_spill_dir: str | None = None) -> ray.data.Dataset:
    """Corpus → deduplicated corpus, end to end. Returns the surviving
    doc_ids (the thin deliverable; re-joining payloads is one more hash
    join for callers that want full rows).

    Stages (all distributed; payload crosses the wire only in the survivor
    semi-join and minhash's verification joins):
      1. exact: md5(text) → bucketed min-keeper per content hash,
      2. survivors: keeper ids ⋈ augmented docs (hash-partitioned join),
      3. near: ops/dedup.minhash_pairs over survivors (LSH + exact-Jaccard
         verify at τ = 0.7),
      4. ops/cluster.connected_components → non-keeper drop ids,
      5. anti-join survivors ∖ drops via a sentinel-tag bucketed group
         over ids only.

    The survivor table feeds THREE consumers (band rows, shingle sets,
    final anti-join), so it is pinned once instead of re-executing the
    read + exact-dedup lineage three times. Default is
    ``materialize()`` (object store, spills under pressure — fine up to
    cluster-memory-scale corpora); pass ``survivor_spill_dir`` to
    checkpoint survivors to partitioned parquet and stream each consumer
    from storage instead — the 100-TB configuration, where pinning the
    whole corpus in the object store is the wrong residency."""
    from .cluster import connected_components
    from .dedup import minhash_pairs
    from .shuffle import (
        bucketed_group_agg,
        input_bytes_estimate,
        join_partitions,
        scaled_num_buckets,
    )

    size = input_bytes_estimate(f"{sf_dir}/documents.parquet")
    nb = scaled_num_buckets(size)
    docs = _docs(sf_dir).map_batches(_augment_both, batch_format="pyarrow")

    # 1. exact-hash keepers — shuffle carries (fp, doc_id) pairs only
    def fp_rows(batch: pa.Table) -> pa.Table:
        fps = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch["text"].to_pylist()]
        return pa.table({"fp": pa.array(fps, pa.string()), "doc_id": batch["doc_id"]})

    def min_keeper(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("fp", as_index=False)["doc_id"].min()
        return out[["doc_id"]]

    surv_ids = bucketed_group_agg(
        docs.map_batches(fp_rows, batch_format="pyarrow"),
        ["fp"],
        min_keeper,
        partial_fn=lambda b: b.groupby("fp", as_index=False)["doc_id"].min(),
        num_buckets=nb,
    )

    # 2. survivor payload semi-join (ids are thin; docs stream through)
    P, jkw = join_partitions(size_bytes=size)
    survivors = surv_ids.join(
        docs, "inner", P, on=("doc_id",), right_on=("doc_id",),
        left_suffix="", right_suffix="_r", **jkw,
    ).select_columns(["doc_id", "text"])
    if survivor_spill_dir is not None:
        survivors.write_parquet(survivor_spill_dir)
        survivors = ray.data.read_parquet(survivor_spill_dir)
    else:
        survivors = survivors.materialize()

    # 3.-4. near-dup pairs → components → drop ids (buckets byte-scaled:
    # pair volume grows with the corpus)
    pairs = minhash_pairs(survivors, size_bytes=size)
    labels = connected_components(pairs, num_buckets=nb)
    drops = labels.map_batches(
        lambda b: b.loc[b["is_keeper"] == 0, ["doc_id"]], batch_format="pandas"
    )

    # 5. anti-join survivors ∖ drops (shared sentinel-tag bucketed group)
    from .shuffle import anti_join_ids

    return anti_join_ids(
        survivors.select_columns(["doc_id"]), drops, "doc_id", num_buckets=nb
    )


# ---------------------------------------------------------------------------
# normalize_text — C4-style cleaning pass
# ---------------------------------------------------------------------------

# NFC + whitespace collapse + trim. Case folding is deliberately NOT part
# of the rule: Python str.lower() applies full Unicode case mappings (e.g.
# 'İ' → 'i̇', two codepoints) that SQL lower() does not replicate — an
# engine-dependent transform can't carry an exact oracle.
NORMALIZE_TEXT_SQL = """
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(nfc_normalize(text), '[ \t\n\r]+', ' ', 'g')) AS norm,
         text
  FROM documents
)
SELECT doc_id, norm AS text,
       CAST(CASE WHEN norm = text THEN 0 ELSE 1 END AS BIGINT) AS changed,
       CAST(length(text) - length(norm) AS BIGINT) AS n_chars_removed
FROM n
"""

import re as _re

_WS_RE = _re.compile(r"[ \t\n\r]+")


def normalize_text(sf_dir: str) -> ray.data.Dataset:
    """Deterministic text normalization: Unicode NFC, runs of
    space/tab/newline/CR collapsed to one space, leading/trailing
    whitespace stripped. Emits the cleaned text plus changed flag and
    chars-removed count (n_chars_removed is negative when NFC composition
    lengthens the string). Stateless streaming map."""
    import unicodedata

    ws = _WS_RE

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        orig = batch["text"]
        norm = orig.map(
            lambda t: ws.sub(" ", unicodedata.normalize("NFC", t)).strip(" ")
        )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "text": norm,
                "changed": (norm != orig).astype("int64"),
                "n_chars_removed": (
                    orig.str.len() - norm.str.len()
                ).astype("int64"),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pandas")


# ---------------------------------------------------------------------------
# tfidf_top_terms — per-document TF-IDF term ranking, integer-exact
# ---------------------------------------------------------------------------

TFIDF_K = 3
# idf is carried as the INTEGER (N * SCALE) // df so both engines rank on
# identical integer scores (float ln() differs in the last bit between
# libm and DuckDB and could flip a ranking tie). Bound: score = tf * (N *
# SCALE // df) must fit int64 — with SCALE=1e6 that holds to N ≈ 1e12 docs
# and tf ≈ 9e3; shrink SCALE for corpora beyond that.
TFIDF_SCALE = 1_000_000

TFIDF_TOP_TERMS_SQL = f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n FROM documents),
s AS (
  SELECT tf.doc_id, tf.term, tf.tf * ((n.n * {TFIDF_SCALE}) // df.df) AS score
  FROM tf JOIN df USING (term), n
)
SELECT doc_id, term, CAST(score AS BIGINT) AS score, CAST(rnk AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
  FROM s
)
WHERE rnk <= {TFIDF_K}
"""


def tfidf_top_terms(sf_dir: str) -> ray.data.Dataset:
    """Top-{k} terms per document by integer TF-IDF (the per-document
    keyword extraction every IR/curation stack wants).

    Scale shape — no vocabulary broadcast: (doc_id, term, tf) rows are
    bucketed by TERM, so each reduce task holds complete term groups and
    computes df LOCALLY (df = rows per term) — the idf rides back onto the
    rows as an integer, exactly the ride-along trick ngram_jaccard uses
    instead of a vocabulary join. A second bucketed reduce by doc_id takes
    the per-doc top-k. Two thin integer shuffles; N comes from parquet
    footer metadata (no scan), mirroring the oracle's COUNT(*)."""
    import pyarrow.compute as pc

    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    try:
        import pyarrow.parquet as pq

        n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    except Exception:
        n_docs = _docs(sf_dir).count()
    idf_num = n_docs * TFIDF_SCALE
    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/documents.parquet"))

    def tf_rows(batch: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(batch["text"], " ")
        n_per = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = np.repeat(
            batch["doc_id"].to_numpy(zero_copy_only=False), n_per
        )
        flat = np.asarray(pc.list_flatten(toks), dtype=object)
        f = pd.DataFrame({"doc_id": ids, "term": flat})
        out = f.groupby(["doc_id", "term"], as_index=False).size()
        return out.rename(columns={"size": "tf"}).astype({"tf": "int64"})

    def per_term(g: pd.DataFrame) -> pd.DataFrame:
        # complete term groups per bucket: df is a local transform
        df = g.groupby("term", sort=False)["doc_id"].transform("size")
        score = g["tf"].to_numpy() * (idf_num // df.to_numpy())
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].astype("int64"),
                "term": g["term"],
                "score": score.astype("int64"),
            }
        )

    def per_doc_partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.sort_values(["score", "term"], ascending=[False, True])
            .groupby("doc_id", as_index=False, sort=False)
            .head(TFIDF_K)
        )

    def per_doc_final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "score", "term"], ascending=[True, False, True])
        top = g.groupby("doc_id", sort=False).head(TFIDF_K)
        rank = top.groupby("doc_id", sort=False).cumcount() + 1
        return pd.DataFrame(
            {
                "doc_id": top["doc_id"].astype("int64"),
                "term": top["term"],
                "score": top["score"].astype("int64"),
                "rank": rank.astype("int64"),
            }
        )

    tf = _docs(sf_dir).map_batches(tf_rows, batch_format="pyarrow")
    scored = bucketed_group_agg(tf, ["term"], per_term, num_buckets=nb)
    return bucketed_group_agg(
        scored, ["doc_id"], per_doc_final, partial_fn=per_doc_partial, num_buckets=nb
    )


# ---------------------------------------------------------------------------
# length_percentile_filter — global exact percentile → broadcast → filter
# ---------------------------------------------------------------------------

LENGTH_PCTL_Q_NUM, LENGTH_PCTL_Q_DEN = 9, 10  # p90, as an exact rational

LENGTH_PERCENTILE_FILTER_SQL = f"""
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
n AS (SELECT COUNT(*) AS n FROM t),
r AS (SELECT n_tokens, row_number() OVER (ORDER BY n_tokens) AS rn FROM t),
thr AS (
  SELECT min(n_tokens) AS v
  FROM r, n
  WHERE rn >= ({LENGTH_PCTL_Q_NUM} * n.n + {LENGTH_PCTL_Q_DEN - 1}) // {LENGTH_PCTL_Q_DEN}
)
SELECT t.doc_id, t.n_tokens FROM t, thr WHERE t.n_tokens >= thr.v
"""


def length_percentile_filter(sf_dir: str) -> ray.data.Dataset:
    """Documents at or above the global p90 token count — the
    aggregate → broadcast-threshold → filter composition every
    percentile-based curation rule uses (e.g. keep only unusually long /
    short documents).

    Exactness: the threshold is the smallest value whose cumulative count
    reaches ceil(q·N), computed in pure integers on both sides (no float
    quantile interpolation). Scale shape: a per-batch value-count combiner
    → one small bucketed merge into a DISTRIBUTED (value, count)
    histogram — it never gathers; shuffle.descending_value_cut walks it
    (ascending, count-weighted) to the exact crossing value with O(256)
    driver state per level, the threshold broadcasts, and the corpus
    streams through a vectorized filter. Zero row shuffles."""
    import pyarrow.compute as pc

    from .shuffle import bucketed_group_agg

    def counts_partial(batch: pa.Table) -> pd.DataFrame:
        n = pc.list_value_length(pc.split_pattern(batch["text"], " ")).to_numpy(
            zero_copy_only=False
        )
        vals, cnts = np.unique(n, return_counts=True)
        return pd.DataFrame({"n_tokens": vals.astype("int64"), "cnt": cnts.astype("int64")})

    def counts_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("n_tokens", as_index=False)["cnt"].sum()
        return out.astype({"n_tokens": "int64", "cnt": "int64"})

    from .shuffle import descending_value_cut

    hist = bucketed_group_agg(
        _docs(sf_dir).map_batches(counts_partial, batch_format="pyarrow"),
        ["n_tokens"],
        counts_final,
        num_buckets=16,
    )  # stays distributed — only refinement profiles reach the driver
    n_total = int(hist.sum("cnt") or 0)
    rank_needed = (LENGTH_PCTL_Q_NUM * n_total + LENGTH_PCTL_Q_DEN - 1) // LENGTH_PCTL_Q_DEN
    threshold = descending_value_cut(
        hist, "n_tokens", lambda c: c >= rank_needed,
        weight_col="cnt", ascending=True,
    )[0]

    def keep(batch: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern(batch["text"], " "))
        n = pc.cast(n, pa.int64())
        out = pa.table({"doc_id": batch["doc_id"], "n_tokens": n})
        return out.filter(pc.greater_equal(n, pa.scalar(threshold, pa.int64())))

    return _docs(sf_dir).map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# bm25_search — BM25-shaped ranking with engine-exact arithmetic
# ---------------------------------------------------------------------------

# k1 = 6/5, b = 3/4 as exact rationals. Closed form per term after
# clearing denominators (T = total corpus tokens, N = docs, dl = doc len):
#   tf_term = idf · (k1+1)·tf / (tf + k1·(1-b + b·dl·N/T))
#           = idf · 22·tf·T / (10·T·tf + 3·T + 9·dl·N)
# idf is the integer (N·1e6)//df (a linear idf — ln() is NOT engine-exact,
# see tfidf_top_terms). The numerator is evaluated in float64 with a FIXED
# operation order mirrored in the SQL; the denominator stays int64 (exact).
# Per-doc score = the 4 per-term scores added in fixed term order, so both
# engines produce bit-identical float64 scores and the ranking cannot
# diverge. The emitted columns are integers only (rank, not score).
BM25_IDF_SCALE = 1_000_000


def _bm25_sql() -> str:
    tf_exprs = ",\n       ".join(
        f"CAST(len(list_filter(words, w -> w = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(SEARCH_TERMS)
    )
    df_exprs = ",\n       ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(len(SEARCH_TERMS))
    )
    term_scores = "\n     + ".join(
        f"(CASE WHEN tf{i} = 0 OR df{i} = 0 THEN 0.0 ELSE "
        f"((CAST((n * {BM25_IDF_SCALE}) // df{i} AS DOUBLE) * 22) * tf{i}) * tt "
        f"/ ((10 * tt) * tf{i} + 3 * tt + (9 * dl) * n) END)"
        for i in range(len(SEARCH_TERMS))
    )
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
d AS (
  SELECT doc_id, CAST(len(words) AS BIGINT) AS dl,
       {tf_exprs}
  FROM t
),
g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS tt,
       {df_exprs}
  FROM d
),
s AS (
  SELECT d.doc_id,
       {term_scores} AS score
  FROM d, g
)
SELECT doc_id, CAST(rnk AS BIGINT) AS rank
FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
  FROM s WHERE score > 0
)
WHERE rnk <= {SEARCH_TOP_K}
"""


BM25_SEARCH_SQL = _bm25_sql()


def bm25_search(sf_dir: str) -> ray.data.Dataset:
    """Top-20 documents for the fixed query terms under BM25-shaped
    scoring (TF saturation k1=1.2, length normalization b=0.75, linear
    integer idf). See the arithmetic note above — scores are bit-identical
    float64 on both engines, so the integer (doc_id, rank) output is
    exact.

    Scale shape: pass 1 is a per-batch combiner producing ONE partial row
    (per-term df counts + total length + doc count) per batch, reduced to
    a handful of driver-side integers — the corpus never leaves the
    workers. Pass 2 re-streams the docs, scores each batch vectorized
    against the broadcast constants, and forwards only a per-batch top-k
    into the tiny global sort (keyword_search's partial-top-k shape)."""

    def stats_partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.split(" ")
        row = {"n": np.int64(len(batch)), "tt": np.int64(toks.str.len().sum())}
        for i, t in enumerate(SEARCH_TERMS):
            row[f"df{i}"] = np.int64(
                sum(1 for ws in toks if t in ws)
            )
        return pd.DataFrame([row])

    stats = (
        _docs(sf_dir)
        .map_batches(stats_partial, batch_format="pandas")
        .to_pandas()
        .sum()
    )
    n, tt = int(stats["n"]), int(stats["tt"])
    idf = [
        (n * BM25_IDF_SCALE) // int(stats[f"df{i}"]) if int(stats[f"df{i}"]) else 0
        for i in range(len(SEARCH_TERMS))
    ]

    def score_top(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.split(" ")
        dl = toks.str.len().to_numpy().astype("int64")
        score = np.zeros(len(batch), dtype="float64")
        den_base = (3 * tt) + (9 * dl) * n  # int64, exact
        for i, t in enumerate(SEARCH_TERMS):
            if idf[i] == 0:
                continue
            tf = toks.map(lambda ws, t=t: sum(1 for w in ws if w == t)).to_numpy(
                dtype="int64"
            )
            den = (10 * tt) * tf + den_base
            num = ((np.float64(idf[i]) * 22) * tf) * tt
            score = score + np.where(tf == 0, 0.0, num / den)
        out = pd.DataFrame({"doc_id": batch["doc_id"], "score": score})
        out = out[out["score"] > 0]
        return out.sort_values(["score", "doc_id"], ascending=[False, True]).head(
            SEARCH_TOP_K
        )

    top = (
        _docs(sf_dir)
        .map_batches(score_top, batch_format="pandas")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(SEARCH_TOP_K)
        .to_pandas()
    )
    top = top.sort_values(["score", "doc_id"], ascending=[False, True]).reset_index(
        drop=True
    )
    out = pd.DataFrame(
        {
            "doc_id": top["doc_id"].astype("int64"),
            "rank": pd.Series(range(1, len(top) + 1), dtype="int64"),
        }
    )
    return ray.data.from_pandas(out)


# ---------------------------------------------------------------------------
# global_rank — total-order ranking WITHOUT a global sort
# ---------------------------------------------------------------------------

GLOBAL_RANK_SQL = """
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank
FROM documents
"""


def global_rank(sf_dir: str) -> ray.data.Dataset:
    """Every document's global rank under ORDER BY (n_chars DESC, doc_id)
    — the full-corpus ranking query, computed WITHOUT Ray's all-to-all
    sort: the key's value domain (n_chars) is bounded, so a tiny
    (value, count) histogram reaches the driver, its cumulative sum gives
    each value's global rank OFFSET, the offsets broadcast, and one
    bucketed reduce (complete n_chars groups per bucket) ranks each
    value's docs locally by the tie-break key and adds the offset.

    Scale shape: the shuffle carries (doc_id, n_chars) pairs hashed by
    n_chars — same volume as a sort's exchange but with NO range
    partitioning / sampling stage, and skewed key values spread over
    buckets only as whole groups (a group = one value's docs; if one
    VALUE dominated, the histogram would show it and a salted tie-break
    split would apply — n_chars on real corpora is near-uniform)."""
    from .shuffle import bucketed_group_agg

    docs = _docs(sf_dir, columns=("doc_id", "n_chars"))

    def hist_partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.groupby("n_chars", as_index=False).size()
        return out.rename(columns={"size": "cnt"}).astype(
            {"n_chars": "int64", "cnt": "int64"}
        )

    def hist_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("n_chars", as_index=False)["cnt"].sum()
        return out.astype({"n_chars": "int64", "cnt": "int64"})

    hist = (
        bucketed_group_agg(docs, ["n_chars"], hist_final, partial_fn=hist_partial,
                           num_buckets=16)
        .to_pandas()
        .sort_values("n_chars", ascending=False)
    )
    # offset[v] = docs with n_chars strictly greater than v (DESC order)
    offs = dict(
        zip(
            hist["n_chars"].to_numpy(),
            (hist["cnt"].cumsum() - hist["cnt"]).to_numpy(),
        )
    )
    offs_ref = ray.put(offs)

    def per_value(g: pd.DataFrame) -> pd.DataFrame:
        offs_ = ray.get(offs_ref)
        g = g.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        local = g.groupby("n_chars", sort=False).cumcount() + 1
        base = g["n_chars"].map(offs_).to_numpy()
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].astype("int64").to_numpy(),
                "rank": (base + local.to_numpy()).astype("int64"),
            }
        )

    return bucketed_group_agg(docs, ["n_chars"], per_value)


# ---------------------------------------------------------------------------
# Vocabulary build (embedding-training prep)
# ---------------------------------------------------------------------------

VOCAB_MIN_COUNT = 5

VOCAB_BUILD_SQL = f"""
WITH w AS (
  SELECT UNNEST(string_split(text, ' ')) AS token FROM documents
),
c AS (
  SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM w GROUP BY token
  HAVING count(*) >= {VOCAB_MIN_COUNT}
)
SELECT token, cnt,
       CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS vocab_id
FROM c
"""


def vocab_build(sf_dir: str, *, min_count: int = VOCAB_MIN_COUNT) -> ray.data.Dataset:
    """Embedding-training vocabulary: tokens with corpus frequency ≥
    min_count, assigned contiguous ids by (count DESC, token) — the
    word2vec/fastText vocab table. The token counting is the standard
    per-batch combiner → byte-scaled bucketed reduce (token cardinality is
    corpus-scale); the min_count filter runs INSIDE the reduce, so only
    the surviving vocabulary — whose size min_count bounds by construction
    (Heaps'-law tail cut; at 100 TB pick min_count so |vocab| ~ 10^5-10^6)
    — reaches the single ranking task. The final rank is one vectorized
    sort of that bounded table, not an all-to-all over token counts."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.split(" ")
        flat = pd.Series(np.concatenate(toks.to_numpy()), name="token")
        c = flat.groupby(flat, sort=False).size()
        return pd.DataFrame({"token": c.index, "n": c.to_numpy().astype("int64")})

    def count_final(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("token", as_index=False).agg(cnt=("n", "sum"))
        return s.loc[s["cnt"] >= min_count].astype({"cnt": "int64"})

    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/documents.parquet"))
    vocab = bucketed_group_agg(ds.map_batches(count_partial, batch_format="pandas"),
                               ["token"], count_final, num_buckets=nb)

    def rank(b: pd.DataFrame) -> pd.DataFrame:
        s = b.sort_values(["cnt", "token"], ascending=[False, True])
        return pd.DataFrame(
            {
                "token": s["token"].to_numpy(),
                "cnt": s["cnt"].astype("int64").to_numpy(),
                "vocab_id": np.arange(1, len(s) + 1, dtype="int64"),
            }
        )

    # the min_count-bounded vocab ranks in ONE task by design
    return vocab.repartition(1).map_batches(rank, batch_format="pandas")


TOKENIZE_IDS_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
t AS (
  SELECT doc_id, CAST(i + 1 AS BIGINT) AS pos, words[i+1] AS token
  FROM w, LATERAL (SELECT UNNEST(generate_series(0, len(words)-1)) AS i)
),
c AS (
  SELECT token, count(*) AS cnt FROM t GROUP BY token
  HAVING count(*) >= {VOCAB_MIN_COUNT}
),
v AS (
  SELECT token,
         CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS vocab_id
  FROM c
)
SELECT t.doc_id, t.pos, COALESCE(v.vocab_id, 0) AS token_id
FROM t LEFT JOIN v ON t.token = v.token
"""


def tokenize_ids(
    sf_dir: str, *, broadcast_max_vocab: int = 2_000_000
) -> ray.data.Dataset:
    """Corpus → (doc_id, pos, token_id) training sequences under the
    vocab_build vocabulary (OOV → 0): the tokenization pass an embedding
    trainer consumes. Size-gated vocab attach (VERDICT r4 #6, the
    pmi_bigrams pattern): while the min_count-bounded vocab fits the gate
    it broadcasts as one sorted-array lookup (ray.put once, searchsorted
    per batch — the same pattern as the dimension joins) and the token
    stream never shuffles — each batch explodes and resolves locally.
    Past the gate (a Heaps'-law vocab that outgrew a worker) the attach
    degrades to the tag-union shuffle: exploded (doc_id, pos, token) rows
    and (token, vocab_id) rows ride into the same byte-scaled bucket and
    the per-bucket reduce maps ids on — one thin shuffle of int-plus-token
    rows, no worker ever holds the whole vocabulary."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    vocab_ds = vocab_build(sf_dir).materialize()  # min_count-bounded by design
    n_vocab = vocab_ds.count()

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        split = batch["text"].str.split(" ")
        lens = split.str.len().to_numpy()
        flat = np.concatenate(split.to_numpy()).astype(str)
        pos = np.concatenate([np.arange(1, n + 1) for n in lens]).astype("int64")
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].repeat(lens).to_numpy(),
                "pos": pos,
                "token": flat,
            }
        )

    if n_vocab <= broadcast_max_vocab:
        vocab = vocab_ds.to_pandas()
        toks = vocab["token"].to_numpy(dtype=str)
        order = np.argsort(toks)
        ref = ray.put(
            (toks[order], vocab["vocab_id"].to_numpy()[order].astype("int64"))
        )

        def f(batch: pd.DataFrame) -> pd.DataFrame:
            keys, ids = ray.get(ref)
            e = explode(batch)
            flat = e["token"].to_numpy()
            idx = np.clip(np.searchsorted(keys, flat), 0, len(keys) - 1)
            hit = keys[idx] == flat
            e["token_id"] = np.where(hit, ids[idx], 0).astype("int64")
            return e[["doc_id", "pos", "token_id"]]

        return ds.map_batches(f, batch_format="pandas")

    # tag-union fallback: vocab rows carry _vid >= 1, token rows _vid == -1
    # (vocab_id is 1-based); both sides share identical typed columns
    def tag_tokens(b: pd.DataFrame) -> pd.DataFrame:
        e = explode(b)
        return e.assign(_vid=np.int64(-1))[["token", "doc_id", "pos", "_vid"]]

    def tag_vocab(v: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "token": v["token"].astype(str),
                "doc_id": np.int64(-1),
                "pos": np.int64(-1),
                "_vid": v["vocab_id"].astype("int64"),
            }
        )

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        vid = g.loc[g["_vid"] >= 0].set_index("token")["_vid"]
        rows = g.loc[g["_vid"] < 0]
        token_id = rows["token"].map(vid).fillna(0).astype("int64")
        return pd.DataFrame(
            {
                "doc_id": rows["doc_id"].astype("int64"),
                "pos": rows["pos"].astype("int64"),
                "token_id": token_id,
            }
        )

    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/documents.parquet"))
    return bucketed_group_agg(
        ds.map_batches(tag_tokens, batch_format="pandas").union(
            vocab_ds.map_batches(tag_vocab, batch_format="pandas")
        ),
        ["token"], attach, num_buckets=nb,
    )


# ---------------------------------------------------------------------------
# End-to-end curation report (the composed deliverable)
# ---------------------------------------------------------------------------

CURATION_REPORT_SQL = """
WITH t AS (
  SELECT doc_id, lang, length(text) AS n_chars, string_split(text, ' ') AS words
  FROM documents
),
f AS (
  SELECT doc_id, lang,
         len(words) AS n_tokens,
         n_chars - (len(words) - 1) AS sum_tok,
         len(list_filter(words, w -> w IN ('the','a','and','of','to'))) AS n_stop,
         len(list_distinct(words)) AS n_distinct
  FROM t
),
q AS (
  SELECT doc_id, lang,
         strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS hv
  FROM f
  WHERE n_tokens >= 20 AND n_tokens <= 5000
    AND sum_tok >= 3 * n_tokens AND sum_tok <= 10 * n_tokens
    AND n_stop >= 2 AND 2 * n_distinct >= n_tokens
),
w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
p AS (
  SELECT doc_id, CAST(i AS BIGINT) AS para_idx,
         array_to_string(words[i*20+1 : (i+1)*20], ' ') AS ptext,
         md5(array_to_string(words[i*20+1 : (i+1)*20], ' ')) AS fp,
         doc_id * 100000 + i AS pos_code
  FROM w, LATERAL (
    SELECT UNNEST(generate_series(0, CAST(floor((len(words)-1)/20.0) AS BIGINT))) AS i
  )
),
k AS (SELECT fp, MIN(pos_code) AS keeper FROM p GROUP BY fp),
surv AS (
  SELECT p.doc_id,
         SUM(len(string_split(p.ptext, ' '))) AS n_clean_tokens
  FROM p JOIN k ON p.fp = k.fp AND p.pos_code = k.keeper
  GROUP BY p.doc_id
)
SELECT CASE WHEN q.hv < 13 THEN 'train' WHEN q.hv < 15 THEN 'val' ELSE 'test' END
         AS split,
       q.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(s.n_clean_tokens) AS BIGINT) AS n_tokens
FROM q JOIN surv s ON q.doc_id = s.doc_id
GROUP BY 1, q.lang
"""


def curation_report(sf_dir: str) -> ray.data.Dataset:
    """The composed end-to-end curation deliverable: quality rules →
    paragraph-level dedup survival → deterministic split assignment →
    per-(split, lang) document and clean-token counts — the summary table
    a dataset card publishes. Composition cost: the quality/split/lang
    side is one streaming scan emitting thin (doc_id, lang, split) rows
    for passing docs; the dedup side is paragraph_dedup_apply reduced to
    (doc_id, n_clean_tokens) ints; ONE int-keyed hash join intersects
    them; the final roll-up domain is splits × languages (tiny)."""
    from .dedup import paragraph_dedup_apply
    from .shuffle import input_bytes_estimate, join_partitions

    surv = paragraph_dedup_apply(sf_dir).map_batches(
        lambda b: pd.DataFrame(
            {
                "sid": b["doc_id"].astype("int64"),
                "n_clean_tokens": b["clean_text"].str.split(" ").str.len().astype("int64"),
            }
        ),
        batch_format="pandas",
    )

    stops = set(STOPWORDS)

    def qualify(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.split(" ")
        n_tokens = toks.str.len().astype("int64")
        n_chars = b["text"].str.len().astype("int64")
        sum_tok = n_chars - (n_tokens - 1)
        n_stop = toks.map(lambda ws: sum(1 for w in ws if w in stops)).astype("int64")
        n_distinct = toks.map(lambda ws: len(set(ws))).astype("int64")
        keep = (
            (n_tokens >= QF_MIN_WORDS) & (n_tokens <= QF_MAX_WORDS)
            & (sum_tok >= QF_MIN_MEAN_WORD_LEN * n_tokens)
            & (sum_tok <= QF_MAX_MEAN_WORD_LEN * n_tokens)
            & (n_stop >= QF_MIN_STOPWORDS)
            & (2 * n_distinct >= n_tokens)
        )
        kept = b.loc[keep]
        hv = kept["doc_id"].map(
            lambda d: int(hashlib.md5(str(d).encode()).hexdigest()[0], 16)
        )
        split = np.where(hv < 13, "train", np.where(hv < 15, "val", "test"))
        return pd.DataFrame(
            {
                "doc_id": kept["doc_id"].astype("int64"),
                "lang": kept["lang"].astype(str),
                "split": pd.Series(split, index=kept.index, dtype=str),
            }
        )

    q = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).map_batches(qualify, batch_format="pandas")

    P, jkw = join_partitions(
        size_bytes=input_bytes_estimate(f"{sf_dir}/documents.parquet")
    )
    j = q.join(surv, "inner", P, on=("doc_id",), right_on=("sid",), **jkw)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["split", "lang"], as_index=False).agg(
            n=("n_clean_tokens", "size"), tk=("n_clean_tokens", "sum")
        )

    agg = (
        j.map_batches(partial, batch_format="pandas")
        .groupby(["split", "lang"])
        .aggregate(Sum("n", alias_name="n_docs"), Sum("tk", alias_name="n_tokens"))
    )
    return agg.map_batches(
        lambda b: pd.DataFrame(
            {
                "split": b["split"],
                "lang": b["lang"],
                "n_docs": b["n_docs"].astype("int64"),
                "n_tokens": b["n_tokens"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# Cross-source contamination: exact duplicates shared between sources
# ---------------------------------------------------------------------------

CROSS_SOURCE_DUPS_SQL = """
WITH aug AS (
  SELECT source, text FROM documents
  UNION ALL
  SELECT 'mirror' AS source, text FROM documents WHERE doc_id % 7 = 0
),
f AS (SELECT DISTINCT source, md5(text) AS fp FROM aug)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM f a JOIN f b ON a.fp = b.fp AND a.source < b.source
GROUP BY a.source, b.source
"""


def cross_source_dups(sf_dir: str) -> ray.data.Dataset:
    """Cross-source contamination report: for every (source_a < source_b)
    pair, how many distinct document contents appear in BOTH — the audit
    a training-data pipeline runs before mixing corpora (benchmark/eval
    leakage across crawls shows up exactly here). The synthetic corpus has
    no natural cross-source dupes, so (exact_dedup's trick) every 7th doc
    is deterministically mirrored under a 'mirror' source ON BOTH ENGINES,
    making the oracle non-trivial.

    Scale shape: per-batch distinct (source, fp) combiners → ONE bucketed
    shuffle on the content hash (carries 2 thin columns, never text); a
    bucket sees every source of each fp it owns, so pair expansion is
    bucket-local (C(k,2) rows only for the rare fp shared by k ≥ 2
    sources); the final aggregate is |source|²-bounded."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    path = f"{sf_dir}/documents.parquet"
    ds = ray.data.read_parquet(path, columns=["doc_id", "source", "text"])
    nb = scaled_num_buckets(input_bytes_estimate(path))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        fp = b["text"].map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())
        f = pd.DataFrame({"source": b["source"], "fp": fp})
        m = (b["doc_id"] % 7 == 0).to_numpy()
        if m.any():
            f = pd.concat(
                [f, pd.DataFrame({"source": "mirror", "fp": fp.to_numpy()[m]})],
                ignore_index=True,
            )
        return f.drop_duplicates()

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized pair expansion: filter to multi-source fps, then a
        # hash self-merge on fp — never a per-fp Python list loop
        g = g.drop_duplicates(["fp", "source"])
        multi = g.loc[g["fp"].duplicated(keep=False)]
        f = multi.merge(multi, on="fp", suffixes=("_a", "_b"))
        f = f.loc[f["source_a"] < f["source_b"]]
        out = f.groupby(["source_a", "source_b"], as_index=False).size()
        return out.rename(columns={"size": "pn"}).astype({"pn": "int64"})

    partials = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas"), ["fp"], per_bucket,
        num_buckets=nb,
    )
    agg = partials.groupby(["source_a", "source_b"]).aggregate(
        Sum("pn", alias_name="n_shared")
    )
    return agg.map_batches(
        lambda b: pd.DataFrame(
            {
                "source_a": b["source_a"],
                "source_b": b["source_b"],
                "n_shared": b["n_shared"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# Source vocabulary overlap (pairwise Jaccard via bitmask fold)
# ---------------------------------------------------------------------------

SOURCE_VOCAB_OVERLAP_SQL = """
WITH st AS (
  SELECT DISTINCT source, token FROM (
    SELECT source, UNNEST(string_split(text, ' ')) AS token FROM documents)
),
sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM st GROUP BY source),
pair AS (
  SELECT a.source AS source_a, b.source AS source_b
  FROM sz a JOIN sz b ON a.source < b.source
),
inter AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS n_inter
  FROM st a JOIN st b ON a.token = b.token AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT p.source_a, p.source_b,
       COALESCE(i.n_inter, 0) AS n_inter,
       za.n + zb.n - COALESCE(i.n_inter, 0) AS n_union,
       CAST(COALESCE(i.n_inter, 0) * 1000000
            // (za.n + zb.n - COALESCE(i.n_inter, 0)) AS BIGINT) AS jaccard_ppm
FROM pair p
JOIN sz za ON za.source = p.source_a
JOIN sz zb ON zb.source = p.source_b
LEFT JOIN inter i ON i.source_a = p.source_a AND i.source_b = p.source_b
"""

VOCAB_OVERLAP_MAX_SOURCES = 63  # bitmask fold fits one int64


def source_vocab_overlap(sf_dir: str) -> ray.data.Dataset:
    """Pairwise vocabulary Jaccard between sources (×10^6, integer): the
    corpus-mixing diagnostic — which crawls/domains share a lexicon and
    which are disjoint. The naive shape is a token self-join (|vocab|²
    worst case); here each token folds into ONE int64 bitmask of the
    sources containing it, so the whole statistic reduces to a (mask →
    token-count) histogram of at most 2^|sources| rows, and every pair's
    intersection/union is a popcount-filtered sum over that histogram —
    no self-join, no pair explosion through the shuffle.

    Source taxonomy is a bounded dimension (≤ 63 here — one int64 mask);
    a wider taxonomy must RAISE and restructure (e.g. pairwise count
    path), never silently truncate. Shuffles: one bucketed token reduce
    (carries int64 masks), one tiny mask-histogram merge; the pair table
    is computed vectorized over ≤ 2^k histogram rows in the final task."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    path = f"{sf_dir}/documents.parquet"
    srcs = (
        ray.data.read_parquet(path, columns=["source"])
        .map_batches(
            lambda b: pd.DataFrame({"source": b["source"].unique()}),
            batch_format="pandas",
        )
        .to_pandas()["source"]
        .unique()
    )
    sources = sorted(srcs)
    if len(sources) > VOCAB_OVERLAP_MAX_SOURCES:
        raise ValueError(
            f"source_vocab_overlap: {len(sources)} sources exceed the "
            f"{VOCAB_OVERLAP_MAX_SOURCES}-bit mask fold — restructure onto a "
            "pairwise (source_a, source_b, token)-bucketed count path"
        )
    bit_of = {s: np.int64(1) << i for i, s in enumerate(sources)}
    nb = scaled_num_buckets(input_bytes_estimate(path))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ex = b["text"].str.split(" ").explode()
        f = pd.DataFrame(
            {"source": b["source"].loc[ex.index].to_numpy(), "t": ex.to_numpy()}
        ).drop_duplicates()
        f["m"] = f["source"].map(bit_of).astype("int64")
        # distinct (source, token) ⇒ distinct bits ⇒ sum == bitwise OR
        return f.groupby("t", as_index=False)["m"].sum()

    def mask_hist(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-token OR: sort by token, bitwise_or.reduceat at
        # group starts — no per-key Python lambda over a vocab-sized bucket
        g = g.sort_values("t", kind="stable")
        t = g["t"].to_numpy()
        m = g["m"].to_numpy().astype("int64")
        starts = np.flatnonzero(np.r_[True, t[1:] != t[:-1]])
        masks = np.bitwise_or.reduceat(m, starts)
        vc = pd.Series(masks).value_counts()
        return pd.DataFrame(
            {"mask": vc.index.astype("int64"), "n": vc.to_numpy().astype("int64")}
        )

    hist = bucketed_group_agg(
        ray.data.read_parquet(path, columns=["source", "text"]).map_batches(
            partial, batch_format="pandas"
        ),
        ["t"], mask_hist, num_buckets=nb,
    )

    def hist_merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("mask", as_index=False)["n"].sum()
        return out.astype({"mask": "int64", "n": "int64"})

    hist = bucketed_group_agg(hist, ["mask"], hist_merge, num_buckets=64)

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        masks = b["mask"].to_numpy().astype("int64")
        n = b["n"].to_numpy().astype("int64")
        size = {
            s: int(n[(masks >> i) & 1 == 1].sum()) for i, s in enumerate(sources)
        }
        rows = []
        for i, sa in enumerate(sources):
            for j in range(i + 1, len(sources)):
                sb = sources[j]
                both = ((masks >> i) & 1 == 1) & ((masks >> j) & 1 == 1)
                inter = int(n[both].sum())
                union = size[sa] + size[sb] - inter
                rows.append(
                    (sa, sb, inter, union, inter * 1_000_000 // union)
                )
        return pd.DataFrame(
            rows,
            columns=["source_a", "source_b", "n_inter", "n_union", "jaccard_ppm"],
        ).astype({"n_inter": "int64", "n_union": "int64", "jaccard_ppm": "int64"})

    return hist.repartition(1).map_batches(
        pairs, batch_format="pandas", batch_size=None
    )


# ---------------------------------------------------------------------------
# Per-document keyword extraction (tf-idf, integer idf surrogate)
# ---------------------------------------------------------------------------

DOC_KEYWORDS_K = 3

DOC_KEYWORDS_SQL = """
WITH w AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM w GROUP BY doc_id, term),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
s AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         tf.tf * (SELECT n FROM n) // df.df AS score,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf * (SELECT n FROM n) // df.df DESC, tf.term
         ) AS rk
  FROM tf JOIN df USING (term)
)
SELECT doc_id, term, tf, df, CAST(score AS BIGINT) AS score,
       CAST(rk AS BIGINT) AS rank
FROM s WHERE rk <= 3
"""


def doc_keywords(sf_dir: str) -> ray.data.Dataset:
    """Per-document keyword extraction: the top-3 terms by tf·idf, with
    idf as the exact integer surrogate ``N_docs // df`` folded into
    ``tf * N // df`` (same ranking signal as tf·log(N/df) for fixed tf;
    integers hash identically across engines, float logs do not). This is
    tfidf_top_terms' corpus statistic turned per-document — the tagging /
    routing signal a curation pipeline attaches before mixing.

    Scale shape: tf rows are batch-local (a document is one input row);
    ONE bucketed shuffle on the term computes df AND attaches it in place
    (the bucket owns each term fully — no separate join); per-batch
    partial top-3-per-doc combiners shrink the doc-bucketed final reduce
    (top-k of partial top-ks is exact). All shuffles carry thin
    (id, term, int64) rows."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    path = f"{sf_dir}/documents.parquet"
    docs = ray.data.read_parquet(path, columns=["doc_id", "text"])
    n_docs = docs.count()
    nb = scaled_num_buckets(input_bytes_estimate(path))

    def tf_rows(b: pd.DataFrame) -> pd.DataFrame:
        ex = b["text"].str.split(" ").explode()
        f = pd.DataFrame(
            {"doc_id": b["doc_id"].loc[ex.index].to_numpy(), "term": ex.to_numpy()}
        )
        out = f.groupby(["doc_id", "term"], as_index=False).size()
        return out.rename(columns={"size": "tf"}).astype(
            {"doc_id": "int64", "tf": "int64"}
        )

    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        df = g.groupby("term")["doc_id"].size()  # bucket owns its terms fully
        return g.assign(df=g["term"].map(df).astype("int64"))

    scored = bucketed_group_agg(
        docs.map_batches(tf_rows, batch_format="pandas"), ["term"], attach_df,
        num_buckets=nb,
    )

    def topk(f: pd.DataFrame) -> pd.DataFrame:
        f = f.assign(score=(f["tf"] * n_docs) // f["df"])
        f = f.sort_values(["doc_id", "score", "term"],
                          ascending=[True, False, True], kind="stable")
        return f.groupby("doc_id", sort=False).head(DOC_KEYWORDS_K)

    def per_doc_final(g: pd.DataFrame) -> pd.DataFrame:
        t = topk(g)
        t = t.assign(rank=t.groupby("doc_id", sort=False).cumcount() + 1)
        return pd.DataFrame(
            {
                "doc_id": t["doc_id"].astype("int64").to_numpy(),
                "term": t["term"].to_numpy(),
                "tf": t["tf"].astype("int64").to_numpy(),
                "df": t["df"].astype("int64").to_numpy(),
                "score": t["score"].astype("int64").to_numpy(),
                "rank": t["rank"].astype("int64").to_numpy(),
            }
        )

    return bucketed_group_agg(
        scored, ["doc_id"], per_doc_final, partial_fn=topk, num_buckets=nb
    )


# ---------------------------------------------------------------------------
# Normalization-aware exact dedup (NFC + whitespace collapse before hashing)
# ---------------------------------------------------------------------------

NORMALIZED_DEDUP_SQL = """
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000, replace(text, ' ', '  ') FROM documents
  WHERE doc_id % 5 = 0
),
n AS (
  SELECT doc_id,
         trim(regexp_replace(nfc_normalize(text), '[ \t\n\r]+', ' ', 'g')) AS norm
  FROM aug
)
SELECT md5(norm) AS fp, MIN(doc_id) AS keeper,
       CAST(count(*) AS BIGINT) AS n_copies
FROM n GROUP BY md5(norm)
"""


def normalized_dedup(sf_dir: str) -> ray.data.Dataset:
    """Exact dedup AFTER canonical text normalization (Unicode NFC +
    whitespace-run collapse + strip — normalize_text's exact rule): the
    curation pass that catches re-serialized copies raw byte-hash dedup
    misses (same content, different whitespace). The corpus has no natural
    such pairs, so every 5th doc is mirrored with doubled spaces ON BOTH
    ENGINES (exact_dedup's augment trick) — the mirror lands in its
    original's group here, which raw exact_dedup provably does not do.
    Same scale shape as exact_dedup: per-batch (fp, min-keeper, count)
    combiners → one bucketed (fp) reduce; text never crosses the wire.
    Case folding is deliberately NOT applied: Python str casing uses full
    Unicode mappings (ß→SS, final sigma) where DuckDB's utf8proc uses
    simple ones — a silent cross-engine divergence this suite's
    integer/bit-exact contract forbids."""
    import unicodedata

    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    path = f"{sf_dir}/documents.parquet"
    nb = scaled_num_buckets(input_bytes_estimate(path))
    ws = _WS_RE

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].tolist()
        texts = b["text"].tolist()
        m = [(d, t) for d, t in zip(ids, texts) if d % 5 == 0]
        ids += [d + 2_000_000 for d, _ in m]
        texts += [t.replace(" ", "  ") for _, t in m]
        fps = [
            hashlib.md5(
                ws.sub(" ", unicodedata.normalize("NFC", t)).strip(" ").encode("utf-8")
            ).hexdigest()
            for t in texts
        ]
        f = pd.DataFrame({"fp": fps, "doc_id": pd.Series(ids, dtype="int64")})
        return f.groupby("fp", as_index=False).agg(
            keeper=("doc_id", "min"), pn=("doc_id", "size")
        ).astype({"keeper": "int64", "pn": "int64"})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("fp", as_index=False).agg(
            keeper=("keeper", "min"), n_copies=("pn", "sum")
        )
        return out.astype({"keeper": "int64", "n_copies": "int64"})

    return bucketed_group_agg(
        ray.data.read_parquet(path, columns=["doc_id", "text"]).map_batches(
            partial, batch_format="pandas"
        ),
        ["fp"], per_bucket, num_buckets=nb,
    )


# ---------------------------------------------------------------------------
# Inverted index build (token → posting list)
# ---------------------------------------------------------------------------

INVERTED_MIN_DF = 5  # tokens in fewer docs don't earn a posting list
INVERTED_TOP_POSTINGS = 20  # postings kept per token (lowest doc_ids)

INVERTED_INDEX_SQL = f"""
WITH w AS (
  SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS token
  FROM documents
)
SELECT token,
       CAST(count(*) AS BIGINT) AS df,
       array_to_string(
         list_slice(list_sort(list(doc_id)), 1, {INVERTED_TOP_POSTINGS}), ','
       ) AS postings
FROM w GROUP BY token HAVING count(*) >= {INVERTED_MIN_DF}
"""


def inverted_index(
    sf_dir: str,
    *,
    min_df: int = INVERTED_MIN_DF,
    top_postings: int = INVERTED_TOP_POSTINGS,
) -> ray.data.Dataset:
    """Search-index construction: for every token appearing in ≥ min_df
    documents, the document frequency and the posting list truncated to
    the ``top_postings`` lowest doc_ids (comma-joined — the on-disk
    posting-head layout; full lists would make the output row size
    unbounded for stopword-like tokens).

    Scale shape: each batch emits DISTINCT (token, doc_id) pairs (one
    hash-based drop_duplicates, C speed — a doc lives in exactly one input
    row so cross-batch pairs are already unique and df = plain count); the
    byte-scaled bucketed reduce sees complete token groups per bucket and
    resolves df + the truncated posting head with one sort + groupby.head
    — driver never holds the index; output is one bounded row per
    surviving token."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    path = f"{sf_dir}/documents.parquet"
    nb = scaled_num_buckets(input_bytes_estimate(path))

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.split(" ")
        lens = toks.str.len().to_numpy()
        flat = np.concatenate(toks.to_numpy())
        ids = np.repeat(b["doc_id"].to_numpy().astype("int64"), lens)
        return pd.DataFrame({"token": flat, "doc_id": ids}).drop_duplicates()

    rows = ray.data.read_parquet(
        path, columns=["doc_id", "text"]
    ).map_batches(pairs, batch_format="pandas")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        df_per = g.groupby("token")["doc_id"].size()
        keep = df_per[df_per >= min_df]
        if keep.empty:
            return pd.DataFrame(
                {"token": pd.Series(dtype="object"),
                 "df": pd.Series(dtype="int64"),
                 "postings": pd.Series(dtype="object")}
            )
        g = g.loc[g["token"].isin(keep.index)].sort_values(["token", "doc_id"])
        head = g.groupby("token").head(top_postings)
        postings = (
            head.assign(s=head["doc_id"].astype(str))
            .groupby("token")["s"]
            .agg(",".join)
        )
        return pd.DataFrame(
            {
                "token": keep.index,
                "df": keep.to_numpy().astype("int64"),
                "postings": postings.reindex(keep.index).to_numpy(),
            }
        )

    return bucketed_group_agg(rows, ["token"], per_bucket, num_buckets=nb)


# --- reciprocal-rank fusion of the two search rankings -------------------------------

RRF_K = 60  # the standard RRF damping constant (Cormack et al., SIGIR'09)
RRF_TOP_K = 10
RRF_SCALE = 1_000_000_000  # integer 1/(K+r) in parts-per-billion

RRF_SEARCH_SQL = f"""
WITH b AS ({BM25_SEARCH_SQL}),
kr AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
  FROM (
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '),
                                w -> w IN ('spark','hash','merge','sort')))
                AS BIGINT) AS score
    FROM documents
  ) WHERE score > 0
  QUALIFY row_number() OVER (ORDER BY score DESC, doc_id) <= {SEARCH_TOP_K}
),
u AS (
  SELECT doc_id, {RRF_SCALE} // ({RRF_K} + rank) AS c FROM b
  UNION ALL
  SELECT doc_id, {RRF_SCALE} // ({RRF_K} + rank) AS c FROM kr
),
s AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS rrf_ppb FROM u GROUP BY doc_id)
SELECT doc_id, rrf_ppb,
       CAST(row_number() OVER (ORDER BY rrf_ppb DESC, doc_id) AS BIGINT) AS rank
FROM s
QUALIFY row_number() OVER (ORDER BY rrf_ppb DESC, doc_id) <= {RRF_TOP_K}
"""


def rrf_search(sf_dir: str) -> "pd.DataFrame":
    """Reciprocal-rank fusion of the BM25 and keyword-count rankings —
    the standard training-data retrieval ensemble (RRF score =
    Σ 1/(K+rank) over the lists a doc appears in, K=60), in exact
    integer parts-per-billion so both engines hash identically.

    Scale shape: the fusion runs over the two TOP-K RESULT lists (≤ 20
    rows each — constants, not corpus-sized), so combining them on the
    driver is O(k); all corpus-scale work happens inside the two
    underlying search pipelines, each already a combiner → broadcast →
    per-batch-top-k stream. This is the composition pattern of
    curation_report: finished small aggregates fuse cheaply."""
    bm25 = bm25_search(sf_dir).to_pandas()  # (doc_id, rank), ≤ SEARCH_TOP_K rows
    kw = keyword_search(sf_dir).to_pandas()  # (doc_id, score), ≤ SEARCH_TOP_K rows
    kw = kw.sort_values(["score", "doc_id"], ascending=[False, True],
                        kind="mergesort").reset_index(drop=True)
    kw["rank"] = np.arange(1, len(kw) + 1, dtype="int64")
    both = pd.concat(
        [bm25[["doc_id", "rank"]], kw[["doc_id", "rank"]]], ignore_index=True
    )
    both["c"] = RRF_SCALE // (RRF_K + both["rank"].to_numpy())
    s = both.groupby("doc_id", as_index=False)["c"].sum()
    s = s.sort_values(["c", "doc_id"], ascending=[False, True],
                      kind="mergesort").head(RRF_TOP_K).reset_index(drop=True)
    return pd.DataFrame(
        {
            "doc_id": s["doc_id"].astype("int64"),
            "rrf_ppb": s["c"].astype("int64"),
            "rank": np.arange(1, len(s) + 1, dtype="int64"),
        }
    )


# --- data-quality profiler: per-column stats over the orders table -------------------

TABLE_PROFILE_SQL = """
SELECT 'o_orderstatus' AS col,
       CAST(count(o_orderstatus) AS BIGINT) AS n,
       CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct,
       CAST(min(o_orderstatus) AS VARCHAR) AS min_v,
       CAST(max(o_orderstatus) AS VARCHAR) AS max_v
FROM orders
UNION ALL
SELECT 'o_orderpriority', CAST(count(o_orderpriority) AS BIGINT),
       CAST(count(DISTINCT o_orderpriority) AS BIGINT),
       CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_custkey', CAST(count(o_custkey) AS BIGINT),
       CAST(count(DISTINCT o_custkey) AS BIGINT),
       CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
FROM orders
"""

_PROFILE_COLS = ("o_orderstatus", "o_orderpriority", "o_custkey")


def table_profile(sf_dir: str) -> ray.data.Dataset:
    """Schema profiler over the orders table: per column, the non-null
    count, EXACT distinct count, and lexicographic min/max (values
    canonicalized to strings — int columns via str(int), which matches
    DuckDB's VARCHAR cast) — the Deequ/great-expectations-style data
    quality sweep a lakehouse runs before trusting a new drop.

    Two streams over one pruned read: (1) n/min/max are mergeable — one
    partial row per (batch, column), folded in a single tiny task;
    (2) exact distinct is the only shuffle: per-batch (col, value)
    dedupe, bucketed on the pair so a reduce task holds complete value
    groups (never one column's whole domain — the weekly_active_users
    pair-keyed lesson), emitting per-column partial distinct counts.
    Costs one corpus-sized pair shuffle regardless of column count;
    columns ride together rather than one pass per column."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    path = f"{sf_dir}/orders.parquet"
    ds = ray.data.read_parquet(path, columns=list(_PROFILE_COLS))

    def canon(b: pd.DataFrame) -> pd.DataFrame:
        # int columns → zero-padded 20-digit strings so LEXICOGRAPHIC
        # min/max equals numeric min/max through the string-only fold
        # (requires non-negative ints — true of every key column here);
        # merge() strips the padding back to str(int), DuckDB's VARCHAR
        # cast of the numeric aggregate.
        out = {}
        for c in _PROFILE_COLS:
            s = b[c]
            out[c] = (
                s.astype("int64").map("{:020d}".format)
                if s.dtype.kind in "iu" else s
            )
        return pd.DataFrame(out)

    def stats_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = canon(b)
        rows = [
            {"col": c, "n": np.int64(b[c].notna().sum()),
             "min_v": b[c].min(), "max_v": b[c].max()}
            for c in _PROFILE_COLS
        ]
        return pd.DataFrame(rows)

    stats = (
        ds.map_batches(stats_partial, batch_format="pandas")
        .repartition(1)
        .map_batches(
            lambda b: b.groupby("col", as_index=False).agg(
                n=("n", "sum"), min_v=("min_v", "min"), max_v=("max_v", "max")
            ),
            batch_format="pandas",
        )
    )

    def value_rows(b: pd.DataFrame) -> pd.DataFrame:
        b = canon(b)
        frames = [
            pd.DataFrame({"col": c, "v": b[c].drop_duplicates()})
            for c in _PROFILE_COLS
        ]
        return pd.concat(frames, ignore_index=True)

    def distinct_partial(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["col", "v"]).groupby("col", as_index=False).size()
        # pad to the stats-stream schema so the union is schema-stable
        # (mismatched block schemas concat leniently today but warn)
        return pd.DataFrame(
            {
                "col": d["col"],
                "n": np.int64(0),
                "min_v": "",
                "max_v": "",
                "nd": d["size"].astype("int64"),
                "_t": np.int64(1),
            }
        )

    nb = scaled_num_buckets(input_bytes_estimate(path))
    distinct = bucketed_group_agg(
        ds.map_batches(value_rows, batch_format="pandas"),
        ["col", "v"], distinct_partial, num_buckets=nb,
    )

    tagged = stats.map_batches(
        lambda b: b.assign(nd=np.int64(0), _t=np.int64(0)), batch_format="pandas"
    ).union(distinct)

    def unpad(v: str) -> str:
        if len(v) == 20 and v.isdigit():
            return str(int(v))
        return v

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        s = b.loc[b["_t"] == 0]
        nd = b.loc[b["_t"] == 1].groupby("col")["nd"].sum()
        return pd.DataFrame(
            {
                "col": s["col"],
                "n": s["n"].astype("int64"),
                "n_distinct": s["col"].map(nd).astype("int64"),
                "min_v": s["min_v"].map(unpad),
                "max_v": s["max_v"].map(unpad),
            }
        )

    return tagged.repartition(1).map_batches(merge, batch_format="pandas")


# --- token-budget selection (quality-ordered greedy under a token cap) -------------
#
# The "give me the best documents up to N training tokens" curation step:
# rank documents by an integer quality score (type-token ratio in ppm —
# repetitive boilerplate scores low), then keep documents in (score DESC,
# doc_id ASC) order while the running token total stays within the budget
# (¼ of corpus tokens). The oracle needs a GLOBAL window cumsum over the
# score order; the engine finds the same cut with no global sort, using the
# sum-weighted iterative value-domain refinement (shuffle.
# descending_value_cut): successive (count, token-sum) profiles over ever-
# narrower score intervals pin the exact crossing score with O(256) driver
# state per level, a second ascending cut over doc_id resolves the tie set
# at that score — NOTHING corpus-sized ever reaches the driver, even when
# every score lands in one magnitude band (which real TTR scores do).

TOKEN_BUDGET_NUM, TOKEN_BUDGET_DEN = 1, 4  # budget = floor(total_tokens / 4)

TOKEN_BUDGET_SELECT_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
d AS (
  SELECT doc_id,
         CAST(len(w) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(w)) * 1000000 // len(w) AS BIGINT) AS score_ppm
  FROM t
),
b AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot FROM d),
r AS (
  SELECT doc_id, n_tokens, score_ppm,
         SUM(n_tokens) OVER (ORDER BY score_ppm DESC, doc_id) AS cum
  FROM d
)
SELECT doc_id, n_tokens, score_ppm
FROM r WHERE cum * {TOKEN_BUDGET_DEN} <= (SELECT tot FROM b) * {TOKEN_BUDGET_NUM}
"""


def token_budget_select(sf_dir: str) -> ray.data.Dataset:
    """Quality-ordered greedy selection under a global token budget — see
    the block comment above for the contract and the cut machinery.

    Scale shape: one stateless scoring pass (vectorized explode +
    per-doc nunique — a doc is one row, so its token multiset never
    splits); then two descending_value_cut refinements (score DESC, then
    doc_id ASC inside the score ties), each a handful of vectorized
    profile scans with O(256) driver state — no gather, no broadcast id
    set, no corpus-scale sort or shuffle."""

    docs = _docs(sf_dir)

    def score_batch(b: pd.DataFrame) -> pd.DataFrame:
        ex = b.set_index("doc_id")["text"].str.split(" ").explode()
        ntoks = ex.groupby(level=0).size()
        ndist = ex.groupby(level=0).nunique()
        return pd.DataFrame(
            {
                "doc_id": ntoks.index.astype("int64"),
                "n_tokens": ntoks.to_numpy().astype("int64"),
                "score_ppm": (
                    ndist.to_numpy().astype("int64") * 1_000_000
                    // ntoks.to_numpy().astype("int64")
                ),
            }
        )

    scored = docs.map_batches(score_batch, batch_format="pandas").materialize()
    total = int(scored.sum("n_tokens"))
    budget = total * TOKEN_BUDGET_NUM // TOKEN_BUDGET_DEN

    # Locate the exact greedy cut with NO driver gather (the previous
    # crossing-BAND gather is O(n) when scores concentrate in one octave —
    # real corpora put most TTR scores in [2^18, 2^20); see
    # descending_value_cut's doc). Two refinement cuts, each O(256/level)
    # driver state:
    #   1. over score_ppm DESC, weighted by n_tokens → the crossing score
    #      v* plus exact pre-totals of every higher score;
    #   2. over doc_id ASC within the score == v* ties → the single
    #      crossing doc (cum is strictly increasing: n_tokens >= 1), so
    #      the tie set never gathers either.
    from .shuffle import descending_value_cut

    cut = descending_value_cut(
        scored, "score_ppm", lambda c: c > budget, weight_col="n_tokens",
        # TTR ppm is bounded by construction and total is already in hand —
        # skip the extremes pass (one fewer Dataset execution)
        domain=(0, 1_000_000), total_weight=total,
    )
    if cut is None:  # budget covers the whole corpus
        return scored
    v_star, _, pre_sum, _, _ = cut
    remaining = budget - pre_sum  # >= 0: crossed(pre_sum) was False

    ties = scored.map_batches(
        lambda b: b.loc[b["score_ppm"] == v_star], batch_format="pandas"
    )
    # the tie weight crosses `remaining` by construction, so cut2 exists;
    # d_star itself does NOT fit (crossed means cum > remaining)
    d_star = descending_value_cut(
        ties, "doc_id", lambda c: c > remaining,
        weight_col="n_tokens", ascending=True,
    )[0]

    def final_filter(b: pd.DataFrame) -> pd.DataFrame:
        keep = (b["score_ppm"] > v_star) | (
            (b["score_ppm"] == v_star) & (b["doc_id"] < d_star)
        )
        return b.loc[keep]

    return scored.map_batches(final_filter, batch_format="pandas")


# --- temperature-scaled language sampling (mT5 / XLM-R mixing) --------------
#
# Multilingual corpora are head-heavy: sampling documents uniformly starves
# low-resource languages. The standard fix (mT5, XLM-R) samples language l
# with probability proportional to n_l^alpha for alpha < 1. This op applies
# alpha = 1/2 with a deterministic, coordination-free keep rule: the per-lang
# keep threshold is derived ONCE from the per-lang counts (w_l = isqrt(n_l),
# target kept mass T = N // 2, thr_l = 2^32 * T * w_l / (n_l * sum_w), all
# integer arithmetic) and a document keeps iff its salted md5 hash falls
# under its language's threshold — reproducible across runs, engines and
# shard layouts, no RNG, no shuffle. Unlike weighted_mix (fixed external
# rates) the rates here are DATA-DERIVED corpus statistics at temperature.

TEMP_MIX_SALT = ":temp"
# target kept mass = floor(total_docs / 2), re-allocated across langs at
# temperature alpha = 1/2 (literal 2s below mirror these constants)

TEMPERATURE_MIX_SQL = """
WITH c AS (
  SELECT lang, CAST(COUNT(*) AS HUGEINT) AS n FROM documents GROUP BY lang
),
w AS (
  SELECT lang, n, CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS HUGEINT) AS w FROM c
),
s AS (SELECT SUM(w) AS sw, SUM(n) AS tot FROM w),
thr AS (
  SELECT lang,
         CAST(LEAST(CAST(4294967296 AS HUGEINT),
                    (CAST(4294967296 AS HUGEINT) * (tot // 2) * w) // (n * sw))
              AS BIGINT) AS thr
  FROM w, s
)
SELECT d.doc_id, d.lang
FROM documents d JOIN thr USING (lang)
WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':temp'), 1, 8))
           AS BIGINT) < thr.thr
"""


def temperature_mix(sf_dir: str) -> ray.data.Dataset:
    """Temperature-scaled language sampling (see block comment). Scale
    shape: one combiner-style counting pass whose reduce domain is the
    LANGUAGE SET (bounded ~10^2 even at 100 TB — safe driver state by
    construction, unlike value domains); the thresholds broadcast via
    one ray.put; the keep pass is stateless and never shuffles."""
    import math

    docs = _docs(sf_dir, columns=("doc_id", "lang"))

    def cpart(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("lang", as_index=False).size()
        return pd.DataFrame({"lang": g["lang"], "n": g["size"].astype("int64")})

    counts = (
        docs.map_batches(cpart, batch_format="pandas")
        .repartition(1)
        .map_batches(
            lambda b: b.groupby("lang", as_index=False).agg(n=("n", "sum")),
            batch_format="pandas",
        )
        .to_pandas()
    )
    n = dict(zip(counts["lang"], counts["n"].astype(int)))
    tot = sum(n.values())
    w = {l: math.isqrt(c) for l, c in n.items()}
    sw = sum(w.values())
    target = tot // 2
    thr_ref = ray.put(
        {
            l: min(1 << 32, ((1 << 32) * target * w[l]) // (n[l] * sw))
            for l in n
        }
    )

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        thr = ray.get(thr_ref)
        hv = b["doc_id"].map(
            lambda d: int(
                hashlib.md5((str(d) + TEMP_MIX_SALT).encode()).hexdigest()[:8], 16
            )
        ).to_numpy()
        lim = b["lang"].map(thr).to_numpy()
        return b.loc[hv < lim, ["doc_id", "lang"]]

    return docs.map_batches(keep, batch_format="pandas")


# --- out-of-vocabulary rate (tokenizer / vocab coverage audit) ---------------
#
# Per-document fraction of tokens absent from the min_count-bounded corpus
# vocabulary — the coverage metric a tokenizer-prep pipeline publishes to
# decide min_count / vocab size. Same size-gated vocab attach contract as
# tokenize_ids: broadcast the sorted vocab while it fits, degrade to the
# tag-union token-bucket shuffle past the gate; the fallback's per-bucket
# output is (doc_id, token-count, oov-count) PARTIALS, reduced in a second
# thin bucketed pass — token rows never concentrate per doc.

OOV_RATE_SQL = f"""
WITH t AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents
),
c AS (
  SELECT token FROM t GROUP BY token HAVING count(*) >= {VOCAB_MIN_COUNT}
),
j AS (
  SELECT t.doc_id, CASE WHEN c.token IS NULL THEN 1 ELSE 0 END AS oov
  FROM t LEFT JOIN c ON t.token = c.token
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(SUM(oov) AS BIGINT) AS n_oov,
       CAST(SUM(oov) * 1000000 // count(*) AS BIGINT) AS oov_ppm
FROM j GROUP BY doc_id
"""


def oov_rate(
    sf_dir: str, *, broadcast_max_vocab: int = 2_000_000
) -> ray.data.Dataset:
    """Per-doc OOV rate vs the vocab_build vocabulary (see block comment)."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    vocab_ds = vocab_build(sf_dir).materialize()  # min_count-bounded by design
    n_vocab = vocab_ds.count()

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "n_tokens": b["n_tokens"].astype("int64"),
                "n_oov": b["n_oov"].astype("int64"),
                "oov_ppm": (
                    b["n_oov"].astype("int64") * 1_000_000
                    // b["n_tokens"].astype("int64")
                ),
            }
        )

    if n_vocab <= broadcast_max_vocab:
        vocab = vocab_ds.to_pandas()
        keys = np.sort(vocab["token"].to_numpy(dtype=str))
        ref = ray.put(keys)

        def f(batch: pd.DataFrame) -> pd.DataFrame:
            ks = ray.get(ref)
            ex = batch.set_index("doc_id")["text"].str.split(" ").explode()
            flat = ex.to_numpy(dtype=str)
            idx = np.clip(np.searchsorted(ks, flat), 0, len(ks) - 1)
            oov = pd.Series((ks[idx] != flat).astype("int64"), index=ex.index)
            g = oov.groupby(level=0).agg(["size", "sum"])
            return finalize(
                pd.DataFrame(
                    {
                        "doc_id": g.index.astype("int64"),
                        "n_tokens": g["size"].to_numpy(),
                        "n_oov": g["sum"].to_numpy(),
                    }
                )
            )

        return ds.map_batches(f, batch_format="pandas")

    # tag-union fallback: token rows (_vid == -1) and vocab rows (_vid == 1)
    # share a token bucket; the per-bucket reduce emits per-doc PARTIALS
    def tag_tokens(b: pd.DataFrame) -> pd.DataFrame:
        ex = b.set_index("doc_id")["text"].str.split(" ").explode()
        return pd.DataFrame(
            {
                "token": ex.to_numpy(dtype=str),
                "doc_id": ex.index.to_numpy().astype("int64"),
                "_vid": np.int64(-1),
            }
        )

    def tag_vocab(v: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "token": v["token"].astype(str),
                "doc_id": np.int64(-1),
                "_vid": np.int64(1),
            }
        )

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        known = set(g.loc[g["_vid"] > 0, "token"])
        rows = g.loc[g["_vid"] < 0]
        oov = (~rows["token"].isin(known)).astype("int64")
        part = pd.DataFrame({"doc_id": rows["doc_id"], "oov": oov}).groupby(
            "doc_id", as_index=False
        ).agg(n_tokens=("oov", "size"), n_oov=("oov", "sum"))
        return part.astype({"doc_id": "int64", "n_tokens": "int64", "n_oov": "int64"})

    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/documents.parquet"))
    partials = bucketed_group_agg(
        ds.map_batches(tag_tokens, batch_format="pandas").union(
            vocab_ds.map_batches(tag_vocab, batch_format="pandas")
        ),
        ["token"], attach, num_buckets=nb,
    )

    def reduce_doc(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("doc_id", as_index=False).agg(
            n_tokens=("n_tokens", "sum"), n_oov=("n_oov", "sum")
        )
        return finalize(s)

    return bucketed_group_agg(partials, ["doc_id"], reduce_doc, num_buckets=nb)


# --- vocabulary coverage curve (how big must the vocab be?) -------------------
#
# Cumulative token mass covered by the top-k vocabulary entries (ordered
# count DESC, token) at k in {100, 1000, 10000} — the Zipf report that
# sizes a tokenizer vocabulary. The full token count table is Heaps'-law
# unbounded, but the report only needs each bucket's LOCAL top-K (a token
# aggregates fully inside one hash bucket, so the global top-K under the
# (cnt DESC, token) total order is contained in the union of per-bucket
# top-Ks) plus one tagged per-bucket mass subtotal; the single final task
# sees O(num_buckets * K) candidate rows, never the vocabulary.

COVERAGE_KS = (100, 1000, 10000)

VOCAB_COVERAGE_SQL = """
WITH t AS (
  SELECT UNNEST(string_split(text, ' ')) AS token FROM documents
),
c AS (SELECT token, count(*) AS cnt FROM t GROUP BY token),
r AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token) AS rk FROM c
),
tot AS (SELECT SUM(cnt) AS total FROM c)
SELECT CAST(k AS BIGINT) AS k,
       CAST((SELECT SUM(cnt) FROM r WHERE rk <= k) AS BIGINT) AS covered,
       CAST(total AS BIGINT) AS total_tokens,
       CAST((SELECT SUM(cnt) FROM r WHERE rk <= k) * 1000000 // total AS BIGINT)
         AS coverage_ppm
FROM (VALUES (100), (1000), (10000)) AS ks(k), tot
"""


def vocab_coverage_curve(sf_dir: str) -> ray.data.Dataset:
    """Token-mass coverage of the top-k vocabulary (see block comment)."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    kmax = max(COVERAGE_KS)
    path = f"{sf_dir}/documents.parquet"
    ds = ray.data.read_parquet(path, columns=["text"])

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.split(" ")
        flat = pd.Series(np.concatenate(toks.to_numpy()), name="token")
        c = flat.groupby(flat, sort=False).size()
        return pd.DataFrame({"token": c.index, "n": c.to_numpy().astype("int64")})

    def bucket_top(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("token", as_index=False).agg(cnt=("n", "sum"))
        top = s.sort_values(["cnt", "token"], ascending=[False, True]).head(kmax)
        mass = pd.DataFrame(
            {"token": [""], "cnt": [s["cnt"].sum()], "_mass": np.int64(1)}
        )
        return pd.concat(
            [top.assign(_mass=np.int64(0)), mass], ignore_index=True
        ).astype({"cnt": "int64", "_mass": "int64"})

    nb = scaled_num_buckets(input_bytes_estimate(path))
    cand = bucketed_group_agg(
        ds.map_batches(count_partial, batch_format="pandas"),
        ["token"], bucket_top, num_buckets=nb,
    )

    def report(b: pd.DataFrame) -> pd.DataFrame:
        total = int(b.loc[b["_mass"] == 1, "cnt"].sum())
        top = b.loc[b["_mass"] == 0].sort_values(
            ["cnt", "token"], ascending=[False, True], kind="mergesort"
        )
        cum = top["cnt"].to_numpy().cumsum()
        rows = []
        for k in COVERAGE_KS:
            covered = int(cum[min(k, len(cum)) - 1]) if len(cum) else 0
            rows.append(
                {
                    "k": np.int64(k),
                    "covered": np.int64(covered),
                    "total_tokens": np.int64(total),
                    "coverage_ppm": np.int64(covered * 1_000_000 // total),
                }
            )
        return pd.DataFrame(rows)

    return cand.repartition(1).map_batches(report, batch_format="pandas")


# ---------------------------------------------------------------------------
# Training-sequence packing (concat-then-chunk) + deterministic epoch shuffle
# — the two placement steps between a curated corpus and a pretraining run:
# WHERE each document's tokens land in the fixed-length sequence stream, and
# in WHAT order documents are visited for a given epoch seed. Both are exact
# global-order computations done WITHOUT an all-to-all sort, reusing the
# range-bucket + driver-prefix-sum machinery of customer_value_deciles /
# global_rank (offsets per bucket on the driver, exact positions assigned
# inside complete buckets).

PACK_SEQ_LEN = 512  # tokens per packed training sequence

PACK_SEQUENCES_SQL = f"""
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
o AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS tok_offset
  FROM t
)
SELECT doc_id, n_tokens, tok_offset,
       tok_offset // {PACK_SEQ_LEN} AS seq_first,
       (tok_offset + n_tokens - 1) // {PACK_SEQ_LEN} AS seq_last
FROM o
"""


def pack_sequences(sf_dir: str) -> ray.data.Dataset:
    """GPT-style sequence packing (concat in doc_id order, chunk at
    PACK_SEQ_LEN): per document, its exact global token offset and the
    first/last packed-sequence index it lands in — the placement map a
    tokenizing writer needs to emit fixed-length training sequences
    shard-parallel (each worker knows exactly which sequences its docs
    contribute to, with no coordination).

    Scale shape: the text is read ONCE to a thin (doc_id, n_tokens) int
    table; docs range-bucket by doc_id (order-preserving: every id in
    bucket b precedes every id in b+1), per-bucket token sums make an
    O(num_buckets) driver prefix sum, and exact offsets are assigned by a
    cumsum inside complete buckets. No global sort, no all-to-all; the
    shuffle carries two int64s per document."""
    from .shuffle import (
        bucketed_group_agg,
        input_bytes_estimate,
        scaled_num_buckets,
    )

    path = f"{sf_dir}/documents.parquet"
    docs = ray.data.read_parquet(path, columns=["doc_id", "text"])

    def count_tokens(b: pd.DataFrame) -> pd.DataFrame:
        n = b["text"].str.split(" ").str.len().astype("int64")
        return pd.DataFrame({"doc_id": b["doc_id"].astype("int64"), "n_tokens": n})

    counts = docs.map_batches(count_tokens, batch_format="pandas").materialize()

    # doc_id domain (one thin pass) -> order-preserving range buckets
    def extremes(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"lo": [], "hi": []})
        d = b["doc_id"].to_numpy()
        return pd.DataFrame({"lo": [int(d.min())], "hi": [int(d.max())]})

    ext = counts.map_batches(extremes, batch_format="pandas").to_pandas()
    lo, hi = int(ext["lo"].min()), int(ext["hi"].max())
    span = hi - lo + 1
    nb = min(scaled_num_buckets(counts.size_bytes(), lo=64), span)

    def add_rb(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].to_numpy(dtype="int64")
        return b.assign(rb=((d - lo) * nb // span).astype("int64"))

    bucketed = counts.map_batches(add_rb, batch_format="pandas").materialize()

    # per-bucket token sums -> O(nb) exclusive prefix on the driver
    def sum_partial(b: pd.DataFrame) -> pd.DataFrame:
        s = b.groupby("rb", as_index=False)["n_tokens"].sum()
        return s.astype({"rb": "int64", "n_tokens": "int64"})

    from .shuffle import histogram_merge

    sums = histogram_merge(
        bucketed.map_batches(sum_partial, batch_format="pandas"), "rb", "n_tokens"
    ).to_pandas()
    full = np.zeros(nb, dtype="int64")
    full[sums["rb"].to_numpy()] = sums["n_tokens"].to_numpy()
    offsets = np.concatenate([[0], np.cumsum(full)[:-1]]).astype("int64")
    off_ref = ray.put(offsets)
    pack_sequences.last_driver_state = {"n_offsets": int(len(offsets))}

    # exact per-doc offsets inside complete contiguous buckets (a reduce
    # call may see SEVERAL rb groups — whole groups, per the bucket hash —
    # so the cumsum is per-rb, not per-frame)
    def assign(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(off_ref)
        g = g.sort_values(["rb", "doc_id"])
        n = g["n_tokens"].to_numpy(dtype="int64")
        local = g.groupby("rb", sort=False)["n_tokens"].cumsum().to_numpy() - n
        off = offs[g["rb"].to_numpy(dtype="int64")] + local
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(dtype="int64"),
                "n_tokens": n,
                "tok_offset": off,
                "seq_first": off // PACK_SEQ_LEN,
                "seq_last": (off + n - 1) // PACK_SEQ_LEN,
            }
        )

    return bucketed_group_agg(bucketed, ["rb"], assign, num_buckets=min(nb, 512))


EPOCH_SEED = 42

EPOCH_SHUFFLE_SQL = f"""
SELECT doc_id,
       CAST(row_number() OVER (
         ORDER BY md5_number_upper(CAST(doc_id AS VARCHAR) || ':{EPOCH_SEED}'),
                  doc_id
       ) AS BIGINT) AS pos
FROM documents
"""


def epoch_shuffle(sf_dir: str) -> ray.data.Dataset:
    """Deterministic global shuffle order for training epoch
    ``EPOCH_SEED``: every document's exact position under ORDER BY
    md5(doc_id:seed) — reproducible across runs, cluster shapes and
    engines, unlike ``Dataset.random_shuffle`` (whose placement depends on
    block layout). Changing the seed reshuffles the whole corpus.

    Scale shape: the ranking key is a 64-bit hash, UNIFORM by
    construction, so its top bits are a perfect range partitioner — no
    boundary sampling, no all-to-all sort. Per-bucket counts make an
    O(num_buckets) driver prefix sum; exact positions come from a local
    sort inside complete hash-range buckets (collision ties broken by
    doc_id, mirrored in the SQL twin). The shuffle carries (doc_id, hash)
    int64 pairs only."""
    from .dedup import _md5_64
    from .shuffle import bucketed_group_agg, histogram_merge, scaled_num_buckets

    path = f"{sf_dir}/documents.parquet"
    docs = ray.data.read_parquet(path, columns=["doc_id"])

    want = scaled_num_buckets(docs.size_bytes(), lo=64)
    bbits = max(6, int(want - 1).bit_length())  # power-of-two bucket count
    nb = 1 << bbits

    def hash_rows(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(dtype="int64")
        h = np.fromiter(
            (_md5_64(f"{d}:{EPOCH_SEED}") for d in ids),
            dtype=np.uint64,
            count=len(ids),
        )
        return pd.DataFrame(
            {"doc_id": ids, "h": h, "rb": (h >> np.uint64(64 - bbits)).astype("int64")}
        )

    hashed = docs.map_batches(hash_rows, batch_format="pandas").materialize()

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        s = b["rb"].value_counts()
        return pd.DataFrame(
            {"rb": s.index.astype("int64"), "c": s.to_numpy().astype("int64")}
        )

    merged = histogram_merge(
        hashed.map_batches(count_partial, batch_format="pandas"), "rb", "c"
    ).to_pandas()
    full = np.zeros(nb, dtype="int64")
    full[merged["rb"].to_numpy()] = merged["c"].to_numpy()
    offsets = np.concatenate([[0], np.cumsum(full)[:-1]]).astype("int64")
    off_ref = ray.put(offsets)
    epoch_shuffle.last_driver_state = {"n_offsets": int(len(offsets))}

    # one reduce call may see several complete rb groups -> per-rb cumcount
    def assign(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(off_ref)
        g = g.sort_values(["rb", "h", "doc_id"])
        local = g.groupby("rb", sort=False).cumcount().to_numpy() + 1
        pos = offs[g["rb"].to_numpy(dtype="int64")] + local
        return pd.DataFrame(
            {"doc_id": g["doc_id"].to_numpy(dtype="int64"), "pos": pos.astype("int64")}
        )

    return bucketed_group_agg(hashed, ["rb"], assign, num_buckets=min(nb, 512))


# ---------------------------------------------------------------------------
# UniMax epoch-capped language allocation (Chung et al. 2023): spread a
# token budget UNIFORMLY across languages, but never take more than
# MAX_EPOCHS passes over any language's data — the successor to
# temperature sampling for multilingual pretraining mixes. The waterfill
# visits languages in ascending-capacity order; each takes
# min(cap, remaining // remaining_langs), so small languages cap out and
# their unused share flows to the large ones. All-integer arithmetic
# (floor division at every step) so the sequential recurrence is
# bit-identical across engines — mirrored as a recursive CTE in SQL.

UNIMAX_EPOCHS = 4  # per-language repeat cap

UNIMAX_MIX_SQL = f"""
WITH RECURSIVE t AS (
  SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tok
  FROM documents GROUP BY lang
),
tot AS (
  SELECT CAST(SUM(n_tok) // 2 AS BIGINT) AS budget, COUNT(*) AS nl FROM t
),
s AS (
  SELECT lang, n_tok, CAST({UNIMAX_EPOCHS} * n_tok AS BIGINT) AS cap,
         CAST(row_number() OVER (ORDER BY {UNIMAX_EPOCHS} * n_tok, lang)
              AS BIGINT) AS rn
  FROM t
),
alloc AS (
  SELECT s.rn, s.lang, s.n_tok, s.cap,
         LEAST(s.cap, tot.budget // tot.nl) AS alloc,
         tot.budget - LEAST(s.cap, tot.budget // tot.nl) AS remaining,
         tot.nl - 1 AS rem_cnt
  FROM s, tot WHERE s.rn = 1
  UNION ALL
  SELECT s.rn, s.lang, s.n_tok, s.cap,
         LEAST(s.cap, a.remaining // a.rem_cnt),
         a.remaining - LEAST(s.cap, a.remaining // a.rem_cnt),
         a.rem_cnt - 1
  FROM s JOIN alloc a ON s.rn = a.rn + 1
)
SELECT lang, n_tok, cap, CAST(alloc AS BIGINT) AS alloc,
       CAST(1000000 * alloc // n_tok AS BIGINT) AS epochs_ppm
FROM alloc
"""


def unimax_mix(sf_dir: str) -> pd.DataFrame:
    """Per-language UniMax allocation: token count, epoch cap
    (UNIMAX_EPOCHS × count), allocated budget tokens, and the realized
    repeat rate in ppm-epochs. Budget = half the corpus tokens.

    Scale shape: one combiner-style token-count pass whose reduce domain
    is the LANGUAGE SET (bounded ~10^2 even at 100 TB — structurally safe
    driver state, same contract as temperature_mix); the waterfill itself
    is an O(L log L) driver loop in exact Python ints. No shuffle at all
    — the per-batch partials collapse through histogram-merge semantics
    on a domain the data can't grow."""
    docs = _docs(sf_dir, columns=("doc_id", "lang", "text"))

    def cpart(b: pd.DataFrame) -> pd.DataFrame:
        n = b["text"].str.split(" ").str.len().astype("int64")
        g = pd.DataFrame({"lang": b["lang"], "n": n}).groupby(
            "lang", as_index=False
        )["n"].sum()
        return g

    counts = (
        docs.map_batches(cpart, batch_format="pandas")
        .repartition(1)
        .map_batches(
            lambda b: b.groupby("lang", as_index=False).agg(n=("n", "sum")),
            batch_format="pandas",
        )
        .to_pandas()
    )
    n_tok = {l: int(c) for l, c in zip(counts["lang"], counts["n"])}
    budget = sum(n_tok.values()) // 2
    order = sorted(n_tok, key=lambda l: (UNIMAX_EPOCHS * n_tok[l], l))

    rows = []
    remaining, rem_cnt = budget, len(order)
    for lang in order:
        cap = UNIMAX_EPOCHS * n_tok[lang]
        alloc = min(cap, remaining // rem_cnt)
        remaining -= alloc
        rem_cnt -= 1
        rows.append(
            {
                "lang": lang,
                "n_tok": np.int64(n_tok[lang]),
                "cap": np.int64(cap),
                "alloc": np.int64(alloc),
                "epochs_ppm": np.int64(1_000_000 * alloc // n_tok[lang]),
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# First-occurrence n-gram novelty: for each document, how many of its
# DISTINCT word 5-grams appear for the FIRST time in the corpus there
# (global first occurrence = minimum doc_id over all docs containing the
# n-gram). Low novelty marks template/derivative text; the per-position
# variant of the signal is dup_ngram_coverage above — this is its
# set-semantics, attribution-ordered sibling (who introduced the text,
# not just who shares it).

NGRAM_NOVELTY_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
ng AS (
  SELECT DISTINCT doc_id, array_to_string(words[i+1 : i+5], ' ') AS ngram
  FROM w, LATERAL (SELECT UNNEST(generate_series(0, len(words) - 5)) AS i)
  WHERE len(words) >= 5
),
fo AS (SELECT ngram, MIN(doc_id) AS first_doc FROM ng GROUP BY ngram)
SELECT ng.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(SUM(CASE WHEN fo.first_doc = ng.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       CAST(1000000 * SUM(CASE WHEN fo.first_doc = ng.doc_id THEN 1 ELSE 0 END)
            // COUNT(*) AS BIGINT) AS novelty_ppm
FROM ng JOIN fo USING (ngram)
GROUP BY ng.doc_id
"""


def ngram_novelty(sf_dir: str) -> ray.data.Dataset:
    """Per-doc novelty report: distinct 5-grams, how many are globally
    first-introduced here, and the novelty ratio in ppm.

    Scale shape (same skeleton as dup_ngram_coverage): the text never
    leaves the first map stage — it collapses to distinct (64-bit hash,
    doc_id) pairs per doc. One bucketed reduce on the hash computes the
    per-n-gram min doc_id and flags each (h, doc) row in place; a second
    thin bucketed reduce sums flags per doc. Both shuffles carry two
    int64s per distinct n-gram occurrence; collision budget identical to
    the n-gram Jaccard family (documented there)."""
    from .dedup import _md5_64_memo
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    def ngram_rows(batch: pa.Table) -> pa.Table:
        ids_out: list[np.ndarray] = []
        hs_out: list[np.ndarray] = []
        for i, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            words = t.split(" ")
            if len(words) < NGRAM_N:
                continue
            h = np.fromiter(
                (
                    _md5_64_memo(" ".join(words[j : j + NGRAM_N]))
                    for j in range(len(words) - NGRAM_N + 1)
                ),
                dtype=np.uint64,
                count=len(words) - NGRAM_N + 1,
            )
            uh = np.unique(h)
            ids_out.append(np.full(len(uh), i, dtype=np.int64))
            hs_out.append(uh.view(np.int64))
        if not ids_out:
            return pa.table(
                {"h": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "h": pa.array(np.concatenate(hs_out)),
                "doc_id": pa.array(np.concatenate(ids_out)),
            }
        )

    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/documents.parquet"))
    rows = _docs(sf_dir).map_batches(ngram_rows, batch_format="pyarrow")

    def flag_first(g: pd.DataFrame) -> pd.DataFrame:
        first = g.groupby("h")["doc_id"].transform("min")
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].astype("int64"),
                "novel": (g["doc_id"] == first).astype("int64"),
            }
        )

    flagged = bucketed_group_agg(rows, ["h"], flag_first, num_buckets=nb)

    def doc_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("doc_id", as_index=False).agg(
            n_distinct=("novel", "size"), n_novel=("novel", "sum")
        )

    def doc_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("doc_id", as_index=False).agg(
            n_distinct=("n_distinct", "sum"), n_novel=("n_novel", "sum")
        )
        return pd.DataFrame(
            {
                "doc_id": out["doc_id"].astype("int64"),
                "n_distinct": out["n_distinct"].astype("int64"),
                "n_novel": out["n_novel"].astype("int64"),
                "novelty_ppm": (
                    1_000_000 * out["n_novel"] // out["n_distinct"]
                ).astype("int64"),
            }
        )

    return bucketed_group_agg(
        flagged, ["doc_id"], doc_final, partial_fn=doc_partial, num_buckets=nb
    )


# ---------------------------------------------------------------------------
# Two-signal rank fusion: every doc's global rank under each of two quality
# signals (chars DESC, whitespace words DESC — stand-ins for any pair of
# scored signals) plus their sum, the Borda-count blend rank selection
# pipelines cut on. Rank normalization makes incommensurable signals
# directly addable — the reason curation stacks prefer it to z-scores.

RANK_BLEND_SQL = """
WITH f AS (
  SELECT doc_id, n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
  FROM documents
)
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT)
         AS rank_chars,
       CAST(row_number() OVER (ORDER BY n_words DESC, doc_id) AS BIGINT)
         AS rank_words,
       CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id)
            + row_number() OVER (ORDER BY n_words DESC, doc_id) AS BIGINT)
         AS blend
FROM f
"""


def rank_blend(sf_dir: str) -> ray.data.Dataset:
    """Per-doc (rank_chars, rank_words, blend) — two exact global
    rankings fused without ANY all-to-all sort.

    Scale shape: the two signals MELT into one (doc_id, tag, v) stream
    so both rank via the global_rank machinery in SHARED passes (the
    per-shuffle fixed tax dominates thin exchanges on this Ray — TODO
    lesson #3 — so 2 signals × 2 passes fold into 2): one bucketed
    histogram over the bounded (tag, value) domain → per-tag driver
    cumulative offsets → one bucketed reduce with complete (tag, value)
    groups assigns exact ranks; a third thin reduce on doc_id pivots the
    tagged ranks side by side. Three shuffles total, each carrying three
    int64s per doc; the text is read once and dropped at the first map."""
    from .shuffle import bucketed_group_agg

    docs = _docs(sf_dir, columns=("doc_id", "n_chars", "text"))

    def melt(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].astype("int64").to_numpy()
        chars = b["n_chars"].astype("int64").to_numpy()
        words = b["text"].str.split(" ").str.len().astype("int64").to_numpy()
        return pd.DataFrame(
            {
                "doc_id": np.concatenate([ids, ids]),
                "tag": np.repeat(np.array([0, 1], dtype="int64"), len(ids)),
                "v": np.concatenate([chars, words]),
            }
        )

    melted = docs.map_batches(melt, batch_format="pandas").materialize()

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby(["tag", "v"], as_index=False).size()
        return out.rename(columns={"size": "cnt"}).astype(
            {"tag": "int64", "v": "int64", "cnt": "int64"}
        )

    def hist_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["tag", "v"], as_index=False)["cnt"].sum()
        return out.astype({"tag": "int64", "v": "int64", "cnt": "int64"})

    hist = (
        bucketed_group_agg(
            melted, ["tag", "v"], hist_final, partial_fn=hist_partial,
            num_buckets=16,
        )
        .to_pandas()
        .sort_values(["tag", "v"], ascending=[True, False])
    )
    offs = {}
    for tag, g in hist.groupby("tag"):
        offs[int(tag)] = dict(
            zip(g["v"].to_numpy(), (g["cnt"].cumsum() - g["cnt"]).to_numpy())
        )
    offs_ref = ray.put(offs)

    def per_value(g: pd.DataFrame) -> pd.DataFrame:
        offs_ = ray.get(offs_ref)
        g = g.sort_values(["tag", "v", "doc_id"], ascending=[True, False, True])
        local = g.groupby(["tag", "v"], sort=False).cumcount() + 1
        base = np.fromiter(
            (offs_[t][v] for t, v in zip(g["tag"].to_numpy(), g["v"].to_numpy())),
            dtype="int64",
            count=len(g),
        )
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].astype("int64").to_numpy(),
                "tag": g["tag"].astype("int64").to_numpy(),
                "rank": (base + local.to_numpy()).astype("int64"),
            }
        )

    tagged = bucketed_group_agg(melted, ["tag", "v"], per_value)

    def pivot(g: pd.DataFrame) -> pd.DataFrame:
        p = g.pivot(index="doc_id", columns="tag", values="rank").reset_index()
        return pd.DataFrame(
            {
                "doc_id": p["doc_id"].astype("int64"),
                "rank_chars": p[0].astype("int64"),
                "rank_words": p[1].astype("int64"),
                "blend": (p[0] + p[1]).astype("int64"),
            }
        )

    return bucketed_group_agg(tagged, ["doc_id"], pivot)


# ---------------------------------------------------------------------------
# Exact per-source Pearson sufficient statistics between two doc signals
# (whitespace word count vs char count): the correlation audit a feature
# pipeline publishes to spot redundant signals. Emitted as the INTEGER
# numerator and the two variance terms (corr = num / sqrt(var_x·var_y) is
# the consumer's division — a float r would not hash across engines); the
# sibling of revenue_trend's OLS decomposition.

SIGNAL_CORRELATION_SQL = """
WITH f AS (
  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
         n_chars AS y
  FROM documents
),
s AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM f GROUP BY source
)
SELECT source, n,
       CAST(n * sxy - sx * sy AS BIGINT) AS corr_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS var_x,
       CAST(n * syy - sy * sy AS BIGINT) AS var_y
FROM s
"""


def signal_correlation(sf_dir: str) -> pd.DataFrame:
    """Per-source n and exact (corr_num, var_x, var_y) for the
    (n_words, n_chars) signal pair. Scale shape: all six sufficient
    statistics are plain SUMs keyed on the bounded SOURCE domain — one
    combiner pass, one-task merge (which accumulates in Python ints for
    HUGEINT parity with the oracle, then emits BIGINT; the final moment
    products are int64-checked, the same emission boundary as
    source_token_divergence)."""
    docs = _docs(sf_dir, columns=("doc_id", "source", "n_chars", "text"))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b["text"].str.split(" ").str.len().astype("int64")
        y = b["n_chars"].astype("int64")
        f = pd.DataFrame(
            {"source": b["source"], "n": 1, "sx": x, "sy": y,
             "sxy": x * y, "sxx": x * x, "syy": y * y}
        )
        return f.groupby("source", as_index=False).sum()

    parts = (
        docs.map_batches(partial, batch_format="pandas")
        .repartition(1)
        .to_pandas()
    )
    rows = []
    for src, g in parts.groupby("source"):
        n = int(g["n"].sum())
        sx, sy = int(g["sx"].sum()), int(g["sy"].sum())
        sxy, sxx, syy = int(g["sxy"].sum()), int(g["sxx"].sum()), int(g["syy"].sum())
        rows.append(
            {
                "source": src,
                "n": np.int64(n),
                "corr_num": np.int64(n * sxy - sx * sy),
                "var_x": np.int64(n * sxx - sx * sx),
                "var_y": np.int64(n * syy - sy * sy),
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# Order-preserving dictionary encode of the corpus vocabulary: every
# distinct token gets a contiguous id in LEXICOGRAPHIC order — the
# dictionary layout columnar formats and FST-backed term indexes want
# (range scans over encoded ids = range scans over terms). The classic way
# is a global sort; here the ids come from a SORT-FREE range partition:
# the big-endian first-8-bytes of the UTF-8 token are a uint64 whose order
# embeds string order (zero-padding preserves <=, UTF-8 preserves code
# point order), so its top bits are an ORDER-PRESERVING bucket key. Local
# sorts inside complete buckets + an O(num_buckets) driver prefix sum give
# exact global ordinals.

DICT_ENCODE_ORDERED_SQL = """
WITH d AS (SELECT DISTINCT UNNEST(string_split(text, ' ')) AS token FROM documents)
SELECT token,
       CAST(row_number() OVER (ORDER BY token) AS BIGINT) AS token_id
FROM d
"""


def dict_encode_ordered(sf_dir: str) -> ray.data.Dataset:
    """(token, token_id) with ids dense and ascending in token order.

    Scale shape: per-batch distinct tokens tagged with the prefix bucket;
    shuffle #1 (the only corpus-scale one) dedupes tokens inside complete
    prefix-range buckets and emits per-bucket distinct counts; the
    bucket-count histogram (bounded: 2^bucket_bits cells) prefix-sums on
    the driver; shuffle #2 re-groups the SAME deduped rows and assigns
    token_id = bucket offset + local sorted rank. Skew note: buckets are
    ranges of the 8-byte-prefix space — a vocabulary concentrated in one
    shared 8-byte prefix (pathological) lands in one bucket; the fix is
    deepening the prefix (bytes 9..16) for the hot bucket, which the
    guard in bucketed_group_agg would surface as a group-size error
    rather than silently stalling."""
    from .shuffle import bucketed_group_agg, histogram_merge, scaled_num_buckets

    docs = _docs(sf_dir, columns=("doc_id", "text"))
    want = scaled_num_buckets(docs.size_bytes(), lo=64)
    bbits = max(6, int(want - 1).bit_length())
    nb = 1 << bbits

    def prefix_key(tokens: np.ndarray) -> np.ndarray:
        raw = np.zeros(len(tokens), dtype=np.uint64)
        for i, t in enumerate(tokens):
            b = t.encode("utf-8")[:8]
            raw[i] = int.from_bytes(b.ljust(8, b"\x00"), "big")
        return raw

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        toks = pd.unique(b["text"].str.split(" ").explode())
        toks = np.asarray(toks, dtype=object)
        rb = (prefix_key(toks) >> np.uint64(64 - bbits)).astype("int64")
        return pd.DataFrame({"rb": rb, "token": toks})

    tagged = docs.map_batches(explode, batch_format="pandas")

    def dedupe(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates()

    distinct = bucketed_group_agg(
        tagged, ["rb"], dedupe, num_buckets=min(nb, 512)
    ).materialize()

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        s = b["rb"].value_counts()
        return pd.DataFrame(
            {"rb": s.index.astype("int64"), "c": s.to_numpy().astype("int64")}
        )

    merged = histogram_merge(
        distinct.map_batches(count_partial, batch_format="pandas"), "rb", "c"
    ).to_pandas()
    full = np.zeros(nb, dtype="int64")
    full[merged["rb"].to_numpy()] = merged["c"].to_numpy()
    offsets = np.concatenate([[0], np.cumsum(full)[:-1]]).astype("int64")
    off_ref = ray.put(offsets)

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(off_ref)
        g = g.sort_values(["rb", "token"], kind="mergesort")
        local = g.groupby("rb", sort=False).cumcount().to_numpy() + 1
        ids = offs[g["rb"].to_numpy(dtype="int64")] + local
        return pd.DataFrame(
            {"token": g["token"].to_numpy(), "token_id": ids.astype("int64")}
        )

    return bucketed_group_agg(distinct, ["rb"], assign, num_buckets=min(nb, 512))


# ---------------------------------------------------------------------------
# Exact two-sample Kolmogorov–Smirnov distance between every pair of
# sources over the doc-length distribution — the drift / homogeneity screen
# a multi-source corpus publishes before mixing. KS = max |ECDF_a − ECDF_b|
# carried as the exact integer pair (max |cum_a·n_b − cum_b·n_a|, n_a·n_b).

SOURCE_KS_DISTANCE_SQL = """
WITH h AS (
  SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY source, n_chars
),
n AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY source),
grid AS (SELECT n.source, g.v FROM n, (SELECT DISTINCT v FROM h) g),
j AS (
  SELECT grid.source, grid.v, COALESCE(h.c, 0) AS c
  FROM grid LEFT JOIN h ON h.source = grid.source AND h.v = grid.v
),
cum AS (
  SELECT source, v, SUM(c) OVER (PARTITION BY source ORDER BY v) AS cum
  FROM j
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(MAX(ABS(a.cum * nb.n - b.cum * na.n)) AS BIGINT) AS ks_num,
       CAST(na.n * nb.n AS BIGINT) AS ks_den
FROM cum a
JOIN cum b ON a.v = b.v AND a.source < b.source
JOIN n na ON na.source = a.source
JOIN n nb ON nb.source = b.source
GROUP BY a.source, b.source, na.n, nb.n
"""


def source_ks_distance(sf_dir: str) -> pd.DataFrame:
    """(source_a < source_b, ks_num, ks_den) with
    KS = ks_num / ks_den exactly. Scale shape: ONE combiner pass reduces
    the corpus to a (source × length-value) count table — both axes
    structurally bounded (sources ~10², lengths ≤ max doc length), so the
    table reaches the driver safely; the pairwise max-gap scan is a
    vectorized cumsum matrix sweep over |S|²/2 pairs. No shuffle at all."""
    docs = _docs(sf_dir, columns=("doc_id", "source", "n_chars"))

    def cpart(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["source", "n_chars"], as_index=False).size()
        return g.rename(columns={"size": "c"}).astype({"n_chars": "int64", "c": "int64"})

    h = (
        docs.map_batches(cpart, batch_format="pandas")
        .repartition(1)
        .map_batches(
            lambda b: b.groupby(["source", "n_chars"], as_index=False)["c"].sum(),
            batch_format="pandas",
        )
        .to_pandas()
    )
    sources = sorted(h["source"].unique())
    values = np.sort(h["n_chars"].unique())
    vpos = {v: i for i, v in enumerate(values)}
    spos = {s: i for i, s in enumerate(sources)}
    C = np.zeros((len(sources), len(values)), dtype="int64")
    C[
        h["source"].map(spos).to_numpy(), h["n_chars"].map(vpos).to_numpy()
    ] = h["c"].to_numpy()
    cum = C.cumsum(axis=1)
    n = cum[:, -1]
    rows = []
    for i in range(len(sources)):
        for j in range(i + 1, len(sources)):
            num = int(np.abs(cum[i] * n[j] - cum[j] * n[i]).max())
            rows.append(
                {
                    "source_a": sources[i],
                    "source_b": sources[j],
                    "ks_num": np.int64(num),
                    "ks_den": np.int64(n[i] * n[j]),
                }
            )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# Deterministic length-proportional systematic sample: lay the corpus on
# the packed token line (pack_sequences' exact offsets) and pick every doc
# containing a multiple-of-step token boundary — inclusion probability
# proportional to length, exactly ~SAMPLE_TARGET picks, zero randomness.

SAMPLE_TARGET = 100

SYSTEMATIC_WEIGHT_SAMPLE_SQL = f"""
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
o AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS tok_offset
  FROM t
),
s AS (SELECT GREATEST(1, SUM(n_tokens) // {SAMPLE_TARGET}) AS step FROM t)
SELECT doc_id, n_tokens, tok_offset
FROM o, s
WHERE (tok_offset + n_tokens) // step > tok_offset // step
"""


def systematic_weight_sample(sf_dir: str) -> ray.data.Dataset:
    """Docs straddling a step boundary on the packed token line (step =
    total_tokens // SAMPLE_TARGET). Scale shape: the offsets come from
    pack_sequences' order-preserving range-bucket prefix machinery (no
    sort); the total is an exact Dataset.sum over the thin int column;
    the pick filter is a stateless vectorized map — the selection is
    reproducible across cluster shapes because it depends only on data."""
    packed = pack_sequences(sf_dir).materialize()
    total = packed.sum("n_tokens")
    step = max(1, int(total) // SAMPLE_TARGET)

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        off = b["tok_offset"].to_numpy(dtype="int64")
        n = b["n_tokens"].to_numpy(dtype="int64")
        keep = (off + n) // step > off // step
        return b.loc[keep, ["doc_id", "n_tokens", "tok_offset"]]

    return packed.map_batches(pick, batch_format="pandas")


# ---------------------------------------------------------------------------
# lang × source independence audit (exact-integer chi-square contingency)
# ---------------------------------------------------------------------------

LANG_SOURCE_INDEPENDENCE_SQL = """
WITH o AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS obs
  FROM documents GROUP BY lang, source
),
r AS (SELECT lang, CAST(count(*) AS BIGINT) AS rt FROM documents GROUP BY lang),
c AS (SELECT source, CAST(count(*) AS BIGINT) AS ct FROM documents GROUP BY source),
n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM documents)
SELECT o.lang, o.source, o.obs AS observed,
       CAST(CAST(r.rt AS HUGEINT) * c.ct * 1000000 // n.nn AS BIGINT)
         AS expected_ppm,
       CAST((CAST(n.nn AS HUGEINT) * o.obs - CAST(r.rt AS HUGEINT) * c.ct)
            * (CAST(n.nn AS HUGEINT) * o.obs - CAST(r.rt AS HUGEINT) * c.ct)
            * 1000000
            // (CAST(n.nn AS HUGEINT) * r.rt * c.ct) AS BIGINT)
         AS chi2_micro
FROM o JOIN r ON r.lang = o.lang JOIN c ON c.source = o.source, n
"""


def lang_source_independence(sf_dir: str) -> ray.data.Dataset:
    """Chi-square contingency audit of the (lang, source) taxonomy — the
    corpus-composition drift check a curation pipeline runs to catch a
    source whose language mix shifted (crawler regression, mislabeled
    shard). Per observed cell: count, independence-expected count (ppm)
    and the cell's chi-square contribution (micro-scaled) — all exact
    integers, so the audit hash-matches the SQL twin bit-for-bit (the
    float chi-square is one division away for a human reader).

    Scale shape: the cell domain is the langs × sources taxonomy —
    structurally bounded — so each batch collapses to a tiny crosstab
    partial and ONE merge task finishes with exact Python-int arithmetic
    (the HUGEINT-parity lesson: (N·o − r·c)² overflows int64 at corpus
    scale; Python ints mirror the oracle's HUGEINT, and past HUGEINT's
    own 2^127 ceiling — N ≳ 10^18 — only this side stays exact). No
    shuffle, no driver state beyond the taxonomy."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "source"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["lang", "source"], as_index=False).size()
        return pd.DataFrame(
            {"cell": g["lang"] + "|" + g["source"],
             "n": g["size"].astype("int64")}
        )

    merged = ds.map_batches(partial, batch_format="pandas")

    def stats(b: pd.DataFrame) -> pd.DataFrame:
        b = b.groupby("cell", as_index=False)["n"].sum()
        cells = b["cell"].str.split("|", n=1, expand=True)
        o = pd.DataFrame(
            {"lang": cells[0], "source": cells[1],
             "obs": b["n"].astype("int64")}
        )
        rt = {k: int(v) for k, v in o.groupby("lang")["obs"].sum().items()}
        ct = {k: int(v) for k, v in o.groupby("source")["obs"].sum().items()}
        nn = sum(rt.values())
        exp_ppm, chi_mic = [], []
        for lang, src, obs in zip(o["lang"], o["source"], o["obs"]):
            r, c, ob = rt[lang], ct[src], int(obs)
            exp_ppm.append(r * c * 1_000_000 // nn)
            d = nn * ob - r * c
            chi_mic.append(d * d * 1_000_000 // (nn * r * c))
        return pd.DataFrame(
            {"lang": o["lang"], "source": o["source"], "observed": o["obs"],
             "expected_ppm": pd.Series(exp_ppm, dtype="int64"),
             "chi2_micro": pd.Series(chi_mic, dtype="int64")}
        )

    return merged.repartition(1).map_batches(
        stats, batch_format="pandas", batch_size=None
    )


# ---------------------------------------------------------------------------
# CCNet head/middle/tail buckets: per-language LM-quality tertiles
# ---------------------------------------------------------------------------

CCNET_BUCKET_SQL = """
WITH w AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents
),
g AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY token),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM w),
s AS (
  SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(SUM(g.c) * 1000000000
              // (CAST(count(*) AS HUGEINT) * (SELECT n_total FROM n))
           AS BIGINT) AS ppb
  FROM w JOIN g ON w.token = g.token GROUP BY w.doc_id
),
j AS (
  SELECT d.lang, s.doc_id, s.n_tokens, s.ppb
  FROM s JOIN documents d ON d.doc_id = s.doc_id
),
r AS (
  SELECT lang, n_tokens, ppb,
         row_number() OVER (PARTITION BY lang ORDER BY ppb DESC, doc_id)
           AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM j
)
SELECT lang,
       CASE (rn - 1) * 3 // n WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
            ELSE 'tail' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(min(ppb) AS BIGINT) AS min_ppb,
       CAST(max(ppb) AS BIGINT) AS max_ppb
FROM r GROUP BY lang, (rn - 1) * 3 // n
"""

_CCNET_NAMES = {0: "head", 1: "middle", 2: "tail"}


def ccnet_bucket(sf_dir: str) -> ray.data.Dataset:
    """CCNet's head/middle/tail split, per language: documents ranked by
    the unigram LM quality score (descending — head = most-fluent third)
    and cut into exact tertiles (the NTILE identity: bucket =
    (rn−1)·3 // n). CCNet trains its LM per language and splits each
    language independently; the report is the per-(lang, bucket) doc and
    token mass a mixing stage consumes.

    Scale shape: scoring reuses unigram_prob_score end-to-end (broadcast-
    gated counts, tag-union fallback); the lang attach is ONE bucketed
    tag-union join on doc_id (both sides thin int/short-string rows —
    doc_id→lang is corpus-sized, never broadcast); ranking is
    shuffle.grouped_rank (bounded lang taxonomy, O(langs × ranges) driver
    state, no sort); the final (lang, bucket) rollup is structurally
    bounded so one merge task finishes."""
    from .shuffle import bucketed_group_agg, grouped_rank, input_bytes_estimate, scaled_num_buckets
    from .text import unigram_prob_score

    scores = unigram_prob_score(sf_dir)
    langs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )

    def tag_score(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": b["doc_id"].astype("int64"),
             "lang": pd.Series([None] * len(b), dtype="object"),
             "n_tokens": b["n_tokens"].astype("int64"),
             "ppb": b["mean_prob_ppb"].astype("int64")}
        )

    def tag_lang(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": b["doc_id"].astype("int64"), "lang": b["lang"],
             "n_tokens": pd.Series([-1] * len(b), dtype="int64"),
             "ppb": pd.Series([-1] * len(b), dtype="int64")}
        )

    tagged = scores.map_batches(tag_score, batch_format="pandas").union(
        langs.map_batches(tag_lang, batch_format="pandas")
    )

    def merge_doc(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("doc_id", as_index=False).agg(
            n_tokens=("n_tokens", "max"), ppb=("ppb", "max"),
        )
        lng = g.dropna(subset=["lang"]).groupby("doc_id")["lang"].first()
        a["lang"] = a["doc_id"].map(lng)
        return a.dropna(subset=["lang"])

    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/documents.parquet"))
    joined = bucketed_group_agg(
        tagged, ["doc_id"], merge_doc, num_buckets=min(nb, 128)
    ).materialize()

    ranked = grouped_rank(joined, "lang", "ppb", "doc_id", descending=True)

    def rollup(b: pd.DataFrame) -> pd.DataFrame:
        t = ((b["rn"] - 1) * 3 // b["n_part"]).astype("int64")
        out = b.assign(bucket=t.map(_CCNET_NAMES))
        return out.groupby(["lang", "bucket"], as_index=False).agg(
            n_docs=("doc_id", "size"), sum_tokens=("n_tokens", "sum"),
            min_ppb=("ppb", "min"), max_ppb=("ppb", "max"),
        )

    parts = ranked.map_batches(rollup, batch_format="pandas")

    def final(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["lang", "bucket"], as_index=False).agg(
            n_docs=("n_docs", "sum"), sum_tokens=("sum_tokens", "sum"),
            min_ppb=("min_ppb", "min"), max_ppb=("max_ppb", "max"),
        ).astype({"n_docs": "int64", "sum_tokens": "int64",
                  "min_ppb": "int64", "max_ppb": "int64"})

    return parts.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None
    )


# ---------------------------------------------------------------------------
# shard_balance: token-balanced round-robin shard assignment
# ---------------------------------------------------------------------------

N_SHARDS = 64

SHARD_BALANCE_SQL = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
r AS (
  SELECT doc_id, n_tokens,
         row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rn
  FROM t
)
SELECT CAST((rn - 1) % {N_SHARDS} AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
FROM r GROUP BY (rn - 1) % {N_SHARDS}
"""


def shard_balance(sf_dir: str) -> ray.data.Dataset:
    """Token-balanced shard assignment: docs ranked by size (descending,
    doc_id tiebreak) and dealt round-robin into N_SHARDS — the classic
    sorted-round-robin deal whose imbalance is bounded by ONE document's
    tokens per lap (the serpentine/LPT variants tighten the constant but
    lose the closed-form rank rule an oracle can check). The per-shard
    (n_docs, sum_tokens) report is what a training launcher reads to size
    its data-parallel groups.

    Scale shape: token counting is a stateless projection map; the global
    rank is shuffle.grouped_rank over a CONSTANT part (value-range
    buckets, driver state O(ranges)); the shard rollup domain is
    N_SHARDS so one merge task finishes."""
    from .shuffle import grouped_rank

    docs = _docs(sf_dir)

    def toks(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": b["doc_id"].astype("int64"),
             "n_tokens": b["text"].str.split(" ").str.len().astype("int64"),
             "g": pd.Series([0] * len(b), dtype="int64")}
        )

    thin = docs.map_batches(toks, batch_format="pandas").materialize()
    ranked = grouped_rank(thin, "g", "n_tokens", "doc_id", descending=True)

    def rollup(b: pd.DataFrame) -> pd.DataFrame:
        shard = ((b["rn"] - 1) % N_SHARDS).astype("int64")
        return b.assign(shard=shard).groupby("shard", as_index=False).agg(
            n_docs=("doc_id", "size"), sum_tokens=("n_tokens", "sum")
        )

    parts = ranked.map_batches(rollup, batch_format="pandas")

    def final(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby("shard", as_index=False).agg(
            n_docs=("n_docs", "sum"), sum_tokens=("sum_tokens", "sum")
        )
        return out.astype(
            {"shard": "int64", "n_docs": "int64", "sum_tokens": "int64"}
        )

    return parts.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None
    )


# ---------------------------------------------------------------------------
# webdataset_manifest: shard-tar training-data sink with a deterministic
# manifest (the WebDataset layout: shard-NNNNNN.tar of per-sample members)
# ---------------------------------------------------------------------------

WDS_SHARD_BYTES = 65536  # payload budget per shard (64 KiB at test scale;
# a production corpus sets ~1 GiB — the machinery is size-agnostic)

WEBDATASET_MANIFEST_SQL = f"""
WITH t AS (
  SELECT doc_id, CAST(strlen(text) AS BIGINT) AS nb FROM documents
),
o AS (
  SELECT doc_id, nb,
         COALESCE(SUM(nb) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM t
)
SELECT CAST(off // {WDS_SHARD_BYTES} AS BIGINT) AS shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nb) AS BIGINT) AS payload_bytes
FROM o GROUP BY off // {WDS_SHARD_BYTES}
"""


def webdataset_manifest(
    sf_dir: str, *, out_dir: str | None = None
) -> ray.data.Dataset:
    """WebDataset-style shard sink: documents packed in doc_id order into
    byte-budgeted shards (shard = exclusive-prefix-bytes // budget — a
    doc belongs to the shard its first byte lands in), each shard written
    as one deterministic tar (members ``<doc_id>.txt`` in id order,
    zeroed mtime/uid — byte-reproducible) and published ATOMICALLY
    (tmp + os.replace, the checkpoint module's contract). Returns the
    manifest (shard_id, n_docs, payload_bytes) — the unit a training
    launcher shuffles and a resume skips by.

    Scale shape: pass 1 is pack_sequences' thin order-preserving
    range-bucket prefix machinery over BYTE lengths (no text moves);
    because offsets are monotone in doc_id, every shard is a CONTIGUOUS
    doc_id range, so the boundary docs (one per shard — systematic_
    weight_sample's straddle rule) broadcast as a sorted array of
    O(#shards) driver state (the manifest itself is that size) and pass
    2 maps text rows to shards statelessly via searchsorted; ONE
    text-bearing shuffle groups complete shards at the tar writers."""
    import hashlib as _hl
    import io
    import os
    import tarfile

    from .shuffle import bucketed_group_agg, histogram_merge, scaled_num_buckets

    if out_dir is None:
        key = _hl.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
        out_dir = f"/tmp/docling_ray_wds/{key}"
    os.makedirs(out_dir, exist_ok=True)
    webdataset_manifest.last_out_dir = out_dir

    path = f"{sf_dir}/documents.parquet"
    docs = ray.data.read_parquet(path, columns=["doc_id", "text"])

    def count_bytes(b: pd.DataFrame) -> pd.DataFrame:
        nb_ = b["text"].str.encode("utf-8").str.len().astype("int64")
        return pd.DataFrame({"doc_id": b["doc_id"].astype("int64"), "nb": nb_})

    counts = docs.map_batches(count_bytes, batch_format="pandas").materialize()

    def extremes(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"lo": [], "hi": []})
        d = b["doc_id"].to_numpy()
        return pd.DataFrame({"lo": [int(d.min())], "hi": [int(d.max())]})

    ext = counts.map_batches(extremes, batch_format="pandas").to_pandas()
    lo, hi = int(ext["lo"].min()), int(ext["hi"].max())
    span = hi - lo + 1
    nrb = min(scaled_num_buckets(counts.size_bytes(), lo=64), span)

    def add_rb(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].to_numpy(dtype="int64")
        return b.assign(rb=((d - lo) * nrb // span).astype("int64"))

    bucketed = counts.map_batches(add_rb, batch_format="pandas")
    sums = histogram_merge(
        bucketed.map_batches(
            lambda b: b.groupby("rb", as_index=False)["nb"].sum(),
            batch_format="pandas",
        ),
        "rb", "nb",
    ).to_pandas()
    full = np.zeros(nrb, dtype="int64")
    full[sums["rb"].to_numpy()] = sums["nb"].to_numpy()
    offsets = np.concatenate([[0], np.cumsum(full)[:-1]]).astype("int64")
    off_ref = ray.put(offsets)

    # boundary docs: the first doc of every shard. A bucket emits its
    # WITHIN-bucket shard transitions (shifted-prev compare) plus its
    # first doc (whose predecessor lives in another bucket) — O(#shards
    # + #buckets) candidate rows; since shard is monotone in doc_id, the
    # true firsts are exactly the min-doc_id row per shard, a driver
    # dedupe over manifest-sized state.
    def firsts_of(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(off_ref)
        g = g.sort_values(["rb", "doc_id"])
        n = g["nb"].to_numpy(dtype="int64")
        local = g.groupby("rb", sort=False)["nb"].cumsum().to_numpy() - n
        off = offs[g["rb"].to_numpy(dtype="int64")] + local
        shard = off // WDS_SHARD_BYTES
        rb = g["rb"].to_numpy(dtype="int64")
        cand = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            cand[1:] = (shard[1:] != shard[:-1]) | (rb[1:] != rb[:-1])
        return pd.DataFrame(
            {"doc_id": g["doc_id"].to_numpy()[cand],
             "shard_id": shard[cand].astype("int64")}
        )

    bounds = (
        bucketed_group_agg(bucketed, ["rb"], firsts_of, num_buckets=min(nrb, 512))
        .to_pandas()
        .sort_values("doc_id")
        .drop_duplicates("shard_id", keep="first")
    )
    first_ids = bounds["doc_id"].to_numpy(dtype="int64")
    shard_ids = bounds["shard_id"].to_numpy(dtype="int64")
    bref = ray.put((first_ids, shard_ids))

    def tag_shard(b: pd.DataFrame) -> pd.DataFrame:
        fids, sids = ray.get(bref)
        d = b["doc_id"].to_numpy(dtype="int64")
        pos = np.searchsorted(fids, d, side="right") - 1
        return pd.DataFrame(
            {"shard_id": sids[pos], "doc_id": d, "text": b["text"]}
        )

    def write_shards(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for sid, grp in g.groupby("shard_id"):
            grp = grp.sort_values("doc_id")
            final = os.path.join(out_dir, f"shard-{int(sid):06d}.tar")
            tmp = final + ".tmp"
            payload = 0
            with tarfile.open(tmp, "w") as tf:
                for d, t in zip(grp["doc_id"], grp["text"]):
                    data = t.encode("utf-8")
                    payload += len(data)
                    ti = tarfile.TarInfo(name=f"{int(d):012d}.txt")
                    ti.size = len(data)
                    ti.mtime = 0
                    tf.addfile(ti, io.BytesIO(data))
            os.replace(tmp, final)  # atomic publish per shard
            rows.append((int(sid), len(grp), payload))
        return pd.DataFrame(
            rows, columns=["shard_id", "n_docs", "payload_bytes"]
        ).astype({"shard_id": "int64", "n_docs": "int64",
                  "payload_bytes": "int64"})

    tagged = docs.map_batches(tag_shard, batch_format="pandas")
    return bucketed_group_agg(
        tagged, ["shard_id"], write_shards,
        num_buckets=min(max(64, len(first_ids)), 512),
    )


# ---------------------------------------------------------------------------
# script_mix: byte-vs-char script audit per language
# ---------------------------------------------------------------------------

SCRIPT_MIX_SQL = """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS n_chars,
       CAST(SUM(strlen(text)) AS BIGINT) AS n_bytes,
       CAST(SUM(strlen(text) - length(text)) * 1000000
            // SUM(strlen(text)) AS BIGINT) AS non_ascii_ppm
FROM documents GROUP BY lang
"""


def script_mix(sf_dir: str) -> ray.data.Dataset:
    """Per-language script audit: UTF-8 byte vs codepoint mass and the
    non-ASCII byte share (ppm) — the cheap mojibake / wrong-script-label
    detector (an 'en' shard suddenly carrying 30% multibyte bytes means
    a crawler or charset regression upstream). Exact integers only.

    Scale shape: per-batch partials over the bounded lang taxonomy, one
    merge task; the ppm division happens once per lang at the end (the
    merge sums the numerators first — summing per-batch ratios would be
    wrong, which is why the partial carries both byte counts)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        chars = b["text"].str.len().astype("int64")
        nbytes = b["text"].str.encode("utf-8").str.len().astype("int64")
        f = pd.DataFrame({"lang": b["lang"], "n_docs": np.int64(1),
                          "n_chars": chars, "n_bytes": nbytes})
        return f.groupby("lang", as_index=False).agg(
            n_docs=("n_docs", "sum"), n_chars=("n_chars", "sum"),
            n_bytes=("n_bytes", "sum"),
        )

    parts = ds.map_batches(partial, batch_format="pandas")

    def final(b: pd.DataFrame) -> pd.DataFrame:
        s = b.groupby("lang", as_index=False).agg(
            n_docs=("n_docs", "sum"), n_chars=("n_chars", "sum"),
            n_bytes=("n_bytes", "sum"),
        )
        s["non_ascii_ppm"] = (
            (s["n_bytes"] - s["n_chars"]) * 1_000_000 // s["n_bytes"]
        ).astype("int64")
        return s.astype({"n_docs": "int64", "n_chars": "int64",
                         "n_bytes": "int64"})

    return parts.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None
    )
