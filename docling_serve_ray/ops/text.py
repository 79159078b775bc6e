"""Text-analysis operators over a (doc_id, text, …) documents table:
token counting, quality scoring, language identification, fingerprinting.

All are stateless vectorized ``map_batches`` stages; each has an exact
DuckDB SQL twin (same tokenization: split on single space — both sides),
so results are byte-comparable in the correctness harness.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# Shared heuristic constants — mirrored literally in the SQL twins.
STOPWORDS = ("the", "a", "and", "of", "to")
LANG_STOPS = {
    "en": ("the", "a", "of", "and", "to", "is"),
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "fr": ("le", "la", "les", "et", "est", "dans"),
    "es": ("el", "los", "las", "es", "en", "y"),
}
LANG_PRIORITY = ("en", "de", "fr", "es")  # tie-break order


def _docs(sf_dir: str, columns=("doc_id", "text")) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


def token_count(sf_dir: str) -> ray.data.Dataset:
    """doc_id, n_tokens — vectorized Arrow split on single space."""

    def f(batch: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern(batch["text"], " "))
        return pa.table({"doc_id": batch["doc_id"], "n_tokens": pc.cast(n, pa.int64())})

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow")


def text_quality(sf_dir: str) -> ray.data.Dataset:
    """Per-doc quality features: n_chars_calc, n_tokens, avg_token_len_micro
    (mean token length ×1e6 as int — fp-stable comparison), stop_ratio_micro."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.split(" ")
        n_tokens = toks.str.len().astype("int64")
        n_chars = batch["text"].str.len().astype("int64")
        sum_tok = n_chars - (n_tokens - 1)  # single-space join invariant
        stops = set(STOPWORDS)
        stop_n = toks.map(lambda ws: sum(1 for w in ws if w in stops)).astype("int64")
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_chars_calc": n_chars,
                "n_tokens": n_tokens,
                "avg_token_len_micro": (sum_tok * 1_000_000 // n_tokens).astype("int64"),
                "stop_ratio_micro": (stop_n * 1_000_000 // n_tokens).astype("int64"),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pandas")


def lang_id(sf_dir: str) -> ray.data.Dataset:
    """Heuristic language ID: CJK/Arabic/Greek charset check, else the
    stopword family with the highest hit count (priority en>de>fr>es on
    ties), else 'unknown'. Twin of the SQL CASE expression in oracle_sql."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"]
        has_cjk = texts.str.contains(r"[一-鿿]", regex=True)
        has_ar = texts.str.contains(r"[؀-ۿ]", regex=True)
        has_el = texts.str.contains(r"[Ͱ-Ͽ]", regex=True)
        toks = texts.str.split(" ")
        counts = {
            lang: toks.map(lambda ws, s=frozenset(stops): sum(1 for w in ws if w in s))
            for lang, stops in LANG_STOPS.items()
        }
        best = pd.Series("unknown", index=texts.index)
        best_n = pd.Series(0, index=texts.index)
        for lang in LANG_PRIORITY:  # first language wins ties (strict >)
            take = counts[lang] > best_n
            best = best.where(~take, lang)
            best_n = best_n.where(~take, counts[lang])
        pred = best.where(~has_el, "el").where(~has_ar, "ar").where(~has_cjk, "zh")
        return pd.DataFrame({"doc_id": batch["doc_id"], "pred_lang": pred})

    return _docs(sf_dir).map_batches(f, batch_format="pandas")


def fingerprint(sf_dir: str) -> ray.data.Dataset:
    """doc_id, fp = md5(lower(text)) — content fingerprint for dedup joins
    (md5 chosen because DuckDB's md5() is bit-identical)."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        fp = batch["text"].map(lambda t: hashlib.md5(t.lower().encode("utf-8")).hexdigest())
        return pd.DataFrame({"doc_id": batch["doc_id"], "fp": fp})

    return _docs(sf_dir).map_batches(f, batch_format="pandas")


HEX_DIGITS = "0123456789abcdef"
SPLIT_TRAIN_LT = 13  # md5 first hex digit: 0-12 train (81.25%)
SPLIT_VAL_LT = 15    # 13-14 val (12.5%), 15 test (6.25%)

DATASET_SPLIT_SQL = """
WITH h AS (
  SELECT doc_id,
         strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
           AS hv
  FROM documents
)
SELECT doc_id,
       CASE WHEN hv < 13 THEN 'train' WHEN hv < 15 THEN 'val' ELSE 'test' END
         AS split
FROM h
"""


def dataset_split(sf_dir: str) -> ray.data.Dataset:
    """Deterministic train/val/test assignment — the standard
    hash-the-stable-id split for training corpora (reproducible across
    runs, engines and shard layouts; no RNG, no shuffle, no coordination:
    every worker computes its rows' split locally). Rule shared literally
    with the SQL twin: first hex digit of md5(doc_id) → 13/2/1 of 16."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        hv = batch["doc_id"].map(
            lambda d: int(hashlib.md5(str(d).encode()).hexdigest()[0], 16)
        )
        split = pd.Series("test", index=batch.index)
        split = split.where(hv >= SPLIT_VAL_LT, "val").where(hv >= SPLIT_TRAIN_LT, "train")
        return pd.DataFrame({"doc_id": batch["doc_id"], "split": split})

    return _docs(sf_dir, columns=("doc_id",)).map_batches(f, batch_format="pandas")


TOP_TOKENS_K = 20

TOP_TOKENS_SQL = """
WITH w AS (
  SELECT UNNEST(string_split(text, ' ')) AS token FROM documents
),
c AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM w GROUP BY token)
SELECT token, cnt,
       CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS rank
FROM c
QUALIFY row_number() OVER (ORDER BY cnt DESC, token) <= 20
"""


def top_tokens(sf_dir: str) -> ray.data.Dataset:
    """Global top-20 tokens by frequency (corpus vocabulary heavy
    hitters). Combiner pattern end to end: per-batch value_counts →
    bucketed token-count aggregation (token cardinality is unbounded at
    corpus scale — never a per-key groupby) → per-bucket top-k candidates
    → tiny global sort over buckets×k rows."""
    from .shuffle import bucketed_group_agg

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch["text"].str.split(" ").explode().value_counts()
        return pd.DataFrame({"token": vc.index, "pc": vc.to_numpy().astype("int64")})

    def per_bucket_top(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("token", as_index=False).agg(cnt=("pc", "sum"))
        out["cnt"] = out["cnt"].astype("int64")
        return out.sort_values(["cnt", "token"], ascending=[False, True]).head(
            TOP_TOKENS_K
        )

    cands = bucketed_group_agg(
        _docs(sf_dir, columns=("text",)).map_batches(partial, batch_format="pandas"),
        ["token"],
        per_bucket_top,
    )

    def final_top(batch: pd.DataFrame) -> pd.DataFrame:
        top = batch.sort_values(["cnt", "token"], ascending=[False, True]).head(
            TOP_TOKENS_K
        )
        return pd.DataFrame(
            {
                "token": top["token"].to_numpy(),
                "cnt": top["cnt"].astype("int64").to_numpy(),
                "rank": pd.Series(range(1, len(top) + 1), dtype="int64"),
            }
        )

    # candidates are ≤ buckets×k rows: a single tiny final batch
    return cands.repartition(1).map_batches(final_top, batch_format="pandas")


CHUNK_TOKENS = 64
CHUNK_STRIDE = 56  # 8-token overlap between consecutive chunks

CHUNK_DOCUMENTS_SQL = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
       array_to_string(words[i*56+1 : i*56+64], ' ') AS chunk_text,
       CAST(least(64, len(words) - i*56) AS BIGINT) AS n_tokens
FROM w, LATERAL (
  SELECT UNNEST(generate_series(0,
    CAST(CASE WHEN len(words) <= 64 THEN 0
              ELSE ceil((len(words) - 64) / 56.0) END AS BIGINT))) AS i
)
"""


def chunk_documents(sf_dir: str) -> ray.data.Dataset:
    """Sliding-window document chunking for training-sequence prep: 64-token
    windows at stride 56 (8-token overlap), last window may be short →
    (doc_id, chunk_id, chunk_text, n_tokens). Embarrassingly parallel
    flat-map — each doc explodes locally, no shuffle; at 100 TB the output
    streams straight to the tokenizer/writer."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        out_d, out_c, out_t, out_n = [], [], [], []
        for d, text in zip(batch["doc_id"], batch["text"]):
            words = text.split(" ")
            n = len(words)
            n_chunks = 1 if n <= CHUNK_TOKENS else 1 + -(-(n - CHUNK_TOKENS) // CHUNK_STRIDE)
            for i in range(n_chunks):
                seg = words[i * CHUNK_STRIDE : i * CHUNK_STRIDE + CHUNK_TOKENS]
                out_d.append(d)
                out_c.append(i)
                out_t.append(" ".join(seg))
                out_n.append(len(seg))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(out_d, dtype="int64"),
                "chunk_id": pd.Series(out_c, dtype="int64"),
                "chunk_text": out_t,
                "n_tokens": pd.Series(out_n, dtype="int64"),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pandas")


# per-language deterministic sampling rates (of 16), md5-hash gated — the
# language-balancing resample a multilingual training corpus needs
STRATA_RATES = {"en": 2, "ar": 8, "el": 8}
STRATA_DEFAULT = 4

STRATIFIED_SAMPLE_SQL = """
WITH h AS (
  SELECT doc_id, lang,
         strpos('0123456789abcdef',
                substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS hv
  FROM documents
)
SELECT doc_id, lang FROM h
WHERE hv < (CASE lang WHEN 'en' THEN 2 WHEN 'ar' THEN 8 WHEN 'el' THEN 8
            ELSE 4 END)
"""


def stratified_sample(sf_dir: str) -> ray.data.Dataset:
    """Deterministic per-language downsampling (language balancing):
    keep doc iff the first hex digit of md5('strat:'+doc_id) falls under
    the language's rate. Reproducible across runs/shards, no RNG, no
    coordination — every worker filters its rows locally."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        hv = batch["doc_id"].map(
            lambda d: int(hashlib.md5(f"strat:{d}".encode()).hexdigest()[0], 16)
        )
        rate = batch["lang"].map(lambda l: STRATA_RATES.get(l, STRATA_DEFAULT))
        keep = hv < rate
        return batch.loc[keep, ["doc_id", "lang"]]

    return _docs(sf_dir, columns=("doc_id", "lang")).map_batches(
        f, batch_format="pandas"
    )


# PII scrubbing (training-corpus hygiene). The synthetic corpus contains no
# PII, so the op first applies a deterministic augmentation shared with the
# SQL twin (same pattern as the dedup suite's corpus augmentation): every
# doc with doc_id % 5 == 0 gets an email + phone sentence appended — the
# string is built inline in BOTH implementations below; keep them in sync.
PII_SCRUB_SQL = """
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN text || ' contact me at user' || doc_id
                   || '@example.com or call 555-0' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.'
              ELSE text END AS text
  FROM documents
)
SELECT doc_id,
       regexp_replace(
         regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}',
                        '[EMAIL]', 'g'),
         '[0-9]{3}-[0-9]{4,}', '[PHONE]', 'g') AS scrubbed,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(text, '[0-9]{3}-[0-9]{4,}')) AS BIGINT) AS n_phones
FROM aug
"""

_EMAIL_RE = None
_PHONE_RE = None


def _pii_patterns():
    global _EMAIL_RE, _PHONE_RE
    if _EMAIL_RE is None:
        import re

        _EMAIL_RE = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}")
        _PHONE_RE = re.compile(r"[0-9]{3}-[0-9]{4,}")
    return _EMAIL_RE, _PHONE_RE


def pii_scrub(sf_dir: str) -> ray.data.Dataset:
    """Deterministic PII scrubbing: emails → [EMAIL], phone-shaped digit
    runs → [PHONE], plus per-doc match counts. Stateless vectorized
    map_batches with compiled patterns (module-level, compiled once per
    worker process); at 100 TB this streams — nothing aggregates."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        email_re, phone_re = _pii_patterns()
        text = batch["text"].where(
            batch["doc_id"] % 5 != 0,
            batch["text"]
            + " contact me at user"
            + batch["doc_id"].astype(str)
            + "@example.com or call 555-0"
            + (batch["doc_id"] % 10000).astype(str).str.zfill(4)
            + ".",
        )
        n_emails = text.str.count(email_re.pattern).astype("int64")
        scrub1 = text.str.replace(email_re.pattern, "[EMAIL]", regex=True)
        n_phones = text.str.count(phone_re.pattern).astype("int64")
        scrubbed = scrub1.str.replace(phone_re.pattern, "[PHONE]", regex=True)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "scrubbed": scrubbed,
                "n_emails": n_emails,
                "n_phones": n_phones,
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pandas")


# Gopher-style within-document repetition signal: the share of 3-gram
# instances that are repeats (1 - distinct/total). High values flag
# boilerplate/spam for quality filtering.
REPETITION_SCORE_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
g AS (
  SELECT doc_id,
         CAST(len(words) - 2 AS BIGINT) AS total_g,
         CAST(len(list_distinct(list_transform(
             generate_series(1, len(words) - 2),
             i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]
         ))) AS BIGINT) AS distinct_g
  FROM w WHERE len(words) >= 3
)
SELECT doc_id, total_g, distinct_g,
       CAST(floor((total_g - distinct_g) * 1000000.0 / total_g + 0.5) AS BIGINT)
         AS rep_micro
FROM g
"""


def repetition_score(sf_dir: str) -> ray.data.Dataset:
    """Per-doc 3-gram repetition ratio ×1e6 (docs with <3 tokens dropped,
    mirroring the SQL twin). Stateless map_batches; the 3-gram sets are
    per-document, so no shuffle exists at any scale."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        out_d, out_t, out_u = [], [], []
        for d, text in zip(batch["doc_id"], batch["text"]):
            words = text.split(" ")
            n = len(words) - 2
            if n < 1:
                continue
            grams = {" ".join(words[i : i + 3]) for i in range(n)}
            out_d.append(d)
            out_t.append(n)
            out_u.append(len(grams))
        total = pd.Series(out_t, dtype="int64")
        distinct = pd.Series(out_u, dtype="int64")
        return pd.DataFrame(
            {
                "doc_id": pd.Series(out_d, dtype="int64"),
                "total_g": total,
                "distinct_g": distinct,
                "rep_micro": np.floor(
                    (total - distinct) * 1_000_000.0 / total + 0.5
                ).astype("int64"),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pandas")


# Benchmark decontamination: flag training docs sharing any 4-gram with the
# held-out eval set (here: docs with doc_id % 97 == 0 stand in for the
# benchmark). The eval side of a decontamination pass is inherently small
# (real benchmark suites are MBs), so this is the canonical broadcast
# pattern: ray.put the eval n-gram set once, probe it per batch — no join,
# no shuffle, the corpus side streams.
DECON_K = 4
DECON_SQL = """
WITH ev AS (SELECT text FROM documents WHERE doc_id % 97 = 0),
eg AS (
  SELECT DISTINCT array_to_string(words[i : i+3], ' ') AS gram
  FROM (SELECT string_split(text, ' ') AS words FROM ev),
       LATERAL (SELECT UNNEST(generate_series(1, len(words)-3)) AS i)
),
dg AS (
  SELECT DISTINCT doc_id, array_to_string(words[i : i+3], ' ') AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS words
        FROM documents WHERE doc_id % 97 <> 0),
       LATERAL (SELECT UNNEST(generate_series(1, len(words)-3)) AS i)
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM dg JOIN eg USING (gram)
GROUP BY doc_id
"""


DECON_EVAL_MAX_BYTES = 256 * 1024 * 1024


def _eval_gram_set(ev: ray.data.Dataset, max_bytes: int) -> set:
    """Build the eval 4-gram probe set by STREAMING the eval side through
    the driver (iter_batches — the texts are never held whole), with a
    hard byte budget: the probe set is broadcast to every task, so an eval
    side that outgrows a worker's heap must fail loudly here, not OOM the
    cluster later (VERDICT r03 #2/#7)."""
    grams: set = set()
    total = 0
    for b in ev.iter_batches(batch_format="pandas", batch_size=1024):
        total += int(b["text"].str.len().sum())
        if total > max_bytes:
            raise ValueError(
                f"decontaminate eval side exceeds {max_bytes} bytes of text; "
                "the probe gram set is broadcast to every task. Point "
                "eval_path at the actual benchmark suite (MBs) or raise "
                "max_eval_bytes explicitly."
            )
        for txt in b["text"]:
            w = txt.split(" ")
            grams |= {
                " ".join(w[i : i + DECON_K]) for i in range(len(w) - DECON_K + 1)
            }
    return grams


def decontaminate(
    sf_dir: str,
    eval_path: str | None = None,
    *,
    max_eval_bytes: int = DECON_EVAL_MAX_BYTES,
) -> ray.data.Dataset:
    """(doc_id, n_hits) for every training doc sharing ≥1 distinct 4-gram
    with the eval set — n_hits = number of DISTINCT shared 4-grams.

    eval_path: parquet file/dir with a ``text`` column holding the held-out
    benchmark — the real deployment shape (benchmark suites are MBs, read
    from their own small file). When None, the stand-in eval set is carved
    from the corpus itself (doc_id % 97 == 0, mirrored in DECON_SQL). BOTH
    paths stream through the same budgeted probe-set builder
    (_eval_gram_set), so the stand-in can never silently pull an unbounded
    corpus slice to the driver."""
    import ray

    if eval_path is not None:
        ev = ray.data.read_parquet(eval_path, columns=["text"])
    else:
        # stand-in: eval rows filtered distributedly; only the (budgeted)
        # eval side streams through the driver
        ev = _docs(sf_dir).map_batches(
            lambda b: b[b["doc_id"] % 97 == 0], batch_format="pandas"
        )
    ref = ray.put(_eval_gram_set(ev, max_eval_bytes))

    exclude_standin_eval = eval_path is None

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        grams_ref = ray.get(ref)
        out_d, out_n = [], []
        for d, txt in zip(batch["doc_id"], batch["text"]):
            if exclude_standin_eval and d % 97 == 0:
                continue
            w = txt.split(" ")
            hits = {
                g
                for i in range(len(w) - DECON_K + 1)
                if (g := " ".join(w[i : i + DECON_K])) in grams_ref
            }
            if hits:
                out_d.append(d)
                out_n.append(len(hits))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(out_d, dtype="int64"),
                "n_hits": pd.Series(out_n, dtype="int64"),
            }
        )

    return _docs(sf_dir).map_batches(probe, batch_format="pandas")


# --- HyperLogLog register sketch ---------------------------------------------
#
# Distributed approximate-distinct over the token domain. The deliverable is
# the REGISTER TABLE (the mergeable sketch itself — what a 100-TB pipeline
# ships between stages and unions across corpora), not the scalar estimate:
# registers are integers and bit-exact across engines, while the estimate's
# harmonic mean depends on float summation order. ``hll_estimate`` derives
# the scalar from the registers on the driver (4096 rows — trivially small).
#
# Scale shape: per-batch distinct→hash→per-register max is a combiner (each
# batch emits ≤ m rows no matter its size), so the one shuffle carries
# ≤ batches × m partial rows into a fixed-size bucketed max. Register math
# is integer-only: bit length via frexp on exact <2^53 floats (numpy) and
# via shift-smear + bit_count (SQL) — float log2 mis-floors near powers of
# two, so neither side uses it.
HLL_P = 12
HLL_M = 1 << HLL_P  # 4096 registers, relative error ≈ 1.04/√m ≈ 1.6%

HLL_TOKENS_SQL = """
WITH toks AS (
  SELECT DISTINCT tok FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
),
r AS (
  SELECT CAST(md5_number_upper(tok) >> 52 AS BIGINT) AS register,
         md5_number_upper(tok) & ((CAST(1 AS UBIGINT) << 52) - 1) AS rem
  FROM toks
),
-- iterative bit-smear (each step shifts the PREVIOUS result — a single OR
-- of shifts of the original value misses bits), then popcount = bit length
s1 AS (SELECT register, rem | (rem >> 1) AS x FROM r),
s2 AS (SELECT register, x | (x >> 2) AS x FROM s1),
s3 AS (SELECT register, x | (x >> 4) AS x FROM s2),
s4 AS (SELECT register, x | (x >> 8) AS x FROM s3),
s5 AS (SELECT register, x | (x >> 16) AS x FROM s4),
s6 AS (SELECT register, x | (x >> 32) AS x FROM s5)
SELECT register, CAST(53 - MIN(bit_count(x)) AS BIGINT) AS rho
FROM s6 GROUP BY register
"""


def hll_tokens(sf_dir: str, *, docs: "ray.data.Dataset | None" = None) -> ray.data.Dataset:
    """HyperLogLog register sketch (p=12) of the corpus's distinct tokens:
    (register, rho) rows, register = top 12 bits of the token's 64-bit md5
    fold, rho = 1 + leading-zero count of the remaining 52 bits (53 when
    they are all zero), maxed per register across the corpus.

    ``docs`` overrides the document source (hll_union sketches each half
    of the corpus independently through this seam)."""
    from .dedup import _md5_64_memo
    from .shuffle import bucketed_group_agg

    mask52 = np.uint64((1 << 52) - 1)

    def partial(batch: pa.Table) -> pd.DataFrame:
        toks = pc.list_flatten(pc.split_pattern(batch["text"], " "))
        uniq = np.unique(np.asarray(toks, dtype=object))
        if len(uniq) == 0:
            return pd.DataFrame(
                {
                    "register": pd.Series(dtype="int64"),
                    "rho": pd.Series(dtype="int64"),
                }
            )
        h = np.fromiter(
            (_md5_64_memo(t) for t in uniq), dtype=np.uint64, count=len(uniq)
        )
        reg = (h >> np.uint64(52)).astype("int64")
        rem = h & mask52
        # bit length: float64 conversion is exact below 2^53, so frexp's
        # exponent IS the bit length (0 for rem == 0)
        bitlen = np.frexp(rem.astype("float64"))[1].astype("int64")
        rho = 53 - bitlen
        out = pd.DataFrame({"register": reg, "rho": rho})
        return out.groupby("register", as_index=False)["rho"].max()

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("register", as_index=False)["rho"].max()
        return out.astype({"register": "int64", "rho": "int64"})

    src = docs if docs is not None else _docs(sf_dir)
    ds = src.map_batches(partial, batch_format="pyarrow")
    # the key domain is fixed (m=4096) — a small fixed bucket count keeps
    # per-bucket frames at batches × m/64 rows regardless of corpus size
    return bucketed_group_agg(ds, ["register"], merge, num_buckets=64)


def hll_estimate(registers: pd.DataFrame, p: int = HLL_P) -> float:
    """Standard bias-corrected HLL estimate from a (register, rho) table
    (absent registers are zeros). Driver-side: m rows, never distributed."""
    m = 1 << p
    rho = np.zeros(m, dtype="int64")
    rho[registers["register"].to_numpy()] = registers["rho"].to_numpy()
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-rho.astype("float64")))
    zeros = int((rho == 0).sum())
    if est <= 2.5 * m and zeros:
        return float(m * np.log(m / zeros))  # linear counting, small range
    return float(est)


# --- Count-Min sketch --------------------------------------------------------
#
# The additive companion to the HLL sketch: a d × w counter grid estimating
# token OCCURRENCE counts (point queries, heavy-hitter screening) that
# merges across corpora by plain cell-wise addition. Counters are exact
# integers, so the register table is bit-identical across engines — the
# sketch itself is the deliverable, ``cms_estimate`` answers point queries
# driver-side (min over the d hashed cells; classic one-sided overestimate).
#
# Scale shape: per-batch token value_counts → at most d × w partial rows per
# batch regardless of batch size (the combiner), one bucketed integer-sum
# merge. Same fixed-key-domain argument as hll_tokens.
CMS_D = 4
CMS_W = 1024

CMS_TOKENS_SQL = f"""
WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
cnt AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
h AS (
  SELECT r.r AS sketch_row,
         CAST(md5_number_upper(cnt.tok || ':cms' || r.r) % {CMS_W} AS BIGINT) AS col,
         cnt.c
  FROM cnt, (SELECT UNNEST(generate_series(0, {CMS_D - 1})) AS r) r
)
SELECT sketch_row, col, CAST(SUM(c) AS BIGINT) AS total
FROM h GROUP BY sketch_row, col
"""


def cms_tokens(sf_dir: str, *, docs: "ray.data.Dataset | None" = None) -> ray.data.Dataset:
    """Count-Min sketch (d=4, w=1024) of token occurrence counts:
    (sketch_row, col, total) cells, col = md5-fold of token salted with the
    row index, totals summed over the corpus. ``docs`` overrides the
    document source (cms_union's per-half sketches)."""
    from .dedup import _md5_64_memo
    from .shuffle import bucketed_group_agg

    w = np.uint64(CMS_W)

    def partial(batch: pa.Table) -> pd.DataFrame:
        toks = pc.list_flatten(pc.split_pattern(batch["text"], " "))
        uniq, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        if len(uniq) == 0:
            return pd.DataFrame(
                {
                    "sketch_row": pd.Series(dtype="int64"),
                    "col": pd.Series(dtype="int64"),
                    "total": pd.Series(dtype="int64"),
                }
            )
        outs = []
        for r in range(CMS_D):
            salt = f":cms{r}"
            cols = (
                np.fromiter(
                    (_md5_64_memo(t + salt) for t in uniq),
                    dtype=np.uint64,
                    count=len(uniq),
                )
                % w
            ).astype("int64")
            part = pd.DataFrame(
                {"sketch_row": np.int64(r), "col": cols, "total": counts}
            )
            outs.append(part.groupby(["sketch_row", "col"], as_index=False).sum())
        return pd.concat(outs, ignore_index=True)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["sketch_row", "col"], as_index=False)["total"].sum()
        return out.astype({"sketch_row": "int64", "col": "int64", "total": "int64"})

    src = docs if docs is not None else _docs(sf_dir)
    ds = src.map_batches(partial, batch_format="pyarrow")
    return bucketed_group_agg(ds, ["sketch_row", "col"], merge, num_buckets=64)


def cms_estimate(sketch: pd.DataFrame, token: str) -> int:
    """Point-frequency estimate: min over the d hashed cells (absent cell →
    0). One-sided: never underestimates the true count."""
    from .dedup import _md5_64

    cells = sketch.set_index(["sketch_row", "col"])["total"]
    est = []
    for r in range(CMS_D):
        col = int(_md5_64(token + f":cms{r}") % CMS_W)
        est.append(int(cells.get((r, col), 0)))
    return min(est)


# --- regex (BPE-ish) token counting ------------------------------------------
#
# Character-class tokenization under a regex both engines interpret
# identically: alpha runs, digit runs, and single non-alnum symbols (the
# GPT-2-style pre-tokenizer family, minus unicode categories RE2 and
# Python disagree on — the class [^A-Za-z0-9 ] treats every non-ASCII
# char, tab and newline as one symbol token in BOTH engines, so there is
# no \s/unicode divergence to paper over).
RE_ALPHA = r"[A-Za-z]+"
RE_NUM = r"[0-9]+"
RE_SYM = r"[^A-Za-z0-9 ]"

REGEX_TOKEN_COUNT_SQL = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{RE_ALPHA}')) AS BIGINT) AS n_alpha,
       CAST(len(regexp_extract_all(text, '{RE_NUM}')) AS BIGINT) AS n_num,
       CAST(len(regexp_extract_all(text, '{RE_SYM}')) AS BIGINT) AS n_sym,
       n_alpha + n_num + n_sym AS n_bpe_tokens
FROM documents
"""


def regex_token_count(sf_dir: str) -> ray.data.Dataset:
    """BPE-ish token counts per document: alpha-run, digit-run and symbol
    tokens plus their total (what a byte-level BPE's pre-tokenizer would
    feed the merge table). Vectorized pandas .str.count per class —
    stateless streaming scan, no shuffle."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch["text"]
        n_alpha = t.str.count(RE_ALPHA).astype("int64")
        n_num = t.str.count(RE_NUM).astype("int64")
        n_sym = t.str.count(RE_SYM).astype("int64")
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_alpha": n_alpha,
                "n_num": n_num,
                "n_sym": n_sym,
                "n_bpe_tokens": n_alpha + n_num + n_sym,
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pandas")


# --- rolling-window fingerprint ----------------------------------------------
#
# Winnowing-style content fingerprint: the MIN 64-bit hash over 32-char
# windows sampled every 8 chars. Unlike the whole-doc md5 (``fingerprint``),
# the rolling fingerprint is stable under small appends/prepends whenever
# the minimal window survives — the property plagiarism/near-dup screens
# use. md5 per window is the SQL-reachable hash (a production impl would
# use a true O(1)-slide Karp-Rabin; the sampling stride bounds cost here).
# Emitted as a decimal string: the value is uint64 and DuckDB UBIGINT →
# pandas dtype conversion is lossy for BIGINT-range comparisons.
RFP_WINDOW = 32
RFP_STRIDE = 8

ROLLING_FINGERPRINT_SQL = f"""
WITH w AS (
  SELECT doc_id,
         CASE WHEN length(text) < {RFP_WINDOW} THEN [text]
              ELSE list_transform(
                     generate_series(1, length(text) - {RFP_WINDOW - 1}, {RFP_STRIDE}),
                     i -> substr(text, i, {RFP_WINDOW}))
         END AS wins
  FROM documents
)
SELECT doc_id, CAST(MIN(md5_number_upper(win)) AS VARCHAR) AS rfp
FROM (SELECT doc_id, UNNEST(wins) AS win FROM w)
GROUP BY doc_id
"""


def rolling_fingerprint(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, rfp): min 64-bit md5 fold over sampled 32-char windows
    (whole text when shorter), as a decimal string."""
    from .dedup import _md5_64

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        rfps = []
        for t in batch["text"]:
            if len(t) < RFP_WINDOW:
                rfps.append(str(_md5_64(t)))
                continue
            m = min(
                _md5_64(t[i : i + RFP_WINDOW])
                for i in range(0, len(t) - RFP_WINDOW + 1, RFP_STRIDE)
            )
            rfps.append(str(m))
        return pd.DataFrame({"doc_id": batch["doc_id"], "rfp": rfps})

    return _docs(sf_dir).map_batches(f, batch_format="pandas")


# --- winnowing fingerprint set -------------------------------------------------
#
# Schleimer/Wilkerson/Aiken winnowing (MOSS, SIGMOD'03): hash EVERY k-gram
# (stride 1 — the guarantee REQUIRES it: any sampling stride desynchronizes
# the k-gram phase between two copies of the same substring, so copies stop
# sharing hashes at all), slide a window of W consecutive hashes, keep the
# window MINIMUM — the selected set is guaranteed to share a fingerprint
# with any copy of a substring of >= W+K-1 characters, which single
# whole-doc min hashes (``rolling_fingerprint``) are not. Warm-up windows
# (fewer than W hashes) take the min of what exists, identically on both
# engines. Output is the DISTINCT (doc_id, fp) set.
WINNOW_K = 16  # k-gram length in characters
WINNOW_W = 8  # window: min over 8 consecutive k-gram hashes (guarantee t = 23)

WINNOW_FINGERPRINTS_SQL = f"""
WITH p AS (
  SELECT doc_id, text,
         UNNEST(generate_series(1, GREATEST(length(text) - {WINNOW_K - 1}, 1)))
           AS i
  FROM documents
),
g AS (
  SELECT doc_id, i,
         md5_number_upper(substr(text, CAST(i AS INTEGER), {WINNOW_K})) AS h
  FROM p
),
m AS (
  SELECT doc_id,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN {WINNOW_W - 1} PRECEDING AND CURRENT ROW) AS fp
  FROM g
)
SELECT DISTINCT doc_id, CAST(fp AS VARCHAR) AS fp FROM m
"""


def winnow_fingerprints(sf_dir: str) -> ray.data.Dataset:
    """Per-document winnowing fingerprint set (distinct window-min 64-bit
    k-gram hashes, decimal strings) — the MOSS plagiarism-screen selection
    rule, the published robust alternative to a single whole-doc min.

    Scale shape: a document is one input row, so this is a pure stateless
    ``map_batches`` — NO shuffle anywhere; winnowing's own density bound
    caps the output at ~2·n_chars/(w+1) fingerprints per doc. The sliding
    min runs vectorized on uint64 (front-padded sliding_window_view; pandas
    rolling would round-trip through float64 and corrupt 64-bit hashes).
    Per-position md5 is the portable-oracle hash (the pairing
    ``_md5_64``/``md5_number_upper`` is already proven by
    rolling_fingerprint); a production deployment would swap a Karp-Rabin
    rolling hash into the SAME window-min machinery for the byte-rate-bound
    hot path."""
    from .dedup import _md5_64

    u64max = np.uint64(np.iinfo(np.uint64).max)

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        ids: list[int] = []
        fps: list[str] = []
        for d, t in zip(batch["doc_id"], batch["text"]):
            n = len(t)
            last = max(n - WINNOW_K + 1, 1)
            hs = np.fromiter(
                (_md5_64(t[i : i + WINNOW_K]) for i in range(last)),
                dtype=np.uint64,
                count=last,
            )
            pad = np.concatenate([np.full(WINNOW_W - 1, u64max, dtype=np.uint64), hs])
            mins = np.lib.stride_tricks.sliding_window_view(pad, WINNOW_W).min(axis=1)
            uniq = np.unique(mins)
            ids.extend([int(d)] * len(uniq))
            fps.extend(str(int(v)) for v in uniq)
        return pd.DataFrame(
            {"doc_id": pd.array(ids, dtype="int64"), "fp": pd.array(fps, dtype=str)}
        )

    return _docs(sf_dir).map_batches(f, batch_format="pandas")


# --- Bloom filter --------------------------------------------------------------
#
# Membership companion to the HLL (cardinality) and CMS (frequency)
# sketches: a 2^15-bit array over the distinct-token domain, emitted as
# (word, bits) uint64 rows — OR-mergeable across corpora and bit-exact
# across engines. ``bloom_contains`` answers membership with no false
# negatives (the decontamination screen shape: test a candidate's tokens
# against a reference corpus's filter without shipping the corpus).
# DuckDB's UBIGINT << overflow-checks at bit 63, so the twin shifts in
# HUGEINT and casts back; bits travel as decimal VARCHAR on both sides
# (the proven uint64-column comparison route, see rolling_fingerprint).
BLOOM_K = 4
BLOOM_BITS = 1 << 15  # 32768 bits = 512 words

BLOOM_TOKENS_SQL = f"""
WITH toks AS (
  SELECT DISTINCT tok FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
),
pos AS (
  SELECT CAST(md5_number_upper(tok || ':bf' || r.r) % {BLOOM_BITS} AS BIGINT) AS p
  FROM toks, (SELECT UNNEST(generate_series(0, {BLOOM_K - 1})) AS r) r
),
w AS (SELECT p >> 6 AS word, CAST(CAST(1 AS HUGEINT) << (p & 63) AS UBIGINT) AS b FROM pos)
SELECT CAST(word AS BIGINT) AS word, CAST(bit_or(b) AS VARCHAR) AS bits
FROM w GROUP BY word
"""


def bloom_tokens(sf_dir: str, *, docs: "ray.data.Dataset | None" = None) -> ray.data.Dataset:
    """Bloom filter (k=4, m=2^15 bits) over the corpus's distinct tokens:
    (word, bits) rows, word = bit-position >> 6, bits = OR of the set
    bits in that 64-bit word (decimal string). ``docs`` overrides the
    document source (bloom_union's per-half sketches)."""
    from .dedup import _md5_64_memo
    from .shuffle import bucketed_group_agg

    m = np.uint64(BLOOM_BITS)

    def partial(batch: pa.Table) -> pd.DataFrame:
        toks = pc.list_flatten(pc.split_pattern(batch["text"], " "))
        uniq = np.unique(np.asarray(toks, dtype=object))
        if len(uniq) == 0:
            return pd.DataFrame(
                {
                    "word": pd.Series(dtype="int64"),
                    "bits": pd.Series(dtype="uint64"),
                }
            )
        outs = []
        for r in range(BLOOM_K):
            salt = f":bf{r}"
            p = (
                np.fromiter(
                    (_md5_64_memo(t + salt) for t in uniq),
                    dtype=np.uint64,
                    count=len(uniq),
                )
                % m
            )
            outs.append(
                pd.DataFrame(
                    {
                        "word": (p >> np.uint64(6)).astype("int64"),
                        "bits": np.uint64(1) << (p & np.uint64(63)),
                    }
                )
            )
        part = pd.concat(outs, ignore_index=True)
        return part.groupby("word", as_index=False)["bits"].agg(
            np.bitwise_or.reduce
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("word", as_index=False)["bits"].agg(np.bitwise_or.reduce)
        return pd.DataFrame(
            {
                "word": out["word"].astype("int64"),
                "bits": out["bits"].map(str),
            }
        )

    src = docs if docs is not None else _docs(sf_dir)
    ds = src.map_batches(partial, batch_format="pyarrow")
    return bucketed_group_agg(ds, ["word"], merge, num_buckets=64)


def bloom_contains(sketch: pd.DataFrame, token: str) -> bool:
    """Membership probe: True iff every one of the k hashed bits is set
    (no false negatives; false positives at the standard Bloom rate)."""
    from .dedup import _md5_64

    words = {
        int(w): int(b) for w, b in zip(sketch["word"], sketch["bits"])
    }
    for r in range(BLOOM_K):
        p = _md5_64(token + f":bf{r}") % BLOOM_BITS
        if not (words.get(p >> 6, 0) >> (p & 63)) & 1:
            return False
    return True


# --- distributed sketch unions -------------------------------------------------
#
# The shape a 100-TB pipeline actually ships (VERDICT r03 #6): each corpus
# shard builds its sketch INDEPENDENTLY (no cross-shard shuffle of raw
# tokens), and the tiny fixed-size sketch tables are what travels — merged
# by the sketch's own monoid (HLL register max, CMS cell add, Bloom word
# OR). Here the two "shards" are the doc_id-parity halves of the corpus;
# the oracle is the WHOLE-corpus sketch SQL, so each green row proves the
# defining property union(sketch(A), sketch(B)) == sketch(A ∪ B) exactly,
# not approximately.


def _docs_half(sf_dir: str, parity: int) -> ray.data.Dataset:
    """One parity half of the documents table. The parity predicate can't
    prune row groups (both parities live everywhere), so it runs as a
    vectorized Arrow filter right after the pruned column read."""

    def keep(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch["doc_id"], pa.int64())
        return batch.filter(
            pc.equal(pc.bit_wise_and(ids, pa.scalar(1, pa.int64())), parity)
        )

    return _docs(sf_dir).map_batches(keep, batch_format="pyarrow")


def hll_union(sf_dir: str) -> ray.data.Dataset:
    """Union of two independently-built half-corpus HLL sketches via
    per-register MAX — bit-identical to sketching the whole corpus."""
    from .shuffle import bucketed_group_agg

    halves = hll_tokens(sf_dir, docs=_docs_half(sf_dir, 0)).union(
        hll_tokens(sf_dir, docs=_docs_half(sf_dir, 1))
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("register", as_index=False)["rho"].max()
        return out.astype({"register": "int64", "rho": "int64"})

    return bucketed_group_agg(halves, ["register"], merge, num_buckets=16)


def cms_union(sf_dir: str) -> ray.data.Dataset:
    """Union of two independently-built half-corpus Count-Min sketches via
    cell-wise ADD — integer-exact vs the whole-corpus sketch."""
    from .shuffle import bucketed_group_agg

    halves = cms_tokens(sf_dir, docs=_docs_half(sf_dir, 0)).union(
        cms_tokens(sf_dir, docs=_docs_half(sf_dir, 1))
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["sketch_row", "col"], as_index=False)["total"].sum()
        return out.astype({"sketch_row": "int64", "col": "int64", "total": "int64"})

    return bucketed_group_agg(halves, ["sketch_row", "col"], merge, num_buckets=16)


def bloom_union(sf_dir: str) -> ray.data.Dataset:
    """Union of two independently-built half-corpus Bloom filters via
    per-word bit OR — bit-identical to the whole-corpus filter. The half
    sketches carry bits as decimal strings (the engine-portable uint64
    route); the merge parses, ORs, and re-emits the same encoding."""
    from .shuffle import bucketed_group_agg

    halves = bloom_tokens(sf_dir, docs=_docs_half(sf_dir, 0)).union(
        bloom_tokens(sf_dir, docs=_docs_half(sf_dir, 1))
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        vals = g.assign(b=g["bits"].map(lambda s: np.uint64(int(s))))
        out = vals.groupby("word", as_index=False)["b"].agg(np.bitwise_or.reduce)
        return pd.DataFrame(
            {"word": out["word"].astype("int64"), "bits": out["b"].map(str)}
        )

    return bucketed_group_agg(halves, ["word"], merge, num_buckets=16)


# ---------------------------------------------------------------------------
# group_sample: deterministic fixed-count sample per group
# ---------------------------------------------------------------------------

GROUP_SAMPLE_N = 20

GROUP_SAMPLE_SQL = """
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
SELECT doc_id, source FROM r WHERE rn <= 20
"""


def group_sample(sf_dir: str, *, n: int = GROUP_SAMPLE_N) -> ray.data.Dataset:
    """Exactly-n docs per source, chosen by md5(doc_id) order — the
    deterministic stand-in for per-group reservoir sampling (reproducible
    across runs, engines and shard layouts; no RNG state to coordinate).
    Complements stratified_sample (rate-based keep) and grouped_topk
    (value-ordered): here the count is FIXED per group and the order is a
    hash, i.e. a uniform-without-replacement draw.

    Combiner shape: each batch keeps only its local top-n per group (the
    hash order makes partial top-n correct — same argument as top-k), so
    the shuffle carries ≤ n × groups rows per batch; one bucketed reduce
    by group finishes. Group cardinality is the only scale knob."""
    from .shuffle import bucketed_group_agg

    def topn(f: pd.DataFrame) -> pd.DataFrame:
        f = f.sort_values(["source", "_h", "doc_id"], kind="stable")
        return f.loc[f.groupby("source").cumcount() < n]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        f = b[["doc_id", "source"]].copy()
        f["_h"] = f["doc_id"].map(
            lambda d: hashlib.md5(str(d).encode()).hexdigest()
        )
        return topn(f)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = topn(g)
        return out[["doc_id", "source"]].astype({"doc_id": "int64"})

    return bucketed_group_agg(
        _docs(sf_dir, columns=("doc_id", "source")).map_batches(
            partial, batch_format="pandas"
        ),
        ["source"], final, num_buckets=8,
    )


# ---------------------------------------------------------------------------
# pmi_bigrams: collocation extraction (top bigrams by pointwise mutual info)
# ---------------------------------------------------------------------------

PMI_TOP_K = 20
# integer-exact PMI surrogate: ppm(a,b) = floor(c_ab * 1e6 * N / (c_a*c_b))
# — a monotone transform of exp(PMI), so the ranking is PMI's ranking, and
# both engines compute it in exact integer arithmetic (HUGEINT / Python
# int) so the oracle never hits a float tie-flip.
PMI_BIGRAMS_SQL = """
WITH w AS (SELECT string_split(text, ' ') AS words FROM documents),
tok AS (SELECT UNNEST(words) AS t FROM w),
uni AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY t),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok),
big AS (
  SELECT words[i+1] AS a, words[i+2] AS b, CAST(count(*) AS BIGINT) AS c_ab
  FROM w, LATERAL (SELECT UNNEST(generate_series(0, len(words)-2)) AS i)
  GROUP BY words[i+1], words[i+2]
),
s AS (
  SELECT big.a || ' ' || big.b AS bigram, c_ab,
         CAST((CAST(c_ab AS HUGEINT) * 1000000 * n.n)
              // (CAST(ua.c AS HUGEINT) * ub.c) AS BIGINT) AS score_ppm
  FROM big
  JOIN uni ua ON ua.t = big.a
  JOIN uni ub ON ub.t = big.b
  CROSS JOIN n
)
SELECT bigram, c_ab, score_ppm,
       CAST(row_number() OVER (ORDER BY score_ppm DESC, bigram) AS BIGINT) AS rank
FROM s
QUALIFY row_number() OVER (ORDER BY score_ppm DESC, bigram) <= 20
"""


def pmi_bigrams(
    sf_dir: str, *, k: int = PMI_TOP_K, broadcast_max_vocab: int = 2_000_000
) -> ray.data.Dataset:
    """Top-k collocations: adjacent word pairs ranked by pointwise mutual
    information — the classic phrase-mining signal (Mikolov-style phrase
    joining, stopword-free keyphrase surfacing).

    Fully distributed, no broadcast of the vocabulary:
      1. per-batch combiners count unigrams and (within-doc) bigrams;
         bucketed reduces produce the exact global count tables — bigram
         TYPE cardinality is bounded by vocab², never corpus size;
      2. c_a / c_b attach to bigram rows via the tag-union pattern (one
         bucketed reduce per side, keyed on the word — the same thin
         shuffle anti_join_ids uses, carrying only int64 counts);
      3. the ppm score is computed per row in exact Python-int arithmetic
         (mirrors the oracle's HUGEINT), each bucket emits its top-k, and
         one tiny final merge ranks buckets×k candidates.
    N (total tokens) is the one scalar reduce — a by-design driver value."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    docs = _docs(sf_dir, columns=("text",))
    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/documents.parquet"))

    def uni_partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch["text"].str.split(" ").explode().value_counts()
        return pd.DataFrame({"t": vc.index, "pc": vc.to_numpy().astype("int64")})

    def uni_reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("t", as_index=False)["pc"].sum()
        return out.rename(columns={"pc": "c"}).astype({"c": "int64"})

    uni = bucketed_group_agg(
        docs.map_batches(uni_partial, batch_format="pandas"),
        ["t"], uni_reduce, num_buckets=nb,
    ).materialize()  # vocab-sized; reused by N, the a-side and the b-side
    n_tokens = int(uni.sum("c"))

    def big_partial(batch: pd.DataFrame) -> pd.DataFrame:
        ws = batch["text"].str.split(" ")
        ex = ws.explode()
        nxt = ex.groupby(level=0).shift(-1)
        mask = nxt.notna()
        f = pd.DataFrame({"a": ex[mask], "b": nxt[mask]})
        out = f.groupby(["a", "b"], as_index=False).size()
        return out.rename(columns={"size": "c_ab"}).astype({"c_ab": "int64"})

    def big_reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["a", "b"], as_index=False)["c_ab"].sum()
        return out.astype({"c_ab": "int64"})

    big = bucketed_group_agg(
        docs.map_batches(big_partial, batch_format="pandas"),
        ["a", "b"], big_reduce, num_buckets=nb,
    )

    def attach(rows_ds, columns: list, count_col: str, key_col: str):
        """Tag-union count attach: unigram rows ride into the same bucket
        as the bigram rows sharing key_col; the per-bucket reduce maps the
        counts on. Both union sides carry IDENTICAL typed columns (count
        rows pad with sentinels) so blocks never schema-diverge."""
        out_cols = columns + [count_col]

        def tag_rows(b: pd.DataFrame) -> pd.DataFrame:
            return b.assign(_cnt=np.int64(-1))[columns + ["_cnt"]]

        def tag_uni(u: pd.DataFrame) -> pd.DataFrame:
            f = pd.DataFrame({key_col: u["t"], "_cnt": u["c"].astype("int64")})
            for c in columns:
                if c == key_col:
                    continue
                f[c] = "" if c in ("a", "b", "bigram") else np.int64(-1)
            return f[columns + ["_cnt"]]

        def reduce(g: pd.DataFrame) -> pd.DataFrame:
            cnt = g.loc[g["_cnt"] >= 0].set_index(key_col)["_cnt"]
            rows = g.loc[g["_cnt"] < 0].drop(columns=["_cnt"])
            rows = rows.assign(**{count_col: rows[key_col].map(cnt).astype("int64")})
            return rows[out_cols]

        return bucketed_group_agg(
            rows_ds.map_batches(tag_rows, batch_format="pandas").union(
                uni.map_batches(tag_uni, batch_format="pandas")
            ),
            [key_col], reduce, num_buckets=nb,
        )

    # size-gated broadcast fast path (join_revenue's pattern): a vocab
    # that fits a worker broadcasts once and both attaches become local
    # maps; past the gate the tag-union shuffle path runs instead
    n_vocab = uni.count()
    if n_vocab <= broadcast_max_vocab:
        vocab = uni.to_pandas()
        ref = ray.put(dict(zip(vocab["t"], vocab["c"].astype("int64"))))

        def attach_both(b: pd.DataFrame) -> pd.DataFrame:
            cnt = ray.get(ref)
            return b.assign(
                c_a=b["a"].map(cnt).astype("int64"),
                c_b=b["b"].map(cnt).astype("int64"),
            )

        big_ab = big.map_batches(attach_both, batch_format="pandas")
    else:
        big_a = attach(big, ["a", "b", "c_ab"], "c_a", "a")
        big_ab = attach(big_a, ["a", "b", "c_ab", "c_a"], "c_b", "b")

    def score_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.dropna(subset=["c_a", "c_b"])
        if g.empty:
            return pd.DataFrame(
                {"bigram": pd.Series(dtype="object"),
                 "c_ab": pd.Series(dtype="int64"),
                 "score_ppm": pd.Series(dtype="int64")}
            )
        # exact integer score (Python int — mirrors the oracle's HUGEINT)
        score = [
            (int(cab) * 1_000_000 * n_tokens) // (int(ca) * int(cb))
            for cab, ca, cb in zip(g["c_ab"], g["c_a"], g["c_b"])
        ]
        f = pd.DataFrame(
            {"bigram": g["a"].astype(str) + " " + g["b"].astype(str),
             "c_ab": g["c_ab"].astype("int64").to_numpy(),
             "score_ppm": pd.array(score, dtype="int64")}
        )
        return f.sort_values(["score_ppm", "bigram"], ascending=[False, True]).head(k)

    cands = big_ab.map_batches(score_topk, batch_format="pandas")

    def final_top(batch: pd.DataFrame) -> pd.DataFrame:
        top = batch.sort_values(
            ["score_ppm", "bigram"], ascending=[False, True]
        ).head(k)
        return pd.DataFrame(
            {"bigram": top["bigram"].to_numpy(),
             "c_ab": top["c_ab"].astype("int64").to_numpy(),
             "score_ppm": top["score_ppm"].astype("int64").to_numpy(),
             "rank": pd.Series(range(1, len(top) + 1), dtype="int64")}
        )

    return cands.repartition(1).map_batches(
        final_top, batch_format="pandas", batch_size=None
    )


# ---------------------------------------------------------------------------
# Lexical diversity features (integer-exact: no float ratio crosses engines)
# ---------------------------------------------------------------------------

LEXICAL_STATS_SQL = """
WITH w AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents
),
c AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS cnt
  FROM w GROUP BY doc_id, token
)
SELECT doc_id,
       CAST(SUM(cnt) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(MAX(cnt) AS BIGINT) AS top_count
FROM c GROUP BY doc_id
"""


def lexical_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-document lexical diversity: token count, distinct-token count,
    and the top token's frequency — the integer ingredients of type-token
    ratio and Gini-style repetition scores (the ratio itself is left to
    the consumer: integers hash identically across engines, float division
    does not). Pure per-doc map — each batch computes its own docs'
    counters with one vectorized pandas explode + groupby; no shuffle."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.split(" ")
        flat = pd.DataFrame(
            {
                "doc_id": batch["doc_id"].repeat(toks.str.len()),
                "token": np.concatenate(toks.to_numpy()),
            }
        )
        c = flat.groupby(["doc_id", "token"], as_index=False, sort=False).size()
        s = c.groupby("doc_id", as_index=False, sort=False).agg(
            n_tokens=("size", "sum"), n_distinct=("size", "size"),
            top_count=("size", "max")
        )
        return s.astype(
            {"doc_id": "int64", "n_tokens": "int64", "n_distinct": "int64",
             "top_count": "int64"}
        )

    return _docs(sf_dir).map_batches(f, batch_format="pandas")


# ---------------------------------------------------------------------------
# Skip-gram pair mining (word2vec training-sample prep)
# ---------------------------------------------------------------------------

SKIPGRAM_WINDOW = 2
SKIPGRAM_TOP_K = 100

SKIPGRAM_PAIRS_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
t AS (
  SELECT doc_id, CAST(i + 1 AS BIGINT) AS pos, words[i+1] AS tok
  FROM w, LATERAL (SELECT UNNEST(generate_series(0, len(words)-1)) AS i)
),
p AS (
  SELECT a.tok AS w1, b.tok AS w2
  FROM t a JOIN t b
    ON a.doc_id = b.doc_id AND abs(a.pos - b.pos) BETWEEN 1 AND {SKIPGRAM_WINDOW}
),
c AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cnt FROM p GROUP BY w1, w2)
SELECT w1, w2, cnt,
       CAST(row_number() OVER (ORDER BY cnt DESC, w1, w2) AS BIGINT) AS rank
FROM c
QUALIFY row_number() OVER (ORDER BY cnt DESC, w1, w2) <= {SKIPGRAM_TOP_K}
"""


def skipgram_pairs(sf_dir: str) -> ray.data.Dataset:
    """Top (center, context) skip-gram pairs within a ±2 window — the
    word2vec training-sample distribution. Pair emission is fully
    vectorized: one flat token array per batch with a parallel doc-index
    array; each offset d produces pairs via two shifted slices masked to
    same-doc positions (both directions), so no per-row Python and no
    position join — the window is resolved locally inside the batch.
    Counting is the heavy-hitter combiner pattern of top_tokens: per-batch
    counts → byte-scaled bucketed reduce → per-bucket top-k → one tiny
    global sort."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        split = batch["text"].str.split(" ")
        lens = split.str.len().to_numpy()
        flat = np.concatenate(split.to_numpy())
        didx = np.repeat(np.arange(len(batch)), lens)
        w1_parts, w2_parts = [], []
        for d in range(1, SKIPGRAM_WINDOW + 1):
            if len(flat) <= d:
                break
            same = didx[:-d] == didx[d:]
            l, r = flat[:-d][same], flat[d:][same]
            w1_parts += [l, r]
            w2_parts += [r, l]
        if not w1_parts:
            return pd.DataFrame({"w1": [], "w2": [], "pc": pd.Series([], dtype="int64")})
        f = pd.DataFrame({"w1": np.concatenate(w1_parts), "w2": np.concatenate(w2_parts)})
        c = f.groupby(["w1", "w2"], as_index=False, sort=False).size()
        return c.rename(columns={"size": "pc"}).astype({"pc": "int64"})

    def per_bucket_top(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["w1", "w2"], as_index=False).agg(cnt=("pc", "sum"))
        out["cnt"] = out["cnt"].astype("int64")
        return out.sort_values(["cnt", "w1", "w2"],
                               ascending=[False, True, True]).head(SKIPGRAM_TOP_K)

    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/documents.parquet"))
    cands = bucketed_group_agg(
        _docs(sf_dir, columns=("text",)).map_batches(partial, batch_format="pandas"),
        ["w1", "w2"], per_bucket_top, num_buckets=nb,
    )

    def final_top(batch: pd.DataFrame) -> pd.DataFrame:
        top = batch.sort_values(["cnt", "w1", "w2"],
                                ascending=[False, True, True]).head(SKIPGRAM_TOP_K)
        return pd.DataFrame(
            {
                "w1": top["w1"].to_numpy(),
                "w2": top["w2"].to_numpy(),
                "cnt": top["cnt"].astype("int64").to_numpy(),
                "rank": pd.Series(range(1, len(top) + 1), dtype="int64"),
            }
        )

    return cands.repartition(1).map_batches(final_top, batch_format="pandas")


# --- sketch composition: CMS point estimates for the exact heavy hitters -----

CMS_TOPK_ESTIMATE_SQL = f"""
WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
cnt AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
top AS (
  SELECT tok, CAST(c AS BIGINT) AS cnt,
         CAST(row_number() OVER (ORDER BY c DESC, tok) AS BIGINT) AS rank
  FROM cnt
  QUALIFY row_number() OVER (ORDER BY c DESC, tok) <= 20
),
sk AS (
  SELECT r.r AS sketch_row,
         CAST(md5_number_upper(cnt.tok || ':cms' || r.r) % {CMS_W} AS BIGINT) AS col,
         CAST(SUM(cnt.c) AS BIGINT) AS total
  FROM cnt, (SELECT UNNEST(generate_series(0, {CMS_D - 1})) AS r) r
  GROUP BY r.r, md5_number_upper(cnt.tok || ':cms' || r.r) % {CMS_W}
)
SELECT t.tok AS token, t.cnt, t.rank,
       CAST(MIN(sk.total) AS BIGINT) AS cms_est
FROM top t
CROSS JOIN (SELECT UNNEST(generate_series(0, {CMS_D - 1})) AS r) rr
JOIN sk ON sk.sketch_row = rr.r
       AND sk.col = md5_number_upper(t.tok || ':cms' || rr.r) % {CMS_W}
GROUP BY t.tok, t.cnt, t.rank
"""


def cms_topk_estimate(sf_dir: str) -> ray.data.Dataset:
    """Sketch composition: the exact top-20 tokens annotated with their
    Count-Min point estimates — the screening query a 100-TB pipeline
    answers FROM THE SKETCH instead of re-scanning the corpus (here both
    sides run so the one-sided guarantee est ≥ true is itself oracle-
    checked). Both inputs are finished aggregates (20 heavy hitters, a
    4×{CMS_W}-cell grid), so the composition is driver-side by design —
    no corpus pass happens in this op beyond the two underlying queries."""
    top = top_tokens(sf_dir).to_pandas()
    sketch = cms_tokens(sf_dir).to_pandas()
    est = [cms_estimate(sketch, t) for t in top["token"]]
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "token": top["token"],
                "cnt": top["cnt"].astype("int64"),
                "rank": top["rank"].astype("int64"),
                "cms_est": pd.Series(est, dtype="int64"),
            }
        )
    )


# --- grouped heavy hitters: top tokens per language ---------------------------

TOP_TOKENS_PER_LANG_K = 5

TOP_TOKENS_PER_LANG_SQL = f"""
WITH w AS (
  SELECT lang, UNNEST(string_split(text, ' ')) AS token FROM documents
),
c AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS cnt FROM w GROUP BY lang, token)
SELECT lang, token, cnt,
       CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS BIGINT)
         AS rank
FROM c
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token) <= {TOP_TOKENS_PER_LANG_K}
"""


def top_tokens_per_lang(sf_dir: str) -> ray.data.Dataset:
    """Per-language top-5 tokens — grouped heavy hitters over an
    UNBOUNDED key domain ((lang, token) cardinality is corpus-scale,
    unlike grouped_topk's per-customer orders). Combiner → byte-scaled
    bucketed (lang, token) count reduce with a per-bucket per-lang top-k
    cut — a bucket holds complete (lang, token) groups, so its local
    top-k per lang is a superset-safe candidate set — then one tiny
    global re-rank over buckets × langs × k rows."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.split(" ")
        flat = pd.DataFrame(
            {
                "lang": batch["lang"].repeat(toks.str.len()),
                "token": np.concatenate(toks.to_numpy()),
            }
        )
        c = flat.groupby(["lang", "token"], as_index=False, sort=False).size()
        return c.rename(columns={"size": "pc"}).astype({"pc": "int64"})

    def per_bucket_top(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["lang", "token"], as_index=False).agg(cnt=("pc", "sum"))
        out["cnt"] = out["cnt"].astype("int64")
        out = out.sort_values(["lang", "cnt", "token"],
                              ascending=[True, False, True])
        return out.groupby("lang", as_index=False, group_keys=False).head(
            TOP_TOKENS_PER_LANG_K
        )

    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/documents.parquet"))
    cands = bucketed_group_agg(
        _docs(sf_dir, columns=("doc_id", "text", "lang")).map_batches(
            partial, batch_format="pandas"
        ),
        ["lang", "token"], per_bucket_top, num_buckets=nb,
    )

    def final_top(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch.sort_values(["lang", "cnt", "token"],
                              ascending=[True, False, True])
        s = s.groupby("lang", as_index=False, group_keys=False).head(
            TOP_TOKENS_PER_LANG_K
        )
        s = s.reset_index(drop=True)
        s["rank"] = s.groupby("lang").cumcount().astype("int64") + 1
        return s[["lang", "token", "cnt", "rank"]]

    return cands.repartition(1).map_batches(final_top, batch_format="pandas")


# --- grouped mergeable sketch: HLL registers per source ------------------------

HLL_BY_SOURCE_SQL = """
WITH toks AS (
  SELECT DISTINCT source, tok
  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
),
r AS (
  SELECT source,
         CAST(md5_number_upper(tok) >> 52 AS BIGINT) AS register,
         md5_number_upper(tok) & ((CAST(1 AS UBIGINT) << 52) - 1) AS rem
  FROM toks
),
s1 AS (SELECT source, register, rem | (rem >> 1) AS x FROM r),
s2 AS (SELECT source, register, x | (x >> 2) AS x FROM s1),
s3 AS (SELECT source, register, x | (x >> 4) AS x FROM s2),
s4 AS (SELECT source, register, x | (x >> 8) AS x FROM s3),
s5 AS (SELECT source, register, x | (x >> 16) AS x FROM s4),
s6 AS (SELECT source, register, x | (x >> 32) AS x FROM s5)
SELECT source, register, CAST(53 - MIN(bit_count(x)) AS BIGINT) AS rho
FROM s6 GROUP BY source, register
"""


def hll_by_source(sf_dir: str) -> ray.data.Dataset:
    """Per-source HLL register tables (p=12) of distinct tokens — the
    GROUPED mergeable sketch: one register table per source, each
    independently mergeable with any other shard's table for the same
    source (register-wise max), which is how a 100-TB pipeline keeps a
    distinct-token profile per provenance without ever re-scanning.
    Same vectorized register/rho math as hll_tokens with the group key
    riding along; the reduce is bucketed on (source, register)."""
    from .dedup import _md5_64_memo
    from .shuffle import bucketed_group_agg

    mask52 = np.uint64((1 << 52) - 1)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.split(" ")
        flat = pd.DataFrame(
            {
                "source": batch["source"].repeat(toks.str.len()),
                "tok": np.concatenate(toks.to_numpy()),
            }
        ).drop_duplicates()
        if not len(flat):
            return pd.DataFrame({"source": [], "register": pd.Series(dtype="int64"),
                                 "rho": pd.Series(dtype="int64")})
        h = np.fromiter(
            (_md5_64_memo(t) for t in flat["tok"]), dtype=np.uint64, count=len(flat)
        )
        reg = (h >> np.uint64(52)).astype("int64")
        rem = h & mask52
        bitlen = np.frexp(rem.astype("float64"))[1].astype("int64")
        out = pd.DataFrame(
            {"source": flat["source"].to_numpy(), "register": reg, "rho": 53 - bitlen}
        )
        return out.groupby(["source", "register"], as_index=False)["rho"].max()

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["source", "register"], as_index=False)["rho"].max()
        return out.astype({"register": "int64", "rho": "int64"})

    ds = _docs(sf_dir, columns=("text", "source")).map_batches(
        partial, batch_format="pandas"
    )
    return bucketed_group_agg(ds, ["source", "register"], merge, num_buckets=64)


# ---------------------------------------------------------------------------
# Unigram LM document scoring (CCNet/Gopher-style quality signal)
# ---------------------------------------------------------------------------

UNIGRAM_PROB_SCORE_SQL = """
WITH w AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents
),
g AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY token),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM w)
SELECT w.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(SUM(g.c) * 1000000000
            // (CAST(count(*) AS HUGEINT) * (SELECT n_total FROM n))
         AS BIGINT) AS mean_prob_ppb
FROM w JOIN g ON w.token = g.token
GROUP BY w.doc_id
"""


def unigram_prob_score(
    sf_dir: str, *, broadcast_max_vocab: int = 2_000_000
) -> ray.data.Dataset:
    """Per-document unigram language-model score: the mean corpus
    probability of the document's tokens, in exact integer ppb — the
    CCNet / Gopher-family LM-based quality filter re-expressed so the
    oracle hashes bit-exact (a float mean-log-prob is the trivial
    variant; the integer mean-probability ranks documents by the same
    common-vs-rare-token signal without cross-engine float drift).

    Two passes, both thin:
      1. global unigram counts — per-batch value_counts combiners into a
         bucketed token reduce (exactly top_tokens' shuffle); N is the
         one scalar driver value.
      2. score attach — a document is ONE input row, so its token
         multiset never splits across batches: with the vocabulary under
         ``broadcast_max_vocab`` the counts broadcast once (ray.put) and
         scoring is a single stateless map_batches with NO shuffle. Past
         the gate (Heaps-law vocab beyond a worker), the tag-union
         fallback runs: (doc_id, token, tf) rows bucket-join the count
         rows on token, then one bucketed doc_id reduce re-assembles the
         per-doc sums — two thin int64 shuffles (pmi_bigrams' pattern).

    Overflow: per-doc sum(tf·c) ≤ n_doc_tokens·N — int64-safe through
    N ≈ 9·10^15 tokens at 1k-token docs; the ×10^9 ppb scaling is done in
    Python-int arithmetic per doc (mirrors the oracle's HUGEINT)."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    docs = _docs(sf_dir)
    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/documents.parquet"))

    def uni_partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch["text"].str.split(" ").explode().value_counts()
        return pd.DataFrame({"t": vc.index, "pc": vc.to_numpy().astype("int64")})

    def uni_reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("t", as_index=False)["pc"].sum()
        return out.rename(columns={"pc": "c"}).astype({"c": "int64"})

    uni = bucketed_group_agg(
        docs.map_batches(uni_partial, batch_format="pandas"),
        ["t"], uni_reduce, num_buckets=nb,
    ).materialize()
    n_total = int(uni.sum("c"))

    def finish(doc_ids, sums, ntoks) -> pd.DataFrame:
        ppb = [
            int(s) * 1_000_000_000 // (int(nt) * n_total)
            for s, nt in zip(sums, ntoks)
        ]
        return pd.DataFrame(
            {
                "doc_id": np.asarray(doc_ids, dtype="int64"),
                "n_tokens": np.asarray(ntoks, dtype="int64"),
                "mean_prob_ppb": pd.array(ppb, dtype="int64"),
            }
        )

    n_vocab = uni.count()
    if n_vocab <= broadcast_max_vocab:
        vocab = uni.to_pandas()
        ref = ray.put(pd.Series(vocab["c"].astype("int64").to_numpy(),
                                index=vocab["t"]))

        def score(b: pd.DataFrame) -> pd.DataFrame:
            cnt = ray.get(ref)
            ex = b.set_index("doc_id")["text"].str.split(" ").explode()
            cc = ex.map(cnt).astype("int64")
            sums = cc.groupby(level=0).sum()
            ntoks = ex.groupby(level=0).size()
            return finish(sums.index, sums.to_numpy(), ntoks.to_numpy())

        return docs.map_batches(score, batch_format="pandas")

    # tag-union fallback: token rows join counts in the token buckets,
    # then per-doc sums re-assemble in doc_id buckets
    def tf_rows(b: pd.DataFrame) -> pd.DataFrame:
        ex = b["text"].str.split(" ").explode()
        f = pd.DataFrame(
            {"doc_id": b["doc_id"].loc[ex.index].to_numpy(), "t": ex.to_numpy()}
        )
        g = f.groupby(["doc_id", "t"], as_index=False).size()
        return g.rename(columns={"size": "tf"}).assign(_c=np.int64(-1)).astype(
            {"doc_id": "int64", "tf": "int64"}
        )

    def tag_counts(u: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": np.int64(-1),
                "t": u["t"],
                "tf": np.int64(-1),
                "_c": u["c"].astype("int64"),
            }
        )

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.loc[g["_c"] >= 0].set_index("t")["_c"]
        rows = g.loc[g["_c"] < 0]
        return pd.DataFrame(
            {
                "doc_id": rows["doc_id"].astype("int64"),
                "tf": rows["tf"].astype("int64"),
                "c": rows["t"].map(cnt).astype("int64"),
            }
        )

    attached = bucketed_group_agg(
        docs.map_batches(tf_rows, batch_format="pandas").union(
            uni.map_batches(tag_counts, batch_format="pandas")
        ),
        ["t"], attach, num_buckets=nb,
    )

    def doc_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(s=b["tf"] * b["c"])
        return b.groupby("doc_id", as_index=False).agg(
            s=("s", "sum"), nt=("tf", "sum")
        )

    def doc_final(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("doc_id", as_index=False).agg(s=("s", "sum"), nt=("nt", "sum"))
        return finish(a["doc_id"].to_numpy(), a["s"].to_numpy(), a["nt"].to_numpy())

    return bucketed_group_agg(
        attached, ["doc_id"], doc_final, partial_fn=doc_partial, num_buckets=nb
    )


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (data selection for language models)
# ---------------------------------------------------------------------------

DSIR_TARGET_LANG = "en"  # the in-domain "target" distribution: English docs
DSIR_FRAC_NUM, DSIR_FRAC_DEN = 1, 4  # keep the top ceil(N/4) by importance

DSIR_SELECT_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS t FROM documents
),
cr AS (SELECT t, CAST(count(*) AS HUGEINT) AS c FROM tok GROUP BY t),
ct AS (SELECT t, CAST(count(*) AS HUGEINT) AS c FROM tok
       WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY t),
nr AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM tok),
nt AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM tok
       WHERE lang = '{DSIR_TARGET_LANG}'),
ratio AS (
  SELECT cr.t,
         COALESCE(ct.c, 0) * (SELECT n FROM nr) * 1000000
           // (cr.c * (SELECT n FROM nt)) AS ppm
  FROM cr LEFT JOIN ct ON cr.t = ct.t
),
dsc AS (
  SELECT tok.doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(SUM(ratio.ppm) // CAST(count(*) AS HUGEINT) AS BIGINT) AS score_ppm
  FROM tok JOIN ratio ON tok.t = ratio.t
  GROUP BY tok.doc_id
),
rk AS (
  SELECT score_ppm,
         row_number() OVER (ORDER BY score_ppm DESC, doc_id) AS rn,
         count(*) OVER () AS nd
  FROM dsc
),
thr AS (SELECT MIN(score_ppm) AS t FROM rk
        WHERE rn * {DSIR_FRAC_DEN} <= nd * {DSIR_FRAC_NUM} + {DSIR_FRAC_DEN} - 1)
SELECT doc_id, n_tokens, score_ppm
FROM dsc WHERE score_ppm >= (SELECT t FROM thr)
"""


def dsir_select(
    sf_dir: str, *, broadcast_max_vocab: int = 2_000_000
) -> ray.data.Dataset:
    """DSIR-style importance resampling (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every document
    by its likelihood ratio between an in-domain target unigram model
    (lang = 'en' documents) and the raw-corpus unigram model, then keep the
    top ceil(N/4) by score. The paper's hashed-n-gram log-ratio is
    re-expressed integer-exact so the oracle hashes bit-exact: the
    per-token ratio is ppm-scaled ct·Nr·10^6 // (cr·Nt) (Python-int ==
    HUGEINT), a document's score is the floor-mean of its tokens' ratios,
    and selection keeps score ≥ the ceil(N/4)-th largest score
    (tie-inclusive, so the rule is order-free on both engines).

    Scale shape — three thin passes, no global sort:
      1. joint counts: one bucketed token reduce carries (cr, ct) together
         (ct rides as a 0/1 partial sum), so target and raw models cost ONE
         shuffle; Nr/Nt are two driver scalars.
      2. score attach: vocabulary under ``broadcast_max_vocab`` broadcasts
         the ppm table once (ray.put) — a doc is one row, so scoring is a
         stateless map with NO shuffle; past the gate the tag-union
         fallback (unigram_prob_score's) joins (doc_id, t, tf) rows to ppm
         rows in token buckets and re-assembles per-doc sums in doc_id
         buckets.
      3. threshold without sorting: scores band by exact MSB
         (revenue_pareto's log2 range partition — frexp is exact below
         2^53), per-band counts give the driver an O(40) descending
         profile locating the band holding rank ceil(N/4); only that one
         magnitude band's scores gather for the exact in-band k-th
         largest. Equal scores share a band, so the threshold is exact;
         the in-band gather is the documented bound (one magnitude band —
         refine with a second split if a corpus concentrates there).
    """
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    docs = _docs(sf_dir, columns=("doc_id", "text", "lang"))
    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/documents.parquet"))

    def cnt_partial(b: pd.DataFrame) -> pd.DataFrame:
        ex = b["text"].str.split(" ").explode()
        tgt = (b["lang"] == DSIR_TARGET_LANG).loc[ex.index].to_numpy()
        f = pd.DataFrame(
            {"t": ex.to_numpy(), "cr": np.int64(1), "ct": tgt.astype("int64")}
        )
        return f.groupby("t", as_index=False).agg(cr=("cr", "sum"), ct=("ct", "sum"))

    def cnt_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("t", as_index=False).agg(cr=("cr", "sum"), ct=("ct", "sum"))
        return out.astype({"cr": "int64", "ct": "int64"})

    uni = bucketed_group_agg(
        docs, ["t"], cnt_final, partial_fn=cnt_partial, num_buckets=nb
    ).materialize()
    n_r = int(uni.sum("cr"))
    n_t = int(uni.sum("ct"))

    def to_ppm(b: pd.DataFrame) -> pd.DataFrame:
        # Python-int arithmetic mirrors the oracle's HUGEINT: ct·Nr·10^6
        # overflows int64 long before the ppm quotient does
        ppm = [
            int(ct) * n_r * 1_000_000 // (int(cr) * n_t)
            for cr, ct in zip(b["cr"], b["ct"])
        ]
        return pd.DataFrame({"t": b["t"], "ppm": pd.Series(ppm, dtype="int64")})

    ratio = uni.map_batches(to_ppm, batch_format="pandas")

    def finish(doc_ids, sums, ntoks) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": np.asarray(doc_ids, dtype="int64"),
                "n_tokens": np.asarray(ntoks, dtype="int64"),
                "score_ppm": np.asarray(sums, dtype="int64")
                // np.asarray(ntoks, dtype="int64"),
            }
        )

    n_vocab = uni.count()
    if n_vocab <= broadcast_max_vocab:
        rp = ratio.to_pandas()
        ref = ray.put(pd.Series(rp["ppm"].astype("int64").to_numpy(), index=rp["t"]))

        def score(b: pd.DataFrame) -> pd.DataFrame:
            ppm = ray.get(ref)
            ex = b.set_index("doc_id")["text"].str.split(" ").explode()
            pp = ex.map(ppm).astype("int64")
            sums = pp.groupby(level=0).sum()
            ntoks = ex.groupby(level=0).size()
            return finish(sums.index, sums.to_numpy(), ntoks.to_numpy())

        scored = docs.map_batches(score, batch_format="pandas")
    else:
        # tag-union fallback: tf rows join ppm rows in token buckets, then
        # per-doc sums re-assemble in doc_id buckets (unigram_prob_score)
        def tf_rows(b: pd.DataFrame) -> pd.DataFrame:
            ex = b["text"].str.split(" ").explode()
            f = pd.DataFrame(
                {"doc_id": b["doc_id"].loc[ex.index].to_numpy(), "t": ex.to_numpy()}
            )
            g = f.groupby(["doc_id", "t"], as_index=False).size()
            return g.rename(columns={"size": "tf"}).assign(_p=np.int64(-1)).astype(
                {"doc_id": "int64", "tf": "int64"}
            )

        def tag_ppm(u: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "doc_id": np.int64(-1),
                    "t": u["t"],
                    "tf": np.int64(-1),
                    "_p": u["ppm"].astype("int64"),
                }
            )

        def attach(g: pd.DataFrame) -> pd.DataFrame:
            ppm = g.loc[g["_p"] >= 0].set_index("t")["_p"]
            rows = g.loc[g["_p"] < 0]
            return pd.DataFrame(
                {
                    "doc_id": rows["doc_id"].astype("int64"),
                    "tf": rows["tf"].astype("int64"),
                    "p": rows["t"].map(ppm).astype("int64"),
                }
            )

        attached = bucketed_group_agg(
            docs.map_batches(tf_rows, batch_format="pandas").union(
                ratio.map_batches(tag_ppm, batch_format="pandas")
            ),
            ["t"], attach, num_buckets=nb,
        )

        def doc_partial(b: pd.DataFrame) -> pd.DataFrame:
            b = b.assign(s=b["tf"] * b["p"])
            return b.groupby("doc_id", as_index=False).agg(
                s=("s", "sum"), nt=("tf", "sum")
            )

        def doc_final(g: pd.DataFrame) -> pd.DataFrame:
            a = g.groupby("doc_id", as_index=False).agg(
                s=("s", "sum"), nt=("nt", "sum")
            )
            return finish(a["doc_id"].to_numpy(), a["s"].to_numpy(), a["nt"].to_numpy())

        scored = bucketed_group_agg(
            attached, ["doc_id"], doc_final, partial_fn=doc_partial, num_buckets=nb
        )

    scored = scored.materialize()  # reused: refinement passes + final filter
    n_docs = scored.count()
    n_sel = (n_docs * DSIR_FRAC_NUM + DSIR_FRAC_DEN - 1) // DSIR_FRAC_DEN

    # The n_sel-th largest score via iterative value-domain refinement —
    # O(256/level) driver state even when scores concentrate in one octave
    # (a crossing-BAND gather is O(n) exactly there; see the helper doc).
    # Selection keeps all score ties, so the threshold VALUE is the whole
    # answer — nothing gathers.
    from .shuffle import descending_value_cut

    threshold = descending_value_cut(
        scored, "score_ppm", lambda c: c >= n_sel
    )[0]

    return scored.map_batches(
        lambda b: b.loc[b["score_ppm"] >= threshold], batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Per-source token-distribution divergence (total variation, integer-exact)
# ---------------------------------------------------------------------------

SOURCE_TOKEN_DIVERGENCE_SQL = """
WITH w AS (
  SELECT source, UNNEST(string_split(text, ' ')) AS token FROM documents
),
cs AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY source, token),
ct AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY token),
ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM w GROUP BY source),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM w),
dev AS (
  SELECT cs.source,
         SUM(abs(CAST(cs.c AS HUGEINT) * (SELECT n FROM nn)
                 - CAST(ct.c AS HUGEINT) * ns.n)) AS dev_in,
         SUM(CAST(ct.c AS HUGEINT)) AS cov
  FROM cs JOIN ct ON cs.token = ct.token JOIN ns ON ns.source = cs.source
  GROUP BY cs.source
)
SELECT d.source,
       ns.n AS n_tokens,
       CAST((d.dev_in + ((SELECT n FROM nn) - d.cov) * CAST(ns.n AS HUGEINT))
            * 1000000 // (2 * CAST(ns.n AS HUGEINT) * (SELECT n FROM nn))
         AS BIGINT) AS tv_ppm
FROM dev d JOIN ns ON ns.source = d.source
"""


def source_token_divergence(sf_dir: str) -> ray.data.Dataset:
    """Per-source total-variation distance between the source's token
    distribution and the whole-corpus distribution, in exact integer ppm —
    the domain-shift diagnostic for corpus mixing (a source with high TV
    is lexically unlike the blend; KL/χ² rank the same way but need
    floats). TV = ½ Σ_t |p_s(t) − p(t)|; tokens ABSENT from a source
    contribute Σ_{t∉s} p(t) = (N − Σ_{t∈s} c_t)/N, so the whole statistic
    needs only the (source, token) rows that EXIST — never a source ×
    vocab cross product.

    Scale shape: one tiny pre-pass reduces per-source token totals
    (|sources| rows, broadcast as scalars); the main pass buckets
    (source, token, partial-count) rows BY TOKEN, so each bucket holds
    every source's count AND the implied global count for its tokens —
    cs and ct co-locate for free and no second join runs. Per-(bucket,
    source) partial deviations are exact Python ints (products reach
    N² ≈ 10^26 at corpus scale — past int64, mirroring the oracle's
    HUGEINT) carried as decimal strings through the final |sources|-row
    merge."""
    from ray.data.aggregate import Sum

    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    path = f"{sf_dir}/documents.parquet"
    docs = ray.data.read_parquet(path, columns=["source", "text"])
    nb = scaled_num_buckets(input_bytes_estimate(path))

    def st_counts(b: pd.DataFrame) -> pd.DataFrame:
        ex = b["text"].str.split(" ").explode()
        f = pd.DataFrame(
            {"source": b["source"].loc[ex.index].to_numpy(), "t": ex.to_numpy()}
        )
        out = f.groupby(["source", "t"], as_index=False).size()
        return out.rename(columns={"size": "pc"}).astype({"pc": "int64"})

    counted = docs.map_batches(st_counts, batch_format="pandas")

    # pre-pass: per-source token totals (a |sources|-row dimension)
    totals = (
        counted.map_batches(
            lambda b: b.groupby("source", as_index=False)["pc"].sum(),
            batch_format="pandas",
        )
        .groupby("source")
        .aggregate(Sum("pc", alias_name="n"))
        .to_pandas()
    )
    n_s = dict(zip(totals["source"], totals["n"].astype("int64")))
    n_total = int(totals["n"].sum())

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cs = g.groupby(["source", "t"], as_index=False)["pc"].sum()
        ct = cs.groupby("t")["pc"].sum()  # bucket owns its tokens fully
        c_st = cs["pc"].to_numpy()
        c_t = ct.loc[cs["t"]].to_numpy()
        ns_arr = cs["source"].map(n_s).to_numpy().astype("int64")
        # int64 fast path when every product provably fits (c ≤ N, so
        # c·N ≤ N² < 2^62 iff N < 2^31); past that, exact Python-int
        # (the oracle's HUGEINT) — never silent overflow
        if n_total < 2**31:
            dev_row = np.abs(c_st * np.int64(n_total) - c_t * ns_arr)
            f = pd.DataFrame({"source": cs["source"], "d": dev_row, "ct": c_t})
            a = f.groupby("source", as_index=False).agg(
                d=("d", "sum"), ct=("ct", "sum")
            )
            return pd.DataFrame(
                {"source": a["source"], "dev_in": a["d"].map(str),
                 "cov": a["ct"].map(str)}
            )
        rows = []
        for src, grp in cs.assign(_ct=c_t, _cst=c_st).groupby("source"):
            ns = int(n_s[src])
            dev = sum(
                abs(int(a) * n_total - int(b) * ns)
                for a, b in zip(grp["_cst"], grp["_ct"])
            )
            cov = int(grp["_ct"].sum())
            rows.append((src, str(dev), str(cov)))
        return pd.DataFrame(rows, columns=["source", "dev_in", "cov"])

    partials = bucketed_group_agg(counted, ["t"], per_bucket, num_buckets=nb)

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, grp in b.groupby("source"):
            ns = int(n_s[src])
            dev_in = sum(int(x) for x in grp["dev_in"])
            cov = sum(int(x) for x in grp["cov"])
            tv = (dev_in + (n_total - cov) * ns) * 1_000_000 // (2 * ns * n_total)
            rows.append((src, ns, tv))
        return pd.DataFrame(rows, columns=["source", "n_tokens", "tv_ppm"]).astype(
            {"n_tokens": "int64", "tv_ppm": "int64"}
        )

    return partials.repartition(1).map_batches(
        merge, batch_format="pandas", batch_size=None
    )


# ---------------------------------------------------------------------------
# Per-source Simpson diversity (exact-integer concentration index)
# ---------------------------------------------------------------------------

SOURCE_SIMPSON_DIVERSITY_SQL = """
WITH w AS (
  SELECT source, UNNEST(string_split(text, ' ')) AS token FROM documents
),
c AS (
  SELECT source, token, CAST(count(*) AS BIGINT) AS n
  FROM w GROUP BY source, token
)
SELECT source,
       CAST(SUM(n) AS BIGINT) AS n_tokens,
       CAST(SUM(CAST(n AS HUGEINT) * n) AS BIGINT) AS sum_sq
FROM c GROUP BY source
"""


def source_simpson_diversity(sf_dir: str) -> ray.data.Dataset:
    """Per-source token-concentration sufficient statistics: total token
    count T and Σc² over the source's token-count table — the exact
    integer numerator/denominator of the Simpson index (Σ(c/T)² =
    sum_sq/T²; its complement is Gini–Simpson diversity). Shannon
    entropy needs a log and would not hash bit-equal across engines;
    Simpson is the standard diversity index with an exact integer form
    (the same engine-parity trick as revenue_trend's OLS sufficient
    statistics and source_token_divergence's Python-int partials).

    Shape: per-batch (source, token) partial counts shrink the shuffle;
    one bucketed shuffle on (source, token) delivers complete groups, so
    each bucket's exact per-token counts square locally and collapse to
    per-source partials (Python-int sums — Σc² at 100 TB exceeds int64,
    the HUGEINT-parity lesson); the final merge is one task over
    |sources| × N_buckets partial rows. No token ever leaves its bucket."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        e = b.set_index("source")["text"].str.split(" ").explode()
        g = e.groupby([e.index, e.to_numpy()]).size()
        g.index.names = ["source", "token"]
        out = g.reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    def bucket_partial(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["source", "token"], as_index=False)["n"].sum()
        tot = c.groupby("source", as_index=False)["n"].sum()
        # int64 fast path when the partial provably fits: per-(bucket,
        # source) Σc² ≤ (Σc)², safe iff every bucket-source total < 2^31;
        # past that, exact Python-int (the oracle's HUGEINT) — the
        # source_token_divergence guard, never silent overflow
        if int(tot["n"].max()) < 2**31:
            n = c["n"].to_numpy()
            sq = pd.DataFrame({"source": c["source"], "sq": n * n})
            a = sq.groupby("source", as_index=False)["sq"].sum()
            out = tot.merge(a, on="source")
            return pd.DataFrame(
                {"source": out["source"],
                 "n_tokens": out["n"].map(str),
                 "sum_sq": out["sq"].map(str)}
            )
        rows = []
        for src, grp in c.groupby("source"):
            ns = [int(x) for x in grp["n"]]
            rows.append((src, str(sum(ns)), str(sum(x * x for x in ns))))
        return pd.DataFrame(rows, columns=["source", "n_tokens", "sum_sq"])

    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/documents.parquet"))
    partials = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["source", "token"], bucket_partial, num_buckets=nb,
    )

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, grp in b.groupby("source"):
            rows.append(
                {
                    "source": src,
                    "n_tokens": sum(int(x) for x in grp["n_tokens"]),
                    "sum_sq": sum(int(x) for x in grp["sum_sq"]),
                }
            )
        out = pd.DataFrame(rows, columns=["source", "n_tokens", "sum_sq"])
        return out.astype({"n_tokens": "int64", "sum_sq": "int64"})

    return partials.repartition(1).map_batches(merge, batch_format="pandas")


# --- BPE first-merge statistics (tokenizer training prep) ---------------------
#
# A byte-pair-encoding trainer's first iteration (Sennrich et al. 2016)
# counts adjacent symbol pairs inside every word, weighted by the word's
# corpus frequency, and merges the most frequent pair. This op computes
# that statistic exactly: top-20 adjacent character pairs by
# (count DESC, pair ASC). The corpus never explodes to character rows —
# the token stream collapses to (unique word, corpus count) via the
# standard combiner → bucketed reduce, pair emission runs once per UNIQUE
# word (Heaps-bounded, not corpus-bounded) inside its bucket, and pair
# totals ride a second thin bucketed reduce whose per-bucket local top-20
# candidates are a provable superset of the global top-20 (a pair
# aggregates fully inside one hash bucket).

BPE_TOP_PAIRS = 20

BPE_FIRST_MERGES_SQL = f"""
WITH t AS (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents),
c AS (SELECT w, count(*) AS cnt FROM t GROUP BY w),
p AS (
  SELECT substr(w, i, 2) AS pair, cnt
  FROM c, LATERAL (SELECT UNNEST(generate_series(1, length(w) - 1)) AS i)
),
a AS (SELECT pair, CAST(SUM(cnt) AS BIGINT) AS n FROM p GROUP BY pair)
SELECT pair, n FROM a ORDER BY n DESC, pair LIMIT {BPE_TOP_PAIRS}
"""


def bpe_first_merges(sf_dir: str) -> ray.data.Dataset:
    """Top adjacent-character-pair counts for BPE merge #1 (see block
    comment). Repeated pairs inside one word count per occurrence
    ("aaa" contributes "aa" twice), matching the trainer's statistic."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    path = f"{sf_dir}/documents.parquet"
    ds = ray.data.read_parquet(path, columns=["text"])

    def word_partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.split(" ")
        flat = pd.Series(np.concatenate(toks.to_numpy()), name="w")
        c = flat.groupby(flat, sort=False).size()
        return pd.DataFrame({"w": c.index, "n": c.to_numpy().astype("int64")})

    def pairs_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        wc = g.groupby("w", as_index=False)["n"].sum()
        pairs: list[str] = []
        counts: list[int] = []
        # loop over UNIQUE words in this bucket (vocab/num_buckets rows),
        # never over corpus tokens
        for w, n in zip(wc["w"], wc["n"]):
            for i in range(len(w) - 1):
                pairs.append(w[i : i + 2])
                counts.append(n)
        f = pd.DataFrame({"pair": pairs, "n": np.asarray(counts, dtype="int64")})
        return f.groupby("pair", as_index=False)["n"].sum()

    nb = scaled_num_buckets(input_bytes_estimate(path))
    pair_partials = bucketed_group_agg(
        ds.map_batches(word_partial, batch_format="pandas"),
        ["w"], pairs_of_bucket, num_buckets=nb,
    )

    def bucket_top(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("pair", as_index=False)["n"].sum()
        return s.sort_values(["n", "pair"], ascending=[False, True]).head(
            BPE_TOP_PAIRS
        ).astype({"n": "int64"})

    cand = bucketed_group_agg(pair_partials, ["pair"], bucket_top, num_buckets=64)

    def final(b: pd.DataFrame) -> pd.DataFrame:
        s = b.sort_values(["n", "pair"], ascending=[False, True], kind="mergesort")
        return s.head(BPE_TOP_PAIRS).reset_index(drop=True)

    return cand.repartition(1).map_batches(final, batch_format="pandas")
