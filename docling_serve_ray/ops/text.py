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
