"""The flagship conversion pipeline: interleaved-document table → ordered
span sequences + export columns.

Ray-Data-first shape (SURVEY.md §7.1):

    read_parquet(columns pruned)
      → [optional] AnalyzeBatch      stateless map_batches (M1 quality → ocr_mode)
      → ConvertActor                 actor pool, OCR codebook in actor state
      → (sink: write_parquet / downstream ops)

By default the analyzer is FUSED into the convert actor (one payload parse
per document instead of two); ``fuse_analyze=False`` runs it as a separate
stateless stage — same results, mirrors the reference's separate analysis
pre-pass (worker.py:98-169) and exposes the per-stage timings in ds.stats().

Skew: mixed corpora are long-tailed (FIXTURES.md byte_size). Block-level
balance is handled by Ray's dynamic block splitting given a bounded
``target_max_block_size``; per-batch balance by a small ``batch_size`` on
the actor stage so one 2000-span document cannot stall a whole batch of
small ones. Cross-partition balance for checkpointed runs is byte-greedy
file binning in state/checkpoint.py.
"""

from __future__ import annotations

import ray.data

from ..options import DEFAULT_OPTIONS, JobOptions
from ..stages.convert import AnalyzeBatch, ConvertActor

INPUT_COLUMNS = ["doc_id", "format", "payload", "lang", "byte_size"]


def tune_data_context():
    """Apply measured-good Ray Data execution settings. Safe to call
    multiple times; never calls ray.init()."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    # actor pools idle ~30% of the run with the default in-flight depth of
    # 4; depth 8 keeps every actor fed (measured 5.8k → 8.0k docs/s on the
    # 100k-doc flagship at 32 CPUs)
    ctx.max_tasks_in_flight_per_actor = 8
    return ctx


def safe_concurrency(requested):
    """Cap an actor-pool size so it can never reserve every cluster CPU —
    a pool that takes all CPUs starves the read/write stages and deadlocks
    the streaming executor. Leaves ≥1 CPU of headroom."""
    try:
        import ray

        total = int(ray.cluster_resources().get("CPU", 2))
    except Exception:
        total = 2
    cap = max(1, total - 1)
    if requested is None:
        # fixed pool at ~3/4 of the cluster, proportional across cluster
        # sizes (the scaling-efficiency comparison needs the actor share of
        # the cluster to be constant). Measured on the 100k-doc corpus at
        # 32 CPUs: fixed 24 ≈ 6.5k docs/s (stable) vs fixed 30 ≈ 4.7k
        # (read starvation) vs autoscaling (2,31) ≈ 2.2k (slow ramp-up).
        return max(1, min(cap, round(total * 0.75)))
    if isinstance(requested, int):
        return min(requested, cap)
    lo, hi = requested
    return (min(lo, cap), min(hi, cap))


def read_input(path_or_paths, columns=None) -> ray.data.Dataset:
    """Read the interleaved-document table. Only the columns the pipeline
    needs leave storage (prune-at-read); the ground-truth ``spans`` column
    of test fixtures is never loaded by the pipeline.

    Lance is the nominal input format (BASELINE.json input_hint); this
    container has no pylance, so the working path is parquet with the
    identical Arrow schema. A ``.lance`` URI uses read_lance when the
    library is present."""
    cols = columns or INPUT_COLUMNS
    if isinstance(path_or_paths, str) and path_or_paths.rstrip("/").endswith(".lance"):
        try:
            return ray.data.read_lance(path_or_paths, columns=cols)
        except (ImportError, AttributeError) as exc:
            raise ImportError(
                "reading a .lance dataset requires the pylance package"
            ) from exc
    return ray.data.read_parquet(path_or_paths, columns=cols)


def build_convert_pipeline(
    ds: ray.data.Dataset,
    options: JobOptions = DEFAULT_OPTIONS,
    *,
    fuse_analyze: bool = True,
    concurrency=None,
) -> ray.data.Dataset:
    """Attach the conversion stages to an input Dataset (lazy)."""
    tune_data_context()
    if not fuse_analyze:
        ds = ds.map_batches(
            AnalyzeBatch(options),
            batch_format="pyarrow",
            batch_size=options.batch_size,
        )
    ds = ds.map_batches(
        ConvertActor,
        fn_constructor_args=(options,),
        batch_format="pyarrow",
        batch_size=options.actor_batch_size,
        concurrency=safe_concurrency(concurrency),
        num_cpus=1,
    )
    return ds


def convert_dataset(
    input_path,
    options: JobOptions = DEFAULT_OPTIONS,
    **kwargs,
) -> ray.data.Dataset:
    return build_convert_pipeline(read_input(input_path), options, **kwargs)
