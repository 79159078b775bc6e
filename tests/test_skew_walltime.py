"""Skewed-corpus wall-time balance (SURVEY §7.2 item 9): one ~100× document
among small ones must not create a straggler partition — byte-greedy file
binning (state/checkpoint.plan_partitions) equalizes partition WALL TIMES,
not just byte counts. Asserted on the manifest's recorded wall_s."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

from docling_serve_ray.corpus import generate_doc
from docling_serve_ray.schema import SPANS_TYPE


def _write_skewed_corpus(out_dir: str, n_small: int = 360, n_files: int = 12):
    """n_small small docs spread over n_files files, plus ONE giant doc
    (large tier, ~100× the median payload) alone in its own file."""
    os.makedirs(out_dir, exist_ok=True)
    small = []
    giant = None
    i = 0
    while len(small) < n_small or giant is None:
        d = generate_doc(i)
        i += 1
        if d["byte_size"] > 200_000 and giant is None:
            giant = d
        elif d["byte_size"] < 20_000 and len(small) < n_small:
            small.append(d)

    def table_of(docs):
        return pa.table(
            {
                "doc_id": pa.array([d["doc_id"] for d in docs], pa.string()),
                "format": pa.array([d["format"] for d in docs], pa.string()),
                "payload": pa.array([d["payload"] for d in docs], pa.large_binary()),
                "lang": pa.array([d["lang"] for d in docs], pa.string()),
                "byte_size": pa.array([d["byte_size"] for d in docs], pa.int64()),
                "spans": pa.array([d["spans"] for d in docs], SPANS_TYPE),
                "quality": pa.array([d["quality"] for d in docs], pa.string()),
                "expected_spans": pa.array([d["expected_spans"] for d in docs], SPANS_TYPE),
            }
        )

    per = n_small // (n_files - 1)
    for k in range(n_files - 1):
        pq.write_table(table_of(small[k * per : (k + 1) * per]), f"{out_dir}/f{k:02d}.parquet")
    pq.write_table(table_of([giant]), f"{out_dir}/giant.parquet")
    n_total = per * (n_files - 1) + 1
    return giant["byte_size"], max(d["byte_size"] for d in small), n_total


def test_skewed_partition_wall_times_balanced(ray_session, tmp_path):
    from docling_serve_ray.pipelines.convert import build_convert_pipeline, read_input
    from docling_serve_ray.state.checkpoint import run_partitioned

    corpus = str(tmp_path / "in")
    giant_b, small_max_b, n_total = _write_skewed_corpus(corpus)
    assert giant_b > 10 * small_max_b, "corpus not actually skewed"

    files = sorted(glob.glob(os.path.join(corpus, "*.parquet")))
    # warm up Ray workers once so the first partition's wall_s measures
    # conversion, not process startup (the comparison is between
    # partitions, and only partition 1 would pay the cold start)
    build_convert_pipeline(read_input(files[:1])).materialize()

    # wall clock on this box is noisy (shared machine, ±30% documented in
    # BASELINE.md, with occasional multi-second scheduler hiccups and
    # invisible-neighbor load spikes observed at 2×+), so the spread
    # property is asserted best-of-4: a genuinely skew-broken binning
    # (the giant's partition carrying ~10× the work) would fail every
    # attempt, while environmental noise won't fail all four
    spreads = []
    for attempt in range(4):
        s = run_partitioned(
            files, str(tmp_path / f"out{attempt}"),
            lambda fs: build_convert_pipeline(read_input(fs)),
            num_partitions=4,
        )
        assert s["total_rows"] == n_total
        walls = [r["wall_s"] for r in s["manifest"]]
        in_bytes = [r["input_bytes"] for r in s["manifest"]]
        assert len(walls) == 4
        # byte balance is deterministic: assert it every attempt. Files
        # are indivisible, so when one file alone exceeds the ideal bin
        # size (the giant's parquet can be > total/4 under the current
        # format mix) NO binning can reach 2× balance — the byte-greedy
        # guarantee is max ≤ max(2·min, largest single file).
        largest_file = max(os.path.getsize(f) for f in files)
        assert max(in_bytes) <= max(2 * min(in_bytes), largest_file), in_bytes
        spreads.append(max(walls) / min(walls))
        if spreads[-1] < 2.0:
            break
    assert min(spreads) < 2.0, spreads
