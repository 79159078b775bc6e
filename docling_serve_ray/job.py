"""Cluster job entrypoint: the `ray job submit` surface of the engine.

    ray job submit --address http://<head>:8265 -- \
        python -m docling_serve_ray.job --input '/data/corpus/*.parquet' \
            --out /data/out --partitions 256 [--fanout-threshold 0] \
            [--options '{"to_formats": ["md", "doctags"]}'] [--format lance]

Runs the checkpointed, lineage-tracked conversion (state/checkpoint.
run_partitioned) over the input files and prints one summary JSON line.
Re-submitting after a kill resumes: published partitions whose input
fingerprint + options hash still match are skipped.

Owns a Ray session only when none exists (inside `ray job submit` the
cluster is already initialised via RAY_ADDRESS; standalone it starts a
local one).
"""

from __future__ import annotations

import argparse
import glob
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="docling_serve_ray.job")
    ap.add_argument("--input", required=True, help="input parquet glob or directory")
    ap.add_argument("--out", required=True, help="checkpointed output directory")
    ap.add_argument("--partitions", type=int, default=256)
    ap.add_argument("--options", default=None, help="JobOptions overrides as JSON")
    ap.add_argument("--format", default="parquet", choices=("parquet", "lance"))
    ap.add_argument(
        "--fanout-threshold", type=int, default=0,
        help="page count above which PDFs fan out per page (0 = whole-doc)",
    )
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args(argv)

    import os

    import ray

    if not ray.is_initialized():
        ray.init(address="auto" if "RAY_ADDRESS" in os.environ else "local",
                 include_dashboard=False)

    from .options import JobOptions
    from .pipelines.convert import build_convert_pipeline, read_input
    from .pipelines.fanout import convert_with_page_fanout
    from .state.checkpoint import run_partitioned

    overrides = json.loads(args.options) if args.options else {}
    for key in ("from_formats", "to_formats", "ocr_lang", "page_range"):
        if key in overrides:
            overrides[key] = tuple(overrides[key])
    options = JobOptions(**overrides)

    if os.path.isdir(args.input):
        # a bare directory: partition over the files inside (never over
        # the directory path itself — the fingerprint must track file
        # content, and --partitions needs real units to bin)
        files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    else:
        files = sorted(f for f in glob.glob(args.input) if os.path.isfile(f))
    if not files:
        print(json.dumps({"error": f"no input files match {args.input!r}"}))
        return 2

    if args.fanout_threshold > 0:
        pipeline = lambda fs: convert_with_page_fanout(  # noqa: E731
            fs, options, threshold=args.fanout_threshold
        )
    else:
        pipeline = lambda fs: build_convert_pipeline(read_input(fs), options)  # noqa: E731

    summary = run_partitioned(
        files,
        args.out,
        pipeline,
        num_partitions=args.partitions,
        resume=not args.no_resume,
        output_format=args.format,
        options_hash=options.options_hash(),
    )
    print(
        json.dumps(
            {
                "partitions": summary["partitions"],
                "skipped": summary["skipped"],
                "processed": summary["processed"],
                "total_rows": summary["total_rows"],
                "total_input_bytes": summary["total_input_bytes"],
                "options_hash": options.options_hash(),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
