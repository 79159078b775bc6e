"""Crash-isolation contract for bench.py (round-5, VERDICT r4 #1).

Round 4's official bench record was zeroed by a single Ray 2.49 core fatal
(`reference_count.cc`) because all 83 queries ran in ONE Ray session. The
harness now chunks queries across fresh subprocess sessions and appends
each finished timing to a flushed JSONL file. These tests prove the
contract: a SIGKILLed chunk worker costs only the in-flight query — the
final single-line JSON still parses, carries every other query's timing,
and names the casualty under "failed_queries".
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")
SF_DIR = "/root/testdata/sf0.001"


def _run_bench(extra_env: dict[str, str]) -> dict:
    env = dict(
        os.environ,
        GRAFT_SF_DIR=SF_DIR,
        GRAFT_BENCH_FLAGSHIP="0",
        RAY_GRAFT_CPUS="4",
        **extra_env,
    )
    out = subprocess.run(
        [sys.executable, BENCH],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_kill_mid_chunk_loses_only_the_inflight_query():
    """SIGKILL the worker at the middle query of a 3-query chunk: the two
    neighbours' timings must survive and the casualty must be reported."""
    rec = _run_bench(
        {
            "GRAFT_BENCH_ONLY": "token_count,exact_dedup,lang_id",
            "GRAFT_BENCH_KILL_AT": "exact_dedup",
            "GRAFT_BENCH_CHUNK": "3",
        }
    )
    assert set(rec["queries"]) == {"token_count", "lang_id"}
    assert all(isinstance(v, float) and v >= 0 for v in rec["queries"].values())
    assert rec["failed_queries"] == ["exact_dedup"]
    assert rec["value"] is None  # flagship skipped → null, not a crash


def test_clean_chunked_run_times_every_query():
    rec = _run_bench(
        {
            "GRAFT_BENCH_ONLY": "token_count,lang_id",
            "GRAFT_BENCH_CHUNK": "1",  # force two fresh sessions
        }
    )
    assert set(rec["queries"]) == {"token_count", "lang_id"}
    assert "failed_queries" not in rec


def test_scaling_mode_smoke():
    """--scaling end to end at toy size: fresh lo/hi subprocesses, tiny
    corpus (GRAFT_SCALE_DOCS), no equalizer burners. Proves the driver's
    scaling-record path parses and carries both legs + the ratio."""
    env = dict(
        os.environ,
        GRAFT_SCALE_DOCS="300",
        GRAFT_SCALE_ROUNDS="1",
        GRAFT_SCALE_EQUALIZE="0",
        GRAFT_SCALE_LO="2",  # a 1-CPU session starves the
        GRAFT_SCALE_HI="4",  # streaming executor (actor pool + read)
        GRAFT_SF_DIR=SF_DIR,
    )
    out = subprocess.run(
        [sys.executable, BENCH, "--scaling"],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["unit"] == "ratio" and rec["num_cpus"] == [2, 4]
    assert rec["bench_docs"] == 300
    assert rec["sec_lo"] > 0 and rec["sec_hi"] > 0
    assert isinstance(rec["value"], float)
    assert rec["rounds"] and "eff" in rec["rounds"][0]
