"""Architecture invariants that the driver contract and the oracle-equality
guarantee depend on."""

import pathlib
import re

ROOT = pathlib.Path(__file__).resolve().parent.parent


def test_kernels_have_no_ray_imports():
    """kernels/ must stay pure Python: the sequential oracle imports them
    without Ray, and their purity is what makes span equality under
    parallelism provable."""
    offenders = []
    for p in (ROOT / "docling_serve_ray" / "kernels").glob("*.py"):
        src = p.read_text()
        if re.search(r"^\s*(import ray|from ray)", src, re.M):
            offenders.append(p.name)
    assert offenders == []


def test_no_ray_init_outside_owners():
    """Only bench.py, scripts/ and the test fixture may own a Ray session
    (driver contract: __ray_entry__ and the library never call ray.init).
    AST-based: docstring mentions don't count."""
    import ast

    offenders = []
    for p in ROOT.rglob("*.py"):
        rel = p.relative_to(ROOT).as_posix()
        if rel.startswith(("tests/", "scripts/")) or rel == "bench.py":
            continue
        # the `ray job submit` CLI entrypoint owns a session when none
        # exists (guarded by ray.is_initialized())
        if rel == "docling_serve_ray/job.py":
            continue
        if ".claude" in rel:
            continue
        tree = ast.parse(p.read_text())
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "init"
                and isinstance(node.func.value, ast.Name)
                and node.func.value.id == "ray"
            ):
                offenders.append(rel)
    assert offenders == []


def test_every_query_has_oracle_or_documented_exception():
    import sys

    sys.path.insert(0, str(ROOT))
    import __ray_entry__ as m

    qs = set(m.queries())
    oracles = set(m.oracle_sql())
    assert oracles <= qs
    # every query has a SQL oracle (simhash gained one in round 2:
    # md5_number_upper matches the engine's 64-bit md5 fold bit-exactly)
    assert qs - oracles == set()
