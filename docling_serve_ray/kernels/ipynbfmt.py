"""Jupyter-notebook (.ipynb) parsing through the REAL stdlib ``json``
backend (CPython's C-accelerated scanner) — the 9th real foreign parser
seam alongside expat, docutils, stdlib-csv, PyYAML, tomllib,
configparser, charset_normalizer and Pygments.

A notebook is nbformat-4 JSON: ``{"cells": [{"cell_type": ..., "source":
...}, ...]}``. The span model walks cells in order:

- ``code`` cells → one ``code`` span (source joined verbatim).
- ``markdown`` cells → the same block grammar as the ``md`` format
  (kernels/office.py parse_markdown_doc): ``# `` heading → ``title`` for
  the document's FIRST heading then ``section_header`` (the seen-title
  flag threads ACROSS cells, so a later cell's ``# `` never mints a
  second title), ``## `` → ``section_header``, ``- `` → ``list_item``,
  fenced blocks → ``code``, anything else → ``paragraph``.
- ``raw`` cells (foreign notebooks only) → one ``paragraph`` span with
  the raw source; cell ``outputs`` are ignored (extraction reads the
  authored content, not execution artifacts).

``source`` is accepted both as a string and as the list-of-lines form
nbformat writers emit. Round-trip contract (generator T2 invariant):
``render_ipynb`` groups consecutive non-code spans into one markdown
cell using render_markdown_doc's (invertible) syntax and emits each
``code`` span as a code cell, so render∘parse is the identity on
generator content (MD span kinds, no blank lines inside span text).

Reference analog: docling's per-format backend router
(docling_serve/docling_conversion.py:72-79); ipynb is this suite's own
extension, like yaml/toml/rst/csv.
"""

from __future__ import annotations

import json

IPYNB_KINDS = {"title", "section_header", "paragraph", "list_item", "code"}


def _cell_source(cell: dict) -> str:
    src = cell.get("source", "")
    if isinstance(src, list):
        return "".join(src)
    return str(src)


def _md_blocks(text: str) -> list[str]:
    """Blank-line block split with fenced code kept intact — the md
    format's grammar (office.py parse_markdown_doc), shared per cell."""
    blocks: list[str] = []
    cur: list[str] = []
    in_fence = False
    for line in text.split("\n"):
        if line.startswith("```"):
            in_fence = not in_fence
            cur.append(line)
            if not in_fence:
                blocks.append("\n".join(cur))
                cur = []
            continue
        if in_fence:
            cur.append(line)
        elif line.strip() == "":
            if cur:
                blocks.append("\n".join(cur))
                cur = []
        else:
            cur.append(line)
    if cur:
        blocks.append("\n".join(cur))
    return blocks


def _md_spans(text: str, seen_title: bool, out: list[dict]) -> bool:
    for blk in _md_blocks(text):
        if blk.startswith("```"):
            body = blk.split("\n")[1:-1]
            out.append({"kind": "code", "text": "\n".join(body)})
        elif blk.startswith("# "):
            kind = "section_header" if seen_title else "title"
            seen_title = True
            out.append({"kind": kind, "text": blk[2:]})
        elif blk.startswith("## "):
            out.append({"kind": "section_header", "text": blk[3:]})
        elif blk.startswith("- "):
            for line in blk.split("\n"):
                out.append({"kind": "list_item", "text": line[2:]})
        else:
            out.append({"kind": "paragraph", "text": blk.replace("\n", " ")})
    return seen_title


def parse_ipynb(payload: bytes, doc_id: str) -> list[dict]:
    """ipynb payload → spans via stdlib json (REAL backend). Malformed
    JSON / non-notebook roots raise and become failure rows."""
    nb = json.loads(payload.decode("utf-8"))
    if not isinstance(nb, dict) or not isinstance(nb.get("cells"), list):
        raise ValueError("notebook root must be a mapping with a 'cells' list")
    spans: list[dict] = []
    seen_title = False
    for cell in nb["cells"]:
        if not isinstance(cell, dict):
            raise ValueError("notebook cell must be a mapping")
        ctype = cell.get("cell_type")
        if ctype == "code":
            spans.append({"kind": "code", "text": _cell_source(cell)})
        elif ctype == "markdown":
            seen_title = _md_spans(_cell_source(cell), seen_title, spans)
        elif ctype == "raw":
            spans.append({"kind": "paragraph", "text": _cell_source(cell)})
        else:
            raise ValueError(f"unknown cell_type {ctype!r}")
    from .office import _finalize

    return _finalize(spans, doc_id)


def _md_line(s: dict) -> str:
    kind, text = s["kind"], s["text"]
    if kind == "title":
        return f"# {text}"
    if kind == "section_header":
        return f"## {text}"
    if kind == "list_item":
        return f"- {text}"
    return text


def render_ipynb(spans: list[dict]) -> bytes:
    """Span model → nbformat-4 JSON bytes. Consecutive non-code spans
    share one markdown cell; each code span is its own code cell."""
    cells: list[dict] = []
    md_run: list[str] = []

    def _flush() -> None:
        if md_run:
            cells.append(
                {
                    "cell_type": "markdown",
                    "metadata": {},
                    "source": "\n\n".join(md_run),
                }
            )
            md_run.clear()

    for s in spans:
        if s["kind"] == "code":
            _flush()
            cells.append(
                {
                    "cell_type": "code",
                    "execution_count": None,
                    "metadata": {},
                    "outputs": [],
                    "source": s["text"],
                }
            )
        elif s["kind"] in IPYNB_KINDS:
            md_run.append(_md_line(s))
        else:
            raise ValueError(f"ipynb documents carry {IPYNB_KINDS}, got {s['kind']!r}")
    _flush()
    nb = {"cells": cells, "metadata": {}, "nbformat": 4, "nbformat_minor": 5}
    return json.dumps(nb, ensure_ascii=False).encode("utf-8")
