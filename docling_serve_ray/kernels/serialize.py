"""Span-sequence → export-format serializers (K2 in SURVEY.md §2.5).

Pure serializers deriving the reference's export columns from the span
model: markdown (reference export_to_markdown surface,
response_preparation.py:87-105; heading shape pinned by the golden assertion
``## DocLayNet:`` in reference tests/test_1-file-all-outputs.py:74-79),
strict text (markdown-stripped, response_preparation.py:94-98), and doctags
(shape pinned by ``<doctag><page_header><loc`` at
tests/test_1-file-all-outputs.py:118-122).

Page furniture (page_header / page_footer / page_break) is excluded from
markdown and text exports — docling's default export labels — but kept in
doctags, which is the lossless serialization.
"""

from __future__ import annotations

from ..schema import FURNITURE_KINDS


def _md_table(text: str) -> str:
    rows = [r.split(" | ") for r in text.split("\n")]
    if not rows:
        return ""
    out = ["| " + " | ".join(rows[0]) + " |"]
    out.append("|" + "---|" * len(rows[0]))
    for row in rows[1:]:
        out.append("| " + " | ".join(row) + " |")
    return "\n".join(out)


IMAGE_PLACEHOLDER = "<!-- image -->"


def spans_to_markdown(
    spans: list[dict],
    page_break_placeholder: str = "",
    image_mode: str = "referenced",
    code_language_fn=None,
) -> str:
    """Markdown export. ``page_break_placeholder`` mirrors the reference's
    md_page_break_placeholder option (convert.py:299-305): empty string =
    page breaks dropped. ``image_mode`` is the ImageRefMode analog
    (convert.py:139-151): referenced (default) links the sidecar media_ref,
    placeholder emits a fixed marker, embedded emits the referenced form
    here and is completed by pipelines.media.embed_media_exports (bytes
    live in the sidecar table, not in the serializer).
    ``code_language_fn`` is the do_code_enrichment analog (docling emits
    the classified language on the fence): None/"" keeps the bare fence."""
    parts = []
    for s in spans:
        kind, text = s["kind"], s["text"]
        if kind == "page_break":
            if page_break_placeholder:
                parts.append(page_break_placeholder)
            continue
        if kind in FURNITURE_KINDS:
            continue
        if kind == "title":
            parts.append(f"# {text}")
        elif kind == "section_header":
            parts.append(f"## {text}")
        elif kind == "list_item":
            parts.append(f"- {text}")
        elif kind == "code":
            lang = code_language_fn(text) if code_language_fn is not None else ""
            parts.append(f"```{lang}\n" + text + "\n```")
        elif kind == "formula":
            parts.append(f"$${text}$$")
        elif kind == "table":
            parts.append(_md_table(text))
        elif kind == "picture":
            if image_mode == "placeholder":
                parts.append(IMAGE_PLACEHOLDER)
            else:
                parts.append(f"![{text}]({s['media_ref']})")
        elif kind == "caption":
            parts.append(f"*{text}*")
        else:
            parts.append(text)
    return "\n\n".join(parts)


def spans_to_text(spans: list[dict]) -> str:
    """Strict plain text: prose content only, markdown syntax stripped
    (reference strict_text export, response_preparation.py:94-98)."""
    parts = []
    for s in spans:
        if s["kind"] in FURNITURE_KINDS or s["kind"] == "picture":
            continue
        if s["text"]:
            parts.append(s["text"])
    return "\n\n".join(parts)


def spans_to_html(
    spans: list[dict], title: str = "", image_mode: str = "referenced"
) -> str:
    """HTML export (reference html_content, response_preparation.py:93;
    golden shape asserts the page starts with ``<!DOCTYPE html>``). One
    top-level element per content span, newline-joined; consecutive
    list_items grouped into one ``<ul>``; furniture excluded like md."""
    import html as _html

    def esc(t: str) -> str:
        return _html.escape(t, quote=False)

    head_title = title or next((s["text"] for s in spans if s["kind"] == "title"), "")
    parts = [
        "<!DOCTYPE html>",
        f'<html><head><meta charset="utf-8"/><title>{esc(head_title)}</title></head><body>',
    ]
    ul: list[str] = []

    def flush_ul():
        if ul:
            parts.append("<ul>" + "".join(ul) + "</ul>")
            ul.clear()

    for s in spans:
        kind, text = s["kind"], s["text"]
        if kind == "page_break" or kind in FURNITURE_KINDS:
            continue
        if kind == "list_item":
            ul.append(f"<li>{esc(text)}</li>")
            continue
        flush_ul()
        if kind == "title":
            parts.append(f"<h1>{esc(text)}</h1>")
        elif kind == "section_header":
            parts.append(f"<h2>{esc(text)}</h2>")
        elif kind == "table":
            tr = "".join(
                "<tr>" + "".join(f"<td>{esc(c)}</td>" for c in row.split(" | ")) + "</tr>"
                for row in text.split("\n")
            )
            parts.append(f"<table>{tr}</table>")
        elif kind == "picture":
            if image_mode == "placeholder":
                parts.append(IMAGE_PLACEHOLDER)
            else:
                parts.append(
                    f'<figure><img src="assets/{s["media_ref"]}.png" alt="{_html.escape(text)}"/></figure>'
                )
        elif kind == "code":
            parts.append(f"<pre><code>{esc(text)}</code></pre>")
        elif kind == "formula":
            parts.append(f'<div class="formula">{esc(text)}</div>')
        elif kind == "caption":
            parts.append(f"<figcaption>{esc(text)}</figcaption>")
        else:
            parts.append(f"<p>{esc(text)}</p>")
    flush_ul()
    parts.append("</body></html>")
    return "\n".join(parts)


def spans_to_json(spans: list[dict], doc_id: str = "") -> str:
    """Lossless DoclingDocument-shaped JSON export (reference json_content,
    response_preparation.py:44; golden shape asserts ``"schema_name":
    "DoclingDocument"``). Round-trips: json.loads(...)["body"] == spans."""
    import json as _json

    doc = {
        "schema_name": "DoclingDocument",
        "version": "1.0.0",
        "name": doc_id,
        "body": [
            {
                "kind": s["kind"],
                "text": s["text"],
                "media_ref": s["media_ref"],
                "offset": s["offset"],
            }
            for s in spans
        ],
    }
    return _json.dumps(doc, ensure_ascii=False, separators=(",", ":"))


def spans_to_doctags(spans: list[dict]) -> str:
    """Lossless doctags serialization: ``<doctag>`` wrapper, one
    ``<{kind}><loc_{offset}>{text}</{kind}>`` element per span in reading
    order (shape per the reference's golden assertion)."""
    parts = ["<doctag>"]
    for s in spans:
        kind = s["kind"]
        loc = f"<loc_{s['offset']}>"
        ref = f"<ref_{s['media_ref']}>" if s["media_ref"] else ""
        parts.append(f"<{kind}>{loc}{ref}{s['text']}</{kind}>")
    parts.append("</doctag>")
    return "".join(parts)
