"""Office / markup parsing + rendering (M4 family): docx, pptx, xlsx,
markdown, asciidoc.

In the reference these formats are delegated to docling backends selected by
the format router (docling_serve/datamodel/convert.py:115-125,
docling_conversion.py:72-79); from_formats defaults to all of
docx/pptx/html/image/pdf/asciidoc/md/xlsx. Here:

- synthetic "docx" payload = JSON block model {"blocks":[{"style", ...}]} —
  a stand-in for the unzipped OOXML paragraph stream; styles map 1:1 to
  span kinds.
- synthetic "pptx" payload = JSON slide model {"slides":[{"title",
  "items"}]} — the unzipped presentation stream: slide titles become
  section headers (first slide's title is the document title), shapes map
  to bullets / body text / images / tables / captions.
- synthetic "xlsx" payload = JSON workbook {"title", "sheets":[{"name",
  "rows"}]} — sheet names become section headers, each populated sheet is
  one table span.
- "md" payload = real Markdown text; the parser is a small block-level
  Markdown reader (headings, bullets, fenced code, paragraphs).
- "asciidoc" payload = real AsciiDoc text (= / == headings, * bullets,
  [source] ---- listing blocks, paragraphs).
"""

from __future__ import annotations

import json

_DOCX_STYLE_TO_KIND = {
    "Title": "title",
    "Heading1": "section_header",
    "Body": "paragraph",
    "ListBullet": "list_item",
    "Code": "code",
    "Caption": "caption",
}
_KIND_TO_DOCX_STYLE = {v: k for k, v in _DOCX_STYLE_TO_KIND.items()}


def render_docx(spans: list[dict]) -> bytes:
    blocks = []
    for s in spans:
        kind = s["kind"]
        if kind == "table":
            rows = [row.split(" | ") for row in s["text"].split("\n")]
            blocks.append({"style": "Table", "rows": rows})
        elif kind == "picture":
            blocks.append({"style": "Picture", "alt": s["text"]})
        else:
            blocks.append({"style": _KIND_TO_DOCX_STYLE[kind], "text": s["text"]})
    return json.dumps({"blocks": blocks}, ensure_ascii=False).encode("utf-8")


def parse_docx(payload: bytes, doc_id: str) -> list[dict]:
    doc = json.loads(payload.decode("utf-8"))
    spans = []
    for blk in doc["blocks"]:
        style = blk["style"]
        if style == "Table":
            text = "\n".join(" | ".join(r) for r in blk["rows"])
            spans.append({"kind": "table", "text": text})
        elif style == "Picture":
            spans.append({"kind": "picture", "text": blk.get("alt", "")})
        elif style in _DOCX_STYLE_TO_KIND:
            spans.append({"kind": _DOCX_STYLE_TO_KIND[style], "text": blk["text"]})
        else:
            spans.append({"kind": "paragraph", "text": blk.get("text", "")})
    return _finalize(spans, doc_id)


def render_pptx(spans: list[dict]) -> bytes:
    """Content spans → slide model. The document title and every
    section_header start a new slide; other kinds become that slide's
    shapes in order."""
    slides: list[dict] = []

    def new_slide(title=None):
        slides.append({"title": title, "items": []})

    for s in spans:
        kind = s["kind"]
        if kind in ("title", "section_header"):
            new_slide(s["text"])
            continue
        if not slides:
            new_slide(None)
        items = slides[-1]["items"]
        if kind == "table":
            items.append({"type": "table", "rows": [r.split(" | ") for r in s["text"].split("\n")]})
        elif kind == "picture":
            items.append({"type": "image", "alt": s["text"]})
        elif kind == "list_item":
            items.append({"type": "bullet", "text": s["text"]})
        elif kind == "caption":
            items.append({"type": "caption", "text": s["text"]})
        else:
            items.append({"type": "body", "text": s["text"]})
    return json.dumps({"slides": slides}, ensure_ascii=False).encode("utf-8")


def parse_pptx(payload: bytes, doc_id: str) -> list[dict]:
    doc = json.loads(payload.decode("utf-8"))
    spans = []
    for i, slide in enumerate(doc.get("slides", [])):
        if slide.get("title") is not None:
            spans.append(
                {"kind": "title" if i == 0 else "section_header", "text": slide["title"]}
            )
        for item in slide.get("items", []):
            t = item.get("type")
            if t == "table":
                spans.append(
                    {"kind": "table", "text": "\n".join(" | ".join(r) for r in item["rows"])}
                )
            elif t == "image":
                spans.append({"kind": "picture", "text": item.get("alt", "")})
            elif t == "bullet":
                spans.append({"kind": "list_item", "text": item["text"]})
            elif t == "caption":
                spans.append({"kind": "caption", "text": item["text"]})
            else:
                spans.append({"kind": "paragraph", "text": item.get("text", "")})
    return _finalize(spans, doc_id)


def render_xlsx(spans: list[dict]) -> bytes:
    """Content spans → workbook model. The leading title span becomes the
    workbook title property; a section_header names the next sheet; each
    table span is one sheet's cell grid (unnamed if no preceding header)."""
    title = ""
    rest = spans
    if spans and spans[0]["kind"] == "title":
        title = spans[0]["text"]
        rest = spans[1:]
    sheets: list[dict] = []
    pending_name = None
    for s in rest:
        if s["kind"] == "section_header":
            if pending_name is not None:
                sheets.append({"name": pending_name, "rows": None})
            pending_name = s["text"]
        elif s["kind"] == "table":
            sheets.append(
                {
                    "name": pending_name,
                    "rows": [r.split(" | ") for r in s["text"].split("\n")],
                }
            )
            pending_name = None
    if pending_name is not None:
        sheets.append({"name": pending_name, "rows": None})
    return json.dumps({"title": title, "sheets": sheets}, ensure_ascii=False).encode("utf-8")


def parse_xlsx(payload: bytes, doc_id: str) -> list[dict]:
    doc = json.loads(payload.decode("utf-8"))
    spans = []
    if doc.get("title"):
        spans.append({"kind": "title", "text": doc["title"]})
    for sheet in doc.get("sheets", []):
        if sheet.get("name") is not None:
            spans.append({"kind": "section_header", "text": sheet["name"]})
        if sheet.get("rows") is not None:
            spans.append(
                {"kind": "table", "text": "\n".join(" | ".join(r) for r in sheet["rows"])}
            )
    return _finalize(spans, doc_id)


def render_asciidoc(spans: list[dict]) -> bytes:
    blocks = []
    for s in spans:
        kind, text = s["kind"], s["text"]
        if kind == "title":
            blocks.append(f"= {text}")
        elif kind == "section_header":
            blocks.append(f"== {text}")
        elif kind == "list_item":
            blocks.append(f"* {text}")
        elif kind == "code":
            blocks.append("[source]\n----\n" + text + "\n----")
        else:
            blocks.append(text)
    return "\n\n".join(blocks).encode("utf-8")


def parse_asciidoc(payload: bytes, doc_id: str) -> list[dict]:
    text = payload.decode("utf-8")
    blocks: list[str] = []
    cur: list[str] = []
    in_listing = False
    for line in text.split("\n"):
        if line == "----":
            in_listing = not in_listing
            cur.append(line)
            if not in_listing:
                blocks.append("\n".join(cur))
                cur = []
            continue
        if in_listing:
            cur.append(line)
        elif line.strip() == "":
            if cur:
                blocks.append("\n".join(cur))
                cur = []
        else:
            cur.append(line)
    if cur:
        blocks.append("\n".join(cur))

    spans = []
    seen_title = False
    for blk in blocks:
        if blk.startswith("[source]\n----\n") and blk.endswith("\n----"):
            spans.append({"kind": "code", "text": blk[len("[source]\n----\n") : -len("\n----")]})
        elif blk.startswith("== "):
            spans.append({"kind": "section_header", "text": blk[3:]})
        elif blk.startswith("= "):
            kind = "section_header" if seen_title else "title"
            seen_title = True
            spans.append({"kind": kind, "text": blk[2:]})
        elif blk.startswith("* "):
            for line in blk.split("\n"):
                spans.append({"kind": "list_item", "text": line[2:]})
        else:
            spans.append({"kind": "paragraph", "text": blk.replace("\n", " ")})
    return _finalize(spans, doc_id)


def render_markdown_doc(spans: list[dict]) -> bytes:
    lines = []
    for s in spans:
        kind, text = s["kind"], s["text"]
        if kind == "title":
            lines.append(f"# {text}")
        elif kind == "section_header":
            lines.append(f"## {text}")
        elif kind == "list_item":
            lines.append(f"- {text}")
        elif kind == "code":
            lines.append("```\n" + text + "\n```")
        else:
            lines.append(text)
    return "\n\n".join(lines).encode("utf-8")


def parse_markdown_doc(payload: bytes, doc_id: str) -> list[dict]:
    text = payload.decode("utf-8")
    spans = []
    blocks = []
    # split into blocks on blank lines, keeping fenced code intact
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

    seen_title = False
    for blk in blocks:
        if blk.startswith("```"):
            body = blk.split("\n")[1:-1]
            spans.append({"kind": "code", "text": "\n".join(body)})
        elif blk.startswith("# "):
            kind = "section_header" if seen_title else "title"
            seen_title = True
            spans.append({"kind": kind, "text": blk[2:]})
        elif blk.startswith("## "):
            spans.append({"kind": "section_header", "text": blk[3:]})
        elif blk.startswith("- "):
            for line in blk.split("\n"):
                spans.append({"kind": "list_item", "text": line[2:]})
        else:
            spans.append({"kind": "paragraph", "text": blk.replace("\n", " ")})
    return _finalize(spans, doc_id)


def _finalize(spans: list[dict], doc_id: str) -> list[dict]:
    out = []
    media_k = 0
    for i, s in enumerate(spans):
        if s["kind"] in ("picture", "table"):
            media_ref = f"media-{doc_id}-{media_k}"
            media_k += 1
        else:
            media_ref = ""
        out.append({"kind": s["kind"], "text": s["text"], "media_ref": media_ref, "offset": i})
    return out
