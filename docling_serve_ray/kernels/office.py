"""DOCX (block-model JSON) and Markdown parsing + rendering (M4 family).

In the reference these formats are delegated to docling backends selected by
the format router (docling_serve/datamodel/convert.py:115-125,
docling_conversion.py:72-79). Here:

- synthetic "docx" payload = JSON block model {"blocks":[{"style", ...}]} —
  a stand-in for the unzipped OOXML paragraph stream; styles map 1:1 to
  span kinds.
- "md" payload = real Markdown text; the parser is a small block-level
  Markdown reader (headings, bullets, fenced code, paragraphs).
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
