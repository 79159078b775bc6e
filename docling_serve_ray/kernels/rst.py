"""reStructuredText parsing through a REAL foreign backend (docutils).

Unlike the synthetic docx/pptx/xlsx block models, the RST path runs an
actual third-party document parser end to end: ``render_rst`` emits
genuine reStructuredText (adorned titles, bullet lists, literal blocks)
and ``parse_rst`` recovers the span sequence by walking the doctree
``docutils.core.publish_doctree`` builds — the same prove-the-seam role
the expat backend plays for HTML (kernels/html.py) and charset_normalizer
for decoding (kernels/decode.py). Reference analog: the format router in
docling-serve delegates each format to a docling backend
(docling_serve/docling_conversion.py:72-79); RST itself is this suite's
own extension format.

Supported span kinds (RST_KINDS): title, section_header, paragraph,
list_item, code — the subset reStructuredText structure maps 1:1 onto.
"""

from __future__ import annotations

RST_KINDS = {"title", "section_header", "paragraph", "list_item", "code"}

# Cached parser + settings, built once per process (once per actor): the
# publish_doctree convenience path re-creates Publisher/OptionParser per
# call (~15% of the ~20 ms/doc parse cost). The DocTitle transform is
# applied manually — it is what promotes a lone top section to the
# document title in the publish path (walker-equality vs publish_doctree
# verified over the generator's rst population).
_CACHED = None


def _parse_doctree(text: str):
    global _CACHED
    from docutils.frontend import get_default_settings
    from docutils.parsers.rst import Parser
    from docutils.transforms import Transformer
    from docutils.transforms.frontmatter import DocTitle
    from docutils.utils import new_document

    if _CACHED is None:
        parser = Parser()
        settings = get_default_settings(Parser)
        settings.report_level = 5
        settings.halt_level = 5
        settings.file_insertion_enabled = False  # no fs reads from payloads
        settings.raw_enabled = False
        _CACHED = (parser, settings)
    parser, settings = _CACHED
    doc = new_document("<payload>", settings)
    parser.parse(text, doc)
    t = Transformer(doc)
    t.add_transform(DocTitle)
    t.apply_transforms()
    return doc


def render_rst(spans: list[dict]) -> bytes:
    """Ground-truth spans → reStructuredText source (generator side)."""
    blocks = []
    for s in spans:
        kind, text = s["kind"], s["text"]
        if kind == "title":
            blocks.append(f"{text}\n{'=' * max(3, len(text))}")
        elif kind == "section_header":
            blocks.append(f"{text}\n{'-' * max(3, len(text))}")
        elif kind == "list_item":
            blocks.append(f"- {text}")
        elif kind == "code":
            body = "\n".join("    " + ln for ln in text.split("\n"))
            blocks.append("::\n\n" + body)
        else:
            blocks.append(text)
    return "\n\n".join(blocks).encode("utf-8")


def parse_rst(payload: bytes, doc_id: str) -> list[dict]:
    """RST payload → ordered spans via the docutils doctree.

    Walks the parsed tree in document order: the promoted document title
    (or a section title at document depth when only one heading exists)
    becomes the ``title`` span, nested section titles become
    ``section_header``, bullet-list items flatten to ``list_item`` rows,
    literal blocks to ``code``, everything else textual to ``paragraph``.
    Unknown node types (system messages, comments) are skipped — the
    backend's recovery behavior, not an error path."""
    from docutils import nodes

    text = payload.decode("utf-8")
    doc = _parse_doctree(text)

    spans: list[dict] = []

    def emit(kind: str, txt: str) -> None:
        spans.append({"kind": kind, "text": txt})

    def visit(node, in_section: bool) -> None:
        for child in node.children:
            if isinstance(child, nodes.title):
                emit("section_header" if in_section else "title", child.astext())
            elif isinstance(child, nodes.subtitle):
                # DocTitle ALSO promotes a lone second-level section title
                # to a document subtitle — structurally it was a
                # section_header in the source, so it must round-trip as
                # one (dropping it loses a span on [title, header, ...]
                # documents with exactly one header)
                emit("section_header", child.astext())
            elif isinstance(child, nodes.section):
                visit(child, True)
            elif isinstance(child, nodes.bullet_list):
                for li in child.children:
                    if isinstance(li, nodes.list_item):
                        emit("list_item", li.astext())
            elif isinstance(child, nodes.literal_block):
                emit("code", child.astext())
            elif isinstance(child, nodes.paragraph):
                emit("paragraph", child.astext())
            # anything else (system_message, comment, ...) is skipped

    # docutils promotes a lone top-level section's title onto the document
    if doc.get("title") and (not doc.children or not isinstance(doc.children[0], nodes.title)):
        emit("title", doc["title"])
    visit(doc, False)

    from .office import _finalize

    return _finalize(spans, doc_id)
