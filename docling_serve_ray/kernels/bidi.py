"""BiDi / RTL markdown post-processing (M9 in SURVEY.md §2.2).

Behavioral twin of the reference's post_processing_bidi.py: a line is RTL if
it contains any codepoint in U+0600–U+06FF (:17-21); a leading markdown
prefix (headings ``#{1,6}``, bullets ``-+*``, blockquote ``>``) is preserved
verbatim (:25-33); the body is reordered with a Unicode-BiDi display
transform (:37); the processed document replaces the original only when it
differs (:113-119).

The reference calls python-bidi's ``get_display``; that library is not in
this container, so ``get_display`` below is a from-scratch *simplified*
Unicode BiDi (strong L/R runs, European numbers kept LTR, neutrals resolved
to surrounding/base direction, bracket mirroring in RTL runs). It is the
single implementation shared by the pipeline and the sequential oracle, so
span/export equality is independent of how closely it tracks the full UBA.
"""

from __future__ import annotations

import re

ARABIC_RE = re.compile(r"[؀-ۿ]")
_PREFIX_RE = re.compile(
    r"^(?P<prefix>\s*(?:#{1,6}\s+|[-+*]\s+|>\s*))?(?P<body>.*?)(?P<nl>\n?)$",
    re.S,
)

_MIRROR = {"(": ")", ")": "(", "[": "]", "]": "[", "{": "}", "}": "{", "<": ">", ">": "<"}


_TYPE_CACHE: dict[str, str] = {}


def _char_type(c: str) -> str:
    t = _TYPE_CACHE.get(c)
    if t is not None:
        return t
    o = ord(c)
    if 0x0600 <= o <= 0x06FF or 0xFB50 <= o <= 0xFDFF or 0xFE70 <= o <= 0xFEFF:
        t = "R"
    elif c.isdigit():
        t = "EN"
    elif c.isalpha():
        t = "L"
    else:
        t = "N"
    _TYPE_CACHE[c] = t
    return t


def get_display(text: str) -> str:
    """Simplified UBA logical→visual reorder. Base direction = type of the
    first strong character (L if none)."""
    if not text:
        return text
    types = [_char_type(c) for c in text]

    # exact fast paths (provably identical to the general algorithm):
    # - no strong R: base is L, runs stay in logical order, nothing flips
    # - only R + neutrals: all neutrals resolve to R, one run, one flip
    if "R" not in types:
        return text
    if "L" not in types and "EN" not in types:
        return "".join(_MIRROR.get(c, c) for c in reversed(text))

    base = "L"
    for t in types:
        if t in ("L", "R"):
            base = t
            break

    # European numbers keep LTR internal order; as run units they behave like
    # embedded LTR content inside an RTL base.
    resolved = list(types)
    n = len(text)
    # Resolve neutrals: between two identical strong-ish types → that type,
    # else base direction.
    i = 0
    while i < n:
        if resolved[i] == "N":
            j = i
            while j < n and resolved[j] == "N":
                j += 1
            prev_t = resolved[i - 1] if i > 0 else base
            next_t = resolved[j] if j < n else base
            fill = prev_t if prev_t == next_t else base
            for k in range(i, j):
                resolved[k] = fill
            i = j
        else:
            i += 1
    # After neutral resolution, EN runs act as LTR units.
    unit = ["L" if t == "EN" else t for t in resolved]

    # Build runs of consecutive identical direction.
    runs: list[tuple[str, str]] = []  # (direction, chunk)
    start = 0
    for i in range(1, n + 1):
        if i == n or unit[i] != unit[start]:
            runs.append((unit[start], text[start:i]))
            start = i

    def flip(chunk: str) -> str:
        return "".join(_MIRROR.get(c, c) for c in reversed(chunk))

    if base == "R":
        visual = [flip(chunk) if d == "R" else chunk for d, chunk in reversed(runs)]
    else:
        visual = [flip(chunk) if d == "R" else chunk for d, chunk in runs]
    return "".join(visual)


def process_line(raw: str) -> str:
    """Reference Line.reversed() semantics: keep markdown prefix + newline,
    BiDi-transform the body."""
    m = _PREFIX_RE.match(raw)
    prefix = m.group("prefix") or ""
    body = m.group("body") or ""
    nl = m.group("nl") or ""
    return prefix + get_display(body) + nl


def process_markdown(text: str) -> str:
    """Reference MarkdownProcessor.process(): LTR lines untouched, RTL lines
    (any Arabic codepoint) transformed. Consecutive-RTL grouping in the
    reference has no observable effect on output (RTLBlock.render() is a
    plain concat of per-line transforms, post_processing_bidi.py:50-57)."""
    out = []
    for line in text.splitlines(keepends=True):
        if ARABIC_RE.search(line):
            out.append(process_line(line))
        else:
            out.append(line)
    return "".join(out)


def apply_bidi_if_changed(md_content: str) -> tuple[str, bool]:
    """Reference worker semantics: only replace when processing changed the
    text (post_processing_bidi.py:113-119). Returns (content, applied)."""
    if not md_content:
        return md_content, False
    processed = process_markdown(md_content)
    if processed != md_content:
        return processed, True
    return md_content, False
