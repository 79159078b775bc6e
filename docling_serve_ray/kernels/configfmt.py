"""Config-document parsing through REAL foreign backends: PyYAML
(C-accelerated CSafeLoader/CSafeDumper when libyaml is present) for
``.yaml``, and the stdlib ``tomllib`` parser for ``.toml``.

A config document is a two-level mapping rendered as ordered spans:
optional root-level pairs first (TOML requires root pairs before any
table), then one ``section_header`` span per top-level table followed by
one ``list_item`` span per key: ``"key = value"``. Deeper nesting
flattens to dotted key paths and lists flatten to ``key[i]`` — both
deterministic, so foreign config files still produce a stable span
sequence. Values format canonically: strings as-is, bools ``true``/
``false`` (checked before int — bool is an int subclass), ints/floats
via str/repr, null as ``null``.

Round-trip contract (the generator's T2 invariant): ``render_yaml`` /
``render_toml`` accept the span model back and re-type a value as int
iff its text is a bare integer literal — the generator only emits
word-phrase strings and ints, so render∘parse is the identity there.
Non-ASCII keys (the corpus carries Arabic/Greek pools) are emitted as
quoted TOML keys / unicode YAML keys, which both parsers accept.

Reference analog: docling's per-format backend router
(docling_serve/docling_conversion.py:72-79); yaml/toml are this suite's
own extensions, the 5th and 6th real third-party parser seams alongside
expat (html), docutils (rst), stdlib-csv, charset_normalizer and
Pygments.
"""

from __future__ import annotations

import json
import re

import yaml

try:  # stdlib since 3.11
    import tomllib
except ImportError:  # pragma: no cover
    tomllib = None

CONFIG_KINDS = {"section_header", "list_item"}

_INT_RE = re.compile(r"^-?[0-9]+$")


def _fmt_value(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if v is None:
        return "null"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def _scalar_spans(key: str, v, out: list) -> None:
    if isinstance(v, dict):  # depth > 2: dotted flatten
        for k2, v2 in v.items():
            _scalar_spans(f"{key}.{k2}", v2, out)
    elif isinstance(v, list):
        for i, v2 in enumerate(v):
            _scalar_spans(f"{key}[{i}]", v2, out)
    else:
        out.append({"kind": "list_item", "text": f"{key} = {_fmt_value(v)}"})


def _mapping_spans(data: dict) -> list[dict]:
    spans: list[dict] = []
    for k, v in data.items():
        if isinstance(v, dict):
            spans.append({"kind": "section_header", "text": str(k)})
            for k2, v2 in v.items():
                _scalar_spans(str(k2), v2, spans)
        else:
            _scalar_spans(str(k), v, spans)
    return spans


def _retype(text: str):
    return int(text) if _INT_RE.match(text) else text


def _spans_to_mapping(spans: list[dict]) -> dict:
    """Span model → {root pairs..., section: {pairs...}} (render side)."""
    data: dict = {}
    section: dict | None = None
    for s in spans:
        if s["kind"] == "section_header":
            section = {}
            data[s["text"]] = section
        elif s["kind"] == "list_item":
            k, sep, vtext = s["text"].partition(" = ")
            if not sep:
                raise ValueError(f"config list_item without ' = ': {s['text']!r}")
            (section if section is not None else data)[k] = _retype(vtext)
        else:
            raise ValueError(f"config documents carry {CONFIG_KINDS}, got {s['kind']!r}")
    return data


def render_yaml(spans: list[dict]) -> bytes:
    return yaml.safe_dump(
        _spans_to_mapping(spans), sort_keys=False, allow_unicode=True
    ).encode("utf-8")


def parse_yaml(payload: bytes, doc_id: str) -> list[dict]:
    """YAML payload → spans via yaml.safe_load (REAL backend). Load errors
    raise and become failure rows in convert_document."""
    data = yaml.safe_load(payload.decode("utf-8"))
    if data is None:
        data = {}
    if not isinstance(data, dict):
        raise ValueError("config document root must be a mapping")
    from .office import _finalize

    return _finalize(_mapping_spans(data), doc_id)


def _toml_key(k: str) -> str:
    return k if re.match(r"^[A-Za-z0-9_-]+$", k) else json.dumps(k, ensure_ascii=False)


def _toml_value(v) -> str:
    if isinstance(v, int):  # bools never reach here (render _retype: int|str)
        return str(v)
    return json.dumps(v, ensure_ascii=False)


def render_toml(spans: list[dict]) -> bytes:
    """Span model → TOML bytes. The WRITER is ours (stdlib has none); the
    parse side is the real tomllib — the docutils/rst asymmetry."""
    data = _spans_to_mapping(spans)
    lines: list[str] = []
    sections: list[tuple[str, dict]] = []
    for k, v in data.items():
        if isinstance(v, dict):
            sections.append((k, v))
        else:
            lines.append(f"{_toml_key(k)} = {_toml_value(v)}")
    for name, body in sections:
        lines.append(f"[{_toml_key(name)}]")
        for k, v in body.items():
            lines.append(f"{_toml_key(k)} = {_toml_value(v)}")
    return ("\n".join(lines) + "\n").encode("utf-8")


def parse_toml(payload: bytes, doc_id: str) -> list[dict]:
    """TOML payload → spans via stdlib tomllib (REAL backend, 3.11+)."""
    if tomllib is None:  # pragma: no cover
        raise ImportError("tomllib unavailable (python < 3.11)")
    data = tomllib.loads(payload.decode("utf-8"))
    from .office import _finalize

    return _finalize(_mapping_spans(data), doc_id)


# ---------------------------------------------------------------------------
# ini — stdlib configparser (the 8th real foreign parser seam)
# ---------------------------------------------------------------------------

def _ini_parser():
    import configparser

    p = configparser.ConfigParser(
        interpolation=None, delimiters=("=",), comment_prefixes=("#", ";")
    )
    p.optionxform = str  # preserve key case (default lowercases)
    return p


def render_ini(spans: list[dict]) -> bytes:
    """Span model → INI bytes. Root pairs live in ``[DEFAULT]`` (the only
    place configparser allows section-less keys); sections follow. Keys
    that configparser cannot write back losslessly ("=", newline, a
    leading "[") are rejected loudly rather than silently corrupted."""
    data = _spans_to_mapping(spans)
    lines: list[str] = []

    def _emit(k: str, v) -> None:
        if "=" in k or "\n" in k or k.startswith("["):
            raise ValueError(f"key not INI-representable: {k!r}")
        lines.append(f"{k} = {_fmt_value(v)}")

    roots = [(k, v) for k, v in data.items() if not isinstance(v, dict)]
    if roots:
        lines.append("[DEFAULT]")
        for k, v in roots:
            _emit(k, v)
    for name, body in data.items():
        if isinstance(body, dict):
            lines.append(f"[{name}]")
            for k, v in body.items():
                _emit(k, v)
    return ("\n".join(lines) + "\n").encode("utf-8")


def parse_ini(payload: bytes, doc_id: str) -> list[dict]:
    """INI payload → spans via stdlib configparser (REAL backend).

    ``[DEFAULT]`` keys surface once as root pairs; configparser mirrors
    them into every section, so per-section items drop keys whose value
    equals the default (a section override with a DIFFERENT value is
    kept). configparser values are untyped strings — ``_retype`` on the
    render side restores bare-int literals, matching yaml/toml."""
    p = _ini_parser()
    p.read_string(payload.decode("utf-8"))
    data: dict = {}
    defaults = dict(p.defaults())
    for k, v in defaults.items():
        data[k] = v
    for name in p.sections():
        body = {}
        for k, v in p.items(name):
            if k in defaults and defaults[k] == v:
                continue  # inherited DEFAULT mirror, not a section key
            body[k] = v
        data[name] = body
    from .office import _finalize

    return _finalize(_mapping_spans(data), doc_id)
