"""Property-based tests (hypothesis) for the deterministic kernels —
round-trip and invariant properties over generated inputs, beyond the
fixed-seed corpus."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from docling_serve_ray.kernels import bidi
from docling_serve_ray.kernels.glyphs import (
    build_reverse_codebook,
    decode_glyphs,
    encode_glyphs,
)
from docling_serve_ray.kernels.html import extract_html, render_html
from docling_serve_ray.kernels.office import (
    parse_docx,
    parse_markdown_doc,
    render_docx,
    render_markdown_doc,
)
from docling_serve_ray.kernels.quality import analyze_page_texts
from docling_serve_ray.kernels.serialize import spans_to_doctags

REV = build_reverse_codebook()

# word-ish text: no markdown/table/html metacharacters, single-spaced
_word = st.text(alphabet=string.ascii_letters + string.digits, min_size=1, max_size=10)
_text = st.lists(_word, min_size=1, max_size=12).map(" ".join)
_arabic_word = st.text(alphabet="ابتثجحخدذرزسشصضطظعغفقكلمنهوي", min_size=1, max_size=8)
_arabic_text = st.lists(_arabic_word, min_size=1, max_size=10).map(" ".join)

# non-title body kinds: the extractor maps only the FIRST h1 to title (by
# design), so generated docs have at most one title, leading — the same
# shape the corpus generator guarantees
_BODY_KIND = st.sampled_from(
    ["section_header", "paragraph", "list_item", "caption", "formula"]
)
_DOCX_BODY_KIND = st.sampled_from(
    ["section_header", "paragraph", "list_item", "caption"]  # docx has no formula
)


def _span(kind, text):
    return {"kind": kind, "text": text, "media_ref": "", "offset": -1}


def _doc_spans(body_kind):
    return st.tuples(
        _text,
        st.lists(
            st.tuples(body_kind, _text).map(lambda kt: _span(*kt)),
            min_size=0,
            max_size=11,
        ),
    ).map(lambda tb: [_span("title", tb[0])] + tb[1])


_spans = _doc_spans(_BODY_KIND)
_docx_spans = _doc_spans(_DOCX_BODY_KIND)


class TestHtmlRoundTrip:
    @settings(max_examples=60, deadline=None)
    @given(_spans)
    def test_render_extract_identity(self, spans):
        html = render_html(spans, "prop-doc")
        got = extract_html(html, "prop-doc")
        assert [(s["kind"], s["text"]) for s in got] == [
            (s["kind"], s["text"]) for s in spans
        ]
        assert [s["offset"] for s in got] == list(range(len(got)))

    @settings(max_examples=30, deadline=None)
    @given(_spans, st.integers(0, 3))
    def test_boilerplate_always_dropped(self, spans, n_ads):
        raw = [_span("boilerplate_nav", "Home About Contact")]
        for i, s in enumerate(spans):
            raw.append(s)
            if i < n_ads:
                raw.append(_span("boilerplate_ad", "Buy now great deals"))
        raw.append(_span("boilerplate_footer", "Privacy Terms"))
        got = extract_html(render_html(raw, "d"), "d")
        assert [(s["kind"], s["text"]) for s in got] == [
            (s["kind"], s["text"]) for s in spans
        ]


class TestRstRoundTrip:
    """Real-docutils round-trip over the full generated shape space —
    the subtitle-promotion bug (lone header right after the title) was
    exactly the kind of structural corner a sampled corpus scan missed."""

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.sampled_from(["section_header", "paragraph", "list_item", "code"]),
                _text,
            ).map(lambda kt: _span(*kt)),
            min_size=0,
            max_size=10,
        )
    )
    def test_rst(self, spans):
        from docling_serve_ray.kernels.rst import parse_rst, render_rst

        spans = [_span("title", "The Title Words")] + spans
        got = parse_rst(render_rst(spans), "d")
        assert [(s["kind"], s["text"]) for s in got] == [
            (s["kind"], s["text"]) for s in spans
        ]
        assert [s["offset"] for s in got] == list(range(len(got)))


class TestOfficeRoundTrip:
    @settings(max_examples=60, deadline=None)
    @given(_docx_spans)
    def test_docx(self, spans):
        got = parse_docx(render_docx(spans), "d")
        assert [(s["kind"], s["text"]) for s in got] == [
            (s["kind"], s["text"]) for s in spans
        ]

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.sampled_from(["section_header", "paragraph", "list_item"]), _text
            ).map(lambda kt: _span(*kt)),
            min_size=1,
            max_size=10,
        )
    )
    def test_markdown(self, spans):
        # first span must be a title for the md block model
        spans = [_span("title", "The Title")] + spans
        got = parse_markdown_doc(render_markdown_doc(spans), "d")
        assert [(s["kind"], s["text"]) for s in got] == [
            (s["kind"], s["text"]) for s in spans
        ]


class TestGlyphRoundTrip:
    @settings(max_examples=100, deadline=None)
    @given(st.one_of(_text, _arabic_text))
    def test_encode_decode(self, text):
        assert decode_glyphs(encode_glyphs(text), REV) == text


class TestBidiProperties:
    @settings(max_examples=100, deadline=None)
    @given(_text)
    def test_ltr_fixed_point(self, text):
        assert bidi.process_markdown(text) == text

    @settings(max_examples=100, deadline=None)
    @given(_arabic_text)
    def test_length_preserved(self, text):
        assert len(bidi.get_display(text)) == len(text)

    @settings(max_examples=100, deadline=None)
    @given(_arabic_text, st.sampled_from(["# ", "## ", "- ", "> "]))
    def test_prefix_preserved(self, text, prefix):
        out = bidi.process_line(prefix + text + "\n")
        assert out.startswith(prefix)
        assert out.endswith("\n")

    @settings(max_examples=60, deadline=None)
    @given(_arabic_text)
    def test_pure_rtl_is_reversal(self, text):
        # pure Arabic + spaces has no LTR runs or mirrored chars
        assert bidi.get_display(text) == text[::-1]


class TestQualityProperties:
    @settings(max_examples=60, deadline=None)
    @given(st.lists(_text, min_size=1, max_size=6))
    def test_clean_text_never_poor(self, pages):
        r = analyze_page_texts(pages, is_tagged=True)
        assert r["text_quality"] == "good"
        assert r["recommended_mode"] == "skip"

    @settings(max_examples=60, deadline=None)
    @given(st.lists(_text, min_size=1, max_size=6))
    def test_untagged_clean_redo(self, pages):
        assert analyze_page_texts(pages, is_tagged=False)["recommended_mode"] == "redo"


class TestDoctagsProperties:
    @settings(max_examples=60, deadline=None)
    @given(_spans)
    def test_every_span_serialized(self, spans):
        for i, s in enumerate(spans):
            s["offset"] = i
        dt = spans_to_doctags(spans)
        assert dt.startswith("<doctag>") and dt.endswith("</doctag>")
        for s in spans:
            assert f"<loc_{s['offset']}>" in dt
            assert s["text"] in dt


class TestFastParserEquivalence:
    """parse_dom_fast must build the same tree as the stdlib reference
    parser (adjacent text nodes merged — the tokenizers split differently)."""

    @staticmethod
    def _tree_eq(a, b):
        from docling_serve_ray.kernels.html import Node

        if isinstance(a, str) != isinstance(b, str):
            return False
        if isinstance(a, str):
            return a == b
        if a.tag != b.tag or a.attrs != b.attrs:
            return False

        def norm(ch):
            out = []
            for c in ch:
                if isinstance(c, str) and out and isinstance(out[-1], str):
                    out[-1] += c
                else:
                    out.append(c)
            return out

        ca, cb = norm(a.children), norm(b.children)
        return len(ca) == len(cb) and all(
            TestFastParserEquivalence._tree_eq(x, y) for x, y in zip(ca, cb)
        )

    @settings(max_examples=60, deadline=None)
    @given(_spans)
    def test_generated_pages(self, spans):
        from docling_serve_ray.kernels.html import parse_dom, parse_dom_fast

        html = render_html(spans, "d")
        assert self._tree_eq(parse_dom(html), parse_dom_fast(html))

    def test_corpus_pages(self):
        from docling_serve_ray.corpus import generate_doc
        from docling_serve_ray.kernels.html import parse_dom, parse_dom_fast

        n = 0
        # 260: html rides at 27% since yaml/toml joined the mix — this
        # window still yields a >50-page equivalence sample
        for i in range(260):
            d = generate_doc(i)
            if d["format"] != "html":
                continue
            h = d["payload"].decode()
            assert self._tree_eq(parse_dom(h), parse_dom_fast(h)), d["doc_id"]
            n += 1
        assert n > 50

    def test_messy_html(self):
        from docling_serve_ray.kernels.html import parse_dom_fast

        h = ('<html><body><script>var x = "<p>not a tag</p>";</script>'
             "<p>real &amp; escaped</p><div class='q'>unclosed<ul><li>a</body></html>")
        root = parse_dom_fast(h)
        body = root.find_all("body", [])[0]
        ps = body.find_all("p", [])
        assert len(ps) == 1 and ps[0].text() == "real & escaped"
        assert body.find_all("li", [])[0].text() == "a"


class TestNewFormatRoundTrip:
    """pptx / xlsx / asciidoc round-trips under generated span sequences
    (same title-leads-document shape the corpus generator guarantees)."""

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.sampled_from(
                    ["section_header", "paragraph", "list_item", "caption"]
                ),
                _text,
            ).map(lambda kt: _span(*kt)),
            min_size=0,
            max_size=10,
        )
    )
    def test_pptx(self, body):
        from docling_serve_ray.kernels.office import parse_pptx, render_pptx

        spans = [_span("title", "Deck Title")] + body
        got = parse_pptx(render_pptx(spans), "d")
        assert [(s["kind"], s["text"]) for s in got] == [
            (s["kind"], s["text"]) for s in spans
        ]

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.tuples(st.sampled_from(["section_header", "table"]), _text).map(
                lambda kt: _span(
                    kt[0], kt[1] if kt[0] != "table" else kt[1] + " | cell"
                )
            ),
            min_size=0,
            max_size=8,
        )
    )
    def test_xlsx(self, body):
        from docling_serve_ray.kernels.office import parse_xlsx, render_xlsx

        spans = [_span("title", "Workbook")] + body
        got = parse_xlsx(render_xlsx(spans), "d")
        assert [(s["kind"], s["text"]) for s in got] == [
            (s["kind"], s["text"]) for s in spans
        ]

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.sampled_from(["section_header", "paragraph", "list_item"]), _text
            ).map(lambda kt: _span(*kt)),
            min_size=0,
            max_size=10,
        )
    )
    def test_asciidoc(self, body):
        from docling_serve_ray.kernels.office import parse_asciidoc, render_asciidoc

        spans = [_span("title", "Doc Title")] + body
        got = parse_asciidoc(render_asciidoc(spans), "d")
        assert [(s["kind"], s["text"]) for s in got] == [
            (s["kind"], s["text"]) for s in spans
        ]


class TestTrainingOpsInvariants:
    """Invariants of the training-data prep ops beyond oracle equality."""

    @settings(max_examples=60, deadline=None)
    @given(st.lists(_word, min_size=1, max_size=400).map(" ".join))
    def test_chunking_reconstructs_document(self, text):
        """64-token windows at stride 56: chunk0 plus each later chunk's
        last (window - overlap_remainder) tokens reconstructs the doc."""
        from docling_serve_ray.ops.text import CHUNK_STRIDE, CHUNK_TOKENS

        words = text.split(" ")
        n = len(words)
        n_chunks = 1 if n <= CHUNK_TOKENS else 1 + -(-(n - CHUNK_TOKENS) // CHUNK_STRIDE)
        chunks = [
            words[i * CHUNK_STRIDE : i * CHUNK_STRIDE + CHUNK_TOKENS]
            for i in range(n_chunks)
        ]
        # every token is covered and consecutive chunks overlap by
        # window - stride tokens (except possibly the short tail)
        rebuilt = list(chunks[0])
        for i, c in enumerate(chunks[1:], start=1):
            covered = i * CHUNK_STRIDE + CHUNK_TOKENS
            prev_covered = (i - 1) * CHUNK_STRIDE + CHUNK_TOKENS
            new = c[prev_covered - i * CHUNK_STRIDE :]
            rebuilt.extend(new)
        assert rebuilt == words

    def test_split_proportions_and_determinism(self):
        """Hash split: deterministic across calls, ~13/2/1 of 16, and
        every id assigned exactly one split."""
        import hashlib

        from docling_serve_ray.ops.text import SPLIT_TRAIN_LT, SPLIT_VAL_LT

        n = 20_000
        counts = {"train": 0, "val": 0, "test": 0}
        for d in range(n):
            hv = int(hashlib.md5(str(d).encode()).hexdigest()[0], 16)
            split = (
                "train" if hv < SPLIT_TRAIN_LT else "val" if hv < SPLIT_VAL_LT else "test"
            )
            counts[split] += 1
        assert abs(counts["train"] / n - 13 / 16) < 0.02
        assert abs(counts["val"] / n - 2 / 16) < 0.01
        assert abs(counts["test"] / n - 1 / 16) < 0.01


class TestPairwiseDropMask:
    """The block-tiled within-cluster pair scan (semantic_dedup's bounded-
    memory core) must equal the full triu computation for EVERY (matrix,
    block size) — including degenerate rows and tiny blocks."""

    @given(
        st.integers(min_value=0, max_value=25),
        st.integers(min_value=2, max_value=8),
        st.integers(min_value=1, max_value=31),
        st.integers(min_value=0, max_value=2**31 - 1),
        st.lists(st.integers(min_value=0, max_value=24), max_size=3),
    )
    @settings(max_examples=60, deadline=None)
    def test_tiled_equals_full(self, n, dim, block, seed, dup_pairs):
        import numpy as np

        from docling_serve_ray.ops.similarity import _pairwise_drop_mask

        rng = np.random.default_rng(seed)
        X = rng.normal(size=(n, dim))
        for j in dup_pairs:  # engineered exact dups (i -> j copies)
            if n >= 2:
                X[j % n] = X[(j * 7 + 1) % n]
        if n:
            X[rng.integers(n)] = 0.0  # a zero (NaN-normalized) row
        with np.errstate(invalid="ignore", divide="ignore"):
            Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
            S = (Xn @ Xn.T) >= 0.99 if n else np.zeros((0, 0), dtype=bool)
        full = np.triu(S, 1).any(axis=0)
        got = _pairwise_drop_mask(Xn, 0.99, block=block)
        assert np.array_equal(got, full)


class TestConfigRoundtripProperties:
    """render∘parse identity for the yaml/toml kernels over arbitrary
    two-level span models within the generator's value grammar (word
    phrases and bare-int literals; keys word-safe and unique)."""

    _word = st.text(
        alphabet=string.ascii_lowercase + "αβγδλξ" + "قلمدار",
        min_size=1, max_size=8,
    )
    _val = st.one_of(
        st.integers(-(10**12), 10**12).map(str),
        st.lists(_word, min_size=1, max_size=4).map(" ".join),
    )

    @st.composite
    def _spans(draw):
        w = draw(st.lists(
            st.text(alphabet=string.ascii_lowercase + "αβγλ", min_size=1, max_size=6),
            min_size=1, max_size=12, unique=True,
        ))
        vals = draw(st.lists(
            TestConfigRoundtripProperties._val, min_size=len(w), max_size=len(w)
        ))
        n_root = draw(st.integers(0, min(2, len(w))))
        spans = [
            {"kind": "list_item", "text": f"{k}_{i} = {v}"}
            for i, (k, v) in enumerate(zip(w[:n_root], vals[:n_root]))
        ]
        rest = list(zip(w[n_root:], vals[n_root:]))
        while rest:
            sec, _ = rest.pop()
            spans.append({"kind": "section_header", "text": f"{sec}_s{len(spans)}"})
            take = draw(st.integers(1, min(3, max(1, len(rest)))))
            for _ in range(min(take, len(rest))):
                k, v = rest.pop()
                spans.append({"kind": "list_item", "text": f"{k}_{len(spans)} = {v}"})
        return spans

    @given(_spans())
    @settings(max_examples=120, deadline=None)
    def test_yaml_identity(self, spans):
        from docling_serve_ray.kernels.configfmt import parse_yaml, render_yaml

        got = parse_yaml(render_yaml(spans), "p")
        assert [(s["kind"], s["text"]) for s in got] == [
            (s["kind"], s["text"]) for s in spans
        ]

    @given(_spans())
    @settings(max_examples=120, deadline=None)
    def test_toml_identity(self, spans):
        from docling_serve_ray.kernels.configfmt import parse_toml, render_toml

        got = parse_toml(render_toml(spans), "p")
        assert [(s["kind"], s["text"]) for s in got] == [
            (s["kind"], s["text"]) for s in spans
        ]
