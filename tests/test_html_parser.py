from scalpel_spark.html_parser import (
    CLOSE,
    COMMENT,
    OPEN,
    TEXT,
    decode_entities,
    parse_html,
    render_tokens,
)
from scalpel_spark.index import parse_spec


def kinds(tokens):
    return [t[0] for t in tokens]


class TestTokenizer:
    def test_basic(self):
        toks = parse_html("<a href='x'>hi</a>")
        assert toks == [
            (OPEN, "a", [("href", "x")], None),
            (TEXT, None, None, "hi"),
            (CLOSE, "a", None, None),
        ]

    def test_name_case_folded(self):
        toks = parse_html("<DIV CLASS='X'>t</DIV>")
        assert toks[0] == (OPEN, "div", [("class", "X")], None)
        assert toks[2] == (CLOSE, "div", None, None)

    def test_unquoted_and_bare_attrs(self):
        toks = parse_html("<input disabled value=abc>")
        assert toks[0][2] == [("disabled", ""), ("value", "abc")]

    def test_self_closing_marker_ignored(self):
        assert parse_html("<br/>") == [(OPEN, "br", [], None)]
        assert parse_html("<img src='x' />") == [(OPEN, "img", [("src", "x")], None)]

    def test_unquoted_value_keeps_slash(self):
        toks = parse_html("<a key1=foo/>")
        assert toks[0][2] == [("key1", "foo/")]

    def test_literal_lt_in_text(self):
        toks = parse_html("1 < 2 and <b>3</b>")
        assert toks[0] == (TEXT, None, None, "1 < 2 and ")

    def test_comment_and_doctype(self):
        toks = parse_html("<!DOCTYPE html><!-- hi --><p>x</p>")
        assert kinds(toks) == [4, COMMENT, OPEN, TEXT, CLOSE]

    def test_unterminated_tag(self):
        toks = parse_html("<a href='x")
        assert toks[0][0] == OPEN

    def test_entities(self):
        assert decode_entities("a&amp;b &lt;c&gt; &#65;&#x42; &unknown;") == (
            "a&b <c> AB &unknown;"
        )
        toks = parse_html("<a t='x&amp;y'>1&lt;2</a>")
        assert toks[0][2] == [("t", "x&y")]
        assert toks[1][3] == "1<2"

    def test_render_canonicalizes_quotes(self):
        toks = parse_html("<a k='v' m=n>t</a>")
        assert render_tokens(toks) == '<a k="v" m="n">t</a>'

    def test_render_escapes(self):
        toks = parse_html("<a k='a&amp;b'>1&lt;2</a>")
        assert render_tokens(toks) == '<a k="a&amp;b">1&lt;2</a>'


class TestIndex:
    def test_forest_shape_simple(self):
        spec = parse_spec("<a><b>x</b></a><c/>")
        assert [(n.lo, n.hi) for n in spec.forest] == [(0, 4), (5, 5)]
        a = spec.forest[0]
        assert [(n.lo, n.hi) for n in a.children] == [(1, 3)]

    def test_unclosed_is_self_span(self):
        spec = parse_spec("<a>foo")
        assert [(n.lo, n.hi) for n in spec.forest] == [(0, 0), (1, 1)]

    def test_malformed_lift(self):
        # <b><c><d>2</d></b></c> — c's close escapes b; fixup lifts
        spec = parse_spec("<b><c><d>2</d></b></c>")
        spans = [(n.lo, n.hi) for n in spec.forest]
        assert (0, 5) in spans  # b span

    def test_deep_nesting_no_recursion_error(self):
        n = 30000
        html = "<tag>" * n + "1" + "</tag>" * n
        spec = parse_spec(html)
        assert len(spec.doc.tokens) == 2 * n + 1
        # forest root spans the whole doc
        root = spec.forest[0]
        assert root.lo == 0 and root.hi == 2 * n

    def test_deep_select_no_recursion_error(self):
        from scalpel_spark import chroots, pure, scrape_html, tag

        n = 15000
        html = "<tag>" * n + "1" + "</tag>" * n
        out = scrape_html(html, chroots("tag", pure(1)))
        assert sum(out) == n
