"""The reference's full golden test suite, ported case-by-case.

Source: /root/reference/scalpel-core/tests/TestMain.hs:29-684 (HUnit
quadruples (label, html, expected, scraper) defined at TestMain.hs:686-691).
Expected values are transliterated: Haskell ``Nothing`` → ``None``,
tuples → tuples, lists → lists. Selector/extraction semantics must match
byte-for-byte, including malformed-HTML and serial-scraper cases.
"""

import pytest

from scalpel_spark import (
    ANY_ATTRIBUTE,
    any_selector,
    any_tag,
    attr,
    attr_eq,
    attr_re,
    attrs,
    chroot,
    chroots,
    fail,
    has_class,
    html,
    htmls,
    in_serial,
    inner_html,
    inner_htmls,
    many,
    match_fn,
    matches,
    not_p,
    optional,
    position,
    pure,
    scrape_html,
    sdo,
    sdo_serial,
    seek_back,
    seek_next,
    step_back,
    step_next,
    tag,
    text,
    text_selector,
    texts,
    until_back,
    until_next,
)


def unlines(*ls):
    return "".join(line + "\n" for line in ls)


def spure_unit():
    from scalpel_spark import spure

    return spure(())


GOLDEN = [
    (
        "htmls should extract matching tag",
        "<a>foo</a>",
        ["<a>foo</a>"],
        htmls(tag("a")),
    ),
    (
        "htmls should ignore non-matching tag",
        "<a>foo</a><a>bar</a>",
        ["<a>foo</a>", "<a>bar</a>"],
        htmls(tag("a")),
    ),
    (
        "htmls should extract matching tag when it is nested",
        "<b><a>foo</a></b>",
        ["<a>foo</a>"],
        htmls(tag("a")),
    ),
    (
        "htmls should extract each matching tag even if it is nested",
        "<a><a>foo</a></a>",
        ["<a><a>foo</a></a>", "<a>foo</a>"],
        htmls(tag("a")),
    ),
    (
        "htmls with no matching nodes should result in an empty list",
        "<a>foo</a>",
        [],
        htmls(tag("b")),
    ),
    (
        "unclosed tags should be treated as immediately closed",
        "<a>foo",
        ["<a>"],
        htmls(tag("a")),
    ),
    (
        "scraping should obey attribute predicates",
        '<a>foo</a><a key="value">bar</a>',
        ['<a key="value">bar</a>'],
        htmls(tag("a", attr_eq("key", "value"))),
    ),
    (
        "selectors using // should match the deepest node",
        "<a><b><c>foo</c></b></a>",
        ["<c>foo</c>"],
        htmls(tag("a") // tag("b") // tag("c")),
    ),
    (
        "selectors using // should skip over irrelevant nodes",
        "<c><a><b>foo</b></a></c><c><a><d><b>bar</b></d></a></c><b>baz</b>",
        ["<b>foo</b>", "<b>bar</b>"],
        htmls(tag("a") // tag("b")),
    ),
    (
        "hasClass should match tags with multiple classes",
        '<a class="a b">foo</a>',
        ['<a class="a b">foo</a>'],
        htmls(tag("a", has_class("a"))),
    ),
    (
        "hasClass should not match tags without the specified class",
        '<a class="a b">foo</a>',
        [],
        htmls(tag("a", has_class("c"))),
    ),
    (
        "notP should negate attribute predicates",
        '<a>foo</a><a class="a b">bar</a><a class="b">baz</a>',
        ["foo", "baz"],
        texts(tag("a", not_p(has_class("a")))),
    ),
    (
        "@=~ should match via regular expressions",
        '<a key="value">foo</a>',
        ['<a key="value">foo</a>'],
        htmls(tag("a", attr_re("key", "va(foo|bar|lu)e"))),
    ),
    (
        "AnyAttribute should match any attribute key",
        '<a foo="value">foo</a><a bar="value">bar</a>',
        ['<a foo="value">foo</a>', '<a bar="value">bar</a>'],
        htmls(tag("a", attr_eq(ANY_ATTRIBUTE, "value"))),
    ),
    (
        "AnyAttribute should not match any attribute value",
        '<a foo="other">foo</a><a bar="value">bar</a>',
        ['<a bar="value">bar</a>'],
        htmls(tag("a", attr_eq(ANY_ATTRIBUTE, "value"))),
    ),
    (
        "AnyTag should match any tag with the corresponding attributes",
        '<a foo="value">foo</a><b bar="value">bar</b>',
        ['<a foo="value">foo</a>', '<b bar="value">bar</b>'],
        htmls(any_tag(attr_eq(ANY_ATTRIBUTE, "value"))),
    ),
    (
        "AnyTag should not match tags without the corresponding attributes",
        '<a foo="other">foo</a><b bar="value">bar</b>',
        ['<b bar="value">bar</b>'],
        htmls(any_tag(attr_eq(ANY_ATTRIBUTE, "value"))),
    ),
    (
        "Custom predicates",
        '<a foo="bar">1</a><a foo="foo">2</a><a bar="bar">3</a>',
        ['<a foo="foo">2</a>', '<a bar="bar">3</a>'],
        htmls(any_tag(match_fn(lambda k, v: k == v))),
    ),
    (
        "text should extract inner text from the first matching tag",
        "<a>foo</a>",
        "foo",
        text(tag("a")),
    ),
    (
        "text should extract inner text from only the first matching tag",
        "<a>foo</a><a>bar</a>",
        "foo",
        text(tag("a")),
    ),
    (
        "texts should extract inner text from all matching tags",
        "<a>foo</a><a>bar</a>",
        ["foo", "bar"],
        texts(tag("a")),
    ),
    (
        "fmap should work as expected",
        "<a>foo</a><a>bar</a>",
        [True, False],
        texts(tag("a")).map(lambda xs: [x == "foo" for x in xs]),
    ),
    (
        "attr extract matching attribute value",
        "<a key=foo />",
        "foo",
        attr("key", tag("a")),
    ),
    (
        "attr extract matching attribute value with complex predicates",
        "<a key1=foo/><b key1=bar key2=foo /><a key1=bar key2=baz />",
        "baz",
        attr("key2", tag("a", attr_eq("key1", "bar"))),
    ),
    (
        "chroot should limit context to just selected node",
        "<a><b>foo</b></a><b>bar</b>",
        ["foo"],
        chroot("a", texts(tag("b"))),
    ),
    (
        "chroots should work for all matching nodes",
        "<a><b>foo</b></a><a><b>bar</b></a>",
        ["foo", "bar"],
        chroots("a", text(tag("b"))),
    ),
    (
        "<|> should return first match if valid",
        "<a><b>foo</b></a><a><c>bar</c></a>",
        "foo",
        text(tag("a") // "b") | text(tag("a") // "c"),
    ),
    (
        "<|> should return second match if valid",
        "<a><b>foo</b></a><a><c>bar</c></a>",
        "bar",
        text(tag("a") // "d") | text(tag("a") // "c"),
    ),
    (
        "Unclosed tags should be treated as immediately closed",
        "<img src='foobar'>",
        "foobar",
        attr("src", tag("img")),
    ),
    (
        "scraping should work for self-closing tags",
        "<img src='foobar' />",
        "foobar",
        attr("src", tag("img")),
    ),
    (
        "lower case selectors should match any case tag",
        "<a>foo</a><A>bar</A>",
        ["foo", "bar"],
        texts(tag("a")),
    ),
    (
        "upper case selectors should match any case tag",
        "<a>foo</a><A>bar</A>",
        ["foo", "bar"],
        texts(tag("A")),
    ),
    (
        "attribute key matching should be case-insensitive",
        "<a B=C>foo</a>",
        ["foo"],
        texts(tag("A", attr_eq("b", "C"))),
    ),
    (
        "attribute value matching should be case-sensitive",
        "<a B=C>foo</a>",
        [],
        texts(tag("A", attr_eq("b", "c"))),
    ),
    (
        "notP should invert attribute value matching",
        "<a>foo</a><a B=C>bar</a><a B=D>baz</a>",
        ["foo", "baz"],
        texts(tag("a", not_p(attr_eq("b", "C")))),
    ),
    (
        "html should work when matching the root node",
        "<a>foo</a>",
        "<a>foo</a>",
        html(tag("a")),
    ),
    (
        "html should work when matching a nested node",
        "<body><div><ul><li>1</li><li>2</li></ul></div></body>",
        "<li>1</li>",
        html(tag("li")),
    ),
    (
        "html should work when matching a node with no inner text",
        "<body><div></div></body>",
        "<div></div>",
        html(tag("div")),
    ),
    (
        "htmls should return html matching root nodes",
        "<a>foo</a><a>bar</a>",
        ["<a>foo</a>", "<a>bar</a>"],
        htmls(tag("a")),
    ),
    (
        "htmls should return html matching nested nodes",
        "<body><div><ul><li>1</li><li>2</li></ul></div></body>",
        ["<li>1</li>", "<li>2</li>"],
        htmls(tag("li")),
    ),
    (
        "htmls should return html matching empty nested nodes",
        "<body><div></div></body>",
        ["<div></div>"],
        htmls(tag("div")),
    ),
    (
        "innerHTML should exclude root tags",
        "<a>1<b>2</b>3</a>",
        "1<b>2</b>3",
        inner_html(any_selector),
    ),
    (
        "innerHTML of a self closed tag should be the empty string",
        "<a>",
        "",
        inner_html(any_selector),
    ),
    (
        "innerHTML should match root nodes",
        "<a>foo</a><a>bar</a>",
        ["foo", "bar"],
        inner_htmls(tag("a")),
    ),
    (
        "guard should stop matches",
        "<a>foo</a><a>bar</a><a>baz</a>",
        "<a>bar</a>",
        chroot(
            "a",
            text(any_selector).bind(
                lambda t: html(any_selector) if "b" in t else fail()
            ),
        ),
    ),
    (
        "// should force a descent before matching",
        '<div id="outer"><div id="inner">inner text</div></div>',
        ["inner"],
        attrs("id", tag("div") // "div"),
    ),
    (
        "div // div should match div/div/div twice",
        '<div id="a"><div id="b"><div id="c"></div></div></div>',
        ["b", "c"],
        attrs("id", tag("div") // "div"),
    ),
    (
        "anySelector should match the root node",
        "<a>1<b>2<c>3</c>4</b>5</a>",
        "12345",
        text(any_selector),
    ),
    (
        "failing a pattern match should stop a scraper",
        "<a>1</a>",
        None,
        text(tag("a")).filter(lambda v: v == "Bad pattern").map(lambda _: "OK"),
    ),
    (
        "passing a pattern match should not stop a scraper",
        "<a>1</a>",
        "OK",
        text(tag("a")).filter(lambda v: v == "1").map(lambda _: "OK"),
    ),
    (
        "position should return the index of the match",
        "<article><p>A</p><p>B</p><p>C</p></article>",
        [(0, "A"), (1, "B"), (2, "C")],
        chroots(tag("article") // "p", sdo(position(), text(any_selector))),
    ),
    (
        "position should return the index of most recent match",
        "<article><p>A</p></article><article><p>B</p><p>C</p></article>",
        [[(0, "A")], [(0, "B"), (1, "C")]],
        chroots("article", chroots("p", sdo(position(), text(any_selector)))),
    ),
    (
        "DFS regression test for #59 (1)",
        "<div><p>p1</p><p>p2</p><blockquote><p>p3</p></blockquote><p>p4</p>",
        ["p1", "p2", "p3", "p4"],
        texts(tag("p")),
    ),
    (
        "DFS regression test for #59 (2)",
        "<a><b>1</b></a><a><b>2</b></a><a><b>3</b></a>",
        ["1", "2", "3"],
        texts(tag("a")),
    ),
    (
        "DFS regression test for #59 (3)",
        "<a><b>1</b></a><a><b>2</b></a><a><b>3</b></a>",
        ["1", "2", "3"],
        texts(tag("a") // "b"),
    ),
    (
        "DFS regression test for #59 (4)",
        "<a><b>1</b></a><a><b>2</b></a><a><b>3</b></a>",
        ["1", "2", "3"],
        texts(tag("b")),
    ),
    (
        "atDepth 1 should select immediate children",
        "<a><b>1</b><c><b>2</b></c></a>",
        ["1"],
        texts(tag("a") // tag("b").at_depth(1)),
    ),
    (
        "atDepth 2 should select children children",
        "<a><b>1</b><c><b>2</b></c></a>",
        ["2"],
        texts(tag("a") // tag("b").at_depth(2)),
    ),
    (
        "atDepth should compose with attribute predicates",
        "<a><b class='foo'>1</b><c><b class='foo'>2</b></c></a>",
        ["1"],
        texts(tag("a") // tag("b", has_class("foo")).at_depth(1)),
    ),
    (
        "atDepth should handle tags closed out of order (full context)",
        "<a><b><c><d>1</d></b></c></a>",
        ["1"],
        texts(tag("a") // tag("d").at_depth(3)),
    ),
    (
        "atDepth should handle tags closed out of order (partial context)",
        "<a><b><c><d>2</d></b></c></a>",
        ["2"],
        texts(tag("b") // tag("d").at_depth(1)),
    ),
    (
        "Haddock example for atDepth",
        unlines(
            "<div>",
            "  Text before.",
            '  <a href="uri">link1</a>',
            "  Text after.",
            "  <div>",
            "    Nested paragraph.",
            '    <a href="uri">link in the nested paragraph</a>',
            "  </div>",
            '  <a href="uri">link2</a>',
            "</div>",
        ),
        ["link1", "link2"],
        texts(tag("div") // tag("a").at_depth(1)),
    ),
    (
        "// should handle tags closed out of order",
        "<a><b><c><d>2</d></b></c></a>",
        ["2"],
        texts(tag("b") // "d"),
    ),
    (
        "// should handle tags closed out of order for the root (1)",
        "<b><c><d>2</d></b></c>",
        ["2"],
        texts(tag("b") // "d"),
    ),
    (
        "// should handle tags closed out of order for the root (2)",
        "<b><c><d>2</d></b></c>",
        ["2"],
        texts(tag("c") // "d"),
    ),
    (
        "textSelector should select each text node",
        "1<a>2</a>3<b>4<c>5</c>6</b>7",
        [str(i) for i in range(1, 8)],
        texts(text_selector),
    ),
    (
        "anySelector should select text nodes",
        "1<a>2</a>3<b>4<c>5</c>6</b>7",
        ["1", "2", "3", "456", "7"],
        texts(any_selector.at_depth(0)),
    ),
    (
        "atDepth should treat out of focus close tags as immediately closed",
        "<a><b><c><d>2</d></c></a></b>",
        ["2"],
        texts(tag("a") // tag("d").at_depth(2)),
    ),
    (
        "Applicative sanity checks for SerialScraper",
        "<a>1</a><b>2</b><a>3</a>",
        ("1", "2"),
        in_serial(sdo_serial(step_next(text(tag("a"))), step_next(text(tag("b"))))),
    ),
    (
        "Monad sanity checks for SerialScraper",
        "<a>1</a><b>2</b><a>3</a>",
        ("1", "2"),
        in_serial(
            step_next(text(tag("a"))).bind(
                lambda a: step_next(text(tag("b"))).map(lambda b: (a, b))
            )
        ),
    ),
    (
        "stepping off the end of the list without reading should be allowed",
        "<a>1</a><b>2</b><a>3</a>",
        ["1", "2", "3", "2", "1"],
        in_serial(
            sdo_serial(
                step_next(text(any_selector)),
                step_next(text(any_selector)),
                step_next(text(any_selector)),
                step_back(text(any_selector)),
                step_back(text(any_selector)),
            ).map(list)
        ),
    ),
    (
        "stepping off the end of the list and reading should fail",
        "<a>1</a><b>2</b><a>3</a>",
        None,
        in_serial(
            sdo_serial(
                step_next(text(any_selector)),
                step_next(text(any_selector)),
                step_next(text(any_selector)),
                step_next(text(any_selector)),
            )
        ),
    ),
    (
        "seeking should skip over nodes",
        "<a>1</a><b>2</b><a>3</a>",
        ("2", "3"),
        in_serial(sdo_serial(seek_next(text(tag("b"))), seek_next(text(tag("a"))))),
    ),
    (
        "seeking should fail if there is not matching node",
        "<a>1</a><b>2</b><a>3</a>",
        None,
        in_serial(seek_next(text(tag("c")))),
    ),
    (
        "seeking off the end the zipper should be allowed without reading",
        "<a>1</a><b>2</b><c>3</c>",
        ("3", "1"),
        in_serial(sdo_serial(seek_next(text(tag("c"))), seek_back(text(tag("a"))))),
    ),
    (
        "Alternative sanity check for SerialScraper",
        "1<a foo=bar>2</a>3",
        ["1", "bar", "3"],
        in_serial(
            many(
                step_next(text(text_selector.at_depth(0)))
                | step_next(attr("foo", tag("a").at_depth(0)))
            )
        ),
    ),
    (
        "MonadFail sanity check for SerialScraper (passing check)",
        "1",
        "OK",
        in_serial(
            step_next(text(text_selector)).filter(lambda v: v == "1").map(lambda _: "OK")
        ),
    ),
    (
        "MonadFail sanity check for SerialScraper (failing check)",
        "1",
        None,
        in_serial(
            step_next(text(text_selector))
            .filter(lambda v: v == "mismatch")
            .map(lambda _: "OK")
        ),
    ),
    (
        "untilNext should stop at first match",
        "1<a>2</a><b>3</b>",
        ["1", "2"],
        in_serial(until_next(matches(tag("b")), many(step_next(text(any_selector))))),
    ),
    (
        "untilNext should go till end of the zipper on no match",
        "1<a>2</a><b>3</b>",
        ["1", "2", "3"],
        in_serial(until_next(matches(tag("c")), many(step_next(text(any_selector))))),
    ),
    (
        "untilNext should leave the focus at the match",
        "1<a>2</a><b>3</b>",
        "3",
        in_serial(
            until_next(matches(tag("b")), many(step_next(text(any_selector)))).bind(
                lambda _: step_next(text(tag("b")))
            )
        ),
    ),
    (
        "untilNext should create valid a empty context",
        "<a>1</a><a>2</a>",
        "1",
        in_serial(
            until_next(matches(tag("a")), spure_unit()).bind(
                lambda _: step_next(text(tag("a")))
            )
        ),
    ),
    (
        "scraping within an empty context should fail",
        "<a>1</a><a>2</a>",
        None,
        in_serial(
            until_next(matches(tag("a")), step_next(text(any_selector))).bind(
                lambda _: step_next(text(tag("a")))
            )
        ),
    ),
    (
        "untilBack should leave the focus of the new context at the end",
        "<b foo=bar /><a>1</a><a>2</a><a>3</a>",
        ("bar", ["1", "2", "3"], ["2", "1"]),
        in_serial(
            many(seek_next(text(tag("a")))).bind(
                lambda as_: until_back(
                    matches(tag("b")), many(step_back(text(tag("a"))))
                ).bind(
                    lambda as2: step_back(attr("foo", tag("b"))).map(
                        lambda b: (b, as_, as2)
                    )
                )
            )
        ),
    ),
    (
        "inSerial in a chroot should visit immediate children",
        "<parent><a>1</a><b>2</b></parent>",
        ["1", "2"],
        chroot("parent", in_serial(many(step_next(text(any_selector))))),
    ),
    (
        "Issue #41 regression test",
        "<p class='something'>Here</p><p>Other stuff that matters</p>",
        "Other stuff that matters",
        in_serial(
            seek_next(matches(tag("p", has_class("something")))).bind(
                lambda _: step_next(text(tag("p")))
            )
        ),
    ),
    (
        "Issue #45 regression test",
        unlines(
            "<body>",
            "  <h1>title1</h1>",
            "  <h2>title2 1</h2>",
            "  <p>text 1</p>",
            "  <p>text 2</p>",
            "  <h2>title2 2</h2>",
            "  <p>text 3</p>",
            "  <h2>title2 3</h2>",
            "</body>",
        ),
        [
            ("title2 1", ["text 1", "text 2"]),
            ("title2 2", ["text 3"]),
            ("title2 3", []),
        ],
        chroot(
            "body",
            in_serial(
                many(
                    seek_next(text(tag("h2"))).bind(
                        lambda title: until_next(
                            matches(tag("h2")),
                            many(
                                sdo_serial(
                                    optional(step_next(matches(text_selector))),
                                    step_next(text(tag("p"))),
                                ).map(lambda t: t[1])
                            ),
                        ).map(lambda ps: (title, ps))
                    )
                )
            ),
        ),
    ),
    (
        "Haddock example for inSerial: First example",
        unlines(
            "<article>",
            "  <h1>title</h1>",
            "  <h2>Section 1</h2>",
            "  <p>Paragraph 1.1</p>",
            "  <p>Paragraph 1.2</p>",
            "  <h2>Section 2</h2>",
            "  <p>Paragraph 2.1</p>",
            "  <p>Paragraph 2.2</p>",
            "</article>",
        ),
        (
            "title",
            [
                ("Section 1", ["Paragraph 1.1", "Paragraph 1.2"]),
                ("Section 2", ["Paragraph 2.1", "Paragraph 2.2"]),
            ],
        ),
        chroot(
            "article",
            in_serial(
                seek_next(text(tag("h1"))).bind(
                    lambda title: many(
                        seek_next(text(tag("h2"))).bind(
                            lambda section: until_next(
                                matches(tag("h2")),
                                many(seek_next(text(tag("p")))),
                            ).map(lambda ps: (section, ps))
                        )
                    ).map(lambda sections: (title, sections))
                )
            ),
        ),
    ),
    (
        "Haddock example for inSerial: Second example",
        unlines(
            "<article>",
            "  <h1>Title</h1>",
            "  <p>Paragraph 1",
            "    <p>Paragraph 1.1</p>",
            "  </p>",
            "  <p>Paragraph 2</p>",
            "</article>",
        ),
        ("Title", "Paragraph 1\n    Paragraph 1.1\n  ", "Paragraph 2"),
        chroot(
            "article",
            in_serial(
                sdo_serial(
                    seek_next(text(tag("h1"))),
                    seek_next(text(tag("p"))),
                    seek_next(text(tag("p"))),
                )
            ),
        ),
    ),
]


@pytest.mark.parametrize(
    "label,html_in,expected,scraper",
    GOLDEN,
    ids=[case[0] for case in GOLDEN],
)
def test_golden(label, html_in, expected, scraper):
    assert scrape_html(html_in, scraper) == expected
