"""User effect stacks through the scraper (reference ScraperT over user
monads, Scrape.hs:50-52) — ports the observable behavior of
examples/error-handling/Main.hs and
examples/error-handling-with-writer/Main.hs — plus the Applicative
surface on plain scrapers (§2.3 gap closure). Pure-Python tier: no
Spark session needed; the DataFrame binding is covered in
tests/test_spark_extract.py."""

from scalpel_spark import (
    any_selector,
    ap,
    attr,
    chroots,
    fail,
    has_class,
    html,
    lift2,
    many_,
    optional_,
    pure,
    replicate_m,
    scrape_html,
    scrape_with_effects,
    sdo,
    tag,
    tell,
    text,
    throw_error,
)

EXAMPLE_HTML = (
    "<html><body><div class='comments'>"
    "<div class='comment container'>"
    "<span class='comment author'>Sally</span>"
    "<div class='comment text'>Woo hoo!</div></div>"
    "<div class='comment container'>"
    "<span class='comment author'>Bill</span>"
    "<img class='comment image' src='http://example.com/cat.gif' /></div>"
    "<div class='comment container'>"
    "<span class='comment author'>Susan</span>"
    "<div class='comment text'>WTF!?!</div></div>"
    "<div class='comment container'>"
    "<span class='comment author'>Susan</span>"
    "<div class='comment video'>A video? That's new!</div></div>"
    "</div></body></html>"
)

_author = text(tag("span", has_class("author")))
_text_comment = sdo(_author, text(tag("div", has_class("text")))).map(
    lambda t: ("TextComment",) + t
)
_image_comment = sdo(_author, attr("src", tag("img", has_class("image")))).map(
    lambda t: ("ImageComment",) + t
)


def test_error_handling_example_throw_error():
    """examples/error-handling/Main.hs:55-60 — the 4th comment is neither
    text nor image; throwError records why and the whole scrape reports
    the error (chroots drops the failed subtree, as the reference's
    MaybeT does inside chroots)."""
    comment = _text_comment | _image_comment | throw_error("Unknown comment type")
    comments = chroots(tag("div", has_class("container")), comment)
    value, errors, log = scrape_with_effects(EXAMPLE_HTML, comments)
    assert value == [
        ("TextComment", "Sally", "Woo hoo!"),
        ("ImageComment", "Bill", "http://example.com/cat.gif"),
        ("TextComment", "Susan", "WTF!?!"),
    ]
    assert errors == ["Unknown comment type"]
    assert log == []


def test_error_handling_with_writer_example_tell():
    """examples/error-handling-with-writer/Main.hs:53-58 — logError =
    html anySelector >>= \\h -> tell [msg ++ h] >> empty; the log entry
    embeds the offending subtree's html."""
    log_error = html(any_selector).bind(
        lambda h: tell("Unknown comment type: " + h)
    ).bind(lambda _: fail())
    comment = _text_comment | _image_comment | log_error
    comments = chroots(tag("div", has_class("container")), comment)
    value, errors, log = scrape_with_effects(EXAMPLE_HTML, comments)
    assert len(value) == 3
    assert errors == []
    assert len(log) == 1
    assert log[0].startswith('Unknown comment type: <div class="comment container">')
    assert "A video? That's new!" in log[0]


def test_effects_without_context_are_inert():
    """Running via plain scrape_html still works: throw_error just fails
    the branch, tell succeeds silently (no ambient context)."""
    comment = _text_comment | _image_comment | throw_error("nope")
    out = scrape_html(EXAMPLE_HTML, chroots(tag("div", has_class("container")), comment))
    assert len(out) == 3


def test_nested_effect_contexts_compose():
    inner_s = tell("inner").bind(lambda _: pure(1))

    def outer_run(spec):
        v, errs, lg = scrape_with_effects("<a>x</a>", inner_s)
        assert lg == ["inner"]
        return v

    from scalpel_spark import Scraper

    value, errors, log = scrape_with_effects(
        "<b>y</b>", Scraper(outer_run).bind(lambda v: tell("outer").map(lambda _: v))
    )
    assert value == 1
    assert log == ["outer"]  # inner run's log stayed in the inner context


# --- Applicative surface on plain scrapers -----------------------------------


def test_lift2_ap_replicate_optional_many():
    h = "<a>1</a><a>2</a>"
    two_texts = lift2(lambda x, y: x + y, text("a"), text("a"))
    assert scrape_html(h, two_texts) == "11"
    assert scrape_html(h, ap(pure(len), text("a"))) == 1
    assert scrape_html(h, replicate_m(3, text("a"))) == ["1", "1", "1"]
    assert scrape_html(h, optional_(text("b"))) is None
    assert scrape_html(h, optional_(text("a"))) == "1"
    assert scrape_html(h, many_(text("b"))) == []
    # many_ over a succeeding plain scraper diverges in the reference;
    # here it raises instead of hanging
    try:
        scrape_html(h, many_(text("a")))
        assert False, "expected ValueError"
    except ValueError:
        pass


# --- examples/image-sizes port: host-effects (state + IO) under the scraper --


def test_image_sizes_example_port():
    """examples/image-sizes/Main.hs:36-47 ported end-to-end: chroots over
    <img>, guard out empty/already-visited sources (the reference's
    ``StateT [String]`` threaded state — here a closure-captured list,
    the host-language analog of a user monad), then a real per-match
    HTTP HEAD request (the reference's ``liftIO getImageMeta``) whose
    Content-Length becomes ``Meta (Maybe Int)``; each request is
    accumulated via ``tell`` so the effect log records the IO order."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import urljoin
    from urllib.request import Request, urlopen

    sizes = {"/img/a.png": 314, "/img/b.png": 2718}

    class Handler(BaseHTTPRequestHandler):
        def do_HEAD(self):
            if self.path in sizes:
                self.send_response(200)
                self.send_header("Content-Length", str(sizes[self.path]))
            else:
                # 200 with no usable Content-Length -> Meta Nothing
                self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    top_url = f"http://127.0.0.1:{srv.server_address[1]}/page"
    try:
        page = (
            "<div><img src='/img/a.png'/><img src=''/>"
            "<img src='/img/a.png'/><img src='/img/b.png'/>"
            "<img src='/nolength'/></div>"
        )

        def get_image_meta(src):
            req = Request(urljoin(top_url, src), method="HEAD")
            with urlopen(req, timeout=5) as resp:
                cl = resp.headers.get("Content-Length")
            try:
                return int(cl) if cl is not None and int(cl) > 0 else None
            except ValueError:
                return None

        visited: list = []  # StateT [String] analog

        def per_image(source):
            # guard (not (null source) && not (source `elem` present))
            if not source or source in visited:
                return fail()
            visited.append(source)  # modify (source :)
            size = get_image_meta(source)  # liftIO getImageMeta
            return tell(f"HEAD {source}").map(lambda _: (source, size))

        scraper = chroots(tag("img"), attr("src", any_selector).bind(per_image))
        value, errors, log = scrape_with_effects(page, scraper)
        assert value == [
            ("/img/a.png", 314),
            ("/img/b.png", 2718),
            ("/nolength", None),
        ]
        assert errors == []
        assert log == ["HEAD /img/a.png", "HEAD /img/b.png", "HEAD /nolength"]
    finally:
        srv.shutdown()
