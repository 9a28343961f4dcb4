"""Scraper combinators: the extraction "query language".

A from-scratch Python expression of the reference's monadic scraper
(``.../Internal/Scrape.hs``) and serial scraper
(``.../Internal/Serial.hs``) semantics:

* a ``Scraper`` is a function ``TagSpec -> value | FAIL`` — the
  Reader+Maybe stack of the reference (Scrape.hs:50-52) collapses to
  "read an immutable context, maybe produce a value".
* ``|`` is ``<|>`` (try left, else right), ``bind``/``map`` compose,
  ``guard`` fails a branch, ``sdo`` sequences like a do-block.
* a ``SerialScraper`` is a function ``zipper -> (value, zipper) | FAIL``
  — the State+Maybe stack of the reference (Serial.hs:151-154); the
  zipper is a cursor over sibling subtrees bookended by ``None``
  sentinels (Serial.hs:49-58).

Every primitive's failure/emptiness behavior is pinned by the golden
tests ported from the reference suite (TestMain.hs:29-684).
"""

from __future__ import annotations

from typing import Callable, List

from .index import (
    TagSpec,
    parse_spec,
    select,
    span_attr,
    span_html,
    span_inner_html,
    span_text,
)
from .selector import to_selector


class _Fail:
    __slots__ = ()

    def __repr__(self):
        return "FAIL"

    def __bool__(self):
        return False

    def __reduce__(self):
        # pickle back to the module singleton: closures shipped to Spark
        # workers must share ONE identity so `v is FAIL` checks hold
        # across pickling boundaries (cloudpickle would otherwise clone
        # the instance per closure)
        return (_the_fail, ())


def _the_fail() -> "_Fail":
    return FAIL


FAIL = _Fail()


class Scraper:
    __slots__ = ("run",)

    def __init__(self, run: Callable[[TagSpec], object]):
        self.run = run

    def map(self, f) -> "Scraper":
        def go(spec):
            v = self.run(spec)
            return FAIL if v is FAIL else f(v)

        return Scraper(go)

    def bind(self, f: Callable[[object], "Scraper"]) -> "Scraper":
        def go(spec):
            v = self.run(spec)
            if v is FAIL:
                return FAIL
            return f(v).run(spec)

        return Scraper(go)

    def __or__(self, other: "Scraper") -> "Scraper":
        def go(spec):
            v = self.run(spec)
            return other.run(spec) if v is FAIL else v

        return Scraper(go)

    def filter(self, pred) -> "Scraper":
        """``guard`` fused with bind: fail unless pred(value)."""

        def go(spec):
            v = self.run(spec)
            if v is FAIL or not pred(v):
                return FAIL
            return v

        return Scraper(go)


def pure(value) -> Scraper:
    return Scraper(lambda spec: value)


def fail() -> Scraper:
    return Scraper(lambda spec: FAIL)


def sdo(*steps) -> Scraper:
    """Sequence scrapers in the same context, returning a tuple of all
    results — the common do-block shape (multiple extractions off one
    (sub)row)."""

    def go(spec):
        out = []
        for s in steps:
            v = s.run(spec)
            if v is FAIL:
                return FAIL
            out.append(v)
        return tuple(out)

    return Scraper(go)


# --- primitives (Scrape.hs:94-233) ------------------------------------------


def texts(sel) -> Scraper:
    sel = to_selector(sel)
    return Scraper(lambda spec: [span_text(m) for m in select(sel, spec)])


def text(sel) -> Scraper:
    sel = to_selector(sel)

    def go(spec):
        ms = select(sel, spec, first_only=True)
        return span_text(ms[0]) if ms else FAIL

    return Scraper(go)


def htmls(sel) -> Scraper:
    sel = to_selector(sel)
    return Scraper(lambda spec: [span_html(m) for m in select(sel, spec)])


def html(sel) -> Scraper:
    sel = to_selector(sel)

    def go(spec):
        ms = select(sel, spec, first_only=True)
        return span_html(ms[0]) if ms else FAIL

    return Scraper(go)


def inner_htmls(sel) -> Scraper:
    sel = to_selector(sel)
    return Scraper(lambda spec: [span_inner_html(m) for m in select(sel, spec)])


def inner_html(sel) -> Scraper:
    sel = to_selector(sel)

    def go(spec):
        ms = select(sel, spec, first_only=True)
        return span_inner_html(ms[0]) if ms else FAIL

    return Scraper(go)


def attrs(name: str, sel) -> Scraper:
    """All values of ``name`` on matching opening tags; absent attribute on
    a matched open tag yields '' (TagSoup ``fromAttrib``); non-open matches
    are skipped (Scrape.hs:191-196, TestMain.hs:162-208)."""
    sel = to_selector(sel)

    def go(spec):
        out = []
        for m in select(sel, spec):
            v = span_attr(m, name)
            if v is not None:
                out.append(v)
        return out

    return Scraper(go)


def attr(name: str, sel) -> Scraper:
    sel = to_selector(sel)

    def go(spec):
        for m in select(sel, spec):
            v = span_attr(m, name)
            if v is not None:
                return v
        return FAIL

    return Scraper(go)


def chroots(sel, inner: Scraper) -> Scraper:
    """Run ``inner`` against each matching subtree as if it were the whole
    document; failed inner scrapes are dropped (Scrape.hs:108-113)."""
    sel = to_selector(sel)

    def go(spec):
        out = []
        for m in select(sel, spec):
            v = inner.run(m)
            if v is not FAIL:
                out.append(v)
        return out

    return Scraper(go)


def chroot(sel, inner: Scraper) -> Scraper:
    """First successful chroot; fails when none succeed (Scrape.hs:94-99)."""
    sel = to_selector(sel)

    def go(spec):
        for m in select(sel, spec):
            v = inner.run(m)
            if v is not FAIL:
                return v
        return FAIL

    return Scraper(go)


def matches(sel) -> Scraper:
    sel = to_selector(sel)

    def go(spec):
        return () if select(sel, spec, first_only=True) else FAIL

    return Scraper(go)


def position() -> Scraper:
    """Index of the current subtree among its ``chroots`` siblings
    (Scrape.hs:232-233; ctx set at Select.hs:82-83)."""
    return Scraper(lambda spec: spec.position)


# --- Applicative surface on plain scrapers (Scrape.hs Functor/Applicative/
# Alternative instances; the serial variants live further down) --------------


def lift2(f, sa: Scraper, sb: Scraper) -> Scraper:
    """``liftA2 f sa sb`` — both in the same context."""
    return sdo(sa, sb).map(lambda t: f(t[0], t[1]))


def ap(sf: Scraper, sa: Scraper) -> Scraper:
    """``sf <*> sa``."""
    return lift2(lambda f, a: f(a), sf, sa)


def replicate_m(n: int, s: Scraper) -> Scraper:
    """``replicateM n s`` — n results of the same scraper in the same
    context (deterministic: all identical), as a list."""
    return sdo(*([s] * n)).map(list)


def optional_(s: Scraper) -> Scraper:
    """``optional`` from Alternative: always succeeds; None on failure."""

    def go(spec):
        v = s.run(spec)
        return None if v is FAIL else v

    return Scraper(go)


def many_(s: Scraper) -> Scraper:
    """``many`` from Alternative on the Reader+Maybe stack: [] when the
    scraper fails. A plain scraper is a pure function of an immutable
    context, so a SUCCEEDING scraper makes the reference's
    ``many`` fixpoint diverge (same in Haskell: ``many (Just x)`` hangs);
    we raise instead of hanging. Use the serial ``many`` (which advances
    a zipper) for real repetition."""

    def go(spec):
        v = s.run(spec)
        if v is FAIL:
            return []
        raise ValueError(
            "many_() over an unconditionally-succeeding plain scraper "
            "diverges (as in the reference); use serial many"
        )

    return Scraper(go)


# --- user effect stacks (ScraperT over Either/Writer; Scrape.hs:50-52,
# examples/error-handling*/Main.hs) ------------------------------------------
#
# The reference threads user monads under the scraper; the Spark-native
# equivalent is an explicit per-run effect context whose contents land in
# per-row DataFrame columns (errors array<string>, log array<string>) —
# failures become data, not dropped rows. The context is a stack so
# nested scrape_with_effects calls compose; extraction tasks are
# single-threaded per Python worker, so no locking is needed.

_EFFECT_STACK: List[dict] = []


def _effect_ctx() -> dict | None:
    return _EFFECT_STACK[-1] if _EFFECT_STACK else None


def throw_error(message) -> Scraper:
    """``throwError`` (Either tier): record the error and fail the
    current branch. ``message`` may be a string or a Scraper producing
    one (so messages can embed scraped context, e.g. ``html``)."""

    def go(spec):
        ctx = _effect_ctx()
        msg = message.run(spec) if isinstance(message, Scraper) else message
        if ctx is not None and msg is not FAIL:
            ctx["errors"].append(str(msg))
        return FAIL

    return Scraper(go)


def tell(message) -> Scraper:
    """``tell`` (Writer tier): append to the run's log, succeed with ()."""

    def go(spec):
        ctx = _effect_ctx()
        msg = message.run(spec) if isinstance(message, Scraper) else message
        if msg is FAIL:
            return FAIL
        if ctx is not None:
            ctx["log"].append(str(msg))
        return ()

    return Scraper(go)


def scrape_with_effects(html_str: str, scraper: Scraper):
    """Run with an effect context: returns (value_or_None, errors, log)
    — the observable shape of the reference's
    ``runWriter $ scrapeStringLikeT …`` / Either runs."""
    ctx = {"errors": [], "log": []}
    _EFFECT_STACK.append(ctx)
    try:
        v = scraper.run(parse_spec(html_str))
    finally:
        _EFFECT_STACK.pop()
    return (None if v is FAIL else v, ctx["errors"], ctx["log"])


# --- running -----------------------------------------------------------------


def scrape_html(html_str: str, scraper: Scraper):
    """Parse + run; returns value or None on failure (``Maybe a``,
    Scrape.hs:84-86 / StringLike.hs:15-25)."""
    v = scraper.run(parse_spec(html_str))
    return None if v is FAIL else v


# --- serial scrapers (Serial.hs) --------------------------------------------
#
# Zipper = (entries, idx); entries[0] and entries[-1] are None sentinels
# (valid cursor rests, invalid reads — Serial.hs:49-58).


class SerialScraper:
    __slots__ = ("run",)

    def __init__(self, run):
        self.run = run  # zipper -> (value, zipper) | FAIL

    def map(self, f) -> "SerialScraper":
        def go(z):
            r = self.run(z)
            if r is FAIL:
                return FAIL
            v, z2 = r
            return (f(v), z2)

        return SerialScraper(go)

    def bind(self, f) -> "SerialScraper":
        def go(z):
            r = self.run(z)
            if r is FAIL:
                return FAIL
            v, z2 = r
            return f(v).run(z2)

        return SerialScraper(go)

    def __or__(self, other) -> "SerialScraper":
        def go(z):
            r = self.run(z)
            return other.run(z) if r is FAIL else r

        return SerialScraper(go)

    def filter(self, pred) -> "SerialScraper":
        def go(z):
            r = self.run(z)
            if r is FAIL or not pred(r[0]):
                return FAIL
            return r

        return SerialScraper(go)


def spure(value) -> SerialScraper:
    return SerialScraper(lambda z: (value, z))


def sdo_serial(*steps) -> SerialScraper:
    def go(z):
        out = []
        for s in steps:
            r = s.run(z)
            if r is FAIL:
                return FAIL
            v, z = r
            out.append(v)
        return (tuple(out), z)

    return SerialScraper(go)


def many(ss: SerialScraper) -> SerialScraper:
    """Zero-or-more; stops at first failure, keeping the last success
    state (Alternative ``many``)."""

    def go(z):
        out = []
        while True:
            r = ss.run(z)
            if r is FAIL:
                return (out, z)
            v, z = r
            out.append(v)

    return SerialScraper(go)


def optional(ss: SerialScraper) -> SerialScraper:
    def go(z):
        r = ss.run(z)
        if r is FAIL:
            return (None, z)
        return r

    return SerialScraper(go)


def _znext(z):
    entries, idx = z
    return (entries, idx + 1) if idx + 1 < len(entries) else None


def _zprev(z):
    entries, idx = z
    return (entries, idx - 1) if idx - 1 >= 0 else None


def _zfocus(z):
    return z[0][z[1]]


def _insert_left(x, z):
    entries, idx = z
    return (entries[:idx] + [x] + entries[idx:], idx)


def _insert_right(x, z):
    entries, idx = z
    return (entries[: idx + 1] + [x] + entries[idx + 1 :], idx + 1)


def _step_with(move, scraper: Scraper) -> SerialScraper:
    def go(z):
        z2 = move(z)
        if z2 is None:
            return FAIL
        focus = _zfocus(z2)
        if focus is None:
            return FAIL
        v = scraper.run(focus)
        if v is FAIL:
            return FAIL
        return (v, z2)

    return SerialScraper(go)


def step_next(scraper: Scraper) -> SerialScraper:
    return _step_with(_znext, scraper)


def step_back(scraper: Scraper) -> SerialScraper:
    return _step_with(_zprev, scraper)


def _seek_with(move, scraper: Scraper) -> SerialScraper:
    def go(z):
        while True:
            z = move(z)
            if z is None:
                return FAIL
            focus = _zfocus(z)
            if focus is not None:
                v = scraper.run(focus)
                if v is not FAIL:
                    return (v, z)

    return SerialScraper(go)


def seek_next(scraper: Scraper) -> SerialScraper:
    return _seek_with(_znext, scraper)


def seek_back(scraper: Scraper) -> SerialScraper:
    return _seek_with(_zprev, scraper)


def _until_with(move, backward: bool, sentinel: Scraper, inner: SerialScraper) -> SerialScraper:
    """Collect nodes until ``sentinel`` matches; run ``inner`` on the
    restricted context; outer cursor rests just before the sentinel
    (Serial.hs:244-278; TestMain.hs:548-594). Iterative version of the
    reference's recursive split."""

    def go(z):
        collected = []
        cur = z
        while True:
            z2 = move(cur)
            if z2 is None:
                break
            spec = _zfocus(z2)
            if spec is None:
                break
            if sentinel.run(spec) is not FAIL:
                break
            collected.append(spec)
            cur = z2
        if backward:
            # cursor of the restricted context rests at its end
            entries = [None] + list(reversed(collected)) + [None]
            inner_z = (entries, len(collected) + 1)
        else:
            # cursor rests at the start
            inner_z = ([None] + collected + [None], 0)
        r = inner.run(inner_z)
        if r is FAIL:
            return FAIL
        return (r[0], cur)

    return SerialScraper(go)


def until_next(sentinel: Scraper, inner: SerialScraper) -> SerialScraper:
    return _until_with(_znext, False, sentinel, inner)


def until_back(sentinel: Scraper, inner: SerialScraper) -> SerialScraper:
    return _until_with(_zprev, True, sentinel, inner)


def in_serial(ss: SerialScraper) -> Scraper:
    """Run a serial scraper over the child sequence of the focused node
    (immediate children in a chroot; root forest otherwise —
    Serial.hs:172-185, TestMain.hs:596-601)."""

    def go(spec):
        if not spec.forest:
            return FAIL
        if spec.in_chroot:
            siblings = spec.forest[0].children
        else:
            siblings = spec.forest
        entries: List = [None]
        for t in siblings:
            entries.append(
                TagSpec(spec.doc, [t], spec.lo, spec.hi, spec.position, spec.in_chroot)
            )
        entries.append(None)
        r = ss.run((entries, 0))
        if r is FAIL:
            return FAIL
        return r[0]

    return Scraper(go)
