"""Selector algebra: a small Python AST mirroring the reference's
selector language (``.../Internal/Select/Types.hs`` and
``.../Internal/Select/Combinators.hs``).

A selector is a *path*: a list of ``(node, depth_constraint)`` stages
applied at increasing depth (Types.hs:62). Nodes:

* ``("tag", name, preds)``  — lowercased tag name + ANDed attribute
  predicates (Types.hs:96, Combinators.hs:25-27)
* ``("any", preds)``        — any node, incl. bare text when preds empty
  (Types.hs:86-87)
* ``("text",)``             — text nodes only (Types.hs:90-91)

``//`` is Python's ``//`` operator (path concatenation, arbitrary-depth
descent that *forces* a descent — Combinators.hs:93-97, TestMain.hs:303-313).
``at_depth`` constrains the **last** stage (Combinators.hs:81-88).
"""

from __future__ import annotations

import re as _re
from typing import Callable, List, Tuple


class AttrPred:
    """Boolean predicate over the full attribute list of an open tag."""

    __slots__ = ("fn",)

    def __init__(self, fn: Callable[[list], bool]):
        self.fn = fn

    def test(self, attrs: list) -> bool:
        return self.fn(attrs)


def any_attr_pred(single: Callable[[str, str], bool]) -> AttrPred:
    """Lift a single-attribute predicate via any() (Types.hs:55-57)."""
    return AttrPred(lambda attrs: any(single(k, v) for k, v in attrs))


ANY_ATTRIBUTE = object()


def _key_matches(key, attr_key: str) -> bool:
    if key is ANY_ATTRIBUTE:
        return True
    return key.lower() == attr_key


def attr_eq(key, value: str) -> AttrPred:
    """``key @= value``: case-insensitive key, case-sensitive value
    (Combinators.hs:34-38, TestMain.hs:222-232)."""
    return any_attr_pred(lambda k, v: _key_matches(key, k) and v == value)


def attr_re(key, pattern) -> AttrPred:
    """``key @=~ regex``: unanchored regex match on the value
    (Combinators.hs:43-48)."""
    rx = _re.compile(pattern) if isinstance(pattern, str) else pattern
    return any_attr_pred(lambda k, v: _key_matches(key, k) and rx.search(v) is not None)


def has_class(clazz: str) -> AttrPred:
    """Space-separated class-list membership (Combinators.hs:102-110)."""
    return any_attr_pred(lambda k, v: k == "class" and clazz in v.split(" "))


def not_p(pred: AttrPred) -> AttrPred:
    """Negate a whole-tag predicate (Combinators.hs:113-114)."""
    return AttrPred(lambda attrs: not pred.test(attrs))


def match_fn(fn: Callable[[str, str], bool]) -> AttrPred:
    """Arbitrary (key, value) predicate (Combinators.hs:120-122)."""
    return any_attr_pred(fn)


class Selector:
    __slots__ = ("path",)

    def __init__(self, path: List[Tuple[tuple, int]]):
        self.path = path

    def __floordiv__(self, other) -> "Selector":
        other = to_selector(other)
        return Selector(self.path + other.path)

    def at_depth(self, depth: int) -> "Selector":
        if not self.path:
            return self
        node, _ = self.path[-1]
        return Selector(self.path[:-1] + [(node, depth)])


ANY_TAG = object()


def tag(name, *preds) -> Selector:
    """Tag-name selector with optional attribute predicates
    (Types.hs:80-83, Combinators.hs:25-27). ``name`` may be ``ANY_TAG``.
    """
    if name is ANY_TAG:
        return Selector([(("any", list(preds)), None)])
    return Selector([(("tag", name.lower(), list(preds)), None)])


def any_tag(*preds) -> Selector:
    return Selector([(("any", list(preds)), None)])


#: matches any node, including bare text (Types.hs:86-87)
any_selector = Selector([(("any", []), None)])

#: matches text nodes only (Types.hs:90-91)
text_selector = Selector([(("text",), None)])


def to_selector(s) -> Selector:
    if isinstance(s, Selector):
        return s
    if isinstance(s, str):
        return tag(s)
    raise TypeError(f"not a selector: {s!r}")
