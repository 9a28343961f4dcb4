"""Document index: close-offset annotation, span forest, and selector DFS.

From-scratch Python re-implementation of the *behavior* of the reference
engine's indexing/select layer
(``/root/reference/scalpel-core/src/Text/HTML/Scalpel/Internal/Select.hs``):

* close-offset pass — per-tag-name stacks, most-recent-open popped on a
  close; unclosed opens get no offset ⇒ treated as immediately closed
  (Select.hs:116-165; observable in TestMain.hs:60-64).
* span forest — greedy nesting scan over (open|text) tokens, then a
  "fixup" that lifts nodes whose close index escapes their parent's span
  (malformed HTML, Select.hs:177-210; TestMain.hs:431-447).
* staged DFS select with three-valued node matching (ok/fail/cull) and
  sibling-lifting for spans that straddle siblings (Select.hs:220-360).

All implementations here are iterative (explicit stacks) so arbitrarily
deep documents — e.g. the reference benchmark's 10k-deep nesting
(``benchmarks/Main.hs:36-42``) — never hit Python's recursion limit.

Spans are kept **absolute** (indices into the document token list); a
``TagSpec``'s "vector slice" is the ``(lo, hi)`` pair. Slicing is
therefore zero-copy, mirroring the reference's sliced shared vectors
(Select.hs:51-53).
"""

from __future__ import annotations

from typing import List, Optional

from .html_parser import CLOSE, OPEN, TEXT, parse_html, render_tokens


class TreeNode:
    __slots__ = ("lo", "hi", "children")

    def __init__(self, lo: int, hi: int, children=None):
        self.lo = lo
        self.hi = hi
        self.children = children if children is not None else []

    def __repr__(self):  # pragma: no cover - debugging aid
        return f"Node({self.lo},{self.hi},{self.children})"


class HtmlDoc:
    """Parsed, canonicalized document: token list + close offsets + forest."""

    __slots__ = ("tokens", "offsets", "forest")

    def __init__(self, tokens):
        self.tokens = tokens
        self.offsets = _close_offsets(tokens)
        self.forest = _build_forest(tokens, self.offsets)


class TagSpec:
    """Evaluation context: document + forest + slice bounds + select ctx.

    Mirrors the reference's ``TagSpec = (TagVector, TagForest,
    SelectContext)`` (Select.hs:71) with absolute indices instead of
    re-centered slices.
    """

    __slots__ = ("doc", "forest", "lo", "hi", "position", "in_chroot")

    def __init__(self, doc, forest, lo, hi, position=0, in_chroot=False):
        self.doc = doc
        self.forest = forest
        self.lo = lo
        self.hi = hi
        self.position = position
        self.in_chroot = in_chroot


def parse_spec(html: str) -> TagSpec:
    doc = HtmlDoc(parse_html(html))
    n = len(doc.tokens)
    return TagSpec(doc, doc.forest, 0, max(n - 1, 0), 0, False)


def _close_offsets(tokens) -> List[Optional[int]]:
    offsets: List[Optional[int]] = [None] * len(tokens)
    stacks: dict = {}
    for i, tok in enumerate(tokens):
        kind = tok[0]
        if kind == OPEN:
            stacks.setdefault(tok[1], []).append(i)
        elif kind == CLOSE:
            st = stacks.get(tok[1])
            if st:
                offsets[st.pop()] = i
    return offsets


def _build_forest(tokens, offsets) -> List[TreeNode]:
    """Greedy nesting scan + malformed-HTML fixup, both iterative."""
    n = len(tokens)

    def scan(lo: int, hi: int) -> List[TreeNode]:
        # Iterative version of the nested-interval scan: frames hold
        # (limit, out_list) and we walk a single cursor.
        out: List[TreeNode] = []
        frames = [(hi, out)]
        cur = lo
        while frames:
            limit, acc = frames[-1]
            if cur >= limit:
                frames.pop()
                if frames:
                    cur = limit + 1
                continue
            tok = tokens[cur]
            kind = tok[0]
            if kind == OPEN or kind == TEXT:
                off = offsets[cur]
                close = off if (kind == OPEN and off is not None) else cur
                if close <= cur:
                    acc.append(TreeNode(cur, cur))
                    cur += 1
                else:
                    node = TreeNode(cur, close)
                    acc.append(node)
                    frames.append((close, node.children))
                    cur += 1
            else:
                cur += 1
        return out

    forest = scan(0, n)
    return _fixup_forest(forest)


def _fixup_forest(forest: List[TreeNode]) -> List[TreeNode]:
    """Lift children whose span escapes the parent up to following-sibling
    position (reference fixup, Select.hs:196-210). Iterative post-order.
    """

    # Process bottom-up: for each node, partition (already-fixed) children
    # into those contained in the parent span and escapees; escapees are
    # spliced after the node in its parent's child list.
    def fix_list(nodes: List[TreeNode]) -> List[TreeNode]:
        out: List[TreeNode] = []
        for node in nodes:
            ok = []
            bad = []
            for ch in node.children:
                (ok if ch.hi <= node.hi else bad).append(ch)
            node.children = ok
            out.append(node)
            out.extend(bad)
        return out

    # Bottom-up traversal without recursion: collect nodes in DFS order,
    # then fix deepest-first. Because fix_list only moves nodes *up* one
    # level, iterate until stable per level via an explicit stack walk.
    stack = [(None, forest)]
    order = []
    while stack:
        parent, nodes = stack.pop()
        order.append((parent, nodes))
        for nd in nodes:
            stack.append((nd, nd.children))
    # deepest lists first
    for parent, _ in reversed(order):
        if parent is not None:
            parent.children = fix_list(parent.children)
    return fix_list(forest)


# --- selector matching -------------------------------------------------------

MATCH_OK = 0
MATCH_FAIL = 1
MATCH_CULL = 2


def _check_preds(preds, tok) -> bool:
    kind = tok[0]
    if not preds:
        # no predicates: open tags and text nodes qualify (Select.hs:354-357)
        return kind == OPEN or kind == TEXT
    if kind != OPEN:
        return False
    attrs = tok[2]
    for p in preds:
        if not p.test(attrs):
            return False
    return True


def _depth_of(node: TreeNode, root_forest: List[TreeNode]) -> int:
    """Number of spans in ``root_forest`` strictly containing ``node``
    (Select.hs:333-339)."""
    lo, hi = node.lo, node.hi
    depth = 0
    stack = list(root_forest)
    while stack:
        t = stack.pop()
        if t.lo < lo and hi < t.hi:
            depth += 1
            stack.extend(t.children)
        elif t.lo <= lo and hi <= t.hi:
            # node may still be nested deeper (equal span boundaries are
            # not strict containment but descendants can't contain then)
            stack.extend(t.children)
        elif t.lo <= lo <= t.hi:
            stack.extend(t.children)
        # else: disjoint subtree — skip entirely
    return depth


def _node_matches(snode, settings_depth, node: TreeNode, tok, root_forest) -> int:
    if settings_depth is not None:
        d = _depth_of(node, root_forest)
        if d < settings_depth:
            settings = MATCH_FAIL
        elif d > settings_depth:
            return MATCH_CULL
        else:
            settings = MATCH_OK
    else:
        settings = MATCH_OK
    kind_tag = snode[0]
    if kind_tag == "tag":
        ok = tok[0] == OPEN and tok[1] == snode[1] and _check_preds(snode[2], tok)
    elif kind_tag == "any":
        ok = _check_preds(snode[1], tok)
    else:  # "text"
        ok = tok[0] == TEXT
    if settings == MATCH_OK and ok:
        return MATCH_OK
    return MATCH_FAIL


def _lift_siblings(siblings, lo, hi) -> List[TreeNode]:
    """Nodes nested inside later siblings whose span falls inside (lo,hi)
    — malformed HTML handling (Select.hs:279-288)."""
    out: List[TreeNode] = []

    def walk(ts):
        for t in ts:
            if lo < t.lo and t.hi < hi:
                out.append(t)
            elif hi < t.lo or t.hi < lo:
                continue
            else:
                walk(t.children)

    walk(siblings)
    return out


def select(selector, spec: TagSpec, first_only: bool = False) -> List[TagSpec]:
    """Evaluate a selector path against a spec → matching sub-specs in the
    reference's emission order (Select.hs:220-288), positions annotated.
    """
    path = selector.path
    if not path:
        return []
    doc = spec.doc
    tokens = doc.tokens
    results: List[TreeNode] = []

    # Work stack of scan frames; emitted matches appended to `results` in
    # order. Frame: (path_idx, forest, i, root_forest)
    stack = [(0, spec.forest, 0, spec.forest)]
    npath = len(path)
    while stack:
        path_idx, forest, i, root = stack.pop()
        if i >= len(forest):
            continue
        node = forest[i]
        snode, sdepth = path[path_idx]
        tok = tokens[node.lo]
        mres = _node_matches(snode, sdepth, node, tok, root)
        last = path_idx == npath - 1
        if last:
            if mres == MATCH_OK:
                # order: current, then later siblings, then children
                # (Select.hs:230-234)
                stack.append((path_idx, node.children, 0, root))
                stack.append((path_idx, forest, i + 1, root))
                results.append(node)
                if first_only:
                    break
            elif mres == MATCH_CULL:
                stack.append((path_idx, forest, i + 1, root))
            else:
                # children results precede remaining siblings'
                stack.append((path_idx, forest, i + 1, root))
                stack.append((path_idx, node.children, 0, root))
        else:
            if mres == MATCH_OK:
                lifted = _lift_siblings(forest[i + 1 :], node.lo, node.hi)
                new_cur = node.children + lifted
                new_root = [node] + lifted
                # deeper stage results precede this stage's later siblings
                stack.append((path_idx, forest, i + 1, root))
                stack.append((path_idx + 1, new_cur, 0, new_root))
            elif mres == MATCH_CULL:
                stack.append((path_idx, forest, i + 1, root))
            else:
                stack.append((path_idx, forest, i + 1, root))
                stack.append((path_idx, node.children, 0, root))

    return [
        TagSpec(doc, [node], node.lo, node.hi, pos, True)
        for pos, node in enumerate(results)
    ]


# --- span extraction helpers (Scrape.hs:242-268 behavior) --------------------


def span_text(spec: TagSpec) -> str:
    tokens = spec.doc.tokens
    parts = []
    for i in range(spec.lo, spec.hi + 1):
        t = tokens[i]
        if t[0] == TEXT:
            parts.append(t[3])
    return "".join(parts)


def span_html(spec: TagSpec) -> str:
    return render_tokens(spec.doc.tokens[spec.lo : spec.hi + 1])


def span_inner_html(spec: TagSpec) -> str:
    if spec.hi - spec.lo + 1 < 2:
        return ""
    return render_tokens(spec.doc.tokens[spec.lo + 1 : spec.hi])


_MISSING = object()


def span_attr(spec: TagSpec, name: str):
    """Attribute value of the opening tag; '' when the attribute is absent
    (TagSoup ``fromAttrib`` behavior); None when the span isn't an open tag.
    """
    tok = spec.doc.tokens[spec.lo]
    if tok[0] != OPEN:
        return None
    for k, v in tok[2]:
        if k == name:
            return v
    return ""
