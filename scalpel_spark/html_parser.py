"""Lenient HTML tokenizer with TagSoup-compatible semantics.

This is a from-scratch Python implementation of the *behavior* of the
tokenization layer the reference engine relies on (TagSoup's
``parseTags`` + ``canonicalizeTags``; see
``/root/reference/scalpel-core/src/Text/HTML/Scalpel/Internal/Scrape.hs:80``
and ``.../Scrape/StringLike.hs:24-25`` for where the reference invokes it).
It never fails: malformed markup degrades to text or partially-parsed tags.

Behavioral contract (derived from the reference test-suite,
``/root/reference/scalpel-core/tests/TestMain.hs``):

* tag and attribute *names* are lowercased (canonicalization);
  attribute *values* keep their case (TestMain.hs:222-232).
* unquoted / single-quoted / double-quoted attribute values all parse
  (TestMain.hs:162-208).
* a lone ``/`` before ``>`` (self-closing marker) is ignored; no close
  token is synthesized (TestMain.hs:60-64, 204-208).
* ``<`` not followed by a tag-ish construct is literal text.
* comments/doctype/PI become non-element tokens that take part in token
  indexing but never in tree building.

Tokens are plain tuples ``(kind, name, attrs, text)`` for speed inside
Arrow-batched UDFs:

* ``(OPEN, name, [(k, v), ...], None)``
* ``(CLOSE, name, None, None)``
* ``(TEXT, None, None, s)``
* ``(COMMENT, None, None, s)`` / ``(DECL, None, None, s)``
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

OPEN = 0
CLOSE = 1
TEXT = 2
COMMENT = 3
DECL = 4

Token = Tuple[int, Optional[str], Optional[list], Optional[str]]

_ENTITY_RE = re.compile(r"&(amp|lt|gt|quot|apos|nbsp|#[0-9]+|#x[0-9a-fA-F]+);")

_NAMED = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'", "nbsp": "\xa0"}


def _entity_sub(m: "re.Match[str]") -> str:
    body = m.group(1)
    if body in _NAMED:
        return _NAMED[body]
    if body.startswith("#x") or body.startswith("#X"):
        try:
            return chr(int(body[2:], 16))
        except ValueError:
            return m.group(0)
    if body.startswith("#"):
        try:
            return chr(int(body[1:]))
        except ValueError:
            return m.group(0)
    return m.group(0)


def decode_entities(s: str) -> str:
    if "&" not in s:
        return s
    return _ENTITY_RE.sub(_entity_sub, s)


_WS = " \t\n\r\f"
_NAME_START = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")


def parse_html(s: str) -> List[Token]:
    """Tokenize ``s`` leniently; never raises. Names are lowercased."""
    tokens: List[Token] = []
    n = len(s)
    i = 0
    text_start = 0

    def flush_text(end: int) -> None:
        if end > text_start:
            tokens.append((TEXT, None, None, decode_entities(s[text_start:end])))

    while i < n:
        lt = s.find("<", i)
        if lt < 0:
            break
        nxt = s[lt + 1] if lt + 1 < n else ""
        if nxt in _NAME_START:
            # --- open tag ---
            flush_text(lt)
            j = lt + 1
            k = j
            while k < n and s[k] not in _WS and s[k] != ">" and s[k] != "/":
                k += 1
            name = s[j:k].lower()
            attrs: List[Tuple[str, str]] = []
            # attribute scan
            while True:
                while k < n and s[k] in _WS:
                    k += 1
                if k >= n:
                    break
                c = s[k]
                if c == ">":
                    k += 1
                    break
                if c == "/":
                    # self-closing marker in name position: ignore
                    k += 1
                    continue
                # attribute name
                a0 = k
                while k < n and s[k] not in _WS and s[k] not in "=>":
                    k += 1
                aname = s[a0:k].lower()
                while k < n and s[k] in _WS:
                    k += 1
                if k < n and s[k] == "=":
                    k += 1
                    while k < n and s[k] in _WS:
                        k += 1
                    if k < n and (s[k] == '"' or s[k] == "'"):
                        q = s[k]
                        k += 1
                        v0 = k
                        qend = s.find(q, k)
                        if qend < 0:
                            qend = n
                        val = s[v0:qend]
                        k = min(qend + 1, n)
                    else:
                        v0 = k
                        while k < n and s[k] not in _WS and s[k] != ">":
                            k += 1
                        val = s[v0:k]
                    attrs.append((aname, decode_entities(val)))
                else:
                    if aname:
                        attrs.append((aname, ""))
            tokens.append((OPEN, name, attrs, None))
            i = k
            text_start = i
        elif nxt == "/":
            # --- close tag ---
            j = lt + 2
            if j < n and s[j] in _NAME_START:
                flush_text(lt)
                k = j
                while k < n and s[k] not in _WS and s[k] != ">":
                    k += 1
                name = s[j:k].lower()
                gt = s.find(">", k)
                i = (gt + 1) if gt >= 0 else n
                tokens.append((CLOSE, name, None, None))
                text_start = i
            else:
                # "</>" or "</ ..." — swallow to ">" as junk (TagSoup drops it)
                flush_text(lt)
                gt = s.find(">", lt + 2)
                i = (gt + 1) if gt >= 0 else n
                text_start = i
        elif nxt == "!":
            flush_text(lt)
            if s.startswith("<!--", lt):
                end = s.find("-->", lt + 4)
                if end < 0:
                    tokens.append((COMMENT, None, None, s[lt + 4 :]))
                    i = n
                else:
                    tokens.append((COMMENT, None, None, s[lt + 4 : end]))
                    i = end + 3
            else:
                gt = s.find(">", lt + 2)
                body = s[lt + 2 : gt] if gt >= 0 else s[lt + 2 :]
                tokens.append((DECL, None, None, body))
                i = (gt + 1) if gt >= 0 else n
            text_start = i
        elif nxt == "?":
            flush_text(lt)
            gt = s.find(">", lt + 2)
            body = s[lt + 2 : gt] if gt >= 0 else s[lt + 2 :]
            tokens.append((DECL, None, None, body))
            i = (gt + 1) if gt >= 0 else n
            text_start = i
        else:
            # literal '<' in text
            i = lt + 1
    # trailing text
    if text_start < n:
        tokens.append((TEXT, None, None, decode_entities(s[text_start:])))
    return tokens


_ESC_TEXT = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")]
_ESC_ATTR = [("&", "&amp;"), ('"', "&quot;"), ("<", "&lt;"), (">", "&gt;")]


def _esc(s: str, table) -> str:
    for ch, rep in table:
        if ch in s:
            s = s.replace(ch, rep)
    return s


def render_token(tok: Token) -> str:
    kind = tok[0]
    if kind == TEXT:
        return _esc(tok[3], _ESC_TEXT)
    if kind == OPEN:
        name, attrs = tok[1], tok[2]
        if not attrs:
            return f"<{name}>"
        parts = [f'{k}="{_esc(v, _ESC_ATTR)}"' for k, v in attrs]
        return f"<{name} {' '.join(parts)}>"
    if kind == CLOSE:
        return f"</{tok[1]}>"
    if kind == COMMENT:
        return f"<!--{tok[3]}-->"
    return f"<!{tok[3]}>"


def render_tokens(tokens) -> str:
    return "".join(render_token(t) for t in tokens)
