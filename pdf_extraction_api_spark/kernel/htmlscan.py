"""Fast HTML scanner — drop-in event source for DocModel.

stdlib ``html.parser`` costs ~70 % of kernel time (regex-per-token +
position bookkeeping we never use). This scanner emits the same event
stream (lowercased start/end tags, charref-decoded data, start+end for
self-closing tags, comments/decls/PIs skipped, script/style as rawtext)
for the tolerant-HTML subset that matters, with two fast paths:

- attribute chunks are only *parsed* when they can matter to the model
  (``class`` / ``border`` / ``data-page`` substrings present);
- ``html.unescape`` runs only when ``&`` is present in a chunk.

Equivalence with the stdlib parser is enforced by
tests/test_htmlscan.py (generated corpora across seeds + adversarial
malformed cases, byte-compared through the full kernel against
refkernel, which stays on html.parser).
"""

from __future__ import annotations

import re
from html import unescape

_NAME = re.compile(r"[a-zA-Z][^\t\n\r\f />\x00]*")
_ENDNAME = re.compile(r"[a-zA-Z][-.a-zA-Z0-9:_]*")
_ATTR = re.compile(
    r"([^\s/>][^\s/=>]*)(?:\s*=+\s*"
    r"(\'[^\']*\'|\"[^\"]*\"|(?![\'\"])[^>\s]*))?"
)
_RAWTEXT = {"script", "style"}
_MARKED_CLOSE = re.compile(r"]\s*]\s*>")
# attr substrings the DocModel can react to (lexicon class tokens are
# checked against the raw class value, so 'class' gates all of them)
_INTERESTING_ATTRS = ("class", "border", "data-page")


def _parse_attrs(chunk: str) -> list[tuple[str, str | None]]:
    attrs = []
    for m in _ATTR.finditer(chunk):
        name = m.group(1).lower()
        val = m.group(2)
        if val is not None:
            if val[:1] in "\"'" and val[:1] == val[-1:]:
                val = val[1:-1]
            if "&" in val:
                val = unescape(val)
        attrs.append((name, val))
    return attrs


def scan(s: str, model) -> None:
    """Feed `s` to model.handle_starttag/handle_endtag/handle_data."""
    data = model.handle_data
    start = model.handle_starttag
    end = model.handle_endtag
    n = len(s)
    i = 0
    while i < n:
        lt = s.find("<", i)
        if lt < 0:
            chunk = s[i:]
            if chunk:
                data(unescape(chunk) if "&" in chunk else chunk)
            break
        if lt > i:
            chunk = s[i:lt]
            data(unescape(chunk) if "&" in chunk else chunk)
        c = s[lt + 1: lt + 2]
        # ASCII letters only — html.parser's starttagopen is [a-zA-Z];
        # str.isalpha() would wrongly accept Unicode letters like 'º'
        if "a" <= c <= "z" or "A" <= c <= "Z":
            m = _NAME.match(s, lt + 1)
            tag = m.group().lower()
            j = m.end()
            # fast path: no quotes before the next '>' → it closes the
            # tag (C-speed find + slice scan instead of per-char loop)
            gt = s.find(">", j)
            if gt < 0:
                j = n
            elif "'" not in s[j:gt] and '"' not in s[j:gt]:
                j = gt
            else:
                # quote-aware scan for the closing '>'
                while j < n:
                    ch = s[j]
                    if ch == ">":
                        break
                    if ch == "=":
                        j += 1
                        while j < n and s[j] in " \t\n\r\f":
                            j += 1
                        if j < n and s[j] in "\"'":
                            q = s.find(s[j], j + 1)
                            j = n if q < 0 else q + 1
                            continue
                        continue
                    j += 1
            if j >= n:  # unterminated tag at EOF → treated as text
                chunk = s[lt:]
                data(unescape(chunk) if "&" in chunk else chunk)
                break
            attr_chunk = s[m.end():j]
            self_closing = attr_chunk.rstrip().endswith("/")
            if attr_chunk and any(
                    k in attr_chunk.lower() for k in _INTERESTING_ATTRS):
                attrs = _parse_attrs(
                    attr_chunk.rstrip().rstrip("/")
                    if self_closing else attr_chunk)
            else:
                attrs = []
            start(tag, attrs)
            if self_closing:
                end(tag)
            i = j + 1
            if tag in _RAWTEXT and not self_closing:
                close = s.lower().find(f"</{tag}", i)
                if close < 0:
                    data(s[i:])
                    break
                data(s[i:close])
                gt = s.find(">", close)
                end(tag)
                i = n if gt < 0 else gt + 1
        elif c == "/":
            m = _ENDNAME.match(s, lt + 2)
            gt = s.find(">", lt + 2)
            if gt < 0:
                chunk = s[lt:]
                data(unescape(chunk) if "&" in chunk else chunk)
                break
            if m is not None:
                end(m.group().lower())
            i = gt + 1
        elif c == "!":
            if s.startswith("<!--", lt):
                close = s.find("-->", lt + 4)
                i = n if close < 0 else close + 3
            elif s.startswith("<![", lt):
                # marked section (e.g. <![CDATA[..]]>): closes at ]]>
                m = _MARKED_CLOSE.search(s, lt + 3)
                if m is not None:
                    i = m.end()
                else:
                    gt = s.find(">", lt + 3)
                    i = n if gt < 0 else gt + 1
            else:
                gt = s.find(">", lt + 2)
                i = n if gt < 0 else gt + 1
        elif c == "?":
            gt = s.find(">", lt + 2)
            i = n if gt < 0 else gt + 1
        else:
            data("<")
            i = lt + 1
