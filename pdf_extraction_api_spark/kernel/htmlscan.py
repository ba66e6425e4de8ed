"""Fast HTML scanner — exact event source for DocModel.

stdlib ``html.parser`` costs a large share of kernel time (feed/close
re-buffering, ``updatepos`` line counting, ``interesting`` dispatch,
attribute parsing + unescaping for every tag). This scanner is a
single-pass, whole-document reimplementation of
``HTMLParser.goahead(end=1)`` with ``convert_charrefs=True`` that emits
the *identical* event stream (start/end/data; comments/decls/PIs are
no-ops for DocModel) while skipping the bookkeeping DocModel never
observes:

- no ``updatepos``/``getpos`` line tracking;
- attribute tuples are only *built* when the raw attr chunk could
  matter to DocModel (``class`` / ``border`` / ``data-page``
  substrings) — the attrfind walk still runs so tag/data boundaries
  are exact;
- ``html.unescape`` is only called when ``&`` is present (it
  early-outs anyway, this skips the call overhead).

Exactness strategy: every tokenization decision reuses the *stdlib's
own compiled regexes* (``locatestarttagend_tolerant``,
``tagfind_tolerant``, ``attrfind_tolerant``, ``endtagfind``,
``commentclose``, ``_markupbase`` marked-section patterns), and the
control flow mirrors ``html.parser.HTMLParser.goahead`` /
``parse_starttag`` / ``parse_endtag`` / ``parse_html_declaration`` /
``_markupbase.parse_marked_section`` line for line, including the
EOF-recovery path (incomplete construct → data up to the next ``>``,
else next ``<``, else one char, charref-unescaped) and the CDATA rule
that an unterminated <script>/<style> tail is never flushed.

One html.parser behavior needs a convention: ``parse_marked_section``
*raises AssertionError* on ``<![`` with a missing/unknown status
keyword (e.g. ``<![x]>``). refkernel catches that and stops parsing at
the offending construct (refkernel/htmlmodel.py:parse_html); this
scanner returns at the same position, so both kernels emit identical
events for such documents.

Equivalence is enforced by tests/test_htmlscan.py (corpora + NASTY
adversarial cases) and tests/test_fuzz_parity.py (hypothesis soup +
raw-bytes fuzz, byte-compared through the full kernel against
refkernel, which stays on html.parser).
"""

from __future__ import annotations

import _markupbase as _mb
import re
from html import parser as _hp
from html import unescape

# stdlib's own compiled tokenizer regexes — reusing them (instead of
# copying the patterns) guarantees the scanner cannot drift from
# html.parser semantics across CPython patch versions.
_LOCATE = _hp.locatestarttagend_tolerant
_TAGFIND = _hp.tagfind_tolerant
_ATTRFIND = _hp.attrfind_tolerant
_ENDTAGFIND = _hp.endtagfind
_COMMENTCLOSE = _hp.commentclose
_DECLNAME_MATCH = _mb._declname_match
_MARKEDCLOSE = _mb._markedsectionclose
_MSMARKEDCLOSE = _mb._msmarkedsectionclose

_RAWTEXT = ("script", "style")  # HTMLParser.CDATA_CONTENT_ELEMENTS
# html.parser.set_cdata_mode: rawtext ends only at a full </tag\s*>
_CDATA_CLOSE = {
    t: re.compile(r"</\s*%s\s*>" % t, re.IGNORECASE) for t in _RAWTEXT
}
# check_for_whole_start_tag: chars after locatestarttagend that mean
# "end of input in or before attribute value" → incomplete
_INCOMPLETE_NEXT = "abcdefghijklmnopqrstuvwxyz=/ABCDEFGHIJKLMNOPQRSTUVWXYZ"
# attr substrings the DocModel can react to (lexicon class tokens are
# checked against the raw class value, so 'class' gates all of them)
_INTERESTING_ATTRS = ("class", "border", "data-page")
# _markupbase.parse_marked_section status keywords
_STD_SECTIONS = frozenset({"temp", "cdata", "ignore", "include",
                           "rcdata"})
_MS_SECTIONS = frozenset({"if", "else", "endif"})

_INCOMPLETE = -1  # construct unterminated at EOF → recovery path
_CRASH = -2       # html.parser would raise AssertionError here

# Batched dispatch token for model.run_fused: ONE regex call replaces
# the per-construct find('<') + 1-char slice + class test + separate
# tagfind/endtagfind match. Composed from the stdlib's own pattern
# STRINGS (not retyped), preserving this module's no-drift guarantee:
#   group 1 — text run up to the next '<' (== s.find('<') semantics)
#   group 2 — simple start tag name: tagfind_tolerant + immediate '>'
#             (exactly the old fast-path gate `tagfind.match; s[k]=='>'`;
#             backtracking cannot widen it — the trailing class chars
#             are never '>', so giving one back still fails)
#   group 3 — end tag name: endtagfind verbatim (sans the leading '<')
# Anything else (attrs, comments, PIs, marked sections, EOF '<') makes
# both tag groups None and falls to the verbatim slow dispatch.
# 200k-string randomized equivalence vs the old dispatch plus the
# fuzz/golden suites gate this (tests/test_fuzz_parity.py).
_FUSED_TOKEN = re.compile(
    "([^<]*)<(?:" + _TAGFIND.pattern + ">|"
    + _ENDTAGFIND.pattern[1:] + ")?")
assert _FUSED_TOKEN.groups == 3, "stdlib tokenizer patterns changed shape"


def _recover(s: str, i: int, data) -> int:
    """goahead's end-of-input recovery for an incomplete construct:
    emit data up to (and including) the next '>', else up to the next
    '<', else one char — charref-unescaped — and resume there."""
    k = s.find(">", i + 1)
    if k < 0:
        k = s.find("<", i + 1)
        if k < 0:
            k = i + 1
    else:
        k += 1
    chunk = s[i:k]
    data(unescape(chunk) if "&" in chunk else chunk)
    return k


def _marked_section(s: str, lt: int, n: int) -> int:
    """_markupbase.parse_marked_section semantics for '<![' at lt.
    Returns end position, _INCOMPLETE, or _CRASH (html.parser raises
    AssertionError on a missing/unknown status keyword)."""
    j = lt + 3
    if j == n:  # _scan_name: i == n → incomplete
        return _INCOMPLETE
    m = _DECLNAME_MATCH(s, j)
    if not m:
        return _CRASH
    if m.end() == n:  # _scan_name: name runs to end of buffer
        return _INCOMPLETE
    name = m.group().strip().lower()
    if name in _STD_SECTIONS:
        m2 = _MARKEDCLOSE.search(s, j)   # ]\s*]\s*>
    elif name in _MS_SECTIONS:
        m2 = _MSMARKEDCLOSE.search(s, j)  # ]\s*>
    else:
        return _CRASH
    return _INCOMPLETE if m2 is None else m2.end()


def _starttag(s: str, lt: int, data, start, end):
    """parse_starttag + check_for_whole_start_tag, verbatim.
    Returns (new_pos, cdata_tag|None); new_pos == _INCOMPLETE → the
    caller runs the recovery path."""
    m = _LOCATE.match(s, lt)
    j = m.end()
    nxt = s[j:j + 1]
    if nxt == ">":
        endpos = j + 1
    elif nxt == "/":
        if s.startswith("/>", j):
            endpos = j + 2
        else:
            return _INCOMPLETE, None
    elif nxt == "":
        return _INCOMPLETE, None
    elif nxt in _INCOMPLETE_NEXT:
        return _INCOMPLETE, None
    else:
        # bogus char right after the tag head: parse_starttag will
        # emit the raw slice as data (j > lt always: _LOCATE consumed
        # at least '<' + one name char)
        endpos = j
    mt = _TAGFIND.match(s, lt + 1)
    tag = mt.group(1).lower()
    k = mt.end()
    if k == j and nxt == ">":
        # fast path '<name>' / '<name  >': attrfind cannot match at k
        # (its lookbehind needs quote/space/slash; tagfind consumed
        # exactly the chars before '>')
        start(tag, [])
        return endpos, (tag if tag in _RAWTEXT else None)
    # attrfind walk — always runs (it fixes the tag/data decision),
    # but tuples are only built when DocModel could observe them.
    # NOTE: the or-chain below is a hardcoded copy of
    # _INTERESTING_ATTRS for speed — the import-time assert at the
    # bottom of this module keeps the two in sync.
    lowchunk = s[k:endpos].lower()
    want = ("class" in lowchunk or "border" in lowchunk
            or "data-page" in lowchunk)
    attrs: list[tuple[str, str | None]] = []
    while k < endpos:
        ma = _ATTRFIND.match(s, k)
        if not ma:
            break
        if want:
            attrname, rest, attrvalue = ma.group(1, 2, 3)
            if not rest:
                attrvalue = None
            elif (attrvalue[:1] == "'" == attrvalue[-1:]
                  or attrvalue[:1] == '"' == attrvalue[-1:]):
                attrvalue = attrvalue[1:-1]
            if attrvalue:
                attrvalue = unescape(attrvalue)
            attrs.append((attrname.lower(), attrvalue))
        k = ma.end()
    end_chunk = s[k:endpos].strip()
    if end_chunk not in (">", "/>"):
        # desynced tag (e.g. '<p\x00>'): raw slice as data, resume
        # right after it — handle_data is NOT unescaped here
        data(s[lt:endpos])
        return endpos, None
    if end_chunk == "/>":
        start(tag, attrs)
        end(tag)
        return endpos, None
    start(tag, attrs)
    return endpos, (tag if tag in _RAWTEXT else None)


def _endtag(s: str, lt: int, end) -> int:
    """parse_endtag (non-CDATA path), verbatim."""
    gtm = s.find(">", lt + 1)  # endendtag
    if gtm < 0:
        return _INCOMPLETE
    m = _ENDTAGFIND.match(s, lt)  # </ \s* name \s* >
    if m:
        end(m.group(1).lower())
        return gtm + 1
    nm = _TAGFIND.match(s, lt + 2)
    if not nm:
        if s.startswith("</>", lt):
            return lt + 3  # no event
        # parse_bogus_comment (handle_comment is a DocModel no-op)
        pos = s.find(">", lt + 2)
        if pos < 0:  # unreachable: gtm >= lt + 2 exists
            return _INCOMPLETE
        return pos + 1
    end(nm.group(1).lower())
    # '>' always exists past nm.end(): the name class excludes '>'
    return s.find(">", nm.end()) + 1


def scan(s: str, model) -> None:
    """Feed `s` to model.handle_starttag/handle_endtag/handle_data,
    emitting exactly html.parser's (feed + close) event stream."""
    data = model.handle_data
    start = model.handle_starttag
    end = model.handle_endtag
    n = len(s)
    i = 0
    while i < n:
        lt = s.find("<", i)
        if lt < 0:
            chunk = s[i:]
            data(unescape(chunk) if "&" in chunk else chunk)
            return
        if lt > i:
            chunk = s[i:lt]
            data(unescape(chunk) if "&" in chunk else chunk)
        c = s[lt + 1: lt + 2]
        # ASCII letters only — html.parser's starttagopen is [a-zA-Z]
        if "a" <= c <= "z" or "A" <= c <= "Z":
            # fast path '<name>' (only ws/slash-not-before-'>' between
            # name and '>'): tagfind consumes exactly what _LOCATE
            # would (its attr group can't start after a name char), so
            # endpos = k+1, attrs = [], end_chunk = '>' — one regex,
            # no helper call. Anything else takes the verbatim path.
            mt = _TAGFIND.match(s, lt + 1)
            k = mt.end()
            if k < n and s[k] == ">":
                tag = mt.group(1).lower()
                start(tag, [])
                i = k + 1
                cdata = tag if tag in _RAWTEXT else None
            else:
                i, cdata = _starttag(s, lt, data, start, end)
                if i < 0:
                    i = _recover(s, lt, data)
                    continue
            if cdata is not None:
                # CDATA mode: content raw (never unescaped), ends only
                # at a full </tag\s*> ; an unterminated tail is NEVER
                # flushed (goahead: cdata break + final-emit guard)
                m2 = _CDATA_CLOSE[cdata].search(s, i)
                if m2 is None:
                    return
                if m2.start() > i:
                    data(s[i:m2.start()])
                end(cdata)
                i = m2.end()
        elif c == "/":
            # fast path '</name>' / '</ name >': when endtagfind
            # matches, the first '>' is the match's own '>' (the name
            # class excludes '>'), so parse_endtag returns m.end()
            m = _ENDTAGFIND.match(s, lt)
            if m is not None:
                end(m.group(1).lower())
                i = m.end()
            else:
                i = _endtag(s, lt, end)
                if i < 0:
                    i = _recover(s, lt, data)
        elif c == "!":
            if s.startswith("<!--", lt):
                m2 = _COMMENTCLOSE.search(s, lt + 4)  # --\s*>
                i = _recover(s, lt, data) if m2 is None else m2.end()
            elif s.startswith("<![", lt):
                k = _marked_section(s, lt, n)
                if k == _CRASH:
                    # html.parser raises AssertionError; refkernel
                    # catches it and stops parsing — match that.
                    return
                i = _recover(s, lt, data) if k < 0 else k
            elif s[lt:lt + 9].lower() == "<!doctype":
                gt = s.find(">", lt + 9)
                i = _recover(s, lt, data) if gt < 0 else gt + 1
            else:
                # parse_bogus_comment (handle_comment is a no-op)
                gt = s.find(">", lt + 2)
                i = _recover(s, lt, data) if gt < 0 else gt + 1
        elif c == "?":
            # parse_pi (handle_pi is a DocModel no-op)
            gt = s.find(">", lt + 2)
            i = _recover(s, lt, data) if gt < 0 else gt + 1
        elif c == "":
            # lone '<' at EOF: goahead breaks, final flush emits it
            data("<")
            return
        else:
            data("<")  # raw single char, then resume as text
            i = lt + 1


# _starttag's fast-path gate hardcodes these names; if DocModel ever
# reacts to a new attribute, this assert forces the gate to be updated
# too (otherwise the new attr would silently never be parsed).
assert _INTERESTING_ATTRS == ("class", "border", "data-page"), (
    "update the hardcoded attr-interest gate in _starttag")
