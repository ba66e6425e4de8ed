"""Fast scanner ⇔ stdlib html.parser equivalence, through the full
kernel, byte-compared against refkernel (which stays on html.parser)."""

from __future__ import annotations

import pytest

from fixtures.gen_pages import gen_rows
from pdf_extraction_api_spark.kernel.batch import extract_one
from refkernel.extract import extract_document

NASTY = [
    # comments, doctype, PIs
    b"<!DOCTYPE html><!-- c --><p>Real content paragraph long enough"
    b" here.</p><?php hidden ?>",
    # entities: named / numeric / hex / missing-semicolon
    b"<p>AT&amp;T &#65;&#x42; caf&eacute; fish &amp chips and more text"
    b" here</p>",
    # unquoted / single-quoted / valueless attributes
    b"<table border=1 class='x y'><tr><td data-a>a</td><td>b</td></tr>"
    b"<tr><td>c</td><td>d</td></tr></table>",
    # self-closing and void tags
    b"<p>Before the break<br/>after the break, still one block here"
    b" ok</p><img src='x.png'/>",
    # script/style rawtext containing '<' and fake tags
    b"<script>if (a < b) { x = '<p>not a tag</p>'; }</script>"
    b"<style>p > a { color: red }</style>"
    b"<p>Visible content paragraph long enough to be kept.</p>",
    # '<' as plain text, '<3' emoticon
    b"<p>I <3 parsing; 1 < 2 and 3 > 2, all just ordinary text"
    b" here.</p>",
    # stray close tags, mismatched nesting
    b"</div><p>Content paragraph long enough here okay.</p></span>",
    # attr values containing '>' inside quotes
    b'<div class="a>b"><p>Quoted-gt attr paragraph long enough'
    b" here.</p></div>",
    # uppercase tags and attributes
    b'<TABLE BORDER="1"><TR><TD>x</TD><TD>y</TD></TR>'
    b"<TR><TD>1</TD><TD>2</TD></TR></TABLE>",
    # unterminated tag at EOF
    b"<p>Tail content paragraph long enough here okay.</p><div cla",
    # bogus markup declarations
    b"<![CDATA[ x > y ]]><p>After cdata-ish block, long enough"
    b" text.</p>",
    # entities in attributes
    b'<div class="nav&#45;bar"><p>short link</p></div>',
    # nested pre with table-ish content
    b"<pre>col a      col b\n1.0      2.0\n3.0      4.0</pre>",
    # empty attr chunk whitespace
    b"<p   >Spaced tag content paragraph long enough here.</p>",
    # --- regression corpus: html.parser divergences found round 1 ---
    # unterminated declarations / comments / PIs at EOF (hypothesis
    # found b'<!': html.parser emits the remainder as data)
    b"<!",
    b"<!-",
    b"<!--",
    b"<!-- truncated comment",
    b"<![",
    b"<![CDATA[ truncated",
    b"<?php truncated",
    b"</",
    b"</div",
    b"<!DOCTYPE html",
    # '-- >' closes a comment (commentclose is --\s*>), '<!-->' doesn't
    b"<!-- x -- >visible tail text long enough to keep here.",
    b"<!-->after bogus comment, visible text long enough here.",
    # bare attr value ending in '/': NOT self-closing (attrfind eats
    # the '/' into the value) — the whole table must survive
    b"<table border=1/><tr><td>a</td><td>b</td></tr>"
    b"<tr><td>c</td><td>d</td></tr></table>",
    b'<section data-page=3/><p>Paragraph on page three long enough'
    b" here.</p></section>",
    # disallowed byte cuts the tag head: '<p' becomes data
    b"<p\x00>text after nul tag long enough to keep here okay.",
    # '</ p>' IS an end tag (endtagfind allows \s after '</')
    b"<p>Before the spaced close tag long enough here.</ p>after",
    # end tag with junk before '>': name is taken, rest ignored
    b"<p>Content here long enough to keep.</p attr='x'>tail",
    # end tag name with non-name char: html.parser takes 'p@' (tagfind
    # is broad), not 'p'
    b"<p>Content paragraph long enough to keep here.</p@>tail",
    # rawtext: '</scriptx>' and '</script foo>' do NOT close a script
    b"<script>a</scriptx>b</script>c visible tail long enough here.",
    b"<script>a</script foo>b</script>c visible tail long enough.",
    # rawtext: '</ script >' DOES close it
    b"<script>hidden</ script >visible text long enough to keep.",
    # unterminated rawtext tail is never flushed
    b"<p>Kept paragraph long enough here.</p><script>dropped tail",
    # unterminated start tag mid-soup: recovery chunks at '<'/'>'
    b"<p class='x' <div>weird nested open tag text long enough.</div>",
    b"<div cla &amp; entity inside unterminated tag no close",
    # MS marked sections close at ]>
    b"<![if x]>conditional body long enough here.<![endif]>tail",
]


def _norm(res: dict) -> tuple:
    return (
        res["n_pages"], res["extracted_text"],
        tuple(
            tuple(sorted(t.items())) if not isinstance(t, dict) else
            tuple(sorted(
                (k, tuple(map(tuple, v)) if k == "cells" else
                 tuple(sorted(v.items())) if k == "metadata" else v)
                for k, v in t.items()))
            for t in res["tables"]),
        tuple(tuple(sorted(s.items())) for s in res["spans"]),
    )


@pytest.mark.parametrize("seed", [42, 7, 99])
def test_scanner_matches_refkernel_on_corpus(seed):
    for r in gen_rows(250, seed=seed):
        eng = extract_one(r["url"], r["html"])
        ref = extract_document(r["url"], r["html"])
        assert _norm(eng) == _norm(ref), r["url"]


@pytest.mark.parametrize("idx", range(len(NASTY)))
def test_scanner_matches_refkernel_on_nasty(idx):
    html = NASTY[idx]
    eng = extract_one("u", html)
    ref = extract_document("u", html)
    assert _norm(eng) == _norm(ref), html


def test_fused_matches_event_path():
    """run_fused (inlined handler bodies) must leave DocModel in the
    exact state the generic scan()+handle_* path produces — corpus +
    NASTY + a pre/section/skip stress doc."""
    from pdf_extraction_api_spark.kernel.htmlscan import scan
    from pdf_extraction_api_spark.kernel.model import DocModel, run_fused

    def state(m):
        return (m.spans, m.content, m.tables, m.max_page)

    docs = [r["html"] for r in gen_rows(150, seed=5)] + NASTY + [
        b"<section data-page='2'><pre>a  b\nc  d</pre></section>"
        b"<script>x<td></script><table><tr><td>1<p>q</p></td></table>",
    ]
    for html in docs:
        try:
            text = html.decode("utf-8")
        except UnicodeDecodeError:
            text = html.decode("latin-1")
        a, b = DocModel(), DocModel()
        scan(text, a)
        a.finish()
        run_fused(b, text)
        b.finish()
        assert state(a) == state(b), html[:120]


def test_scanner_matches_stdlib_flag():
    """Same kernel, both parser paths, same bytes."""
    import importlib
    import os

    from pdf_extraction_api_spark.kernel import model

    rows = gen_rows(60, seed=3)
    fast = [extract_one(r["url"], r["html"]) for r in rows]
    os.environ["SPARK_EXTRACT_STDLIB_PARSER"] = "1"
    try:
        importlib.reload(model)
        from pdf_extraction_api_spark.kernel import batch
        importlib.reload(batch)
        slow = [batch.extract_one(r["url"], r["html"]) for r in rows]
    finally:
        os.environ.pop("SPARK_EXTRACT_STDLIB_PARSER")
        importlib.reload(model)
        from pdf_extraction_api_spark.kernel import batch
        importlib.reload(batch)
    assert fast == slow
