"""Adversarial `pages` corpus generator — malformed-crawl realism.

A separate generator (NOT gen_pages: its (seed, doc_id) mapping feeds
the committed golden fixtures and must stay frozen) that produces the
HTML pathologies real Common-Crawl pages exhibit, to widen the
byte-parity evidence beyond the clean fixture families:

- deep nav/div nesting (20-40 levels), inline-style boilerplate
- unterminated tags / comments / CDATA at arbitrary positions
- bare attribute values ending in '/', NULs after tag names
- rawtext traps ('</scriptx>', '</ script >', unterminated <script>)
- charref soup (named/numeric/hex/missing-semicolon/bogus), plus
  entity-DENSE blocks with the html.unescape special cases (overflow
  &#x110000;, NUL, surrogate range)
- whitespace-aligned <pre> blocks (the stream-table gap-split path),
  nested tables (table inside td), link-dense boilerplate with
  MiXeD-case class tokens, marked sections incl. the '<![x]>'
  stop-parsing convention
- mixed-encoding bytes (utf-8 with stray latin-1 bytes → the kernel's
  decode fallback path)
- tables interrupted mid-row by crawler truncation
- UTF-8 BOM prefixes and zero-width / bidi-mark characters in prose
  (neither kernel strips the BOM — parity pins the shared behavior)
- <base href> + relative/protocol-relative/javascript:/mailto:/data:
  URL soup in link-dense blocks (link-density rule must not care
  about URL shape)
- RTL text (Arabic/Hebrew) with explicit bidi embedding controls,
  mixed with Latin digits
- very-long single-line minified documents (one mega-<p>, no
  newlines — scanner buffer + block-cap stress)
- <noscript> fallbacks (incl. unterminated), IE conditional comments
  (downlevel-hidden AND -revealed, incl. never-closed), srcset
  attribute soup (commas/newlines inside one attribute value),
  numeric-entity-encoded angle brackets that must stay TEXT
- <svg> islands incl. foreignObject carrying real HTML (all skipped)
- <iframe srcdoc="..."> whole escaped documents inside one attribute
  value (raw markup between quotes, unquoted/unterminated variants,
  nested iframes — attribute scanner must not end the tag early)
- obsolete-web soup: <xmp>/<listing>/<plaintext> (rawtext in
  browsers, ordinary containers to both kernels — shared rule
  pinned), <marquee>/<blink>/<center>/<font>, spurious void closes
  (</br> </img> </hr>)
- MathML islands (unknown-tag text flow), <template> shadow content
  (skip container, incl. unterminated), percent-encoded UTF-8 hrefs
  and data-URI payload blobs
- xml:lang/lang/dir attribute soup (nested, contradictory, duplicate,
  bare and bogus declarations), NESTED marked sections (CDATA inside
  CDATA ends at the FIRST ]]>, interleaved <![if]> endifs, ignore
  inside ignore, unterminated inner openers), chunked-transfer
  truncation artifacts (hard truncation / lost chunk / leaked
  chunk-size line at arbitrary byte cuts — incl. mid multi-byte
  UTF-8 sequences)
- meta-refresh redirect / canonical-link soup (URL attrs never leak),
  visually-hidden text (display:none / sr-only — neither kernel
  parses CSS, text flows; parity pins the shared rule), hostile
  colspan/rowspan values (integer overflow, negative, junk, empty)
- table-structure elements (caption prose outside any cell, colgroup/
  col incl. never-closed, thead/tbody/tfoot in odd-but-legal orders,
  stray section closes), form-widget soup (<textarea> carrying
  markup-lookalikes — NOT rawtext for either kernel, select/option
  text flow, duplicate attributes → dict(attrs) last-wins pinned,
  processing instructions, mid-document doctypes)

Used by tests/test_hard_corpus_parity.py (engine ⇔ refkernel per-url
byte-equality) — pure Python, no Spark session needed.
"""

from __future__ import annotations

import random

_BOILER_CLASSES = ["nav-bar", "sidebar widget", "footer-links", "menu",
                   "cookie-banner", "share-buttons", "ad-slot promo"]
_WORDS = ("breaking update exclusive analysis deep dive report story "
          "coverage economy election science health climate culture "
          "review opinion interview feature investigation").split()
_ENTITIES = ["&amp;", "&lt;", "&gt;", "&#65;", "&#x42;", "&eacute;",
             "&bogus;", "&amp", "&#", "&"]
_TRAPS = [
    "<table border=1/>", "<section data-page=2/>", "<p\x00>",
    "</ p>", "</p @junk>", "<!-- never closed", "<![CDATA[ cut",
    "<?php trailing", "<div cla", "<!", "<//>", "<3 <",
    "</scriptx>", "-- >", "<!-->",
]


def _prose(rng: random.Random, n: int) -> str:
    words = []
    for _ in range(n):
        w = rng.choice(_WORDS)
        if rng.random() < 0.12:
            w += rng.choice(_ENTITIES)
        words.append(w)
    return " ".join(words)


def _deep_nav(rng: random.Random) -> str:
    depth = rng.randint(15, 40)
    cls = rng.choice(_BOILER_CLASSES)
    open_tags = "".join(
        f'<div class="{cls} lvl{d}" style="margin:{d}px">'
        for d in range(depth))
    links = "".join(
        f'<a href="/{w}">{w}</a> ' for w in rng.sample(_WORDS, 6))
    return open_tags + links + "</div>" * rng.randint(0, depth + 3)


def _trapped_table(rng: random.Random) -> str:
    rows = []
    for r in range(rng.randint(2, 6)):
        cells = "".join(
            f"<td>{rng.choice(_WORDS)} {rng.randint(0, 9999)}</td>"
            for _ in range(3))
        rows.append(f"<tr>{cells}</tr>")
    body = "".join(rows)
    if rng.random() < 0.4:  # crawler truncation mid-row
        body = body[: rng.randint(len(body) // 2, len(body) - 1)]
        return f'<table border="1">{body}'
    return f'<table border="1">{body}</table>'


def _rawtext_trap(rng: random.Random) -> str:
    inner = f"if (a < {rng.randint(1, 99)}) x = '<p>no</p>';"
    variant = rng.randrange(4)
    if variant == 0:
        return f"<script>{inner}</scriptx>leak?</script>"
    if variant == 1:
        return f"<script>{inner}</ script >"
    if variant == 2:
        return f"<style>p > a {{ color: red }}</style>"
    return f"<script>{inner}"  # unterminated: tail must vanish


_HEAVY_ENTITIES = _ENTITIES + [
    "&#x110000;", "&#0;", "&#xD800;", "&#8364;", "&nbsp;", "&NBSP;",
    "&ampamp;", "&#x1F600;", "&quot;unquoted",
]

_MARKED = ["<![CDATA[cut <p>here</p>]]>", "<![if ie]>old<![endif]>",
           "<![ignore[gone]]>", "<![x]>"]  # last: both kernels stop


def _entity_soup(rng: random.Random) -> str:
    """Entity-dense block: >50% of tokens carry charrefs, including
    the special-cased ones (overflow, NUL, surrogate range) that
    html.unescape maps to replacement chars."""
    words = []
    for _ in range(rng.randint(10, 40)):
        w = rng.choice(_WORDS)
        if rng.random() < 0.6:
            w += rng.choice(_HEAVY_ENTITIES)
        if rng.random() < 0.2:
            w = rng.choice(_HEAVY_ENTITIES) + w
        words.append(w)
    tag = rng.choice(["p", "blockquote", "figcaption", "dt", "dd"])
    return f"<{tag}>{' '.join(words)}</{tag}>"


def _pre_stream_table(rng: random.Random) -> str:
    """Whitespace-aligned <pre> block — the stream-table detection
    path (gap-split rows), sometimes too ragged to qualify."""
    rows = []
    for _ in range(rng.randint(2, 7)):
        cells = [f"{rng.choice(_WORDS)}", f"{rng.randint(0, 999)}",
                 f"{rng.randint(0, 99)}.{rng.randint(0, 99):02d}"]
        sep = " " * rng.randint(1, 4)
        rows.append(sep.join(cells))
    body = "\n".join(rows)
    return f"<pre>{body}</pre>" if rng.random() < 0.8 else f"<pre>{body}"


def _nested_table(rng: random.Random) -> str:
    inner = ("<table><tr><td>in1</td><td>in2</td></tr>"
             "<tr><td>in3</td><td>in4</td></tr></table>")
    close = "</table>" if rng.random() < 0.7 else ""
    return (f'<table border="1"><tr><td>out1</td><td>{inner}</td></tr>'
            f"<tr><td>out2</td><td>{rng.randint(0, 99)}</td></tr>{close}")


def _link_farm(rng: random.Random) -> str:
    """Link-dense block (density > 0.5 → boilerplate by the text/link
    ratio rule, no boiler class needed) with MiXeD-case class tokens
    (the lexicon check lowercases)."""
    cls = rng.choice(["NaV-Bar", "FOOTER-links", "Cookie-Banner",
                      "plain-content"])
    links = " ".join(f'<a href="/{w}">{w} {w}</a>'
                     for w in rng.sample(_WORDS, rng.randint(4, 10)))
    return (f'<p class="{cls}" style="display:{rng.choice(["none", "block"])}">'
            f"{links} {rng.choice(_WORDS)}</p>")


_ZERO_WIDTH = ["​", "‎", "‏", "﻿"]

_RTL_WORDS = [
    "مرحبا",          # Arabic: marhaba
    "العالم",    # Arabic: al-alam
    "تقرير",          # Arabic: taqrir
    "שלום",                # Hebrew: shalom
    "חדשות",          # Hebrew: chadashot
    "כלכלה",          # Hebrew: kalkala
]

_URL_SHAPES = [
    "//cdn.example/{w}.js", "/{w}/index.html", "../{w}", "{w}.html",
    "javascript:void(0)", "mailto:{w}@example.com", "#{w}",
    "data:text/plain,{w}", "https://other.example/{w}?a=1&b=2",
    "/{w} with space", "",
]


def _base_url_soup(rng: random.Random) -> str:
    """<base href> plus links across every URL shape a crawl sees —
    relative, protocol-relative, javascript:, mailto:, data:,
    fragment-only, empty. The link-density boilerplate rule counts
    anchor text regardless of URL shape; parity pins that."""
    base = rng.choice([
        '<base href="https://hard.example/sub/dir/">',
        '<base href="/rooted/" target="_blank">',
        "<base>",  # no href at all
    ])
    links = " ".join(
        '<a href="{}">{} {}</a>'.format(
            rng.choice(_URL_SHAPES).format(w=w), w, rng.choice(_WORDS))
        for w in rng.sample(_WORDS, rng.randint(3, 8)))
    tail = _prose(rng, rng.randint(0, 12))
    return f"{base}<p>{links} {tail}</p>"


def _rtl_block(rng: random.Random) -> str:
    """RTL prose with explicit bidi controls (RLE/PDF, RLM/LRM) and
    embedded Latin digits — the byte stream both kernels must carry
    through text extraction unchanged."""
    words = []
    for _ in range(rng.randint(6, 25)):
        w = rng.choice(_RTL_WORDS)
        if rng.random() < 0.25:
            w += str(rng.randint(0, 999))
        if rng.random() < 0.2:
            w = rng.choice(_ZERO_WIDTH) + w
        words.append(w)
    body = " ".join(words)
    if rng.random() < 0.5:
        body = "‫" + body + "‬"  # RLE ... PDF embedding
    tag = rng.choice(["p", "blockquote", "h2"])
    return f'<{tag} dir="rtl">{body}</{tag}>'


def _noscript_block(rng: random.Random) -> str:
    """<noscript> fallbacks — a rawtext-ish container crawls see
    constantly; inner markup must be handled per each kernel's own
    (shared) tag rules, including unterminated variants."""
    inner = (f"<p>{_prose(rng, rng.randint(4, 15))}</p>"
             if rng.random() < 0.6 else
             f'<img src="/px.gif" alt="{rng.choice(_WORDS)}">')
    if rng.random() < 0.2:
        return f"<noscript>{inner}"  # unterminated
    return f"<noscript>{inner}</noscript>"


def _conditional_comment(rng: random.Random) -> str:
    """IE conditional comments, downlevel-hidden and -revealed forms,
    sometimes wrapping a table (the parser must treat the hidden form
    as one comment, not parse the inner markup)."""
    inner = (f"<p>{_prose(rng, 8)}</p>" if rng.random() < 0.5
             else "<table><tr><td>ie</td><td>9</td></tr></table>")
    variant = rng.randrange(3)
    if variant == 0:  # downlevel-hidden: one comment
        return f"<!--[if IE 9]>{inner}<![endif]-->"
    if variant == 1:  # downlevel-revealed: marked sections + content
        return f"<![if !IE]>{inner}<![endif]>"
    return f"<!--[if lt IE 7]>{inner}"  # never closed


def _srcset_soup(rng: random.Random) -> str:
    """Responsive-image attribute soup: srcset with commas, spaces,
    density descriptors and newlines inside ONE attribute value —
    attribute parsing must not split on the commas."""
    cands = ", ".join(
        f"/img/{w}-{rng.choice([320, 640, 1280])}.jpg "
        f"{rng.choice(['1x', '2x', f'{rng.randint(300, 1400)}w'])}"
        for w in rng.sample(_WORDS, rng.randint(2, 4)))
    sep = "\n  " if rng.random() < 0.3 else " "
    return (f'<img{sep}src="/img/base.jpg"{sep}srcset="{cands}"'
            f'{sep}sizes="(max-width: 600px) 480px, 800px" '
            f'alt="{rng.choice(_WORDS)}">'
            f"<p>{_prose(rng, rng.randint(5, 20))}</p>")


def _encoded_tag_text(rng: random.Random) -> str:
    """Numeric-entity-encoded angle brackets: &#60;p&#62; inside text
    must stay TEXT after unescaping, never become markup (the classic
    double-parse bug)."""
    w = rng.choice(_WORDS)
    fake = rng.choice([
        "&#60;script&#62;alert(1)&#60;/script&#62;",
        "&#x3C;table border=1&#x3E;",
        "&lt;p class=x&gt;not a tag&lt;/p&gt;",
        "&#60;!-- not a comment --&#62;",
    ])
    return f"<p>{w} {fake} {_prose(rng, rng.randint(3, 12))}</p>"


def _svg_island(rng: random.Random) -> str:
    """<svg> islands (a _SKIP container in both kernels): inner
    shapes, a foreignObject carrying real HTML, and sometimes an
    unterminated svg — everything inside must vanish from extracted
    text, including the HTML-looking foreignObject content."""
    inner = (f'<circle cx="5" cy="5" r="4"/>'
             f"<foreignObject><p>{_prose(rng, rng.randint(3, 12))}</p>"
             f"</foreignObject>"
             f"<text>{rng.choice(_WORDS)}</text>")
    close = "</svg>" if rng.random() < 0.8 else ""
    return (f'<svg viewBox="0 0 10 10">{inner}{close}'
            f"<p>{_prose(rng, rng.randint(4, 15))}</p>")


def _mathml_island(rng: random.Random) -> str:
    """MathML islands: unknown-to-both-kernels tags (math/mrow/mi/mo)
    whose TEXT content flows through under the generic unknown-tag
    rule, mixed into real prose."""
    expr = "".join(
        f"<mi>{rng.choice('abcxyz')}</mi><mo>{rng.choice('+-=')}</mo>"
        for _ in range(rng.randint(1, 4)))
    close = "</math>" if rng.random() < 0.8 else ""
    return (f"<p>{_prose(rng, rng.randint(3, 10))} "
            f'<math xmlns="http://www.w3.org/1998/Math/MathML">'
            f"<mrow>{expr}<mn>{rng.randint(0, 99)}</mn></mrow>{close} "
            f"{_prose(rng, rng.randint(3, 10))}</p>")


def _template_block(rng: random.Random) -> str:
    """<template> shadow content — in browsers it is inert, but both
    kernels treat template as a skip container; parity pins the shared
    rule, including an unterminated variant."""
    inner = (f"<p>{_prose(rng, rng.randint(3, 12))}</p>"
             "<table><tr><td>t1</td><td>t2</td></tr></table>")
    close = "</template>" if rng.random() < 0.8 else ""
    return f"<template>{inner}{close}<p>{_prose(rng, 8)}</p>"


def _srcdoc_iframe(rng: random.Random) -> str:
    """<iframe srcdoc="..."> — an entire mini-document inside ONE
    attribute value. iframe is NOT a skip container in either kernel
    (its fallback text flows) and attribute values never become text,
    so the whole srcdoc payload must vanish — but only if the
    attribute scanner survives raw '<', '>' and newlines inside the
    quoted value (a naive find('>') tokenizer ends the tag inside the
    payload and leaks half a document as text). Variants: double- and
    single-quoted payloads with raw markup + entity-escaped
    &lt;/iframe&gt;, embedded quotes of the other kind, an UNQUOTED
    srcdoc value (ends at first whitespace/'>'), nested iframes, and
    an unterminated-quote tail (the open quote eats the rest of the
    document — HTMLParser never completes the tag; parity pins that)."""
    fall = _prose(rng, rng.randint(3, 10))
    payload = (
        "<!DOCTYPE html><html><body><p>"
        + _prose(rng, rng.randint(4, 14))
        + "</p><table border=1><tr><td>sd1</td><td>sd2</td></tr>"
        + "</table>&lt;/iframe&gt;<div class=footer-links>"
        + _prose(rng, 4) + "</div></body></html>")
    variant = rng.randrange(5)
    if variant == 0:        # double-quoted, newlines inside the value
        sep = "\n " if rng.random() < 0.4 else " "
        return (f'<iframe{sep}width="600"{sep}srcdoc="{payload}"'
                f'{sep}loading=lazy>{fall}</iframe>'
                f"<p>{_prose(rng, 8)}</p>")
    if variant == 1:        # single-quoted, double quotes inside
        inner = payload.replace("border=1", 'border="1" class="x y"')
        return (f"<iframe srcdoc='{inner}' sandbox>{fall}</iframe>"
                f"<p>{_prose(rng, 8)}</p>")
    if variant == 2:        # unquoted value: ends at whitespace/'>'
        return (f"<iframe srcdoc=&lt;p&gt;x&lt;/p&gt; title=t>"
                f"{fall}</iframe><p>{_prose(rng, 8)}</p>")
    if variant == 3:        # nested iframes, both with srcdoc
        return (f'<iframe srcdoc="<p>outer {payload}">'
                f'<iframe srcdoc="<b>inner</b>">{fall}</iframe>'
                f"</iframe><p>{_prose(rng, 8)}</p>")
    # unterminated quote: swallows the rest of this fragment
    return (f'<iframe srcdoc="{payload}<p>never closed '
            f"<p>{_prose(rng, 6)}</p>")


def _legacy_tags(rng: random.Random) -> str:
    """Obsolete-web soup, common in old crawled pages: legacy rawtext
    lookalikes (<xmp>, <listing>, <plaintext> — RAWTEXT in browsers,
    ordinary unknown containers to html.parser and hence to BOTH
    kernels: their inner markup parses normally; parity pins the
    shared rule), presentational relics (<marquee>, <blink>,
    <center>, <font size=...>), and spurious close tags for void
    elements (</br>, </img>, </hr> — ignored: no matching open on
    the stack)."""
    variant = rng.randrange(4)
    if variant == 0:
        inner = (f"<p>{_prose(rng, rng.randint(4, 12))}</p>"
                 "<table><tr><td>x1</td><td>x2</td></tr></table>")
        tag = rng.choice(["xmp", "listing", "plaintext"])
        close = f"</{tag}>" if rng.random() < 0.7 else ""
        return f"<{tag}>{inner}{close}<p>{_prose(rng, 6)}</p>"
    if variant == 1:
        return (f"<center><marquee behavior=alternate>"
                f"{_prose(rng, rng.randint(5, 15))}</marquee>"
                f"<blink>{_prose(rng, 4)}</blink></center>"
                f'<font size="{rng.randint(1, 7)}" color=red>'
                f"{_prose(rng, 10)}</font>")
    if variant == 2:
        return (f"<p>{_prose(rng, 8)}<br></br>{_prose(rng, 6)}"
                f"</img></hr><br/>{_prose(rng, 5)}</p></br>")
    return (f"<table border=1><tr><td><marquee>{_prose(rng, 4)}"
            f"</marquee></td><td><xmp><b>not bold rawtext?</b></xmp>"
            f"</td></tr></table>")


def _pct_encoded_links(rng: random.Random) -> str:
    """Percent-encoded UTF-8 and raw unicode in hrefs + data-URI
    payload blobs — URL bytes must never leak into extracted text."""
    links = " ".join([
        f'<a href="/caf%C3%A9/{rng.choice(_WORDS)}%20page">'
        f"{rng.choice(_WORDS)}</a>",
        f'<a href="/wiki/%E4%B8%AD%E6%96%87">{rng.choice(_WORDS)}</a>',
        f'<a href="data:image/png;base64,iVBORw0KGg'
        f'{"A" * rng.randint(8, 64)}=">{rng.choice(_WORDS)}</a>',
    ])
    return f"<p>{links} {_prose(rng, rng.randint(4, 16))}</p>"


_LANG_TAGS = ["en", "en-US", "ar", "he-IL", "zh-Hans", "EN-gb",
              "x-klingon", ""]


def _lang_dir_soup(rng: random.Random) -> str:
    """xml:lang / lang / dir attribute soup: nested elements that
    re-declare language and direction with contradictory, duplicated,
    bogus, empty and bare forms (dir with no value, lang vs xml:lang
    disagreeing, dir=AUTO). Both kernels parse and ignore these
    attributes; the content must flow through identically no matter
    how the declarations nest."""
    span_dir = rng.choice(["rtl", "ltr", "auto", "RTL", ""])
    inner_words = " ".join(
        rng.choice(_RTL_WORDS if rng.random() < 0.4 else _WORDS)
        for _ in range(rng.randint(4, 12)))
    span_attr = f' dir="{span_dir}"' if span_dir else " dir"
    span = f"<span{span_attr}>{inner_words}</span>"
    p_attrs = []
    if rng.random() < 0.7:
        p_attrs.append(f'xml:lang="{rng.choice(_LANG_TAGS)}"')
    if rng.random() < 0.7:
        p_attrs.append(f'lang="{rng.choice(_LANG_TAGS)}"')
    if rng.random() < 0.3:  # duplicate attribute: first one wins
        p_attrs.append(f'lang="{rng.choice(_LANG_TAGS)}"')
    if rng.random() < 0.5:
        p_attrs.append(f'dir={rng.choice(["rtl", "ltr", "auto"])}')
    p = (f"<p {' '.join(p_attrs)}>{_prose(rng, rng.randint(3, 10))} "
         f"{span} {_prose(rng, rng.randint(0, 6))}</p>")
    close = "</div>" if rng.random() < 0.8 else ""
    return (f'<div lang="{rng.choice(_LANG_TAGS)}" '
            f'dir="{rng.choice(["ltr", "rtl"])}">{p}{close}')


def _nested_marked(rng: random.Random) -> str:
    """NESTED marked sections — a marked section opener inside another
    marked section's body. SGML nests these; HTML parsers do not: a
    CDATA body ends at the FIRST ]]> so the outer tail leaks as text,
    and downlevel-revealed <![if]> sections simply interleave. Parity
    pins whichever shared rule the kernels implement, including
    unterminated inner openers."""
    w1, w2, w3 = (rng.choice(_WORDS) for _ in range(3))
    variant = rng.randrange(4)
    if variant == 0:  # CDATA inside CDATA: outer tail leaks after 1st ]]>
        frag = (f"<![CDATA[{w1} <![CDATA[{w2}]]> {w3}-leaks]]>")
    elif variant == 1:  # if inside if, both closed, interleaved endifs
        frag = (f"<![if gte IE 5]>{w1} <![if !ie]>{w2}<![endif]> "
                f"{w3}<![endif]>")
    elif variant == 2:  # ignore inside ignore
        frag = f"<![ignore[{w1} <![ignore[{w2}]]> ]]>{w3}"
    else:  # unterminated inner opener inside a closed outer
        frag = f"<![if ie]>{w1} <![CDATA[{w2}<![endif]> {w3}"
    return f"<p>{_prose(rng, rng.randint(2, 8))} {frag}</p>"


def _meta_refresh(rng: random.Random) -> str:
    """Meta-refresh redirects (and friends): void <meta> tags whose
    content attribute carries a URL — common on parked/moved pages.
    The URL bytes must never leak into extracted text, and the void
    tag must not desync the block structure."""
    url = f"https://moved.example/{rng.choice(_WORDS)}"
    variant = rng.randrange(3)
    if variant == 0:
        m = f'<meta http-equiv="refresh" content="0;url={url}">'
    elif variant == 1:  # uppercase + weird spacing + no quotes
        m = f"<META HTTP-EQUIV=Refresh CONTENT='5; URL = {url}'>"
    else:  # canonical/og soup alongside
        m = (f'<link rel="canonical" href="{url}">'
             f'<meta property="og:url" content="{url}">')
    return f"{m}<p>{_prose(rng, rng.randint(4, 14))}</p>"


def _hidden_style(rng: random.Random) -> str:
    """Visually-hidden text: display:none / visibility:hidden inline
    styles and sr-only-ish classes. NEITHER kernel parses CSS, so the
    text flows through extraction — parity pins that shared rule (a
    kernel that started honoring display:none would silently change
    bytes)."""
    hidden = rng.choice([
        '<div style="display:none">',
        '<span style="visibility:hidden; position:absolute">',
        '<div style = "DISPLAY:NONE ">',
        '<p class="sr-only visually-hidden">',
    ])
    close = {"<d": "</div>", "<s": "</span>", "<p": "</p>"}[hidden[:2]]
    return (f"<p>{_prose(rng, rng.randint(3, 10))}</p>"
            f"{hidden}{_prose(rng, rng.randint(2, 8))}{close}"
            f"<p>{_prose(rng, rng.randint(3, 10))}</p>")


def _colspan_overflow(rng: random.Random) -> str:
    """Hostile table attributes: colspan/rowspan values that overflow
    machine integers, are negative, or are plain junk. Attribute
    parsing must not crash and the grid must come out the same from
    both kernels."""
    span = rng.choice([
        "999999999999999999999999", "-1", "2x", "1e9", "0", "",
        str(1 << 70),
    ])
    w1, w2 = rng.choice(_WORDS), rng.choice(_WORDS)
    return (f'<table border=1><tr><td colspan="{span}">{w1}</td>'
            f'<td rowspan={span or chr(39)}>{rng.randint(1, 99)}</td></tr>'
            f"<tr><td>{w2}</td><td>{rng.randint(1, 99)}</td></tr></table>")


def _table_sections(rng: random.Random) -> str:
    """HTML table-structure elements the cell pipeline must ignore
    gracefully: <caption> prose (no open cell → dropped by both
    kernels), <colgroup>/<col> (incl. void-ish and never-closed),
    <thead>/<tbody>/<tfoot> in legal-but-odd orders (tfoot before
    tbody), stray section close tags, and a <th> header row inside
    thead. The GRID must come out identical from both kernels."""
    w = [rng.choice(_WORDS) for _ in range(6)]
    cap = f"<caption>{_prose(rng, rng.randint(2, 8))}</caption>"
    cols = rng.choice([
        '<colgroup><col span="2"><col width="50%"></colgroup>',
        "<colgroup span=3>", "<col><col>", ""])
    tfoot = (f"<tfoot><tr><td>{w[4]}</td><td>{rng.randint(1, 99)}</td>"
             f"</tr></tfoot>")
    body = (f"<tbody><tr><td>{w[2]}</td><td>{rng.randint(1, 99)}</td>"
            f"</tr><tr><td>{w[3]}</td><td>{rng.randint(1, 99)}</td>"
            f"</tr>{'</tbody>' if rng.random() < 0.7 else ''}")
    head = f"<thead><tr><th>{w[0]}</th><th>{w[1]}</th></tr></thead>"
    order = rng.choice([
        [cap, cols, head, tfoot, body],   # legal: tfoot before tbody
        [cols, cap, head, body, tfoot],
        [cap, head, body, "</tbody>", tfoot],  # stray close
    ])
    return ("<table border=1>" + "".join(order) + "</table>"
            + rng.choice(["", "</tfoot>", "</colgroup>"]))


def _widget_soup(rng: random.Random) -> str:
    """Form-widget content + markup-lookalike traps: <textarea> is NOT
    rawtext for either kernel (stdlib HTMLParser CDATA set is
    script/style only), so table-ish markup inside it parses as real
    tags; <select>/<option> text flows; duplicate attributes (both
    kernels take dict(attrs) — LAST wins, pinned here); processing
    instructions and mid-document doctype declarations are no-ops."""
    w1, w2 = rng.choice(_WORDS), rng.choice(_WORDS)
    dup_cls = rng.choice(_BOILER_CLASSES)
    parts = [
        f'<div class="content" class="{dup_cls}">'
        f"<p>{_prose(rng, rng.randint(6, 18))}</p></div>",
        f"<textarea rows=4>{w1} <td>{w2}</td> &lt;p&gt; "
        f"</ textarea> {_prose(rng, 4)}</textarea>",
        f"<form action=x><select multiple><option value=1>{w1}"
        f"<option selected>{w2}</option></select>"
        f"<input type=text value=\"{w1}\"></form>",
        f'<?php echo "<table><tr><td>{w1}</td></tr></table>"; ?>',
        "<!DOCTYPE html PUBLIC \"-//W3C//DTD HTML 4.01//EN\">",
        f"<p>{_prose(rng, rng.randint(5, 15))}</p>",
    ]
    rng.shuffle(parts)
    return "".join(parts[: rng.randint(3, len(parts))])


def _megaline(rng: random.Random) -> str:
    """One minified mega-paragraph: thousands of words, zero newlines.
    Stresses scanner buffering and any per-block windowing cap."""
    n = rng.randint(1500, 4000)
    body = " ".join(rng.choice(_WORDS) for _ in range(n))
    return f"<p>{body}</p>"


def gen_hard_row(doc_id: int, seed: int = 1042) -> dict:
    rng = random.Random((seed << 20) ^ doc_id)
    parts = [rng.choice(["<!DOCTYPE html>", "<!doctype HTML >", ""])]
    if rng.random() < 0.04:  # rare: very-long single-line document
        parts.append(_megaline(rng))
    for _ in range(rng.randint(3, 10)):
        kind = rng.randrange(30)
        if kind == 0:
            parts.append(_deep_nav(rng))
        elif kind == 1:
            parts.append(f"<p>{_prose(rng, rng.randint(8, 60))}</p>")
        elif kind == 2:
            parts.append(_trapped_table(rng))
        elif kind == 3:
            parts.append(_rawtext_trap(rng))
        elif kind == 4:
            parts.append(rng.choice(_TRAPS))
        elif kind == 5:
            parts.append(_entity_soup(rng))
        elif kind == 6:
            parts.append(_pre_stream_table(rng))
        elif kind == 7:
            parts.append(_nested_table(rng))
        elif kind == 8:
            parts.append(_link_farm(rng) + rng.choice(_MARKED))
        elif kind == 9:
            parts.append(_base_url_soup(rng))
        elif kind == 10:
            parts.append(_rtl_block(rng))
        elif kind == 11:
            w = rng.choice(_WORDS)
            parts.append(
                f"<p>{w}{rng.choice(_ZERO_WIDTH)}{rng.choice(_WORDS)} "
                f"{_prose(rng, 10)}</p>")
        elif kind == 12:
            parts.append(_noscript_block(rng))
        elif kind == 13:
            parts.append(_conditional_comment(rng))
        elif kind == 14:
            parts.append(_srcset_soup(rng))
        elif kind == 15:
            parts.append(_encoded_tag_text(rng))
        elif kind == 16:
            parts.append(_svg_island(rng))
        elif kind == 17:
            parts.append(_mathml_island(rng))
        elif kind == 18:
            parts.append(_template_block(rng))
        elif kind == 19:
            parts.append(_pct_encoded_links(rng))
        elif kind == 20:
            parts.append(_lang_dir_soup(rng))
        elif kind == 21:
            parts.append(_nested_marked(rng))
        elif kind == 22:
            parts.append(_meta_refresh(rng))
        elif kind == 23:
            parts.append(_hidden_style(rng))
        elif kind == 24:
            parts.append(_colspan_overflow(rng))
        elif kind == 25:
            parts.append(_table_sections(rng))
        elif kind == 26:
            parts.append(_widget_soup(rng))
        elif kind == 27:
            parts.append(_srcdoc_iframe(rng))
        elif kind == 28:
            parts.append(_legacy_tags(rng))
        else:
            parts.append(
                f'<section data-page="{rng.randint(1, 4)}">'
                f"<p>{_prose(rng, 20)}</p>"
                + ("</section>" if rng.random() < 0.8 else ""))
    html = "".join(parts).encode("utf-8")
    if rng.random() < 0.10:  # UTF-8 BOM prefix (neither kernel strips)
        html = b"\xef\xbb\xbf" + html
    if rng.random() < 0.15:  # stray non-utf8 byte → latin-1 fallback
        cut = rng.randrange(max(1, len(html)))
        html = html[:cut] + bytes([rng.randint(0x80, 0xFF)]) + html[cut:]
    if rng.random() < 0.08:  # chunked-transfer truncation artifacts:
        # cuts land at arbitrary BYTE positions, i.e. sometimes inside
        # a multi-byte UTF-8 sequence (RTL/CJK content above makes
        # those common) — exercising the decode-fallback path at the
        # exact places real de-chunker glitches produce them
        cut = rng.randrange(max(1, len(html)))
        variant = rng.randrange(3)
        if variant == 0:    # connection died mid-chunk: hard truncate
            html = html[:cut]
        elif variant == 1:  # one chunk lost: splice out a middle span
            cut2 = min(len(html), cut + rng.randint(64, 2048))
            html = html[:cut] + html[cut2:]
        else:               # de-chunker leaked a chunk-size line
            html = (html[:cut] + b"\r\n"
                    + f"{rng.randint(0x10, 0xFFF):x}".encode()
                    + b"\r\n" + html[cut:])
    return {"url": f"https://hard.example/{doc_id:08d}", "html": html}


def gen_hard_rows(n: int, seed: int = 1042) -> list[dict]:
    return [gen_hard_row(i, seed) for i in range(n)]
