"""Unit tests for the refkernel HTML model + per-document pipeline."""

from __future__ import annotations

from refkernel.extract import extract_document
from refkernel.htmlmodel import detect_pre_table, parse_html


def _items(html: str):
    return parse_html(html.encode())[0]


def test_boilerplate_by_tag():
    items = _items("<body><nav><ul><li><a href='/'>Home</a></li></ul></nav>"
                   "<p>This is a long enough real content paragraph for "
                   "sure.</p></body>")
    kinds = [(i[2], i[3]) for i in items if i[0] == "block"]
    assert kinds[0][0] == "boilerplate"
    assert kinds[1][0] == "content"


def test_boilerplate_by_link_density():
    html = ("<body><div><a href='/x'>all of this block text is links "
            "entirely</a></div>"
            "<p>Mostly plain prose with one <a href='/y'>link</a> inside "
            "a long paragraph of ordinary text.</p></body>")
    kinds = [i[2] for i in _items(html) if i[0] == "block"]
    assert kinds == ["boilerplate", "content"]


def test_boilerplate_by_class_token():
    html = ('<body><div class="cookie-banner">We use cookies okay?</div>'
            "<p>Real content paragraph that is long enough to pass.</p>"
            "</body>")
    kinds = [i[2] for i in _items(html) if i[0] == "block"]
    assert kinds == ["boilerplate", "content"]


def test_short_linky_block_is_boilerplate():
    # <25 chars and link density >0.2
    html = "<body><p>See <a href='/m'>more stuff</a></p></body>"
    kinds = [i[2] for i in _items(html) if i[0] == "block"]
    assert kinds == ["boilerplate"]


def test_pages_from_sections():
    html = ('<body><p>page one text that is long enough here.</p>'
            '<section data-page="2"><p>page two text that is long '
            'enough.</p></section>'
            "<p>back on page one again with more prose here.</p></body>")
    items, n_pages = parse_html(html.encode())
    assert n_pages == 2
    assert [i[1] for i in items] == [1, 2, 1]


def test_lattice_vs_stream_method():
    html = ('<table border="1"><tr><td>a</td><td>b</td></tr>'
            "<tr><td>c</td><td>d</td></tr></table>"
            "<table><tr><td>e</td><td>f</td></tr>"
            "<tr><td>g</td><td>h</td></tr></table>")
    tabs = [i for i in _items(html) if i[0] == "table"]
    assert [t[2] for t in tabs] == ["lattice", "stream"]


def test_pre_stream_detection():
    good = "col a      col b\n1.0      2.0\n3.0      4.0"
    assert detect_pre_table(good) == [
        ["col a", "col b"], ["1.0", "2.0"], ["3.0", "4.0"]]
    assert detect_pre_table("just\nprose\nlines") is None
    assert detect_pre_table("one  line") is None


def test_script_style_skipped():
    html = ("<body><script>var x = 'not text';</script>"
            "<style>p{color:red}</style>"
            "<p>Visible content paragraph long enough to count.</p></body>")
    blocks = [i for i in _items(html) if i[0] == "block"]
    assert len(blocks) == 1
    assert "Visible" in blocks[0][3]


def test_entities_decoded():
    items = _items("<p>AT&amp;T &lt;rocks&gt; really quite a lot here</p>")
    assert items[0][3] == "AT&T <rocks> really quite a lot here"


def test_latin1_fallback():
    html = "<p>caf\xe9 content that is long enough to be kept</p>".encode(
        "latin-1")
    items, _ = parse_html(html)
    assert "caf\xe9" in items[0][3]


def test_quirk4_numeric_header_still_promoted():
    html = ('<body><table border="1"><tr><td>2021</td><td>2022</td></tr>'
            "<tr><td>100</td><td>200</td></tr>"
            "<tr><td>300</td><td>400</td></tr></table></body>")
    res = extract_document("u", html.encode())
    t = res["tables"][0]
    assert t["cells"][0] == ["2021", "2022"]  # header row kept in cells
    assert t["rows"] == 2  # body rows after unconditional promotion
    assert t["csv_bytes"] == b"2021,2022\n100,200\n300,400\n"


def test_quirk6_dedup_page_local_with_index_gaps():
    tbl = ('<table border="1"><tr><th>h1</th><th>h2</th></tr>'
           "<tr><td>x</td><td>y</td></tr></table>")
    other = ('<table border="1"><tr><th>a</th><th>b</th></tr>'
             "<tr><td>1</td><td>2</td></tr></table>")
    html = ("<body>" + tbl + other + tbl  # same-page dup → removed
            + f'<section data-page="2">{tbl}</section>'  # cross-page → kept
            + "</body>")
    res = extract_document("u", html.encode())
    got = [(t["page"], t["table_index"]) for t in res["tables"]]
    assert got == [(1, 1), (1, 2), (2, 1)]  # index 3 deduped away
    assert res["tables"][0]["content_hash"] == res["tables"][2]["content_hash"]


def test_single_row_table_invalid_f4():
    html = ('<body><table border="1"><tr><td>a</td><td>b</td></tr></table>'
            "</body>")
    assert extract_document("u", html.encode())["tables"] == []


def test_empty_and_whitespace_docs():
    for payload in (b"", b"   \n\t  "):
        res = extract_document("u", payload)
        assert res["extracted_text"] == b""
        assert res["tables"] == []
        assert res["spans"] == []
        assert res["n_pages"] == 0


def test_spans_offsets_are_consistent():
    html = ("<body><p>First content paragraph long enough here ok.</p>"
            "<p>Second content paragraph also long enough ok.</p></body>")
    res = extract_document("u", html.encode())
    s0, s1 = res["spans"]
    assert s0["start"] == 0
    assert s1["start"] == s0["end"] + 1
    text = res["extracted_text"].decode()
    assert text.split("\n\n")[0] == "First content paragraph long enough here ok."


def test_control_chars_cleaned_c1():
    html = ("<body><table border=\"1\"><tr><th>a\x00b</th><th>c d</th></tr>"
            "<tr><td>e\x01f</td><td>g h</td></tr></table></body>")
    res = extract_document("u", html.encode())
    assert res["tables"][0]["cells"][0][0] == "ab"
    assert res["tables"][0]["cells"][1][0] == "ef"


def test_numeric_and_empty_percentages():
    html = ('<body><table border="1"><tr><th>name</th><th>v</th></tr>'
            "<tr><td>x</td><td>1.5</td></tr>"
            "<tr><td></td><td>2</td></tr></table></body>")
    res = extract_document("u", html.encode())
    t = res["tables"][0]
    assert t["numeric_percentage"] == 0.5  # 2 numeric of 4 body cells
    assert t["empty_cell_percentage"] == 0.25


def test_determinism_same_input_same_bytes():
    from fixtures.gen_pages import gen_rows
    rows = gen_rows(30)
    a = [extract_document(r["url"], r["html"]) for r in rows]
    b = [extract_document(r["url"], r["html"]) for r in rows]
    assert a == b


def test_numeric_match_equiv():
    """_numeric_match's str-ops rewrite must agree in truthiness with
    the reference regex ^-?\\d+\\.?\\d*$ on stripped input for every
    cell shape, including the Nd-vs-No unicode digit distinction."""
    import random
    import string

    from pdf_extraction_api_spark.kernel.tablepipe import (
        _NUMERIC, _numeric_match)

    explicit = [
        "", " ", "-", ".", "-.", "--1", "1", "-1", "1.", "1.5", "-1.5",
        ".5", "1.2.3", "1-2", " 12 ", "\t-3.14\n", "5..", "12a", "a12",
        "1 2", "²", "½", "١٢", "١.٢",
        "-١", "1²", "+1", "1e5", "nan", "inf", "0.0", "00.",
    ]
    rng = random.Random(5)
    alphabet = string.digits + string.ascii_letters + "-.,$% \t١²"
    fuzz = ["".join(rng.choice(alphabet) for _ in range(rng.randrange(8)))
            for _ in range(5000)]
    for c in explicit + fuzz:
        assert bool(_numeric_match(c)) == bool(_NUMERIC.match(c.strip())), c


def test_clean_grid_fast_path_equiv():
    """The ascii-printable-no-space fast path must be byte-equivalent
    to the full join(split) + printable-filter pipeline (ASCII's only
    printable whitespace is 0x20, so the guard implies no-op)."""
    import random

    from pdf_extraction_api_spark.kernel.tablepipe import clean_grid

    def reference(raw):
        out = []
        for row in raw:
            crow, keep = [], False
            for cell in row:
                if cell is None:
                    crow.append("")
                    continue
                if not isinstance(cell, str):
                    cell = str(cell)
                s = " ".join(cell.split())
                if not s.isprintable():
                    s = "".join(ch for ch in s if ch.isprintable())
                crow.append(s)
                if s:
                    keep = True
            if keep:
                out.append(crow)
        return out

    rng = random.Random(55)
    alphabet = ("abcXYZ019$%.,-\t\n\r\x0b\x0c \x00\x7f  "
                "​́é²½")
    explicit = [
        [[None, "", " ", "a b", "$1,234", "37.08", "x\x00y", "é"]],
        [[" ", "a b", "a​b", 12, 3.5, True]],
    ]
    fuzz = [[["".join(rng.choice(alphabet)
                      for _ in range(rng.randrange(10)))
              for _ in range(rng.randrange(5))]
             for _ in range(rng.randrange(4))] for _ in range(3000)]
    for g in explicit + fuzz:
        assert clean_grid(g) == reference(g), g
