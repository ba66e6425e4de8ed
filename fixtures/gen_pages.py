"""Deterministic `pages` corpus generator (FIXTURES.md §1, seed 42).

Generates Common-Crawl-shaped rows (url, warc_ts, html BINARY, text,
lang) mixing the corpus families that exercise each operator family
(SURVEY.md §2). Per-row determinism: every row is a pure function of
(seed, doc_id) — generation order and process boundaries don't matter,
so the same corpus can be produced distributed or locally.

CLI:  python -m fixtures.gen_pages OUT.parquet N [SEED]
"""

from __future__ import annotations

import random
import re
import sys
from datetime import datetime, timedelta, timezone

FAMILIES = [
    ("lattice_table", 15),
    ("stream_table", 10),
    ("boilerplate_heavy", 25),
    ("mixed", 20),
    ("mega_doc", 2),
    ("edge_cases", 8),
    ("plain_text", 20),
]
_FAM_TOTAL = sum(w for _, w in FAMILIES)

LANGS = [("en", 70), ("de", 8), ("fr", 8), ("es", 8), ("zh", 3), ("ru", 3)]

_WORDS = (
    "growth market report analysis quarterly outlook sector index value "
    "strategy research capital global emerging policy risk return data "
    "model trend signal forecast region industry supply demand price "
    "company investor fund equity bond credit rate inflation earnings "
    "guidance revenue margin segment product customer channel pipeline"
).split()

_FIN_METRICS = [
    "Revenue", "Net income", "Operating expense", "Gross profit",
    "EBITDA", "Total assets", "Total liabilities", "Cash flow",
    "Free cash flow", "Capex", "Dividends", "Working capital",
]
_SCI_COLS = ["sample", "mean", "std", "p-value", "n="]
_TICKERS = ["AAPL", "MSFT", "NVDA", "AMZN", "GOOG", "BRK.A", "JPM",
            "XOM", "UNH", "V"]
_NAV_LINKS = ["Home", "About", "Products", "Pricing", "Careers", "Blog",
              "Contact", "Support", "Terms", "Privacy"]

_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")

_EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n)).capitalize() + "."


def _paragraph(rng: random.Random, sentences: int = 4) -> str:
    return " ".join(_sentence(rng, rng.randint(8, 18))
                    for _ in range(sentences))


def _fin_cell(rng: random.Random) -> str:
    kind = rng.random()
    if kind < 0.5:
        return f"${rng.randint(1, 999):,}" + rng.choice([",000", ",500", ""])
    if kind < 0.7:
        return f"{rng.randint(1, 99)}.{rng.randint(0, 9)}%"
    if kind < 0.85:
        return f"{rng.randint(1, 9)}.{rng.randint(0, 99):02d}x"
    return str(rng.randint(100, 99999))


def _lattice_table_html(rng: random.Random, rows=None, cols=None) -> str:
    cols = cols or rng.randint(2, 8)
    rows = rows or rng.randint(2, 30)
    q = f"Q{rng.randint(1, 4)} {rng.randint(2019, 2025)}"
    header = ["Metric"] + [q] + [
        f"FY {rng.randint(2018, 2025)}" for _ in range(cols - 2)
    ]
    body = []
    for _ in range(rows - 1):
        metric = rng.choice(_FIN_METRICS)
        if rng.random() < 0.15:
            metric += f" ({rng.choice(_TICKERS)})"
        body.append([metric] + [_fin_cell(rng) for _ in range(cols - 1)])
    out = ['<table border="1">']
    out.append("<tr>" + "".join(f"<th>{h}</th>" for h in header) + "</tr>")
    for r in body:
        out.append("<tr>" + "".join(f"<td>{c}</td>" for c in r) + "</tr>")
    out.append("</table>")
    return "".join(out)


def _borderless_table_html(rng: random.Random) -> str:
    cols = rng.randint(2, 5)
    rows = rng.randint(2, 12)
    out = ["<table>"]
    out.append("<tr>" + "".join(
        f"<th>{rng.choice(['price', 'volume', 'open', 'close', 'yield', 'bid'])}</th>"
        for _ in range(cols)) + "</tr>")
    for _ in range(rows - 1):
        out.append("<tr>" + "".join(
            f"<td>${rng.randint(1, 500)}.{rng.randint(0, 99):02d}</td>"
            for _ in range(cols)) + "</tr>")
    out.append("</table>")
    return "".join(out)


def _pre_stream_table(rng: random.Random) -> str:
    cols = rng.randint(2, 5)
    rows = rng.randint(3, 15)
    header = "  ".join(f"{rng.choice(_SCI_COLS):>10}" for _ in range(cols))
    lines = [header]
    for _ in range(rows - 1):
        cells = []
        for _ in range(cols):
            k = rng.random()
            if k < 0.5:
                cells.append(f"{rng.uniform(0, 99):.2f}")
            elif k < 0.7:
                cells.append(f"p < 0.{rng.randint(1, 9):02d}")
            else:
                cells.append(f"n = {rng.randint(5, 500)}")
        lines.append("  ".join(f"{c:>10}" for c in cells))
    return "<pre>\n" + "\n".join(lines) + "\n</pre>"


def _nav_html(rng: random.Random) -> str:
    links = rng.sample(_NAV_LINKS, rng.randint(4, 8))
    return ("<nav><ul>" + "".join(
        f'<li><a href="/{w.lower()}">{w}</a></li>' for w in links
    ) + "</ul></nav>")


def _boiler_divs(rng: random.Random) -> str:
    out = []
    if rng.random() < 0.6:
        out.append('<div class="cookie-banner">We use cookies. '
                   '<a href="/accept">Accept</a> <a href="/no">Decline</a></div>')
    out.append('<div class="sidebar"><ul>' + "".join(
        f'<li><a href="/t/{w}">{w}</a></li>'
        for w in rng.sample(_WORDS, rng.randint(3, 7))
    ) + "</ul></div>")
    return "".join(out)


def _footer_html(rng: random.Random) -> str:
    return ('<footer><a href="/terms">Terms</a> | '
            '<a href="/privacy">Privacy</a> | '
            f"(c) {rng.randint(2018, 2025)} site{rng.randint(0, 996)}"
            "</footer>")


def _figure_html(rng: random.Random, n: int) -> str:
    return (f'<figure><div class="img" data-x="{rng.randint(0, 500)}" '
            f'data-y="{rng.randint(0, 700)}"></div>'
            f"<figcaption>Figure {n}: {_sentence(rng, 6)}"
            f"</figcaption></figure>")


def _family_for(rng: random.Random) -> str:
    r = rng.uniform(0, _FAM_TOTAL)
    acc = 0.0
    for fam, w in FAMILIES:
        acc += w
        if r < acc:
            return fam
    return FAMILIES[-1][0]


def _build_html(fam: str, rng: random.Random) -> str:
    if fam == "lattice_table":
        parts = ["<body>", f"<h1>{_sentence(rng, 5)}</h1>",
                 f"<p>{_paragraph(rng)}</p>"]
        for _ in range(rng.randint(1, 3)):
            parts.append(_lattice_table_html(rng))
        parts.append("</body>")
        return "".join(parts)
    if fam == "stream_table":
        parts = ["<body>", f"<p>{_paragraph(rng)}</p>"]
        for _ in range(rng.randint(1, 2)):
            parts.append(_pre_stream_table(rng))
        if rng.random() < 0.5:
            parts.append(_borderless_table_html(rng))
        parts.append("</body>")
        return "".join(parts)
    if fam == "boilerplate_heavy":
        parts = ["<body>", _nav_html(rng), _boiler_divs(rng),
                 f"<h1>{_sentence(rng, 4)}</h1>"]
        for _ in range(rng.randint(1, 3)):
            parts.append(f"<p>{_paragraph(rng, rng.randint(2, 6))}</p>")
        parts.append(_footer_html(rng))
        parts.append("</body>")
        return "".join(parts)
    if fam == "mixed":
        parts = ["<body>", _nav_html(rng), f"<h1>{_sentence(rng, 5)}</h1>",
                 f"<p>{_paragraph(rng)}</p>"]
        tbls = []
        for _ in range(rng.randint(1, 3)):
            t = (_lattice_table_html(rng) if rng.random() < 0.6
                 else _borderless_table_html(rng))
            tbls.append(t)
        # plant a same-page duplicate (deduped, quirk #6) ...
        if tbls and rng.random() < 0.5:
            tbls.append(tbls[0])
        parts.extend(tbls)
        parts.append(_figure_html(rng, rng.randint(1, 9)))
        if rng.random() < 0.4 and tbls:
            # ... and a cross-page duplicate (NOT deduped, quirk #6)
            parts.append(f'<section data-page="2"><p>{_paragraph(rng)}</p>'
                         + tbls[0] + "</section>")
        parts.append(_footer_html(rng))
        parts.append("</body>")
        return "".join(parts)
    if fam == "mega_doc":
        n_pages = rng.randint(20, 60)
        parts = ["<body>"]
        for pg in range(1, n_pages + 1):
            parts.append(f'<section data-page="{pg}">')
            parts.append(f"<h2>{_sentence(rng, 4)}</h2>")
            for _ in range(rng.randint(2, 5)):
                parts.append(f"<p>{_paragraph(rng, 6)}</p>")
            if rng.random() < 0.7:
                parts.append(_lattice_table_html(rng))
            parts.append("</section>")
        parts.append("</body>")
        return "".join(parts)
    if fam == "edge_cases":
        k = rng.randint(0, 6)
        if k == 0:
            return ""
        if k == 1:
            return "   \n\t  "
        if k == 2:  # single-row table: invalid per F4
            return ('<body><p>One-row table below.</p><table border="1">'
                    "<tr><td>alpha</td><td>beta</td></tr></table></body>")
        if k == 3:  # >100-col table (verification warning path)
            cells = "".join(f"<td>c{i}</td>" for i in range(105))
            return ('<body><table border="1">'
                    f"<tr>{cells}</tr><tr>{cells}</tr></table></body>")
        if k == 4:  # control chars / NULs / CRLF in cells (C1 paths)
            return ("<body><table border=\"1\"><tr><th>a\x00b</th>"
                    "<th>c\rd</th></tr><tr><td>e\x01f</td>"
                    "<td>g\r\nh</td></tr></table></body>")
        if k == 5:  # numeric-looking header row (quirk #4: still header)
            return ('<body><table border="1"><tr><td>2021</td><td>2022</td>'
                    "</tr><tr><td>100</td><td>200</td></tr>"
                    "<tr><td>300</td><td>400</td></tr></table></body>")
        # non-ASCII content (exercised with latin-1 byte encoding below)
        return (f"<body><p>Temp 25{chr(176)}C {chr(177)}0.5 at "
                f"caf{chr(233)} {_sentence(rng, 10)}</p></body>")
    # plain_text
    parts = ["<body>", f"<h1>{_sentence(rng, 5)}</h1>"]
    for _ in range(rng.randint(2, 6)):
        parts.append(f"<p>{_paragraph(rng, rng.randint(3, 8))}</p>")
    if rng.random() < 0.3:
        parts.append(f"<p>ESG: carbon emissions scope 1 {_sentence(rng, 6)}"
                     " sustainability governance.</p>")
    parts.append("</body>")
    return "".join(parts)


def gen_row(doc_id: int, seed: int = 42) -> dict:
    rng = random.Random(f"{seed}:{doc_id}")
    fam = _family_for(rng)
    lang_r = rng.uniform(0, 100)
    acc = 0.0
    lang = "en"
    for code, w in LANGS:
        acc += w
        if lang_r < acc:
            lang = code
            break
    category = fam.replace("_", "-")
    url = f"https://site{doc_id % 997}.example/{category}/{doc_id:08d}"
    ts = _EPOCH + timedelta(seconds=(doc_id * 137) % (365 * 86400))
    html_str = _build_html(fam, rng)
    # 2% of rows: deliberately non-UTF-8 (latin-1) bytes
    if rng.random() < 0.02 and any(ord(c) > 127 for c in html_str):
        html = html_str.encode("latin-1", errors="replace")
    else:
        html = html_str.encode("utf-8")
    text = _WS_RE.sub(" ", _TAG_RE.sub(" ", html_str)).strip()
    return {"url": url, "warc_ts": ts, "html": html, "text": text,
            "lang": lang, "_family": fam}


def gen_rows(n: int, seed: int = 42) -> list[dict]:
    return [gen_row(i, seed) for i in range(n)]


def write_parquet(path: str, n: int, seed: int = 42,
                  keep_family: bool = False) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = gen_rows(n, seed)
    cols = ["url", "warc_ts", "html", "text", "lang"]
    if keep_family:
        cols.append("_family")
    data = {c: [r[c] for r in rows] for c in cols}
    schema_fields = [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
    if keep_family:
        schema_fields.append(("_family", pa.string()))
    table = pa.table(data, schema=pa.schema(schema_fields))
    pq.write_table(table, path)


if __name__ == "__main__":
    out, n = sys.argv[1], int(sys.argv[2])
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    write_parquet(out, n, seed)
    print(f"wrote {n} rows to {out} (seed {seed})")
