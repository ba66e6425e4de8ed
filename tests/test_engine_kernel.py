"""Engine kernel ⇔ refkernel equivalence (no Spark needed).

The two implementations were written independently against
KERNEL_SPEC.md; this suite byte-compares them over a generated corpus
and asserts the shared classification lexicon is identical data.
"""

from __future__ import annotations

from fixtures.gen_pages import gen_rows
from pdf_extraction_api_spark.kernel import lexicon
from pdf_extraction_api_spark.kernel.batch import extract_one
from refkernel import classify as ref_classify
from refkernel.extract import extract_document


def test_lexicon_matches_refkernel():
    assert tuple(ref_classify.CLASS_ORDER) == lexicon.CLASS_ORDER
    for t in lexicon.CLASS_ORDER:
        cfg = ref_classify.CLASSIFICATIONS[t]
        assert tuple(cfg["keywords"]) == lexicon.KEYWORDS[t]
        assert tuple(cfg["patterns"]) == lexicon.PATTERNS[t]
        assert tuple(cfg["extract"]) == lexicon.EXTRACTORS[t]
    assert tuple(ref_classify.CURRENCY_MAP) == lexicon.CURRENCY_MAP
    assert tuple(ref_classify.UNIT_PATTERNS) == lexicon.UNIT_PATTERNS
    assert ref_classify.TICKER_EXCLUDE == set(lexicon.TICKER_EXCLUDE)


def _normalize_ref(res: dict) -> dict:
    return {
        "url": res["url"],
        "n_pages": res["n_pages"],
        "extracted_text": res["extracted_text"],
        "tables": res["tables"],
        "spans": res["spans"],
    }


def _normalize_eng(res: dict) -> dict:
    return {k: res[k] for k in
            ("url", "n_pages", "extracted_text", "tables", "spans")}


def test_engine_matches_refkernel_byte_for_byte():
    rows = gen_rows(400, seed=42)
    for r in rows:
        ref = _normalize_ref(extract_document(r["url"], r["html"]))
        eng = _normalize_eng(extract_one(r["url"], r["html"]))
        assert eng == ref, r["url"]


def test_engine_matches_refkernel_alt_seed():
    rows = gen_rows(150, seed=7)
    for r in rows:
        ref = _normalize_ref(extract_document(r["url"], r["html"]))
        eng = _normalize_eng(extract_one(r["url"], r["html"]))
        assert eng == ref, r["url"]


def test_engine_counters():
    res = extract_one(
        "u",
        b"<body><p>Long enough content paragraph for the counter.</p>"
        b'<table border="1"><tr><th>a</th><th>b</th></tr>'
        b"<tr><td>1</td><td>2</td></tr></table></body>")
    assert res["n_tables"] == 1
    assert res["n_content_spans"] == 1
    assert res["error"] is None


def test_engine_error_isolation():
    import pandas as pd

    from pdf_extraction_api_spark.kernel.batch import extract_batches

    pdf = pd.DataFrame({"url": ["a", "b"],
                        "html": [None, b"<p>fine text long enough.</p>"]})
    out = pd.concat(list(extract_batches(iter([pdf]))))
    assert list(out["url"]) == ["a", "b"]
    assert out["error"].isna().all() or (out["error"] == None).all()  # noqa: E711


def test_never_on_lower_patterns_are_dead():
    """The classify patterns elided by tablepipe._NEVER_ON_LOWER must
    each (a) match SOME case-sensitive probe — proving the entry names
    a real pattern, not a typo — and (b) never match that probe
    lowercased, since both engines run classify regexes on .lower()ed
    text only (refkernel/classify.py:204,218)."""
    import re

    from pdf_extraction_api_spark.kernel.tablepipe import _NEVER_ON_LOWER

    probes = {
        r"\d+[KMB]": "5K",
        r"[A-Z]{2}\d{10}": "US1234567890",
        r"[A-Z]{12}": "ABCDEFGHIJKL",
        lexicon.PATTERNS["scientific_data"][2]: "1.2 Ã‚Â± 3.4",
    }
    assert set(probes) == set(_NEVER_ON_LOWER)
    for pat, probe in probes.items():
        rx = re.compile(pat)
        assert rx.search(probe), pat
        assert not rx.search(probe.lower()), pat
        # and the lowercase transform is not an identity on the
        # mandatory atom (guards against a future all-caps-free edit)
        assert probe.lower() != probe


def test_split_whitespace_equals_regex_ws():
    """model._norm/tablepipe.clean_grid use ' '.join(s.split()) where
    refkernel uses re \\s+ sub — valid ONLY if str.split's whitespace
    set equals regex \\s for every codepoint. Pin that exhaustively so
    a CPython unicode-table change can never silently split the two
    kernels."""
    import re
    import sys

    ws = re.compile(r"\s")
    bad = [cp for cp in range(sys.maxunicode + 1)
           if bool(ws.match(chr(cp))) != (chr(cp).split() == [])]
    assert bad == [], [hex(b) for b in bad[:10]]


def test_duplicate_bodies_memoized_with_correct_urls():
    """Exact-duplicate html under different urls: the per-worker memo
    must reuse the parsed body (same object identity for the nested
    results) while every output row keeps ITS OWN url."""
    import pandas as pd

    from pdf_extraction_api_spark.kernel import batch as B

    B._RESULT_MEMO.clear()
    html = (b"<body><p>Shared body long enough to be content.</p>"
            b'<table border="1"><tr><th>a</th><th>b</th></tr>'
            b"<tr><td>1</td><td>2</td></tr></table></body>")
    pdf = pd.DataFrame({"url": ["u1", "u2", "u3"],
                        "html": [html, html, html]})
    out = pd.concat(list(B.extract_batches(iter([pdf]))))
    assert list(out["url"]) == ["u1", "u2", "u3"]
    assert len(B._RESULT_MEMO) == 1  # one body parsed once
    t0, t1, t2 = out["tables"]
    assert t0 is t1 is t2  # memo hit: shared read-only reference
    ref = extract_one("u2", html)
    got = out.iloc[1]
    assert bytes(got["extracted_text"]) == ref["extracted_text"]
    assert got["n_tables"] == ref["n_tables"]
    assert got["spans"] == ref["spans"]


def test_memo_skips_mega_docs():
    import pandas as pd

    from pdf_extraction_api_spark.kernel import batch as B

    B._RESULT_MEMO.clear()
    mega = b"<p>" + b"word " * (B._RESULT_MEMO_MAX_DOC // 5 + 10) + b"</p>"
    pdf = pd.DataFrame({"url": ["m"], "html": [mega]})
    pd.concat(list(B.extract_batches(iter([pdf]))))
    assert len(B._RESULT_MEMO) == 0


def test_memo_byte_budget_evicts_fifo():
    """The memo is bounded by an input-bytes budget as well as the
    entry count (round 6): 1000 executors x a worst-case 256 MiB
    per-worker memo was the scale hazard the budget removes. FIFO
    eviction keeps the accounting exact."""
    from pdf_extraction_api_spark.kernel import batch as B

    B._RESULT_MEMO.clear()
    B._memo_bytes = 0
    try:
        body = 200 << 10  # within the per-doc cap
        for i in range(300):  # 300 x 200 KiB >> 32 MiB budget
            B.memo_put(i.to_bytes(4, "big") * (body // 4), {"url": i})
        assert B._memo_bytes <= B._RESULT_MEMO_MAX_BYTES
        assert len(B._RESULT_MEMO) < 300
        # exact accounting: recompute from scratch
        assert B._memo_bytes == sum(len(k) for k in B._RESULT_MEMO)
        # newest entries survive (FIFO evicts oldest)
        assert any(v["url"] == 299 for v in B._RESULT_MEMO.values())
        assert not any(v["url"] == 0 for v in B._RESULT_MEMO.values())
    finally:
        B._RESULT_MEMO.clear()
        B._memo_bytes = 0
