"""Dedup-pipeline ground truth: the LSH-verified Jaccard pairs must be
a value-exact subset of the brute-force all-pairs computation, and on
the test corpus the candidate generator loses nothing (recall 1.0 —
every brute pair with >= 5 shared shingles shares a band signature)."""

from __future__ import annotations

import duckdb
import pytest


def test_lsh_jaccard_matches_brute_force(spark):
    from pdf_extraction_api_spark.operators.textops import (
        _SHINGLES_SQL,
        dd_ngram_jaccard,
    )

    sf = "/root/testdata/sf0.001"
    got = {(r.doc_a, r.doc_b): r.jaccard
           for r in dd_ngram_jaccard(spark, sf).collect()}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')")
    brute = con.sql(f"""
        WITH shingles AS ({_SHINGLES_SQL}),
        sizes AS (SELECT doc_id, count(*) AS n FROM shingles
                  GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
          FROM shingles a JOIN shingles b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2 HAVING count(*) >= 5)
        SELECT doc_a, doc_b,
               round(inter / (sa.n + sb.n - inter), 6) AS j
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
    """).fetchall()
    truth = {(a, b): j for a, b, j in brute}

    assert got, "no near-dup pairs found at all"
    assert set(got) <= set(truth)  # never invents pairs
    for k, v in got.items():
        assert abs(v - truth[k]) < 1e-9, (k, v, truth[k])
    # candidate recall on this corpus: total (the 4-band minhash keys
    # collide for every >=5-shingle-overlap pair here)
    assert set(got) == set(truth)


def test_components_ground_truth(spark, tmp_path):
    """Planted clusters: three near-dup families (shared long prefix,
    unique tails) plus isolated docs. dd_components must assign every
    family exactly one component labeled by its min doc_id, never
    merge families, and ignore docs with no near-dup at all."""
    base_a = " ".join(f"alpha{i}" for i in range(25))
    base_b = " ".join(f"beta{i}" for i in range(25))
    base_c = " ".join(f"gamma{i}" for i in range(25))
    rows = []
    for i in range(4):
        rows.append((10 + i, f"{base_a} tail{i}", 200, "x"))
    for i in range(3):
        rows.append((20 + i, f"{base_b} tail{i}", 200, "x"))
    for i in range(2):
        rows.append((30 + i, f"{base_c} tail{i}", 200, "x"))
    rows.append((99, " ".join(f"loner{i}" for i in range(30)), 200, "x"))
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, n_chars LONG, source STRING"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    from pdf_extraction_api_spark.operators.textops import dd_components

    got = {r.doc_id: (r.component, r.is_keeper)
           for r in dd_components(spark, str(tmp_path)).collect()}
    assert 99 not in got  # no edges → not in the component relation
    for i in range(4):
        assert got[10 + i] == (10, "true" if i == 0 else "false")
    for i in range(3):
        assert got[20 + i] == (20, "true" if i == 0 else "false")
    for i in range(2):
        assert got[30 + i] == (30, "true" if i == 0 else "false")


def test_decontam_ground_truth(spark, tmp_path):
    """Planted eval-overlap: doc 0 (benchmark: 0 % 7 == 0) donates a
    13-token run to doc 1; doc 2 is clean; doc 7 is a second benchmark
    doc that matches nothing. Exactly doc 1 is flagged, with exactly
    one hit (windows touching its unique padding can't match)."""
    from pdf_extraction_api_spark.operators.textops import tx_decontam

    bench = " ".join(f"b{i}" for i in range(20))
    planted = " ".join(f"b{i}" for i in range(3, 16))  # b3..b15 = 13
    rows = [
        (0, bench, len(bench), "s"),
        (1, f"u0 u1 {planted} u2 u3 u4 u5 u6 u7 u8", 0, "s"),
        (2, " ".join(f"c{i}" for i in range(30)), 0, "s"),
        (7, " ".join(f"d{i}" for i in range(30)), 0, "s"),
    ]
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, n_chars LONG, source STRING"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = tx_decontam(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert r.doc_id == 1 and r.n_hit == 1
    assert r.n_ngrams == 22 - 13 + 1  # doc 1 has 2 + 13 + 7 = 22 tokens


def test_common_segments_ground_truth(spark, tmp_path):
    """Planted shared span: docs 10/11 open with the same 8 tokens
    (aligned chunk 0); doc 12 contains the same 8 tokens shifted one
    position, so its DISJOINT chunks never line up and it must NOT
    join the group — pinning the disjoint-window (not sliding)
    semantics. Doc 13 is unique."""
    from pdf_extraction_api_spark.operators.textops import (
        dd_common_segments,
    )

    span = " ".join(f"s{i}" for i in range(8))
    rows = [
        (10, f"{span} " + " ".join(f"x{i}" for i in range(8)), 0, "s"),
        (11, f"{span} " + " ".join(f"y{i}" for i in range(8)), 0, "s"),
        (12, "z0 " + span + " " + " ".join(f"w{i}" for i in range(7)),
         0, "s"),
        (13, " ".join(f"q{i}" for i in range(16)), 0, "s"),
    ]
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, n_chars LONG, source STRING"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = dd_common_segments(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert got[0].n_docs == 2 and got[0].first_doc == 10


def test_curate_ground_truth(spark, tmp_path):
    """Every curation verdict path: doc 20 is clean (curated), doc 21
    is pure repetition (Gopher dup-trigram drop), doc 22 carries a
    13-gram from benchmark doc 0 (contamination drop), and the
    benchmark doc itself is an ordinary unique survivor. Doc 22 and
    the benchmark doc are both large with only the 13-token run shared
    (shingle Jaccard ~0.03), so the dedup stage must NOT fold doc 22
    into doc 0's near-dup component — contamination is a different
    axis than near-duplication and the fixture keeps them apart."""
    from pdf_extraction_api_spark.operators.textops import tx_curate

    bench = " ".join(f"b{i}" for i in range(200))
    planted = " ".join(f"b{i}" for i in range(50, 63))
    pad_l = " ".join(f"u{i}" for i in range(100))
    pad_r = " ".join(f"v{i}" for i in range(100))
    rows = [
        (0, bench, 0, "s"),
        (20, " ".join(f"k{i}" for i in range(30)), 0, "s"),
        (21, " ".join(["spam"] * 30), 0, "s"),
        (22, f"{pad_l} {planted} {pad_r}", 0, "s"),
    ]
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, n_chars LONG, source STRING"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {r.doc_id: (r.dedup_reason, r.gopher_flag, r.contaminated,
                      r.curated)
           for r in tx_curate(spark, str(tmp_path)).collect()}
    assert got[20] == ("unique", "keep", "false", "true")
    assert got[21][1] == "drop" and got[21][3] == "false"
    assert got[22][2] == "true" and got[22][3] == "false"
    assert got[0][2] == "false" and got[0][3] == "true"


def test_incremental_ground_truth(spark, tmp_path):
    """New batch (doc_id % 5 == 0) vs history: doc 10 is byte-identical
    to history doc 3 (exact_dup), doc 5 near-dups history doc 7 via a
    shared 25-token prefix (near_dup_candidate), doc 15 is fresh text
    (new_unique). History-only docs never appear in the output — the
    near-dup pair WITHIN history (docs 8 vs 9) must not leak a row."""
    from pdf_extraction_api_spark.operators.textops import dd_incremental

    base = " ".join(f"p{i}" for i in range(25))
    dup_text = " ".join(f"e{i}" for i in range(30))
    rows = [
        (3, dup_text, 0, "s"),                                # history
        (7, f"{base} hist_tail", 0, "s"),                     # history
        (8, " ".join(f"h{i}" for i in range(25)) + " t8", 0, "s"),
        (9, " ".join(f"h{i}" for i in range(25)) + " t9", 0, "s"),
        (10, dup_text, 0, "s"),                               # new batch
        (5, f"{base} new_tail", 0, "s"),                      # new batch
        (15, " ".join(f"z{i}" for i in range(30)), 0, "s"),   # new batch
    ]
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, n_chars LONG, source STRING"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {r.doc_id: r.verdict
           for r in dd_incremental(spark, str(tmp_path)).collect()}
    assert got == {10: "exact_dup", 5: "near_dup_candidate",
                   15: "new_unique"}


def test_bloom_incremental_ground_truth(spark, tmp_path):
    """Planted batch: doc 0 (new, % 5 == 0) copies history doc 1's
    text byte-for-byte → MUST be verdict 'dup' with all BLOOM_K
    positions hit (bloom filters have no false negatives); docs 5/10
    are unique new docs → 'fresh' or (hash-collision only)
    'false_positive', never 'dup'; and the verdict set is identical
    at 2 vs 32 shuffle partitions."""
    from pdf_extraction_api_spark.operators.textops import (
        BLOOM_K,
        dd_bloom_incremental,
    )

    shared = " ".join(f"w{i}" for i in range(40))
    rows = [
        (0, shared, "en", "s", len(shared)),          # new, dup of 1
        (1, shared, "en", "s", len(shared)),          # history
        (2, "hist only text two", "en", "s", 19),
        (5, "brand new unique five", "en", "s", 21),  # new
        (10, "brand new unique ten", "en", "s", 20),  # new
    ]
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING,"
        " n_chars LONG"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    out = {}
    try:
        for parts in ("2", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            out[parts] = {r.doc_id: (r.n_hit, r.verdict)
                          for r in dd_bloom_incremental(
                              spark, str(tmp_path)).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert out["2"] == out["32"]
    got = out["32"]
    assert set(got) == {0, 5, 10}
    assert got[0] == (BLOOM_K, "dup")       # no false negatives
    for d in (5, 10):
        assert got[d][1] in ("fresh", "false_positive")
        assert got[d][1] != "dup"


def test_bm25_hand_values(spark, tmp_path):
    """BM25 on a planted 4-doc corpus matches an independent Python
    recompute of the Robertson idf * saturated-tf formula (same k1,
    b, 6-dp rounding), including ranking order: the doc repeating
    'spark' most outranks one longer doc with the same counts
    (length normalization), and a doc with zero query terms is absent
    (bm25 > 0 filter)."""
    import math

    from pdf_extraction_api_spark.operators.textops import (
        BM25_B,
        BM25_K1,
        BM25_TERMS,
        tx_bm25_topk,
    )

    texts = {
        0: "spark spark spark vector",
        1: "spark spark spark vector pad pad pad pad",  # longer, same tf
        2: "stream customer window",
        3: "nothing relevant here at all",
    }
    rows = [(i, t, len(t), "s") for i, t in texts.items()]
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, n_chars LONG, source STRING"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = [(r.doc_id, r.bm25)
           for r in tx_bm25_topk(spark, str(tmp_path)).collect()]

    toks = {i: t.split() for i, t in texts.items()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    want = {}
    for i, t in toks.items():
        dl = len(t)
        s = 0.0
        for term in BM25_TERMS:
            tf = t.count(term)
            df = sum(term in u for u in toks.values())
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * (tf * (BM25_K1 + 1.0)) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))
        if round(s, 6) > 0:
            want[i] = round(s, 6)

    assert dict(got) == pytest.approx(want)
    assert 3 not in dict(got)
    order = [i for i, _ in got]
    assert order.index(0) < order.index(1)  # length normalization


def test_containment_ground_truth(spark, tmp_path):
    """Planted containment: doc 1 is doc 0's text verbatim plus a long
    unique tail (containment(0 in 1) = 1.0 while Jaccard is low —
    exactly the case symmetric near-dup misses); docs 2/3 are
    unrelated. The exact pair values match a Python recompute over
    the same distinct 3-token shingles."""
    from pdf_extraction_api_spark.operators.textops import (
        CONT_TAU,
        dd_containment,
    )

    core = " ".join(f"c{i}" for i in range(12))
    tail = " ".join(f"t{i}" for i in range(40))
    rows = [
        (0, core, len(core), "s"),
        (1, f"{core} {tail}", 0, "s"),
        (2, " ".join(f"x{i}" for i in range(30)), 0, "s"),
        (3, " ".join(f"y{i}" for i in range(30)), 0, "s"),
    ]
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, n_chars LONG, source STRING"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = [(r.doc_small, r.doc_big, r.n_small, r.inter,
            r.containment, r.contained)
           for r in dd_containment(spark, str(tmp_path)).collect()]

    def shingles(text):
        t = text.split()
        return {" ".join(t[i:i + 3]) for i in range(len(t) - 2)}

    sh = {i: shingles(t) for i, t, _, _ in rows}
    inter = len(sh[0] & sh[1])
    assert inter == len(sh[0])  # doc 0 fully contained
    want = (0, 1, len(sh[0]), inter,
            round(inter / len(sh[0]), 6), True)
    assert got == [want]
    jacc = inter / len(sh[0] | sh[1])
    assert jacc < CONT_TAU  # Jaccard alone would NOT flag this pair
