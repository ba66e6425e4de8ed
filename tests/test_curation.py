"""Value/property tests for the round-5 curation operators
(operators/curation.py). Full cross-engine value verification is the
DuckDB oracle gate; these pin the semantics that the oracle alone
can't see (two-phase == naive equivalence on a mega-domain, exact
stratum counts, SemDeDup drop invariants, novelty edge cases)."""

from __future__ import annotations

import hashlib
import math

import pytest

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, "
              "n_chars LONG")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_domain_cap_invariants(spark):
    from pdf_extraction_api_spark.operators.curation import (
        DOMAIN_CAP, dd_domain_cap)

    rows = dd_domain_cap(spark, SF).collect()
    assert rows
    per_dom = {}
    for r in rows:
        assert 1 <= r["rank"] <= DOMAIN_CAP
        assert int(math.isqrt(r["doc_id"])) == int(
            r["domain"].removeprefix("host").removesuffix(".example.com"))
        per_dom.setdefault(r["domain"], []).append(r)
    for dom, kept in per_dom.items():
        n_domain = kept[0]["n_domain"]
        assert len(kept) == min(DOMAIN_CAP, n_domain), dom
        ranks = sorted(r["rank"] for r in kept)
        assert ranks == list(range(1, len(kept) + 1))


def test_domain_cap_mega_domain_equals_naive(spark, tmp_path):
    """One 200-doc domain (doc_ids 10000..10199 share isqrt=100):
    the salted two-phase result must equal the naive global top-K."""
    from pdf_extraction_api_spark.operators.curation import (
        DOMAIN_CAP, dd_domain_cap)

    rows = [(10000 + i, "t", "en", "s", (i * 37) % 500) for i in range(200)]
    sf = _write_docs(spark, tmp_path, rows)
    got = {(r["doc_id"], r["rank"])
           for r in dd_domain_cap(spark, sf).collect()}
    naive = sorted(rows, key=lambda r: (-r[4], r[0]))[:DOMAIN_CAP]
    want = {(r[0], i + 1) for i, r in enumerate(naive)}
    assert got == want


def test_top_ngram_frac_hand_values(spark, tmp_path):
    from pdf_extraction_api_spark.operators.curation import (
        tx_top_ngram_frac)

    sf = _write_docs(spark, tmp_path, [
        (0, "a b a b a", "en", "s", 9),     # "a b"x2 ties "b a"x2
        (1, "word", "en", "s", 4),          # < 2 tokens
        (2, "x x x x", "en", "s", 7),       # "x x"x3 of 7 chars
    ])
    got = {r["doc_id"]: r for r in tx_top_ngram_frac(spark, sf).collect()}
    assert got[0]["top_gram"] == "a b" and got[0]["top_n"] == 2
    assert got[0]["top_frac"] == pytest.approx(round(2 * 3 / 9, 6))
    assert (got[1]["top_gram"], got[1]["top_n"], got[1]["top_frac"]) == \
        ("", 0, 0.0)
    assert got[2]["top_gram"] == "x x" and got[2]["top_n"] == 3
    assert got[2]["top_frac"] == pytest.approx(round(3 * 3 / 7, 6))


def test_stratified_sample_exact_counts_and_membership(spark):
    """Per lang: exactly ceil(n/DEN) kept, and they are precisely the
    smallest-md5 docs (recomputed independently in Python)."""
    import pyarrow.parquet as pq

    from pdf_extraction_api_spark.operators.curation import (
        SAMPLE_DEN, tx_stratified_sample)

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang"]).to_pylist()
    by_lang = {}
    for d in docs:
        by_lang.setdefault(d["lang"], []).append(d["doc_id"])
    want = {}
    for lang, ids in by_lang.items():
        k = -(-len(ids) // SAMPLE_DEN)
        ordered = sorted(
            ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        want[lang] = set(ordered[:k])

    out = tx_stratified_sample(spark, SF).collect()
    got = {}
    for r in out:
        got.setdefault(r["lang"], set()).add(r["doc_id"])
        assert r["n_keep"] == -(-r["n_lang"] // SAMPLE_DEN)
        assert 1 <= r["rnk"] <= r["n_keep"]
    assert got == want


def test_semdedup_drop_invariants(spark):
    """Every dropped vector names a LOWER-id exemplar in its own cell
    with cosine >= tau (cosine re-verified in numpy for a sample)."""
    import numpy as np
    import pyarrow.parquet as pq

    from pdf_extraction_api_spark.operators.curation import (
        SEM_TAU, dd_semdedup)

    rows = dd_semdedup(spark, SF01).collect()
    assert rows  # tau sits at ~p99 of within-cell pairs: non-trivial
    emb = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
           for r in pq.read_table(f"{SF01}/embeddings.parquet").to_pylist()}
    for r in rows[:25]:
        assert r["dup_of"] < r["vec_id"]
        a, b = emb[r["dup_of"]], emb[r["vec_id"]]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        # dup_of is the MIN qualifying mate, max_cos the max over all
        # qualifying mates — so the pair's own cos only needs the tau
        assert cos >= SEM_TAU - 1e-9
        assert r["max_cos"] >= SEM_TAU - 1e-9


def test_ngram_novelty_edges(spark, tmp_path):
    """First doc scores 1.0; an exact copy of it scores 0.0; a
    half-overlapping doc lands strictly between."""
    from pdf_extraction_api_spark.operators.curation import (
        tx_ngram_novelty)

    base = "q w e r t y u i"
    sf = _write_docs(spark, tmp_path, [
        (0, base, "en", "s", len(base)),
        (1, base, "en", "s", len(base)),               # exact copy
        (2, base + " z z q w", "en", "s", len(base) + 8),
    ])
    got = {r["doc_id"]: r for r in tx_ngram_novelty(spark, sf).collect()}
    assert got[0]["novelty"] == 1.0
    assert got[1]["novelty"] == 0.0
    assert 0.0 < got[2]["novelty"] < 1.0
    for r in got.values():
        assert 0 <= r["n_first"] <= r["n_grams"]


def test_ft_score_bounds_and_label(spark):
    from pdf_extraction_api_spark.operators.curation import tx_ft_score

    rows = tx_ft_score(spark, SF).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r["ft_score"] <= 1.0
        assert abs(r["raw_score"]) <= r["n_toks"] * 32768
        assert r["ft_label"] == ("keep" if r["ft_score"] > 0 else "drop")


def test_ft_score_hand_value(spark, tmp_path):
    """One-token doc: score = (hash16(md5(tok)) - 32768) / 32768."""
    import hashlib

    from pdf_extraction_api_spark.operators.curation import tx_ft_score

    sf = _write_docs(spark, tmp_path, [(0, "hello", "en", "s", 5)])
    r = tx_ft_score(spark, sf).collect()[0]
    w = int(hashlib.md5(b"hello").hexdigest()[:4], 16) - 32768
    assert r["raw_score"] == w
    assert r["ft_score"] == pytest.approx(round(w / 32768.0, 6))


def test_segment_scrub_keep_first_semantics(spark, tmp_path):
    """A segment shared by two docs survives in the min-doc_id doc and
    is scrubbed from the later one; short docs pass through intact."""
    from pdf_extraction_api_spark.operators.curation import (
        tx_segment_scrub)

    seg = "s1 s2 s3 s4 s5 s6 s7 s8"          # one full 8-token segment
    uniq = "u1 u2 u3 u4 u5 u6 u7 u8"
    sf = _write_docs(spark, tmp_path, [
        (0, seg + " t1 t2", "en", "s", 0),    # first owner + tail
        (1, uniq + " " + seg, "en", "s", 0),  # later copy → scrubbed
        (2, "tiny doc", "en", "s", 0),        # < 8 tokens: tail only
    ])
    got = {r["doc_id"]: r for r in tx_segment_scrub(spark, sf).collect()}
    assert got[0]["n_scrubbed"] == 0
    assert got[0]["clean_text"] == seg + " t1 t2"
    assert got[1]["n_scrubbed"] == 1 and got[1]["n_segs"] == 2
    assert got[1]["clean_text"] == uniq
    assert got[2]["n_segs"] == 0
    assert got[2]["clean_text"] == "tiny doc"


def test_bpe_merges_hand_counts(spark, tmp_path):
    """'aaab aaab cd': pair aa occurs twice per 'aaab' → 4 total,
    ab → 2, cd → 1 (frequency-weighted adjacent-pair counting)."""
    from pdf_extraction_api_spark.operators.curation import tx_bpe_merges

    sf = _write_docs(spark, tmp_path, [
        (0, "aaab aaab cd", "en", "s", 12)])
    rows = {r["pair"]: (r["rank"], r["n"])
            for r in tx_bpe_merges(spark, sf).collect()}
    assert rows == {"aa": (1, 4), "ab": (2, 2), "cd": (3, 1)}


def test_curate_v2_verdict_consistency(spark):
    """curated == domain_kept ∧ ft keep ∧ ¬(boiler_frac > 0.5), and
    the verdict set is a strict, non-empty subset of the corpus."""
    from pdf_extraction_api_spark.operators.curation import tx_curate_v2

    rows = tx_curate_v2(spark, SF).collect()
    assert len(rows) == 500
    n_curated = 0
    for r in rows:
        want = (r["domain_kept"] == "true" and r["ft_label"] == "keep"
                and not r["boiler_frac"] > 0.5)
        assert (r["curated"] == "true") == want, r
        assert 0.0 <= r["boiler_frac"] <= 1.0
        n_curated += r["curated"] == "true"
    assert 0 < n_curated < 500


def test_round5_plan_shapes(spark):
    """Physical-plan intent of the round-5 scale arguments: the
    domain cap, stratified sample and segment scrub never plan a
    SinglePartition window/exchange (their whole point); bpe_merges'
    only SinglePartition surface is the documented final top-K over
    the alphabet²-bounded pair table."""
    import __spark_entry__ as e

    qs = e.queries()

    def plan(name):
        return (qs[name](spark, SF)
                ._jdf.queryExecution().executedPlan().toString())

    for name in ("dd_domain_cap", "tx_stratified_sample",
                 "tx_segment_scrub", "tx_ngram_novelty", "tx_ft_score"):
        assert "SinglePartition" not in plan(name), name
    assert "Window" in plan("dd_domain_cap")


def test_round5_two_parallelism_determinism(spark):
    """Round-5 rewrite/rank operators produce identical rows at 2 vs
    32 shuffle partitions (the in-session proxy for N vs 4N executors,
    same convention as test_determinism_across_parallelism):
    array_sort-based rebuilds, salted top-K and prefix-sum ranks are
    order-insensitive by construction."""
    import __spark_entry__ as e

    qs = e.queries()
    names = ("dd_domain_cap", "tx_stratified_sample",
             "tx_segment_scrub", "tx_curate_v2")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for parts in ("2", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            results[parts] = {
                n: sorted(map(tuple, qs[n](spark, SF).collect()))
                for n in names}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert results["2"] == results["32"]


def test_ev_quantiles_order_statistics(spark):
    """p50/p90/p99 equal numpy's ceil-rank order statistic per type."""
    import math

    import pyarrow.parquet as pq

    from pdf_extraction_api_spark.operators.relational import ev_quantiles

    evs = pq.read_table(f"{SF}/events.parquet",
                        columns=["event_type", "value"]).to_pylist()
    by_type = {}
    for r in evs:
        by_type.setdefault(r["event_type"], []).append(r["value"])
    got = {r["event_type"]: r for r in ev_quantiles(spark, SF).collect()}
    assert set(got) == set(by_type)
    for t, vals in by_type.items():
        vals.sort()
        n = len(vals)
        assert got[t]["n"] == n
        for col, p in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            assert got[t][col] == vals[math.ceil(p * n) - 1], (t, col)


def test_funnel_monotone_and_ordered(spark):
    """Stage counts are non-increasing, and the reached-users sets
    recomputed independently in Python match exactly."""
    import pyarrow.parquet as pq

    from pdf_extraction_api_spark.operators.relational import ev_funnel

    evs = pq.read_table(f"{SF}/events.parquet",
                        columns=["user_id", "event_type", "ts"]).to_pylist()
    t1, t2, t3 = {}, {}, {}
    for r in sorted(evs, key=lambda r: r["ts"]):
        u, t, ts = r["user_id"], r["event_type"], r["ts"]
        if t == "view" and u not in t1:
            t1[u] = ts
        elif t == "click" and u in t1 and u not in t2 and ts > t1[u]:
            t2[u] = ts
        elif t == "purchase" and u in t2 and u not in t3 and ts > t2[u]:
            t3[u] = ts
    got = {r["stage"]: r for r in ev_funnel(spark, SF).collect()}
    assert got["view"]["n_users"] == len(t1)
    assert got["click"]["n_users"] == len(t2)
    assert got["purchase"]["n_users"] == len(t3)
    assert (got["view"]["n_users"] >= got["click"]["n_users"]
            >= got["purchase"]["n_users"] > 0)
    # pin the mean deltas exactly (sum of EXACT integer microseconds
    # via timedelta floor-division, one float division at the end —
    # the same arithmetic the operator performs)
    from datetime import timedelta

    one_us = timedelta(microseconds=1)
    for s, cur, prev in (("click", t2, t1), ("purchase", t3, t2)):
        us = sum((cur[u] - prev[u]) // one_us for u in cur)
        want = round(us / (len(cur) * 1000000), 6)
        assert got[s]["avg_step_secs"] == want


def test_retention_cohort_identities(spark):
    """Offset-0 retention is exactly 1.0 per cohort, offsets are
    non-negative, and cohort sizes sum to the distinct-user count."""
    import pyarrow.parquet as pq

    from pdf_extraction_api_spark.operators.relational import ev_retention

    rows = ev_retention(spark, SF).collect()
    assert rows
    n_users = len({r["user_id"] for r in pq.read_table(
        f"{SF}/events.parquet", columns=["user_id"]).to_pylist()})
    zero = {r["cohort_week"]: r for r in rows if r["week_offset"] == 0}
    for r in rows:
        assert r["week_offset"] >= 0
        assert 0 < r["n_active"] <= r["n_cohort"]
        assert 0.0 < r["rate"] <= 1.0
    assert all(r["rate"] == 1.0 for r in zero.values())
    assert sum(r["n_cohort"] for r in zero.values()) == n_users


def test_incremental_embed_verdicts(spark):
    """Verdicts recomputed independently in numpy: signature
    collisions from the same hyperplanes, best match by (cos, -id)."""
    import numpy as np
    import pyarrow.parquet as pq

    from pdf_extraction_api_spark.operators.vectorops import (
        NEW_VEC_MOD, SIM_THRESHOLD, _hyperplanes, dd_incremental_embed)

    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in pq.read_table(
                f"{SF}/embeddings.parquet").to_pylist()}
    planes = np.array(_hyperplanes(), dtype=np.float64)

    def sig(v):
        return int(sum(1 << j for j, d in enumerate(planes @ v) if d > 0))

    sigs = {i: sig(v) for i, v in vecs.items()}
    hist = {i for i in vecs if i % NEW_VEC_MOD != 0}
    got = {r["vec_id"]: r for r in dd_incremental_embed(spark, SF).collect()}
    assert set(got) == {i for i in vecs if i % NEW_VEC_MOD == 0}
    n_near = 0
    for i, r in got.items():
        coll = [h for h in hist if sigs[h] == sigs[i]]
        if not coll:
            assert r["verdict"] == "new_unique" and r["best_match"] is None
            continue
        best = max(coll, key=lambda h: (
            float(vecs[i] @ vecs[h]
                  / (np.linalg.norm(vecs[i]) * np.linalg.norm(vecs[h]))),
            -h))
        assert r["best_match"] == best, i
        cos = float(vecs[i] @ vecs[best]
                    / (np.linalg.norm(vecs[i]) * np.linalg.norm(vecs[best])))
        want = "near_dup" if cos >= SIM_THRESHOLD else "candidate_only"
        assert r["verdict"] == want, i
        n_near += r["verdict"] == "near_dup"
    assert n_near > 0  # threshold band is populated on this corpus


def test_kmv_sketch_properties(spark, tmp_path):
    """KMV invariants on planted data: a group with fewer than KMV_K
    distinct texts reports its EXACT count (small-set rule, rel_err
    0); a large group's estimate matches (k-1)/h_(k) recomputed in
    Python from the same md5 hashes; the merged '__all__' sketch
    equals KMV computed directly over the union; and the whole output
    is identical at 2 vs 32 shuffle partitions."""
    from pdf_extraction_api_spark.operators.curation import (
        _H60,
        KMV_K,
        sk_kmv_distinct,
    )

    rows = []
    for i in range(5):                    # small group: 5 < KMV_K
        rows.append((i, f"small text {i}", "en", "tiny", 10))
    for i in range(200):                  # large group: 200 >= KMV_K
        rows.append((100 + i, f"big text {i}", "en", "big", 10))
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING,"
        " n_chars LONG"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    out = {}
    try:
        for parts in ("2", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            out[parts] = {r.source: (r.n_exact, r.n_est, r.rel_err)
                          for r in sk_kmv_distinct(
                              spark, str(tmp_path)).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert out["2"] == out["32"]
    got = out["32"]
    assert got["tiny"] == (5, 5.0, 0.0)

    def h60(text):
        return int(hashlib.md5(text.encode()).hexdigest()[:15], 16)

    big = sorted(h60(f"big text {i}") for i in range(200))
    want_big = (KMV_K - 1) / (big[KMV_K - 1] / float(_H60))
    assert got["big"][0] == 200
    assert abs(got["big"][1] - round(want_big, 4)) < 1e-9

    union = sorted(big[:KMV_K] + sorted(
        h60(f"small text {i}") for i in range(5)))
    want_all = (KMV_K - 1) / (union[KMV_K - 1] / float(_H60))
    assert got["__all__"][0] == 205
    assert abs(got["__all__"][1] - round(want_all, 4)) < 1e-9


def test_cms_sketch_properties(spark, tmp_path):
    """Count-min invariants on planted data: the sketch output equals
    an exact Python rebuild of the same D x W grid (same md5 salts),
    the estimate never underestimates, and the planted hot token
    leads the heavy-hitter list with its exact count."""
    from collections import Counter

    from pdf_extraction_api_spark.operators.curation import (
        CMS_D,
        CMS_TOPK,
        CMS_W,
        sk_cms_heavy,
    )

    texts = ["hot " * 50 + f"mid{i % 7} " * 3 + f"rare{i}"
             for i in range(30)]
    rows = [(i, t, len(t), "s") for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, n_chars LONG, source STRING"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = [(r.tok, r.n_exact, r.n_est, r.overcount)
           for r in sk_cms_heavy(spark, str(tmp_path)).collect()]

    counts = Counter(t for doc in texts for t in doc.split())

    def bucket(j, tok):
        return int(hashlib.md5(f"{j}:{tok}".encode()).hexdigest()[:15],
                   16) % CMS_W

    cells = Counter()
    for tok, n in counts.items():
        for j in range(CMS_D):
            cells[(j, bucket(j, tok))] += n
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:CMS_TOPK]
    want = [(tok, n,
             min(cells[(j, bucket(j, tok))] for j in range(CMS_D)))
            for tok, n in top]
    want = [(tok, n, est, est - n) for tok, n, est in want]
    assert got == want
    assert all(r[3] >= 0 for r in got)          # never underestimates
    assert got[0][0] == "hot" and got[0][1] == 30 * 50


def test_dsir_weight_hand_values(spark, tmp_path):
    """DSIR weights on a planted two-domain corpus match an
    independent Python recompute of the add-1-smoothed bucket models
    (same md5 buckets, same nano-unit integer fold), and a doc made
    of target-only tokens outscores a doc of non-target tokens."""
    import math

    from pdf_extraction_api_spark.operators.curation import (
        DSIR_B,
        DSIR_TARGET,
        tx_dsir_weight,
    )

    texts = {
        0: ("alpha beta gamma alpha", "en"),
        1: ("alpha beta beta", "en"),
        2: ("omega psi chi omega psi", "de"),
        3: ("omega chi chi", "de"),
        4: ("alpha omega", "fr"),
    }
    rows = [(i, t, l, "s", len(t)) for i, (t, l) in texts.items()]
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING,"
        " n_chars LONG"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {r.doc_id: (r.n_toks, r.dsir_logw)
           for r in tx_dsir_weight(spark, str(tmp_path)).collect()}

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15],
                   16) % DSIR_B

    n_raw, n_tgt = {}, {}
    for _, (t, l) in texts.items():
        for tok in t.split():
            b = bucket(tok)
            n_raw[b] = n_raw.get(b, 0) + 1
            if l == DSIR_TARGET:
                n_tgt[b] = n_tgt.get(b, 0) + 1
    t_raw = sum(n_raw.values())
    t_tgt = sum(n_tgt.values())

    def w_nano(b):
        lr = (math.log((n_tgt.get(b, 0) + 1.0) / (t_tgt + DSIR_B))
              - math.log((n_raw[b] + 1.0) / (t_raw + DSIR_B)))
        x = lr * 1e9
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    want = {}
    for i, (t, _) in texts.items():
        toks = t.split()
        nano = sum(w_nano(bucket(tok)) for tok in toks)
        want[i] = (len(toks), round(nano / 1e9, 6))
    assert got == pytest.approx(want)
    assert got[0][1] > got[2][1]  # target-like beats non-target-like
    assert got[2][1] < 0          # de-only doc reads anti-target


def test_weighted_sample_hand_values(spark, tmp_path):
    """A-ES weighted sampling matches an exact Python recompute of
    key = -ln(u)/w over the same md5-derived uniforms (same 9-dp
    rounded ordering), and the weight bias is real: with heavy docs
    at 100x the weight of light docs, the sample is dominated by
    heavy docs."""
    import math

    from pdf_extraction_api_spark.operators.curation import (
        _H60,
        WSAMPLE_K,
        tx_weighted_sample,
    )

    rows = []
    for i in range(50):
        rows.append((i, f"heavy doc {i}", "en", "s", 5000))
    for i in range(50):
        rows.append((100 + i, f"light doc {i}", "en", "s", 50))
    rows.append((999, "zero weight doc", "en", "s", 0))  # excluded
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING,"
        " n_chars LONG"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = [(r.doc_id, r.w, r.es_key)
           for r in tx_weighted_sample(spark, str(tmp_path)).collect()]

    def key(text, w):
        u = int(hashlib.md5(text.encode()).hexdigest()[:15],
                16) / float(_H60)
        return round(-math.log(u) / w, 9)

    want = sorted(
        ((i, w, key(t, w)) for i, t, _, _, w in rows if w > 0),
        key=lambda r: (r[2], r[0]))[:WSAMPLE_K]
    assert [(i, w) for i, w, _ in got] == [(i, w) for i, w, _ in want]
    assert [k for _, _, k in got] == pytest.approx(
        [k for _, _, k in want])
    assert all(i != 999 for i, _, _ in got)
    n_heavy = sum(w == 5000 for _, w, _ in got)
    assert n_heavy >= WSAMPLE_K - 3  # 100x weight dominates the draw


def test_round6_two_parallelism_determinism(spark):
    """Round-6 sketch/retrieval/selection operators produce identical
    rows at 2 vs 32 shuffle partitions (same N-vs-4N proxy
    convention): CMS cells and DSIR folds are exact-integer
    order-insensitive aggs, the samplers/top-ks order by rounded
    keys with id tie-breaks, Bloom bits and SQ8 codes are
    deterministic arithmetic."""
    import __spark_entry__ as e

    qs = e.queries()
    names = ("sk_cms_heavy", "sk_hll_distinct", "tx_dsir_weight",
             "tx_weighted_sample", "tx_bm25_topk",
             "dd_bloom_incremental", "ann_sq8_rerank",
             "dd_containment", "tx_entropy", "vec_rp_project",
             "tx_ccnet_bucket", "ev_item_pagerank", "ev_pmi_pairs",
             "tx_zipf_fit", "dd_substr_dup", "ev_markov_transitions")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for parts in ("2", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            results[parts] = {
                n: sorted(map(tuple, qs[n](spark, SF).collect()))
                for n in names}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert results["2"] == results["32"]


def test_hll_sketch_properties(spark, tmp_path):
    """HLL invariants on planted data: per-group estimates match an
    independent Python rebuild of the registers (same buckets, same
    rank-of-remainder, same alpha/linear-counting branches), the
    merged '__all__' row equals HLL computed directly over the union
    of hashes (register MAX is the HLL merge), and a small group
    takes the linear-counting branch."""
    import math

    from pdf_extraction_api_spark.operators.curation import (
        _HLL_REM_BITS,
        _HLL_RMAX,
        HLL_ALPHA,
        HLL_M,
        sk_hll_distinct,
    )

    rows = []
    for i in range(6):
        rows.append((i, f"tiny doc {i}", "en", "tiny", 10))
    for i in range(300):
        rows.append((100 + i, f"big doc {i}", "en", "big", 10))
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING,"
        " n_chars LONG"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {r.source: (r.n_exact, r.n_est, r.rel_err)
           for r in sk_hll_distinct(spark, str(tmp_path)).collect()}

    def h60(text):
        return int(hashlib.md5(text.encode()).hexdigest()[:15], 16)

    def estimate(hashes):
        regs = {}
        for h in hashes:
            b = h >> _HLL_REM_BITS
            rem = h & ((1 << _HLL_REM_BITS) - 1)
            rank = (_HLL_RMAX if rem == 0
                    else _HLL_REM_BITS - rem.bit_length() + 1)
            regs[b] = max(regs.get(b, 0), rank)
        s = sum(1 << (_HLL_RMAX - r) for r in regs.values())
        n_zero = HLL_M - len(regs)
        s += n_zero * (1 << _HLL_RMAX)
        e_raw = HLL_ALPHA * HLL_M * HLL_M * float(1 << _HLL_RMAX) / s
        if e_raw <= 2.5 * HLL_M and n_zero > 0:
            return HLL_M * math.log(HLL_M / n_zero)
        return e_raw

    tiny = [h60(f"tiny doc {i}") for i in range(6)]
    big = [h60(f"big doc {i}") for i in range(300)]
    assert got["tiny"][0] == 6
    assert got["tiny"][1] == pytest.approx(round(estimate(tiny), 4))
    assert got["big"][0] == 300
    assert got["big"][1] == pytest.approx(round(estimate(big), 4))
    # merge: the '__all__' registers are the per-source MAX, which is
    # exactly HLL over the union of the raw hash sets
    assert got["__all__"][0] == 306
    assert got["__all__"][1] == pytest.approx(
        round(estimate(tiny + big), 4))
    # branch coverage: tiny is linear-counting, big is the raw path
    assert estimate(tiny) <= 2.5 * HLL_M
    assert estimate(big) > 2.5 * HLL_M


def test_entropy_hand_values(spark, tmp_path):
    """Entropy matches an independent Python recompute (same nano-bit
    integer fold): a uniform doc hits log2(n_distinct) exactly, a
    constant doc reads 0.0 and is flagged low, and a mixed doc lands
    between."""
    import math

    from pdf_extraction_api_spark.operators.curation import tx_entropy

    texts = {
        0: " ".join(f"u{i}" for i in range(16)),  # uniform: H = 4
        1: " ".join(["same"] * 20),               # constant: H = 0
        2: "a a a a b b c d",                     # mixed
    }
    rows = [(i, t, "en", "s", len(t)) for i, t in texts.items()]
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING,"
        " n_chars LONG"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {r.doc_id: (r.n_toks, r.n_distinct, r.entropy, r.low_entropy)
           for r in tx_entropy(spark, str(tmp_path)).collect()}

    def entropy(toks):
        from collections import Counter
        c = Counter(toks)
        n = len(toks)
        nano = sum(v * int(math.copysign(
            math.floor(abs(math.log2(v) * 1e9) + 0.5), 1))
            for v in c.values())
        return round(math.log2(n) - nano / 1e9 / n, 6)

    for i, t in texts.items():
        toks = t.split()
        from collections import Counter
        assert got[i][0] == len(toks)
        assert got[i][1] == len(Counter(toks))
        assert got[i][2] == pytest.approx(entropy(toks))
    assert got[0][2] == pytest.approx(4.0)
    assert got[1][2] == 0.0 and got[1][3] is True
    assert got[0][3] is False
    assert 0 < got[2][2] < 4.0


def test_ccnet_bucket_ground_truth(spark, tmp_path):
    """Planted fluency gradient in one lang: a repeated-boilerplate
    doc (every trigram seen 3x relative to its prefix mass) scores
    highest and lands in head; a unique-text doc scores lowest and
    lands in tail; tercile sizes follow the exact rank*3 rule."""
    from pdf_extraction_api_spark.operators.textops import (
        tx_ccnet_bucket,
    )

    rows = []
    # 3 fluent docs: share the same trigram stream (high tri_n/pre_n)
    common = " ".join(f"c{i}" for i in range(20))
    for i in range(3):
        rows.append((i, common, "en", "s", 1))
    # 6 unique docs: every trigram unique (log2 p == 0 only if the
    # prefix is also unique — here both are 1 → log2(1/1)=0... they
    # share nothing so tri_n=1, pre_n=1 → avg 0, the ceiling) —
    # instead make them share PREFIXES but not trigrams so pre_n >
    # tri_n and the score is negative.
    for i in range(6):
        toks = " ".join(f"p{j} q{j} u{i}x{j}" for j in range(7))
        rows.append((10 + i, toks, "en", "s", 1))
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING,"
        " n_chars LONG"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: (r.avg_log2p, r.ppl_bucket)
           for r in tx_ccnet_bucket(spark, str(tmp_path)).collect()}
    assert len(out) == 9
    # identical docs score 0 (their trigrams are 3/3 of their prefix
    # occurrences); unique-suffix docs score negative
    for i in range(3):
        assert out[i][0] == 0.0
    for i in range(6):
        assert out[10 + i][0] < 0.0
    buckets = [out[i][1] for i in sorted(out)]
    # 9 docs → head = rank 1-3 (the three score-0 docs), middle 4-6,
    # tail 7-9
    assert buckets[:3] == ["head"] * 3
    assert sorted(buckets) == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3


def test_pagerank_star_ground_truth(spark, tmp_path):
    """Integer-fixed-point PageRank on a planted star: the hub item
    co-clicked by every user outranks all leaves, and every value
    equals an exact Python replay of the same nano-unit integer
    arithmetic (div-by-degree contributions, (85*s) div 100
    damping)."""
    import datetime as dt
    import json

    from pdf_extraction_api_spark.operators.relational import (
        PR_ITERS,
        PR_NANO,
        ev_item_pagerank,
    )

    rows = []
    eid = 0
    ts = dt.datetime(2024, 1, 1)
    for u in range(5):                   # user u clicks hub(0), leaf(u+1)
        for item in (0, u + 1):
            rows.append((eid, ts, u, "click", 1.0,
                         json.dumps({"k": item})))
            eid += 1
    rows.append((eid, ts, 9, "view", 1.0, json.dumps({"k": 0})))
    spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG,"
        " event_type STRING, value DOUBLE, props STRING"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = [(r.item, r.d, r.pr_nano)
           for r in ev_item_pagerank(spark, str(tmp_path)).collect()]

    edges = set()
    for u in range(5):
        edges.add((0, u + 1)); edges.add((u + 1, 0))
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    n = len(deg)
    pr = {i: PR_NANO // n for i in deg}
    for _ in range(PR_ITERS):
        sums = {i: 0 for i in deg}
        for s, d in edges:
            sums[d] += pr[s] // deg[s]
        pr = {i: (15 * PR_NANO // 100) // n + (85 * sums[i]) // 100
              for i in deg}
    want = sorted(((i, deg[i], pr[i]) for i in deg),
                  key=lambda r: (-r[2], r[0]))
    assert got == want
    assert got[0][0] == 0 and got[0][1] == 5   # hub leads, degree 5
    assert all(got[0][2] > g[2] for g in got[1:])


def test_holdout_lift_planted_conversion(spark, tmp_path):
    """A/B readout on planted conversions: 20 even users (control,
    5 convert) vs 20 odd users (treatment, 8 convert) gives lift 0.6
    and the hand-computed pooled z; counts pin the integer evidence
    and the degenerate-variance guard is exercised by the planted
    case staying non-degenerate."""
    import datetime as dt
    import math

    from pdf_extraction_api_spark.operators.relational import (
        ev_holdout_lift,
    )

    rows, eid = [], 0
    ts = dt.datetime(2024, 1, 1)
    for u in range(40):                       # every user has a view
        rows.append((eid, ts, u, "view", 1.0, "{}")); eid += 1
    for u in [0, 2, 4, 6, 8]:                 # 5/20 control convert
        rows.append((eid, ts, u, "purchase", 1.0, "{}")); eid += 1
    for u in [1, 3, 5, 7, 9, 11, 13, 15]:     # 8/20 treatment convert
        rows.append((eid, ts, u, "purchase", 1.0, "{}")); eid += 1
    spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG,"
        " event_type STRING, value DOUBLE, props STRING"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    r = ev_holdout_lift(spark, str(tmp_path)).collect()[0]
    assert (r.n_c, r.conv_c, r.n_t, r.conv_t) == (20, 5, 20, 8)
    p0, p1, pp = 5 / 20, 8 / 20, 13 / 40
    z = (p1 - p0) / math.sqrt(pp * (1 - pp) * (1 / 20 + 1 / 20))
    assert r.lift == round(p1 / p0 - 1.0, 6) == 0.6
    assert r.z_score == round(z, 6)


def test_langid_trigram_planted_confusion(spark, tmp_path):
    """Trigram langid on a planted corpus: two languages with
    disjoint character inventories classify perfectly (diagonal
    confusion matrix), a doc written in the OTHER language's
    trigrams lands on the off-diagonal cell, and a sub-trigram doc
    is 'unknown' (the Spark sequence(1,0)-descends edge)."""
    from pdf_extraction_api_spark.operators.curation import (
        tx_langid_trigram,
    )

    import itertools

    # >LANGID_M distinct high-count trigrams per language so a single
    # stray doc's count-1 trigrams can NOT enter the label's profile
    # (self-supervision would otherwise absorb the mislabeled doc)
    aa_text = " ".join("".join(t) for t in
                       itertools.product("abcd", repeat=3))
    zz_text = " ".join("".join(t) for t in
                       itertools.product("wxyz", repeat=3))
    rows = []
    for i in range(6):
        rows.append((i, aa_text, "aa", "s", len(aa_text)))
    for i in range(6, 12):
        rows.append((i, zz_text, "zz", "s", len(zz_text)))
    rows.append((12, zz_text[:40], "aa", "s", 40))    # mislabeled doc
    rows.append((13, "hi", "aa", "s", 2))             # too short
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING,"
        " n_chars LONG"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {(r.lang, r.pred): r.n_docs
           for r in tx_langid_trigram(spark, str(tmp_path)).collect()}
    assert got[("aa", "aa")] == 6
    assert got[("zz", "zz")] == 6
    assert got[("aa", "zz")] == 1        # the mislabeled doc is caught
    assert got[("aa", "unknown")] == 1   # sub-trigram doc
    assert ("zz", "aa") not in got


def test_dd_quantile_planted_distribution(spark, tmp_path):
    """Log-binned quantile sketch on a planted length distribution:
    the exact column equals the ceil(p*n/100) order statistic
    computed in Python, the estimate replays the integer
    bin-interpolation rule exactly, the '__all__' row equals the
    merge of the per-source bins, and the estimate respects the
    gamma=2 bin bound (est inside the exact value's bin)."""
    from pdf_extraction_api_spark.operators.curation import (
        DDQ_PCTS,
        sk_dd_quantile,
    )

    lens = {"A": [10, 20, 30, 40, 50, 600, 700, 800, 900, 1000],
            "B": [5] * 9 + [100000]}
    rows, did = [], 0
    for s_name, ls in lens.items():
        for ln in ls:
            rows.append((did, "x" * ln, s_name, "en", ln))
            did += 1
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, source STRING, lang STRING,"
        " n_chars LONG"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {(r.source, r.p): (r.n, r.exact_q, r.est_q, r.rel_err)
           for r in sk_dd_quantile(spark, str(tmp_path)).collect()}

    def replay(vals, p):
        n = len(vals)
        r = (p * n + 99) // 100
        sv = sorted(vals)
        exact = sv[r - 1]
        # sketch replay: bit-length bins, integer interpolation
        bins = {}
        for v in vals:
            bins.setdefault(v.bit_length() if v > 0 else 0,
                            []).append(v)
        cum = 0
        for b in sorted(bins):
            cnt = len(bins[b])
            if cum + cnt >= r:
                lo = 0 if b == 0 else 1 << (b - 1)
                hi = 0 if b == 0 else (1 << b) - 1
                est = lo + ((hi - lo) * (r - cum - 1)) // max(cnt - 1, 1)
                return exact, est
            cum += cnt
        raise AssertionError

    groups = dict(lens)
    groups["__all__"] = lens["A"] + lens["B"]
    assert set(got) == {(s, p) for s in groups for p in DDQ_PCTS}
    for (s_name, p), (n, exact_q, est_q, rel) in got.items():
        vals = groups[s_name]
        assert n == len(vals)
        w_exact, w_est = replay(vals, p)
        assert (exact_q, est_q) == (w_exact, w_est), (s_name, p)
        # gamma=2 bound: estimate lives in the exact value's bin
        if exact_q > 0:
            assert est_q.bit_length() == exact_q.bit_length()
    assert got[("B", 99)][1] == 100000   # the outlier IS the p99


def test_hits_planted_bipartite(spark, tmp_path):
    """HITS on a planted bipartite click graph: item 0 is clicked by
    every user (top authority), item 1 by the three best-connected
    users, item 2 by one narrow user; authorities come out in that
    order and every value equals an exact Python replay of the
    micro-unit integer trajectory ((score*UNIT) div max
    normalization)."""
    import datetime as dt
    import json

    from pdf_extraction_api_spark.operators.relational import (
        HITS_ITERS,
        HITS_UNIT,
        ev_hits,
    )

    clicks = {u: [0] for u in range(5)}
    for u in range(3):
        clicks[u].append(1)
    clicks[4].append(2)
    rows, eid = [], 0
    ts = dt.datetime(2024, 1, 1)
    for u, items in clicks.items():
        for it in items:
            rows.append((eid, ts, u, "click", 1.0,
                         json.dumps({"k": it})))
            eid += 1
    spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG,"
        " event_type STRING, value DOUBLE, props STRING"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = [(r.item, r.auth_fix) for r in
           ev_hits(spark, str(tmp_path)).collect()]

    edges = [(u, i) for u, its in clicks.items() for i in its]
    hub = {u: HITS_UNIT for u in clicks}
    auth = {}
    for _ in range(HITS_ITERS):
        auth = {}
        for u, i in edges:
            auth[i] = auth.get(i, 0) + hub[u]
        am = max(auth.values())
        auth = {i: (a * HITS_UNIT) // am for i, a in auth.items()}
        hub = {}
        for u, i in edges:
            hub[u] = hub.get(u, 0) + auth[i]
        hm = max(hub.values())
        hub = {u: (h * HITS_UNIT) // hm for u, h in hub.items()}
    want = sorted(auth.items(), key=lambda kv: (-kv[1], kv[0]))
    assert got == want
    order = [i for i, _ in got]
    assert order == [0, 1, 2]
    assert got[0][1] == HITS_UNIT        # the max item normalizes to 1


def test_collocations_planted_phrase(spark, tmp_path):
    """Collocation scoring on a planted corpus: 'new york' always
    appears as a glued bigram (each word exists ONLY inside it →
    maximal PMI), filler words pair at ~independence (PMI near 0),
    and every emitted row equals an exact Python recompute of both
    the PMI and the t statistic from the same integer counts."""
    import math
    from collections import Counter

    from pdf_extraction_api_spark.operators.curation import (
        COLL_MIN,
        tx_collocations,
    )

    docs = []
    for i in range(10):
        # 'new york' x1 per doc; fillers a/b/c shuffled deterministically
        fill = ["a", "b", "c"] * 4
        rot = fill[i % 3:] + fill[:i % 3]
        docs.append(" ".join(["new", "york"] + rot))
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(docs)]
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING,"
        " n_chars LONG"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {(r.w1, r.w2): (r.n_ab, r.n_a, r.n_b, r.pmi, r.t_score)
           for r in tx_collocations(spark, str(tmp_path)).collect()}

    uni, bi = Counter(), Counter()
    for t in docs:
        toks = t.split()
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    n_tok = sum(uni.values())
    for (w1, w2), (n_ab, n_a, n_b, pmi, t_sc) in got.items():
        assert bi[(w1, w2)] == n_ab >= COLL_MIN
        assert uni[w1] == n_a and uni[w2] == n_b
        assert pmi == round(math.log(n_ab * n_tok / (n_a * n_b)), 6)
        assert t_sc == round(
            (n_ab - n_a * n_b / n_tok) / math.sqrt(n_ab), 6)
    assert ("new", "york") in got
    top = max(got.items(), key=lambda kv: kv[1][3])
    assert top[0] == ("new", "york")       # the glued phrase leads
    assert got[("new", "york")][3] == round(math.log(140 / 10), 6)


def test_kmv_intersect_known_overlap(spark, tmp_path):
    """Theta-sketch intersection on planted overlaps: sources A and B
    share exactly 7 texts and both hold < KMV_K values, so theta = 1
    and the estimate IS the exact count; large sources C and D (120
    values each, 40 shared) exercise the real estimation path — the
    emitted survivor count and estimate equal an exact Python replay
    of the same bottom-k/theta arithmetic, and the estimate lands
    within 50% of truth."""
    import hashlib

    from pdf_extraction_api_spark.operators.curation import (
        _H60,
        KMV_K,
        sk_kmv_intersect,
    )

    def mk(src, texts):
        return [(src, t) for t in texts]

    a_texts = [f"sharedAB {i}" for i in range(7)] + [
        f"onlyA {i}" for i in range(5)]
    b_texts = [f"sharedAB {i}" for i in range(7)] + [
        f"onlyB {i}" for i in range(4)]
    c_texts = [f"sharedCD {i}" for i in range(40)] + [
        f"onlyC {i}" for i in range(80)]
    d_texts = [f"sharedCD {i}" for i in range(40)] + [
        f"onlyD {i}" for i in range(80)]
    rows = (mk("A", a_texts) + mk("B", b_texts)
            + mk("C", c_texts) + mk("D", d_texts))
    spark.createDataFrame(
        [(i, t, s, "en", len(t)) for i, (s, t) in enumerate(rows)],
        "doc_id LONG, text STRING, source STRING, lang STRING,"
        " n_chars LONG"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {(r.src_a, r.src_b): (r.n_exact, r.n_surv, r.n_est)
           for r in sk_kmv_intersect(spark, str(tmp_path)).collect()}

    def h(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:15], 16)

    def sketch(texts):
        hs = sorted({h(t) for t in texts})
        surv = hs[:KMV_K]
        theta = surv[-1] / _H60 if len(hs) >= KMV_K else 1.0
        return set(surv), theta

    def replay(x_texts, y_texts):
        sx, tx = sketch(x_texts)
        sy, ty = sketch(y_texts)
        thp = min(tx, ty)
        n_surv = sum(1 for v in sx & sy if v / _H60 < thp)
        return n_surv, round(n_surv / thp, 4)

    assert got[("A", "B")][0] == 7
    assert got[("A", "B")][1:] == replay(a_texts, b_texts)
    assert got[("A", "B")][2] == 7.0      # complete sketches: exact
    assert got[("C", "D")][0] == 40
    assert got[("C", "D")][1:] == replay(c_texts, d_texts)
    # estimator variance at k=16: theta ~ k/120, ~5 expected
    # intersection survivors, sd(est) ~ sqrt(5)/theta ~ 17 — accept
    # ±3 sd (the replay equality above is the exactness contract;
    # this line only guards against a wildly-off estimator)
    assert abs(got[("C", "D")][2] - 40) <= 51
    assert got[("A", "C")][0] == 0 and got[("A", "C")][1] == 0


def test_pagerank_weighted_ground_truth(spark, tmp_path):
    """Weighted PageRank on a planted weight-contrast graph: item 0
    links to item 1 via FIVE co-clicking users but to item 2 via one,
    so the weighted walk hands item 1 five times item 2's share of
    item 0's rank — while uniform PageRank (degree split) provably
    ties them. Every value equals an exact Python replay of the
    nano-unit integer arithmetic ((pr*w) div strength contributions,
    (85*s) div 100 damping)."""
    import datetime as dt
    import json

    from pdf_extraction_api_spark.operators.relational import (
        PR_ITERS,
        PR_NANO,
        ev_item_pagerank,
        ev_item_pagerank_weighted,
    )

    rows, eid = [], 0
    ts = dt.datetime(2024, 1, 1)
    for u in range(5):                   # users 0-4 click {0, 1}
        for item in (0, 1):
            rows.append((eid, ts, u, "click", 1.0,
                         json.dumps({"k": item})))
            eid += 1
    for item in (0, 2):                  # user 5 clicks {0, 2}
        rows.append((eid, ts, 5, "click", 1.0,
                     json.dumps({"k": item})))
        eid += 1
    spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG,"
        " event_type STRING, value DOUBLE, props STRING"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = [(r.item, r.sw, r.pr_nano)
           for r in ev_item_pagerank_weighted(
               spark, str(tmp_path)).collect()]

    w = {(0, 1): 5, (1, 0): 5, (0, 2): 1, (2, 0): 1}
    sw = {}
    for (s, _), wt in w.items():
        sw[s] = sw.get(s, 0) + wt
    n = len(sw)
    pr = {i: PR_NANO // n for i in sw}
    for _ in range(PR_ITERS):
        sums = {i: 0 for i in sw}
        for (s, d), wt in w.items():
            sums[d] += (pr[s] * wt) // sw[s]
        pr = {i: (15 * PR_NANO // 100) // n + (85 * sums[i]) // 100
              for i in sw}
    want = sorted(((i, sw[i], pr[i]) for i in sw),
                  key=lambda r: (-r[2], r[0]))
    assert got == want
    prw = {i: p for i, _, p in got}
    assert prw[1] > prw[2]               # weights discriminate...
    pru = {r.item: r.pr_nano
           for r in ev_item_pagerank(spark, str(tmp_path)).collect()}
    assert pru[1] == pru[2]              # ...where uniform PR ties


def test_pmi_pairs_ground_truth(spark, tmp_path):
    """PMI on a planted co-click design: items (1,2) always co-clicked
    (PMI = ln(N / n) > 0 strongest pair), items (1,3) co-clicked at
    exactly the independence rate (PMI ~ 0), and every emitted row
    matches the exact integer evidence + ln recompute."""
    import datetime as dt
    import json
    import math

    from pdf_extraction_api_spark.operators.relational import (
        ev_pmi_pairs,
    )

    # 8 users: all click 1 (a "universal" item: PMI 0 with anything);
    # users 0-3 click 2; users 0,2,4,6 click 3 (independent of 2);
    # users 0,1 click BOTH 4 and 5 (exclusive pair: positive PMI)
    clicks = {u: [1] for u in range(8)}
    for u in range(4):
        clicks[u].append(2)
    for u in (0, 2, 4, 6):
        clicks[u].append(3)
    for u in (0, 1):
        clicks[u] += [4, 5]
    rows, eid = [], 0
    ts = dt.datetime(2024, 1, 1)
    for u, items in clicks.items():
        for it in items:
            rows.append((eid, ts, u, "click", 1.0,
                         json.dumps({"k": it})))
            eid += 1
    spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG,"
        " event_type STRING, value DOUBLE, props STRING"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {(r.item_a, r.item_b): (r.n_ab, r.n_a, r.n_b, r.pmi)
           for r in ev_pmi_pairs(spark, str(tmp_path)).collect()}

    n = {1: 8, 2: 4, 3: 4, 4: 2, 5: 2}
    # (3,4)/(3,5) overlap only at user 0 — below PMI_MIN_CO, absent
    co = {(1, 2): 4, (1, 3): 4, (2, 3): 2, (1, 4): 2, (1, 5): 2,
          (4, 5): 2, (2, 4): 2, (2, 5): 2}
    want = {p: (c, n[p[0]], n[p[1]],
                round(math.log(c * 8 / (n[p[0]] * n[p[1]])), 6))
            for p, c in co.items()}
    assert got == want
    assert got[(4, 5)][3] == round(math.log(4), 6)  # exclusive pair
    assert got[(4, 5)][3] == max(v[3] for v in got.values())
    assert got[(1, 2)][3] == 0.0        # universal item: ln(1)
    assert got[(2, 3)][3] == 0.0        # exact independence


def test_zipf_fit_ground_truth(spark, tmp_path):
    """Zipf fit on a PLANTED power law (token t_r repeated
    round(1000/r) times): recovered slope matches an exact Python
    replay of the micro-unit integer regression and sits near -1;
    intercept near ln(1000)."""
    import math

    from pdf_extraction_api_spark.operators.curation import (
        _ZU,
        ZIPF_TOPN,
        tx_zipf_fit,
    )

    toks = []
    for r in range(1, 51):
        toks += [f"t{r:02d}"] * max(1, round(1000 / r))
    text = " ".join(toks)
    spark.createDataFrame(
        [(0, text, "en", "s", len(text))],
        "doc_id LONG, text STRING, lang STRING, source STRING,"
        " n_chars LONG"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = tx_zipf_fit(spark, str(tmp_path)).collect()[0]

    from collections import Counter
    counts = Counter(toks)
    head = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    head = head[:ZIPF_TOPN]

    def u(x):
        v = x * _ZU
        return int(math.copysign(math.floor(abs(v) + 0.5), v))

    xs = [u(math.log(r + 1)) for r in range(len(head))]
    ys = [u(math.log(c)) for _, c in head]
    n = len(head)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy / _ZU - slope * sx / _ZU) / n
    assert got.n_vocab == 50
    assert got.zipf_slope == pytest.approx(round(slope, 6))
    assert got.zipf_intercept == pytest.approx(round(intercept, 6))
    assert -1.1 < got.zipf_slope < -0.9     # the planted power law
    assert abs(got.zipf_intercept - math.log(1000)) < 0.35


def test_substr_dup_sliding_catches_shifted_copy(spark, tmp_path):
    """The sliding-window form catches a SHIFTED copied run (the case
    the disjoint-chunk dd_common_segments provably misses): doc 1
    embeds doc 0's 12-token run at offset 1; both docs report
    duplicated windows matching an exact Python recompute; the
    unrelated doc reports zero."""
    from pdf_extraction_api_spark.operators.curation import (
        SUBSTR_W,
        dd_substr_dup,
    )

    run = [f"r{i}" for i in range(12)]
    d0 = run + [f"a{i}" for i in range(6)]
    d1 = ["z0"] + run + [f"b{i}" for i in range(5)]
    d2 = [f"q{i}" for i in range(18)]
    texts = {0: " ".join(d0), 1: " ".join(d1), 2: " ".join(d2)}
    rows = [(i, t, "en", "s", len(t)) for i, t in texts.items()]
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING,"
        " n_chars LONG"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {r.doc_id: (r.n_windows, r.n_dup, r.dup_frac)
           for r in dd_substr_dup(spark, str(tmp_path)).collect()}

    def windows(toks):
        return [" ".join(toks[i:i + SUBSTR_W])
                for i in range(len(toks) - SUBSTR_W + 1)]

    wins = {0: windows(d0), 1: windows(d1), 2: windows(d2)}
    from collections import Counter
    owner = {}
    for i, ws in wins.items():
        for w in set(ws):
            owner.setdefault(w, set()).add(i)
    dup = {w for w, docs in owner.items() if len(docs) >= 2}
    for i, ws in wins.items():
        n_dup = sum(w in dup for w in ws)
        assert got[i] == (len(ws), n_dup,
                          round(n_dup / len(ws), 6)), i
    assert got[0][1] == 12 - SUBSTR_W + 1   # all 5 run-windows shared
    assert got[1][1] == 12 - SUBSTR_W + 1
    assert got[2][1] == 0


def test_substr_scrub_removes_shifted_span(spark, tmp_path):
    """The span-merging ExactSubstr scrubber removes a SHIFTED copied
    run wholesale — the case tx_segment_scrub's disjoint 8-token
    chunks provably miss (its chunk test pins that miss): doc 1
    embeds doc 0's 12-token run at offset 1 (misaligned with every
    chunk boundary); the scrub drops exactly those 12 tokens from
    doc 1 as ONE merged span, keeps doc 0 (first-wins) and the
    unrelated doc verbatim."""
    from pdf_extraction_api_spark.operators.curation import (
        tx_substr_scrub,
    )

    run = [f"r{i}" for i in range(12)]
    d0 = run + [f"a{i}" for i in range(6)]
    d1 = ["z0"] + run + [f"b{i}" for i in range(5)]
    d2 = [f"q{i}" for i in range(18)]
    texts = {0: " ".join(d0), 1: " ".join(d1), 2: " ".join(d2)}
    rows = [(i, t, "en", "s", len(t)) for i, t in texts.items()]
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING,"
        " n_chars LONG"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {r.doc_id: r for r in
           tx_substr_scrub(spark, str(tmp_path)).collect()}

    assert got[0].n_spans == 0 and got[0].n_scrubbed == 0
    assert got[0].clean_text == texts[0]          # first-wins keeper
    assert got[1].n_spans == 1                    # merged, not 5
    assert got[1].n_scrubbed == 12                # the whole run
    assert got[1].clean_text == " ".join(["z0"] + d1[13:])
    assert "r0" not in got[1].clean_text          # shifted copy gone
    assert got[2].n_spans == 0 and got[2].clean_text == texts[2]


def test_markov_transitions_ground_truth(spark, tmp_path):
    """Transition matrix on planted sequences: user 0 strictly
    alternates view->click, user 1 runs view->view->purchase; counts
    and P(next|cur) match the hand matrix and rows per `cur` sum to
    1."""
    import datetime as dt

    from pdf_extraction_api_spark.operators.relational import (
        ev_markov_transitions,
    )

    rows, eid = [], 0
    t0 = dt.datetime(2024, 1, 1)
    for i, et in enumerate(["view", "click"] * 3):     # user 0
        rows.append((eid, t0 + dt.timedelta(minutes=i), 0, et,
                     1.0, "{}")); eid += 1
    for i, et in enumerate(["view", "view", "purchase"]):  # user 1
        rows.append((eid, t0 + dt.timedelta(minutes=i), 1, et,
                     1.0, "{}")); eid += 1
    spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG,"
        " event_type STRING, value DOUBLE, props STRING"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {(r.cur, r.nxt): (r.n, r.n_cur, r.p)
           for r in ev_markov_transitions(spark, str(tmp_path)).collect()}

    # user 0 pairs: v->c x3, c->v x2; user 1: v->v, v->purchase
    want = {
        ("view", "click"): (3, 5, round(3 / 5, 6)),
        ("view", "view"): (1, 5, 0.2),
        ("view", "purchase"): (1, 5, 0.2),
        ("click", "view"): (2, 2, 1.0),
    }
    assert got == want
    by_cur = {}
    for (cur, _), (_, _, p) in got.items():
        by_cur[cur] = by_cur.get(cur, 0.0) + p
    for cur, total in by_cur.items():
        assert abs(total - 1.0) < 1e-9, cur


def test_grouping_sets_matches_direct_groupbys(spark):
    """The three grouping sets equal the three direct aggregations:
    per-returnflag counts, per-linestatus counts, and the grand
    total — with the grouping() flags identifying each set."""
    from pdf_extraction_api_spark.operators.relational import (
        a16_grouping_sets,
    )

    rows = a16_grouping_sets(spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    by_flag = {r.l_returnflag: r["count"]
               for r in li.groupBy("l_returnflag").count().collect()}
    by_status = {r.l_linestatus: r["count"]
                 for r in li.groupBy("l_linestatus").count().collect()}
    total = li.count()

    got_flag = {r.l_returnflag: r.n for r in rows
                if r.g_flag == 0 and r.g_status == 1}
    got_status = {r.l_linestatus: r.n for r in rows
                  if r.g_flag == 1 and r.g_status == 0}
    got_total = [r.n for r in rows
                 if r.g_flag == 1 and r.g_status == 1]
    assert got_flag == by_flag
    assert got_status == by_status
    assert got_total == [total]
    assert len(rows) == len(by_flag) + len(by_status) + 1


def test_basket_rules_directional(spark, tmp_path):
    """Association rules on a planted basket design: item 9 is niche
    (2 users, both also click hub 0 → conf(9→0)=1.0) while the hub
    is broad (10 users → conf(0→9)=0.2) — the directional asymmetry
    PMI cannot express; every emitted support/confidence/lift equals
    the exact recompute from the planted counts."""
    import datetime as dt
    import json

    from pdf_extraction_api_spark.operators.relational import (
        ev_basket_rules,
    )

    rows, eid = [], 0
    ts = dt.datetime(2024, 1, 1)
    for u in range(10):                    # all 10 users click hub 0
        rows.append((eid, ts, u, "click", 1.0,
                     json.dumps({"k": 0}))); eid += 1
    for u in (0, 1):                       # niche item 9
        rows.append((eid, ts, u, "click", 1.0,
                     json.dumps({"k": 9}))); eid += 1
    spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG,"
        " event_type STRING, value DOUBLE, props STRING"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {(r.item_a, r.item_b):
           (r.n_ab, r.n_a, r.n_b, r.support, r.confidence, r.lift)
           for r in ev_basket_rules(spark, str(tmp_path)).collect()}
    assert got[(9, 0)] == (2, 2, 10, 0.2, 1.0, 1.0)
    assert got[(0, 9)] == (2, 10, 2, 0.2, 0.2, 1.0)
    assert got[(9, 0)][4] > got[(0, 9)][4]   # directionality


def test_dd_verdict_precedence_and_first_wins(spark, tmp_path):
    """The dedup capstone on a planted corpus exercising every rule:
    an identical copy is exact_dup, a whitespace variant (same token
    stream → same full MinHash signature) is near_dup, a doc that is
    mostly a shifted copy of the keeper's run is substr_dup, and the
    KEEPER of all of them stays 'keep' — the first-wins window rule
    (a symmetric rate would drop the original along with its
    copies)."""
    from pdf_extraction_api_spark.operators.curation import dd_verdict

    base_toks = [f"a{i}" for i in range(40)]
    t0 = " ".join(base_toks)
    t2 = "  ".join(base_toks)                 # same tokens, new md5
    t3 = " ".join(base_toks[:30] + [f"b{i}" for i in range(10)])
    t4 = " ".join(f"c{i}" for i in range(40))
    rows = [(0, t0), (1, t0), (2, t2), (3, t3), (4, t4)]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id LONG, text STRING, lang STRING, source STRING,"
        " n_chars LONG"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {r.doc_id: r for r in dd_verdict(spark, str(tmp_path)).collect()}

    assert got[0].verdict == "keep"           # keeper survives all
    assert got[0].exact_n == 2 and got[0].near_n == 3
    assert got[0].dup_frac == 0.0             # first-wins
    assert got[1].verdict == "exact_dup"
    assert got[2].verdict == "near_dup"       # md5 differs, sig equal
    assert got[3].verdict == "substr_dup"
    assert got[3].dup_frac == round(23 / 33, 6)
    assert got[4].verdict == "keep"


def test_degree_dist_planted_star(spark, tmp_path):
    """Degree histogram on a planted star graph: the hub (degree 5 →
    bit-length bin 3, range [4,7]) and the five leaves (degree 1 →
    bin 1, range [1,1]) land in exactly those bins with exact
    counts."""
    import datetime as dt
    import json

    from pdf_extraction_api_spark.operators.relational import (
        ev_degree_dist,
    )

    rows, eid = [], 0
    ts = dt.datetime(2024, 1, 1)
    for u in range(5):                 # user u clicks hub 0 + leaf u+1
        for item in (0, u + 1):
            rows.append((eid, ts, u, "click", 1.0,
                         json.dumps({"k": item}))); eid += 1
    spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG,"
        " event_type STRING, value DOUBLE, props STRING"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {r.b: (r.lo, r.hi, r.n_items)
           for r in ev_degree_dist(spark, str(tmp_path)).collect()}
    assert got == {1: (1, 1, 5), 3: (4, 7, 1)}
