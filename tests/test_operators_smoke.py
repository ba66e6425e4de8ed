"""Registry smoke: every queries() entry must at least build its plan
(catches API/alias breakage without the full oracle run), and a sample
executes end-to-end at sf0.001. Full value verification is the DuckDB
oracle gate (tools/check_oracles.py at sf0.01)."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

EXECUTE_SAMPLE = [
    "a6_mode", "j2_range_join", "d1_dedup_hash", "dd_minhash_lsh",
    "dd_simhash", "ann_ivf_label", "tx_fingerprint", "c9_tickers",
    "mm_image_dims", "ex2_kernel_tables",
]


@pytest.fixture(scope="module")
def registry():
    import __spark_entry__ as e

    return e.queries(), e.oracle_sql()


def test_all_queries_build(spark, registry):
    queries, _ = registry
    assert len(queries) >= 60
    for name, fn in queries.items():
        df = fn(spark, SF)
        assert df.columns, name


def test_oracles_cover_queries(registry):
    queries, oracles = registry
    assert set(oracles) <= set(queries)
    rows_only = set(queries) - set(oracles)
    # only genuinely non-SQL ops may skip the oracle. Down to TWO in
    # round 4: mm_image_metrics (Laplacian/Gaussian/FIND_EDGES float
    # convolutions + PNG re-encode digests — not SQL-reconstructable
    # at tolerable cost; value-property-tested in test_imageops.py,
    # decode round-trip oracled via mm_image_dims) and
    # mm_audio_spectral (rFFT centroid/dominant — a DFT is O(n^2) in
    # set-based SQL; value-tested against synthesis params in
    # test_audioops.py). mm_video_frames / mm_audio_features /
    # mm_image_resize were promoted to full value oracles by making
    # every synthesis path exact-integer or same-IEEE-double
    # reproducible in DuckDB.
    assert rows_only == {"mm_image_metrics", "mm_audio_spectral"}


@pytest.mark.parametrize("name", EXECUTE_SAMPLE)
def test_sample_queries_execute(spark, registry, name):
    queries, _ = registry
    out = queries[name](spark, SF)
    assert out.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    rows = e.entry(spark).collect()
    assert len(rows) > 0
    assert {"lang", "n_docs", "n_tables", "extracted_chars"} == set(
        rows[0].asDict())


def test_new_query_plan_shapes(spark, registry):
    """Physical-plan intent of the round-2 shapes: EXISTS rewrites to
    a semi join, Q18's ordered limit short-circuits, the cube is one
    pass (Expand, not a union of aggregates)."""
    queries, _ = registry

    def plan(name):
        return (queries[name](spark, SF)
                ._jdf.queryExecution().executedPlan().toString())

    assert "LeftSemi" in plan("j6_exists_correlated")
    assert "TakeOrderedAndProject" in plan("q18_big_orders")
    p = plan("a14_cube")
    assert "Expand" in p and p.count("HashAggregate") <= 4
    # k-means assigns via broadcast of the k-row centroid table; the
    # corpus side must never be the build side of a cartesian product
    p = plan("ann_ivf_kmeans")
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_asof_and_packing_plan_budgets(spark, registry):
    """Pin the PLANS.md shuffle budgets for the as-of join and the
    GPT-packing family so a refactor cannot silently regress them.

    - aj_asof_join: the sort-based running-last-view plan — exactly
      one Exchange (hash on user_id), NO join operator of any kind
      (the ranged-join formulation it replaces materializes
      n_views x n_purchases rows per user before its argmax prunes).
    - tx_pack_payloads: at most 3 hash Exchanges, of which only two
      carry token payload (bucket re-sort + seq regroup; the third is
      the alphabet-of-buckets totals agg), and exactly one
      SinglePartition Exchange whose input is the tiny per-bucket
      totals table, never the token arrays.
    - tx_pack_sequences: at most 2 hash Exchanges, exactly one
      SinglePartition over bucket totals; the raw text/token columns
      never cross any Exchange (n_tokens is computed in the scan
      project)."""
    queries, _ = registry

    def plan(name):
        return (queries[name](spark, SF)
                ._jdf.queryExecution().executedPlan().toString())

    p = plan("aj_asof_join")
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
              "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert j not in p, (j, p)
    assert p.count("Exchange") == 1 and "SinglePartition" not in p
    assert "Window" in p

    def single_partition_feeds_bucket_totals(plan_str):
        lines = plan_str.splitlines()
        idx = [i for i, ln in enumerate(lines)
               if "Exchange SinglePartition" in ln]
        assert len(idx) == 1, plan_str
        child = lines[idx[0] + 1]
        assert "bucket" in child and "toks" not in child, child

    p = plan("tx_pack_payloads")
    assert p.count("Exchange hashpartitioning") <= 3, p
    assert p.count("Exchange SinglePartition") == 1
    single_partition_feeds_bucket_totals(p)
    # payload (token-array) columns cross at most the two documented
    # Exchanges: every OTHER hash Exchange's immediate child must not
    # output a token array
    payload_exchanges = 0
    lines = p.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange hashpartitioning" in ln and i + 1 < len(lines):
            sub = "\n".join(lines[i + 1:i + 3])
            if "toks#" in sub or "part#" in sub or "buf#" in sub:
                payload_exchanges += 1
    assert payload_exchanges <= 2, p

    p = plan("tx_pack_sequences")
    assert p.count("Exchange hashpartitioning") <= 2, p
    assert p.count("Exchange SinglePartition") == 1
    single_partition_feeds_bucket_totals(p)
    assert "toks#" not in p  # token arrays never materialize at all


def test_substr_dup_single_tokenize_pass(spark, registry):
    """dd_substr_dup's corpus-token-sized exploded window table must
    be computed ONCE (round-6 verdict #1): the plan shows exactly two
    InMemoryTableScan reads of the persisted explode (dup-hash agg +
    dup-per-doc join) and NO live Generate-explode subtree outside
    the cached relation (n_windows derives map-side from the token
    array, never from the exploded form). Every 'Generate explode'
    occurrence in the plan string is the cached plan reprinted under
    its scans, so live copies would push the count past the scan
    count. clearCache first: a MATERIALIZED InMemoryTableScan reprints
    the cached plan (one explode per scan), so the count is only
    deterministic from a cold cache."""
    queries, _ = registry
    spark.catalog.clearCache()
    p = (queries["dd_substr_dup"](spark, SF)
         ._jdf.queryExecution().executedPlan().toString())
    assert p.count("InMemoryTableScan") == 2, p
    assert p.count("Generate explode") <= p.count("InMemoryTableScan"), p


def test_fixed_point_plans_are_truncated(spark, registry):
    """The unrolled fixed-point graph ops (PageRank x2, HITS) must
    keep their final plans SMALL: without per-iteration lineage
    truncation the tree re-derives the edge self-join 2^iters times
    (round-7 audit: ev_hits reached 374 printed Exchanges). The lazy
    localCheckpoint discipline caps the final executed plan at a
    handful of Exchanges and no nested re-derivation."""
    queries, _ = registry
    for name in ("ev_item_pagerank", "ev_item_pagerank_weighted",
                 "ev_hits"):
        p = (queries[name](spark, SF)
             ._jdf.queryExecution().executedPlan().toString())
        assert p.count("Exchange") <= 8, (name, p.count("Exchange"))
        assert "CartesianProduct" not in p, name


def test_asof_two_parallelism_determinism(spark, registry):
    """The round-6 sort-based as-of plan returns identical rows at 2
    vs 32 shuffle partitions (the in-session N vs 4N proxy — same
    convention as test_determinism_across_parallelism): the window
    order (ts, is_purchase, event_id) is a total order, so the
    running last(view_id) is partitioning-insensitive."""
    queries, _ = registry
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for parts in ("2", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            results[parts] = sorted(
                map(tuple, queries["aj_asof_join"](spark, SF).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert results["2"] == results["32"] and results["2"]


def test_asof_join_tie_semantics(spark):
    """Crafted tie cases for the sort-based as-of rewrite, checked
    against hand-computed expectations: (a) view at the SAME ts as the
    purchase qualifies; (b) among equal-ts qualifying views the max
    event_id wins; (c) a purchase with no prior view is dropped; (d) a
    later view never leaks backward; (e) two purchases at the same ts
    both match independently."""
    import datetime as dt

    from pdf_extraction_api_spark.operators.relational import (
        aj_asof_join,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        # user 1: views 10@t0 11@t5 12@t5, purchases 100@t5 101@t3
        (10, ts(0), 1, "view"),
        (11, ts(5), 1, "view"),
        (12, ts(5), 1, "view"),
        (100, ts(5), 1, "purchase"),
        (101, ts(3), 1, "purchase"),
        # user 2: purchase before any view → dropped; later view
        (200, ts(1), 2, "purchase"),
        (20, ts(2), 2, "view"),
        (201, ts(2), 2, "purchase"),
        (202, ts(2), 2, "purchase"),
        # user 3: only a click event → contributes nothing
        (30, ts(0), 3, "click"),
    ]
    spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, "
        "event_type STRING",
    ).createOrReplaceTempView("_asof_tie_events")

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.table("_asof_tie_events").write.mode("overwrite").parquet(
            d + "/events.parquet")
        got = {r.p_id: r.asof_view_id
               for r in aj_asof_join(spark, d).collect()}
    assert got == {100: 12, 101: 10, 201: 20, 202: 20}, got


def test_registry_plan_lint(spark, registry):
    """No registry query may plan a CartesianProduct (unbounded pair
    blowup) or row-at-a-time Python (BatchEvalPython / scalar
    PythonUDF) — the two anti-patterns that silently kill 100 TB runs.
    Arrow-batched mapInPandas/applyInPandas operators are the only
    sanctioned Python."""
    queries, _ = registry
    offenders = {}
    for name, fn in queries.items():
        plan = (fn(spark, SF)
                ._jdf.queryExecution().executedPlan().toString())
        bad = [pat for pat in
               ("CartesianProduct", "BatchEvalPython", "PythonUDF")
               if pat in plan]
        if bad:
            offenders[name] = bad
    assert offenders == {}, offenders


def test_bpe_tokens_vertical_tab_parity(spark, tmp_path):
    """Java \\s matches \\x0B, RE2's does not — the pattern spells the
    whitespace class out so both engines agree on vertical tabs."""
    import duckdb

    from pdf_extraction_api_spark.operators.textops import (
        TX_TOKENS_BPE_SQL,
        tx_tokens_bpe,
    )

    docs = spark.createDataFrame(
        [(0, "hello\x0bworld", 11, "x"), (1, "a \x0b b\tc\nd", 9, "x"),
         (2, "it's fine, 123 ok", 17, "x")],
        "doc_id LONG, text STRING, n_chars LONG, source STRING")
    docs.write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet"))
    got = {r.doc_id: r.n_bpe_tokens
           for r in tx_tokens_bpe(spark, str(tmp_path)).collect()}
    con = duckdb.connect()
    con.execute(  # Spark writes a directory of part files
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{tmp_path}/documents.parquet/*.parquet')")
    want = dict(con.sql(TX_TOKENS_BPE_SQL).fetchall())
    assert got == want, (got, want)


def test_fingerprint_plan_has_no_exchange(spark):
    """tx_fingerprint must be a zero-shuffle map (array_min over a
    transform) — the per-position explode + groupBy it replaces pushed
    ~len(text) rows per doc through an Exchange. r8: at most ONE
    Exchange is allowed — the input `spread` repartition that fans the
    md5-per-window compute across cores on single-row-group inputs;
    anything more means the map shape regressed."""
    from pdf_extraction_api_spark.operators.textops import tx_fingerprint

    plan = (tx_fingerprint(spark, SF)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") <= 1, plan
    assert "REPARTITION" in plan or "Exchange" not in plan, plan


def test_lsh_bucket_cap_bounds_hot_buckets(spark, tmp_path):
    """1k identical docs form one mega-bucket per band; the cap must
    drop it (exact dups are dd_exact's job) instead of emitting
    |bucket|^2 ~ 500k candidate pairs."""
    from pdf_extraction_api_spark.operators import textops

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta", 36, "boiler")
         for i in range(1000)]
        + [(2000, "alpha beta gamma delta DIFFERENT zeta", 37, "x"),
           (2001, "alpha beta gamma delta DIFFERENT zeta maybe", 44, "x")],
        "doc_id LONG, text STRING, n_chars LONG, source STRING",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    pairs = textops.dd_minhash_lsh(spark, str(tmp_path)).collect()
    # the two near-dup docs still pair up; the 1000-identical bucket
    # contributes nothing (cap) instead of ~499500 pairs
    assert (2000, 2001) in {(r.doc_a, r.doc_b) for r in pairs}
    assert len(pairs) < textops.LSH_BUCKET_CAP ** 2 * textops.N_BANDS


def test_salted_lsh_keeps_mega_bucket_recall(spark, tmp_path):
    """1k NEAR-identical docs (shared prefix, unique tail token) land
    in one mega-bucket per band. dd_minhash_lsh's cap drops it (zero
    recall inside the bucket); the salted variant must still link the
    cluster — every member pairs with its shard-mates — with bounded
    shard sizes."""
    from pdf_extraction_api_spark.operators import textops

    base = " ".join(f"tok{i}" for i in range(30))
    docs = [(i, f"{base} unique{i}", 300, "boiler") for i in range(1000)]
    spark.createDataFrame(
        docs, "doc_id LONG, text STRING, n_chars LONG, source STRING"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    capped = textops.dd_minhash_lsh(spark, str(tmp_path)).count()
    salted = textops.dd_minhash_salted(spark, str(tmp_path)).collect()
    assert len(salted) > capped  # recall the cap threw away
    # every member is linked to at least one near-dup
    linked = {r.doc_a for r in salted} | {r.doc_b for r in salted}
    assert len(linked) >= 990  # ~every doc pairs within its shard
    # memory bound: pairs per (band, shard) can't exceed (2*cap)^2/2
    cap = textops.LSH_BUCKET_CAP
    import math
    nshards = math.ceil(1000 / cap)
    assert len(salted) <= textops.N_BANDS * nshards * (2 * cap) ** 2


def test_float_sensitive_ops_partitioning_invariant(spark, tmp_path):
    """North-rule determinism for the ops whose intermediates involve
    float partial aggregation or iteration: writing the same embeddings
    as 1 file vs 13 files changes partial-agg order and task layout —
    ann_ivf_kmeans (9-dp-rounded centroids) and dd_components
    (min-label fixpoint over documents) must not care."""
    import numpy as np

    from pdf_extraction_api_spark.operators.vectorops import (
        ann_ivf_kmeans,
    )

    rng = np.random.default_rng(7)
    rows = [(i, int(i % 6),
             [float(x) for x in rng.normal(size=16).astype(np.float32)])
            for i in range(240)]
    df = spark.createDataFrame(
        rows, "vec_id LONG, label INT, embedding ARRAY<FLOAT>")
    one, many = tmp_path / "one", tmp_path / "many"
    df.coalesce(1).write.parquet(str(one / "embeddings.parquet"))
    df.repartition(13).write.parquet(str(many / "embeddings.parquet"))
    a = sorted(map(tuple, ann_ivf_kmeans(spark, str(one)).collect()))
    b = sorted(map(tuple, ann_ivf_kmeans(spark, str(many)).collect()))
    assert a == b


def test_salted_equals_capped_below_cap(spark, tmp_path):
    """With every bucket under the cap, salting is the identity:
    dd_minhash_salted and dd_minhash_lsh must emit the same pairs
    (salt 0 everywhere). Uses a mixed corpus of small near-dup
    families."""
    from pdf_extraction_api_spark.operators import textops

    rows = []
    for fam in range(12):
        base = " ".join(f"w{fam}_{i}" for i in range(20))
        for j in range(fam % 5 + 2):  # families of 2-6 docs
            rows.append((fam * 100 + j, f"{base} tail{j}", 200, "x"))
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, n_chars LONG, source STRING"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    capped = {(r.doc_a, r.doc_b) for r in
              textops.dd_minhash_lsh(spark, str(tmp_path)).collect()}
    salted = {(r.doc_a, r.doc_b) for r in
              textops.dd_minhash_salted(spark, str(tmp_path)).collect()}
    assert capped  # families actually collide
    assert salted == capped


def test_jaccard_materializes_shingles_once(spark):
    """dd_ngram_jaccard persists the shingle relation and reuses it on
    all three consumers — the analyzed plan must read the cached table
    (InMemoryRelation), not re-run tokenization per reference."""
    from pdf_extraction_api_spark.operators.textops import (
        dd_ngram_jaccard,
    )

    df = dd_ngram_jaccard(spark, SF)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" in plan, plan
    # tokenization (the Generate over the token transform) must not
    # appear outside the single cached subtree: the optimized plan
    # shows the cached consumers as InMemoryRelation leaves whose
    # cacheBuilder repeats the stored plan; count the *scan* sites.
    assert plan.count("InMemoryRelation") >= 3  # cand + both sides


def test_embed_cosine_label_cap(spark, tmp_path):
    """A mega-label (> LABEL_BLOCK_CAP vectors) must be dropped by the
    capped pair expansion instead of squaring; small labels still pair
    exhaustively."""
    from pdf_extraction_api_spark.operators import vectorops

    n_big = vectorops.LABEL_BLOCK_CAP + 10
    rows = [(i, 99, [1.0, 0.0, 0.0, 0.0]) for i in range(n_big)]
    rows += [(1000, 1, [0.0, 1.0, 0.0, 0.0]),
             (1001, 1, [0.0, 0.9, 0.1, 0.0])]
    emb = spark.createDataFrame(
        rows, "vec_id LONG, label INT, embedding ARRAY<FLOAT>")
    emb.write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet"))
    pairs = vectorops.dd_embed_cosine(spark, str(tmp_path)).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    assert got == {(1000, 1001)}  # mega-label contributed nothing


def test_round7_ops_two_parallelism_determinism(spark, registry):
    """Every round-7 operator returns identical rows at 2 vs 32
    shuffle partitions (the in-session N vs 4N proxy) — all were
    designed with exact-integer evidence or within-row float math,
    so no partition-order float summation exists to flip a digit."""
    queries, _ = registry
    names = [
        "tx_substr_scrub", "ev_item_pagerank_weighted", "ev_hits",
        "sk_kmv_intersect", "tx_collocations", "sk_dd_quantile",
        "ann_multiprobe_lsh", "mm_image_metrics_int",
        "tx_langid_trigram", "s11_jsonl_glob", "ev_holdout_lift",
        "ev_basket_rules", "dd_verdict",
    ]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for name in names:
            got = {}
            for parts in ("2", "32"):
                spark.conf.set("spark.sql.shuffle.partitions", parts)
                got[parts] = sorted(
                    map(tuple, queries[name](spark, SF).collect()))
            assert got["2"] == got["32"] and got["2"], name
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_video_audio_dup_decode_once(spark, registry):
    """r8 (round-7 verdict defects #1/#2): the multimodal dup censuses
    must run their decode fan-out ONCE. The fingerprint relation is
    persisted, so the plan shows exactly one InMemoryTableScan per
    consumer (video: dup agg + per-doc agg + dup_per join = 3;
    audio: groups agg + join back = 2) and every MapInPandas
    occurrence in the plan string is the cached plan reprinted under
    its scans (2 per scan: payload synth + fingerprint pass) — a live
    decode subtree outside the cache would push the count past
    2 x scans. clearCache first — the reprint accounting assumes a
    cold cache (see test_substr_dup_single_tokenize_pass)."""
    queries, _ = registry
    spark.catalog.clearCache()
    for name, n_consumers in (("dd_video_frame_dup", 3),
                              ("dd_audio_dup", 2)):
        p = (queries[name](spark, SF)
             ._jdf.queryExecution().executedPlan().toString())
        assert p.count("InMemoryTableScan") == n_consumers, (name, p)
        assert p.count("MapInPandas") <= 2 * n_consumers, (name, p)


def test_r8_optimized_ops_parallelism_determinism(spark, registry):
    """r8 sweep: the queries whose plans were restructured this round
    (spread repartitions, shared bucket Exchange, inline-generator
    explodes, min-agg band signatures, fused image pass, persisted
    fingerprints) must produce identical rows at 2 and 32 shuffle
    partitions — partition-count independence is what lets the driver
    re-verify them under its own session settings."""
    queries, _ = registry
    names = ("dd_minhash_lsh", "dd_ngram_jaccard", "dd_simhash",
             "tx_quality", "dd_verdict", "tx_decontam",
             "tx_ngram_novelty", "tx_langid_trigram", "tx_fingerprint",
             "dd_embed_lsh", "ex4_flagship_rollup", "dd_audio_dup")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for parts in ("2", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            spark.catalog.clearCache()
            results[parts] = {
                n: sorted(map(tuple, queries[n](spark, SF).collect()))
                for n in names}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert results["2"] == results["32"]
