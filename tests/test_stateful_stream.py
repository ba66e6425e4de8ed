"""Cross-batch first-seen dedup: duplicate files in the source dir must
yield each url exactly once, and state must survive batch boundaries."""

from __future__ import annotations

import os
import shutil

import pytest

PAGES = "tests/golden/pages_tiny.parquet"

pytestmark = pytest.mark.skipif(
    not os.path.exists(PAGES), reason="golden fixtures missing")


def test_first_seen_across_batches(spark, tmp_path):
    from pdf_extraction_api_spark.streaming.stateful import (
        first_seen_stream,
    )

    src = tmp_path / "dup_pages"
    src.mkdir()
    # two identical files → every url arrives twice, in separate
    # microbatches (maxFilesPerTrigger=1)
    shutil.copy(PAGES, src / "a.parquet")
    shutil.copy(PAGES, src / "b.parquet")

    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    out = first_seen_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT url FROM first_seen").collect()
    urls = [r["url"] for r in rows]
    assert len(urls) == 200          # 400 arrivals → 200 emissions
    assert len(set(urls)) == 200     # exactly once each


def test_stateful_sessionize_across_batches_and_restart(spark, tmp_path):
    """Gap-close sessionization: sessions close only when a later
    event crosses the 30-min gap; the open session survives BOTH
    microbatch boundaries and a full query restart (state store)."""
    import datetime as dt

    from pdf_extraction_api_spark.streaming.stateful import (
        sessionize_stream,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def mk(events, path):
        df = spark.createDataFrame(
            [(eid, t0 + dt.timedelta(minutes=m), uid, "click", v, "{}")
             for eid, m, uid, v in events],
            "event_id LONG, ts TIMESTAMP, user_id LONG, "
            "event_type STRING, value DOUBLE, props STRING")
        df.coalesce(1).write.mode("overwrite").parquet(path)

    src = tmp_path / "events"
    src.mkdir()
    # batch A: user 7 session 1 (two events 5 min apart)
    mk([(1, 0, 7, 1.0), (2, 5, 7, 2.0)], str(src / "a.parquet"))
    # batch B: 60 min later → closes session 1, opens session 2
    mk([(3, 60, 7, 4.0), (4, 61, 7, 8.0)], str(src / "b.parquet"))

    schema = spark.read.parquet(str(src / "a.parquet")).schema
    out_dir = str(tmp_path / "closed")

    def run():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1")
                  .parquet(str(src / "*.parquet")))

        def sink(df, _bid):
            df.write.mode("append").parquet(out_dir)

        q = (sessionize_stream(stream)
             .writeStream.foreachBatch(sink)
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(300)
        return {(r.user_id, r.session_no):
                (r.n_events, r.session_value)
                for r in spark.read.parquet(out_dir).collect()}

    first = run()
    # only session 1 closed; session 2 still open in state
    assert first == {(7, 1): (2, "3.00")}
    # batch C (after RESTART of the query): 200 min later closes it
    mk([(5, 200, 7, 16.0)], str(src / "c.parquet"))
    second = run()
    assert second == {(7, 1): (2, "3.00"), (7, 2): (2, "12.00")}


def test_streaming_hll_matches_batch_sketch(spark, tmp_path):
    """Constant-state streaming HLL: after the last microbatch the
    per-source running estimate is row-equal to the batch
    sk_hll_distinct sketch on the same corpus (cross-batch register
    MAX == batch register build), and state stays 16 registers no
    matter how many docs stream past."""
    from pdf_extraction_api_spark.operators.curation import (
        sk_hll_distinct,
    )
    from pdf_extraction_api_spark.streaming.stateful import hll_stream

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    # two half-files → every source's hashes split across microbatches
    src = tmp_path / "docs_stream"
    src.mkdir()
    # split on a doc_id predicate — an unordered limit() would be
    # re-evaluated nondeterministically between the write and the
    # complement, silently dropping rows from the stream
    mid = docs.agg({"doc_id": "avg"}).collect()[0][0]
    a = docs.filter(docs.doc_id <= mid)
    b = docs.filter(docs.doc_id > mid)
    a.coalesce(1).write.parquet(str(src / "a.parquet"))
    b.coalesce(1).write.parquet(str(src / "b.parquet"))

    # a.parquet/b.parquet are DIRECTORIES (DataFrame writes) — the
    # file stream needs recursiveFileLookup to see the part files
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        hll_stream(stream)
        .writeStream.format("memory")
        .queryName("hll_running")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql(
        "SELECT source, n_seen, n_est FROM hll_running").collect()
    # final emission per source = the one with the largest n_seen
    final = {}
    for r in rows:
        if r.source not in final or r.n_seen > final[r.source][0]:
            final[r.source] = (r.n_seen, float(r.n_est))
    batch = {r.source: r.n_est
             for r in sk_hll_distinct(spark, sf).collect()
             if r.source != "__all__"}
    assert set(final) == set(batch)
    for s_name, (_, est) in final.items():
        assert est == pytest.approx(batch[s_name]), s_name
    # the corpus streamed in 2 batches: at least one source saw both
    assert len(rows) > len(final)


def test_streaming_cms_matches_batch_and_survives_restart(
        spark, tmp_path):
    """Constant-state streaming CMS: per-source grids streamed across
    two microbatches WITH a full query restart between them sum
    (cell-wise merge) to a global sketch whose min-probe estimates
    are row-equal to the batch sk_cms_heavy output on the same
    corpus — the second stream≡batch sketch pair beside hll_stream.
    State stays CMS_D*CMS_W integers per source regardless of volume;
    the restart leg proves the grid lives in the state store."""
    import hashlib

    from pdf_extraction_api_spark.operators.curation import (
        CMS_D,
        CMS_W,
        sk_cms_heavy,
    )
    from pdf_extraction_api_spark.streaming.stateful import cms_stream

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    mid = docs.agg({"doc_id": "avg"}).collect()[0][0]

    src = tmp_path / "docs_stream"
    src.mkdir()
    docs.filter(docs.doc_id <= mid).coalesce(1).write.parquet(
        str(src / "a.parquet"))

    out_dir = str(tmp_path / "cms_out")

    def run():
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )

        # memory sinks don't support checkpoint RECOVERY — the
        # restart leg needs a foreachBatch parquet sink (the
        # sessionize-restart convention)
        def sink(df, _bid):
            df.write.mode("append").parquet(out_dir)

        q = (
            cms_stream(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        rows = spark.read.parquet(out_dir).collect()
        final = {}
        for r in rows:
            if r.source not in final or r.n_toks > final[r.source][0]:
                final[r.source] = (r.n_toks,
                                   [int(x) for x in r.grid.split(",")])
        return final

    first = run()                      # batch A only
    # RESTART: second half lands, a fresh query resumes from the
    # checkpointed state store
    docs.filter(docs.doc_id > mid).coalesce(1).write.parquet(
        str(src / "b.parquet"))
    final = run()

    # every per-source grid monotonically grew across the restart
    for s_name, (n1, g1) in first.items():
        n2, g2 = final[s_name]
        assert n2 >= n1
        assert all(c2 >= c1 for c1, c2 in zip(g1, g2)), s_name

    # cell-wise merge of per-source grids == the global sketch
    merged = [0] * (CMS_D * CMS_W)
    for _, grid in final.values():
        merged = [a + b for a, b in zip(merged, grid)]

    def probe(tok):
        est = None
        for j in range(CMS_D):
            b = int(hashlib.md5(
                f"{j}:{tok}".encode()).hexdigest()[:15], 16) % CMS_W
            c = merged[j * CMS_W + b]
            est = c if est is None else min(est, c)
        return est

    batch = sk_cms_heavy(spark, sf).collect()
    assert len(batch) > 0
    for r in batch:
        assert probe(r.tok) == r.n_est, r.tok
    # the streamed token mass equals the corpus token mass: every
    # grid row j sums to the total token count
    total = sum(n for n, _ in final.values())
    for j in range(CMS_D):
        assert sum(merged[j * CMS_W:(j + 1) * CMS_W]) == total


def test_streaming_kmv_matches_batch_sketch(spark, tmp_path):
    """Constant-state streaming KMV: after the last microbatch the
    per-source running estimate is row-equal to the batch
    sk_kmv_distinct sketch on the same corpus (bottom-k of the union
    == union of bottom-ks), completing the stream≡batch pin for all
    three sketch families (KMV here, HLL, CMS)."""
    from pdf_extraction_api_spark.operators.curation import (
        sk_kmv_distinct,
    )
    from pdf_extraction_api_spark.streaming.stateful import kmv_stream

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    mid = docs.agg({"doc_id": "avg"}).collect()[0][0]
    src = tmp_path / "docs_stream"
    src.mkdir()
    docs.filter(docs.doc_id <= mid).coalesce(1).write.parquet(
        str(src / "a.parquet"))
    docs.filter(docs.doc_id > mid).coalesce(1).write.parquet(
        str(src / "b.parquet"))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        kmv_stream(stream)
        .writeStream.format("memory")
        .queryName("kmv_running")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql(
        "SELECT source, n_seen, n_est FROM kmv_running").collect()
    final = {}
    for r in rows:
        if r.source not in final or r.n_seen > final[r.source][0]:
            final[r.source] = (r.n_seen, float(r.n_est))
    batch = {r.source: r.n_est
             for r in sk_kmv_distinct(spark, sf).collect()
             if r.source != "__all__"}
    assert set(final) == set(batch)
    for s_name, (_, est) in final.items():
        assert est == pytest.approx(batch[s_name]), s_name
    assert len(rows) > len(final)   # at least one source saw 2 batches


def test_streaming_ddq_matches_batch_sketch(spark, tmp_path):
    """Constant-state streaming quantile sketch: after the last
    microbatch each source's (q50, q90, q99) estimates are row-equal
    to the batch sk_dd_quantile est_q values on the same corpus —
    the FOURTH stream≡batch sketch pair (KMV, HLL, CMS, DDQ)."""
    from pdf_extraction_api_spark.operators.curation import (
        sk_dd_quantile,
    )
    from pdf_extraction_api_spark.streaming.stateful import ddq_stream

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    mid = docs.agg({"doc_id": "avg"}).collect()[0][0]
    src = tmp_path / "docs_stream"
    src.mkdir()
    docs.filter(docs.doc_id <= mid).coalesce(1).write.parquet(
        str(src / "a.parquet"))
    docs.filter(docs.doc_id > mid).coalesce(1).write.parquet(
        str(src / "b.parquet"))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        ddq_stream(stream)
        .writeStream.format("memory")
        .queryName("ddq_running")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql(
        "SELECT source, n, q50, q90, q99 FROM ddq_running").collect()
    final = {}
    for r in rows:
        if r.source not in final or r.n > final[r.source][0]:
            final[r.source] = (r.n, r.q50, r.q90, r.q99)
    batch = {}
    for r in sk_dd_quantile(spark, sf).collect():
        if r.source != "__all__":
            batch.setdefault(r.source, {})[r.p] = r.est_q
    assert set(final) == set(batch)
    for s_name, (_, q50, q90, q99) in final.items():
        assert (q50, q90, q99) == (
            batch[s_name][50], batch[s_name][90], batch[s_name][99]
        ), s_name
    assert len(rows) > len(final)
