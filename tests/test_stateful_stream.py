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
