"""spark-submit job entrypoint + streaming surface tests."""

from __future__ import annotations

import os
import subprocess

import pytest

PAGES = "tests/golden/pages_tiny.parquet"

pytestmark = pytest.mark.skipif(
    not os.path.exists(PAGES), reason="golden fixtures missing")


def test_job_main_with_resume(spark, tmp_path):
    from pdf_extraction_api_spark.job import main
    from pdf_extraction_api_spark.sources.catalog import SnapshotCatalog

    wh = str(tmp_path / "wh")
    assert main(["--pages", PAGES, "--warehouse", wh,
                 "--run-id", "r1"]) == 0
    cat = SnapshotCatalog(wh)
    n1 = cat.read(spark, "results").count()
    assert n1 == 200
    audit = cat.read(spark, "audit")
    assert audit.groupBy("run_id").count().count() == 1

    # resume run: everything committed → no new snapshot rows
    assert main(["--pages", PAGES, "--warehouse", wh,
                 "--run-id", "r2", "--resume"]) == 0
    assert cat.read(spark, "results").count() == 200


def test_spark_submit_pyfiles(tmp_path):
    """The actual north_rule launch mode: spark-submit --py-files."""
    from pdf_extraction_api_spark.job import main  # noqa: F401

    subprocess.run(
        ["python", "tools/make_pyfiles.py"], check=True,
        capture_output=True)
    env = dict(os.environ)
    env.pop("PYSPARK_DRIVER_PYTHON", None)
    res = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--py-files", "dist/engine.zip",
            "pdf_extraction_api_spark/job.py",
            "--pages", PAGES,
            "--warehouse", str(tmp_path / "wh"),
            "--run-id", "submit1",
        ],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    manifests = list((tmp_path / "wh" / "results").glob("manifest-*.json"))
    assert len(manifests) == 1


def _stage_dir(tmp_path) -> str:
    """File streaming sources need a directory, not a bare file."""
    import shutil

    d = tmp_path / "pages_dir"
    d.mkdir()
    shutil.copy(PAGES, d / "part-000.parquet")
    return str(d)


def test_streaming_extraction(spark, tmp_path):
    from pdf_extraction_api_spark.sources.catalog import SnapshotCatalog
    from pdf_extraction_api_spark.streaming.stream import (
        start_extraction_stream,
    )

    pages_dir = _stage_dir(tmp_path)
    cat = SnapshotCatalog(str(tmp_path / "wh"))
    q = start_extraction_stream(
        spark, pages_dir, cat, "stream_results",
        checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    out = cat.read(spark, "stream_results")
    assert out.count() == 200
    assert out.select("url").distinct().count() == 200
    # restart with same checkpoint: no duplicate processing
    q2 = start_extraction_stream(
        spark, pages_dir, cat, "stream_results",
        checkpoint_dir=str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    assert cat.read(spark, "stream_results").count() == 200
    # the streaming path emits per-partition lineage too (north_rule):
    # every input row accounted for across the microbatch audits
    audit = cat.read(spark, "stream_results_audit")
    rows = audit.groupBy().sum("input_rows", "errors").collect()[0]
    assert rows[0] == 200 and rows[1] == 0
    assert audit.select("run_id").distinct().count() >= 1


def test_streaming_windowed_counts(spark, tmp_path):
    from pdf_extraction_api_spark.streaming.stream import (
        read_pages_stream,
        windowed_doc_counts,
    )

    stream = read_pages_stream(spark, _stage_dir(tmp_path))
    agg = windowed_doc_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    total = spark.sql(
        "SELECT sum(n_docs) AS n FROM win_counts").collect()[0]["n"]
    assert total == 200
