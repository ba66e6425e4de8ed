"""Benchmark runner (driver contract + scaling mode).

Default: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit", "queries" (per-query
sec), "sf", ...extras}.

    python bench.py
    python bench.py --scaling   # local[8] vs local[32] throughput +
                                # efficiency → BENCH/BASELINE.md

The extraction corpus (FIXTURES.md pages table) is generated
distributed — gen_row is a pure function of (seed, doc_id), so a Spark
range → mapInPandas produces identical bytes at any parallelism — and
cached under /tmp keyed by size.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "48000"))
SCALING_DOCS = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "160000"))
CACHE_ROOT = Path(os.environ.get("SPARK_GRAFT_CACHE", "/tmp/spark_graft"))


def make_session(cores: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"spark-extract-bench-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def ensure_corpus(spark, n_docs: int, seed: int = 42) -> str:
    """Distributed deterministic pages corpus, cached by (n, seed)."""
    out = CACHE_ROOT / f"pages_n{n_docs}_s{seed}.parquet"
    if (out / "_SUCCESS").exists():
        return str(out)
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        BinaryType, StringType, StructField, StructType, TimestampType,
    )

    schema = StructType([
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ])

    def gen(batches):
        import pandas as pd

        from fixtures.gen_pages import gen_row

        for pdf in batches:
            rows = [gen_row(int(i), seed) for i in pdf["id"].values]
            yield pd.DataFrame(
                {c: [r[c] for r in rows]
                 for c in ("url", "warc_ts", "html", "text", "lang")})

    (
        spark.range(n_docs)
        .repartition(max(CPUS * 2, 16))
        .mapInPandas(gen, schema=schema)
        .write.mode("overwrite")
        .option("compression", "zstd")
        .parquet(str(out))
    )
    return str(out)


def run_extraction_job(spark, corpus_path: str) -> int:
    """The headline job: full kernel over the pages corpus, results +
    stats consumed via noop sink. Returns document count."""
    from pdf_extraction_api_spark.plans.extract import (
        load_pages,
        run_extraction,
    )

    pages = load_pages(spark, corpus_path)
    results = run_extraction(pages, with_lineage=False)
    results.write.format("noop").mode("overwrite").save()
    return pages.count()


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def headline_queries(spark, sf_dir: str) -> dict[str, float]:
    """Representative per-operator-family headliners at sf_dir."""
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    names = [
        "a11_grand_totals",      # TPC-H Q1-shaped hash agg
        "j1_packaging_join",     # broadcast equi join + agg
        "j2_range_join",         # non-equi banded join
        "w1_row_number",         # window
        "w3_topk",               # TakeOrderedAndProject
        "d1_dedup_hash",         # hash dedup
        "dd_minhash_lsh",        # shingle → minhash → band join
        "dd_simhash",            # bit-majority signatures
        "ann_topk_brute",        # brute-force cosine top-k
        "tx_quality",            # HOF text metrics
        "ex4_flagship_rollup",   # extraction kernel + rollup
    ]
    times = {}
    for name in names:
        df = q[name](spark, sf_dir)
        times[name] = _timed(
            lambda d=df: d.write.format("noop").mode("overwrite").save())
    return times


def default_bench() -> dict:
    spark = make_session(CPUS)
    try:
        corpus = ensure_corpus(spark, BENCH_DOCS)
        # warm the JVM + python workers once
        run_extraction_job(spark, corpus)
        t_extract = _timed(lambda: run_extraction_job(spark, corpus))
        docs_per_sec = round(BENCH_DOCS / t_extract, 1)
        queries = {"extract_corpus": t_extract}
        queries.update(headline_queries(spark, SF_DIR))
        total = round(sum(queries.values()), 3)
        return {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "queries": queries,
            "sf": SF_DIR.rstrip("/").split("sf")[-1],
            "extract_docs": BENCH_DOCS,
            "extract_docs_per_sec": docs_per_sec,
            "cpus": CPUS,
        }
    finally:
        spark.stop()


def scaling_bench() -> dict:
    """North-rule scaling evidence: same job, same input, local[8] vs
    local[32]; efficiency = (T8/T32)/4."""
    out = {}
    for cores in (8, 32):
        spark = make_session(cores)
        try:
            corpus = ensure_corpus(spark, SCALING_DOCS)
            run_extraction_job(spark, corpus)  # warm
            t = _timed(lambda: run_extraction_job(spark, corpus))
            out[cores] = {
                "sec": t,
                "docs_per_sec": round(SCALING_DOCS / t, 1),
            }
        finally:
            spark.stop()
    eff = round((out[8]["sec"] / out[32]["sec"]) / 4.0, 3)
    report = {
        "metric": "scaling_efficiency_8_to_32",
        "value": eff,
        "unit": "ratio",
        "docs": SCALING_DOCS,
        "local8": out[8],
        "local32": out[32],
    }
    md = Path("BENCH/BASELINE.md")
    md.parent.mkdir(exist_ok=True)
    md.write_text(
        "# BENCH — measured numbers\n\n"
        "Extraction job (full kernel, noop sink) over the deterministic "
        f"pages corpus ({SCALING_DOCS} docs, seed 42), same input at two "
        "parallelism levels (sandbox proxy for N vs 4N executors, "
        "BASELINE.md):\n\n"
        "| level | wall sec | docs/sec |\n|---|---|---|\n"
        f"| local[8] | {out[8]['sec']} | {out[8]['docs_per_sec']} |\n"
        f"| local[32] | {out[32]['sec']} | {out[32]['docs_per_sec']} |\n\n"
        f"**Scaling efficiency (8→32) = (T8/T32)/4 = {eff}** "
        "(target ≥ 0.8, BASELINE.json).\n"
    )
    return report


if __name__ == "__main__":
    result = scaling_bench() if "--scaling" in sys.argv else default_bench()
    print(json.dumps(result))
