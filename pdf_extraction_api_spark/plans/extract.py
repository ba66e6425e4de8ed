"""The extraction plan: pages → kernel → results (+ audit, + resume).

Replaces the reference's HTTP→subprocess→threadpool→filesystem pipeline
(SURVEY.md §3.1) with ONE DataFrame plan:

    read pages → [resume anti-join J4] → mapInArrow(extract_kernel)
    → results (+ per-partition lineage via groupBy over kernel counters)

Scale notes (SURVEY.md §4, 100 TB design):

- **No pre-kernel shuffle by default.** The Parquet/Iceberg scan already
  partitions by bytes (`spark.sql.files.maxPartitionBytes`), which is
  the correct balancing unit for a size-skewed corpus — shuffling the
  html payload to "balance" it would move the full 100 TB through the
  network first. `salt_partitions` exists for pathological layouts
  (e.g. one giant sorted file): it hash-salts on url, which spreads
  mega-documents uniformly at the cost of one shuffle.
- **Column pruning is load-bearing**: the kernel selects only
  (url, html); metrics-only consumers must never deserialize html —
  verified in tests via the scan's ReadSchema.
- The kernel is a UDTF-shaped mapInArrow (1 row in → 1 row out with
  nested arrays); Arrow batch size is bounded by
  `spark.sql.execution.arrow.maxRecordsPerBatch` so a batch of
  multi-KB html payloads fits executor memory.
"""

from __future__ import annotations

import time
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..kernel.batch import RESULT_SCHEMA, extract_one

KERNEL_SCHEMA = StructType(
    RESULT_SCHEMA.fields
    + [
        StructField("partition_id", LongType()),
        StructField("bytes_in", LongType()),
        StructField("kernel_us", LongType()),
    ]
)

_RESULT_COLS = [f.name for f in RESULT_SCHEMA.fields]


def _make_kernel(carry: tuple[str, ...]):
    """Kernel closure (mapInArrow); `carry` columns ride the Arrow
    batch unchanged (1 row in → 1 row out, so passthrough is
    positional — carried arrays are re-emitted as the INPUT batch's
    Arrow arrays, zero per-row Python) — lets downstream rollups
    group on input attributes (e.g. lang) with NO post-kernel join.

    Round 6: switched from mapInPandas to mapInArrow and adopted the
    kernel/batch dup-body memo on this surface too. The output rows
    are deeply nested (tables/cells/metadata maps); building the
    output RecordBatch with pa.RecordBatch.from_pylist skips the
    pandas block-manager hop entirely (measured ~2x on the conversion
    itself, 1.1-1.2x on the whole extraction job with the memo at the
    bench corpus's 6.9% duplicate-body rate; results verified
    row-identical vs the pandas path)."""

    def _kernel(batches):
        import pyarrow as pa
        from pyspark import TaskContext
        from pyspark.sql.pandas.types import to_arrow_schema

        from ..kernel.batch import memo_get, memo_put

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        pa_result = to_arrow_schema(RESULT_SCHEMA)
        names = (_RESULT_COLS
                 + ["partition_id", "bytes_in", "kernel_us"]
                 + list(carry))
        for rb in batches:
            idx = rb.schema.get_field_index
            urls = rb.column(idx("url")).to_pylist()
            htmls = rb.column(idx("html")).to_pylist()
            results: list[dict] = []
            bytes_in: list[int] = []
            kernel_us: list[int] = []
            for url, html in zip(urls, htmls):
                t0 = time.perf_counter_ns()
                key = html if html is not None else b""
                res = memo_get(key)
                if res is None:
                    try:
                        res = extract_one(url, html)
                    except Exception as exc:  # a bad doc never kills a task
                        res = {
                            "url": url, "n_pages": 0,
                            "extracted_text": b"", "tables": [],
                            "spans": [], "n_tables": 0,
                            "n_content_spans": 0,
                            "error": f"{type(exc).__name__}: {exc}",
                        }
                    memo_put(key, res)
                if res["url"] != url:  # memo hit under a different url
                    res = {**res, "url": url}
                results.append(res)
                bytes_in.append(len(html) if html is not None else 0)
                kernel_us.append((time.perf_counter_ns() - t0) // 1000)
            out = pa.RecordBatch.from_pylist(results, schema=pa_result)
            arrays = list(out.columns) + [
                pa.array([pid] * len(results), pa.int64()),
                pa.array(bytes_in, pa.int64()),
                pa.array(kernel_us, pa.int64()),
            ] + [rb.column(idx(c)) for c in carry]
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return _kernel


def load_pages(spark: SparkSession, path: str) -> DataFrame:
    """Scan the pages table (Parquet here; Iceberg when a runtime jar
    is on the cluster — the plan is identical, SURVEY.md §1.2)."""
    return spark.read.parquet(path)


def resume_filter(pages: DataFrame, committed_urls: DataFrame) -> DataFrame:
    """J4 — skip already-committed urls (idempotent resume). The
    committed set is tiny relative to 10^12 pages only per-run; at
    scale prefer partition-pruned snapshots; here: broadcast-able
    left anti join."""
    return pages.join(
        F.broadcast(committed_urls.select("url")), "url", "left_anti"
    )


def run_extraction(
    pages: DataFrame,
    *,
    salt_partitions: int | None = None,
    with_lineage: bool = True,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """pages(url, html, ...) → extraction results (one row per url).

    `carry` names extra pages columns to pass through the kernel
    unchanged (e.g. ("lang",)) so per-attribute rollups need no join
    back to the scan."""
    clash = set(carry) & {f.name for f in KERNEL_SCHEMA.fields}
    if clash:
        raise ValueError(
            f"carry columns {sorted(clash)} collide with kernel output "
            "columns — they would silently overwrite kernel values and "
            "duplicate fields in the result schema")
    src = pages.select("url", "html", *carry)
    if salt_partitions:
        # explicit skew defusal for pathological input layouts
        src = src.repartition(salt_partitions, F.xxhash64("url"))
    schema = StructType(
        KERNEL_SCHEMA.fields + [pages.schema[c] for c in carry])
    out = src.mapInArrow(_make_kernel(carry), schema=schema)
    if not with_lineage:
        out = out.drop("partition_id", "bytes_in", "kernel_us")
    return out


EXTRACT_UDF_SCHEMA = ("n_pages INT, extracted_text BINARY, "
                      "n_tables INT, n_content_spans INT, error STRING")


def register_extract_udf(spark: SparkSession, name: str = "extract_doc"):
    """Register the extraction kernel as a SQL-callable pandas UDF so
    pure-SQL users can run it:  SELECT url, extract_doc(html).* FROM
    pages.  Returns the scalar summary struct (pages, extracted bytes,
    table/span counts, error) — Arrow-batched like the mapInPandas
    path, same kernel, same memo; full nested results (tables/spans)
    stay on run_extraction, which is the plan-level surface.

    The UDF is html-only (url is a pass-through key the caller already
    has), so it composes with any FROM clause — joins, filters and
    column pruning all stay Catalyst-visible around it."""
    import pandas as pd

    from ..kernel.batch import extract_one

    def _extract(html):
        rows = []
        for h in html.values:
            try:
                r = extract_one("", h)
                rows.append({
                    "n_pages": r["n_pages"],
                    "extracted_text": r["extracted_text"],
                    "n_tables": r["n_tables"],
                    "n_content_spans": r["n_content_spans"],
                    "error": None,
                })
            except Exception as exc:
                rows.append({
                    "n_pages": 0, "extracted_text": b"", "n_tables": 0,
                    "n_content_spans": 0,
                    "error": f"{type(exc).__name__}: {exc}",
                })
        return pd.DataFrame(rows)

    # `from __future__ import annotations` stringifies inline hints
    # module-wide and pandas_udf can't resolve 'pd.Series' from module
    # globals (pandas is function-local here) — attach real objects.
    _extract.__annotations__ = {"html": pd.Series, "return": pd.DataFrame}
    udf = F.pandas_udf(_extract, EXTRACT_UDF_SCHEMA)
    spark.udf.register(name, udf)
    return udf


def tables_view(results: DataFrame) -> DataFrame:
    """Explode nested tables to a flat relational view (W1/D1 already
    applied in-kernel — zero extra shuffles, SURVEY.md §3.1)."""
    t = results.select(
        "url", "n_pages", F.explode("tables").alias("t")
    )
    return t.select("url", "n_pages", "t.*")


def audit_metrics(results: DataFrame, run_id: str) -> DataFrame:
    """Per-partition lineage + counters (north_rule requirement):
    (run_id, partition_id, input_rows, output_rows, n_tables,
    bytes_in, kernel_ms, errors)."""
    return (
        results.groupBy("partition_id")
        .agg(
            F.count("*").alias("input_rows"),
            F.count(F.when(F.col("error").isNull(), 1)).alias(
                "output_rows"),
            F.sum("n_tables").alias("n_tables"),
            F.sum("bytes_in").alias("bytes_in"),
            (F.sum("kernel_us") / 1000.0).alias("kernel_ms"),
            F.count(F.col("error")).alias("errors"),
        )
        .withColumn("run_id", F.lit(run_id))
    )


def run_stats(results: DataFrame) -> DataFrame:
    """Run-level statistics (A1-A5, A11 as one hash-agg pass)."""
    t = tables_view(results)
    by_method = t.groupBy("method").count()
    by_type = t.groupBy("table_type").count()
    quality_hist = t.groupBy(
        F.when(F.col("quality_score") >= 0.7, "high")
        .when(F.col("quality_score") >= 0.4, "medium")
        .otherwise("low")
        .alias("bucket")
    ).count()
    totals = results.agg(
        F.count("*").alias("documents"),
        F.sum("n_pages").alias("total_pages"),
        F.sum("n_tables").alias("total_tables"),
        F.count(F.when(F.col("n_tables") > 0, 1)).alias(
            "docs_with_tables"),
        F.sum(F.length("extracted_text")).alias("extracted_bytes"),
    )
    return totals.crossJoin(
        F.broadcast(
            by_method.agg(
                F.map_from_entries(
                    F.collect_list(F.struct("method", "count"))
                ).alias("by_method")
            )
        )
    ).crossJoin(
        F.broadcast(
            by_type.agg(
                F.map_from_entries(
                    F.collect_list(F.struct("table_type", "count"))
                ).alias("by_type")
            )
        )
    ).crossJoin(
        F.broadcast(
            quality_hist.agg(
                F.map_from_entries(
                    F.collect_list(F.struct("bucket", "count"))
                ).alias("quality_distribution")
            )
        )
    )
