"""spark-submit entrypoint (north_rule: `spark-submit --py-files`).

    python tools/make_pyfiles.py                 # → dist/engine.zip
    spark-submit --py-files dist/engine.zip \
        pdf_extraction_api_spark/job.py \
        --pages PATH --warehouse DIR --run-id ID \
        [--resume] [--salt-partitions N] [--stats]

One DataFrame plan per run: scan → [resume anti-join] → kernel →
results snapshot + audit snapshot (both atomic manifest commits).
Deterministic: run twice with --resume and the second run is a no-op.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages",
                    help="pages table path (required unless running a "
                         "maintenance mode)")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--resume", action="store_true",
                    help="skip urls already committed (J4 anti-join)")
    ap.add_argument("--salt-partitions", type=int, default=None,
                    help="explicit url-hash salting for skewed layouts")
    ap.add_argument("--arrow-batch", type=int, default=256,
                    help="max docs per Arrow batch — lower it for "
                         "corpora with multi-MB documents so a batch "
                         "of html payloads stays within executor memory")
    ap.add_argument("--stats", action="store_true",
                    help="print run statistics JSON to stdout")
    ap.add_argument("--compact", action="store_true",
                    help="maintenance mode: rewrite the results table "
                         "into few files (full-snapshot commit) "
                         "instead of extracting")
    ap.add_argument("--vacuum", action="store_true",
                    help="maintenance mode: delete data files no "
                         "longer reachable from the current read set")
    ap.add_argument("--target-files", type=int, default=8,
                    help="file count --compact aims for")
    ap.add_argument("--table", default="results",
                    help="table the maintenance modes operate on "
                         "(e.g. 'results' or 'audit')")
    ap.add_argument("--vacuum-grace", type=int, default=900,
                    help="seconds a data file must be old before "
                         "--vacuum may reclaim it (in-flight append "
                         "protection)")
    args = ap.parse_args(argv)
    if not (args.compact or args.vacuum) and not args.pages:
        ap.error("--pages is required unless --compact/--vacuum")

    # imports AFTER argparse: a bad invocation should print usage, not
    # a Spark/module traceback (spark-submit sets sys.path[0] to the
    # script dir, so these imports require --py-files engine.zip)
    from pyspark.sql import SparkSession

    from pdf_extraction_api_spark.plans.extract import (
        audit_metrics,
        load_pages,
        resume_filter,
        run_extraction,
        run_stats,
    )
    from pdf_extraction_api_spark.sources.catalog import SnapshotCatalog

    spark = (
        SparkSession.builder.appName(f"spark-extract-{args.run_id}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(args.arrow_batch))
        .getOrCreate()
    )
    cat = SnapshotCatalog(args.warehouse)

    if args.compact or args.vacuum:
        if args.compact:
            m = cat.compact(spark, args.table,
                            target_files=args.target_files,
                            run_id=args.run_id)
            print(json.dumps(
                {"table": args.table, "compacted": bool(m),
                 "files": len(m["files"]) if m else 0}))
        if args.vacuum:
            deleted = cat.vacuum(args.table,
                                 grace_seconds=args.vacuum_grace)
            print(json.dumps({"table": args.table,
                              "vacuumed_files": len(deleted)}))
        return 0

    pages = load_pages(spark, args.pages)
    if args.resume:
        committed = cat.read(spark, "results")
        if committed is not None:
            pages = resume_filter(pages, committed)

    # emptiness probe on the INPUT (kernel is 1 row in → 1 row out):
    # a scan limit-1 is cheap; probing the kernel output would run the
    # Python kernel just to discover there is nothing to do
    if pages.limit(1).count() == 0:
        print("nothing to do (all urls committed)")
        return 0

    results = run_extraction(
        pages, salt_partitions=args.salt_partitions, with_lineage=True)
    results = results.cache()  # one kernel pass feeds both sinks
    try:
        cat.append(results.drop("partition_id", "bytes_in", "kernel_us"),
                   "results", run_id=args.run_id)
        cat.append(audit_metrics(results, args.run_id), "audit",
                   run_id=args.run_id)
        if args.stats:
            row = run_stats(results).collect()[0]
            print(json.dumps(row.asDict(recursive=True), default=str))
    finally:
        results.unpersist()
    return 0


if __name__ == "__main__":
    sys.exit(main())
