"""Catalog model test: random append/compact/vacuum/crash sequences
must keep read() equal to an in-memory model of the committed rows.
(The round-1 advice found a real catalog bug — crash-replay append
corrupting the table — so the snapshot machinery gets systematic
sequence coverage, not just the happy-path test.)"""

from __future__ import annotations

import random

import pytest


@pytest.mark.parametrize("seed", [11, 23])
def test_random_catalog_sequences(spark, tmp_path, seed):
    from pyspark.sql import functions as F

    from pdf_extraction_api_spark.sources.catalog import SnapshotCatalog

    cat = SnapshotCatalog(str(tmp_path / f"wh{seed}"))
    rng = random.Random(seed)
    expected: dict[str, int] = {}  # url → v (model of committed rows)
    next_id = 0

    def batch(n):
        nonlocal next_id
        rows = [(f"u{next_id + i:04d}", next_id + i) for i in range(n)]
        next_id += n
        return rows

    for step in range(12):
        op = rng.choice(["append", "append", "replay", "crash",
                         "compact", "vacuum"])
        if op == "append":
            rows = batch(rng.randint(1, 30))
            df = spark.createDataFrame(rows, "url STRING, v LONG")
            cat.append(df, "t", run_id=f"r{step}")
            expected.update(rows)
        elif op == "replay" and expected:
            # crash-replay: same run_id, different data → must be a
            # no-op (the manifest already exists)
            df = spark.createDataFrame(
                [("SHOULD-NOT-APPEAR", -1)], "url STRING, v LONG")
            prior = [m for m in cat.committed_run_ids("t")]
            if prior:
                cat.append(df, "t", run_id=prior[-1])
        elif op == "crash":
            # uncommitted data files (no manifest) must stay invisible
            df = spark.createDataFrame(
                [("CRASHED", -2)], "url STRING, v LONG")
            ddir = tmp_path / f"wh{seed}" / "t" / "data" / f"crash{step}"
            df.write.mode("overwrite").parquet(str(ddir))
        elif op == "compact" and expected:
            cat.compact(spark, "t", target_files=2,
                        run_id=f"maint{step}")
        elif op == "vacuum":
            cat.vacuum("t", grace_seconds=0)

        got = cat.read(spark, "t")
        if expected:
            rows = {(r.url, r.v) for r in got.collect()}
            assert rows == set(expected.items()), (step, op)
        else:
            assert got is None or got.count() == 0
