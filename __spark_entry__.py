"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship: run the extraction kernel over pages
                    synthesized from sf0.001 documents, roll up per lang.
queries()         — one entry per implemented operator (SURVEY.md §2 +
                    training-data ops), callable (spark, sf_dir) → DF.
oracle_sql()      — DuckDB-equivalent SQL per query (omitted only for
                    genuinely non-SQL-expressible kernel/multimodal ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-lang document count + extracted-table volume from
    the extraction kernel over /root/testdata/sf0.001."""
    from pdf_extraction_api_spark.operators.kernelq import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def _registry() -> dict[str, tuple]:
    from pdf_extraction_api_spark.operators.grouped import (
        QUERIES as GROUPED_QUERIES,
    )
    from pdf_extraction_api_spark.operators.kernelq import (
        QUERIES as KERNEL_QUERIES,
    )
    from pdf_extraction_api_spark.operators.multimodal import (
        QUERIES as MM_QUERIES,
    )
    from pdf_extraction_api_spark.operators.relational import (
        QUERIES as REL_QUERIES,
    )
    from pdf_extraction_api_spark.operators.textops import (
        QUERIES as TEXT_QUERIES,
    )
    from pdf_extraction_api_spark.operators.vectorops import (
        QUERIES as VEC_QUERIES,
    )
    from pdf_extraction_api_spark.functions.scalar import (
        QUERIES as SCALAR_QUERIES,
    )
    from pdf_extraction_api_spark.operators.audioops import (
        QUERIES as AUDIO_QUERIES,
    )
    from pdf_extraction_api_spark.operators.imageops import (
        QUERIES as IMG_QUERIES,
    )
    from pdf_extraction_api_spark.operators.videoops import (
        QUERIES as VIDEO_QUERIES,
    )
    from pdf_extraction_api_spark.sources.binaryfiles import (
        QUERIES as BIN_QUERIES,
    )
    from pdf_extraction_api_spark.operators.curation import (
        QUERIES as CURATION_QUERIES,
    )

    merged: dict[str, tuple] = {}
    for group in (REL_QUERIES, SCALAR_QUERIES, TEXT_QUERIES, VEC_QUERIES,
                  MM_QUERIES, IMG_QUERIES, AUDIO_QUERIES,
                  VIDEO_QUERIES, GROUPED_QUERIES, KERNEL_QUERIES,
                  BIN_QUERIES, CURATION_QUERIES):
        merged.update(group)
    # Emission order matters: the driver gate verifies a capped prefix
    # (50 rows/round), so a fixed order would leave the tail unverified
    # forever. Rotate by least-recently-verified: read the committed
    # CORRECTNESS_r*.json results and emit never-verified queries
    # first, then oldest-verified — every query is re-verified at
    # least every ceil(N/cap) rounds, deterministically.
    # Change-awareness: a verification older than the query's
    # fingerprint round (QUERY_FPRINTS.json — md5 of source + oracle,
    # maintained by tools/update_fprints.py and pinned current by
    # tests/test_fprints_current.py) doesn't count — an EDITED query
    # re-enters the window immediately instead of waiting out the
    # rotation on a green-but-stale check of its old semantics.
    last_seen = _last_verified_round()
    fp_round = _fingerprint_rounds()
    def key(n):
        seen = last_seen.get(n, -1)
        if seen < fp_round.get(n, 0):
            seen = -1
        return (seen, n)
    order = sorted(merged, key=key)
    return {n: merged[n] for n in order}


def _fingerprint_rounds() -> dict[str, int]:
    """query name → round in which its current fingerprint first
    became current (0 / missing file degrades to no constraint)."""
    import json
    from pathlib import Path

    p = Path(__file__).resolve().parent / "QUERY_FPRINTS.json"
    try:
        data = json.loads(p.read_text())
    except (OSError, ValueError):
        return {}
    if not isinstance(data, dict):
        return {}
    return {
        name: row["round"]
        for name, row in data.items()
        if isinstance(row, dict) and isinstance(row.get("round"), int)
    }


def _last_verified_round() -> dict[str, int]:
    """query name → most recent round whose committed CORRECTNESS file
    recorded it as ran (rows_match true). Missing/unparseable files are
    skipped; an empty dict degrades to plain name order."""
    import json
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parent
    seen: dict[str, int] = {}
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)", p.name)
        rnd = int(m.group(1)) if m else 0
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            # "verified" = ran without error and didn't mismatch —
            # rows-only entries (err == "no_oracle", spark_rows set)
            # count as seen, but errored/red rows sort first for a
            # retry.
            if (isinstance(row, dict)
                    and row.get("err") in (None, "no_oracle")
                    and row.get("spark_rows") is not None
                    and row.get("rows_match") is not False
                    and row.get("hash_match") is not False):
                seen[name] = max(seen.get(name, rnd), rnd)
    return seen


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql
        for name, (_fn, sql) in _registry().items()
        if sql is not None
    }
