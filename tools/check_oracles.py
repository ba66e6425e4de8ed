"""Local emulation of the driver's DuckDB-oracle correctness gate.

Runs every `__spark_entry__.queries()` entry at sf0.01 against its
`oracle_sql()` and compares row count, column-name set and an
order-insensitive value hash (columns sorted by name, rows sorted).

    python -m tools.check_oracles [name ...]
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import sys


def _norm_val(v):
    if v is None:
        return "~"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # kill ulp noise: 12 significant digits
        return f"{v:.12g}"
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_val(x) for x in v) + "]"
    return str(v)


def _canon(cols: list[str], rows: list[tuple]) -> tuple:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    body = sorted(
        tuple(_norm_val(r[i]) for i in order) for r in rows
    )
    return sorted_cols, body


def main(only: list[str]) -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    sf_dir = "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = only or list(queries)
    fails, rows_only = [], []
    for name in names:
        fn = queries[name]
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            fails.append((name, f"SPARK ERROR {type(exc).__name__}: {exc}"))
            print(f"FAIL {name}: spark error: {exc}")
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"ROWS {name}: {len(s_rows)} rows (no oracle)")
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = list(rel.columns)
            # The DRIVER hashes through pandas, where HUGEINT →
            # float64 ("0" vs "0.0") — but fetchall() below converts
            # HUGEINT to Python int, so without this check the local
            # gate passes a query the driver fails (round-4
            # tx_pack_sequences). Reject the type outright.
            huge = [c for c, t in zip(d_cols, rel.types)
                    if "HUGEINT" in str(t).upper()]
            if huge:
                fails.append((name, f"HUGEINT output cols {huge}"))
                print(f"FAIL {name}: oracle emits HUGEINT {huge} — "
                      f"driver pandas hasher coerces to float64; "
                      f"CAST(... AS BIGINT)")
                continue
            d_rows = rel.fetchall()
        except Exception as exc:
            fails.append((name, f"DUCKDB ERROR {type(exc).__name__}: {exc}"))
            print(f"FAIL {name}: duckdb error: {exc}")
            continue
        sc, sb = _canon(s_cols, s_rows)
        dc, db_ = _canon(d_cols, d_rows)
        if sc != dc:
            fails.append((name, f"schema {sc} != {dc}"))
            print(f"FAIL {name}: schema mismatch {sc} vs {dc}")
        elif len(sb) != len(db_):
            fails.append((name, f"rowcount {len(sb)} != {len(db_)}"))
            print(f"FAIL {name}: rowcount {len(sb)} vs {len(db_)}")
        elif sb != db_:
            diff = [i for i, (a, b) in enumerate(zip(sb, db_)) if a != b]
            fails.append((name, f"values differ at {diff[:3]}"))
            print(f"FAIL {name}: value mismatch; first diffs:")
            for i in diff[:3]:
                print(f"  spark : {sb[i]}")
                print(f"  duckdb: {db_[i]}")
        else:
            print(f"OK   {name}: {len(sb)} rows")
    print(f"\n{len(names) - len(fails) - len(rows_only)} ok, "
          f"{len(rows_only)} rows-only, {len(fails)} failed of {len(names)}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
