"""Fast static gate over the driver contract: every registry entry has
a callable, every oracle SQL at least PLANS in DuckDB against the real
table schemas (EXPLAIN — no execution), and names are unique and
shell-safe. Catches oracle syntax/typo regressions in seconds, without
the full check_oracles run."""

from __future__ import annotations

import re

import duckdb
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    return c


def test_registry_names_sane():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 100
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        assert re.fullmatch(r"[a-z0-9_]+", name), name
        assert callable(fn), name


def test_no_hugeint_or_decimal_oracle_output(con):
    """Statically reject HUGEINT/UHUGEINT and DECIMAL oracle output
    columns — the two DuckDB types whose pandas-path representation
    diverges from Spark's long/double.

    HUGEINT: the driver's value hasher goes through pandas, where
    HUGEINT coerces to float64 ("0" hashes as "0.0"), so an oracle
    emitting it hash-mismatches EVERY row while rows/schema match —
    the exact round-4 driver-red signature of tx_pack_sequences
    (window SUM over BIGINT and `//` both return HUGEINT). Local
    `fetchall()` converts HUGEINT to Python int and hides it, so the
    check must be static: CAST(... AS BIGINT).

    DECIMAL: a bare `0.0` literal or decimal arithmetic yields
    DECIMAL(p,s), which pandas renders as decimal.Decimal ("1.50" vs
    Spark's 1.5) — repo convention is CAST(... AS DOUBLE) on every
    fractional output, and as of round 5 zero oracles emit DECIMAL,
    so this lint has no false positives to grandfather."""
    bad = []
    for name, sql in entrymod.oracle_sql().items():
        try:
            cols = con.sql(f"DESCRIBE {sql}").fetchall()
        except Exception:
            continue  # plan failures are test_every_oracle_plans_in_duckdb's
        for row in cols:
            col, typ = row[0], str(row[1]).upper()
            if "HUGEINT" in typ or "DECIMAL" in typ:
                bad.append((name, col, typ))
    assert not bad, f"driver-hash-unsafe oracle columns: {bad}"


def test_every_oracle_plans_in_duckdb(con):
    bad = []
    for name, sql in entrymod.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:
            bad.append((name, str(exc)[:200]))
    assert not bad, bad
