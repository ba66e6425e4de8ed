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


def test_no_hugeint_oracle_output(con):
    """Statically reject HUGEINT/UHUGEINT oracle output columns.

    The driver's value hasher goes through pandas, where DuckDB
    HUGEINT coerces to float64 ("0" hashes as "0.0"), so an oracle
    emitting HUGEINT hash-mismatches EVERY row while rows/schema
    match — the exact round-4 driver-red signature of
    tx_pack_sequences (window SUM over BIGINT and `//` both return
    HUGEINT). Local `fetchall()` converts HUGEINT to Python int and
    hides the problem, so this must be a static type check: every
    window SUM / integer division feeding an output column needs
    `CAST(... AS BIGINT)`."""
    bad = []
    for name, sql in entrymod.oracle_sql().items():
        try:
            cols = con.sql(f"DESCRIBE {sql}").fetchall()
        except Exception:
            continue  # plan failures are test_every_oracle_plans_in_duckdb's
        for row in cols:
            col, typ = row[0], str(row[1]).upper()
            if "HUGEINT" in typ:
                bad.append((name, col, typ))
    assert not bad, f"HUGEINT oracle columns (driver hash-red): {bad}"


def test_every_oracle_plans_in_duckdb(con):
    bad = []
    for name, sql in entrymod.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:
            bad.append((name, str(exc)[:200]))
    assert not bad, bad
