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


def test_every_oracle_plans_in_duckdb(con):
    bad = []
    for name, sql in entrymod.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:
            bad.append((name, str(exc)[:200]))
    assert not bad, bad
