"""QUERY_FPRINTS.json must track the registry: the driver-gate
rotation treats a query whose last verification predates its
fingerprint round as never-verified, so an EDITED query re-enters the
capped verification window immediately. That only works if the
committed fingerprint file is regenerated whenever a query changes —
this test forces it:

    python -m tools.update_fprints   # then commit the file
"""

from __future__ import annotations

import json

from tools.update_fprints import FPRINTS, build, current_fprints


def test_fprints_file_is_current():
    assert FPRINTS.exists(), "run python -m tools.update_fprints"
    committed = json.loads(FPRINTS.read_text())
    cur = current_fprints()
    assert set(committed) == set(cur), (
        "registry changed (added/removed queries): "
        f"{sorted(set(committed) ^ set(cur))} — regenerate with "
        "python -m tools.update_fprints")
    stale = [n for n, fp in cur.items()
             if committed[n].get("fp") != fp]
    assert stale == [], (
        f"queries edited without fingerprint refresh: {stale} — "
        "regenerate with python -m tools.update_fprints")


def test_build_preserves_rounds_for_unchanged():
    committed = json.loads(FPRINTS.read_text())
    rebuilt = build(prev=committed)
    # regenerating against an up-to-date file is a no-op
    assert rebuilt == committed


def test_rotation_prioritizes_changed_queries():
    """A query with fp round > its last verified round must sort into
    the emission prefix ahead of recently-verified unchanged ones."""
    import __spark_entry__ as entry

    committed = json.loads(FPRINTS.read_text())
    names = list(entry._registry())
    pending = [n for n, row in committed.items() if row["round"] > 0]
    seen = entry._last_verified_round()
    for n in pending:
        if seen.get(n, -1) < committed[n]["round"]:
            assert names.index(n) < 60, (n, names.index(n))
