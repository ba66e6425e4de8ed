"""Regenerate QUERY_FPRINTS.json — the rotation's change detector.

    python -m tools.update_fprints

Each registry query gets a fingerprint (md5 of the callable's source +
its oracle SQL). The file records, per query, the fingerprint and the
round in which that fingerprint FIRST became current (preserved from
the previous file when the fingerprint is unchanged; otherwise
max(committed CORRECTNESS round) + 1 — i.e. "needs verification by
the next driver gate").

__spark_entry__'s least-recently-verified rotation treats a query
whose last driver verification predates its fingerprint round as
NEVER VERIFIED, so edited queries re-enter the driver's capped
verification window immediately instead of waiting out the rotation.
tests/test_fprints_current.py fails whenever a query changes without
this file being regenerated — run the command above and commit.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import re
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
FPRINTS = ROOT / "QUERY_FPRINTS.json"


def current_fprints() -> dict[str, str]:
    import __spark_entry__ as entry

    out = {}
    for name, (fn, sql) in entry._registry().items():
        try:
            src = inspect.getsource(fn)
        except OSError:
            src = repr(fn)
        out[name] = hashlib.md5(
            (src + "\0" + (sql or "")).encode()).hexdigest()
    return out


def max_correctness_round() -> int:
    rounds = [0]
    for p in ROOT.glob("CORRECTNESS_r*.json"):
        m = re.search(r"_r(\d+)", p.name)
        if m:
            rounds.append(int(m.group(1)))
    return max(rounds)


def build(prev: dict | None = None) -> dict:
    if prev is None:
        prev = (json.loads(FPRINTS.read_text())
                if FPRINTS.exists() else {})
    next_round = max_correctness_round() + 1
    out = {}
    for name, fp in sorted(current_fprints().items()):
        old = prev.get(name)
        if old and old.get("fp") == fp:
            out[name] = old
        else:
            out[name] = {"fp": fp, "round": next_round}
    return out


def main() -> None:
    data = build()
    FPRINTS.write_text(json.dumps(data, indent=1, sort_keys=True) + "\n")
    print(f"{FPRINTS.name}: {len(data)} queries, "
          f"{sum(1 for v in data.values() if v['round'] == max_correctness_round() + 1)} "
          f"pending verification")


if __name__ == "__main__":
    main()
