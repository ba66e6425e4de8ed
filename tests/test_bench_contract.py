"""bench.py driver contract: one JSON line with the required keys.

Runs the real bench subprocess at a tiny scale (500-doc corpus, sf0.001
headliners) so the contract is exercised end-to-end without the full
3-minute default run.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_one_json_line(tmp_path):
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
        "SPARK_GRAFT_CPUS": "8",
        "SPARK_GRAFT_BENCH_DOCS": "500",
        "SPARK_GRAFT_CACHE": str(tmp_path / "cache"),
    })
    res = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    lines = [ln for ln in res.stdout.strip().splitlines() if ln.strip()]
    payload = json.loads(lines[-1])
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in payload, key
    assert payload["unit"] == "sec"
    assert isinstance(payload["value"], (int, float))
    assert payload["queries"] and all(
        isinstance(v, (int, float)) for v in payload["queries"].values())
    assert payload["extract_docs_per_sec"] > 0
    # round-6 self-interpreting headline: normalized = raw total x
    # the window's measured CPU-ceiling midpoint, capped at the raw
    assert 0 < payload["headline_normalized"] <= payload["value"]
    assert payload["reps"] >= 3
    assert all(len(r) == payload["reps"]
               for r in payload["queries_reps"].values())
