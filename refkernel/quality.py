"""Table quality scoring (KERNEL_SPEC.md §4.3).

Semantics of /root/reference/enterprise_table_extractor_full.py:284-400
(QualityAnalyzer): weighted sum of completeness / consistency /
structure / data-type consistency / size-appropriateness. Computed but
never used as a filter (quirk #5, ref :416, :596-600).
"""

from __future__ import annotations

import re

from .textnorm import modal_count

_NUMERIC = re.compile(r"^-?\d+\.?\d*$")

WEIGHTS = {
    "completeness": 0.3,
    "consistency": 0.2,
    "structure": 0.2,
    "data_types": 0.2,
    "size_appropriateness": 0.1,
}


def _completeness(rows):
    total = sum(len(r) for r in rows)
    if total == 0:
        return 0
    non_empty = sum(1 for r in rows for c in r if c and str(c).strip())
    return non_empty / total


def _consistency(rows):
    if not rows:
        return 0
    counts = [len(r) for r in rows]
    m = modal_count(counts)
    return sum(1 for c in counts if c == m) / len(rows)


def _structure(rows):
    if len(rows) < 2:
        return 0.5
    first = rows[0]
    header_hits = sum(
        1 for c in first if c and not _NUMERIC.match(str(c).strip())
    )
    header_score = header_hits / len(first) if first else 0
    n_rows, n_cols = len(rows), len(rows[0]) if rows else 0
    if n_rows < 2 or n_cols < 2:
        dim = 0.3
    elif n_rows > 1000 or n_cols > 50:
        dim = 0.7
    else:
        dim = 1.0
    return (header_score + dim) / 2


def _data_types(rows):
    if len(rows) < 2:
        return 0.5
    num_cols = max(len(r) for r in rows)
    consistent = 0
    for ci in range(num_cols):
        col = [
            str(r[ci]).strip()
            for r in rows[1:]
            if ci < len(r) and r[ci]
        ]
        if not col:
            continue
        numeric = sum(1 for v in col if _NUMERIC.match(v))
        if numeric > len(col) * 0.8 or numeric < len(col) * 0.2:
            consistent += 1
    return consistent / num_cols if num_cols > 0 else 0


def _size(rows):
    n_rows = len(rows)
    n_cols = len(rows[0]) if rows else 0
    if 2 <= n_rows <= 500 and 2 <= n_cols <= 30:
        return 1.0
    if n_rows < 2 or n_cols < 2:
        return 0.1
    if n_rows > 1000 or n_cols > 50:
        return 0.6
    return 0.8


def quality_score(rows: list[list[str]]) -> tuple[float, dict]:
    if not rows or len(rows) < 2:
        return 0.0, {"reason": "insufficient_data"}
    metrics = {
        "completeness": _completeness(rows),
        "consistency": _consistency(rows),
        "structure": _structure(rows),
        "data_types": _data_types(rows),
        "size_appropriateness": _size(rows),
    }
    return sum(metrics[k] * WEIGHTS[k] for k in metrics), metrics
