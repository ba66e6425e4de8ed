"""Cell cleaning and table validity (KERNEL_SPEC.md §4.1-4.2).

Semantics of /root/reference/enterprise_table_extractor_full.py:747-795
(_clean_table_data, _is_valid_table), with the deterministic modal rule
replacing ``max(set(xs), key=xs.count)``.
"""

from __future__ import annotations

import re

_WS = re.compile(r"\s+")


def norm_text(s: str) -> str:
    """Collapse whitespace runs to a single space and strip."""
    return _WS.sub(" ", s).strip()


def clean_cell(cell) -> str:
    if cell is None:
        return ""
    s = str(cell).strip()
    s = _WS.sub(" ", s)
    s = "".join(ch for ch in s if ch.isprintable())
    return s.replace("\n", " ").replace("\r", " ")


def clean_table(rows: list[list]) -> list[list[str]]:
    cleaned = []
    for row in rows:
        crow = [clean_cell(c) for c in row]
        if any(crow):
            cleaned.append(crow)
    return cleaned


def modal_count(counts: list[int]) -> int:
    """Smallest value among those with maximal multiplicity."""
    return max(sorted(set(counts)), key=counts.count)


def is_valid_table(rows: list[list]) -> bool:
    if not rows or len(rows) < 2:
        return False
    total = sum(len(r) for r in rows)
    non_empty = sum(1 for r in rows for c in r if c and str(c).strip())
    if total == 0 or non_empty / total < 0.2:
        return False
    counts = [len(r) for r in rows]
    m = modal_count(counts)
    if sum(1 for c in counts if c == m) / len(rows) < 0.5:
        return False
    return True
