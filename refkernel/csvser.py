"""Deterministic CSV byte serializer (KERNEL_SPEC.md §4.7).

Owned by us — never ``pandas.to_csv`` — so byte-equality cannot drift
with library versions (SURVEY.md §7 hard part #1). QUOTE_MINIMAL
semantics: quote iff the field contains one of ``, " \\n \\r``; quotes
doubled; rows joined by ``\\n`` with a trailing newline; UTF-8.
"""

from __future__ import annotations

_SPECIAL = (",", '"', "\n", "\r")


def _field(s: str) -> str:
    if any(ch in s for ch in _SPECIAL):
        return '"' + s.replace('"', '""') + '"'
    return s


def csv_bytes(rows: list[list[str]]) -> bytes:
    lines = [",".join(_field(c) for c in row) for row in rows]
    return ("\n".join(lines) + "\n").encode("utf-8")
