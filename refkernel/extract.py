"""Per-document extraction — the semantics oracle (KERNEL_SPEC.md).

Single-threaded, dependency-light reimplementation of the *intended*
behavior of /root/reference/enterprise_table_extractor_full.py's
page pipeline (_process_page :567-633, _save_table :815-932 — repaired,
quirk #1) re-targeted onto HTML pages, plus the graft-mandated
boilerplate strip (BASELINE.json north_star). Golden fixtures are
generated from this module; the Spark kernel must match it byte-
for-byte per url.
"""

from __future__ import annotations

import hashlib
import json
import math

from .classify import classify_table
from .csvser import csv_bytes
from .htmlmodel import block_kind, parse_html
from .quality import quality_score
from .textnorm import clean_table, is_valid_table

METHOD_ORDER = ["lattice", "stream"]


def _numeric_cell(cell: str) -> bool:
    s = cell.strip()
    if not s or "_" in s:
        return False
    try:
        return not math.isnan(float(s))
    except ValueError:
        return False


def _meta_to_strings(md: dict) -> dict[str, str]:
    out = {}
    for k, v in md.items():
        if v is None:
            out[k] = ""
        elif isinstance(v, bool):
            out[k] = "true" if v else "false"
        elif isinstance(v, list):
            out[k] = json.dumps(v)
        else:
            out[k] = str(v)
    return out


def content_hash(cleaned: list[list[str]]) -> str:
    payload = json.dumps(cleaned, sort_keys=True)
    return hashlib.md5(payload.encode()).hexdigest()


def _emit_table(page: int, index: int, method: str,
                cleaned: list[list[str]], qscore: float,
                ttype: str, tmeta: dict, chash: str) -> dict | None:
    if not cleaned:
        return None
    max_cols = max(len(r) for r in cleaned)
    padded = [r + [""] * (max_cols - len(r)) for r in cleaned]
    header, body = padded[0], padded[1:]
    csvb = csv_bytes([header] + body)
    body_cells = len(body) * max_cols
    numeric = sum(1 for r in body for c in r if _numeric_cell(c))
    empty = sum(1 for r in body for c in r if c == "")
    return {
        "page": page,
        "table_index": index,
        "method": method,
        "cells": padded,
        "csv_bytes": csvb,
        "table_type": ttype,
        "quality_score": qscore,
        "rows": len(body),
        "columns": max_cols,
        "numeric_percentage": numeric / body_cells if body_cells else 0.0,
        "empty_cell_percentage": empty / body_cells if body_cells else 0.0,
        "metadata": _meta_to_strings(tmeta),
        "content_hash": chash,
    }


def extract_document(url: str, html: bytes) -> dict:
    items, n_pages = parse_html(html)

    # --- text stream, spans, extracted_text ---------------------------
    spans: list[dict] = []
    content_parts: list[str] = []
    cursors: dict[int, int] = {}

    def advance(page: int, kind: str, text: str):
        start = cursors.get(page, 0)
        end = start + len(text)
        spans.append({"kind": kind, "page": page, "start": start,
                      "end": end})
        cursors[page] = end + 1

    for item in items:
        if item[0] == "block":
            _, page, kind, text = item
            advance(page, kind, text)
            if kind == "content":
                content_parts.append(text)
        else:
            _, page, _method, _raw, cell_texts = item
            for row in cell_texts:
                for cell in row:
                    if cell:
                        advance(page, "table_cell", cell)

    extracted_text = "\n\n".join(content_parts).encode("utf-8")

    # --- per-page table pipeline --------------------------------------
    # group raw tables per page per method, preserving document order
    by_page: dict[int, dict[str, list[list[list[str]]]]] = {}
    for item in items:
        if item[0] != "table":
            continue
        _, page, method, raw, _cells = item
        by_page.setdefault(page, {m: [] for m in METHOD_ORDER})
        by_page[page][method].append(raw)

    tables: list[dict] = []
    for page in sorted(by_page):
        candidates: list[dict] = []
        for method in METHOD_ORDER:
            for raw in by_page[page][method]:
                if not is_valid_table(raw):
                    continue
                cleaned = clean_table(raw)
                qscore, _metrics = quality_score(cleaned)
                ttype, tmeta = classify_table(cleaned)
                candidates.append({
                    "index": len(candidates) + 1,
                    "method": method,
                    "cleaned": cleaned,
                    "qscore": qscore,
                    "ttype": ttype,
                    "tmeta": tmeta,
                    "hash": content_hash(cleaned),
                })
        seen: set[str] = set()
        for c in candidates:
            if c["hash"] in seen:
                continue
            seen.add(c["hash"])
            row = _emit_table(page, c["index"], c["method"], c["cleaned"],
                              c["qscore"], c["ttype"], c["tmeta"],
                              c["hash"])
            if row is not None:
                tables.append(row)

    return {
        "url": url,
        "n_pages": n_pages,
        "extracted_text": extracted_text,
        "tables": tables,
        "spans": spans,
    }


__all__ = ["extract_document", "content_hash", "block_kind"]
