"""Arrow-batched extraction kernel — the `mapInPandas` UDTF shape
(SURVEY.md §2.9 #1).

One row in → one row out with nested results; vectorized transport
(Arrow), scalar byte-exact semantics (Python str ops, KERNEL_SPEC.md).
The html column travels as BinaryType end-to-end so byte-identity is
never at the mercy of UTF-8 normalization (SURVEY.md §7 hard part #1).

Per-batch counters are accumulated locally and attached to each output
batch (partition lineage goes through the audit path, plans/audit.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from .model import parse_document
from .tablepipe import page_tables

if TYPE_CHECKING:
    import pandas as pd

TABLE_TYPE = StructType([
    StructField("page", IntegerType()),
    StructField("table_index", IntegerType()),
    StructField("method", StringType()),
    StructField("cells", ArrayType(ArrayType(StringType()))),
    StructField("csv_bytes", BinaryType()),
    StructField("table_type", StringType()),
    StructField("quality_score", DoubleType()),
    StructField("rows", IntegerType()),
    StructField("columns", IntegerType()),
    StructField("numeric_percentage", DoubleType()),
    StructField("empty_cell_percentage", DoubleType()),
    StructField("metadata", MapType(StringType(), StringType())),
    StructField("content_hash", StringType()),
])

SPAN_TYPE = StructType([
    StructField("kind", StringType()),
    StructField("page", IntegerType()),
    StructField("start", IntegerType()),
    StructField("end", IntegerType()),
])

RESULT_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("n_pages", IntegerType()),
    StructField("extracted_text", BinaryType()),
    StructField("tables", ArrayType(TABLE_TYPE)),
    StructField("spans", ArrayType(SPAN_TYPE)),
    StructField("n_tables", IntegerType()),
    StructField("n_content_spans", IntegerType()),
    StructField("error", StringType()),
])


def extract_one(url: str, html: bytes) -> dict:
    """Full per-document extraction (engine implementation)."""
    m = parse_document(html if html is not None else b"")
    tables: list[dict] = []
    for page in sorted(m.tables):
        slot = m.tables[page]
        tables.extend(page_tables(page, slot["lattice"], slot["stream"]))
    spans = [
        {"kind": k, "page": p, "start": s, "end": e}
        for (k, p, s, e) in m.spans
    ]
    n_content = sum(1 for s in m.spans if s[0] == "content")
    return {
        "url": url,
        "n_pages": m.max_page,
        "extracted_text": "\n\n".join(m.content).encode("utf-8"),
        "tables": tables,
        "spans": spans,
        "n_tables": len(tables),
        "n_content_spans": n_content,
        "error": None,
    }


# html-bytes → result memo (everything except `url`, which is a pure
# pass-through key). Crawl corpora carry exact-duplicate bodies under
# different urls (6.9% on the synthetic bench corpus; 20-40% on real
# crawls), and the kernel is a pure function of the bytes, so repeats
# skip the parse entirely. Per worker process (reused across Arrow
# batches); mega-docs excluded to bound entry size. Bounded BOTH by
# entry count and by an input-bytes budget (result size tracks input
# size) — the count cap alone admitted a ~256 MiB/worker worst case
# (1024 x 256 KiB bodies), too much times 1000 executors. Cached
# values are shared read-only references — nothing downstream mutates
# a result row after extract_one.
_RESULT_MEMO: dict[bytes, dict] = {}
_RESULT_MEMO_CAP = 1024
_RESULT_MEMO_MAX_DOC = 1 << 18       # don't cache >256 KiB bodies
_RESULT_MEMO_MAX_BYTES = 32 << 20    # FIFO-evict past 32 MiB of keys
_memo_bytes = 0


def memo_get(key: bytes) -> dict | None:
    return _RESULT_MEMO.get(key)


def memo_put(key: bytes, row: dict) -> None:
    """FIFO-bounded insert under both caps; oversized bodies skipped."""
    global _memo_bytes
    if len(key) > _RESULT_MEMO_MAX_DOC:
        return
    while _RESULT_MEMO and (
            len(_RESULT_MEMO) >= _RESULT_MEMO_CAP
            or _memo_bytes + len(key) > _RESULT_MEMO_MAX_BYTES):
        oldest = next(iter(_RESULT_MEMO))
        del _RESULT_MEMO[oldest]
        _memo_bytes -= len(oldest)
    _RESULT_MEMO[key] = row
    _memo_bytes += len(key)


def extract_batches(
    batches: Iterator["pd.DataFrame"],
) -> Iterator["pd.DataFrame"]:
    """mapInPandas entry: (url, html[, ...]) batches → RESULT_SCHEMA."""
    import pandas as pd

    cols = [f.name for f in RESULT_SCHEMA.fields]
    body_cols = [c for c in cols if c != "url"]
    for pdf in batches:
        out: dict[str, list] = {c: [] for c in cols}
        for url, html in zip(pdf["url"].values, pdf["html"].values):
            key = bytes(html) if html is not None else b""
            row = memo_get(key)
            if row is None:
                try:
                    row = extract_one(url, html)
                except Exception as exc:  # never fail the task on one doc
                    row = {
                        "url": url, "n_pages": 0, "extracted_text": b"",
                        "tables": [], "spans": [], "n_tables": 0,
                        "n_content_spans": 0,
                        "error": f"{type(exc).__name__}: {exc}",
                    }
                memo_put(key, row)
            out["url"].append(url)
            for c in body_cols:
                out[c].append(row[c])
        yield pd.DataFrame(out, columns=cols)
