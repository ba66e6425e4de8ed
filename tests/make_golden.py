"""Generate committed golden fixtures from the refkernel oracle.

    python -m tests.make_golden

Writes tests/golden/pages_tiny.parquet (the 200-doc input corpus) and
tests/golden/golden_tiny.parquet (refkernel outputs). The Spark
pipeline test byte-compares against these (SURVEY.md §5.2 item 1).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from fixtures.gen_pages import write_parquet
from refkernel import extract_document

TINY_N = 200
PAGES = "tests/golden/pages_tiny.parquet"
GOLDEN = "tests/golden/golden_tiny.parquet"

TABLE_STRUCT = pa.struct([
    ("page", pa.int32()),
    ("table_index", pa.int32()),
    ("method", pa.string()),
    ("cells", pa.list_(pa.list_(pa.string()))),
    ("csv_bytes", pa.binary()),
    ("table_type", pa.string()),
    ("quality_score", pa.float64()),
    ("rows", pa.int32()),
    ("columns", pa.int32()),
    ("numeric_percentage", pa.float64()),
    ("empty_cell_percentage", pa.float64()),
    ("metadata", pa.map_(pa.string(), pa.string())),
    ("content_hash", pa.string()),
])
SPAN_STRUCT = pa.struct([
    ("kind", pa.string()),
    ("page", pa.int32()),
    ("start", pa.int32()),
    ("end", pa.int32()),
])
GOLDEN_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("n_pages", pa.int32()),
    ("extracted_text", pa.binary()),
    ("tables", pa.list_(TABLE_STRUCT)),
    ("spans", pa.list_(SPAN_STRUCT)),
])


def result_to_arrow_rows(results: list[dict]) -> pa.Table:
    def map_items(md: dict) -> list[tuple[str, str]]:
        return list(md.items())

    cols = {
        "url": [r["url"] for r in results],
        "n_pages": [r["n_pages"] for r in results],
        "extracted_text": [r["extracted_text"] for r in results],
        "tables": [
            [
                {**t, "metadata": map_items(t["metadata"])}
                for t in r["tables"]
            ]
            for r in results
        ],
        "spans": [r["spans"] for r in results],
    }
    return pa.table(cols, schema=GOLDEN_SCHEMA)


def main():
    write_parquet(PAGES, TINY_N, seed=42)
    pages = pq.read_table(PAGES)
    results = [
        extract_document(u.as_py(), h.as_py())
        for u, h in zip(pages["url"], pages["html"])
    ]
    pq.write_table(result_to_arrow_rows(results), GOLDEN)
    n_tables = sum(len(r["tables"]) for r in results)
    print(f"golden: {len(results)} urls, {n_tables} tables → {GOLDEN}")


if __name__ == "__main__":
    main()
