"""Adversarial-corpus byte-parity: engine kernel ⇔ refkernel on the
malformed-crawl generator (fixtures/gen_pages_hard.py) — deep nesting,
unterminated constructs, rawtext traps, mixed encodings. Pure Python
(no Spark): this is the north-star invariant at its hardest."""

from __future__ import annotations

import pytest

from fixtures.gen_pages_hard import gen_hard_rows
from pdf_extraction_api_spark.kernel.batch import extract_one
from refkernel.extract import extract_document


def _norm(res: dict) -> tuple:
    return (
        res["n_pages"], res["extracted_text"],
        tuple(
            tuple(sorted(
                (k, tuple(map(tuple, v)) if k == "cells" else
                 tuple(sorted(v.items())) if k == "metadata" else v)
                for k, v in t.items()))
            for t in res["tables"]),
        tuple(tuple(sorted(s.items())) for s in res["spans"]),
    )


@pytest.mark.parametrize("seed", [1042, 7777])
def test_hard_corpus_byte_parity(seed):
    for r in gen_hard_rows(400, seed=seed):
        eng = extract_one(r["url"], r["html"])
        ref = extract_document(r["url"], r["html"])
        assert _norm(eng) == _norm(ref), r["url"]
