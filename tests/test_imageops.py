"""Image path (N1-N5): PNG codec round-trips + metric properties.

The codec must decode what it encodes byte-exactly, decode all five
scanline filters, and the metric formulas must match the reference's
math (enterprise_image_extractor.py:319-411) on constructed images
with independently-known statistics."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from pdf_extraction_api_spark.kernel import png as pngc
from pdf_extraction_api_spark.operators.imageops import (
    _gen_image,
    compute_metrics,
    enhance,
    estimate_lines,
)


@pytest.mark.parametrize("shape", [(1, 1), (5, 7), (48, 64), (33, 17, 3)])
def test_png_roundtrip(shape):
    rng = np.random.default_rng(42)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = pngc.decode(pngc.encode(arr))
    assert out.shape == arr.shape
    assert (out == arr).all()


def _encode_with_filter(arr: np.ndarray, ftype: int) -> bytes:
    """Hand-rolled encoder emitting every scanline with filter `ftype`
    (exercises the decoder's unfilter paths independently)."""
    h, w = arr.shape
    ch = 1
    lines = bytearray()
    prev = np.zeros(w, dtype=np.int32)
    for y in range(h):
        cur = arr[y].astype(np.int32)
        if ftype == 0:
            enc = cur.copy()
        elif ftype == 1:
            enc = cur.copy()
            enc[ch:] = (cur[ch:] - cur[:-ch]) % 256
        elif ftype == 2:
            enc = (cur - prev) % 256
        elif ftype == 3:
            enc = cur.copy()
            for i in range(w):
                a = int(cur[i - ch]) if i >= ch else 0
                enc[i] = (int(cur[i]) - ((a + int(prev[i])) >> 1)) % 256
        else:  # Paeth
            enc = cur.copy()
            for i in range(w):
                a = int(cur[i - ch]) if i >= ch else 0
                c = int(prev[i - ch]) if i >= ch else 0
                enc[i] = (int(cur[i]) - pngc._paeth(a, int(prev[i]), c)) % 256
        lines.append(ftype)
        lines.extend(int(v) for v in enc)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + pngc._chunk(b"IHDR", ihdr)
            + pngc._chunk(b"IDAT", zlib.compress(bytes(lines)))
            + pngc._chunk(b"IEND", b""))


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_decode_all_filters(ftype):
    rng = np.random.default_rng(7 + ftype)
    arr = rng.integers(0, 256, size=(9, 13), dtype=np.uint8)
    out = pngc.decode(_encode_with_filter(arr, ftype))
    assert (out == arr).all()


def test_metrics_flat_image():
    """Flat gray: zero sharpness/contrast/edges, perfect noise score,
    brightness by distance from 127.5 — the reference formulas."""
    arr = np.full((100, 100), 127, dtype=np.uint8)
    m = compute_metrics(arr)
    assert m["sharpness"] == 0.0
    assert m["contrast"] == 0.0
    assert m["edge_density"] == 0.0
    assert m["noise"] == 1.0
    assert m["brightness"] == pytest.approx(1.0 - 0.5 / 127.5)
    # resolution bucket: 10k px < 320*240 → 0.2
    assert m["resolution_score"] == 0.2
    assert m["quality_score"] == pytest.approx(
        0.3 * 0.2 + 0.2 * m["brightness"] + 0.1 * 1.0)


def test_metrics_checkerboard_maximal_contrast():
    yy, xx = np.mgrid[0:64, 0:64]
    arr = (((yy + xx) % 2) * 255).astype(np.uint8)
    m = compute_metrics(arr)
    assert m["contrast"] == 1.0          # std = 127.5 exactly
    assert m["sharpness"] == 1.0         # Laplacian variance >> 1000
    assert m["edge_density"] > 0.9
    assert m["brightness"] == pytest.approx(1.0)  # mean 127.5


def test_estimate_lines_counts_grid():
    arr = np.full((60, 60), 255, dtype=np.uint8)
    arr[::10, :] = 0  # 6 horizontal rules
    arr[:, ::12] = 0  # 5 vertical rules
    rows, cols = estimate_lines(arr)
    # each rule excites edge rows above and below it; the property that
    # matters: both orientations detected, horizontals > verticals
    assert rows >= 6
    assert cols >= 5


def test_enhance_changes_charts_not_flat_photos():
    _, chart = _gen_image(1)  # doc 1 → chart kind per _KINDS order
    assert (enhance(chart, "chart") != chart).any()
    flat = np.full((40, 40), 127, dtype=np.uint8)
    # photograph at mid brightness: no branch fires → unchanged
    assert (enhance(flat, "photograph") == flat).all()


def test_image_queries_deterministic_spark(spark):
    from pdf_extraction_api_spark.operators.imageops import (
        mm_image_metrics,
    )

    sf = "/root/testdata/sf0.001"
    rows_a = mm_image_metrics(spark, sf).collect()
    a = sorted(map(tuple, rows_a))
    b = sorted(map(tuple, mm_image_metrics(spark, sf).collect()))
    assert a == b
    assert len(a) > 0
    # enhancement digests ride the same (merged) query now:
    # charts/diagrams/tables/screenshots are always enhanced; flat-ish
    # photographs may pass through — so most rows change but not all
    changed = sum(1 for r in rows_a if r.changed == "true")
    assert changed >= len(rows_a) * 0.6
    assert all(r.orig_md5 != r.enhanced_md5 for r in rows_a
               if r.changed == "true")


def test_image_ahash_buckets(spark):
    """aHash collapses the genuinely identical synthetic images
    (table_image/diagram pixels depend only on (h, w)) and every
    bucket's keeper is its minimum doc_id."""
    from pdf_extraction_api_spark.operators.imageops import dd_image_ahash

    rows = dd_image_ahash(spark, "/root/testdata/sf0.001").collect()
    assert rows
    assert all(len(r["ahash"]) == 64 and set(r["ahash"]) <= {"0", "1"}
               for r in rows)
    assert any(r["n_copies"] > 1 for r in rows)  # real dups collapse
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(
        "/root/testdata/sf0.001/documents.parquet").num_rows
    # buckets partition the corpus (every doc lands in exactly one)
    assert sum(r["n_copies"] for r in rows) == n_docs


def test_image_ahash_matches_direct_numpy(spark):
    """Signature recomputed independently from the generated array
    (no PNG round-trip) must equal the operator's decoded-path hash."""
    import numpy as np

    from pdf_extraction_api_spark.operators.imageops import (
        _gen_image, dd_image_ahash)

    sigs = {}
    for r in dd_image_ahash(spark, "/root/testdata/sf0.001").collect():
        sigs.setdefault(r["ahash"], set())
    # recompute for every doc and check membership in the bucket keys
    for doc_id in range(50):
        _, arr = _gen_image(doc_id)
        if arr.ndim == 3:
            a = arr.astype(np.int64)
            luma = (a[:, :, 0] * 299 + a[:, :, 1] * 587
                    + a[:, :, 2] * 114) // 1000
        else:
            luma = arr.astype(np.int64)
        h, w = luma.shape
        ts, tn = int(luma.sum()), h * w
        byi = (np.arange(h) * 8) // h
        bxi = (np.arange(w) * 8) // w
        bid = (byi[:, None] * 8 + bxi[None, :]).ravel()
        bs = np.bincount(bid, weights=luma.ravel(),
                         minlength=64).astype(np.int64)
        bn = np.bincount(bid, minlength=64)
        sig = "".join(np.where(bs * tn > ts * bn, "1", "0"))
        assert sig in sigs, doc_id


def test_fused_report_matches_unfused():
    """r8 plan fusion guard: fused_report (shared gray/edge
    intermediates, decode skipped) must produce the EXACT row the
    pre-r8 pipeline produced — decode(blob), then compute_metrics +
    estimate_lines + ocr_stub + enhance, each recomputing its own
    intermediates. Exercises all five kinds x gray/RGB."""
    import hashlib

    from pdf_extraction_api_spark.operators.imageops import (
        fused_report,
        ocr_stub,
    )

    for doc_id in range(20):
        kind, arr = _gen_image(doc_id)
        blob = pngc.encode(arr)
        dec = pngc.decode(blob)
        m = compute_metrics(dec)
        er, ec = estimate_lines(dec)
        enh = pngc.encode(enhance(dec, kind))
        expected = {
            "doc_id": doc_id, "img_kind": kind,
            "width": m["width"], "height": m["height"],
            "quality_score": round(m["quality_score"], 6),
            "sharpness": round(m["sharpness"], 6),
            "contrast": round(m["contrast"], 6),
            "brightness": round(m["brightness"], 6),
            "noise": round(m["noise"], 6),
            "edge_density": round(m["edge_density"], 6),
            "est_rows": er, "est_cols": ec,
            "has_text": "true" if ocr_stub(dec, kind) else "false",
            "orig_md5": hashlib.md5(blob).hexdigest(),
            "enhanced_md5": hashlib.md5(enh).hexdigest(),
            "changed": "true" if enh != blob else "false",
        }
        assert fused_report(doc_id, kind, arr, blob) == expected
