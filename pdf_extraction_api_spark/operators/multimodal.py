"""Multimodal column plumbing: opaque binary payloads + typed metadata.

This module keeps the generic binary plumbing (BinaryType columns,
mapInPandas batch shapes, typed metadata structs, frame-sampling UDTF
expansion) with a deterministic decode stub (`_fake_decode`) for
formats this container genuinely cannot decode. The REAL decode paths
live next door: `operators/imageops.py` (pure-stdlib PNG codec + numpy
metrics/enhance/resize) and `operators/audioops.py` (stdlib WAV decode
+ numpy features) — swap `_fake_decode` for PIL/cv2/ffmpeg on a
cluster that has them; nothing else changes.

mm_binary_meta has a full DuckDB oracle (pure byte-level ops);
mm_decode_stub / mm_frame_sample are rows-only (Python batch logic).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .relational import T

if TYPE_CHECKING:
    import pandas as pd


def _payloads(spark, sf):
    """documents.text encoded as the stand-in binary payload column."""
    return T(spark, sf, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload"))


def mm_binary_meta(spark, sf):
    """Typed metadata over a binary column — stays fully JVM-side."""
    p = _payloads(spark, sf)
    return p.select(
        "doc_id",
        F.length("payload").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
        F.upper(F.substring(F.hex("payload"), 1, 16)).alias("head_hex"),
    )


# DuckDB md5 takes VARCHAR (hashes its UTF-8 bytes — same bytes as the
# Spark-side BINARY payload); hex case differs between engines → upper()
MM_META_SQL = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS content_md5,
       upper(substring(hex(encode(text)), 1, 16)) AS head_hex
FROM documents
"""

_DECODE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("mode", StringType()),
])


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic decode STUB. Real deployment:

        raise NotImplementedError("install pillow and decode here")

    Here: fake dimensions derived from payload bytes so the batch
    plumbing is exercised end-to-end and assertable."""
    n = len(payload)
    return 16 + n % 640, 16 + (n * 7) % 480, "RGB" if n % 2 else "L"


def _decode_batches(
    batches: Iterator["pd.DataFrame"],
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    for pdf in batches:
        w, h, m, nb = [], [], [], []
        for payload in pdf["payload"].values:
            payload = payload if payload is not None else b""
            fw, fh, fm = _fake_decode(payload)
            nb.append(len(payload))
            w.append(fw)
            h.append(fh)
            m.append(fm)
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"].values,
            "n_bytes": nb, "width": w, "height": h, "mode": m,
        })


def mm_decode_stub(spark, sf):
    """Decode/feature-extract over binary payloads via mapInPandas
    (Arrow-batched; the N1-N5 pandas-UDF shape from SURVEY.md §2.8)."""
    return _payloads(spark, sf).mapInPandas(
        _decode_batches, schema=_DECODE_SCHEMA)


_FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_no", IntegerType()),
    StructField("frame_bytes", BinaryType()),
])


def _frame_batches(
    batches: Iterator["pd.DataFrame"],
) -> Iterator["pd.DataFrame"]:
    """UDTF-shaped expansion: N deterministic 'frames' per payload
    (video frame-sampling stand-in; 1 row in → k rows out)."""
    import pandas as pd

    for pdf in batches:
        ids, nos, frames = [], [], []
        for doc_id, payload in zip(pdf["doc_id"].values,
                                   pdf["payload"].values):
            payload = payload if payload is not None else b""
            k = min(3, max(1, len(payload) // 100))
            step = max(1, len(payload) // max(k, 1))
            for i in range(k):
                ids.append(doc_id)
                nos.append(i)
                frames.append(payload[i * step:i * step + 16])
        yield pd.DataFrame(
            {"doc_id": ids, "frame_no": nos, "frame_bytes": frames})


def mm_frame_sample(spark, sf):
    # frame bytes surfaced as an md5 hex digest: the binary plumbing
    # (BinaryType through Arrow, 1→k row expansion) stays real, but
    # the query's output columns are plain strings the driver's hash
    # harness can canonicalize.
    df = _payloads(spark, sf).mapInPandas(
        _frame_batches, schema=_FRAME_SCHEMA)
    return df.select("doc_id", "frame_no",
                     F.md5("frame_bytes").alias("frame_md5"))


QUERIES = {
    "mm_binary_meta": (mm_binary_meta, MM_META_SQL),
    "mm_decode_stub": (mm_decode_stub, None),
    "mm_frame_sample": (mm_frame_sample, None),
}
