"""Grouped custom ops via applyInPandas (the per-group kernel shape).

`vec_centroid_by_label` — per-cluster embedding centroid computed with
numpy inside applyInPandas (the grouped-map UDF surface; at scale this
is the k-means update step / IVF coarse-quantizer training). Oracle:
per-dimension AVG via position explode in SQL — so even the grouped
Python path is value-checked against an independent engine.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

from .relational import T

if TYPE_CHECKING:
    import pandas as pd

_CENTROID_SCHEMA = StructType([
    StructField("label", IntegerType()),
    StructField("dim", IntegerType()),
    StructField("centroid", DoubleType()),
])


def _centroid(pdf: "pd.DataFrame") -> "pd.DataFrame":
    import numpy as np
    import pandas as pd

    mat = np.stack(pdf["embedding"].values).astype("float64")
    mean = np.round(mat.mean(axis=0), 6)
    label = int(pdf["label"].iloc[0])
    return pd.DataFrame({
        "label": [label] * mat.shape[1],
        "dim": list(range(mat.shape[1])),
        "centroid": mean,
    })


def vec_centroid_by_label(spark, sf):
    e = T(spark, sf, "embeddings").select("label", "embedding")
    return e.groupBy("label").applyInPandas(
        _centroid, schema=_CENTROID_SCHEMA)


# float32→float64 promotion order matters: the oracle must average the
# same float64 values numpy sees (cast each element, then avg)
VEC_CENTROID_SQL = """
SELECT label, CAST(pos AS INT) AS dim,
       CAST(round(avg(CAST(embedding[pos + 1] AS DOUBLE)), 6) AS DOUBLE)
         AS centroid
FROM embeddings,
     LATERAL (SELECT unnest(range(len(embedding))) AS pos) t
GROUP BY label, pos
"""


QUERIES = {
    "vec_centroid_by_label": (vec_centroid_by_label, VEC_CENTROID_SQL),
}
