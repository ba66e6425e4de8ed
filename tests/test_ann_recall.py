"""ANN quality: recall@K of the IVF paths vs the brute-force baseline.

Two claims, separated:
1. On CLUSTERABLE data (tight synthetic clusters) the IVF probe finds
   nearly everything brute force finds — the operator is correct and
   the partition-pruned scan loses almost no recall when the data has
   the structure IVF assumes.
2. On the driver's near-isotropic embeddings the probe still beats the
   naive own-cluster scan (multi-probe dial) — documented floor, not a
   quality target, since no partitioning beats random geometry.
"""

from __future__ import annotations

import numpy as np
import pytest


def _recall(spark, sf, fn, truth):
    got = {(r.q_id, r.neighbor_id) for r in fn(spark, sf).collect()}
    return len(truth & got) / len(truth)


@pytest.fixture(scope="module")
def clustered_sf(spark, tmp_path_factory):
    """5 tight clusters in 16 dims; label == geometric cluster."""
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(5, 16)) * 3.0
    rows = []
    for vec_id in range(300):
        label = vec_id % 5
        v = centers[label] + rng.normal(size=16) * 0.15
        rows.append((vec_id, int(label),
                     [float(x) for x in v.astype(np.float32)]))
    df = spark.createDataFrame(
        rows, "vec_id LONG, label LONG, embedding ARRAY<FLOAT>")
    out = tmp_path_factory.mktemp("annrecall")
    df.write.mode("overwrite").parquet(str(out / "embeddings.parquet"))
    return str(out)


def test_ivf_recall_high_on_clusterable_data(spark, clustered_sf):
    from pdf_extraction_api_spark.operators.vectorops import (
        ann_ivf_kmeans,
        ann_ivf_label,
        ann_ivf_probe,
        ann_topk_brute,
    )

    truth = {(r.q_id, r.neighbor_id)
             for r in ann_topk_brute(spark, clustered_sf).collect()}
    assert truth
    assert _recall(spark, clustered_sf, ann_ivf_probe, truth) >= 0.9
    r_label = _recall(spark, clustered_sf, ann_ivf_label, truth)
    assert r_label >= 0.9
    # learned centroids must not lose recall vs the label-mean seed
    assert _recall(spark, clustered_sf, ann_ivf_kmeans, truth) >= r_label


def test_ivf_probe_beats_own_cluster_on_isotropic_data(spark):
    from pdf_extraction_api_spark.operators.vectorops import (
        ann_ivf_label,
        ann_ivf_probe,
        ann_topk_brute,
    )

    sf = "/root/testdata/sf0.001"
    truth = {(r.q_id, r.neighbor_id)
             for r in ann_topk_brute(spark, sf).collect()}
    assert truth
    r_probe = _recall(spark, sf, ann_ivf_probe, truth)
    r_label = _recall(spark, sf, ann_ivf_label, truth)
    assert r_probe >= r_label  # multi-probe can only widen the scan
