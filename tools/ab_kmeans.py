"""Alternating A/B timer for the kmeans-consumer queries at sf0.1.

Usage: python -m tools.ab_kmeans [reps]
Times ann_ivf_kmeans + dd_semdedup end-to-end (build + collect) per
rep on one shared local[32] session; prints per-rep seconds and the
min. Run before/after a plan change in the SAME window (host steal
swings wall 2x — only same-window alternation is honest).
"""
import sys
import time

from pdf_extraction_api_spark.operators import curation, vectorops

SF = "/root/testdata/sf0.1"


def main():
    from bench import make_session

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = make_session(32)
    out = {}
    for name, fn in [("ann_ivf_kmeans", vectorops.ann_ivf_kmeans),
                     ("dd_semdedup", curation.dd_semdedup)]:
        times = []
        for _ in range(reps):
            t0 = time.monotonic()
            df = fn(spark, SF)
            n = df.count()
            times.append(round(time.monotonic() - t0, 3))
        out[name] = (times, n)
    for name, (times, n) in out.items():
        print(f"{name}: rows={n} reps={times} min={min(times)}")


if __name__ == "__main__":
    main()
