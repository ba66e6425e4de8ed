"""Single-thread kernel micro-bench over the committed golden corpus.

    python -m tools.perf_kernel [reps]

Prints docs/s/thread for the full kernel plus a stage split
(scan-only, scan+model). The Spark-level number is this × threads ×
(1 - steal); the per-round BENCH numbers come from bench.py.
"""

from __future__ import annotations

import sys
import time


def main(reps: int = 8) -> None:
    import pyarrow.parquet as pq

    from pdf_extraction_api_spark.kernel.batch import extract_one
    from pdf_extraction_api_spark.kernel.htmlscan import scan
    from pdf_extraction_api_spark.kernel.model import DocModel

    rows = pq.read_table("tests/golden/pages_tiny.parquet").to_pylist()
    texts = []
    for r in rows:
        try:
            texts.append(r["html"].decode("utf-8"))
        except UnicodeDecodeError:
            texts.append(r["html"].decode("latin-1"))

    class Noop:
        def handle_data(self, d):
            pass

        def handle_starttag(self, t, a):
            pass

        def handle_endtag(self, t):
            pass

    nm = Noop()
    for r in rows:  # warm
        extract_one(r["url"], r["html"])

    # process_time is steal-immune (this host's vCPU steal makes
    # wall-clock vary ±40% run to run); wall-clock is reported too.
    t0 = time.process_time()
    for _ in range(reps):
        for t in texts:
            scan(t, nm)
    t_scan = time.process_time() - t0

    t0 = time.process_time()
    for _ in range(reps):
        for t in texts:
            m = DocModel()
            scan(t, m)
            m.finish()
    t_model = time.process_time() - t0

    # best-of over several windows: the host's vCPU steal/IPC varies
    # ±40% minute to minute; the fastest window is the comparable
    # number (same convention as bench.py's min-of-reps)
    from pdf_extraction_api_spark.kernel import tablepipe

    best = float("inf")
    for _ in range(5):
        t0 = time.process_time()
        for _ in range(reps):
            # repeating the same 200 docs would drive the classify
            # memo to ~100% hits — clear it so the number reflects a
            # corpus of unique documents (intra-doc repeats still hit)
            tablepipe._CLS_CACHE.clear()
            for r in rows:
                extract_one(r["url"], r["html"])
        best = min(best, time.process_time() - t0)

    n = len(rows) * reps
    print(f"docs: {n} x5 windows")
    print(f"scan-only : {t_scan:.3f}s cpu")
    print(f"scan+model: {t_model:.3f}s cpu")
    print(f"full best : {best:.3f}s cpu = {n / best:.0f} docs/s/thread")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
