"""Per-query isolation bench (guide §1.4): times ONE query (or a list)
with the noop sink on the same session config as bench.py, and can dump
`.explain("formatted")` to plans/r08/.

NOT part of the driver contract — bench.py stays the frozen official
runner. This file exists so optimization work can (a) isolate a single
query's computation, (b) capture its physical plan before/after, and
(c) A/B at both sf0.1 and sf1.0 without paying the full 16-query loop.

Usage:
    python bench_extra.py dd_minhash_lsh dd_simhash          # time @ SF_DIR
    python bench_extra.py --explain before dd_minhash_lsh    # plans/r08/*_before.txt
    python bench_extra.py --all                              # every headline query
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py ...
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

HEADLINE = [
    "a11_grand_totals", "j1_packaging_join", "j2_range_join",
    "w1_row_number", "w3_topk", "d1_dedup_hash", "dd_minhash_lsh",
    "dd_simhash", "dd_embed_lsh", "ann_topk_brute", "tx_quality",
    "mm_image_metrics", "q5_local_supplier", "aj_asof_join",
    "ex4_flagship_rollup",
]


def main() -> None:
    args = [a for a in sys.argv[1:]]
    explain_tag = None
    if "--explain" in args:
        i = args.index("--explain")
        explain_tag = args[i + 1]
        del args[i:i + 2]
    if "--all" in args:
        args = HEADLINE

    import bench as B

    spark = B.make_session(B.CPUS)
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    out: dict[str, list[float]] = {}
    plans_dir = Path("plans/r08")
    try:
        for name in args:
            df = q[name](spark, SF_DIR)
            if explain_tag:
                plans_dir.mkdir(parents=True, exist_ok=True)
                txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
                (plans_dir / f"{name}_{explain_tag}.txt").write_text(txt)
            spark.sparkContext.setJobDescription(name)

            def run(d=df):
                d.write.format("noop").mode("overwrite").save()

            run()  # cold: codegen + footers + broadcasts
            reps = [B._timed(run) for _ in range(REPS)]
            out[name] = reps
            print(f"{name}: min={min(reps)} reps={reps}", flush=True)
            spark.sparkContext.setJobDescription(None)
    finally:
        spark.stop()
    print(json.dumps({"sf_dir": SF_DIR,
                      "mins": {k: min(v) for k, v in out.items()},
                      "reps": out}))


if __name__ == "__main__":
    main()
