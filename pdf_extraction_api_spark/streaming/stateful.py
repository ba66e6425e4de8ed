"""Custom stateful streaming operator: cross-batch first-seen filter.

A continuously-landing crawl re-fetches urls; downstream extraction
must process each url exactly once ACROSS microbatches, not just within
one. This is the `applyInPandasWithState` shape (SURVEY.md §2.10 noted
it for future streaming work): keyed state = urls already emitted for
that key group; re-arrivals are dropped. State is checkpointed with the
query, so restarts keep the dedup guarantee.

At scale the key is a url-hash bucket (bounded state per group, tunable
fan-out) rather than the raw url — one state row per bucket holding a
set digest, not one per url.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

N_BUCKETS = 64

OUT_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("bucket", LongType()),
])
STATE_SCHEMA = StructType([
    StructField("seen", StringType()),  # '\n'-joined sorted urls
])


def _first_seen(
    key: tuple[Any, ...],
    pdfs: Iterator["pd.DataFrame"],
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    seen: set[str] = set()
    if state.exists:
        (blob,) = state.get
        if blob:
            seen = set(blob.split("\n"))
    fresh: list[str] = []
    for pdf in pdfs:
        for url in pdf["url"].values:
            if url not in seen:
                seen.add(url)
                fresh.append(url)
    state.update(("\n".join(sorted(seen)),))
    yield pd.DataFrame({"url": fresh, "bucket": [key[0]] * len(fresh)})


def first_seen_stream(pages_stream: DataFrame) -> DataFrame:
    """urls never emitted before, exactly once across all batches."""
    keyed = pages_stream.select(
        "url", (F.abs(F.xxhash64("url")) % N_BUCKETS).alias("bucket"))
    return keyed.groupBy("bucket").applyInPandasWithState(
        _first_seen,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_GAP_MIN = 30

SESSION_OUT = StructType([
    StructField("user_id", LongType()),
    StructField("session_no", LongType()),
    StructField("start_us", LongType()),
    StructField("end_us", LongType()),
    StructField("n_events", LongType()),
    StructField("session_value", StringType()),  # %.2f — hash-stable
])
# open-session state: epoch-microsecond timestamps (LongType avoids
# tz/codec ambiguity in the state store)
SESSION_STATE = StructType([
    StructField("session_no", LongType()),
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n_events", LongType()),
    StructField("value_sum", StringType()),  # repr(float) round-trip
])


def _sessionize(
    key: tuple[Any, ...],
    pdfs: Iterator["pd.DataFrame"],
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    """Gap-based sessionization with cross-batch state: a session
    CLOSES (and is emitted) when a later event of the same user
    arrives more than SESSION_GAP_MIN after the previous one; the
    still-open session lives in the state store and survives
    restarts. Events are processed in event-time order within the
    available data (same total order as ev_sessionize's window)."""
    import pandas as pd

    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    if state.exists:
        sess_no, start_us, last_us, n_ev, vsum_s = state.get
        vsum = float(vsum_s)
        open_sess = True
    else:
        sess_no, start_us, last_us, n_ev, vsum = 0, 0, 0, 0, 0.0
        open_sess = False
    closed: list[tuple] = []
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"])
    for ts, val in zip(rows["ts"].values, rows["value"].values):
        t_us = int(pd.Timestamp(ts).value // 1000)
        if open_sess and t_us - last_us > gap_us:
            closed.append(
                (key[0], sess_no, start_us, last_us, n_ev,
                 f"{vsum:.2f}"))
            open_sess = False
        if not open_sess:
            sess_no += 1
            start_us, n_ev, vsum = t_us, 0, 0.0
            open_sess = True
        last_us = t_us
        n_ev += 1
        vsum += float(val)
    state.update((sess_no, start_us, last_us, n_ev, repr(vsum)))
    yield pd.DataFrame(
        closed, columns=[f.name for f in SESSION_OUT.fields])


def sessionize_stream(events_stream: DataFrame) -> DataFrame:
    """Closed sessions per user (gap > SESSION_GAP_MIN), exactly once
    across microbatches; the open tail stays in keyed state."""
    keyed = events_stream.select("user_id", "event_id", "ts", "value")
    return keyed.groupBy("user_id").applyInPandasWithState(
        _sessionize,
        outputStructType=SESSION_OUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming HyperLogLog: constant-state distinct counting --------
# The streaming form of operators/curation.py:sk_hll_distinct — the
# state per key is the 16 HLL registers (a few bytes, REGARDLESS of
# how many distinct values stream past), updated by MAX per batch.
# The cross-batch MAX is exactly the batch sketch's register build,
# so after the final microbatch the running estimate is row-equal to
# the batch operator's (pinned by test_stateful_stream.py).

HLL_OUT = StructType([
    StructField("source", StringType()),
    StructField("n_seen", LongType()),    # cumulative rows observed
    StructField("n_est", StringType()),   # %.4f — hash-stable
])
HLL_STATE = StructType([
    StructField("regs", StringType()),    # ','-joined 16 registers
    StructField("n_seen", LongType()),
])


def _hll_update(
    key: tuple[Any, ...],
    pdfs: Iterator["pd.DataFrame"],
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    from ..operators.curation import (
        _HLL_REM_BITS,
        _HLL_RMAX,
        HLL_ALPHA,
        HLL_M,
    )

    regs = [0] * HLL_M
    n_seen = 0
    if state.exists:
        blob, n_seen = state.get
        regs = [int(x) for x in blob.split(",")]
    for pdf in pdfs:
        for h in pdf["h"].values:
            h = int(h)
            n_seen += 1
            b = h >> _HLL_REM_BITS
            rem = h & ((1 << _HLL_REM_BITS) - 1)
            rank = (_HLL_RMAX if rem == 0
                    else _HLL_REM_BITS - rem.bit_length() + 1)
            if rank > regs[b]:
                regs[b] = rank
    state.update((",".join(map(str, regs)), n_seen))
    s = sum(1 << (_HLL_RMAX - r) for r in regs)
    n_zero = sum(r == 0 for r in regs)
    e_raw = HLL_ALPHA * HLL_M * HLL_M * float(1 << _HLL_RMAX) / s
    if e_raw <= 2.5 * HLL_M and n_zero > 0:
        import math

        est = HLL_M * math.log(HLL_M / n_zero)
    else:
        est = e_raw
    yield pd.DataFrame({"source": [key[0]], "n_seen": [n_seen],
                        "n_est": [f"{round(est, 4):.4f}"]})


def hll_stream(docs_stream: DataFrame) -> DataFrame:
    """Running distinct-text estimate per source, constant state."""
    keyed = docs_stream.select(
        "source",
        F.conv(F.substring(F.md5("text"), 1, 15), 16, 10)
        .cast("long").alias("h"))
    return keyed.groupBy("source").applyInPandasWithState(
        _hll_update,
        outputStructType=HLL_OUT,
        stateStructType=HLL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CMS_OUT = StructType([
    StructField("source", StringType()),
    StructField("n_toks", LongType()),
    StructField("grid", StringType()),  # ','-joined CMS_D*CMS_W cells
])
CMS_STATE = StructType([
    StructField("grid", StringType()),
    StructField("n_toks", LongType()),
])


def _cms_update(
    key: tuple[Any, ...],
    pdfs: Iterator["pd.DataFrame"],
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    """Constant-state streaming count-min sketch: the per-source state
    is the CMS_D x CMS_W cell grid (256 integers) no matter how many
    tokens stream past — the incremental twin of the batch
    [sk_cms_heavy] sketch. Bucketing happens JVM-side in cms_stream
    (the identical md5 salt expressions as the batch op), so this
    update is a pure grid increment; per-source grids are MERGEABLE
    by cell-wise sum (the test pins sum-of-streamed-grids probe-equal
    to the batch global sketch)."""
    import pandas as pd

    from ..operators.curation import CMS_D, CMS_W

    grid = [0] * (CMS_D * CMS_W)
    n_toks = 0
    if state.exists:
        blob, n_toks = state.get
        grid = [int(x) for x in blob.split(",")]
    for pdf in pdfs:
        for j, b in zip(pdf["j"].values, pdf["b"].values):
            grid[int(j) * CMS_W + int(b)] += 1
            if j == 0:
                n_toks += 1
    state.update((",".join(map(str, grid)), n_toks))
    yield pd.DataFrame({"source": [key[0]], "n_toks": [n_toks],
                        "grid": [",".join(map(str, grid))]})


def cms_stream(docs_stream: DataFrame) -> DataFrame:
    """Running per-source count-min sketch, constant state. Token
    bucketing is the SAME JVM expression family as the batch
    sk_cms_heavy (md5('j:'||tok) % CMS_W per row j), so a streamed
    grid and a batch grid built over the same rows are cell-equal by
    construction; the Python state fn never hashes."""
    from ..operators.curation import CMS_D, CMS_W

    def bucket(j):
        return (F.conv(F.substring(
            F.md5(F.concat(F.lit(f"{j}:"), F.col("tok"))), 1, 15),
            16, 10).cast("long") % CMS_W)

    from ..operators.textops import ws_tokens

    jb = F.explode(F.array(*[
        F.struct(F.lit(j).alias("j"), bucket(j).alias("b"))
        for j in range(CMS_D)])).alias("jb")
    keyed = (docs_stream
             .select("source", F.explode(ws_tokens()).alias("tok"))
             .select("source", jb)
             .select("source", "jb.j", "jb.b"))
    return keyed.groupBy("source").applyInPandasWithState(
        _cms_update,
        outputStructType=CMS_OUT,
        stateStructType=CMS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


KMV_OUT = StructType([
    StructField("source", StringType()),
    StructField("n_seen", LongType()),
    StructField("n_est", StringType()),   # %.4f — hash-stable
])
KMV_STATE = StructType([
    StructField("surv", StringType()),  # ','-joined sorted bottom-k
    StructField("n_seen", LongType()),
])


def _kmv_update(
    key: tuple[Any, ...],
    pdfs: Iterator["pd.DataFrame"],
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    """Constant-state streaming KMV: the per-source state is the
    bottom-KMV_K distinct hash set (at most k integers) no matter how
    many docs stream past — the incremental twin of the batch
    [sk_kmv_distinct] sketch, completing the set: every batch sketch
    family (KMV, HLL, CMS) has a constant-state streaming twin.
    Insertion is set-semantics (duplicates never change the sketch),
    so the streamed survivor set equals the batch bottom-k of the
    union of all arrivals — the mergeability KMV is built on."""
    import pandas as pd

    from ..operators.curation import _H60, KMV_K

    surv: list[int] = []
    n_seen = 0
    if state.exists:
        blob, n_seen = state.get
        surv = [int(x) for x in blob.split(",")] if blob else []
    ss = set(surv)
    for pdf in pdfs:
        for h in pdf["h"].values:
            h = int(h)
            n_seen += 1
            if h not in ss:
                ss.add(h)
                if len(ss) > KMV_K:
                    ss.remove(max(ss))
    surv = sorted(ss)
    state.update((",".join(map(str, surv)), n_seen))
    if len(surv) >= KMV_K:
        est = (KMV_K - 1) / (surv[-1] / _H60)
    else:
        est = float(len(surv))
    yield pd.DataFrame({"source": [key[0]], "n_seen": [n_seen],
                        "n_est": [f"{round(est, 4):.4f}"]})


def kmv_stream(docs_stream: DataFrame) -> DataFrame:
    """Running per-source KMV distinct estimate, constant state. The
    60-bit md5 hash is the same JVM expression as the batch op."""
    keyed = docs_stream.select(
        "source",
        F.conv(F.substring(F.md5("text"), 1, 15), 16, 10)
        .cast("long").alias("h"))
    return keyed.groupBy("source").applyInPandasWithState(
        _kmv_update,
        outputStructType=KMV_OUT,
        stateStructType=KMV_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DDQ_OUT = StructType([
    StructField("source", StringType()),
    StructField("n", LongType()),
    StructField("q50", LongType()),
    StructField("q90", LongType()),
    StructField("q99", LongType()),
])
DDQ_STATE = StructType([
    StructField("bins", StringType()),  # 'b:cnt,...' sparse log bins
])


def _ddq_update(
    key: tuple[Any, ...],
    pdfs: Iterator["pd.DataFrame"],
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    """Constant-state streaming DDSketch-style quantile sketch: the
    per-source state is the sparse log-bin histogram (~64 counters)
    no matter how many docs stream past — the incremental twin of the
    batch [sk_dd_quantile], completing the fourth sketch family's
    stream≡batch pair. Binning happens JVM-side in ddq_stream (the
    identical bit-length expression as the batch op); the estimate
    replays the batch op's integer interpolation rule exactly, so the
    final emission per source is value-equal to the batch sketch."""
    import pandas as pd

    from ..operators.curation import DDQ_PCTS

    bins: dict[int, int] = {}
    if state.exists:
        (blob,) = state.get
        if blob:
            for part in blob.split(","):
                b, c = part.split(":")
                bins[int(b)] = int(c)
    for pdf in pdfs:
        for b in pdf["b"].values:
            b = int(b)
            bins[b] = bins.get(b, 0) + 1
    state.update((",".join(f"{b}:{c}" for b, c in sorted(bins.items())),))
    n = sum(bins.values())

    def est(p):
        r = (p * n + 99) // 100
        cum = 0
        for b in sorted(bins):
            cnt = bins[b]
            if cum + cnt >= r:
                lo = 0 if b == 0 else 1 << (b - 1)
                hi = 0 if b == 0 else (1 << b) - 1
                return lo + ((hi - lo) * (r - cum - 1)) // max(cnt - 1, 1)
            cum += cnt
        return 0

    qs = [est(p) for p in DDQ_PCTS]
    yield pd.DataFrame({"source": [key[0]], "n": [n],
                        "q50": [qs[0]], "q90": [qs[1]], "q99": [qs[2]]})


def ddq_stream(docs_stream: DataFrame) -> DataFrame:
    """Running per-source quantile sketch, constant state. The log
    bin is the SAME JVM expression as batch sk_dd_quantile (length of
    the base-2 expansion), so streamed and batch histograms are
    cell-equal by construction."""
    b = F.when(F.col("n_chars") <= 0, F.lit(0)).otherwise(
        F.length(F.conv(F.col("n_chars").cast("string"), 10, 2)))
    keyed = docs_stream.select("source", b.cast("int").alias("b"))
    return keyed.groupBy("source").applyInPandasWithState(
        _ddq_update,
        outputStructType=DDQ_OUT,
        stateStructType=DDQ_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
