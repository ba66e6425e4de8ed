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
