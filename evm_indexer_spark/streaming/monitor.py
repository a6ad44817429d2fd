"""Header-stream monotonicity monitor as a custom stateful operator
(SURVEY T1 — gap / regression detection, ``app/block/listener.go:39-115``).

The reference tracks one mutable ``latest`` block number in the listener
goroutine: the first header must exceed the max-at-startup, a header
beyond ``latest + 1`` means a gap (the reference crashes), a header at or
below ``latest`` is a chain-reorg re-announcement (processed anyway).
That per-stream running state maps onto Structured Streaming's
``applyInPandasWithState``: state = (latest, seen_first), input arrives
as Arrow batches, and every header is classified instead of crashing —
gaps are emitted as ``gap`` rows for the repair job (T7) to heal, the
documented divergence for a cluster that should self-heal rather than
die (see ``ingest.start_ingest_stream``).

Keyed by a ``chain`` column so multiple chains monitor independently in
parallel; the reference's single stream is one key.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("chain", T.StringType()),
        T.StructField("number", T.LongType()),
        T.StructField("hash", T.StringType()),
        T.StructField("status", T.StringType()),  # first|normal|reorg|gap|bad_first
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("latest", T.LongType()),
        T.StructField("seen_first", T.BooleanType()),
    ]
)


def classify_headers(
    headers: pd.DataFrame,
    latest: int | None,
    startup_max: int = -1,
) -> tuple[pd.DataFrame, int | None]:
    """Pure classification core (listener.go:49-76 semantics), reused by
    the stateful operator and unit-testable without Spark.

    Returns (classified rows, new latest). Arrival order is preserved —
    the reference processes headers sequentially.
    """
    statuses: list[str] = []
    for number in headers["number"]:
        n = int(number)
        if latest is None:
            statuses.append("first" if n > startup_max else "bad_first")
            latest = n if n > startup_max else latest
            continue
        if n > latest + 1:
            statuses.append("gap")  # reference crashes here (listener.go:57-61)
        elif n == latest + 1:
            statuses.append("normal")
        else:
            statuses.append("reorg")  # re-announce, listener.go:65-73
        latest = max(latest, n)
    out = headers.copy()
    out["status"] = statuses
    return out, latest


def monitor_headers(
    headers: DataFrame, startup_max: int = -1
) -> DataFrame:
    """Streaming classification: headers(chain, number, hash) →
    (chain, number, hash, status) with per-chain running state."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        latest, seen = state.get if state.exists else (None, False)
        current = latest if seen else None
        for pdf in pdfs:
            classified, current = classify_headers(pdf, current, startup_max)
            classified["chain"] = key[0]
            yield classified[["chain", "number", "hash", "status"]]
        if current is not None:
            state.update((int(current), True))

    return headers.groupBy("chain").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
