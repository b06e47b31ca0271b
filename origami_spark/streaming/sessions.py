"""Custom stateful streaming operator: gap-based sessionization.

``applyInPandasWithState`` holds (session_start, last_seen, count) per
user across micro-batches; a gap larger than the threshold closes the
session and emits it.  This is the custom-stateful-operator shape the
deployment story needs (e.g. crawl-host politeness windows); the same
gap logic exists batch-side as the q06 window query, which the test
uses as ground truth.

HONESTY NOTE: no reference parity claimed — origami is strictly batch
(SURVEY.md §2.10)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("user_id bigint, session_start bigint, session_end bigint, "
              "n_events bigint")
STATE_SCHEMA = "start bigint, last bigint, n bigint"


def _sessionize_fn(gap_seconds: int):
    def fn(key, pdfs, state: GroupState):
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        closed = []
        # materialize the whole group before sorting: Arrow may split one
        # group across chunks with no cross-chunk ordering guarantee, and
        # an out-of-order timestamp at a chunk boundary would falsely
        # close a session
        ts_all = sorted(ts for pdf in pdfs for ts in pdf["ts"])
        for ts in ts_all:
            t = int(pd.Timestamp(ts).timestamp())
            if last is None:
                start = last = t
                n = 1
            elif t - last > gap_seconds:
                closed.append((int(key[0]), start, last, n))
                start = last = t
                n = 1
            else:
                last = max(last, t)
                n += 1
        state.update((start, last, n))
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "session_end", "n_events"],
        )

    return fn


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Streaming (or batch-grouped) events (user_id, ts) -> closed
    sessions.  Open sessions stay in state until a later event closes
    them (NoTimeout: availableNow runs emit only data-closed sessions,
    which is what the exactly-once test can pin)."""
    return events.select("user_id", "ts").groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_seconds),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
