"""Streaming twin of ``operators.agent.tool_retry_stats``: incremental
tool-retry/recovery detection with O(1) state per key.

``applyInPandasWithState`` keeps (last_ep, last_type) per user/conversation
— constant-size state, unlike the assembly fold — and each micro-batch
emits per-tool INCREMENTS (calls, retries, recoveries) for that key.
Summing the increments over any horizon reproduces the batch operator's
totals exactly (pinned by tests/test_streaming_agent.py).

Ordering contract: within a micro-batch the group's rows are sorted by
(ep, event_id) before scanning; ACROSS batches the operator assumes
per-key event-time-ordered delivery (the log-stream/CDC contract every
lag-shaped streaming detector carries — a turn older than the stored
last_ep would compare against the wrong predecessor). Out-of-order
replays belong on the batch path, where the window over (ep, event_id)
is order-free.

Quiescent keys are evicted via processing-time timeout. Eviction is
exactness-safe ONLY when wall-clock silence implies event-time silence:
a key evicted after QUIESCENT_EVICT_MS of wall time whose NEXT event has
an event-time gap <= RETRY_WINDOW (a producer flushing a long-buffered
backlog) loses that one retry classification. QUIESCENT_EVICT_MS is
therefore set well above RETRY_WINDOW (6x) so the loss window requires
both multi-minute producer buffering AND a sub-window event gap; exact
replays of buffered history belong on the batch path."""
from __future__ import annotations

from collections import defaultdict
from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.agent import RETRY_WINDOW_SECONDS

INCR_SCHEMA = "tool string, n_calls long, n_retries long, n_recoveries long"
STATE_SCHEMA = "last_ep long, last_type string"

# 6x the event-time retry window (see module docstring's eviction contract)
QUIESCENT_EVICT_MS = 6 * RETRY_WINDOW_SECONDS * 1000
_WIN_US = RETRY_WINDOW_SECONDS * 1_000_000


def retry_fn(
    key: Tuple,
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return

    if state.exists:
        last_ep, last_type = state.get
    else:
        last_ep, last_type = None, None

    rows = []
    for pdf in batches:
        rows.extend(
            zip(
                (int(e) for e in pdf["ep"]),
                (int(i) for i in pdf["event_id"]),
                (str(t) for t in pdf["event_type"]),
            )
        )
    rows.sort()

    calls: dict = defaultdict(int)
    retries: dict = defaultdict(int)
    recoveries: dict = defaultdict(int)
    for ep, _eid, t in rows:
        calls[t] += 1
        if last_type is not None and ep - last_ep <= _WIN_US:
            if t == last_type:
                retries[t] += 1
            if last_type == "error" and t != "error":
                recoveries[t] += 1
        last_ep, last_type = ep, t

    state.update((last_ep, last_type))
    state.setTimeoutDuration(QUIESCENT_EVICT_MS)
    yield pd.DataFrame(
        [
            {
                "tool": t,
                "n_calls": calls[t],
                "n_retries": retries[t],
                "n_recoveries": recoveries[t],
            }
            for t in sorted(calls)
        ]
    )


def tool_retry_stream(event_stream: DataFrame) -> DataFrame:
    """event stream (user_id, event_id, ep, event_type) -> per-(key, batch)
    per-tool increment rows in update mode. Downstream consumers (a
    metrics sink, a foreachBatch upsert) sum increments per tool."""
    return (
        event_stream.select("user_id", "event_id", "ep", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            retry_fn,
            outputStructType=INCR_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
