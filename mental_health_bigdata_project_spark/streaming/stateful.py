"""[EXT] Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.9): the escape hatch for per-key logic that built-in
windowed aggregation can't express (running totals that must be emitted
*every* micro-batch, per-key model state, custom eviction policies).

The reference keeps its only state in an unbounded Python ``seen_ids``
set and a 100-post ring buffer (kafka_consumer_simple.py:14,104);
here state is per-key, Arrow-batched, checkpointed by the state store,
and bounded by an idle-processing-timeout eviction policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from . import protobuf_compat

# Import-time bootstrap (idempotent, cached): Python WORKERS unpickle
# the stateful processor, which re-imports this module BEFORE pyspark
# constructs StatefulProcessorApiClient (whose StateMessage_pb2 imports
# are lazy) — so installing here covers driver and workers alike.
protobuf_compat.install()

RUNNING_OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double"
RUNNING_STATE_SCHEMA = "n bigint, s double"


def running_user_totals(events: DataFrame,
                        idle_timeout_ms: int | None = None) -> DataFrame:
    """Per-user running (count, sum(value)) emitted anew every
    micro-batch the user appears in — a continuously-updated feature
    the built-in aggs only provide per *window*, not per key-lifetime.

    State is two scalars per user (16 bytes + key), merged with each
    Arrow batch; with ``idle_timeout_ms`` set, users idle longer than
    the timeout are evicted (bounded state at 100 TB key cardinality:
    eviction is the difference between O(active users) and O(all users
    ever seen))."""
    import pandas as pd

    timeout = (GroupStateTimeout.ProcessingTimeTimeout if idle_timeout_ms
               else GroupStateTimeout.NoTimeout)

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]})

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update, RUNNING_OUTPUT_SCHEMA, RUNNING_STATE_SCHEMA,
            "update", timeout)
    )


def transform_with_state_available() -> bool:
    """Spark 4's ``transformWithStateInPandas`` control channel speaks
    protobuf; this environment ships no installed ``google.protobuf``
    wheel, so the operator is gated (environment constraint, not an
    engine one).  ``protobuf_compat.install()`` first tries a native
    install, then bootstraps the public Cloud-SDK runtime and proves it
    with a StateMessage round-trip; only if both fail do we gate."""
    from . import protobuf_compat

    return bool(protobuf_compat.install())


def _make_running_totals_processor():
    """Build the module-level stateful processor class.

    Deliberately a MODULE-LEVEL definition (via this factory, so the
    pyspark import stays lazy): a function-local class would be
    cloudpickled BY VALUE, and the tws driver/executor workers would
    then unpickle it without ever importing this module — skipping the
    import-time ``protobuf_compat.install()`` those processes need
    before their first lazy ``StateMessage_pb2`` import (observed as
    "driver worker exited unexpectedly (crashed)" during state-schema
    validation).  A module-level class pickles by reference, so every
    worker imports this module — and bootstraps protobuf — first."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle):
            self.totals = handle.getValueState("totals", RUNNING_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            n, s = self.totals.get() if self.totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
            self.totals.update((n, s))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_value": [s]})

        def close(self):
            pass

    RunningTotals.__module__ = __name__
    RunningTotals.__qualname__ = "RunningTotals"
    return RunningTotals


RunningTotals = _make_running_totals_processor()


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Forward path for `running_user_totals` on the Spark 4
    ``transformWithStateInPandas`` API: composable typed state (value/
    list/map per key), native TTL on each state item, and timers —
    richer than applyInPandasWithState's single tuple + one timeout.

    Same semantics as `running_user_totals` (per-user running count and
    sum emitted each micro-batch the user appears in); state is a
    2-field value state with the store-managed RocksDB backend.  Gated:
    call sites must check ``transform_with_state_available()`` first
    (see tests/test_streaming.py — skipped where protobuf is absent).
    """
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            RunningTotals(), outputStructType=RUNNING_OUTPUT_SCHEMA,
            outputMode="Update", timeMode="None")
    )
