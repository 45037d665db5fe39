"""[EXT] Event-time lag-gap sessionization as a
``transformWithStateInPandas`` operator with WATERMARK-DRIVEN TIMERS —
the third tws operator (after stateful.py's demo and topktws), and the
one that exercises the event-time half of the timer API the other two
don't: sessions are finalized not when input arrives but when the
WATERMARK passes session_end + gap, exactly like the built-in
``F.session_window`` state operator, while matching the oracle-green
batch query ``sessionize_lag_gaps`` (plans/relational.py) row-for-row
— same strict-``>`` gap rule AND the per-user sequential session
NUMBER the built-in window variant cannot express.

Semantics
---------
- An event extends an open session when it lies within ``gap`` of it;
  an event can BRIDGE two open sessions (classic interval merge), so
  out-of-order arrival within the watermark is handled exactly.
- A session is final only when watermark > session_end + gap: no event
  that could still arrive (ts >= watermark) can merge into it.  Until
  then it stays in a per-user ListState.
- Finalized sessions are numbered 1..k per user in time order —
  sound because sessions are disjoint by > gap and the watermark is
  monotone, so finalization order IS time order.
- Rows older than the watermark are dropped by the engine before the
  processor sees them (standard event-time contract), which is what
  makes "final is final" safe.

State per user: open sessions (start_us, end_us, n) in a ListState +
the next session number in a ValueState — bounded by the number of
concurrently open sessions (almost always 1), NOT by stream length.
One event-time timer per user, armed at the earliest open session's
close point.

Same pickling discipline as stateful.py / topktws.py: module-level
class so unpickling workers run this module's import-time
``protobuf_compat.install()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import protobuf_compat

protobuf_compat.install()

SESSION_TWS_OUTPUT_SCHEMA = ("user_id bigint, session_no bigint, "
                             "session_start_us bigint, "
                             "session_end_us bigint, n_events bigint")
GAP_US_DEFAULT = 30 * 60 * 1_000_000  # the batch query's 30 minutes


def _merge_intervals(ivs: list[tuple[int, int, int]],
                     gap_us: int) -> list[tuple[int, int, int]]:
    """Classic gap-merge of (start, end, n) intervals sorted by start:
    adjacent intervals within ``gap_us`` fuse (counts add).  The
    strict-> boundary of the batch query maps to ``<=`` here: a gap of
    exactly 30 minutes stays in-session on both sides."""
    merged: list[tuple[int, int, int]] = []
    for s, e, n in sorted(ivs):
        if merged and s <= merged[-1][1] + gap_us:
            ps, pe, pn = merged[-1]
            merged[-1] = (ps, max(pe, e), pn + n)
        else:
            merged.append((s, e, n))
    return merged


def _make_session_processor():
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    class SessionizeProcessor(StatefulProcessor):
        def __init__(self, gap_us: int = GAP_US_DEFAULT) -> None:
            self.gap_us = gap_us

        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.sessions = handle.getListState(
                "sessions", "start_us bigint, end_us bigint, n bigint")
            self.next_no = handle.getValueState("next_no", "n bigint")

        # -- helpers -----------------------------------------------------
        def _open(self) -> list[tuple[int, int, int]]:
            return [(int(r[0]), int(r[1]), int(r[2]))
                    for r in self.sessions.get()]

        def _split_final(self, opens, wm_us):
            final = [s for s in opens if s[1] + self.gap_us < wm_us]
            keep = [s for s in opens if s[1] + self.gap_us >= wm_us]
            return final, keep

        def _emit(self, key, final):
            prev = self.next_no.get()
            no = int(prev[0]) if prev is not None else 1
            rows = [(key[0], no + i, s, e, n)
                    for i, (s, e, n) in enumerate(sorted(final))]
            self.next_no.update((no + len(final),))
            return pd.DataFrame(
                rows, columns=["user_id", "session_no",
                               "session_start_us", "session_end_us",
                               "n_events"])

        def _store_and_arm(self, keep, timerValues):
            self.sessions.clear()
            if keep:
                self.sessions.put([tuple(s) for s in keep])
            for t in self.handle.listTimers():
                self.handle.deleteTimer(t)
            if keep:
                # fire as soon as the watermark can have passed the
                # earliest close point (+1ms: timers fire at wm >= t,
                # finality needs wm strictly past end+gap)
                close_ms = (min(s[1] for s in keep)
                            + self.gap_us) // 1000 + 1
                self.handle.registerTimer(close_ms)

        # -- callbacks ---------------------------------------------------
        def handleInputRows(self, key, rows, timerValues):
            evs: list[int] = []
            for pdf in rows:
                evs.extend(int(v) for v in pdf["ts_us"])
            ivs = self._open() + [(t, t, 1) for t in evs]
            merged = _merge_intervals(ivs, self.gap_us)
            wm_us = timerValues.getCurrentWatermarkInMs() * 1000
            final, keep = self._split_final(merged, wm_us)
            self._store_and_arm(keep, timerValues)
            if final:
                yield self._emit(key, final)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            wm_us = timerValues.getCurrentWatermarkInMs() * 1000
            final, keep = self._split_final(self._open(), wm_us)
            self._store_and_arm(keep, timerValues)
            if final:
                yield self._emit(key, final)

        def close(self) -> None:
            pass

    SessionizeProcessor.__module__ = __name__
    SessionizeProcessor.__qualname__ = "SessionizeProcessor"
    return SessionizeProcessor


SessionizeProcessor = _make_session_processor()


def ts_micros(df: DataFrame, col: str = "ts"):
    """Timezone-free epoch micros for TZ and NTZ timestamps alike:
    ``unix_micros`` for TIMESTAMP, local ``timestampdiff`` arithmetic
    for TIMESTAMP_NTZ (which has no cast-to-long — the batch query's
    recipe).  Never casts between the two families, so the value does
    not depend on the session timezone."""
    from pyspark.sql.types import TimestampNTZType

    if isinstance(df.schema[col].dataType, TimestampNTZType):
        return F.expr(
            f"timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})")
    return F.unix_micros(col)


def sessionize_tws(events: DataFrame, watermark_delay: str = "0 seconds",
                   gap_us: int = GAP_US_DEFAULT) -> DataFrame:
    """Attach the sessionizer to a (user_id, ts) event stream.  Output
    rows are FINAL (append semantics): each session is emitted exactly
    once, when the watermark passes its close point."""
    tagged = (events
              .filter(F.col("ts").isNotNull())  # no event time, no session
              .withWatermark("ts", watermark_delay)
              .select("ts", F.col("user_id").cast("bigint").alias("user_id"),
                      ts_micros(events, "ts").alias("ts_us")))
    return (tagged.groupBy("user_id")
            .transformWithStateInPandas(
                SessionizeProcessor(gap_us),
                outputStructType=SESSION_TWS_OUTPUT_SCHEMA,
                outputMode="Append",
                timeMode="EventTime"))
