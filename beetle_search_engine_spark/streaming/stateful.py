"""Custom stateful streaming operators via ``applyInPandasWithState``.

The batch engine sessionizes events with a window-function gap scan (the
oracle-green ``sessionize`` entry); a STREAM can't do that — a session is
open-ended until the gap timeout passes, which is exactly the
arbitrary-state shape Structured Streaming exposes through
``applyInPandasWithState`` (Arrow-batched per-key state, the Python
analog of flatMapGroupsWithState).

``streaming_sessionize`` keeps one open session per user key:

* state = (session_id counter, session start, last event ts, running
  count, running value sum)
* a micro-batch's events for the key are sorted and folded into the
  state; any event farther than ``gap_s`` from the previous one CLOSES
  the open session (emitting a result row) and opens a new one
* event-time timeout (``GroupStateTimeout.EventTimeTimeout`` + the
  stream's watermark) closes sessions for keys that stop receiving
  events — without it, an idle key's last session would never emit

Emitted rows match the batch sessionizer's columns (user_id,
session_id, n_events, start_epoch, session_value), so the two paths are
directly comparable — tested by feeding the same events through the
batch window scan and this stream (every session CLOSED by the stream
equals its batch twin; the batch run also reports still-open tails the
stream is rightly still holding in state).

Cross-batch out-of-order events (within watermark): an event within
``gap_s`` of the open session's start extends it BACKWARDS (start
absorbs the timestamp, last never regresses — batch parity).  An event
MORE than ``gap_s`` older than the open session's start is folded into
its own earlier session (emitted once gap-closed) rather than corrupting
the open session's start; if a later event in the same batch bridges the
chain back within ``gap_s``, the chain is merged into the open session
as batch semantics require.  Full batch parity is still not guaranteed
for such stragglers — the batch scan could have merged one with a
session ALREADY emitted downstream, which append-mode streaming cannot
retract.  That residual divergence is inherent and intentional.

At scale: state lives in the state store partitioned by user key — the
shuffle is one hash exchange per micro-batch, identical to the batch
groupBy; skewed keys shard the same way.  No driver-side state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_id long, n_events long, start_epoch long, "
    "session_value double"
)
_STATE_SCHEMA = (
    "session_id long, start_epoch long, last_epoch long, n_events long, "
    "value_sum double"
)


def _fold_sessions(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_s: int,
) -> Iterator[pd.DataFrame]:
    """Fold one key's micro-batch events into its open-session state,
    emitting every session the gap rule closes."""
    (user_id,) = key
    if state.hasTimedOut:
        # watermark passed the open session's last event + gap: flush it
        sid, start, last, n, vs = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id], "session_id": [sid], "n_events": [n],
                "start_epoch": [start], "session_value": [vs],
            }
        )
        return
    events = pd.concat(list(pdfs), ignore_index=True)
    # epoch seconds; micro-batches arrive unordered within themselves
    ts = (events["ts"].astype("int64") // 1_000_000_000).to_numpy()
    order = ts.argsort(kind="stable")
    ts = ts[order]
    vals = events["value"].to_numpy()[order]

    if state.exists:
        sid, start, last, n, vs = state.get
    else:
        sid, start, last, n, vs = 0, int(ts[0]), None, 0, 0.0
    out = {k: [] for k in ("user_id", "session_id", "n_events", "start_epoch", "session_value")}

    def _emit(e_sid, e_n, e_start, e_vs):
        out["user_id"].append(user_id)
        out["session_id"].append(e_sid)
        out["n_events"].append(e_n)
        out["start_epoch"].append(e_start)
        out["session_value"].append(e_vs)

    # late-beyond-gap chain: events from a later micro-batch that are
    # MORE than gap_s older than the open session's start belong to a
    # separate EARLIER session (the batch scan over the same global event
    # set would never merge them) — fold them into their own gap-chained
    # session(s) instead of corrupting the open session's start.  The
    # open session's sid advances past each emitted early session, so
    # sids stay start-ordered among not-yet-emitted sessions; full batch
    # parity is still not guaranteed (the batch scan could have merged
    # such an event with a session ALREADY flushed downstream — inherent
    # to append-mode streaming and documented here).
    early = None  # [start, last, n, vs]
    for t, v in zip(ts.tolist(), vals.tolist()):
        if last is not None and t < start - gap_s:
            if early is not None and t - early[1] > gap_s:
                _emit(sid, early[2], early[0], early[3])
                sid, early = sid + 1, None
            if early is None:
                early = [t, t, 0, 0.0]
            early[1] = max(early[1], t)
            early[2] += 1
            early[3] += float(v)
            continue
        if early is not None:
            if t - early[1] <= gap_s:
                # the chain bridges to this event (which itself reaches
                # the open session), so batch semantics merge everything:
                # absorb the chain into the open session
                start, n, vs = min(start, early[0]), n + early[2], vs + early[3]
            else:
                # gap-closed relative to this event: flush as its own
                # earlier session
                _emit(sid, early[2], early[0], early[3])
                sid = sid + 1
            early = None
        if last is not None and t - last > gap_s:
            _emit(sid, n, start, vs)
            sid, start, last, n, vs = sid + 1, t, None, 0, 0.0
        n += 1
        vs += float(v)
        # a later micro-batch may deliver an event OLDER than the open
        # session's last but within gap_s of its start (out-of-order
        # across batches, within watermark): it extends the session
        # backwards — last must not regress (a regressed last would
        # measure the next gap from the wrong edge and split spuriously)
        # and start absorbs the earlier timestamp, matching the batch
        # window scan over the same global event set
        start = min(start, t)
        last = t if last is None else max(last, t)
    if early is not None:
        _emit(sid, early[2], early[0], early[3])
        sid, early = sid + 1, None
    state.update((sid, start, last, n, vs))
    # event-time timeout: when the watermark passes last + gap, the open
    # session can never be extended — flush it then
    state.setTimeoutTimestamp((last + gap_s) * 1000)
    if out["user_id"]:
        yield pd.DataFrame(out)


def streaming_sessionize(
    events: DataFrame,
    gap_s: int = 1800,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Streaming gap-based sessionization (the stateful-stream analog of
    the batch ``sessionize`` window scan).  ``events`` must be a
    STREAMING DataFrame with (user_col, ts_col timestamp, value_col)."""

    def fold(key, pdfs, state):
        yield from _fold_sessions(key, pdfs, state, gap_s)

    src = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("value"),
    ).withWatermark("ts", watermark)
    return src.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
