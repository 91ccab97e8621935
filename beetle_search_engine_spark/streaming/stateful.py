"""Custom stateful streaming operators via ``applyInPandasWithState``.

The batch engine sessionizes events with a window-function gap scan (the
oracle-green ``sessionize`` entry); a STREAM can't do that — a session is
open-ended until the gap timeout passes, which is exactly the
arbitrary-state shape Structured Streaming exposes through
``applyInPandasWithState`` (Arrow-batched per-key state, the Python
analog of flatMapGroupsWithState).

``streaming_sessionize`` keeps a per-key list of PENDING session
segments (the newest one is the open session):

* state = (next session id, parallel arrays of segment
  start/last/count/value-sum, sorted by start, pairwise separated by
  more than ``gap_s``)
* a micro-batch's events are sorted and INSERTED: an event within
  ``gap_s`` of a segment's edges joins it (start/last absorb the
  timestamp), bridged neighbors merge, anything else opens a new
  segment — no emission is triggered by events, only state movement
* a segment is EMITTED exactly when the watermark passes its
  ``last + gap_s`` (checked against ``getCurrentWatermarkMs`` at the
  end of every fold, and via ``GroupStateTimeout.EventTimeTimeout`` set
  to the earliest pending deadline for keys that stop receiving events)

Emission is watermark-gated rather than event-gated because an
event-implied gap is NOT final under out-of-order delivery: a later
batch may deliver an in-watermark straggler that bridges two segments a
naive fold would already have flushed.  Since the watermark is also the
line past which Spark drops late input, every event the operator ever
sees can still only extend segments whose deadline has not passed —
so the stream's output equals the batch window scan over the same
delivered events EXACTLY (same sessions, same start-ordered session
ids), with no residual divergence; only events the watermark drops
before the operator differ, and those never reach state at all.

Emitted rows match the batch sessionizer's columns (user_id,
session_id, n_events, start_epoch, session_value) — pinned by the
batch-twin test, the backwards-extension test, the straggler
split/bridge test, and the cross-batch bridge-after-gap test.

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
    "next_sid long, starts array<long>, lasts array<long>, "
    "counts array<long>, sums array<double>"
)


def _fold_sessions(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_s: int,
) -> Iterator[pd.DataFrame]:
    """Insert one key's micro-batch events into its pending-segment
    state, then emit every segment whose ``last + gap_s`` the watermark
    has passed (events move state; only the watermark emits)."""
    (user_id,) = key
    if state.exists:
        next_sid, starts, lasts, counts, sums = state.get
        segs = [list(t) for t in zip(starts, lasts, counts, sums)]
    else:
        next_sid, segs = 0, []

    if not state.hasTimedOut:
        events = pd.concat(list(pdfs), ignore_index=True)
        ts = (events["ts"].astype("int64") // 1_000_000_000).to_numpy()
        order = ts.argsort(kind="stable")
        ts = ts[order]
        vals = events["value"].to_numpy()[order]
        for t, v in zip(ts.tolist(), vals.tolist()):
            t, v = int(t), float(v)
            # join the leftmost segment whose gap-envelope covers t,
            # else insert a new singleton at its sorted position
            hit = None
            for i, sg in enumerate(segs):
                if sg[0] - gap_s <= t <= sg[1] + gap_s:
                    hit = i
                    break
                if t < sg[0] - gap_s:
                    segs.insert(i, [t, t, 0, 0.0])
                    hit = i
                    break
            if hit is None:
                segs.append([t, t, 0, 0.0])
                hit = len(segs) - 1
            sg = segs[hit]
            sg[0], sg[1] = min(sg[0], t), max(sg[1], t)
            sg[2] += 1
            sg[3] += v
            # the joined/inserted segment may now bridge its neighbors
            while hit + 1 < len(segs) and segs[hit + 1][0] - segs[hit][1] <= gap_s:
                nxt = segs.pop(hit + 1)
                segs[hit][1] = max(segs[hit][1], nxt[1])
                segs[hit][2] += nxt[2]
                segs[hit][3] += nxt[3]
            while hit > 0 and segs[hit][0] - segs[hit - 1][1] <= gap_s:
                prev = segs.pop(hit - 1)
                hit -= 1
                segs[hit][0] = min(segs[hit][0], prev[0])
                segs[hit][2] += prev[2]
                segs[hit][3] += prev[3]

    # watermark-gated emission: a segment with (last + gap) behind the
    # watermark can never be extended (any future event the watermark
    # lets through is too new to bridge it) and can never re-merge with
    # a later segment (the bridging event would equally be too old) —
    # so flushing it now is final AND exactly what the batch scan over
    # the same delivered events produces.  Segments are start-ordered,
    # so sids assigned front-to-back stay start-ordered forever.
    # The deadline closes at the END of its second: timestamps truncate
    # to seconds here (and in the batch oracle), so an event anywhere in
    # second (last + gap) still merges — the watermark must pass
    # (last + gap + 1) whole seconds before a sub-second straggler like
    # t = (last + gap) + 0.9s (>= watermark, hence deliverable; == last
    # + gap after truncation, hence mergeable) becomes impossible.
    w_ms = max(int(state.getCurrentWatermarkMs()), 0)
    out = {k: [] for k in ("user_id", "session_id", "n_events", "start_epoch", "session_value")}
    while segs and (segs[0][1] + gap_s + 1) * 1000 <= w_ms:
        st, _last, n, vs = segs.pop(0)
        out["user_id"].append(user_id)
        out["session_id"].append(next_sid)
        out["n_events"].append(n)
        out["start_epoch"].append(st)
        out["session_value"].append(vs)
        next_sid += 1

    if segs:
        state.update(
            (
                next_sid,
                [sg[0] for sg in segs],
                [sg[1] for sg in segs],
                [sg[2] for sg in segs],
                [sg[3] for sg in segs],
            )
        )
        # wake when the watermark passes the earliest pending deadline
        # (Spark requires the timeout to sit strictly beyond the current
        # watermark)
        state.setTimeoutTimestamp(max((segs[0][1] + gap_s + 1) * 1000, w_ms + 1))
    else:
        state.remove()
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
