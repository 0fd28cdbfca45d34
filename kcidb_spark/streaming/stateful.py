"""Custom stateful streaming operators: per-key status transitions.

``status_transitions`` is the CI regression-detection primitive
behind the reference's notification triggers (a subscription fires
when an object's status CHANGES — kcidb/monitor summaries react to
new failures, not steady states): for every key, emit one row per
observed status transition, carrying the previous status.  Batch
equivalent: ``LAG(status) OVER (PARTITION BY key ORDER BY ts)``
filtered to changes — but as a STREAMING operator the comparison must
survive micro-batch boundaries, which is exactly what per-key state
(last seen ts + status) provides.  State is ONE tuple per key — at
100 TB the state store holds |keys| rows regardless of event volume.

Two engine paths, same semantics (the transition loop is shared):

* ``transformWithStateInPandas`` (the Spark 4 stateful-processor API:
  typed ValueState, timers, Arrow-batched input) — preferred, but its
  state client speaks protobuf to the JVM state server, so it needs
  ``google.protobuf``, which this container does not ship; gated on
  an import probe per the no-new-deps rule.
* ``applyInPandasWithState`` (GroupState) — the always-available
  fallback, identical per-key tuple state.

Pickling note (tws path): the processor class is defined INSIDE the
builder so cloudpickle serializes it BY VALUE — transformWithState
spawns a driver-side Python runner (state-schema worker) that does
not inherit ``addPyFile`` includes, so a module-level class (pickled
by reference to ``kcidb_spark``) fails to unpickle there.

Ordering contract: rows are sequenced by (ts, event_id) WITHIN each
micro-batch, and batches are assumed event-time-ordered per key (true
for the bounded AvailableNow drain and for any source partitioned by
time).  A production deployment with out-of-order batches would add a
watermark + event-time timers to re-sequence; the operator state
already stores the last ts to make late rows detectable.
"""

from __future__ import annotations

from importlib.util import find_spec

from pyspark.sql import DataFrame

#: Output schema of :func:`status_transitions`.
TRANSITIONS_SCHEMA = (
    "user_id LONG, prev_status STRING, status STRING, ts_us LONG"
)

_STATE_SCHEMA = "ts_us LONG, status STRING"


def _emit_transitions(key, pdfs, prev):
    """Shared transition detector: (key tuple, iterator of pandas
    chunks, (prev_ts, prev_status) or (None, None)) → (output
    DataFrame, new state tuple).

    Vectorized (r7 verdict #5): the stateful path's cost is per-KEY
    Python overhead × |keys| per micro-batch, so the comparison is a
    numpy shift-compare over the whole group instead of a per-row
    Python loop (~400 rows/key × 1,500 keys = 600k interpreted
    iterations per batch before; one array op now), chunk concat is
    skipped for the common single-chunk delivery, and groups with no
    transition return a zero-copy empty frame."""
    import numpy as np
    import pandas as pd

    chunks = list(pdfs)
    batch = (
        chunks[0]
        if len(chunks) == 1
        else pd.concat(chunks, ignore_index=True)
    )
    # Deterministic within-batch sequence; mergesort = stable.
    batch = batch.sort_values(["ts_us", "event_id"], kind="mergesort")
    _, prev_status = prev
    status = batch["status"].to_numpy(dtype=object)
    ts = batch["ts_us"].to_numpy()
    n = len(status)
    if n == 0:
        return _EMPTY_OUT(), prev
    shifted = np.empty(n, dtype=object)
    shifted[0] = prev_status
    shifted[1:] = status[:-1]
    # A transition needs a KNOWN previous status: suppress rows whose
    # shifted value is None — the first-ever row for the key AND any
    # row following a mid-batch null status (the pre-vectorization row
    # loop skipped both; np.not_equal('x', None) alone would emit a
    # spurious None->x row).
    mask = np.not_equal(status, shifted)
    mask &= np.frompyfunc(lambda s: s is not None, 1, 1)(shifted).astype(
        bool
    )
    new_state = (int(ts[-1]), status[-1])
    if not mask.any():
        return _EMPTY_OUT(), new_state
    out = pd.DataFrame(
        {
            "user_id": np.full(int(mask.sum()), key[0], dtype="int64"),
            "prev_status": shifted[mask],
            "status": status[mask],
            "ts_us": ts[mask].astype("int64"),
        }
    )
    return out, new_state


def _EMPTY_OUT():
    """Schema-correct empty output frame (built once per worker)."""
    import pandas as pd

    global _EMPTY_CACHE
    try:
        return _EMPTY_CACHE
    except NameError:
        _EMPTY_CACHE = pd.DataFrame(
            {
                "user_id": pd.array([], dtype="int64"),
                "prev_status": pd.array([], dtype="object"),
                "status": pd.array([], dtype="object"),
                "ts_us": pd.array([], dtype="int64"),
            }
        )
        return _EMPTY_CACHE


def transform_with_state_available() -> bool:
    """True when the Spark 4 stateful-processor API can actually run
    (its state client requires google.protobuf)."""
    try:
        # find_spec imports the PARENT package, so a missing 'google'
        # namespace raises rather than returning None.
        return find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


def _transitions_tws(keyed) -> DataFrame:
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class StatusTransitionProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._last = handle.getValueState("last", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            prev = self._last.get() if self._last.exists() else (None, None)
            out, new = _emit_transitions(key, rows, prev)
            self._last.update(new)
            yield out

        def close(self) -> None:
            pass

    return keyed.transformWithStateInPandas(
        StatusTransitionProcessor(),
        outputStructType=TRANSITIONS_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


def _transitions_apply(keyed) -> DataFrame:
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        prev = tuple(state.get) if state.exists else (None, None)
        out, new = _emit_transitions(key, pdfs, prev)
        state.update(new)
        yield out

    return keyed.applyInPandasWithState(
        fn,
        outputStructType=TRANSITIONS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


#: Pre-reduction time-bucket width: 1 hour of event time.  Wide
#: enough that a batch's bucket count stays small (the reduced rows
#: per user ≤ transitions + buckets), narrow enough that one
#: (user, bucket) group is a fraction of a hot user's batch share.
PREREDUCE_BUCKET_US = 3_600_000_000


def _prereduce_transitions(sel: DataFrame, bucket_us: int) -> DataFrame:
    """Map-side transition pre-aggregation — the t15 hot-key
    mitigation (VERDICT r10 "Next round" #3, priced in SCALE.md r10):
    state is keyed BY user, so a 90%%-one-user stream funnels 90%% of
    every micro-batch into ONE Python-stateful task (p100 3.4× the
    uniform run's).  The key cannot be salted without changing
    per-key transition semantics — but the INPUT can be shrunk
    exactly: a row whose status equals its predecessor's (in the
    user's global (ts_us, event_id) order) emits nothing and leaves
    every other row's predecessor STATUS unchanged, so dropping it is
    a lossless reduction.

    "Predecessor in global order" is only known locally if the
    grouping respects that order, so the reduction buckets by
    DISJOINT event-time ranges: repartition the batch by (user_id,
    ts_us div bucket) — a well-spread key even when one user owns the
    stream — then collapse consecutive duplicate statuses WITHIN each
    (user, bucket) group.  A user's global sequence is the bucket
    sequences concatenated in bucket order (equal timestamps share a
    bucket), each bucket's first row is kept for stitching, and the
    per-key stateful op downstream re-derives exactly the same
    transitions from the reduced rows (pinned against the unreduced
    form and the batch LAG oracle in tests/test_stateful_transitions
    and the t15 gate).  The hot task's input drops from 90%% of the
    batch to ≤ (transitions + touched buckets) rows; the reduction
    shuffle itself carries the full batch but on the spread key."""
    import pandas as pd  # noqa: F401 — worker-side import below

    from pyspark.sql import functions as F

    def reduce_fn(batches):
        import pandas as pd

        chunks = list(batches)
        if not chunks:
            return
        pdf = (
            chunks[0]
            if len(chunks) == 1
            else pd.concat(chunks, ignore_index=True)
        )
        if len(pdf) == 0:
            return
        # mapInPandas chunks a partition arbitrarily, and a split
        # (user, bucket) group would make the chunk-local predecessor
        # differ from the group predecessor — concat first (above),
        # so the whole partition (= whole groups, by the repartition)
        # reduces in one frame.
        pdf = pdf.sort_values(
            ["user_id", "ts_us", "event_id"], kind="mergesort"
        )
        bkt = pdf["ts_us"] // bucket_us
        same_group = (pdf["user_id"] == pdf["user_id"].shift()) & (
            bkt == bkt.shift()
        )
        s, p = pdf["status"], pdf["status"].shift()
        same_status = (s == p) | (s.isna() & p.isna())
        yield pdf[~(same_group & same_status)]

    return sel.repartition(
        F.col("user_id"), F.expr(f"ts_us div {bucket_us}")
    ).mapInPandas(
        reduce_fn,
        schema="user_id LONG, event_id LONG, status STRING, ts_us LONG",
    )


def status_transitions(
    events: DataFrame,
    use_transform_with_state: bool | None = None,
    prereduce: bool = True,
    prereduce_bucket_us: int = PREREDUCE_BUCKET_US,
) -> DataFrame:
    """(user_id, prev_status, status, ts_us) per observed change of
    ``event_type`` within a user's event-time sequence.  ``events``
    is a STREAMING frame with columns user_id, event_id, event_type,
    ts (timestamp); output timestamps are epoch micros (integer —
    bit-stable across engines).  ``prereduce`` (default on) collapses
    consecutive duplicate statuses map-side per (user, time-bucket)
    before the per-user stateful op — semantically lossless, and the
    difference between a flat hot-key profile and a 3.4× straggler
    (:func:`_prereduce_transitions`)."""
    from pyspark.sql import functions as F

    from kcidb_spark.ship import ensure_package_shipped

    # The state function pickles closures from this module — ship the
    # package for executor workers on foreign-cwd drivers.
    ensure_package_shipped(events.sparkSession)
    if use_transform_with_state is None:
        use_transform_with_state = transform_with_state_available()
    sel = events.select(
        "user_id",
        "event_id",
        F.col("event_type").alias("status"),
        F.unix_micros("ts").alias("ts_us"),
    )
    if prereduce:
        sel = _prereduce_transitions(sel, prereduce_bucket_us)
    keyed = sel.groupBy("user_id")
    if use_transform_with_state:
        return _transitions_tws(keyed)
    return _transitions_apply(keyed)
