"""Structured Streaming ingest pipeline.

Reference shape (SURVEY.md §2.9, §3.3): Pub/Sub → kcidb_load_queue
(pull/merge/load/ack) → updated-patterns topic →
kcidb_spool_notifications (match subscriptions, spool with dedup) →
send.  Here the same stages are a Structured Streaming query:

    file source (one JSON report per file)
      → validate + upgrade (driver-side per micro-batch)
      → foreachBatch:
          merge-load into the Store            (T2/T3 — exactly-once
                                                via idempotent merge)
          derive changed-object patterns       (T4 fan-out)
          match subscriptions → notifications  (T5)
          MERGE-dedup into the spool table     (T6 — deterministic
                                                notification ids)

The reference needs no watermarks (T7): loads are commutative and the
merge view makes redelivery idempotent — the same property carries
over here, so ``processAllAvailable`` + checkpointing gives effective
exactly-once without event-time state.
"""

from kcidb_spark.streaming.ingest import IngestPipeline  # noqa: F401
from kcidb_spark.streaming.notify import (  # noqa: F401
    Notification,
    NotificationSpool,
    Subscription,
    load_subscriptions,
)
