"""File-transport message queues — the ``kcidb-mq-*`` analog.

The reference's queue layer is GCP Pub/Sub with three payload flavors
(kcidb/mq/__init__.py: IOPublisher/IOSubscriber for I/O reports,
ORMPatternPublisher/Subscriber for query-pattern sets, Email
publisher/subscriber for rendered messages; console entry points in
setup.py).  This environment has no network broker, and the engine's
streaming ingest already consumes a *directory inbox* — so the queue
here is that same durable-directory transport made first-class:

* a queue is a directory; publishing atomically drops one file per
  message, named ``<seq>-<uuid>`` so lexical order == publish order
  (per publisher process; cross-publisher order is best-effort, same
  as Pub/Sub);
* a subscription is a named ack-cursor directory under
  ``.subscriptions/``; pulling lists unacked messages in order, and
  acking writes a marker file — at-least-once delivery with explicit
  ack, mirroring the Pub/Sub contract the reference relies on
  (unacked messages are redelivered on the next pull);
* ``init``/``cleanup`` create/delete the queue, like the reference's
  topic management subcommands.

The I/O flavor validates reports against the JSON schema on publish
(IOPublisher.publish validates; untrusted data fails loudly before it
is queued); patterns round-trip through the ORM pattern parser; email
payloads are RFC-822 text.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from typing import Any, Iterator

_SUBS_DIR = ".subscriptions"


class FileQueue:
    """A durable directory queue with named ack-cursor subscriptions."""

    def __init__(self, path: str):
        self.path = path

    # -- management ----------------------------------------------------
    def init(self) -> None:
        os.makedirs(self.path, exist_ok=True)
        os.makedirs(os.path.join(self.path, _SUBS_DIR), exist_ok=True)

    def cleanup(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)

    def init_subscription(self, name: str) -> None:
        self.init()
        os.makedirs(os.path.join(self.path, _SUBS_DIR, name), exist_ok=True)

    def cleanup_subscription(self, name: str) -> None:
        shutil.rmtree(
            os.path.join(self.path, _SUBS_DIR, name), ignore_errors=True
        )

    # -- publish -------------------------------------------------------
    def publish(self, payload: str, suffix: str = "msg") -> str:
        """Atomically enqueue one message; returns its id."""
        self.init()
        msg_id = f"{time.time_ns():020d}-{uuid.uuid4().hex}.{suffix}"
        final = os.path.join(self.path, msg_id)
        # newline="" disables universal-newline translation so payload
        # bytes round-trip exactly (Pub/Sub `data` is bytes-clean;
        # without this a published "\r" would pull back as "\n").
        with open(final + ".tmp", "w", encoding="utf-8", newline="") as f:
            f.write(payload)
        os.rename(final + ".tmp", final)
        return msg_id

    # -- pull / ack ----------------------------------------------------
    def _acked(self, subscription: str) -> set[str]:
        sub = os.path.join(self.path, _SUBS_DIR, subscription)
        if not os.path.isdir(sub):
            raise FileNotFoundError(
                f"no subscription {subscription!r} on queue {self.path!r}"
            )
        return set(os.listdir(sub))

    def pull(
        self, subscription: str, max_messages: int = 1
    ) -> Iterator[tuple[str, str]]:
        """Up to ``max_messages`` (ack_id, payload) pairs, oldest
        first.  Unacked messages reappear on the next pull —
        at-least-once, exactly like the reference's Pub/Sub pull."""
        acked = self._acked(subscription)
        names = sorted(
            n
            for n in os.listdir(self.path)
            if n != _SUBS_DIR and not n.endswith(".tmp") and n not in acked
        )
        for name in names[:max_messages]:
            with open(
                os.path.join(self.path, name), encoding="utf-8", newline=""
            ) as f:
                yield name, f.read()

    def ack(self, subscription: str, ack_id: str) -> None:
        marker = os.path.join(self.path, _SUBS_DIR, subscription, ack_id)
        with open(marker, "w", encoding="utf-8"):
            pass


class IOQueue(FileQueue):
    """I/O report flavor: validates on publish (reference IOPublisher
    publishes schema-validated reports only)."""

    def publish_report(self, report: dict[str, Any]) -> str:
        from kcidb_spark.schema.io import validate

        validate(report)
        return self.publish(json.dumps(report), suffix="json")

    def pull_reports(
        self, subscription: str, max_messages: int = 1
    ) -> Iterator[tuple[str, dict[str, Any]]]:
        for ack_id, payload in self.pull(subscription, max_messages):
            yield ack_id, json.loads(payload)


class PatternQueue(FileQueue):
    """ORM-pattern flavor: payload is the canonical repr of a parsed
    pattern set, one pattern per line (reference ORMPatternPublisher)."""

    def publish_patterns(self, pattern_lines: list[str]) -> str:
        from kcidb_spark.orm import parse_pattern

        parsed: set = set()
        for line in pattern_lines:
            line = line.strip()
            if line:
                parsed |= parse_pattern(line)
        # parse_pattern returns a SET; sort reprs so the queued payload
        # is deterministic.
        return self.publish(
            "".join(r + "\n" for r in sorted(repr(p) for p in parsed)),
            suffix="pattern",
        )


class EmailQueue(FileQueue):
    """Email flavor: RFC-822 message text (reference EmailPublisher
    parses stdin with the SMTPUTF8 policy; stored verbatim here)."""

    def publish_email(self, rfc822_text: str) -> str:
        import email.parser
        import email.policy

        # Parse to validate structure; store the original text.
        email.parser.Parser(policy=email.policy.SMTPUTF8).parsestr(
            rfc822_text
        )
        return self.publish(rfc822_text, suffix="eml")
