"""Scalar-function parity surface (SURVEY.md §2.8).

Implements the reference's custom SQL functions and value walkers as
pure JVM-side Column expressions wherever possible — no Python UDFs:

* :func:`encode_uri_component` — F6, the reference's custom
  PostgreSQL function (postgresql/v04_05.py:10-32): percent-encode
  every character outside the unreserved set, UTF-8 byte-wise.
* :func:`last_error_line` — F12, log-excerpt error extraction
  (kcidb/oo/__init__.py:558-586): LAST line matching a pattern.
* :func:`notification_id` — F13, base64-composed notification ids
  (kcidb/monitor/output.py:113-140,162-174).
* :func:`reject_nul` — F16, the NUL-character walker the MQ codec
  runs before publishing (kcidb/mq/__init__.py:448-466).
* :func:`walk_urls` — S13, the spec-driven URL field walk the cache
  pipeline applies to reports (main.py:232-283).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

#: encodeURIComponent's unreserved set (characters emitted verbatim),
#: as it appears INSIDE a SQL single-quoted literal: the quote is
#: doubled, and the dash sits last in the class so it can't form a
#: range after literal processing.
_URI_UNRESERVED = "[A-Za-z0-9_.!~*''()-]"


def encode_uri_component_sql(col_sql: str) -> str:
    """SQL-text form of :func:`encode_uri_component` over a column
    expression (for use inside larger F.expr strings)."""
    return (
        f"array_join(transform(split({col_sql}, ''),"
        f" ch -> CASE WHEN ch rlike '{_URI_UNRESERVED}' THEN ch"
        f" ELSE regexp_replace(upper(hex(encode(ch, 'UTF-8'))), '(..)', '%$1')"
        f" END), '')"
    )


def encode_uri_component(col_sql: str) -> Column:
    """Percent-encode a string column, JS-``encodeURIComponent`` style.

    Pure JVM expression: split to characters, keep unreserved ones,
    hex-encode the UTF-8 *bytes* of everything else (multi-byte safe —
    'é' → '%C3%A9'), rejoin.  The reference does this as a custom
    in-database SQL function (F6); here it composes into any
    projection.  ``col_sql`` is the SQL text of a string column.
    """
    return F.expr(encode_uri_component_sql(col_sql))


def last_error_line(excerpt_sql: str, pattern: str = "(?i)error|warn|fail") -> Column:
    """LAST line of a log excerpt matching ``pattern`` (F12 — the
    reference scans lines in reverse and returns the first hit, i.e.
    the last matching line).  NULL when nothing matches."""
    return F.expr(
        f"try_element_at(filter(split({excerpt_sql}, '\n'),"
        f" l -> l rlike '{pattern}'), -1)"
    )


def notification_id(
    subscription: Column | str, obj_type: Column | str, obj_id: Column | str,
    message_id: Column | str,
) -> Column:
    """Deterministic notification id
    ``subscription:type:b64(obj_id):b64(msg_id)`` (F13/T6; reference
    kcidb/monitor/output.py:162-174) — the spool dedup key."""

    def b64(c: Column | str) -> Column:
        # Strip the CRLF line-wrap Spark's MIME base64 inserts every
        # 76 chars (DuckDB's to_base64 is unwrapped; ids must be
        # single-line — they travel in e-mail headers).
        return F.regexp_replace(
            F.base64(F.encode(F.col(c) if isinstance(c, str) else c, "UTF-8")),
            "[\\r\\n]",
            "",
        )

    parts = [
        F.col(subscription) if isinstance(subscription, str) else subscription,
        F.col(obj_type) if isinstance(obj_type, str) else obj_type,
        b64(obj_id),
        b64(message_id),
    ]
    return F.concat_ws(":", *parts)


def reject_nul(data: Any, path: str = "$") -> None:
    """Raise ValueError if any string in a JSON-ish value contains a
    NUL character (F16 — the reference refuses to publish such data;
    mq/__init__.py:448-466)."""
    if isinstance(data, str):
        if "\0" in data:
            raise ValueError(f"NUL character in string at {path}")
    elif isinstance(data, dict):
        for k, v in data.items():
            reject_nul(k, f"{path}.{k}")
            reject_nul(v, f"{path}.{k}")
    elif isinstance(data, (list, tuple)):
        for i, v in enumerate(data):
            reject_nul(v, f"{path}[{i}]")


#: URL-bearing fields per object list (subset of the reference's cache
#: spec, main.py:232-283): scalar URL fields and {name,url} resource
#: lists.
URL_SPEC: dict[str, dict[str, str]] = {
    "checkouts": {
        "log_url": "scalar",
        "patchset_files": "resources",
    },
    "builds": {
        "log_url": "scalar",
        "config_url": "scalar",
        "input_files": "resources",
        "output_files": "resources",
    },
    "tests": {
        "log_url": "scalar",
        "output_files": "resources",
        "input_files": "resources",
    },
    "issues": {"report_url": "scalar"},
    "incidents": {},
}


def walk_urls(report: dict[str, Any]) -> list[str]:
    """All artifact URLs in an I/O report, spec-driven (S13).  Order:
    object order within each list, spec order within each object."""
    urls: list[str] = []
    for table, spec in URL_SPEC.items():
        for obj in report.get(table, []):
            for field, kind in spec.items():
                val = obj.get(field)
                if val is None:
                    continue
                if kind == "scalar":
                    urls.append(val)
                else:
                    urls.extend(
                        r["url"] for r in val if isinstance(r, dict) and "url" in r
                    )
    return urls


def iso_utc_timestamps(spark, df):
    """Replace every top-level TimestampType column with its ISO-8601
    UTC string (``yyyy-MM-ddTHH:mm:ss.SSSSSS+00:00``), engine-side.

    Timestamps must leave the engine as strings or epoch integers:
    PySpark's collect/toLocalIterator renders TimestampType via the
    *driver process's local* timezone (``spark.sql.session.timeZone``
    does not govern that path), so collected datetimes are silently
    shifted on any non-UTC driver.  ``date_format`` DOES honor the
    session timezone, which this helper pins to UTC first.
    """
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if not any(isinstance(f.dataType, T.TimestampType) for f in df.schema.fields):
        return df
    return df.select(
        *[
            F.concat(
                F.date_format(F.col(f.name), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
                F.lit("+00:00"),
            ).alias(f.name)
            if isinstance(f.dataType, T.TimestampType)
            else F.col(f.name)
            for f in df.schema.fields
        ]
    )
