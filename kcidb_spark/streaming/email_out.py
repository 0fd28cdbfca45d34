"""Notification → e-mail rendering (the send-path endpoint).

Reference semantics (kcidb/monitor/output.py:175-241): subject capped
at 256 chars with a scissors marker on truncation and control
characters replaced; body capped at 64 KiB with the same marker; the
message carries To/Cc/Bcc, the notification id headers, a plain-text
part, and an HTML alternative that wraps the escaped text in <pre>
with bare URLs linkified.

This stage is driver-side Python BY DESIGN: it runs on rows already
picked from the spool for sending (human-scale — an e-mail per
notification), the same boundary where the reference hands off to
SMTP.  Everything upstream (matching, rendering the text itself)
is engine-side; see streaming/render.py.
"""

from __future__ import annotations

import html
import re
import textwrap
from email.message import EmailMessage

#: kcidb/monitor/output.py:17-26.
SUBJECT_INVALID_CHARS = "\x00-\x1f\x7f"
SUBJECT_RE = re.compile(f"[^{SUBJECT_INVALID_CHARS}]*")
SUBJECT_MAX_LEN = 256
BODY_MAX_LEN = 64 * 1024

_URL_RE = re.compile(r"((http|https|git|ftp)://[^\s]+)")


def clamp_subject(subject: str) -> str:
    """Truncate to the cap (scissors marker) and strip control chars
    (replacement marker) — reference output.py:189-201."""
    if len(subject) > SUBJECT_MAX_LEN:
        subject = subject[: SUBJECT_MAX_LEN - 2] + "✂️"
    if not SUBJECT_RE.fullmatch(subject):
        subject = re.sub(f"[{SUBJECT_INVALID_CHARS}]", "⯑", subject)
    return subject


def clamp_body(body: str) -> str:
    if len(body) > BODY_MAX_LEN:
        body = body[: BODY_MAX_LEN - 2] + "✂️"
    return body


def render_email(
    subject: str,
    body: str,
    to: list[str],
    notification_id: str,
    message_id: str = "",
    cc: list[str] | None = None,
    bcc: list[str] | None = None,
) -> EmailMessage:
    """One notification as an EmailMessage (missing the From header,
    which the deployment's sender adds — reference render())."""
    subject = clamp_subject(subject)
    body = clamp_body(body)

    email = EmailMessage()
    email["Subject"] = subject
    email["To"] = ", ".join(to)
    if cc:
        email["Cc"] = ", ".join(cc)
    if bcc:
        email["Bcc"] = ", ".join(bcc)
    email["X-KCIDB-Notification-ID"] = notification_id
    email["X-KCIDB-Notification-Message-ID"] = message_id
    email.set_content(body)

    escaped_subject = html.escape(subject, quote=True)
    escaped_body = html.escape(body, quote=True)
    linked_body = _URL_RE.sub(r'<a href="\1">\1</a>', escaped_body)
    html_body = textwrap.dedent(
        """\
        <html>
            <head>
                <title>{}</title>
            </head>
            <body>
                <pre>{}</pre>
            </body>
        </html>
    """
    ).format(escaped_subject, linked_body)
    email.add_alternative(html_body, subtype="html")
    return email
