"""Notification message templating.

Reference: the monitor renders subject/body per object through Jinja2
templates (kcidb/monitor/output.py:175-241, one template pair per
subscription under kcidb/monitor/templates/).  Spark-first redesign:
a template is COMPILED to a JVM-side Column expression — rendering
happens inside whole-stage codegen during the subscription match scan,
not row-at-a-time in Python.  ``{field}`` placeholders substitute
(stringified, NULL → "") columns of the subscription's canonical type
view; ``{{``/``}}`` escape literal braces.  Jinja2-style control flow
(loops/conditionals) is out of scope by design: the reference's
templates are field interpolation over one object, which this covers;
anything fancier belongs in a Pandas UDF the caller supplies as a raw
Column.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_PLACEHOLDER = re.compile(r"\{([A-Za-z_][A-Za-z0-9_.]*)\}")
_ESC_OPEN = "\x00OPEN\x00"
_ESC_CLOSE = "\x00CLOSE\x00"


def template_column(template: str) -> Column:
    """Compile a ``{field}`` template string into a string Column.

    >>> df.select(template_column("build {id}: {status}").alias("s"))

    Placeholders may dot into struct members (``{environment.comment}``).
    NULL fields render as the empty string, so one NULL member cannot
    nullify the whole message (concat semantics would).
    """
    text = template.replace("{{", _ESC_OPEN).replace("}}", _ESC_CLOSE)
    cols: list[Column] = []
    pos = 0
    for m in _PLACEHOLDER.finditer(text):
        if m.start() > pos:
            cols.append(F.lit(_unescape(text[pos:m.start()])))
        cols.append(F.coalesce(F.col(m.group(1)).cast("string"), F.lit("")))
        pos = m.end()
    if pos < len(text):
        cols.append(F.lit(_unescape(text[pos:])))
    if not cols:
        return F.lit("")
    return F.concat(*cols)


def _unescape(s: str) -> str:
    return s.replace(_ESC_OPEN, "{").replace(_ESC_CLOSE, "}")
