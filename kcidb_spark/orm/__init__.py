"""ORM layer: 7-type object schema + pattern query language.

Reference: kcidb/orm/data.py (type schema), kcidb/orm/query.py
(pattern grammar + parsing), compiled to SQL at
kcidb/db/postgresql/v04_00.py:784-907.  Here patterns compile to
DataFrame join chains over canonical type views.
"""

from kcidb_spark.orm.types import TYPES, Relation, type_views  # noqa: F401
from kcidb_spark.orm.pattern import Pattern, parse_pattern  # noqa: F401
from kcidb_spark.orm.compiler import compile_patterns  # noqa: F401
