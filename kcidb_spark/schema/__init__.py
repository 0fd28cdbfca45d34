"""kcidb I/O schema as Spark StructTypes + the object graph.

Re-expresses the reference's v5.3 database schema
(kcidb/db/postgresql/v04_00.py:202-264 plus version deltas, SURVEY.md
§1.3) Spark-first: nested JSON objects stay nested StructTypes (no
dotted-column flattening — Spark handles structs natively), resource
lists are array<struct<name,url>>, free-form ``misc`` is a JSON
string parsed on demand with from_json/get_json_object.
"""

from kcidb_spark.schema.graph import (  # noqa: F401
    EDGES,
    ID_FIELDS,
    TABLES,
    Edge,
    children_of,
    parents_of,
)
from kcidb_spark.schema.types import (  # noqa: F401
    METADATA_FIELDS,
    SCHEMAS,
    STATUS_VALUES,
    schema_for,
)
from kcidb_spark.schema.io import (  # noqa: F401
    IO_VERSION,
    count,
    merge,
    new,
    upgrade,
    validate,
)
