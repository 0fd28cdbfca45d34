"""kcidb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of kernelci/kcidb, re-expressed Spark-first.

The reference (read-only at /root/reference) is a Python service that
generates SQL for BigQuery/PostgreSQL/SQLite.  This package instead
declares every operator with the DataFrame / Spark SQL API so Catalyst
and Tungsten own the physical plan: predicate pushdown, column pruning,
broadcast-vs-shuffle join selection, whole-stage codegen, and AQE all
come for free from the declarative plan.

Layout:
    session     — tuned SparkSession builders
    tables      — parquet table catalog over the synthetic test data
    queries     — registry of oracle-checked analytic queries
    schema      — kcidb I/O schema (5 tables + derived types) as StructTypes
    store       — append + dedup-view storage with kcidb merge semantics
    closure     — parents/children relational closure queries
    orm         — pattern query language (">checkout[x]#>build#")
    oo          — derived analytics (status rollups, test path trees)
    operators   — large-scale pipeline ops (dedup, similarity, text)
    streaming   — Structured Streaming ingest pipeline
"""

__version__ = "0.1.0"
