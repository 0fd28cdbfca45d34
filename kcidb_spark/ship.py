"""Self-shipping: make ``kcidb_spark`` importable on executors.

Every Arrow-batched Python stage (``mapInPandas`` /
``applyInPandasWithState``) pickles its UDF by *reference* to this
package, so executor Python workers must be able to
``import kcidb_spark``.  That is true by accident when the driver runs
from the repo root (workers inherit the cwd), and false everywhere
else — a foreign-cwd driver, and every real multi-executor cluster,
where the package only exists on the submitting machine.

The portable mechanism is the same one used for any PySpark job
deployment: zip the package and ``SparkContext.addPyFile`` it.  Spark
distributes the zip to each executor and prepends it to the worker's
``sys.path``.  Done lazily, once per SparkContext, by the operators
that actually create Python stages — pure-JVM plans never pay for it.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIP_FLAG = "_kcidb_spark_pkg_shipped"


def _build_pkg_zip() -> str:
    """Zip this package (sources only) into the temp dir; reuse if the
    newest source is older than an existing zip."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"kcidb_spark_pkg_{os.getuid()}.zip"
    )
    sources = []
    for root, dirs, files in os.walk(pkg_dir):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for fn in files:
            if fn.endswith(".py"):
                sources.append(os.path.join(root, fn))
    newest = max(os.path.getmtime(p) for p in sources)
    if os.path.exists(zip_path) and os.path.getmtime(zip_path) > newest:
        return zip_path
    tmp = zip_path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for path in sorted(sources):
            arcname = os.path.join(
                "kcidb_spark", os.path.relpath(path, pkg_dir)
            )
            zf.write(path, arcname)
    os.replace(tmp, zip_path)
    return zip_path


def ensure_package_shipped(spark: SparkSession) -> None:
    """Idempotently ship this package to the session's executors."""
    sc = spark.sparkContext
    if getattr(sc, _SHIP_FLAG, False):
        return
    sc.addPyFile(_build_pkg_zip())
    setattr(sc, _SHIP_FLAG, True)
