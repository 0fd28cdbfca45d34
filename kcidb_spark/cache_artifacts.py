"""Artifact-cache planning over report URLs — the Spark-native analog
of the reference's URL cache (kcidb/cache/__init__.py:52-128: hash the
URL to an object name, sample a deterministic subset, skip what is
already cached, enforce size caps while fetching, record the blob).

The *analytic* half — which URLs to fetch, dedup against the existing
index, per-host politeness caps — is distributed DataFrame work and
lives here.  The *network* half is a per-row callable injected into an
Arrow-batched ``mapInPandas`` stage; this container has no network
stack, so the default fetcher raises ``NotImplementedError`` (a
deliberate seam, mirroring operators/multimodal.py's codec stubs) and
tests inject a deterministic fake.
"""

from __future__ import annotations

import os
from typing import Callable, Iterator, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kcidb_spark.ship import ensure_package_shipped

#: Reference trial-period sampling: cache every 256th URL only
#: (object_name.endswith("00"), kcidb/cache/__init__.py:63-65).
SAMPLE_SUFFIX = "00"

_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("object_name", T.StringType(), False),
        T.StructField("url", T.StringType()),
        T.StructField("size", T.LongType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("cached_at", T.TimestampType()),
    ]
)

_FETCH_RESULT_SCHEMA = (
    "object_name string, url string, size long, content_type string,"
    " ok boolean"
)


def object_name_col(url) -> "F.Column":
    """Deterministic cache object name for a URL column (the
    reference hashes URLs to blob names; md5 here — both engines and
    every executor agree on it)."""
    return F.md5(url)


def no_network_fetcher(url: str, max_size: int) -> Optional[tuple]:
    """Placeholder fetcher — this environment has no network stack.
    Inject a real (or fake) fetcher into :meth:`ArtifactCache.store`.
    Returns (content_bytes, content_type) or None to skip."""
    raise NotImplementedError(
        "network fetch is environment-specific; inject a fetcher"
    )


class ArtifactCache:
    """Parquet-indexed artifact cache with distributed fetch planning."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        max_store_size: int = 5 * 1024 * 1024,
        sample: bool = True,
    ):
        self.spark = spark
        self.root = root
        self.max_store_size = max_store_size
        self.sample = sample
        os.makedirs(root, exist_ok=True)

    # -- index ---------------------------------------------------------

    def _index_path(self) -> str:
        return os.path.join(self.root, "index")

    def index(self) -> DataFrame:
        import glob

        if not glob.glob(os.path.join(self._index_path(), "*.parquet")):
            return self.spark.createDataFrame([], _INDEX_SCHEMA)
        return self.spark.read.schema(_INDEX_SCHEMA).parquet(
            self._index_path()
        )

    # -- planning ------------------------------------------------------

    def plan(
        self, urls: DataFrame, per_host_cap: int = 64
    ) -> DataFrame:
        """(object_name, url, host) of URLs worth fetching: distinct →
        trial-sample gate (deterministic 1/256, the reference's
        ``endswith("00")``) → anti-join the already-cached index →
        per-host cap (politeness / hot-host protection).

        Scale shape: the sample gate is a map-side filter that drops
        255/256 of the input before any shuffle; the anti-join ships
        32-byte object names; the per-host cap compiles to
        WindowGroupLimit so each partial keeps ≤cap rows per host.
        ``urls`` is one string column named ``url``.
        """
        from pyspark.sql import Window as W

        named = (
            urls.select(F.col("url"))
            .where(F.col("url").isNotNull())
            .distinct()
            .withColumn("object_name", object_name_col(F.col("url")))
        )
        if self.sample:
            named = named.filter(
                F.col("object_name").endswith(SAMPLE_SUFFIX)
            )
        fresh = named.join(
            self.index().select("object_name"), on="object_name",
            how="left_anti",
        ).withColumn(
            "host",
            F.parse_url(F.col("url"), F.lit("HOST")),
        )
        w = W.partitionBy("host").orderBy("object_name")
        return (
            fresh.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= per_host_cap)
            .select("object_name", "url", "host")
        )

    # -- fetching ------------------------------------------------------

    def store(
        self,
        plan: DataFrame,
        fetcher: Callable[[str, int], Optional[tuple]] = no_network_fetcher,
    ) -> int:
        """Execute a fetch plan: the fetcher runs EXECUTOR-side inside
        an Arrow-batched ``mapInPandas`` (each partition fetches its
        own hosts — with plan()'s per-host capping, one partition
        never hammers one host), results append to the index.
        Payload bytes would stream to object storage executor-side;
        the index records (size, content_type) bookkeeping like the
        reference's blob metadata.  Returns fetched count.
        """
        import pandas as pd

        max_size = self.max_store_size

        def fetch_batches(
            batches: Iterator["pd.DataFrame"],
        ) -> Iterator["pd.DataFrame"]:
            for b in batches:
                rows = []
                for r in b.itertuples(index=False):
                    got = fetcher(r.url, max_size)
                    if got is None:
                        rows.append(
                            (r.object_name, r.url, None, None, False)
                        )
                        continue
                    content, ctype = got
                    if len(content) > max_size:
                        rows.append(
                            (r.object_name, r.url, None, None, False)
                        )
                        continue
                    rows.append(
                        (r.object_name, r.url, len(content), ctype, True)
                    )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "object_name", "url", "size", "content_type", "ok",
                    ],
                )

        ensure_package_shipped(plan.sparkSession)
        fetched = plan.mapInPandas(fetch_batches, _FETCH_RESULT_SCHEMA)
        ok = (
            fetched.filter(F.col("ok"))
            .select(
                "object_name", "url", "size", "content_type",
                F.current_timestamp().alias("cached_at"),
            )
        )
        n = ok.count()
        if n:
            ok.write.mode("append").parquet(self._index_path())
        return n
