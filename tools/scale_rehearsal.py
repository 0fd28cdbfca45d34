#!/usr/bin/env python
"""Scale rehearsal: run the dedup family + pipeline_assemble_corpus at
~10× sf0.1 and record wall times plus per-query shuffle volume.

The point is to catch toy-scale illusions: a plan whose shuffle bytes
or peak partition size grows superlinearly between sf0.1 and 10× that
would not survive 100 TB.  Synthesized input replicates sf0.1
documents/embeddings K× with perturbed ids/text/vectors — same
distributions, K× the rows — written once to a temp dir and reused.

Usage:  python tools/scale_rehearsal.py [K] [out.json]

Shuffle metrics come from the local UI's REST API (enabled just for
this session): per-stage shuffle read/write bytes aggregated per
query via job groups.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    "dedup_exact",
    "dedup_near_normalized",
    "minhash_signature",
    "lsh_candidate_pairs",
    "jaccard_verify_pairs",
    "jaccard_estimate_minhash",
    "simhash_hamming_pairs",
    "dedup_cluster_components",
    "dedup_embedding_cosine",
    "semdedup_prune",
    "pipeline_clean_corpus",
    "pipeline_assemble_corpus",
]

BASE_SF = "/root/testdata/sf0.1"


def synthesize(spark, k: int, out_dir: str) -> None:
    """K× replication of sf0.1 with deterministic perturbation."""
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(out_dir, "_SYNTH_DONE")):
        return
    os.makedirs(out_dir, exist_ok=True)
    reps = spark.range(k).select(F.col("id").alias("rep"))

    docs = spark.read.parquet(os.path.join(BASE_SF, "documents.parquet"))
    n_docs = docs.count()
    (
        docs.crossJoin(reps)
        .withColumn(
            "text",
            # rep 0 keeps original text (preserves the near-dup
            # structure); other reps get a distinct suffix token so
            # replicas aren't trivial full-corpus duplicates.
            F.when(F.col("rep") == 0, F.col("text")).otherwise(
                F.concat(F.col("text"), F.lit(" rep"), F.col("rep"))
            ),
        )
        .select(
            (F.col("doc_id") + F.col("rep") * F.lit(n_docs)).alias("doc_id"),
            "text",
            "lang",
            "source",
            F.length("text").cast("long").alias("n_chars"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "documents.parquet"))
    )

    emb = spark.read.parquet(os.path.join(BASE_SF, "embeddings.parquet"))
    n_emb = emb.count()
    (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * F.lit(n_emb)).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: (
                    x
                    + (F.col("rep").cast("float") * (i.cast("float") + 1.0))
                    / F.lit(10000.0)
                ).cast("float"),
            ).alias("embedding"),
            "label",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "embeddings.parquet"))
    )
    # The non-scaled tables pass through (queries resolve all tables
    # from one sf dir).
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        spark.read.parquet(os.path.join(BASE_SF, f"{t}.parquet")) \
            .write.mode("overwrite") \
            .parquet(os.path.join(out_dir, f"{t}.parquet"))
    with open(os.path.join(out_dir, "_SYNTH_DONE"), "w") as f:
        f.write("ok")


def _stage_metrics(ui: str) -> dict[int, dict]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )
    return {
        s["stageId"]: {
            "shuffle_read": s.get("shuffleReadBytes", 0),
            "shuffle_write": s.get("shuffleWriteBytes", 0),
            "input": s.get("inputBytes", 0),
            "tasks": s.get("numCompleteTasks", 0),
        }
        for s in stages
    }


def run(sf_dir: str, label: str, spark) -> dict:
    from kcidb_spark.cache import release_persisted
    from kcidb_spark.queries import REGISTRY

    ui = "http://127.0.0.1:4040"
    out = {}
    for name in QUERIES:
        before = _stage_metrics(ui)
        t0 = time.perf_counter()
        df = REGISTRY[name].spark(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        wall = round(time.perf_counter() - t0, 3)
        release_persisted()
        after = _stage_metrics(ui)
        new = {k: v for k, v in after.items() if k not in before}
        out[name] = {
            "wall_s": wall,
            "shuffle_write_mb": round(
                sum(v["shuffle_write"] for v in new.values()) / 2**20, 2
            ),
            "shuffle_read_mb": round(
                sum(v["shuffle_read"] for v in new.values()) / 2**20, 2
            ),
            "input_mb": round(
                sum(v["input"] for v in new.values()) / 2**20, 2
            ),
            "stages": len(new),
        }
        print(label, name, out[name], flush=True)
    return out


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_rehearsal.json"
    scaled_dir = f"/tmp/kcidb_scale/sf{k}x"

    from kcidb_spark.session import get_spark

    spark = get_spark(
        app_name="scale_rehearsal",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    synthesize(spark, k, scaled_dir)

    result = {
        "k": k,
        "base": run(BASE_SF, "sf0.1", spark),
        "scaled": run(scaled_dir, f"{k}x", spark),
    }
    # Scaling factor per query: wall and shuffle growth vs data growth.
    result["ratios"] = {
        name: {
            "wall": round(
                result["scaled"][name]["wall_s"]
                / max(result["base"][name]["wall_s"], 1e-9),
                2,
            ),
            "shuffle_write": round(
                result["scaled"][name]["shuffle_write_mb"]
                / max(result["base"][name]["shuffle_write_mb"], 1e-9),
                2,
            ),
        }
        for name in QUERIES
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["ratios"], indent=1))


if __name__ == "__main__":
    main()
