"""Hashed bag-of-words linear classifier — the fastText/CCNet-shape
quality gate (VERDICT r12 "Next round" #6).

Production corpus pipelines gate documents with a tiny linear model
over hashed n-gram features (Joulin et al. 2016 "Bag of Tricks";
CCNet's fastText LM filter): cheap enough to score petabytes, trained
on a distillation target (wiki-vs-crawl, lang id, quality votes).
This module gives the engine that shape, Spark-first:

* FEATURES: one corpus pass — tokenize, hash each term into a fixed
  bucket space (``pmod(xxhash64(w), D)``), per-document counts
  normalized by document length (fastText's mean-of-embeddings
  posture).  The feature frame is the only corpus-sized structure.
* TRAIN: full-batch logistic regression with the weight vector
  DRIVER-HELD between epochs (D doubles — control-plane, the
  Lloyd/OPQ posture).  Each epoch is two aggregations over the
  persisted feature frame: scores (features ⋈ broadcast weights →
  per-doc partial sum) and gradients (features ⋈ per-doc errors →
  per-bucket partial sum, ≤ D rows collected).  No per-row Python;
  sigmoid/log run as JVM expressions.
* SCORE: features ⋈ broadcast weights → per-doc partial-agg sum —
  the map-side pass a 100 TB gate needs (one shuffle by doc_id,
  collapsed map-side by the partial aggregation).

Float determinism is NOT claimed: double sums are aggregation-order
dependent, so the trainer is rows-only in the registry (the
BPE/unigram-tokenizer precedent) with its property harness in
tests/test_textclf.py — separable-corpus accuracy, tolerance
agreement with a pure-Python reference (reference_train below), and
prediction parity.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from kcidb_spark.localrel import local_df


def hash_features(
    docs: DataFrame, n_buckets: int, text_col: str = "text"
) -> DataFrame:
    """(doc_id, f, x): hashed unigram features, count-normalized by
    document length.  Collisions fold additively (the feature-hashing
    trick's contract)."""
    from pyspark.sql import Window as W

    from kcidb_spark.queries.pipeline import _norm_text

    toks = docs.select(
        "doc_id",
        F.explode(F.split(_norm_text(F.col(text_col)), " ")).alias("w"),
    )
    tf = toks.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    dlen = F.sum("c").over(W.partitionBy("doc_id"))
    return (
        tf.withColumn("len", dlen)
        .withColumn("f", F.expr(f"pmod(xxhash64(w), {n_buckets})"))
        .groupBy("doc_id", "f")
        .agg((F.sum("c") / F.first("len")).alias("x"))
    )


def logreg_train(
    feats: DataFrame,
    labels: DataFrame,
    n_buckets: int,
    epochs: int = 3,
    lr: float = 2.0,
    l2: float = 0.0,
) -> tuple[list[float], float, list[dict]]:
    """Full-batch gradient descent; returns (weights, bias, history).

    ``feats``: (doc_id, f, x) — persist before calling (every epoch
    re-scans it twice).  ``labels``: (doc_id, y) with y ∈ {0.0, 1.0}.
    history: one dict per epoch {"epoch", "n_docs", "loss"} (mean
    log-loss BEFORE that epoch's update)."""
    spark = feats.sparkSession
    w: dict[int, float] = {}
    b = 0.0
    history: list[dict] = []
    n_docs = labels.count()
    for ep in range(epochs):
        if n_docs == 0:
            history.append({"epoch": ep, "n_docs": 0, "loss": 0.0})
            continue
        wdf = local_df(
            spark, list(w.items()) or [(0, 0.0)], "f bigint, wt double"
        )
        scored = (
            feats.join(F.broadcast(wdf), on="f", how="left")
            .groupBy("doc_id")
            .agg(
                (
                    F.coalesce(
                        F.sum(F.col("x") * F.col("wt")), F.lit(0.0)
                    )
                    + F.lit(b)
                ).alias("s")
            )
            .join(labels, on="doc_id")
        )
        # err = sigmoid(s) − y; loss via the stable log1p(exp(·))
        # form: log(1+e^s) − y·s.
        err = scored.select(
            "doc_id",
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("s"))) - F.col("y"))
            .alias("e"),
            (
                F.when(
                    F.col("s") > 0,
                    F.col("s") + F.log1p(F.exp(-F.col("s"))),
                ).otherwise(F.log1p(F.exp(F.col("s"))))
                - F.col("y") * F.col("s")
            ).alias("l"),
        )
        agg = err.agg(
            F.sum("e").alias("ge"), F.sum("l").alias("ll")
        ).collect()[0]
        grads = (
            feats.join(err.select("doc_id", "e"), on="doc_id")
            .groupBy("f")
            .agg(F.sum(F.col("x") * F.col("e")).alias("g"))
        ).collect()
        history.append(
            {
                "epoch": ep,
                "n_docs": n_docs,
                "loss": float(agg["ll"]) / n_docs,
            }
        )
        for r in grads:
            f_id = int(r["f"])
            w[f_id] = w.get(f_id, 0.0) - lr * (
                float(r["g"]) / n_docs + l2 * w.get(f_id, 0.0)
            )
        b -= lr * float(agg["ge"]) / n_docs
    weights = [0.0] * n_buckets
    for f_id, wt in w.items():
        weights[f_id] = wt
    return weights, b, history


def logreg_score(
    feats: DataFrame, weights: list[float], bias: float
) -> DataFrame:
    """(doc_id, score, pred): broadcast map-side scoring — the 100 TB
    gate pass.  score = sigmoid input (the logit); pred = score > 0."""
    spark = feats.sparkSession
    wdf = local_df(
        spark,
        [(i, wt) for i, wt in enumerate(weights) if wt != 0.0]
        or [(0, 0.0)],
        "f bigint, wt double",
    )
    return (
        feats.join(F.broadcast(wdf), on="f", how="left")
        .groupBy("doc_id")
        .agg(
            (
                F.coalesce(F.sum(F.col("x") * F.col("wt")), F.lit(0.0))
                + F.lit(bias)
            ).alias("score")
        )
        .select(
            "doc_id",
            "score",
            (F.col("score") > 0).cast("bigint").alias("pred"),
        )
    )


def reference_train(
    rows: list[tuple[int, int, float]],
    labels: dict[int, float],
    n_buckets: int,
    epochs: int = 3,
    lr: float = 2.0,
    l2: float = 0.0,
) -> tuple[list[float], float]:
    """Pure-Python replica of logreg_train's arithmetic for the
    property harness: same updates, same loss form, numpy-free.
    ``rows``: collected (doc_id, f, x) triples — hashing happens once
    in Spark so the comparison isolates the TRAINING math."""
    w = [0.0] * n_buckets
    b = 0.0
    docs = sorted(labels)
    n = len(docs)
    by_doc: dict[int, list[tuple[int, float]]] = {d: [] for d in docs}
    for d, f, x in rows:
        by_doc[d].append((f, x))
    for _ in range(epochs):
        if n == 0:
            continue
        grad = [0.0] * n_buckets
        gb = 0.0
        for d in docs:
            s = b + sum(w[f] * x for f, x in by_doc[d])
            e = 1.0 / (1.0 + math.exp(-s)) - labels[d]
            for f, x in by_doc[d]:
                grad[f] += x * e
            gb += e
        for f in range(n_buckets):
            if grad[f] or w[f]:
                w[f] -= lr * (grad[f] / n + l2 * w[f])
        b -= lr * gb / n
    return w, b
