"""Property harness for the fastText-shape quality classifier
(operators/textclf.py) — the registry entries are rows-only (float
training is not cross-engine hashable), so the LEARNING contract
lives here:

* SEPARABLE CORPUS: on a vocabulary-separable two-class corpus the
  trained gate reaches ≥0.95 training accuracy in a few epochs;
* REFERENCE AGREEMENT: the distributed trainer's weights/bias match a
  pure-Python replica of the same arithmetic to float tolerance
  (hashing is done once in Spark and shared, so the comparison
  isolates the gradient math), and predictions agree exactly;
* the broadcast scoring pass labels every document (row totality).
"""

from __future__ import annotations

from pyspark.sql import Row

from kcidb_spark.operators.textclf import (
    hash_features,
    logreg_score,
    logreg_train,
    reference_train,
)

D = 64
GOOD = "clean prose with citations and structure".split()
BAD = "buy now click spam winner free".split()


def _corpus(spark, n=40):
    rows = []
    for i in range(n):
        vocab = GOOD if i % 2 == 0 else BAD
        text = " ".join(vocab[(i + j) % len(vocab)] for j in range(12))
        rows.append(Row(doc_id=i, text=text, y=float(i % 2 == 0)))
    return spark.createDataFrame(
        rows, "doc_id long, text string, y double"
    )


def test_separable_corpus_accuracy(spark):
    docs = _corpus(spark)
    feats = hash_features(docs, D).persist()
    labels = docs.select("doc_id", "y")
    try:
        w, b, hist = logreg_train(feats, labels, D, epochs=6, lr=4.0)
        scored = logreg_score(feats, w, b).join(labels, on="doc_id")
        n = scored.count()
        correct = scored.filter(
            (scored["pred"] == 1) == (scored["y"] == 1.0)
        ).count()
        assert correct / n >= 0.95, (correct, n)
        # Full-batch GD on a separable problem: loss is monotone
        # non-increasing across the recorded epochs.
        losses = [h["loss"] for h in hist]
        assert all(a >= b_ - 1e-12 for a, b_ in zip(losses, losses[1:]))
    finally:
        feats.unpersist()


def test_agreement_with_reference_trainer(spark):
    docs = _corpus(spark, n=20)
    feats = hash_features(docs, D).persist()
    labels = docs.select("doc_id", "y")
    try:
        w, b, _ = logreg_train(feats, labels, D, epochs=3, lr=2.0)
        rows = [
            (int(r["doc_id"]), int(r["f"]), float(r["x"]))
            for r in feats.collect()
        ]
        ydict = {int(r["doc_id"]): float(r["y"]) for r in labels.collect()}
        w_ref, b_ref = reference_train(rows, ydict, D, epochs=3, lr=2.0)
        assert abs(b - b_ref) < 1e-9
        assert all(abs(a - c) < 1e-9 for a, c in zip(w, w_ref))
        preds = {
            int(r["doc_id"]): int(r["pred"])
            for r in logreg_score(feats, w, b).collect()
        }
        ref_preds = {
            d: int(
                b_ref
                + sum(
                    w_ref[f] * x for dd, f, x in rows if dd == d
                )
                > 0
            )
            for d in ydict
        }
        assert preds == ref_preds
    finally:
        feats.unpersist()


def test_scoring_is_total_over_the_corpus(spark):
    docs = _corpus(spark, n=30)
    feats = hash_features(docs, D)
    w = [0.0] * D
    scored = logreg_score(feats, w, 0.5)
    rows = scored.collect()
    assert len(rows) == 30
    assert all(r["pred"] == 1 for r in rows)      # bias-only gate
