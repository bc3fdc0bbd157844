"""Distributed linear-classifier TRAINING, fully relational and
integer-exact: a batch perceptron over hashed bag-of-words features —
the fastText-style learned quality/language filter every large corpus
pipeline runs (CCNet's fastText language filter, LLaMA's quality
classifier), with the LEARNING itself expressed as DataFrame algebra
so the whole iterative optimization replays bit-for-bit in the SQL
oracle (the `bpe_train` / `kmeans_assign` property, applied to
supervised learning).

Why a perceptron (not logistic regression): its update rule is pure
integer arithmetic — score s_d = Σ_f x_{d,f}·w_f; predict
sign(s_d) with sign(0) = −1 pinned; w += Σ_{misclassified} y_d·x_d —
so distributed training is DETERMINISTIC (no float-sum reassociation
anywhere) and cross-engine exact. The classic result (Novikoff 1962)
bounds its mistakes on separable data; as a corpus-quality filter the
decision boundary, not calibrated probabilities, is what's consumed.

Scale shape: features are a (doc, bucket, count) relation — one
corpus scan, explode + groupBy (the `shingle_index` budget). Each
epoch is: one broadcast-sized weight join (D buckets ≪ corpus), one
per-doc score aggregate (shuffle on doc_id, reusable exchange), one
error semi-join, one bucket-keyed delta aggregate (map-side combined,
D-bounded output). Epochs are unrolled driver control flow — no
collect in the loop; weight relations are D rows, never corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdata06_spark.operators.textops import rolling_hash, words


def hashed_features(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", dim: int = 1024,
                    binary: bool = False) -> DataFrame:
    """(id, bucket, x): bag-of-words counts in `dim` hash buckets.
    The bucket hash is the portable polynomial rolling hash (base 31
    mod 1e9+7 — `textops.rolling_hash`) mod `dim`, so the feature map
    is bit-identical in the SQL oracle. Hash collisions are the
    standard hashing-trick trade (Weinberger et al. 2009): both
    engines collide identically, so exactness is unaffected."""
    base = (
        docs.select(F.col(id_col), F.explode(words(F.col(text_col))).alias("w"))
        .filter(F.length("w") > 0)
        .select(F.col(id_col), (rolling_hash(F.col("w")) % dim).alias("bucket"))
    )
    if binary:
        # presence features: x = 1 iff the bucket occurs. Measured to
        # matter for full-batch perceptron dynamics on this corpus:
        # count features make every update O(doc-length)-magnitude and
        # the iterates cycle at the majority-class solution (best
        # pocket error 115/500); binary features reach 1/500 within
        # 16 epochs on the same target.
        return base.distinct().withColumn("x", F.lit(1).cast("long"))
    return base.groupBy(id_col, "bucket").agg(F.count(F.lit(1)).cast("long").alias("x"))


def _score(feats: DataFrame, lab: DataFrame, w: DataFrame | None,
           id_col: str) -> DataFrame:
    """(id, y, s): integer decision scores under weights `w` (w=None →
    all-zero weights → s=0)."""
    if w is None:
        return lab.select(F.col(id_col), "y", F.lit(0).cast("long").alias("s"))
    s = (
        feats.join(F.broadcast(w), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("x") * F.col("w")).cast("long").alias("s"))
    )
    return lab.join(s, id_col, "left").select(
        F.col(id_col), "y", F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("s")
    )


def _errors(scored: DataFrame, id_col: str) -> DataFrame:
    pred = F.when(F.col("s") > 0, F.lit(1)).otherwise(F.lit(-1))
    return scored.filter(pred != F.col("y")).select(F.col(id_col), "y")


def perceptron_train(docs: DataFrame, label: Column, epochs: int = 16,
                     id_col: str = "doc_id", text_col: str = "text",
                     dim: int = 1024, binary: bool = True) -> DataFrame:
    """POCKET perceptron (Gallant 1990): run `epochs` batch-perceptron
    updates — w_k = w_{k−1} + Σ_{misclassified under w_{k−1}} y·x —
    and return the w_k with the FEWEST training errors (tie → the
    earliest epoch), weights ≠ 0 only. `label` must evaluate to ±1.

    Why pocket: the FULL-batch update (the only
    order-independent, therefore deterministic-parallel, perceptron
    step) overshoots and oscillates — measured on the fixture: error
    counts cycle 385→115→385… and the LAST iterate is near-random.
    The pocket rule keeps the best iterate instead, restoring the
    guarantee that more epochs never ship a worse model, while every
    quantity stays an integer aggregate that replays exactly in SQL
    (the per-epoch error COUNT is part of the algorithm itself — a
    bounded driver-side scalar per epoch, the `connected_components`
    control-flow contract, never row data).

    All-integer end-to-end: counts × integer weights, sign(0) pinned
    to −1. A hashed BIAS feature is the caller's choice (append a
    constant token to `text_col`, or rely on the corpus's own length
    variation)."""
    feats = hashed_features(docs, id_col, text_col, dim, binary=binary).localCheckpoint(eager=False)
    lab = docs.select(F.col(id_col), label.cast("long").alias("y"))
    w = None
    iterates: list[DataFrame] = []
    err_counts: list[DataFrame] = []
    for k in range(epochs):
        scored = _score(feats, lab, w, id_col)
        errors = _errors(scored, id_col)
        delta = (
            feats.join(errors, id_col)
            .groupBy("bucket")
            .agg(F.sum(F.col("x") * F.col("y")).cast("long").alias("d"))
        )
        if w is None:
            w = delta.select("bucket", F.col("d").alias("w"))
        else:
            w = (
                w.join(delta, "bucket", "full_outer")
                .select(
                    "bucket",
                    (F.coalesce(F.col("w"), F.lit(0)) + F.coalesce(F.col("d"), F.lit(0)))
                    .cast("long")
                    .alias("w"),
                )
            )
        # D-row relation; truncate the per-epoch lineage so epoch k's
        # plan doesn't replay epochs 1..k-1 per reference (the
        # bpe_train/pq_fit lineage rule)
        w = w.localCheckpoint(eager=False)
        iterates.append(w)
        # pocket statistic: training-error COUNT of the new iterate —
        # built as a 1-row relation and evaluated with all the others
        # in ONE action below (16 separate .count() actions measured
        # ~2x the wall time; the lazy checkpoints materialize inside
        # the single union job either way)
        err_counts.append(
            _errors(_score(feats, lab, w, id_col), id_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(k).alias("k"), "n")
        )
    all_counts = err_counts[0]
    for c in err_counts[1:]:
        all_counts = all_counts.unionAll(c)
    # one bounded action: `epochs` scalars (algorithm state, not row
    # data — the connected_components control-flow contract)
    counts = {r.k: r.n for r in all_counts.collect()}
    best_k = min(range(epochs), key=lambda k: (counts[k], k))
    return iterates[best_k].filter(F.col("w") != 0)


def perceptron_score(docs: DataFrame, weights: DataFrame,
                     id_col: str = "doc_id", text_col: str = "text",
                     dim: int = 1024, binary: bool = True) -> DataFrame:
    """(id, s, pred): integer decision scores and ±1 predictions for
    `docs` under a trained weight relation — the APPLY side (filtering
    a 100 TB corpus by a learned quality/language model is one
    broadcast join + one doc-keyed aggregate)."""
    feats = hashed_features(docs, id_col, text_col, dim, binary=binary)
    s = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("x") * F.col("w")).cast("long").alias("s"))
    )
    base = docs.select(F.col(id_col))
    return base.join(s, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("s"),
        F.when(F.coalesce(F.col("s"), F.lit(0)) > 0, F.lit(1))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("pred"),
    )
