"""Linear text classification over hashed n-gram features.

The fastText / Vowpal-Wabbit serving shape (Weinberger et al. 2009,
"Feature Hashing for Large Scale Multitask Learning"): tokens and token
bigrams hash into a fixed-width feature space (no vocabulary to build,
ship, or broadcast), and scoring is a sparse dot product against a weight
table. This is how production quality classifiers (e.g. CCNet's
fastText filters) run over a pre-training corpus.

Scale shape: feature extraction is map-side (explode + hash); scoring is
one equi-join of the exploded (doc, feature) table against the weight
table keyed by feature index — the broadcast is pinned to the weights
(a 2^18-slot table is a few MB; see linear_scores for why AQE must not
pick the build side here), and the per-doc sum is a hash aggregation
with map-side combine. No Python in the loop, no vocabulary shuffle,
model size independent of corpus size.

Weights come from the caller as a (feature, weight) DataFrame — a real
deployment loads trained weights; tests and the entry use a
deterministic md5-derived weight table so a SQL oracle can replay the
whole classifier bit-for-bit (modulo float summation order, absorbed by
the 6-dp presentation rounding like every other scoring oracle here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from metric_store_release_spark.pipeline.text import hash_bucket, tokens


def hashed_ngram_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = 1 << 18,
    salt: str = "feat",
) -> DataFrame:
    """(id, feature, tf): hashing-trick features over unigrams + bigrams.

    Feature index = md5-hash(gram) mod ``n_features`` — the standard
    signed-less variant; collisions are part of the contract (they act as
    regularization in training and are reproduced identically at serving
    time by any engine using the same hash)."""
    base = df.select(F.col(id_col), tokens(F.col(text_col)).alias("t")).filter(
        F.size("t") > 0
    )
    unis = base.select(id_col, F.explode("t").alias("g"))
    bis = base.filter(F.size("t") >= 2).select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                F.slice("t", 1, F.size("t") - 1),
                F.slice("t", 2, F.size("t") - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("g"),
    )
    grams = unis.unionByName(bis)
    # coalesce carries NON-NULLABILITY (semantically a no-op: exploded
    # grams are never null). Without it, a downstream equi-join on
    # `feature` infers IsNotNull(feature) and pushes the filter — with
    # this ENTIRE md5 expression duplicated inside it — below the
    # aggregation to the per-gram level, evaluating the hash twice per
    # gram: measured 5.6 s -> 2.0 s for the full classifier at 50k docs.
    feature = F.coalesce(
        hash_bucket(F.col("g"), salt) % n_features, F.lit(0)
    )
    return grams.select(id_col, feature.alias("feature")).groupBy(
        id_col, "feature"
    ).agg(F.count(F.lit(1)).alias("tf"))


def md5_demo_weights(
    spark, n_features: int = 1 << 18, salt: str = "w"
) -> DataFrame:
    """Deterministic dense weight table in [-0.5, 0.5): w(i) =
    md5-hash(i)/2^32 - 0.5. A stand-in for trained weights with the same
    storage/join shape, replayable by any engine."""
    return spark.range(n_features).select(
        F.col("id").alias("feature"),
        (
            hash_bucket(F.col("id"), salt) / F.lit(float(1 << 32)) - F.lit(0.5)
        ).alias("weight"),
    )


def linear_scores(
    features: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    bias: float = 0.0,
) -> DataFrame:
    """(id, score): sigmoid(sum_f tf_f * w_f + bias) per document —
    sparse dot product as join + hash agg.

    The broadcast is PINNED to the weight table: the model is fixed-size
    (2^18 slots ≈ a few MB) while the feature side scales with the
    corpus. Left to AQE, the post-shuffle feature stats can look smaller
    at bench scale and win the build side (measured: BuildLeft over the
    exploded gram table at sf0.1) — a choice that inverts catastrophically
    at corpus scale, so the model side is declared, not inferred."""
    z = F.sum(F.col("tf") * F.col("weight")) + F.lit(float(bias))
    return (
        features.join(F.broadcast(weights), "feature")
        .groupBy(id_col)
        .agg((F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias("score"))
    )


def classify_documents(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = 1 << 18,
    bias: float = 0.0,
) -> DataFrame:
    """End-to-end: hashed features → sparse dot → sigmoid score."""
    return linear_scores(
        hashed_ngram_features(df, text_col, id_col, n_features),
        weights,
        id_col,
        bias,
    )
