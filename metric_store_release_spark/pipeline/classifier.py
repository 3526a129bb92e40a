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


def train_logistic_hashed(
    features: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "y",
    lr: float = 1.0,
    iters: int = 3,
) -> DataFrame:
    """Distributed full-batch logistic-regression training over hashed
    features: returns the SPARSE (feature, weight) model table — the
    train half of the fastText-style pipeline (serve with
    :func:`linear_scores`). Deterministic: weights start at 0, no
    shuffling, no minibatches, so any engine replaying the same
    iterations computes the same model (float-summation order absorbed
    by presentation rounding downstream, like every scoring oracle
    here).

    Each iteration is two corpus-shaped shuffles and one model-shaped
    join — the canonical distributed full-batch GD:

      1. margins: features ⋈ weights (model side broadcast, pinned — see
         linear_scores) → per-doc z = Σ tf·w (hash agg);
      2. errors: sigmoid(z) − y per doc (join labels — doc-keyed);
      3. gradient: features ⋈ errors → per-feature g = Σ tf·err / n_docs
         (hash agg keyed by feature — bounded by the 2^18 slot space);
      4. w ← w − lr·g, localCheckpoint-ed to truncate lineage per round
         (same driver-orchestrated loop shape as k-means and
         connected_components; every data operation is distributed).

    Iteration 1 is algebraically special-cased nowhere: w₀ is the empty
    sparse table, z₀ = 0, p₀ = 0.5 — the oracle replays it identically.
    """
    n_docs = labels.count()  # one driver action total, not per iteration
    # pin the feature table: every iteration reads it twice (margins +
    # gradient); without the persist the full tokenize/hash lineage runs
    # 2*iters times (SCALING.md finding 5 — eager, so consumers don't
    # race to populate the cache). Weights are localCheckpoint-ed, so the
    # final unpersist leaves no dangling lineage.
    feats = features.select(
        id_col, "feature", F.col("tf").cast("double").alias("tf")
    ).persist()
    feats.count()
    y = labels.select(id_col, F.col(label_col).cast("double").alias("__y"))
    spark = features.sparkSession
    weights = spark.createDataFrame([], "feature long, weight double")
    for _ in range(int(iters)):
        z = (
            feats.join(F.broadcast(weights), "feature", "left")
            .withColumn("__w", F.coalesce(F.col("weight"), F.lit(0.0)))
            .groupBy(id_col)
            .agg(F.sum(F.col("tf") * F.col("__w")).alias("__z"))
        )
        err = z.join(y, id_col).select(
            id_col,
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__z"))) - F.col("__y")).alias(
                "__err"
            ),
        )
        grad = (
            feats.join(err, id_col)
            .groupBy("feature")
            .agg((F.sum(F.col("tf") * F.col("__err")) / F.lit(float(n_docs))).alias("__g"))
        )
        weights = (
            weights.join(grad, "feature", "full")
            .select(
                "feature",
                (
                    F.coalesce(F.col("weight"), F.lit(0.0))
                    - F.lit(float(lr)) * F.coalesce(F.col("__g"), F.lit(0.0))
                ).alias("weight"),
            )
            .localCheckpoint()
        )
    feats.unpersist()
    return weights


def pr_curve(
    scored: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
    label_col: str = "y",
) -> DataFrame:
    """Distributed precision/recall curve — the eval half of the quality-
    classifier lifecycle (train → serve → EVALUATE): one row per distinct
    quantized score, giving the confusion counts and precision/recall at
    the threshold "score ≥ this value". The operating-point sweep behind
    FineWeb-Edu-style "keep documents the classifier scores above τ"
    selection: the curve is what picks τ.

    Determinism contract: scores are quantized through the repo's 6-dp
    presentation rounding (the proven-green classifier contract) to
    score_q = round(round(score, 6)·10⁶) integers, so grouping keys are
    exact int64 in both engines; only the final precision/recall
    divisions are float, rounded 6 like every scorer.

    Plan shape — the distribution-table form (events_latency_pctl_dist):
    one (score_q → n_pos, n_neg) hash aggregation over the corpus, then
    cumulative sums over the DISTINCT quantized scores descending. The
    unpartitioned window runs over score-distribution rows (≤ 10⁶+1
    by construction of the quantization), never the documents."""
    from pyspark.sql import Window

    sq = F.round(F.round(F.col(score_col), 6) * 1e6, 0).cast("long")
    joined = scored.select(F.col(id_col), sq.alias("score_q")).join(
        labels.select(
            F.col(id_col), F.col(label_col).cast("long").alias("__y")
        ),
        id_col,
    )
    dist = joined.groupBy("score_q").agg(
        F.sum("__y").alias("__pos"),
        F.sum(F.lit(1) - F.col("__y")).alias("__neg"),
    )
    w = Window.orderBy(F.col("score_q").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = dist.select(
        "score_q",
        F.sum("__pos").over(w).alias("tp"),
        F.sum("__neg").over(w).alias("fp"),
        F.sum("__pos").over(wall).alias("__p"),
    )
    return cum.select(
        "score_q",
        "tp",
        "fp",
        (F.col("__p") - F.col("tp")).alias("fn"),
        F.round(F.col("tp") / (F.col("tp") + F.col("fp")), 6).alias(
            "precision"
        ),
        F.round(F.col("tp") / F.col("__p"), 6).alias("recall"),
    )


def pr_curve_oracle_sql(scored_sql: str, label_sql: str, doc_table: str) -> str:
    """DuckDB oracle for :func:`pr_curve` over a scored subquery (e.g.
    the train_and_score_oracle_sql output) — same quantization, same
    distribution-table cumulative sweep."""
    return f"""
WITH scored AS (SELECT * FROM ({scored_sql}) s),
lab AS (SELECT doc_id, {label_sql} AS y FROM {doc_table}),
q AS (
  SELECT CAST(ROUND(ROUND(s.score, 6) * 1000000.0) AS BIGINT) AS score_q,
         l.y
  FROM scored s JOIN lab l USING (doc_id)
),
dist AS (
  SELECT score_q, CAST(SUM(y) AS BIGINT) AS pos,
         CAST(SUM(1 - y) AS BIGINT) AS neg
  FROM q GROUP BY score_q
),
cum AS (
  SELECT score_q,
         CAST(SUM(pos) OVER (ORDER BY score_q DESC) AS BIGINT) AS tp,
         CAST(SUM(neg) OVER (ORDER BY score_q DESC) AS BIGINT) AS fp,
         CAST(SUM(pos) OVER () AS BIGINT) AS p
  FROM dist
)
SELECT score_q, tp, fp, p - tp AS fn,
       ROUND(tp * 1.0 / (tp + fp), 6) AS precision,
       ROUND(tp * 1.0 / p, 6) AS recall
FROM cum
"""


def train_and_score_oracle_sql(
    doc_table: str,
    label_sql: str,
    n_features: int = 1 << 18,
    lr: float = 0.5,
    iters: int = 3,
) -> str:
    """DuckDB oracle replaying :func:`train_logistic_hashed` +
    :func:`linear_scores` end-to-end: the full-batch GD iterations as a
    chained-CTE unroll (w0 = the empty sparse table; each round computes
    margins, errors, per-feature gradients and the weight update exactly
    as the Spark loop does), then scores every document with the trained
    model. Generated so entry modules never hand-copy the recurrence."""
    ctes = [
        r"""base AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM """ + doc_table + r"""
),
tt AS (SELECT * FROM base WHERE len(t) > 0),
unis AS (SELECT doc_id, unnest(t) AS g FROM tt),
bis AS (
  SELECT doc_id, t[i] || ' ' || t[i + 1] AS g
  FROM tt, unnest(generate_series(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 2
),
grams AS (SELECT * FROM unis UNION ALL SELECT * FROM bis),
feats AS (
  SELECT doc_id,
         ('0x' || substr(md5('feat' || g), 1, 8))::BIGINT % """
        + str(n_features)
        + r""" AS feature,
         CAST(COUNT(*) AS DOUBLE) AS tf
  FROM grams GROUP BY 1, 2
),
y AS (SELECT doc_id, """ + label_sql + f""" AS y FROM {doc_table}),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM y),
w0 AS (SELECT CAST(0 AS BIGINT) AS feature, 0.0 AS weight WHERE FALSE)"""
    ]
    for t in range(1, int(iters) + 1):
        p = t - 1
        ctes.append(
            f"""z{t} AS (
  SELECT f.doc_id, SUM(f.tf * COALESCE(w.weight, 0.0)) AS z
  FROM feats f LEFT JOIN w{p} w USING (feature) GROUP BY 1
),
e{t} AS (
  SELECT z.doc_id, 1.0 / (1.0 + exp(-z.z)) - y.y AS err
  FROM z{t} z JOIN y USING (doc_id)
),
g{t} AS (
  SELECT feature, SUM(f.tf * e.err) / (SELECT n FROM n) AS g
  FROM feats f JOIN e{t} e USING (doc_id) GROUP BY 1
),
w{t} AS (
  SELECT COALESCE(w.feature, g.feature) AS feature,
         COALESCE(w.weight, 0.0) - {float(lr)} * COALESCE(g.g, 0.0) AS weight
  FROM w{p} w FULL JOIN g{t} g ON w.feature = g.feature
)"""
        )
    ctes.append(
        f"""zf AS (
  SELECT f.doc_id, SUM(f.tf * w.weight) AS z
  FROM feats f JOIN w{int(iters)} w USING (feature) GROUP BY 1
)"""
    )
    body = ",\n".join(ctes)
    return (
        "WITH "
        + body
        + "\nSELECT doc_id, ROUND(1.0 / (1.0 + exp(-z)), 6) AS score FROM zf"
    )
