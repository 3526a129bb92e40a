"""histogram_quantile over classic le-bucketed series.

Semantics: vendor/.../promql/quantile.go:74-124 (bucketQuantile) +
ensureMonotonic (quantile.go:369-379) + the grouping rule in
functions.go:1085-1160 (group by labels minus `le`, metric name dropped).

Implementation is pure higher-order SQL expressions over a per-group sorted
bucket array — one shuffle, no Python. At scale this is a single hash
aggregation keyed by (t, series-without-le): the natural layout, since each
histogram's buckets co-locate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from metric_store_release_spark.datamodel import NAME_LABEL, sig


def _le_to_double(le: Column) -> Column:
    return (
        F.when(le.isin("+Inf", "Inf", "inf"), F.lit(float("inf")))
        .when(le.isin("-Inf", "-inf"), F.lit(float("-inf")))
        .otherwise(le.cast("double"))
    )


def histogram_quantile(vector_df: DataFrame, q: float) -> DataFrame:
    """vector_df: (t, labels, sig, value) of `*_bucket` series with `le`.

    Series lacking an `le` label are skipped, like the reference
    (functions.go:1098-1102 ignores unparsable le as of newer versions; we
    require a parsable le).
    """
    df = vector_df.filter(F.col("labels").getItem("le").isNotNull())
    le = _le_to_double(F.col("labels").getItem("le"))
    # group by labels minus `le` ONLY — the metric name stays in the
    # grouping signature (functions.go:1098 BytesWithoutLabels(le)), and is
    # dropped from the OUTPUT labels below; two same-labeled histograms
    # under different names then collide post-drop and trip the engine's
    # same-labelset check (histograms.test eval_fail, prometheus#9910)
    group_labels = F.map_filter(F.col("labels"), lambda k, _: k != F.lit("le"))
    df = (
        df.withColumn("le", le)
        .filter(~F.isnan("le"))
        .withColumn("labels", group_labels)
        .withColumn("sig", sig(F.col("labels")))
    )
    grouped = df.groupBy("t", "sig").agg(
        F.any_value("labels").alias("labels"),
        F.array_sort(F.collect_list(F.struct("le", "value"))).alias("bk"),
    )

    # coalesce buckets sharing a numeric upper bound — le="0.2" / "2e-1" /
    # "2.0e-1" are ONE bucket whose counts add (quantile.go:316-333)
    coalesced = F.expr(
        """
        aggregate(
            bk,
            cast(array() as array<struct<le:double,value:double>>),
            (acc, x) -> if(
                size(acc) > 0 and try_element_at(acc, -1).le = x.le,
                concat(
                    slice(acc, 1, size(acc) - 1),
                    array(named_struct(
                        'le', x.le,
                        'value', try_element_at(acc, -1).value + x.value
                    ))
                ),
                concat(acc, array(x))
            )
        )
        """
    )
    grouped = grouped.withColumn("bk", coalesced)

    # monotonicity repair: running max of counts (quantile.go:369-379)
    mono = F.expr(
        """
        aggregate(
            bk,
            cast(array() as array<struct<le:double,value:double>>),
            (acc, x) -> concat(
                acc,
                array(named_struct(
                    'le', x.le,
                    'value', greatest(x.value,
                                      coalesce(try_element_at(acc, -1).value, x.value))
                ))
            )
        )
        """
    )
    grouped = grouped.withColumn("bk", mono)

    n = F.size("bk")
    last = F.try_element_at(F.col("bk"), F.lit(-1))
    observations = last.getField("value")
    rank = F.lit(q) * observations

    # first index (1-based) among buckets[0..n-2] with count >= rank;
    # Go sort.Search returns n-1 when none match (quantile.go:103)
    idxs = F.filter(
        F.expr("transform(bk, (x, i) -> struct(i + 1 as i, x.value as v))"),
        lambda s: (s.getField("v") >= rank) & (s.getField("i") < n),
    )
    b = F.coalesce(F.try_element_at(idxs, F.lit(1)).getField("i"), n)

    bucket = F.try_element_at(F.col("bk"), b.cast("int"))
    prev_bucket = F.try_element_at(F.col("bk"), F.greatest(b - 1, F.lit(1)).cast("int"))
    bucket_start = F.when(b > 1, prev_bucket.getField("le")).otherwise(F.lit(0.0))
    prev_count = F.when(b > 1, prev_bucket.getField("value")).otherwise(F.lit(0.0))
    count = bucket.getField("value") - prev_count
    adj_rank = rank - prev_count
    interpolated = bucket_start + (bucket.getField("le") - bucket_start) * (
        adj_rank / count
    )

    second_highest = F.try_element_at(F.col("bk"), (n - 1).cast("int")).getField("le")
    value = (
        F.when(F.lit(q != q), F.lit(float("nan")))  # q is NaN
        .when(F.lit(q < 0), F.lit(float("-inf")))
        .when(F.lit(q > 1), F.lit(float("inf")))
        .when(last.getField("le") != F.lit(float("inf")), F.lit(float("nan")))
        .when(n < 2, F.lit(float("nan")))
        .when(observations == 0, F.lit(float("nan")))
        .when(b == n, second_highest)
        .when((b == 1) & (bucket.getField("le") <= 0), bucket.getField("le"))
        .otherwise(interpolated)
    )
    out_labels = F.map_filter(
        F.col("labels"), lambda k, _: k != F.lit(NAME_LABEL)
    )
    return grouped.select(
        "t",
        out_labels.alias("labels"),
        sig(out_labels).alias("sig"),
        value.alias("value"),
    )
