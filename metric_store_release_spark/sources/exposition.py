"""Prometheus text exposition format → samples DataFrame.

The scraper-source analog (reference: src/internal/scraping/scraper.go wraps
the vendored scrape.Manager over /metrics targets). Here a DataFrame of
scraped payloads (target, scrape_ts, body) is parsed into points with pure
SQL expressions — regex extraction per line, fully distributed, no Python in
the parse path. Supports counters/gauges/summaries/histograms as plain
sample lines: `name{labels} value [timestamp]`; comment/TYPE/HELP lines are
dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LINE = r"^([a-zA-Z_:][a-zA-Z0-9_:]*)(\{[^}]*\})?\s+([^\s]+)(?:\s+([0-9]+))?$"
_LABEL = r'([a-zA-Z_][a-zA-Z0-9_]*)="((?:[^"\\]|\\.)*)"'


def parse_exposition(scrapes: DataFrame, body_col: str = "body") -> DataFrame:
    """scrapes: (target string, scrape_ts long ms, body string) → samples
    (ts, name, value, labels) with labels including instance=target.

    Sample timestamps default to the scrape time (Prometheus semantics) and
    honor explicit per-line millisecond timestamps when present.
    """
    lines = scrapes.select(
        "target",
        "scrape_ts",
        F.explode(F.split(F.col(body_col), r"\n")).alias("line"),
    ).filter(~F.col("line").rlike(r"^\s*(#|$)"))

    name = F.regexp_extract("line", _LINE, 1)
    labelblob = F.regexp_extract("line", _LINE, 2)
    raw_value = F.regexp_extract("line", _LINE, 3)
    explicit_ts = F.regexp_extract("line", _LINE, 4)

    value = (
        F.when(F.lower(raw_value).isin("+inf", "inf"), F.lit(float("inf")))
        .when(F.lower(raw_value) == "-inf", F.lit(float("-inf")))
        .when(F.lower(raw_value) == "nan", F.lit(float("nan")))
        .otherwise(raw_value.cast("double"))
    )
    pairs = F.regexp_extract_all(
        F.coalesce(labelblob, F.lit("")), F.lit(_LABEL), F.lit(0)
    )
    label_map = F.map_from_entries(
        F.transform(
            pairs,
            lambda p: F.struct(
                F.regexp_extract(p, _LABEL, 1).alias("key"),
                F.regexp_replace(
                    F.regexp_extract(p, _LABEL, 2), r'\\(["\\n])', "$1"
                ).alias("value"),
            ),
        )
    )
    labels = F.map_concat(
        F.map_filter(label_map, lambda k, _: k != F.lit("instance")),
        F.create_map(F.lit("instance"), F.col("target")),
    )
    ts = F.when(explicit_ts != "", explicit_ts.cast("long")).otherwise(
        F.col("scrape_ts")
    )
    return (
        lines.filter(name != "")
        .filter(value.isNotNull())
        .select(
            ts.alias("ts"),
            name.alias("name"),
            value.alias("value"),
            labels.alias("labels"),
        )
    )
