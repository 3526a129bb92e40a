from __future__ import annotations

import pytest

from metric_store_release_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def engine(spark):
    from metric_store_release_spark import PromQLEngine

    return PromQLEngine(spark)


def rows_to_dict(df, label_keys):
    """Collect (t, labels, value) rows → {(t, (label values…)): value}."""
    out = {}
    for r in df.collect():
        key = (r["t"],) + tuple((r["labels"] or {}).get(k) for k in label_keys)
        out[key] = r["value"]
    return out
