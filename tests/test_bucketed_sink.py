"""Bucketed-table sink: a join between two tables co-bucketed on the
join key must plan WITHOUT a shuffle exchange on either side — the
co-located-join guarantee the sink exists for. (Broadcast is disabled
in the test: at real state-table scale neither side broadcasts, which
is exactly when bucketing pays.)"""

import contextlib

import pytest

from ontology_loader_spark.sinks.bucketed import (
    cobucketed_join,
    write_bucketed,
)


@contextlib.contextmanager
def _no_broadcast(spark):
    keys = ["spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold"]
    old = {}
    for k in keys:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, "-1")
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.fixture()
def bucket_tables(spark):
    yield
    for t in ("bk_left", "bk_right", "bk_mismatch"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _formatted(spark, df):
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_cobucketed_join_has_no_exchange(spark, bucket_tables):
    left = spark.range(2000).selectExpr("CAST(id AS STRING) AS subject",
                                        "id % 7 AS a")
    right = spark.range(1500).selectExpr("CAST(id AS STRING) AS subject",
                                         "id % 11 AS b")
    write_bucketed(left, "bk_left", "subject", buckets=8)
    write_bucketed(right, "bk_right", "subject", buckets=8)

    with _no_broadcast(spark):
        joined = cobucketed_join(spark, "bk_left", "bk_right", "subject")
        assert joined.count() == 1500
        plan = _formatted(spark, joined)
        assert "Exchange" not in plan   # no shuffle on either side
        assert "Bucketed: true" in plan

        # contrast: an unbucketed probe side must shuffle into place —
        # the per-run cost the bucketed state tables avoid (8-vs-4
        # bucket mismatches Spark 4 handles by coalescing, so the
        # sharp contrast is bucketed-vs-not)
        from ontology_loader_spark.sinks.bucketed import read_bucketed

        plan2 = _formatted(
            spark, read_bucketed(spark, "bk_left").join(right, "subject"))
        assert "Exchange" in plan2 and "hashpartitioning" in plan2
