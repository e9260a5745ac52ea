"""KMV sketch: deterministic across partitionings, and the estimate
tracks the exact distinct count within the expected k-driven error
(~1/sqrt(k) ≈ 12.5% at k=64; we allow 3σ)."""

import datetime

from ontology_loader_spark.operators.sketch import kmv_distinct_tokens
from ontology_loader_spark.schemas import TRANSCRIPT_SCHEMA

BASE = datetime.datetime(2026, 4, 1)


def _mk(spark, n_rows=4000, vocab=1500):
    rows = [
        ("c%d" % (i % 59), i // 59, "user",
         " ".join(f"tok{(i * 13 + j * 101) % vocab}" for j in range(12)),
         None, BASE)
        for i in range(n_rows)
    ]
    return spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)


def test_kmv_tracks_exact_distinct(spark):
    tr = _mk(spark)
    est = {r["role"]: r["estimate_distinct"]
           for r in kmv_distinct_tokens(tr).collect()}
    exact = {
        r["role"]: r["n"]
        for r in (
            tr.selectExpr("role", "explode(split(lower(text), ' ')) AS tok")
            .where("tok <> ''")
            .select("role", "tok").distinct()
            .groupBy("role").count()
            .withColumnRenamed("count", "n")
            .collect()
        )
    }
    for role, n in exact.items():
        rel_err = abs(est[role] - n) / n
        assert rel_err < 0.375, (role, est[role], n)   # 3/sqrt(64)


def test_kmv_partitioning_independent(spark):
    tr = _mk(spark, n_rows=1000)
    a = sorted(map(tuple, kmv_distinct_tokens(tr).collect()))
    b = sorted(map(tuple, kmv_distinct_tokens(tr.repartition(17)).collect()))
    assert a == b
