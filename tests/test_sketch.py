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


# ------------------------------------------------ KMV source overlap


def test_source_token_overlap_exact_regimes(spark):
    """With vocabularies smaller than k the sketch is exact: identical
    sources -> jaccard 1.0; disjoint -> 0; half-overlap -> |∩|/|∪|."""
    from ontology_loader_spark.operators.sketch import source_token_overlap

    va = " ".join(f"a{i}" for i in range(20))
    vb = " ".join(f"b{i}" for i in range(20))
    half = " ".join([f"a{i}" for i in range(10)] + [f"c{i}" for i in range(10)])
    docs = spark.createDataFrame(
        [(1, va, "s1"), (2, va, "s2"), (3, vb, "s3"), (4, half, "s4")],
        "doc_id long, text string, source string",
    )
    got = {
        (r["source_a"], r["source_b"]): (r["k_used"], r["n_both"], r["jaccard_ppm"])
        for r in source_token_overlap(docs).collect()
    }
    assert got[("s1", "s2")] == (20, 20, 1_000_000)
    assert got[("s1", "s3")] == (40, 0, 0)
    # s1 vs s4: union 30, inter 10
    assert got[("s1", "s4")] == (30, 10, 10 * 1_000_000 // 30)


def test_source_token_overlap_partitioning_invariant(spark):
    import random

    from ontology_loader_spark.operators.sketch import source_token_overlap

    rng = random.Random(23)
    rows = [
        (i, " ".join(f"w{rng.randrange(300)}" for _ in range(40)), f"s{i % 5}")
        for i in range(100)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    one = sorted(map(tuple, source_token_overlap(docs.coalesce(1)).collect()))
    many = sorted(map(tuple, source_token_overlap(docs.repartition(7)).collect()))
    assert one == many
