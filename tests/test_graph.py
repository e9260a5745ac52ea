"""Exact-integer PageRank: hub attracts rank, determinism across
partitionings, and integral arithmetic invariants."""

from ontology_loader_spark.operators.graph import SCALE, pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(s, "rdfs:subClassOf", o) for s, o in pairs],
        "subject string, predicate string, object string",
    )


def test_pagerank_hub_and_determinism(spark):
    # leaves l0..l5 -> hub; hub -> root
    pairs = [(f"l{i}", "hub") for i in range(6)] + [("hub", "root")]
    e = _edges(spark, pairs)
    ranks = {r["node"]: r["rank"] for r in pagerank(e).collect()}
    leaves = [ranks[f"l{i}"] for i in range(6)]
    assert len(set(leaves)) == 1                 # symmetric leaves tie
    assert ranks["hub"] > max(leaves)            # hub collects leaf mass
    assert ranks["root"] > max(leaves)           # fed by the hub
    # every rank >= teleport base, and bounded by total mass
    n = len(ranks)
    base = (SCALE * 15) // (100 * n)
    assert all(v >= base for v in ranks.values())
    assert sum(ranks.values()) <= SCALE + n      # damping keeps mass bounded

    r32 = {r["node"]: r["rank"]
           for r in pagerank(e.repartition(32)).collect()}
    assert r32 == ranks                          # exact integers: no drift


def test_pagerank_ignores_non_hierarchy_predicates(spark):
    import pyspark.sql.functions as F

    e = _edges(spark, [("a", "b")]).unionByName(
        spark.createDataFrame([("x", "relatedTo", "y")],
                              "subject string, predicate string, object string"))
    nodes = {r["node"] for r in pagerank(e).collect()}
    assert nodes == {"a", "b"}
    del F
