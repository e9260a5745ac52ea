"""Incremental closure maintenance: updating the prior closure with a
batch of added edges must equal a fresh full recompute — on random
DAGs, on cyclic graphs, and on the foreign-intermediate trap (a new
edge hanging off a node quirk Q2 filtered out of the stored closure)."""

import random

import pytest

from ontology_loader_spark.operators.closure import (
    ancestor_closure,
    incremental_closure_update,
    relevant_entities,
)
from ontology_loader_spark.schemas import EDGE_SCHEMA, TERM_DICT_SCHEMA

ONT = "p"


def mk_terms(n):
    return [(f"P:{i}", f"t{i}", "", [], False, None) for i in range(n)]


def _closure_set(df):
    return {(r["subject"], r["predicate"], r["object"], r["type"])
            for r in df.collect()}


def _check(spark, terms, old_edges, new_edges):
    td = spark.createDataFrame(terms, TERM_DICT_SCHEMA)
    old = spark.createDataFrame(old_edges, EDGE_SCHEMA)
    new = spark.createDataFrame(new_edges, EDGE_SCHEMA)
    rel = relevant_entities(td, ONT).localCheckpoint(eager=True)
    prior = ancestor_closure(old, rel, ONT).localCheckpoint(eager=True)
    incremental = incremental_closure_update(old, new, prior, rel, ONT)
    full = ancestor_closure(old.unionByName(new), rel, ONT)
    assert _closure_set(incremental) == _closure_set(full)


@pytest.mark.parametrize("seed,n,n_new", [(11, 40, 5), (12, 60, 8)])
def test_incremental_equals_full_random_dag(spark, seed, n, n_new):
    rng = random.Random(seed)
    edges = [(f"P:{i}", "rdfs:subClassOf", f"P:{rng.randrange(i)}")
             for i in range(1, n)]
    rng.shuffle(edges)
    old, new = edges[:-n_new], edges[-n_new:]
    _check(spark, mk_terms(n), old, new)


def test_incremental_through_foreign_intermediate(spark):
    """New edge hangs off a FOREIGN node: prior closure holds no pair
    ending at Q:7 (Q2 emission filter), yet P:8 must gain the new
    ancestors reachable through it."""
    terms = mk_terms(10)
    old = [
        ("P:8", "rdfs:subClassOf", "Q:7"),   # into foreign
        ("P:2", "rdfs:subClassOf", "P:1"),
    ]
    new = [("Q:7", "rdfs:subClassOf", "P:2")]  # foreign -> back into P
    _check(spark, terms, old, new)
    # and explicitly: the full path P:8 -> Q:7 -> P:2 -> P:1 lands
    td = spark.createDataFrame(terms, TERM_DICT_SCHEMA)
    rel = relevant_entities(td, ONT)
    prior = ancestor_closure(spark.createDataFrame(old, EDGE_SCHEMA), rel, ONT)
    inc = incremental_closure_update(
        spark.createDataFrame(old, EDGE_SCHEMA),
        spark.createDataFrame(new, EDGE_SCHEMA),
        prior.localCheckpoint(eager=True), rel, ONT,
    )
    got = _closure_set(inc)
    assert ("P:8", "entailed_isa_partof_closure", "P:1",
            "nmdc:OntologyRelation") in got


def test_incremental_cycle_created_by_new_edge(spark):
    terms = mk_terms(6)
    old = [
        ("P:1", "rdfs:subClassOf", "P:2"),
        ("P:2", "rdfs:subClassOf", "P:3"),
    ]
    new = [("P:3", "rdfs:subClassOf", "P:1")]  # closes a cycle
    _check(spark, terms, old, new)


def test_incremental_noop_delta(spark):
    """A delta that re-adds existing edges (or only ignored
    predicates) leaves the closure exactly unchanged."""
    terms = mk_terms(8)
    old = [(f"P:{i}", "rdfs:subClassOf", f"P:{i - 1}") for i in range(1, 8)]
    new = [old[3], ("P:5", "rdfs:seeAlso", "P:0")]
    _check(spark, terms, old, new)
