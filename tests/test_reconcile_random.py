"""Randomized reconciliation equivalence: the Spark M1→M2→M3 pipeline
vs the independent row-at-a-time restatement of the reference's
``upsert_ontology_data`` (testing/pyreference.py) on seeded random
scenarios — priors with stale/identical/missing docs, incoming
obsoletes, invalid relations, obsolete-referencing relations."""

import random

import pytest

from ontology_loader_spark.operators.reconcile import reconcile
from ontology_loader_spark.schemas import ONTOLOGY_CLASS_SCHEMA, RELATION_SCHEMA
from ontology_loader_spark.testing.pyreference import reference_reconcile

NAMES = ["alpha", "beta", "gamma", ""]
DEFS = ["d1", "d2", ""]


def random_class(rng, tid, obsolete_rate=0.2, with_relations=True):
    rels = tuple()
    if with_relations and rng.random() < 0.5:
        rels = tuple(
            sorted(
                {
                    (tid, "p", f"A:{rng.randrange(10)}", "nmdc:OntologyRelation")
                    for _ in range(rng.randrange(1, 3))
                }
            )
        )
    return {
        "id": tid,
        "type": "nmdc:OntologyClass",
        "alternative_names": tuple(
            rng.sample(["x", "y", "z"], rng.randrange(0, 2))
        ),
        "definition": rng.choice(DEFS),
        "relations": rels,
        "is_root": rng.random() < 0.3,
        "is_obsolete": rng.random() < obsolete_rate,
        "name": rng.choice(NAMES),
    }


def random_relation(rng, invalid_rate=0.1):
    def part():
        if rng.random() < invalid_rate:
            return ""
        return f"A:{rng.randrange(10)}"

    return (part(), "rdfs:subClassOf" if rng.random() < 0.8 else "",
            part(), "nmdc:OntologyRelation")


def to_class_rows(dicts):
    return [
        (d["id"], d["type"], list(d["alternative_names"]), d["definition"],
         [tuple(r) for r in d["relations"]], d["is_root"], d["is_obsolete"],
         d["name"])
        for d in dicts
    ]


def canon_class(row_or_dict):
    g = (row_or_dict.get if isinstance(row_or_dict, dict)
         else lambda k: row_or_dict[k])
    return (
        g("id"), g("type"), tuple(g("alternative_names")), g("definition"),
        tuple((r[0], r[1], r[2], r[3]) for r in g("relations")),
        bool(g("is_root")), bool(g("is_obsolete")), g("name"),
    )


@pytest.mark.parametrize("seed", [11, 22, 33, 44, 55, 66])
def test_random_reconcile_matches_reference(spark, seed):
    rng = random.Random(seed)
    ids = [f"A:{i}" for i in range(10)]

    prior_ids = rng.sample(ids, rng.randrange(3, 8))
    prior = [random_class(rng, t, obsolete_rate=0.0) for t in prior_ids]
    incoming_ids = rng.sample(ids, rng.randrange(3, 9))
    incoming = [random_class(rng, t, obsolete_rate=0.3) for t in incoming_ids]
    prior_rels = list({random_relation(rng, invalid_rate=0.0)
                       for _ in range(rng.randrange(0, 8))})
    incoming_rels = [random_relation(rng) for _ in range(rng.randrange(0, 10))]

    want = reference_reconcile(incoming, incoming_rels, prior, prior_rels)
    (w_classes, w_rels, w_updates, w_inserts, w_rel_report, w_invalid) = want

    df_inc = spark.createDataFrame(to_class_rows(incoming), ONTOLOGY_CLASS_SCHEMA)
    df_prior = spark.createDataFrame(to_class_rows(prior), ONTOLOGY_CLASS_SCHEMA)
    df_inc_r = spark.createDataFrame(incoming_rels, RELATION_SCHEMA)
    df_prior_r = spark.createDataFrame(prior_rels, RELATION_SCHEMA)

    res = reconcile(df_inc, df_inc_r, df_prior, df_prior_r)

    got_classes = sorted(canon_class(r) for r in res.class_state.collect())
    want_classes = sorted(canon_class(d) for d in w_classes)
    assert got_classes == want_classes, f"seed={seed} class state diverged"

    got_rels = {(r["subject"], r["predicate"], r["object"])
                for r in res.relation_state.collect()}
    assert got_rels == {(r[0], r[1], r[2]) for r in w_rels}

    assert {r["id"] for r in res.class_updates_report.collect()} == set(w_updates)
    assert {r["id"] for r in res.class_inserts_report.collect()} == set(w_inserts)
    assert res.relation_inserts_report.count() == len(w_rel_report)
    assert res.invalid_relation_count == w_invalid
