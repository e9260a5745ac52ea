"""Golden-oracle test (SURVEY.md §5.1): a tiny deterministic ontology
whose class/relation sets are computed by an independent pure-Python
implementation of the reference semantics (``ontology_processor.py``)
inside the test; exact equality required (P=R=1.0 at fixture scale).

The fixture exercises every parity quirk: Q1 reflexive closure, Q2
filter asymmetry (foreign objects kept in direct edges, foreign
ancestors dropped from closure, traversal THROUGH foreign nodes), Q3
literal vocabulary, Q6 obsoletes excluded from the closure domain
(oaklib ``entities()`` default ``filter_obsoletes=True``), Q10 null
coercion.
"""

import pytest
from pyspark.sql import functions as F

from ontology_loader_spark.operators.classes import build_ontology_classes
from ontology_loader_spark.operators.closure import (
    ancestor_closure,
    direct_relations,
    relevant_entities,
)
from ontology_loader_spark.operators.relations import attach_relations, union_relations
from ontology_loader_spark.schemas import (
    DEFAULT_PREDICATES,
    EDGE_SCHEMA,
    TERM_DICT_SCHEMA,
)

ONT = "envo"

TERMS = [
    # id, name, definition, aliases, is_obsolete, replaced_by
    ("ENVO:1", "root one", "top", ["r1"], False, None),
    ("ENVO:2", "two", None, [], False, None),
    ("ENVO:3", "three", "", ["t3", "iii"], False, None),
    ("ENVO:4", None, "part thing", None, False, None),
    ("ENVO:5", "old five", "gone", [], True, "ENVO:2"),
    ("envo:6", "lower six", "lc", [], False, None),
    ("OTHER:7", "foreign", "x", [], False, None),
    ("ENVO:8", "eight", "via foreign", [], False, None),
    ("ENVO:9", "nine", "edge to foreign", [], False, None),
    ("ENVOnocolon", "bad id", "no colon", [], False, None),
]

EDGES = [
    ("ENVO:2", "rdfs:subClassOf", "ENVO:1"),
    ("ENVO:3", "rdfs:subClassOf", "ENVO:2"),
    ("ENVO:4", "BFO:0000050", "ENVO:3"),
    ("envo:6", "rdfs:subClassOf", "ENVO:2"),
    ("OTHER:7", "rdfs:subClassOf", "ENVO:2"),   # foreign subject: dropped by J1
    ("ENVO:8", "rdfs:subClassOf", "OTHER:7"),   # traversal passes THROUGH OTHER:7
    ("ENVO:9", "BFO:0000050", "OTHER:99"),      # foreign object: kept direct (Q2)
    ("ENVO:3", "rdfs:seeAlso", "ENVO:1"),       # ignored predicate
]


def pure_python_reference(terms, edges, ontology, predicates=DEFAULT_PREDICATES):
    """Independent restatement of ontology_processor.py semantics."""
    def matches(eid):
        head, sep, _ = eid.partition(":")
        return bool(sep) and head.lower() == ontology.lower()

    hier = [(s, p, o) for s, p, o in edges if p in predicates]
    subjects_with_edges = {s for s, _, _ in hier}
    roots = {t[0] for t in terms if t[0] not in subjects_with_edges}

    classes = {}
    for tid, name, definition, aliases, obsolete, _ in terms:
        if not matches(tid):
            continue
        classes[tid] = {
            "id": tid,
            "type": "nmdc:OntologyClass",
            "alternative_names": tuple(aliases or []),
            "definition": definition or "",
            "is_root": tid in roots,
            "is_obsolete": bool(obsolete),
            "name": name or "",
        }

    # Q6: oaklib entities() default filter_obsoletes=True — obsoletes
    # are NOT in the closure domain
    relevant = {t[0] for t in terms if matches(t[0]) and not t[4]}
    direct = [(s, p, o) for s, p, o in hier if s in relevant]

    adj = {}
    for s, _, o in hier:
        adj.setdefault(s, set()).add(o)

    closure = set()
    for entity in relevant:
        seen, stack = {entity}, [entity]  # reflexive (Q1)
        while stack:
            cur = stack.pop()
            for nxt in adj.get(cur, ()):   # traverse through ANY node
                if nxt not in seen:
                    seen.add(nxt)
                    stack.append(nxt)
        for anc in seen:
            if matches(anc):               # only emitted ancestor filtered (Q2)
                closure.add((entity, "entailed_isa_partof_closure", anc))
    return classes, direct, closure


@pytest.fixture(scope="module")
def fixture_dfs(spark):
    td = spark.createDataFrame(TERMS, TERM_DICT_SCHEMA)
    ed = spark.createDataFrame(EDGES, EDGE_SCHEMA)
    return td, ed


def test_classes_exact(spark, fixture_dfs):
    td, ed = fixture_dfs
    got = {
        r["id"]: {
            "id": r["id"],
            "type": r["type"],
            "alternative_names": tuple(r["alternative_names"]),
            "definition": r["definition"],
            "is_root": r["is_root"],
            "is_obsolete": r["is_obsolete"],
            "name": r["name"],
        }
        for r in build_ontology_classes(td, ed, ONT).collect()
    }
    want, _, _ = pure_python_reference(TERMS, EDGES, ONT)
    assert got == want


def test_direct_relations_exact(spark, fixture_dfs):
    td, ed = fixture_dfs
    rel = relevant_entities(td, ONT)
    got = sorted(
        (r["subject"], r["predicate"], r["object"])
        for r in direct_relations(ed, rel).collect()
    )
    _, want, _ = pure_python_reference(TERMS, EDGES, ONT)
    assert got == sorted(want)
    # Q2: the foreign-object direct edge survives
    assert ("ENVO:9", "BFO:0000050", "OTHER:99") in got
    # foreign-subject edge dropped
    assert all(s != "OTHER:7" for s, _, _ in got)


def test_closure_exact(spark, fixture_dfs):
    td, ed = fixture_dfs
    rel = relevant_entities(td, ONT)
    got = {
        (r["subject"], r["predicate"], r["object"])
        for r in ancestor_closure(ed, rel, ONT).collect()
    }
    _, _, want = pure_python_reference(TERMS, EDGES, ONT)
    assert got == want
    # Q1: reflexive self-triples for live terms; Q6: the obsolete term
    # is OUTSIDE the closure domain — no reflexive row for it
    assert ("ENVO:1", "entailed_isa_partof_closure", "ENVO:1") in got
    assert ("ENVO:5", "entailed_isa_partof_closure", "ENVO:5") not in got
    # Q2 traversal through foreign node: 8 reaches 2 and 1 via OTHER:7,
    # but OTHER:7 itself is not emitted
    assert ("ENVO:8", "entailed_isa_partof_closure", "ENVO:1") in got
    assert ("ENVO:8", "entailed_isa_partof_closure", "OTHER:7") not in got


def test_relations_array_q12(spark, fixture_dfs):
    td, ed = fixture_dfs
    rel = relevant_entities(td, ONT)
    bag = union_relations(direct_relations(ed, rel), ancestor_closure(ed, rel, ONT))
    classes = attach_relations(build_ontology_classes(td, ed, ONT), bag)
    by_id = {r["id"]: r for r in classes.collect()}
    # every relation subject's array holds its own triples
    three = by_id["ENVO:3"]
    triples = {(x["subject"], x["predicate"], x["object"]) for x in three["relations"]}
    assert ("ENVO:3", "rdfs:subClassOf", "ENVO:2") in triples
    assert ("ENVO:3", "entailed_isa_partof_closure", "ENVO:1") in triples
    # classes with no relations get an empty array, never null (Q10)
    assert by_id["ENVO:5"]["relations"] == [] or all(
        x["subject"] == "ENVO:5" for x in by_id["ENVO:5"]["relations"]
    )
    assert all(r["relations"] is not None for r in by_id.values())


def test_null_coercion_q10(spark, fixture_dfs):
    td, ed = fixture_dfs
    classes = build_ontology_classes(td, ed, ONT)
    rows = classes.collect()
    assert all(r["is_root"] is not None for r in rows)
    assert all(r["is_obsolete"] is not None for r in rows)
    assert all(r["definition"] is not None for r in rows)
    assert all(r["name"] is not None for r in rows)
    assert all(r["alternative_names"] is not None for r in rows)
    by_id = {r["id"]: r for r in rows}
    assert by_id["ENVO:4"]["name"] == ""          # null label -> ""
    assert by_id["ENVO:2"]["definition"] == ""    # null definition -> ""
    assert by_id["ENVO:4"]["alternative_names"] == []  # null aliases -> []
