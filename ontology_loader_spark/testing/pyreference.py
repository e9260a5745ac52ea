"""Independent pure-Python restatement of the reference's extraction
semantics (``ontology_processor.py``) — the P/R oracle (SURVEY.md §5.1).

Deliberately written row-at-a-time like the reference, sharing no code
with the Spark operators. Reproduces quirks Q1/Q2/Q3/Q6/Q10 (Q6: the
closure domain excludes obsoletes — oaklib ``entities()`` defaults
``filter_obsoletes=True``).
"""

from __future__ import annotations

from ontology_loader_spark.schemas import (
    CLOSURE_PREDICATE,
    DEFAULT_PREDICATES,
    ONTOLOGY_CLASS_TYPE,
)


def matches(entity_id: str, ontology: str) -> bool:
    head, sep, _ = entity_id.partition(":")
    return bool(sep) and head.lower() == ontology.lower()


def reference_extraction(terms, edges, ontology,
                         predicates=DEFAULT_PREDICATES):
    """terms: iterable of (id, name, definition, aliases, is_obsolete,
    replaced_by); edges: iterable of (s, p, o).
    Returns (classes dict by id, direct triple list, closure triple set).
    """
    hier = [(s, p, o) for s, p, o in edges if p in predicates]
    subjects_with_edges = {s for s, _, _ in hier}
    term_rows = list(terms)
    roots = {t[0] for t in term_rows if t[0] not in subjects_with_edges}

    classes = {}
    for tid, name, definition, aliases, obsolete, _ in term_rows:
        if not matches(tid, ontology):
            continue
        classes[tid] = {
            "id": tid,
            "type": ONTOLOGY_CLASS_TYPE,
            "alternative_names": tuple(aliases or []),
            "definition": definition or "",
            "is_root": tid in roots,
            "is_obsolete": bool(obsolete),
            "name": name or "",
        }

    # Q6: adapter.entities() default filter_obsoletes=True — the
    # closure domain excludes obsolete terms
    relevant = {
        t[0] for t in term_rows if matches(t[0], ontology) and not t[4]
    }
    direct = [(s, p, o) for s, p, o in hier if s in relevant]

    adj: dict[str, set[str]] = {}
    for s, _, o in hier:
        adj.setdefault(s, set()).add(o)

    closure = set()
    for entity in relevant:
        seen, stack = {entity}, [entity]            # Q1 reflexive
        while stack:
            cur = stack.pop()
            for nxt in adj.get(cur, ()):            # traverse through ANY node
                if nxt not in seen:
                    seen.add(nxt)
                    stack.append(nxt)
        for anc in seen:
            if matches(anc, ontology):              # Q2: emitted side only
                closure.add((entity, CLOSURE_PREDICATE, anc))
    return classes, direct, closure


def reference_reconcile(incoming_classes, incoming_relations,
                        prior_classes, prior_relations):
    """Row-at-a-time restatement of ``upsert_ontology_data``
    (``mongodb_loader.py:196-250``): Q5 ordering (obsolete handling →
    class upserts → relation upserts), Q9 whole-field diff, Q11
    duplicate-id skip, Q4 bag report / set store, F2 validity filter.

    incoming_classes: list of dicts with the OntologyClass fields
    (relations as tuple of (s,p,o,type) tuples);
    incoming_relations: list of (s,p,o,type);
    prior_classes: list of dicts (may contain duplicate ids);
    prior_relations: list of (s,p,o,type).

    Returns (class_state list, relation_state set, updates_report ids,
    inserts_report ids, relation_report list, invalid_count).
    """
    class_docs = [dict(d) for d in prior_classes]
    relation_store = {
        (r[0], r[1], r[2]): r for r in prior_relations
    }

    # Step 1.1 — obsolete handling (mongodb_loader.py:19-44)
    obsolete_ids = [c["id"] for c in incoming_classes if c.get("is_obsolete")]
    for term_id in obsolete_ids:
        matching = [d for d in class_docs if d["id"] == term_id]
        if len(matching) == 1:                      # Q11: >1 -> skip
            matching[0]["relations"] = tuple()
            matching[0]["is_obsolete"] = True
    obsolete_set = set(obsolete_ids)
    relation_store = {
        k: v for k, v in relation_store.items()
        if k[0] not in obsolete_set and k[2] not in obsolete_set
    }

    # Step 1.2 — class upserts (mongodb_loader.py:69-103,229-235)
    fields = ["id", "type", "alternative_names", "definition",
              "relations", "is_root", "is_obsolete", "name"]
    updates_report, inserts_report = [], []
    for obj in incoming_classes:
        existing = [d for d in class_docs if d["id"] == obj["id"]]
        if existing:
            doc = existing[0]                       # rows[0]
            changed = {f for f in fields if obj.get(f) != doc.get(f)}
            if changed:
                # the engine's MERGE replaces every duplicate of a
                # changed id with the incoming doc
                class_docs = [d for d in class_docs if d["id"] != obj["id"]]
                class_docs.append(dict(obj))
                updates_report.append(obj["id"])
        else:
            class_docs.append(dict(obj))
            inserts_report.append(obj["id"])

    # Step 2 — relation upserts (mongodb_loader.py:47-66,237-241)
    relation_report, invalid = [], 0
    for rel in incoming_relations:
        s, p, o = rel[0], rel[1], rel[2]
        if not s or not p or not o:                 # F2
            invalid += 1
            continue
        relation_store[(s, p, o)] = rel
        relation_report.append((s, p, o))           # Q4 bag

    return (class_docs, set(relation_store), updates_report,
            inserts_report, relation_report, invalid)
