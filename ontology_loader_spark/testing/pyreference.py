"""Independent pure-Python restatement of the reference's extraction
semantics (``ontology_processor.py``) — the P/R oracle (SURVEY.md §5.1).

Deliberately written row-at-a-time like the reference, sharing no code
with the Spark operators. Reproduces quirks Q1/Q2/Q3/Q6/Q10.
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

    relevant = {t[0] for t in term_rows if matches(t[0], ontology)}  # Q6
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
