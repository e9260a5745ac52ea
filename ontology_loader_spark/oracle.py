"""ANSI-SQL oracle definitions (DuckDB-compatible) for every KG
operator, built over the derivation CTEs in ``inputs/derive.py``.

These strings serve two purposes: (a) the driver's correctness gate
(``__spark_entry__.oracle_sql``) and (b) dev-time parity checks. The
SQL is the *independent* re-statement of the semantics — the Spark side
never executes these.
"""

from __future__ import annotations

from ontology_loader_spark.inputs.derive import (
    EDGES_CTE,
    MENTION_DICT_CTE,
    TERM_DICT_CTE,
    TRANSCRIPTS_CTE,
)
from ontology_loader_spark.operators.curie import matches_ontology_sql

F1_ID = matches_ontology_sql("id", "fix")
F1_T_ID = matches_ontology_sql("t.id", "fix")
F1_O = matches_ontology_sql("o", "fix")

PREDICATES_SQL = "('rdfs:subClassOf', 'BFO:0000050')"

RELEVANT_CTE = f"""
relevant AS (
  SELECT id FROM term_dict
  WHERE {F1_ID} AND NOT COALESCE(is_obsolete, FALSE)
)"""

HEDGES_CTE = f"""
hedges AS (
  SELECT DISTINCT subject, object FROM edges
  WHERE predicate IN {PREDICATES_SQL}
)"""

# Reflexive transitive closure (quirks Q1/Q2/Q6):
# seed = relevant ids (obsoletes EXCLUDED — oaklib entities() default
# filter_obsoletes=True), traversal through any node, emitted ancestor
# F1-filtered in closure_rel below.
REACH_CTE = """
reach(s, o) AS (
  SELECT id AS s, id AS o FROM relevant
  UNION
  SELECT r.s, e.object AS o FROM reach r JOIN hedges e ON r.o = e.subject
)"""

CLASSES_CTE = f"""
classes AS (
  SELECT
    t.id AS id,
    'nmdc:OntologyClass' AS type,
    t.alt_names_str AS alt_names_str,
    COALESCE(t.definition, '') AS definition,
    (NOT EXISTS (SELECT 1 FROM edges e
                 WHERE e.subject = t.id
                   AND e.predicate IN {PREDICATES_SQL})) AS is_root,
    COALESCE(t.is_obsolete, FALSE) AS is_obsolete,
    COALESCE(t.name, '') AS name
  FROM term_dict t WHERE {F1_T_ID}
)"""

DIRECT_REL_CTE = f"""
direct_rel AS (
  SELECT e.subject AS subject, e.predicate AS predicate, e.object AS object,
         'nmdc:OntologyRelation' AS type
  FROM edges e
  WHERE e.predicate IN {PREDICATES_SQL}
    AND EXISTS (SELECT 1 FROM relevant r WHERE r.id = e.subject)
)"""

CLOSURE_REL_CTE = f"""
closure_rel AS (
  SELECT s AS subject, 'entailed_isa_partof_closure' AS predicate,
         o AS object, 'nmdc:OntologyRelation' AS type
  FROM reach WHERE {F1_O}
)"""

ALL_REL_CTE = """
all_rel AS (
  SELECT * FROM direct_rel
  UNION ALL
  SELECT * FROM closure_rel
)"""

DISTINCT_REL_CTE = """
distinct_rel AS (
  SELECT DISTINCT subject, predicate, object,
         'nmdc:OntologyRelation' AS type
  FROM all_rel
)"""

# Prior-state derivations for the reconciliation (CDC) oracles:
# prior state = classes with k % 4 == 1 missing (-> inserts), k % 8 == 2
# definitions perturbed (-> updates), everything marked non-obsolete
# (-> incoming obsoletes exercise M1).
PRIOR_CLASSES_CTE = f"""
prior_classes AS (
  SELECT
    t.id AS id,
    'nmdc:OntologyClass' AS type,
    t.alt_names_str AS alt_names_str,
    CASE WHEN t.k % 8 = 2 THEN 'stale definition'
         ELSE COALESCE(t.definition, '') END AS definition,
    (NOT EXISTS (SELECT 1 FROM edges e
                 WHERE e.subject = t.id
                   AND e.predicate IN {PREDICATES_SQL})) AS is_root,
    FALSE AS is_obsolete,
    COALESCE(t.name, '') AS name
  FROM term_dict t WHERE {F1_T_ID} AND t.k % 4 <> 1
)"""

PRIOR_REL_CTE = """
prior_rel AS (
  SELECT subject, predicate, object, 'nmdc:OntologyRelation' AS type
  FROM direct_rel
)"""


def _with(*ctes: str, body: str) -> str:
    joined = ",\n".join(c.strip() for c in ctes)
    return f"WITH RECURSIVE {joined}\n{body}"


KG_BASE_CTES = (TERM_DICT_CTE, EDGES_CTE, RELEVANT_CTE, HEDGES_CTE, REACH_CTE)


def q_f1_curie_filter() -> str:
    return _with(
        TERM_DICT_CTE,
        body=f"SELECT id FROM term_dict WHERE {F1_ID}",
    )


def q_root_detection() -> str:
    return _with(
        TERM_DICT_CTE, EDGES_CTE, CLASSES_CTE,
        body="SELECT id FROM classes WHERE is_root",
    )


def q_class_construction() -> str:
    return _with(
        TERM_DICT_CTE, EDGES_CTE, CLASSES_CTE,
        body="SELECT id, type, alt_names_str, definition, is_root, "
        "is_obsolete, name FROM classes",
    )


def q_direct_relations() -> str:
    return _with(
        TERM_DICT_CTE, EDGES_CTE, RELEVANT_CTE, DIRECT_REL_CTE,
        body="SELECT subject, predicate, object, type FROM direct_rel",
    )


def q_ancestor_closure() -> str:
    return _with(
        *KG_BASE_CTES, CLOSURE_REL_CTE,
        body="SELECT subject, predicate, object, type FROM closure_rel",
    )


#: gate split for the deletion-maintenance gate: edges whose md5 first
#: hex digit equals this residue (1/16 of the edge set) are "deleted"
DELETE_RESIDUE = 3

DELETED_EDGE_COND = (
    "(instr('0123456789abcdef', substr(md5(subject || '|' || predicate "
    f"|| '|' || object), 1, 1)) - 1) = {DELETE_RESIDUE}"
)


def q_ancestor_closure_after_delete() -> str:
    """Closure of the edge set MINUS the md5-residue 'deleted' slice —
    the fresh-recompute oracle the incremental deletion maintenance
    must hash-match."""
    hedges_after = f"""
hedges AS (
  SELECT DISTINCT subject, object FROM edges
  WHERE predicate IN {PREDICATES_SQL} AND NOT ({DELETED_EDGE_COND})
)"""
    return _with(
        TERM_DICT_CTE, EDGES_CTE, RELEVANT_CTE, hedges_after, REACH_CTE,
        CLOSURE_REL_CTE,
        body="SELECT subject, predicate, object, type FROM closure_rel",
    )


def q_relation_set() -> str:
    return _with(
        *KG_BASE_CTES, DIRECT_REL_CTE, CLOSURE_REL_CTE, ALL_REL_CTE, DISTINCT_REL_CTE,
        body="SELECT subject, predicate, object, type FROM distinct_rel",
    )


def q_relations_agg() -> str:
    return _with(
        *KG_BASE_CTES, DIRECT_REL_CTE, CLOSURE_REL_CTE, ALL_REL_CTE, DISTINCT_REL_CTE,
        body="SELECT subject, COUNT(*) AS n_relations, "
        "string_agg(predicate || '|' || object, ';' "
        "ORDER BY predicate || '|' || object) AS relations_str "
        "FROM distinct_rel GROUP BY subject",
    )


def q_class_cdc() -> str:
    """M2 routing oracle: classify incoming classes vs prior state."""
    return _with(
        TERM_DICT_CTE, EDGES_CTE, CLASSES_CTE, PRIOR_CLASSES_CTE,
        body="""
SELECT c.id AS id,
  CASE WHEN p.id IS NULL THEN 'insert'
       WHEN c.type IS DISTINCT FROM p.type
         OR c.alt_names_str IS DISTINCT FROM p.alt_names_str
         OR c.definition IS DISTINCT FROM p.definition
         OR c.is_root IS DISTINCT FROM p.is_root
         OR c.is_obsolete IS DISTINCT FROM p.is_obsolete
         OR c.name IS DISTINCT FROM p.name
       THEN 'update' ELSE 'unchanged' END AS change_kind
FROM classes c LEFT JOIN prior_classes p ON c.id = p.id""",
    )


def q_obsolete_relation_delete() -> str:
    """M1 relation delete oracle: prior relations surviving the
    obsolete subject-or-object purge."""
    return _with(
        TERM_DICT_CTE, EDGES_CTE, RELEVANT_CTE, DIRECT_REL_CTE, PRIOR_REL_CTE, CLASSES_CTE,
        body="""
SELECT r.subject AS subject, r.predicate AS predicate, r.object AS object
FROM prior_rel r
WHERE NOT EXISTS (SELECT 1 FROM classes c
                  WHERE c.is_obsolete AND c.id = r.subject)
  AND NOT EXISTS (SELECT 1 FROM classes c
                  WHERE c.is_obsolete AND c.id = r.object)""",
    )


def q_relation_upsert_end_state() -> str:
    """M1+M3 end-state oracle (Q5 ordering): prior relations minus
    obsolete-referencing rows, upserted with incoming distinct
    relations."""
    return _with(
        *KG_BASE_CTES, DIRECT_REL_CTE, CLOSURE_REL_CTE, ALL_REL_CTE,
        DISTINCT_REL_CTE, PRIOR_REL_CTE, CLASSES_CTE,
        body="""
SELECT subject, predicate, object FROM (
  SELECT r.subject, r.predicate, r.object
  FROM prior_rel r
  WHERE NOT EXISTS (SELECT 1 FROM classes c
                    WHERE c.is_obsolete AND c.id = r.subject)
    AND NOT EXISTS (SELECT 1 FROM classes c
                    WHERE c.is_obsolete AND c.id = r.object)
    AND NOT EXISTS (SELECT 1 FROM distinct_rel d
                    WHERE d.subject = r.subject
                      AND d.predicate = r.predicate
                      AND d.object = r.object)
  UNION ALL
  SELECT subject, predicate, object FROM distinct_rel
)""",
    )


def q_class_insert_report() -> str:
    """K1/Q7: insert-report rows, id duplicated as the first field."""
    return _with(
        TERM_DICT_CTE, EDGES_CTE, CLASSES_CTE, PRIOR_CLASSES_CTE,
        body="""
SELECT c.id AS id, c.id AS f_id, c.type AS f_type,
       c.alt_names_str AS f_alt_names, c.definition AS f_definition,
       c.is_root AS f_is_root, c.is_obsolete AS f_is_obsolete,
       c.name AS f_name
FROM classes c LEFT JOIN prior_classes p ON c.id = p.id
WHERE p.id IS NULL""",
    )


def q_ancestor_histogram() -> str:
    """KG shape analytics: distribution of per-term ancestor-set sizes
    (reflexive closure cardinality) — the profile a loader reports to
    spot closure blow-ups before they hit the sink."""
    return _with(
        *KG_BASE_CTES,
        body=f"""
SELECT n_ancestors, CAST(COUNT(*) AS INTEGER) AS n_terms FROM (
  SELECT s, CAST(COUNT(*) AS INTEGER) AS n_ancestors
  FROM reach WHERE {F1_O} GROUP BY s
) GROUP BY n_ancestors""",
    )


def q_conversation_reassembly() -> str:
    """T1 invariant: ordered per-conversation reassembly."""
    return _with(
        TRANSCRIPTS_CTE,
        body="""
SELECT conv_id,
       string_agg(text, chr(10) ORDER BY turn_idx, text) AS conv_text,
       CAST(COUNT(*) AS INTEGER) AS n_turns
FROM transcripts GROUP BY conv_id""",
    )


def q_transcript_ordering() -> str:
    """T1 oracle: stable per-conversation ordering — row_number over
    (conv_id, turn_idx) must equal turn_idx + 1 for every turn (the
    per-turn text-equality invariant's ordering half)."""
    return _with(
        TRANSCRIPTS_CTE,
        body="""
SELECT conv_id, turn_idx, rn, text FROM (
  SELECT conv_id, turn_idx, text,
         CAST(ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx, text)
              AS INTEGER) AS rn
  FROM transcripts
)""",
    )


def q_mention_detection() -> str:
    """T2 oracle: dictionary substring matching — a mention row per
    (turn, term) where the term surface form occurs in the text."""
    return _with(
        TERM_DICT_CTE, TRANSCRIPTS_CTE, MENTION_DICT_CTE,
        body="""
SELECT t.conv_id AS conv_id, t.turn_idx AS turn_idx,
       d.id AS term_id, d.name AS surface
FROM transcripts t JOIN mention_dict d ON contains(t.text, d.name)""",
    )


def q_entity_linking_top1() -> str:
    """T2 scoring oracle: top-1 candidate per turn — longest surface
    wins, term id breaks ties."""
    return _with(
        TERM_DICT_CTE, TRANSCRIPTS_CTE, MENTION_DICT_CTE,
        body="""
SELECT conv_id, turn_idx, term_id, surface FROM (
  SELECT t.conv_id, t.turn_idx, d.id AS term_id, d.name AS surface,
         ROW_NUMBER() OVER (PARTITION BY t.conv_id, t.turn_idx
                            ORDER BY length(d.name) DESC, d.id) AS rnk
  FROM transcripts t JOIN mention_dict d ON contains(t.text, d.name)
) WHERE rnk = 1""",
    )


def q_mention_ancestors() -> str:
    """Closure-grounded mention triples: the top-1 link per turn joined
    through the reflexive transitive closure (same reach CTE as the
    ancestor gate; F1 filters the emitted ancestor)."""
    return _with(
        TERM_DICT_CTE, EDGES_CTE, TRANSCRIPTS_CTE, MENTION_DICT_CTE,
        RELEVANT_CTE, HEDGES_CTE, REACH_CTE,
        body=f"""
SELECT l.conv_id, l.turn_idx, l.term_id, r.o AS ancestor
FROM (
  SELECT conv_id, turn_idx, term_id FROM (
    SELECT t.conv_id, t.turn_idx, d.id AS term_id,
           ROW_NUMBER() OVER (PARTITION BY t.conv_id, t.turn_idx
                              ORDER BY length(d.name) DESC, d.id) AS rnk
    FROM transcripts t JOIN mention_dict d ON contains(t.text, d.name)
  ) WHERE rnk = 1
) l
JOIN reach r ON r.s = l.term_id
WHERE {F1_O}""",
    )


def q_ancestor_rollup() -> str:
    """Semantic rollup oracle: the mention-ancestor triples aggregated
    per ancestor (distinct linked turns + triple count)."""
    base = q_mention_ancestors()
    return f"""
SELECT ancestor,
       COUNT(DISTINCT conv_id || '|' || CAST(turn_idx AS VARCHAR)) AS n_turns,
       COUNT(*) AS n_mentions
FROM ({base})
GROUP BY ancestor"""


def q_redirect_map() -> str:
    """Alt-id / obsolete-term redirect map: follow replaced_by chains
    from each obsolete term to a live target (chains here are length 1
    by construction; the recursive form is used so the oracle pins the
    chain-following semantics)."""
    return _with(
        TERM_DICT_CTE,
        """redirect(src, dst) AS (
  SELECT id AS src, replaced_by AS dst FROM term_dict
  WHERE is_obsolete AND replaced_by IS NOT NULL
  UNION
  SELECT r.src, t.replaced_by AS dst
  FROM redirect r JOIN term_dict t
    ON r.dst = t.id AND t.is_obsolete AND t.replaced_by IS NOT NULL
)""",
        body="""
SELECT src, dst FROM redirect r
WHERE NOT EXISTS (SELECT 1 FROM term_dict t
                  WHERE t.id = r.dst AND t.is_obsolete
                    AND t.replaced_by IS NOT NULL)""",
    )


def q_mention_counts() -> str:
    """Mention counts per term — the salted two-phase aggregation's
    semantics are exactly GROUP BY COUNT (salting is physical only)."""
    return _with(
        TERM_DICT_CTE, TRANSCRIPTS_CTE, MENTION_DICT_CTE,
        body="""
SELECT d.id AS term_id, COUNT(*) AS n_mentions
FROM transcripts t JOIN mention_dict d ON contains(t.text, d.name)
GROUP BY d.id""",
    )


def q_comention_lift() -> str:
    """Association strength for co-mention KG edges: lift = P(u,v) /
    (P(u)·P(v)) over distinct turns — exact integer counts, one
    double multiply/divide chain (identical tree on both engines)."""
    return _with(
        TERM_DICT_CTE, TRANSCRIPTS_CTE, MENTION_DICT_CTE,
        """mentions AS (
  SELECT DISTINCT t.conv_id, t.turn_idx, d.id AS term_id
  FROM transcripts t JOIN mention_dict d ON contains(t.text, d.name)
)""",
        """total AS (
  SELECT COUNT(*) AS n FROM (SELECT DISTINCT conv_id, turn_idx FROM mentions)
)""",
        """per_term AS (
  SELECT term_id, COUNT(*) AS n_t FROM mentions GROUP BY term_id
)""",
        """pair AS (
  SELECT a.term_id AS u, b.term_id AS v, COUNT(*) AS n_uv
  FROM mentions a JOIN mentions b
    ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
   AND a.term_id < b.term_id
  GROUP BY a.term_id, b.term_id
)""",
        body="""
SELECT p.u AS u, p.v AS v, p.n_uv AS n_uv,
  (CAST(p.n_uv AS DOUBLE) * CAST(t.n AS DOUBLE))
    / (CAST(nu.n_t AS DOUBLE) * CAST(nv.n_t AS DOUBLE)) AS lift
FROM pair p
JOIN per_term nu ON nu.term_id = p.u
JOIN per_term nv ON nv.term_id = p.v
CROSS JOIN total t""",
    )


def q_union_find() -> str:
    """T3 oracle: connected components (min-label) over the co-mention
    graph — terms co-mentioned in one turn share a component."""
    return _with(
        TERM_DICT_CTE, TRANSCRIPTS_CTE, MENTION_DICT_CTE,
        """mentions AS (
  SELECT t.conv_id, t.turn_idx, d.id AS term_id
  FROM transcripts t JOIN mention_dict d ON contains(t.text, d.name)
)""",
        """pairs AS (
  SELECT DISTINCT a.term_id AS u, b.term_id AS v
  FROM mentions a JOIN mentions b
    ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
   AND a.term_id <> b.term_id
)""",
        """cc(node, reach) AS (
  SELECT term_id AS node, term_id AS reach FROM (SELECT DISTINCT term_id FROM mentions)
  UNION
  SELECT c.node, p.v AS reach FROM cc c JOIN pairs p ON c.reach = p.u
)""",
        body="SELECT node AS term_id, MIN(reach) AS component FROM cc GROUP BY node",
    )


def q_obograph_term_dict() -> str:
    """Oracle for the OBO Graph JSON ingest round-trip: the fixture is
    a faithful re-encoding of the derive CTE, so the expected table IS
    the CTE (inputs/ingest.py::write_obograph_fixture)."""
    return _with(
        TERM_DICT_CTE,
        body="SELECT id, name, definition, alt_names_str, "
             "is_obsolete, replaced_by FROM term_dict",
    )


def q_obograph_edges() -> str:
    return _with(
        EDGES_CTE,
        body="SELECT subject, predicate, object FROM edges",
    )


def q_conversation_stats() -> str:
    """Transcript-axis structural quality oracle: per-conversation role
    counts, alternation breaks in stable (turn_idx, text) order,
    repetition and length features (``transcripts/quality.py``)."""
    return _with(
        TRANSCRIPTS_CTE,
        body="""
SELECT conv_id,
       CAST(COUNT(*) AS INTEGER) AS n_turns,
       CAST(SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS INTEGER)
         AS n_user,
       CAST(SUM(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS INTEGER)
         AS n_assistant,
       CAST(SUM(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS INTEGER)
         AS n_tool,
       CAST(SUM(CASE WHEN prev_role = role THEN 1 ELSE 0 END) AS INTEGER)
         AS alternation_breaks,
       CAST(COUNT(DISTINCT text) AS INTEGER) AS n_distinct_turns,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_chars,
       CAST(MAX(LENGTH(text)) AS INTEGER) AS max_chars,
       CAST(SUM(LENGTH(text)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS avg_turn_chars,
       CAST(SUM(CASE WHEN role = 'assistant' THEN LENGTH(text) END) AS DOUBLE)
         / CAST(SUM(CASE WHEN role = 'user' THEN LENGTH(text) END) AS DOUBLE)
         AS assistant_user_char_ratio
FROM (
  SELECT conv_id, role, text, turn_idx,
         LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx, text)
           AS prev_role
  FROM transcripts
) GROUP BY conv_id""",
    )


def q_template_turns() -> str:
    """Cross-conversation boilerplate oracle: md5-grouped turn texts in
    >= 2 distinct conversations."""
    return _with(
        TRANSCRIPTS_CTE,
        body="""
SELECT md5(text) AS turn_hash,
       MIN(text) AS template_text,
       CAST(COUNT(DISTINCT conv_id) AS INTEGER) AS n_convs,
       CAST(COUNT(*) AS INTEGER) AS n_rows
FROM transcripts
GROUP BY md5(text)
HAVING COUNT(DISTINCT conv_id) >= 2""",
    )


def q_ntriples_export() -> str:
    """RDF materialization oracle: the distinct relation set as IRI
    triples plus non-empty class labels as escaped literals, rendered
    with the same IRI policy as ``sinks/rdf.py`` (OBO PURL CURIE
    expansion, rdf-schema specials, urn fallback)."""
    from ontology_loader_spark.sinks.rdf import RDFS, escaped_sql, iri_sql

    s, p, o = iri_sql("subject"), iri_sql("predicate"), iri_sql("object")
    label_iri = iri_sql("id")
    return _with(
        *KG_BASE_CTES, DIRECT_REL_CTE, CLOSURE_REL_CTE, ALL_REL_CTE,
        DISTINCT_REL_CTE, CLASSES_CTE,
        body=f"""
SELECT subject, predicate, object,
       '<' || ({s}) || '> <' || ({p}) || '> <' || ({o}) || '> .' AS line
FROM distinct_rel
UNION ALL
SELECT id AS subject, 'rdfs:label' AS predicate, name AS object,
       '<' || ({label_iri}) || '> <{RDFS}label> "'
         || {escaped_sql("name")} || '" .' AS line
FROM classes WHERE name <> ''""",
    )


def q_key_skew_profile() -> str:
    from ontology_loader_spark.operators.skew import key_skew_profile_sql

    return key_skew_profile_sql("events", "user_id", top_k=20)


#: cycle-fixture split for the cycle_members gate: hierarchy edges whose
#: md5(subject|object) first hex digit equals this residue (1/16 of the
#: set) get a REVERSED rdfs:subClassOf twin injected, turning an
#: acyclic derive graph into one with known cycles.
CYCLE_RESIDUE = 6

CYCLE_EDGE_COND = (
    "(instr('0123456789abcdef', substr(md5(subject || '|' || object), "
    f"1, 1)) - 1) = {CYCLE_RESIDUE}"
)

EDGES_CYC_CTE = f"""
edges_cyc AS (
  SELECT subject, predicate, object FROM edges
  UNION ALL
  SELECT object AS subject, 'rdfs:subClassOf' AS predicate,
         subject AS object
  FROM edges
  WHERE predicate IN {PREDICATES_SQL} AND {CYCLE_EDGE_COND}
)"""


def q_dangling_edges() -> str:
    """QC oracle: hierarchy edges asserting an object id that no term
    defines (exact string match — shape-variant ids dangle)."""
    return _with(
        TERM_DICT_CTE, EDGES_CTE,
        body=f"""
SELECT subject, predicate, object FROM edges e
WHERE predicate IN {PREDICATES_SQL}
  AND NOT EXISTS (SELECT 1 FROM term_dict t WHERE t.id = e.object)""",
    )


def q_cycle_members() -> str:
    """QC oracle: nodes on a directed hierarchy cycle — non-reflexive
    reachability fixpoint over the cycle-injected edge set, keep
    self-reaching nodes. (The recursive UNION dedups, so the CTE
    terminates despite the cycles.)"""
    hedges_cyc = f"""
hedges_cyc AS (
  SELECT DISTINCT subject, object FROM edges_cyc
  WHERE predicate IN {PREDICATES_SQL}
)"""
    reach1 = """
reach1(s, o) AS (
  SELECT subject AS s, object AS o FROM hedges_cyc
  UNION
  SELECT r.s, e.object AS o FROM reach1 r
  JOIN hedges_cyc e ON r.o = e.subject
)"""
    return _with(
        TERM_DICT_CTE, EDGES_CTE, EDGES_CYC_CTE, hedges_cyc, reach1,
        body="SELECT DISTINCT s AS id FROM reach1 WHERE s = o",
    )


def q_term_depth() -> str:
    """Shortest-distance-to-root oracle (min over the recursive
    distance walk; see graph.py::term_depth_sql)."""
    from ontology_loader_spark.operators.graph import term_depth_sql

    return _with(
        EDGES_CTE, term_depth_sql(PREDICATES_SQL),
        body="SELECT id, depth FROM depths",
    )


def q_term_lca() -> str:
    """LCA + Wu-Palmer ppm oracle: reflexive reach ancestors joined to
    the recursive depth walk, two-phase argmax (max depth, min id at
    that depth) — see graph.py::term_lca_sql."""
    from ontology_loader_spark.inputs.derive import LCA_PAIRS_CTE
    from ontology_loader_spark.operators.curie import matches_ontology_sql
    from ontology_loader_spark.operators.graph import (
        term_depth_sql,
        term_lca_sql,
    )

    return _with(
        TERM_DICT_CTE, EDGES_CTE, RELEVANT_CTE, HEDGES_CTE, REACH_CTE,
        term_depth_sql(PREDICATES_SQL),
        LCA_PAIRS_CTE,
        term_lca_sql(matches_ontology_sql("r.o", "fix")),
        body="""
SELECT l.a AS a, l.b AS b, l.lca AS lca,
       CAST(l.lca_depth AS INTEGER) AS lca_depth,
       CAST(da.depth AS INTEGER) AS depth_a,
       CAST(db.depth AS INTEGER) AS depth_b,
       CAST(CASE WHEN da.depth + db.depth = 0 THEN 1000000
            ELSE (2 * CAST(l.lca_depth AS BIGINT) * 1000000)
                 // (CAST(da.depth AS BIGINT) + CAST(db.depth AS BIGINT))
            END AS BIGINT) AS wup_ppm
FROM lca_pick l
JOIN depths da ON da.id = l.a
JOIN depths db ON db.id = l.b""",
    )


def q_turn_transitions() -> str:
    """Dialogue-dynamics oracle: role-transition matrix with naive
    event-time latency aggregates (date_diff = the NTZ timestampdiff
    on the Spark side; negative gaps kept as data-quality signal)."""
    return _with(
        TRANSCRIPTS_CTE,
        """seq AS (
  SELECT conv_id, role, ts,
         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx, text) AS prev_role,
         lag(ts)   OVER (PARTITION BY conv_id ORDER BY turn_idx, text) AS prev_ts
  FROM transcripts
)""",
        body="""
SELECT prev_role, role,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(date_diff('second', prev_ts, ts)) AS BIGINT) AS sum_latency_s,
       CAST(MIN(date_diff('second', prev_ts, ts)) AS BIGINT) AS min_latency_s,
       CAST(MAX(date_diff('second', prev_ts, ts)) AS BIGINT) AS max_latency_s
FROM seq WHERE prev_role IS NOT NULL
GROUP BY prev_role, role""",
    )


def q_tool_usage() -> str:
    """Per-tool usage profile oracle (transcripts/dialogue.py)."""
    return _with(
        TRANSCRIPTS_CTE,
        body="""
SELECT tool,
       CAST(COUNT(*) AS BIGINT) AS n_calls,
       CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs,
       CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct_texts,
       CAST(SUM(turn_idx) AS BIGINT) AS sum_turn_idx
FROM transcripts WHERE tool IS NOT NULL
GROUP BY tool""",
    )


def q_conv_entity_profile() -> str:
    """Per-conversation KG-coverage oracle: mention detection restated
    as contains() (the q_mention_counts equivalence), left-joined to
    the recursive depth walk (pipeline.py::conversation_entity_profile)."""
    from ontology_loader_spark.operators.graph import term_depth_sql

    return _with(
        TERM_DICT_CTE, EDGES_CTE, TRANSCRIPTS_CTE, MENTION_DICT_CTE,
        term_depth_sql(PREDICATES_SQL),
        """mentions AS (
  SELECT t.conv_id, t.turn_idx, d.id AS term_id
  FROM transcripts t JOIN mention_dict d ON contains(t.text, d.name)
)""",
        body="""
SELECT m.conv_id AS conv_id,
       CAST(COUNT(*) AS INTEGER) AS n_mentions,
       CAST(COUNT(DISTINCT m.term_id) AS INTEGER) AS n_terms,
       CAST(COUNT(DISTINCT m.turn_idx) AS INTEGER) AS n_mention_turns,
       CAST(MAX(dep.depth) AS INTEGER) AS max_term_depth
FROM mentions m LEFT JOIN depths dep ON dep.id = m.term_id
GROUP BY m.conv_id""",
    )


def q_mention_timeline() -> str:
    """Per-(term, day) mention volume oracle: the contains() join at
    transcript-row granularity (the q_mention_counts equivalence, with
    the row's own ts — no join-back fan-out) aggregated by day."""
    return _with(
        TERM_DICT_CTE, TRANSCRIPTS_CTE, MENTION_DICT_CTE,
        body="""
SELECT d.id AS term_id,
       strftime(t.ts, '%Y-%m-%d') AS day,
       CAST(COUNT(*) AS BIGINT) AS n_mentions,
       CAST(COUNT(DISTINCT t.conv_id) AS BIGINT) AS n_convs
FROM transcripts t JOIN mention_dict d ON contains(t.text, d.name)
GROUP BY d.id, strftime(t.ts, '%Y-%m-%d')""",
    )


def q_term_similarity_ic() -> str:
    """Resnik-in-count-space oracle: the LCA pick joined to the
    ancestor rollup (usage of lca-or-descendants), zero-filled for
    corpus-absent concepts (pipeline.py::term_similarity_ic)."""
    from ontology_loader_spark.inputs.derive import LCA_PAIRS_CTE
    from ontology_loader_spark.operators.curie import matches_ontology_sql
    from ontology_loader_spark.operators.graph import (
        term_depth_sql,
        term_lca_sql,
    )

    links_cte = """
top1_links AS (
  SELECT conv_id, turn_idx, term_id FROM (
    SELECT t.conv_id, t.turn_idx, d.id AS term_id,
           ROW_NUMBER() OVER (PARTITION BY t.conv_id, t.turn_idx
                              ORDER BY length(d.name) DESC, d.id) AS rnk
    FROM transcripts t JOIN mention_dict d ON contains(t.text, d.name)
  ) WHERE rnk = 1
)"""
    triples_cte = f"""
mention_triples AS (
  SELECT l.conv_id, l.turn_idx, l.term_id, r.o AS ancestor
  FROM top1_links l JOIN reach r ON r.s = l.term_id
  WHERE {matches_ontology_sql("r.o", "fix")}
)"""
    rollup_cte = """
ic_rollup AS (
  SELECT ancestor,
         COUNT(DISTINCT conv_id || '|' || CAST(turn_idx AS VARCHAR)) AS n_turns,
         COUNT(*) AS n_mentions
  FROM mention_triples GROUP BY ancestor
)"""
    return _with(
        TERM_DICT_CTE, EDGES_CTE, TRANSCRIPTS_CTE, MENTION_DICT_CTE,
        RELEVANT_CTE, HEDGES_CTE, REACH_CTE,
        term_depth_sql(PREDICATES_SQL),
        LCA_PAIRS_CTE,
        term_lca_sql(matches_ontology_sql("r.o", "fix")),
        links_cte, triples_cte, rollup_cte,
        body="""
SELECT l.a AS a, l.b AS b, l.lca AS lca,
       CAST(l.lca_depth AS INTEGER) AS lca_depth,
       CAST(COALESCE(ru.n_turns, 0) AS BIGINT) AS lca_n_turns,
       CAST(COALESCE(ru.n_mentions, 0) AS BIGINT) AS lca_n_mentions
FROM lca_pick l LEFT JOIN ic_rollup ru ON ru.ancestor = l.lca""",
    )


def q_turn_context() -> str:
    """Dialogue context-window oracle: NULL-skipping concat_ws over
    stable-order lags (transcripts/dialogue.py::turn_context_windows)."""
    return _with(
        TRANSCRIPTS_CTE,
        body="""
SELECT conv_id, turn_idx, role,
       concat_ws(chr(10),
                 lag(text, 2) OVER w,
                 lag(text, 1) OVER w,
                 text) AS context_text
FROM transcripts
WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx, text)""",
    )


def q_term_jaccard() -> str:
    """Ancestor-set Jaccard oracle: reflexive F1-filtered ancestor
    sets, exact intersection/union counts, integer ppm
    (graph.py::term_ancestor_jaccard)."""
    from ontology_loader_spark.inputs.derive import LCA_PAIRS_CTE
    from ontology_loader_spark.operators.curie import matches_ontology_sql

    anc_cte = f"""
anc_sets AS (
  SELECT r.s AS subject, r.o AS anc FROM reach r
  WHERE {matches_ontology_sql("r.o", "fix")}
)"""
    return _with(
        TERM_DICT_CTE, EDGES_CTE, RELEVANT_CTE, HEDGES_CTE, REACH_CTE,
        LCA_PAIRS_CTE, anc_cte,
        """jac_sizes AS (
  SELECT subject, COUNT(*) AS n FROM anc_sets GROUP BY subject
)""",
        """jac_inter AS (
  SELECT p.a, p.b, COUNT(*) AS n_inter
  FROM lca_pairs p
  JOIN anc_sets x ON x.subject = p.a
  JOIN anc_sets y ON y.subject = p.b AND y.anc = x.anc
  GROUP BY p.a, p.b
)""",
        body="""
SELECT p.a AS a, p.b AS b,
       CAST(COALESCE(i.n_inter, 0) AS BIGINT) AS n_inter,
       CAST(sa.n AS BIGINT) AS n_a,
       CAST(sb.n AS BIGINT) AS n_b,
       CAST((COALESCE(i.n_inter, 0) * 1000000)
            // (sa.n + sb.n - COALESCE(i.n_inter, 0)) AS BIGINT)
         AS jaccard_ppm
FROM lca_pairs p
JOIN jac_sizes sa ON sa.subject = p.a
JOIN jac_sizes sb ON sb.subject = p.b
LEFT JOIN jac_inter i ON i.a = p.a AND i.b = p.b""",
    )
