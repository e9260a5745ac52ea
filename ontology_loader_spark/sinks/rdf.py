"""RDF materialization — canonical N-Triples serialization of the KG.

The reference materializes its graph into a document store
(``mongodb_loader.py:196-250``); the interchange-format twin of that
step for an ontology KG is RDF. This sink renders the engine's
``(subject, predicate, object)`` relation state and the class label
set as N-Triples lines (W3C N-Triples: one ``<s> <p> <o> .`` /
``<s> <p> "literal" .`` statement per line), so the materialized graph
loads into any triple store.

IRI policy (public OBO PURL convention): a CURIE ``PREFIX:LOCAL``
expands to ``http://purl.obolibrary.org/obo/PREFIX_LOCAL`` (local ids
contain no colon, so a full ``replace`` is the first-colon replace);
``rdfs:subClassOf`` / ``rdfs:label`` map to the rdf-schema namespace;
a colon-less token (the engine's entailed-closure predicate) gets a
``urn:x-kg:`` IRI. Literals escape backslash, quote, newline, CR and
tab per the N-Triples grammar.

Everything is pure Catalyst string expressions (``when``/``concat``/
``replace``) — whole-stage-codegen'd, no Python in the line renderer —
and the writer keeps the input partitioning (one text part per
partition, no coalesce), so serializing a 10^12-triple state is a
map-only job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

OBO_BASE = "http://purl.obolibrary.org/obo/"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
URN_BASE = "urn:x-kg:"


def _iri(col: Column) -> Column:
    """CURIE/token -> IRI string (no angle brackets)."""
    return (
        F.when(col == "rdfs:subClassOf", F.lit(RDFS + "subClassOf"))
        .when(col == "rdfs:label", F.lit(RDFS + "label"))
        .when(col.contains(":"), F.concat(F.lit(OBO_BASE), F.replace(col, F.lit(":"), F.lit("_"))))
        .otherwise(F.concat(F.lit(URN_BASE), col))
    )


def _escaped(col: Column) -> Column:
    """N-Triples literal escaping: ``\\`` ``\"`` ``\\n`` ``\\r`` ``\\t``."""
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    return F.replace(out, F.lit("\t"), F.lit("\\t"))


def ntriples_relation_lines(triples: DataFrame) -> DataFrame:
    """``(subject, predicate, object)`` -> one IRI-triple line each.

    Output: (subject, predicate, object, line).
    """
    return triples.select(
        "subject",
        "predicate",
        "object",
        F.concat(
            F.lit("<"), _iri(F.col("subject")),
            F.lit("> <"), _iri(F.col("predicate")),
            F.lit("> <"), _iri(F.col("object")),
            F.lit("> ."),
        ).alias("line"),
    )


def ntriples_label_lines(classes: DataFrame) -> DataFrame:
    """Class rows -> ``<id> rdfs:label "name" .`` literal lines.

    Empty names are skipped (the reference coalesces a missing label to
    ``''`` — an empty rdfs:label triple carries no information and
    bloats a 10^12-row export).

    Output: (subject, predicate, object, line) — object is the raw
    (unescaped) label so the gate compares the literal value too.
    """
    return classes.filter(F.col("name") != "").select(
        F.col("id").alias("subject"),
        F.lit("rdfs:label").alias("predicate"),
        F.col("name").alias("object"),
        F.concat(
            F.lit("<"), _iri(F.col("id")),
            F.lit("> <"), F.lit(RDFS + "label"),
            F.lit('> "'), _escaped(F.col("name")),
            F.lit('" .'),
        ).alias("line"),
    )


def ntriples_export(triples: DataFrame, classes: DataFrame) -> DataFrame:
    """Full graph materialization: relation triples + label literals."""
    return ntriples_relation_lines(triples).unionByName(
        ntriples_label_lines(classes)
    )


def write_ntriples(lines: DataFrame, path: str) -> None:
    """Write the ``line`` column as text parts at ``path``.

    Keeps the upstream partitioning — a 10^12-line export stays a
    map-only job with one ``.nt`` shard per partition; readers treat
    the directory as the document (N-Triples is line-delimited, so
    shard order is immaterial).
    """
    lines.select("line").write.mode("overwrite").text(path)


# ---------------------------------------------------------------------------
# DuckDB oracle twins (independent SQL re-statement of the same policy)

def iri_sql(expr: str) -> str:
    return f"""CASE
  WHEN {expr} = 'rdfs:subClassOf' THEN '{RDFS}subClassOf'
  WHEN {expr} = 'rdfs:label' THEN '{RDFS}label'
  WHEN contains({expr}, ':') THEN '{OBO_BASE}' || replace({expr}, ':', '_')
  ELSE '{URN_BASE}' || {expr} END"""


def escaped_sql(expr: str) -> str:
    # chr() keeps the control characters out of the SQL source text
    return (
        "replace(replace(replace(replace(replace("
        f"{expr}, chr(92), chr(92) || chr(92))"
        ", chr(34), chr(92) || chr(34))"
        ", chr(10), chr(92) || 'n')"
        ", chr(13), chr(92) || 'r')"
        ", chr(9), chr(92) || 't')"
    )
