"""Real-ontology ingestion — S1/S2 for users holding an actual
ontology artifact instead of pre-derived tables.

The reference downloads ``<ont>.db.gz`` (a semantic-sql SQLite export)
from S3 and opens it through oaklib
(``ontology_processor.py:63-92``, adapter at ``:57``). This module
gives the Spark engine the equivalent front door for the two formats
such a user actually holds:

- **OBO Graph JSON** (the obographs interchange format every OBO
  ontology publishes): read fully distributed with ``spark.read.json``
  + Catalyst transforms — no Python in the row path. Scales to
  arbitrarily large graph files (multiLine JSON splits per graph
  document; the explode fan-out is partition-parallel).
- **semantic-sql SQLite** (the exact artifact the reference consumes):
  SQLite is a single-file, driver-local format — there is nothing to
  distribute until its rows are in a DataFrame. Ontologies are
  dictionary-scale (≤ millions of statements), so a driver-side
  stdlib-``sqlite3`` read feeding ``spark.createDataFrame`` (Arrow
  batches) is the honest design; the output DataFrames are distributed
  from then on. A 100 TB corpus never flows through this path — only
  the ontology does.

Both readers emit the engine's canonical input tables, byte-compatible
with ``inputs/derive.py`` / ``inputs/synth.py``:

- ``term_dict(id, name, definition, alternative_names, is_obsolete,
  replaced_by)``
- ``edges(subject, predicate, object)``

Vocabulary mapping (what oaklib's SqlImplementation exposes to the
reference):

- label           <- ``rdfs:label``
- definition      <- ``IAO:0000115``
- aliases         <- ``oboInOwl:hasExactSynonym`` (+ related/broad/narrow)
- is_obsolete     <- ``owl:deprecated = true``
- replaced_by     <- ``IAO:0100001`` (term replaced by)
- hierarchy edges <- ``rdfs:subClassOf`` / ``BFO:0000050`` (the
  reference's default predicate set, ``ontology_processor.py:160``)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ontology_loader_spark.schemas import EDGE_SCHEMA, TERM_DICT_SCHEMA

OBO_IRI_PREFIX = "http://purl.obolibrary.org/obo/"

#: IRI predicates -> the CURIE vocabulary the engine (and oaklib) uses
PRED_CURIE = {
    "is_a": "rdfs:subClassOf",
    f"{OBO_IRI_PREFIX}BFO_0000050": "BFO:0000050",
    "http://www.w3.org/2000/01/rdf-schema#subClassOf": "rdfs:subClassOf",
}

IAO_DEFINITION = "IAO:0000115"
IAO_REPLACED_BY = "IAO:0100001"
SYNONYM_PREDS = (
    "oio:hasExactSynonym",
    "oio:hasRelatedSynonym",
    "oio:hasBroadSynonym",
    "oio:hasNarrowSynonym",
)


def _curie_col(c: F.Column) -> F.Column:
    """OBO IRI -> CURIE (``.../ENVO_00002005`` -> ``ENVO:00002005``);
    anything already CURIE-shaped passes through untouched."""
    tail = F.regexp_replace(c, F.lit(OBO_IRI_PREFIX), F.lit(""))
    return F.when(
        c.startswith(OBO_IRI_PREFIX),
        F.regexp_replace(tail, F.lit("_"), F.lit(":")),
    ).otherwise(c)


def _pred_col(c: F.Column) -> F.Column:
    out = c
    for iri, curie in PRED_CURIE.items():
        out = F.when(c == iri, F.lit(curie)).otherwise(out)
    return out


def read_obograph_json(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """OBO Graph JSON -> (term_dict, edges), fully Catalyst.

    Handles the fields the reference's adapter calls touch
    (``_create_ontology_class``, ``ontology_processor.py:102-111``):
    ``lbl``, ``meta.definition.val``, ``meta.synonyms[].val``,
    ``meta.deprecated``, and the ``IAO:0100001`` basicPropertyValue for
    ``replaced_by``. Non-class nodes (properties, individuals) are kept
    — the engine's F1 CURIE filter decides relevance downstream, same
    as the reference's ``_matches_ontology``.
    """
    raw = spark.read.option("multiLine", "true").json(path)
    graphs = raw.select(F.explode("graphs").alias("g"))

    node_struct = graphs.select(F.explode("g.nodes").alias("n"))
    node_fields = set(node_struct.schema["n"].dataType.fieldNames())
    name_col = (
        F.col("n.lbl") if "lbl" in node_fields else F.lit(None).cast("string")
    )
    meta_fields: set[str] = set()
    if "meta" in node_fields:
        meta_fields = set(
            node_struct.schema["n"].dataType["meta"].dataType.fieldNames()
        )
        meta_col = F.col("n.meta")
    else:
        meta_col = F.lit(None).cast("string")  # placeholder, never read
    nodes = node_struct.select(
        _curie_col(F.col("n.id")).alias("id"),
        name_col.alias("name"),
        meta_col.alias("meta"),
    )

    def meta(fld, expr, default):
        return expr if fld in meta_fields else default

    definition = meta(
        "definition",
        F.col("meta.definition.val"),
        F.lit(None).cast("string"),
    )
    synonyms = meta(
        "synonyms",
        F.expr("transform(meta.synonyms, s -> s.val)"),
        F.lit(None).cast("array<string>"),
    )
    deprecated = meta(
        "deprecated",
        F.coalesce(F.col("meta.deprecated"), F.lit(False)),
        F.lit(False),
    )
    replaced_by = meta(
        "basicPropertyValues",
        F.expr(
            "filter(meta.basicPropertyValues, "
            f"p -> p.pred = '{OBO_IRI_PREFIX}IAO_0100001' "
            f"   or p.pred = '{IAO_REPLACED_BY}')[0].val"
        ),
        F.lit(None).cast("string"),
    )
    term_dict = nodes.select(
        "id",
        "name",
        definition.alias("definition"),
        F.coalesce(synonyms, F.array().cast("array<string>")).alias(
            "alternative_names"
        ),
        deprecated.cast("boolean").alias("is_obsolete"),
        _curie_col(replaced_by).alias("replaced_by"),
    )

    edges = (
        graphs.select(F.explode("g.edges").alias("e"))
        .select(
            _curie_col(F.col("e.sub")).alias("subject"),
            _pred_col(F.col("e.pred")).alias("predicate"),
            _curie_col(F.col("e.obj")).alias("object"),
        )
    )
    return term_dict, edges


# --------------------------------------------------------- semsql sqlite

#: statements-table predicates (semantic-sql keeps OBO vocabulary as
#: CURIEs in the ``statements`` table)
_SEMSQL_LABEL = "rdfs:label"
_SEMSQL_DEPRECATED = "owl:deprecated"


def read_semsql_sqlite(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """semantic-sql SQLite -> (term_dict, edges).

    Reads the ``statements`` and ``edge`` tables the oaklib
    SqlImplementation is built on (the reference opens this exact
    artifact at ``ontology_processor.py:57``: ``get_adapter(f"sqlite:
    {path}")``). Driver-side stdlib ``sqlite3`` — the ontology is
    dictionary-scale by construction; the returned DataFrames are
    distributed for everything downstream.
    """
    import sqlite3

    con = sqlite3.connect(path)
    try:
        labels = dict(con.execute(
            "SELECT subject, value FROM statements "
            f"WHERE predicate = '{_SEMSQL_LABEL}'"
        ))
        defs = dict(con.execute(
            "SELECT subject, value FROM statements "
            f"WHERE predicate = '{IAO_DEFINITION}'"
        ))
        syn_rows = con.execute(
            "SELECT subject, value FROM statements WHERE predicate IN ({})".format(
                ",".join("?" for _ in SYNONYM_PREDS)
            ),
            SYNONYM_PREDS,
        )
        synonyms: dict[str, list[str]] = {}
        for s, v in syn_rows:
            if v is not None:
                synonyms.setdefault(s, []).append(v)
        obsolete = {
            s for (s,) in con.execute(
                "SELECT subject FROM statements "
                f"WHERE predicate = '{_SEMSQL_DEPRECATED}' "
                "AND value IN ('true', '1')"
            )
        }
        replaced = dict(con.execute(
            "SELECT subject, COALESCE(object, value) FROM statements "
            f"WHERE predicate = '{IAO_REPLACED_BY}'"
        ))
        subjects = {
            s for (s,) in con.execute(
                "SELECT DISTINCT subject FROM statements "
                "WHERE subject NOT LIKE '\\_:%' ESCAPE '\\'"
            )
        }
        edge_rows = list(con.execute(
            "SELECT subject, predicate, object FROM edge"
        ))
    finally:
        con.close()

    term_rows = [
        (
            s,
            labels.get(s),
            defs.get(s),
            sorted(synonyms.get(s, [])),
            s in obsolete,
            replaced.get(s),
        )
        for s in sorted(subjects)
    ]
    term_dict = spark.createDataFrame(term_rows, TERM_DICT_SCHEMA)
    edges = spark.createDataFrame(edge_rows, EDGE_SCHEMA)
    return term_dict, edges


# ------------------------------------------------------------- gate fixture


def write_obograph_fixture(spark: SparkSession, sf_dir: str, out_path: str) -> str:
    """Render the sf_dir's derived ontology as one OBO Graph JSON
    document — the driver-gate fixture for :func:`read_obograph_json`.

    Because the fixture is a faithful re-encoding of ``derive_term_dict``
    / ``derive_edges``, the DuckDB oracle for the ingest gates is simply
    the derive CTEs themselves: JSON write → distributed JSON read must
    round-trip to exactly the tables the CTEs define. Assembly touches
    the driver only at ontology scale (one concatenated string per
    side — the same dictionary-scale boundary as the SQLite reader
    above)."""
    from pathlib import Path

    from ontology_loader_spark.inputs.derive import derive_edges, derive_term_dict

    td = derive_term_dict(spark, sf_dir)
    ed = derive_edges(spark, sf_dir)
    node = F.struct(
        F.col("id").alias("id"),
        F.col("name").alias("lbl"),
        F.struct(
            F.struct(F.col("definition").alias("val")).alias("definition"),
            F.transform(
                F.col("alternative_names"), lambda s: F.struct(s.alias("val"))
            ).alias("synonyms"),
            F.col("is_obsolete").alias("deprecated"),
            F.when(
                F.col("replaced_by").isNotNull(),
                F.array(
                    F.struct(
                        F.lit(IAO_REPLACED_BY).alias("pred"),
                        F.col("replaced_by").alias("val"),
                    )
                ),
            ).alias("basicPropertyValues"),
        ).alias("meta"),
    )
    nodes_json = (
        td.select(F.to_json(node).alias("j"))
        .agg(F.concat_ws(",", F.collect_list("j")))
        .first()[0]
    )
    edge = F.struct(
        F.col("subject").alias("sub"),
        F.col("predicate").alias("pred"),
        F.col("object").alias("obj"),
    )
    edges_json = (
        ed.select(F.to_json(edge).alias("j"))
        .agg(F.concat_ws(",", F.collect_list("j")))
        .first()[0]
    )
    doc = '{"graphs":[{"nodes":[%s],"edges":[%s]}]}' % (nodes_json, edges_json)
    p = Path(out_path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(doc)
    return str(p)


def write_semsql_fixture(spark: SparkSession, sf_dir: str, out_path: str) -> str:
    """Render the sf_dir's derived ontology as a semantic-sql SQLite
    artifact (``statements`` + ``edge`` tables — the exact shape the
    reference's oaklib adapter opens, ``ontology_processor.py:57``),
    the driver-gate fixture for :func:`read_semsql_sqlite`.

    Same oracle argument as the obograph fixture: a faithful re-encode
    of ``derive_term_dict`` / ``derive_edges``, so the expected output
    of the read-back IS the derive CTE. Driver-side assembly at
    ontology scale only (the identical boundary the SQLite READER
    already documents — SQLite is a single-file driver-local format)."""
    import sqlite3
    from pathlib import Path

    from ontology_loader_spark.inputs.derive import derive_edges, derive_term_dict

    p = Path(out_path)
    p.parent.mkdir(parents=True, exist_ok=True)
    if p.exists():
        p.unlink()

    terms = derive_term_dict(spark, sf_dir).drop("k").collect()
    edges = derive_edges(spark, sf_dir).collect()

    stmts: list[tuple] = []
    for r in terms:
        stmts.append((r["id"], _SEMSQL_LABEL, r["name"], None))
        stmts.append((r["id"], IAO_DEFINITION, r["definition"], None))
        for a in r["alternative_names"]:
            stmts.append((r["id"], SYNONYM_PREDS[0], a, None))
        if r["is_obsolete"]:
            stmts.append((r["id"], _SEMSQL_DEPRECATED, "true", None))
        if r["replaced_by"] is not None:
            stmts.append((r["id"], IAO_REPLACED_BY, None, r["replaced_by"]))

    con = sqlite3.connect(str(p))
    try:
        con.execute(
            "CREATE TABLE statements "
            "(subject TEXT, predicate TEXT, value TEXT, object TEXT)"
        )
        con.execute(
            "CREATE TABLE edge (subject TEXT, predicate TEXT, object TEXT)"
        )
        con.executemany("INSERT INTO statements VALUES (?,?,?,?)", stmts)
        con.executemany(
            "INSERT INTO edge VALUES (?,?,?)",
            [(e["subject"], e["predicate"], e["object"]) for e in edges],
        )
        con.commit()
    finally:
        con.close()
    return str(p)
