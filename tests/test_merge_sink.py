"""M4 MERGE sink: every generated statement must parse through Spark's
own SQL parser into the expected logical plan node (MergeIntoTable /
CreateTable) — the algebra-pinning check available without an Iceberg
runtime — and the no-catalog execute() path must fail loudly, never
silently skip."""

import pytest

from ontology_loader_spark.sinks.merge import (
    catalog_configured,
    ddl_statements,
    execute,
    merge_statements,
    verify_statements_parse,
)


def test_merge_statements_parse_as_merge_plans(spark):
    got = verify_statements_parse(spark, merge_statements("ice"))
    assert got == {
        "m1_obsolete_classes": "MergeIntoTable",
        "m1_delete_subject": "MergeIntoTable",
        "m1_delete_object": "MergeIntoTable",
        "m2_class_upsert": "MergeIntoTable",
        "m3_relation_upsert": "MergeIntoTable",
    }


def test_ddl_statements_parse(spark):
    got = verify_statements_parse(spark, ddl_statements("ice"))
    assert got == {
        "create_class_table": "CreateTable",
        "create_relation_table": "CreateTable",
    }
    # the two sort-order statements are Iceberg SQL extensions — they
    # must be flagged as such (vanilla Spark cannot parse them)
    ext = [s.name for s in ddl_statements("ice").statements
           if s.requires_iceberg_extensions]
    assert ext == ["class_sort_order", "relation_sort_order"]


def test_q5_statement_order():
    names = [s.name for s in merge_statements("ice").statements]
    # obsolete handling -> class upserts -> relation upserts
    # (mongodb_loader.py:225-241)
    assert names == [
        "m1_obsolete_classes",
        "m1_delete_subject",
        "m1_delete_object",
        "m2_class_upsert",
        "m3_relation_upsert",
    ]


def test_q9_and_q11_pinned_in_sql():
    by_name = {s.name: s.sql for s in merge_statements("ice").statements}
    # Q9: null-safe per-field diff gate on the update branch
    assert "NOT (t.definition <=> s.definition)" in by_name["m2_class_upsert"]
    assert "WHEN MATCHED AND" in by_name["m2_class_upsert"]
    # Q11: duplicate stored ids excluded from the obsolete update source
    assert "HAVING COUNT(*) > 1" in by_name["m1_obsolete_classes"]
    # F2: validity filter on the relation source
    assert "subject <> ''" in by_name["m3_relation_upsert"]


def test_execute_without_catalog_raises(spark):
    assert not catalog_configured(spark, "nosuchcatalog")
    with pytest.raises(RuntimeError, match="no Iceberg catalog"):
        execute(spark, "nosuchcatalog")


def _rel(s, p, o):
    return {"subject": s, "predicate": p, "object": o,
            "type": "nmdc:OntologyRelation"}


def _cls(id_, name, definition="", alt=(), relations=(), is_root=False,
         is_obsolete=False):
    return {
        "id": id_, "type": "nmdc:OntologyClass",
        "alternative_names": list(alt), "definition": definition,
        "relations": list(relations), "is_root": is_root,
        "is_obsolete": is_obsolete, "name": name,
    }


def test_merge_program_end_state_equals_reconcile(spark, tmp_path):
    """Execute the generated MERGE program's SQL TEXT (translated
    statement-by-statement to DuckDB UPDATE/DELETE/INSERT — DuckDB has
    no MERGE) against a seeded store, and require the end state to
    equal the DataFrame reconcile() twin on the same inputs. This pins
    the statement semantics — Q5 order, obsolete handling with
    subject+object relation deletes and Q5 delete-then-reinsert, the
    Q9 null-safe diff gate, F2 validity filter, (s,p,o)-keyed dedup —
    at the SQL-text level, not just the algebra twin. (Q11's dup-id
    skip needs a duplicate-id store, whose reference semantics are
    iteration-order accidents — it stays pinned by the class_cdc /
    obsolete gates and the SQL-text assertion above.)"""
    import duckdb

    from ontology_loader_spark.operators.reconcile import reconcile
    from ontology_loader_spark.schemas import (
        ONTOLOGY_CLASS_SCHEMA,
        RELATION_SCHEMA,
    )
    from ontology_loader_spark.testing.merge_sim import run_program

    prior_cls = spark.createDataFrame(
        [
            _cls("X:1", "one", "d1", alt=["o"], relations=[_rel("X:1", "p", "X:2")]),
            _cls("X:2", "two", "d2"),
            _cls("X:3", "three", "d3", relations=[_rel("X:3", "p", "X:1")]),
            _cls("X:4", "four", "d4", is_root=True),
        ],
        ONTOLOGY_CLASS_SCHEMA,
    )
    incoming_cls = spark.createDataFrame(
        [
            _cls("X:1", "one", "d1", alt=["o"], relations=[_rel("X:1", "p", "X:2")]),
            _cls("X:2", "two RENAMED", "d2"),      # Q9 diff -> update
            _cls("X:3", "three", "d3", is_obsolete=True),
            _cls("X:5", "five", "d5"),             # new -> insert
        ],
        ONTOLOGY_CLASS_SCHEMA,
    )
    prior_rel = spark.createDataFrame(
        [
            ("X:1", "p", "X:2", "nmdc:OntologyRelation"),
            ("X:3", "p", "X:1", "nmdc:OntologyRelation"),  # subject obsolete
            ("X:4", "p", "X:3", "nmdc:OntologyRelation"),  # object obsolete
            ("X:4", "p", "X:1", "nmdc:OntologyRelation"),
        ],
        RELATION_SCHEMA,
    )
    incoming_rel = spark.createDataFrame(
        [
            ("X:3", "p", "X:9", "nmdc:OntologyRelation"),  # reinsert on obsolete
            ("X:1", "p", "X:2", "nmdc:OntologyRelation"),  # dup of stored
            ("X:1", "p", "X:2", "nmdc:OntologyRelation"),  # bag dup
            ("", "p", "X:2", "nmdc:OntologyRelation"),     # F2 invalid
            ("X:5", "", "X:1", "nmdc:OntologyRelation"),   # F2 invalid
            ("X:5", "p", "X:1", "nmdc:OntologyRelation"),
        ],
        RELATION_SCHEMA,
    )

    rec = reconcile(incoming_cls, incoming_rel, prior_cls, prior_rel,
                    assume_unique_ids=True)

    paths = {}
    for nm, df in (("prior_cls", prior_cls), ("prior_rel", prior_rel),
                   ("inc_cls", incoming_cls), ("inc_rel", incoming_rel)):
        p = str(tmp_path / nm)
        df.coalesce(1).write.parquet(p)
        paths[nm] = p + "/*.parquet"

    con = duckdb.connect()
    con.execute("CREATE SCHEMA kg")
    con.execute("CREATE TABLE memory.kg.ontology_class_set AS "
                f"SELECT * FROM read_parquet('{paths['prior_cls']}')")
    con.execute("CREATE TABLE memory.kg.ontology_relation_set AS "
                f"SELECT * FROM read_parquet('{paths['prior_rel']}')")
    con.execute("CREATE VIEW incoming_classes AS "
                f"SELECT * FROM read_parquet('{paths['inc_cls']}')")
    con.execute("CREATE VIEW incoming_relations AS "
                f"SELECT * FROM read_parquet('{paths['inc_rel']}')")

    executed = run_program(con, merge_statements("memory", "kg"))
    assert len(executed) >= 6  # 5 MERGEs; m2/m3 split into two each

    def norm_rel_list(rels):
        return tuple(
            (r["subject"], r["predicate"], r["object"], r["type"])
            if isinstance(r, dict)
            else (r.subject, r.predicate, r.object, r.type)
            for r in rels
        )

    duck_cls = sorted(
        (r[0], r[1], tuple(r[2]), r[3], norm_rel_list(r[4]), r[5], r[6], r[7])
        for r in con.execute(
            "SELECT id, type, alternative_names, definition, relations, "
            "is_root, is_obsolete, name FROM memory.kg.ontology_class_set"
        ).fetchall()
    )
    spark_cls = sorted(
        (r.id, r.type, tuple(r.alternative_names), r.definition,
         norm_rel_list(r.relations), r.is_root, r.is_obsolete, r.name)
        for r in rec.class_state.collect()
    )
    assert duck_cls == spark_cls

    duck_rel = sorted(map(tuple, con.execute(
        "SELECT subject, predicate, object, type "
        "FROM memory.kg.ontology_relation_set").fetchall()))
    spark_rel = sorted(
        (r.subject, r.predicate, r.object, r.type)
        for r in rec.relation_state.collect()
    )
    assert duck_rel == spark_rel

    # the interesting end-state facts, asserted directly as well
    state = dict((t[0], t) for t in duck_cls)
    assert state["X:3"][6] is True and state["X:3"][4] == ()   # obsoleted, []
    assert state["X:2"][7] == "two RENAMED"
    assert "X:5" in state
    assert ("X:3", "p", "X:1", "nmdc:OntologyRelation") not in duck_rel
    assert ("X:4", "p", "X:3", "nmdc:OntologyRelation") not in duck_rel
    assert ("X:3", "p", "X:9", "nmdc:OntologyRelation") in duck_rel
    assert sum(1 for t in duck_rel if t[:3] == ("X:1", "p", "X:2")) == 1


def test_translate_merge_rejects_mixed_matched_clauses():
    """The DuckDB translator executes MATCHED clauses as sequential
    statements; a MERGE mixing MATCHED-UPDATE with MATCHED-DELETE is
    outside that grammar (sequential DELETE would also consume rows the
    UPDATE clause claimed) and must fail loudly, not translate wrong."""
    from ontology_loader_spark.testing.merge_sim import translate_merge

    mixed = (
        "MERGE INTO cat.kg.t t\n"
        "USING src s\n"
        "ON t.id = s.id\n"
        "WHEN MATCHED AND (s.flag) THEN UPDATE SET t.name = s.name\n"
        "WHEN MATCHED THEN DELETE"
    )
    with pytest.raises(ValueError, match="mixes WHEN MATCHED"):
        translate_merge(mixed)


def test_merge_program_evolved_schema_end_state_equals_reconcile(spark, tmp_path):
    """Schema evolution through the MERGE-SQL twin: incoming classes
    carry a column the stored state predates. On a real catalog that is
    ALTER TABLE ADD COLUMN (Iceberg NULL-backfills) followed by the
    same program generated from the incoming frame's columns — the CDC
    introspection contract at the SQL-text level. End state must equal
    the DataFrame reconcile() twin: kept rows NULL for the new column,
    updated/inserted rows carry its value, and a row whose ONLY change
    is the new column still counts as a Q9 update."""
    import duckdb

    from pyspark.sql.types import StringType, StructField, StructType

    from ontology_loader_spark.operators.reconcile import reconcile
    from ontology_loader_spark.schemas import (
        ONTOLOGY_CLASS_SCHEMA,
        RELATION_SCHEMA,
    )
    from ontology_loader_spark.testing.merge_sim import run_program

    evolved_schema = StructType(
        list(ONTOLOGY_CLASS_SCHEMA.fields)
        + [StructField("semantic_version", StringType())]
    )

    def _ecls(id_, name, ver, **kw):
        base = _cls(id_, name, **kw)
        base["semantic_version"] = ver
        return base

    prior_cls = spark.createDataFrame(
        [_cls("X:1", "one", "d1"), _cls("X:2", "two", "d2"),
         _cls("X:3", "three", "d3")],
        ONTOLOGY_CLASS_SCHEMA,
    )
    incoming_cls = spark.createDataFrame(
        [
            _ecls("X:1", "one", "v2", definition="d1"),   # only new col differs
            _ecls("X:2", "two", None, definition="d2"),   # null vs NULL -> unchanged
            _ecls("X:5", "five", "v2", definition="d5"),  # insert with value
        ],
        evolved_schema,
    )
    prior_rel = spark.createDataFrame(
        [("X:1", "p", "X:2", "nmdc:OntologyRelation")], RELATION_SCHEMA
    )
    incoming_rel = spark.createDataFrame(
        [("X:5", "p", "X:1", "nmdc:OntologyRelation")], RELATION_SCHEMA
    )

    rec = reconcile(incoming_cls, incoming_rel, prior_cls, prior_rel,
                    assume_unique_ids=True)

    paths = {}
    for nm, df in (("prior_cls", prior_cls), ("prior_rel", prior_rel),
                   ("inc_cls", incoming_cls), ("inc_rel", incoming_rel)):
        p = str(tmp_path / nm)
        df.coalesce(1).write.parquet(p)
        paths[nm] = p + "/*.parquet"

    con = duckdb.connect()
    con.execute("CREATE SCHEMA kg")
    con.execute("CREATE TABLE memory.kg.ontology_class_set AS "
                f"SELECT * FROM read_parquet('{paths['prior_cls']}')")
    con.execute("CREATE TABLE memory.kg.ontology_relation_set AS "
                f"SELECT * FROM read_parquet('{paths['prior_rel']}')")
    con.execute("CREATE VIEW incoming_classes AS "
                f"SELECT * FROM read_parquet('{paths['inc_cls']}')")
    con.execute("CREATE VIEW incoming_relations AS "
                f"SELECT * FROM read_parquet('{paths['inc_rel']}')")
    # the catalog-side half of schema evolution (Iceberg NULL-backfill)
    con.execute("ALTER TABLE memory.kg.ontology_class_set "
                "ADD COLUMN semantic_version VARCHAR")

    evolved_fields = tuple(
        f.name for f in evolved_schema.fields
    )
    run_program(con, merge_statements("memory", "kg",
                                      class_fields=evolved_fields))

    duck = sorted(
        (r[0], r[1], r[2]) for r in con.execute(
            "SELECT id, name, semantic_version "
            "FROM memory.kg.ontology_class_set").fetchall()
    )
    want = sorted(
        (r["id"], r["name"], r["semantic_version"])
        for r in rec.class_state.collect()
    )
    assert duck == want
    # facts: kept row NULL-backfilled, value-only change was an update
    state = {t[0]: t for t in duck}
    assert state["X:3"][2] is None
    assert state["X:1"][2] == "v2"
    assert state["X:2"][2] is None
    assert state["X:5"][2] == "v2"
