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
