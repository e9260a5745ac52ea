"""M4 — Iceberg ``MERGE INTO`` sink: the transactional form of the
reconciliation algebra.

The reference's store is MongoDB: per-document upserts keyed on ``id``
(``mongodb_loader.py:88-99``) / ``(subject, predicate, object)``
(``:64``), index DDL at ``:215-219``, and the ``$or $in`` obsolete
delete at ``:43``. SURVEY.md §1.3/§2.1 maps that to an Iceberg catalog:
one ``MERGE INTO`` per reconciliation step, executed in quirk-Q5 order
against a single pinned snapshot.

This sandbox has no Iceberg runtime jar, so the sink is split:

- :func:`merge_statements` generates the exact SQL an Iceberg catalog
  would run — the algebra, Q5 ordering, Q9 change predicate, and Q11
  duplicate-skip are all pinned in the SQL text.
- :func:`verify_statements_parse` round-trips every statement through
  Spark's own SQL parser and asserts it lands as the expected logical
  plan (``MergeIntoTable`` / ``CreateTable``); this is the
  EXPLAIN-level check available without a catalog, and it runs in CI
  (``tests/test_merge_sink.py``).
- :func:`execute` runs the statements via ``spark.sql`` when a catalog
  IS configured (``spark.sql.catalog.<name>`` present) — the
  production path, unexercised here by necessity.

The *semantics* of these statements are independently gate-verified:
``relation_upsert_end_state`` / ``class_cdc`` / ``obsolete_relation_
delete`` pin the identical algebra (DataFrame implementation vs DuckDB
oracle) at value-hash level every round.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from ontology_loader_spark.schemas import ONTOLOGY_CLASS_FIELDS

CLASS_TABLE = "ontology_class_set"
RELATION_TABLE = "ontology_relation_set"


@dataclass
class MergeStatement:
    """One SQL statement of the sink program."""

    name: str
    sql: str
    #: logical-plan class vanilla Spark parses this statement into
    expect_plan: str
    #: True for Iceberg SQL-extension syntax vanilla Spark cannot parse
    requires_iceberg_extensions: bool = False
    notes: str = ""


@dataclass
class MergeProgram:
    statements: list[MergeStatement] = field(default_factory=list)

    def parseable(self) -> list[MergeStatement]:
        return [s for s in self.statements if not s.requires_iceberg_extensions]


def _q(catalog: str, namespace: str, table: str) -> str:
    return f"{catalog}.{namespace}.{table}"


def ddl_statements(catalog: str, namespace: str = "kg") -> MergeProgram:
    """Table DDL with the reference's index parity: the Mongo indexes
    on ``id`` and ``(subject, predicate, object)``
    (``mongodb_loader.py:215-219``) become Iceberg write distribution +
    sort order, so MERGE probes cluster on the key columns."""
    cls = _q(catalog, namespace, CLASS_TABLE)
    rel = _q(catalog, namespace, RELATION_TABLE)
    return MergeProgram([
        MergeStatement(
            "create_class_table",
            f"""CREATE TABLE IF NOT EXISTS {cls} (
  id STRING, type STRING, alternative_names ARRAY<STRING>,
  definition STRING,
  relations ARRAY<STRUCT<subject: STRING, predicate: STRING,
                         object: STRING, type: STRING>>,
  is_root BOOLEAN, is_obsolete BOOLEAN, name STRING)
USING iceberg
TBLPROPERTIES ('write.distribution-mode' = 'hash',
               'write.merge.mode' = 'merge-on-read')""",
            expect_plan="CreateTable",
            notes="point-keyed on id (mongodb_loader.py:218)",
        ),
        MergeStatement(
            "create_relation_table",
            f"""CREATE TABLE IF NOT EXISTS {rel} (
  subject STRING, predicate STRING, object STRING, type STRING)
USING iceberg
TBLPROPERTIES ('write.distribution-mode' = 'hash',
               'write.merge.mode' = 'merge-on-read')""",
            expect_plan="CreateTable",
            notes="keyed on (subject,predicate,object) (mongodb_loader.py:219)",
        ),
        MergeStatement(
            "class_sort_order",
            f"ALTER TABLE {cls} WRITE ORDERED BY id",
            expect_plan="",
            requires_iceberg_extensions=True,
            notes="Iceberg SQL extension — index parity for the id key",
        ),
        MergeStatement(
            "relation_sort_order",
            f"ALTER TABLE {rel} WRITE ORDERED BY subject, predicate, object",
            expect_plan="",
            requires_iceberg_extensions=True,
            notes="Iceberg SQL extension — index parity for the (s,p,o) key",
        ),
    ])


def merge_statements(
    catalog: str,
    namespace: str = "kg",
    incoming_classes_view: str = "incoming_classes",
    incoming_relations_view: str = "incoming_relations",
    class_fields: tuple[str, ...] = ONTOLOGY_CLASS_FIELDS,
) -> MergeProgram:
    """The Q5-ordered reconciliation as four MERGE statements over the
    two state tables, sourcing from temp views holding the extraction
    output. Statement order IS the contract (quirk Q5:
    ``mongodb_loader.py:225-241`` — obsolete handling, class upserts,
    relation upserts).

    ``class_fields`` is the MERGE twin of the CDC operator's runtime
    column introspection (``reconcile._any_field_differs``): pass the
    incoming frame's actual columns and an evolved column participates
    in the Q9 diff, the SET list, and the INSERT list with no code
    edit. On a real catalog the schema evolution itself is an
    ``ALTER TABLE ADD COLUMN`` first (Iceberg NULL-backfills existing
    rows) — exactly what ``testing/merge_sim.py``'s evolved-state test
    simulates on DuckDB."""
    cls = _q(catalog, namespace, CLASS_TABLE)
    rel = _q(catalog, namespace, RELATION_TABLE)

    # Q11 — ids stored more than once are skipped by the obsolete
    # update (mongodb_loader.py:31-32): exclude them on the SOURCE side
    # (also what Iceberg's one-source-row-per-target-row rule wants).
    obsolete_src = f"""(
  SELECT i.id FROM {incoming_classes_view} i
  WHERE i.is_obsolete
    AND i.id NOT IN (
      SELECT id FROM {cls} GROUP BY id HAVING COUNT(*) > 1)
) s"""

    # Q9 — whole-field inequality, None != '' counts
    # (mongodb_loader.py:84-86): negated null-safe equality per field.
    diff_pred = " OR ".join(
        f"NOT (t.{f} <=> s.{f})" for f in class_fields if f != "id"
    )
    class_cols = ", ".join(class_fields)
    class_src_cols = ", ".join(f"s.{f}" for f in class_fields)
    set_clause = ", ".join(
        f"t.{f} = s.{f}" for f in class_fields if f != "id"
    )

    return MergeProgram([
        MergeStatement(
            "m1_obsolete_classes",
            f"""MERGE INTO {cls} t
USING {obsolete_src}
ON t.id = s.id
WHEN MATCHED THEN UPDATE SET
  t.is_obsolete = true,
  t.relations = array()""",
            expect_plan="MergeIntoTable",
            notes="mongodb_loader.py:30-41 (+Q11 dup skip)",
        ),
        MergeStatement(
            "m1_delete_subject",
            f"""MERGE INTO {rel} t
USING (SELECT id FROM {incoming_classes_view} WHERE is_obsolete) s
ON t.subject = s.id
WHEN MATCHED THEN DELETE""",
            expect_plan="MergeIntoTable",
            notes="mongodb_loader.py:43 ($or $in delete, subject half)",
        ),
        MergeStatement(
            "m1_delete_object",
            f"""MERGE INTO {rel} t
USING (SELECT id FROM {incoming_classes_view} WHERE is_obsolete) s
ON t.object = s.id
WHEN MATCHED THEN DELETE""",
            expect_plan="MergeIntoTable",
            notes="mongodb_loader.py:43 ($or $in delete, object half)",
        ),
        MergeStatement(
            "m2_class_upsert",
            f"""MERGE INTO {cls} t
USING {incoming_classes_view} s
ON t.id = s.id
WHEN MATCHED AND ({diff_pred}) THEN UPDATE SET {set_clause}
WHEN NOT MATCHED THEN INSERT ({class_cols}) VALUES ({class_src_cols})""",
            expect_plan="MergeIntoTable",
            notes="mongodb_loader.py:69-103 (Q9 diff; unchanged rows untouched)",
        ),
        MergeStatement(
            "m3_relation_upsert",
            f"""MERGE INTO {rel} t
USING (SELECT DISTINCT subject, predicate, object, type
       FROM {incoming_relations_view}
       WHERE subject IS NOT NULL AND subject <> ''
         AND predicate IS NOT NULL AND predicate <> ''
         AND object IS NOT NULL AND object <> '') s
ON t.subject = s.subject AND t.predicate = s.predicate
   AND t.object = s.object
WHEN MATCHED THEN UPDATE SET t.type = s.type
WHEN NOT MATCHED THEN INSERT (subject, predicate, object, type)
VALUES (s.subject, s.predicate, s.object, s.type)""",
            expect_plan="MergeIntoTable",
            notes="mongodb_loader.py:47-66 (F2 validity filter + (s,p,o) key)",
        ),
    ])


def verify_statements_parse(spark: SparkSession, program: MergeProgram) -> dict[str, str]:
    """Round-trip every non-extension statement through Spark's SQL
    parser; returns {statement name: logical plan class}. Raises if any
    statement fails to parse or lands as an unexpected plan node —
    this is the strongest static check possible without a catalog."""
    parser = spark._jsparkSession.sessionState().sqlParser()
    out: dict[str, str] = {}
    for st in program.parseable():
        plan = parser.parsePlan(st.sql)
        got = plan.getClass().getSimpleName()
        if st.expect_plan and got != st.expect_plan:
            raise AssertionError(
                f"{st.name}: parsed as {got}, expected {st.expect_plan}"
            )
        out[st.name] = got
    return out


def catalog_configured(spark: SparkSession, catalog: str) -> bool:
    try:
        return spark.conf.get(f"spark.sql.catalog.{catalog}") is not None
    except Exception:
        return False


def execute(
    spark: SparkSession,
    catalog: str,
    namespace: str = "kg",
    include_extensions: bool = True,
) -> None:
    """Run DDL + the Q5-ordered MERGE program against a configured
    Iceberg catalog. Callers register ``incoming_classes`` /
    ``incoming_relations`` temp views first (extraction output)."""
    if not catalog_configured(spark, catalog):
        raise RuntimeError(
            f"no Iceberg catalog '{catalog}' on this session — configure "
            f"spark.sql.catalog.{catalog} (+ iceberg-spark-runtime jar), "
            "or use the parquet state store (sinks/state.py)"
        )
    for st in ddl_statements(catalog, namespace).statements:
        if st.requires_iceberg_extensions and not include_extensions:
            continue
        spark.sql(st.sql)
    for st in merge_statements(catalog, namespace).statements:
        spark.sql(st.sql)
