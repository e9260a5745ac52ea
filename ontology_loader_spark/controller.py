"""Controller with injected-store parity
(``ontology_load_controller.py:31-50``).

The reference's ``OntologyLoaderController`` accepts an injected
MongoDB client plus a ``db_name`` (validated together: a client
without a db name is a ``ValueError``, ``:48-50``), falling back to
env-configured connections otherwise. The Spark engine mirrors that
lifecycle: callers inject a *store client* (any object with the
``ParquetStateStore`` contract — ``exists`` / ``read`` / ``publish``;
an Iceberg-catalog adapter satisfies it too) plus a ``namespace`` that
scopes the two state tables, or pass ``state_root`` and let the
controller own a parquet store.

``run_ontology_loader()`` replays the reference's run method
(``:52-92``): extraction (terms + metadata, closure), Q5-ordered
reconciliation against the injected store's prior snapshot, publish,
and optional TSV reports.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ontology_loader_spark.operators.reconcile import ReconcileResult, reconcile
from ontology_loader_spark.pipeline import extract
from ontology_loader_spark.schemas import ONTOLOGY_CLASS_FIELDS
from ontology_loader_spark.sinks.state import ParquetStateStore

CLASS_TABLE = "ontology_class_set"
RELATION_TABLE = "ontology_relation_set"


@dataclass
class OntologyLoaderController:
    """``OntologyLoaderController`` parity (constructor contract at
    ``ontology_load_controller.py:31-50``)."""

    spark: SparkSession
    source_ontology: str
    term_dict: DataFrame
    edges: DataFrame
    output_directory: str | None = None
    generate_reports: bool = True
    store_client: object | None = None   # injected store (reference: mongo_client)
    namespace: str | None = None         # table-name scope (reference: db_name)
    state_root: str | None = None        # owned-store fallback

    def __post_init__(self) -> None:
        # reference :48-50: a client without a database name is invalid
        if self.store_client is not None and not self.namespace:
            raise ValueError(
                "namespace is required when providing a store client"
            )
        if self.store_client is None:
            if not self.state_root:
                raise ValueError("state_root is required without a store client")
            self.store_client = ParquetStateStore(self.state_root)
            self.namespace = self.namespace or "kg"

    def _table(self, name: str) -> str:
        return f"{self.namespace}.{name}"

    def run_ontology_loader(self) -> ReconcileResult:
        """``run_ontology_loader`` (``ontology_load_controller.py:52-92``):
        extract → reconcile vs the store's pinned prior snapshot →
        publish → reports."""
        ext = extract(self.term_dict, self.edges, self.source_ontology)

        store = self.store_client
        cls_t, rel_t = self._table(CLASS_TABLE), self._table(RELATION_TABLE)
        # check each table independently: a crash between the two
        # publish calls below leaves a half-published store, and the
        # next run must still come up (missing side = empty snapshot)
        prior_classes = (
            store.read(self.spark, cls_t)
            if store.exists(cls_t)
            else self.spark.createDataFrame([], ext.classes.schema)
        )
        prior_relations = (
            store.read(self.spark, rel_t)
            if store.exists(rel_t)
            else self.spark.createDataFrame([], ext.relations_bag.schema)
        )

        rec = reconcile(
            ext.classes,
            ext.relations_bag,
            prior_classes,
            prior_relations,
            assume_unique_ids=True,
        )
        store.publish(rec.class_state, cls_t)
        store.publish(rec.relation_state, rel_t)

        if self.generate_reports and self.output_directory:
            from ontology_loader_spark.sinks.reports import Report, write_reports

            write_reports(
                [
                    Report("update", rec.class_updates_report,
                           ONTOLOGY_CLASS_FIELDS),
                    Report("insert", rec.class_inserts_report,
                           ONTOLOGY_CLASS_FIELDS),
                    Report("insert", rec.relation_inserts_report,
                           ["subject", "predicate", "object"]),
                ],
                self.output_directory,
            )
        return rec
