"""Injected-store controller parity
(``ontology_load_controller.py:31-50,52-92``): constructor validation,
injected vs owned store equivalence, and the two-run fixpoint."""

import pytest

from ontology_loader_spark.controller import OntologyLoaderController
from ontology_loader_spark.schemas import EDGE_SCHEMA, TERM_DICT_SCHEMA
from ontology_loader_spark.sinks.state import ParquetStateStore

TERMS = [
    ("T:1", "one", "d1", [], False, None),
    ("T:2", "two", "d2", [], False, None),
    ("T:3", "old", "d3", [], True, "T:1"),
]
EDGES = [("T:2", "rdfs:subClassOf", "T:1")]


def _dfs(spark):
    return (
        spark.createDataFrame(TERMS, TERM_DICT_SCHEMA),
        spark.createDataFrame(EDGES, EDGE_SCHEMA),
    )


def test_client_without_namespace_rejected(spark, tmp_path):
    td, ed = _dfs(spark)
    with pytest.raises(ValueError, match="namespace is required"):
        OntologyLoaderController(
            spark, "t", td, ed, store_client=ParquetStateStore(str(tmp_path)),
        )


def test_no_client_requires_state_root(spark):
    td, ed = _dfs(spark)
    with pytest.raises(ValueError, match="state_root is required"):
        OntologyLoaderController(spark, "t", td, ed)


def test_injected_store_load_and_fixpoint(spark, tmp_path):
    td, ed = _dfs(spark)
    store = ParquetStateStore(str(tmp_path / "store"))
    ctl = OntologyLoaderController(
        spark, "t", td, ed, store_client=store, namespace="prod",
    )
    rec1 = ctl.run_ontology_loader()
    assert rec1.class_inserts_report.count() == 3
    # state landed in the INJECTED store under the namespace
    assert store.exists("prod.ontology_class_set")
    assert store.read(spark, "prod.ontology_class_set").count() == 3

    # second run against the populated store: fixpoint
    rec2 = OntologyLoaderController(
        spark, "t", td, ed, store_client=store, namespace="prod",
    ).run_ontology_loader()
    assert rec2.class_inserts_report.count() == 0
    assert rec2.class_updates_report.count() == 0


def test_owned_store_equivalent(spark, tmp_path):
    td, ed = _dfs(spark)
    injected = ParquetStateStore(str(tmp_path / "a"))
    rec_inj = OntologyLoaderController(
        spark, "t", td, ed, store_client=injected, namespace="kg",
    ).run_ontology_loader()
    rec_own = OntologyLoaderController(
        spark, "t", td, ed, state_root=str(tmp_path / "b"),
    ).run_ontology_loader()
    a = sorted(map(tuple, rec_inj.relation_state.collect()))
    b = sorted(map(tuple, rec_own.relation_state.collect()))
    assert a == b
