"""F1 semantics pinned by the reference's parametrized cases
(``tests/test_ontology_processor.py:8-40``): case-insensitive prefix
match before the first colon; colon-less ids rejected."""

import pytest
from pyspark.sql import functions as F

from ontology_loader_spark.operators.curie import matches_ontology

# The reference's 13 (ontology, entity_id, expected) cases, same spirit:
CASES = [
    ("envo", "ENVO:00002005", True),
    ("envo", "envo:123", True),
    ("envo", "EnVo:999", True),
    ("ENVO", "envo:1", True),
    ("envo", "ENVO_00002005", False),   # no colon
    ("envo", "ENVO", False),            # no colon
    ("envo", "GO:0008150", False),      # other ontology
    ("envo", "OBI:1", False),
    ("go", "GO:0008150", True),
    ("go", "go:1", True),
    ("go", "GOO:1", False),             # prefix superset
    ("envo", ":123", False),            # empty prefix
    ("envo", "xENVO:1", False),
]


@pytest.mark.parametrize("ontology,entity_id,expected", CASES)
def test_matches_ontology(spark, ontology, entity_id, expected):
    df = spark.createDataFrame([(entity_id,)], "id string")
    got = df.select(matches_ontology(F.col("id"), ontology).alias("m")).first()["m"]
    assert got is expected


def test_matches_is_catalyst_only(spark):
    """The predicate must compile to built-in expressions (no Python
    UDF in the hot path — SURVEY.md §7.2)."""
    df = spark.createDataFrame([("ENVO:1",)], "id string")
    plan = df.filter(matches_ontology(F.col("id"), "envo"))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
