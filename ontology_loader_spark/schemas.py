"""Static StructType schemas (reference loads a LinkML SchemaView at
``ontology_load_controller.py:55`` via ``utils.py:8-17``; we declare the
same shapes as Spark SQL types — SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

ONTOLOGY_CLASS_TYPE = "nmdc:OntologyClass"  # ontology_processor.py:104
ONTOLOGY_RELATION_TYPE = "nmdc:OntologyRelation"  # ontology_processor.py:31
CLOSURE_PREDICATE = "entailed_isa_partof_closure"  # ontology_processor.py:203
DEFAULT_PREDICATES = ("rdfs:subClassOf", "BFO:0000050")  # ontology_processor.py:160

# OntologyRelation — ontology_processor.py:27-32; key (s,p,o) per
# mongodb_loader.py:64,219.
RELATION_SCHEMA = StructType(
    [
        StructField("subject", StringType(), False),
        StructField("predicate", StringType(), False),
        StructField("object", StringType(), False),
        StructField("type", StringType(), False),
    ]
)

RELATION_STRUCT = StructType(RELATION_SCHEMA.fields)

# OntologyClass — fields populated at ontology_processor.py:102-111;
# booleans non-null per ontology_processor.py:113-117 and
# mongodb_loader.py:92-97.
ONTOLOGY_CLASS_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("type", StringType(), False),
        StructField("alternative_names", ArrayType(StringType(), False), False),
        StructField("definition", StringType(), False),
        StructField("relations", ArrayType(RELATION_STRUCT, False), False),
        StructField("is_root", BooleanType(), False),
        StructField("is_obsolete", BooleanType(), False),
        StructField("name", StringType(), False),
    ]
)

# The introspected field order the reference uses for reports
# (mongodb_loader.py:223: [field.name for field in fields(OntologyClass)])
ONTOLOGY_CLASS_FIELDS = [f.name for f in ONTOLOGY_CLASS_SCHEMA.fields]

# Term dictionary — what the reference reads per-entity from the oaklib
# adapter (label :110, definition :106, aliases :105, obsolete :109,141-148)
# landed as one columnar table (SURVEY.md §1.3).
TERM_DICT_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("name", StringType(), True),
        StructField("definition", StringType(), True),
        StructField("alternative_names", ArrayType(StringType(), False), True),
        StructField("is_obsolete", BooleanType(), True),
        StructField("replaced_by", StringType(), True),
    ]
)

# Edge table — adapter.relationships() stream (ontology_processor.py:177).
EDGE_SCHEMA = StructType(
    [
        StructField("subject", StringType(), False),
        StructField("predicate", StringType(), False),
        StructField("object", StringType(), False),
    ]
)

# Transcripts — BASELINE.json input_hint (new input, not in reference).
TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), False),
        StructField("text", StringType(), False),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)

# Mention rows emitted by the detection UDF (SURVEY.md §7.0 stage T1→T2).
MENTION_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("term_id", StringType(), False),
        StructField("surface", StringType(), False),
    ]
)
