"""JSONL / CSV document sources with corrupt-record quarantine.

A web-scale document corpus rarely arrives as clean parquet — the raw
feeds are JSONL dumps and CSV exports with a tail of malformed rows
(truncated lines, wrong column counts, type garbage). The
production-grade ingestion contract is: load what parses, QUARANTINE
what doesn't — never silently drop, never fail the whole batch on one
bad line.

Spark-first shape:

- the schema is EXPLICIT (passed in, default = the engine's documents
  table). At 100 TB, schema inference is a full extra pass over the
  data and can mis-type on a skewed sample — never infer in
  production.
- ``mode=PERMISSIVE`` + ``columnNameOfCorruptRecord`` is the built-in
  JVM-side quarantine channel: unparseable rows surface with the raw
  line in the corrupt column and NULLs elsewhere, inside the normal
  distributed scan (no Python, no driver).
- the split is two filters over ONE scan: ``clean`` (corrupt column
  null AND required keys present) and ``quarantined`` (everything
  else, carrying the raw record + a reason). Both are plain Catalyst
  predicates; writing the quarantine to a side table is the caller's
  one extra line.
- gotcha encoded here: Spark refuses a query whose only referenced
  column is the internal corrupt-record column (it would let the
  parser skip the very work that detects corruption), so the raw
  frame is cached before the split — documented Spark behavior, not a
  workaround.

Reference parity: the reference ingests only its curated SQLite
artifact; this is §2.3-style corpus infrastructure for the training
-data pipeline (TESTDATA documents schema), same role as
``sinks/partitioned.py`` on the write side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

CORRUPT_COL = "_corrupt_record"

#: the engine's documents-table shape (TESTDATA.md)
DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def _with_corrupt(schema: StructType) -> StructType:
    return StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])


def _split(
    raw: DataFrame, schema: StructType, required: tuple[str, ...]
) -> tuple[DataFrame, DataFrame]:
    # cache before touching the corrupt column: Spark disallows plans
    # that reference ONLY the internal corrupt-record column of a live
    # scan (SPARK-21610) — materializing the parsed batch first is the
    # documented contract
    raw = raw.cache()
    ok = F.col(CORRUPT_COL).isNull()
    for c in required:
        ok = ok & F.col(c).isNotNull()
    clean = raw.filter(ok).select(*[f.name for f in schema.fields])
    reason = (
        F.when(F.col(CORRUPT_COL).isNotNull(), F.lit("unparseable"))
        .otherwise(F.lit("missing_required:" + ",".join(required)))
    )
    quarantined = raw.filter(~ok).select(
        F.coalesce(F.col(CORRUPT_COL), F.to_json(F.struct("*"))).alias("raw_record"),
        reason.alias("reason"),
    )
    return clean, quarantined


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType = DOCUMENTS_SCHEMA,
    required: tuple[str, ...] = ("doc_id", "text"),
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus dump → (clean, quarantined).

    clean: exactly ``schema``; quarantined: (raw_record, reason) — the
    raw line for unparseable rows, a JSON render of the partial parse
    for rows missing required keys."""
    raw = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    return _split(raw, schema, required)


def read_documents_csv(
    spark: SparkSession,
    path: str,
    schema: StructType = DOCUMENTS_SCHEMA,
    required: tuple[str, ...] = ("doc_id", "text"),
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """Read a CSV corpus export → (clean, quarantined) — same contract
    as the JSONL reader; wrong column counts and type garbage land in
    quarantine with the raw line."""
    raw = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )
    return _split(raw, schema, required)
