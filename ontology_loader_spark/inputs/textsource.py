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


# ------------------------------------------------------------------
# Gate fixtures: a deterministic corrupted export of the documents
# table. The corruption rules are pure functions of doc_id, so the
# DuckDB oracle recomputes the expected clean / quarantined sets from
# the documents VIEW alone — it never reads the fixture file, which
# keeps the gate engine-independent (no read_csv dialect coupling).
# Testdata invariant the fixture relies on (asserted in pytest): text
# is [a-z0-9 ] only and no column is NULL, so lines need no quoting.
#
#   doc_id % 10 == 7  -> type garbage in the doc_id field  -> unparseable
#   doc_id % 10 == 3  -> required `text` field missing     -> missing_required
#   otherwise         -> well-formed row                   -> clean
# ------------------------------------------------------------------

UNPARSEABLE_RESIDUE = 7
MISSING_RESIDUE = 3


def _doc_lines_csv(documents: DataFrame) -> DataFrame:
    i = F.col("doc_id")
    did = i.cast("string")
    tail = F.concat_ws(
        ",", F.col("lang"), F.col("source"), F.col("n_chars").cast("string")
    )
    line = (
        F.when(
            i % 10 == UNPARSEABLE_RESIDUE,
            F.concat_ws(",", F.concat(F.lit("corrupt"), did), F.col("text"), tail),
        )
        .when(i % 10 == MISSING_RESIDUE, F.concat_ws(",", did, F.lit(""), tail))
        .otherwise(F.concat_ws(",", did, F.col("text"), tail))
    )
    return documents.select(line.alias("value"))


def _doc_lines_jsonl(documents: DataFrame) -> DataFrame:
    i = F.col("doc_id")
    did = i.cast("string")
    head = F.concat(F.lit('{"doc_id": '), did)
    full = F.concat(
        head,
        F.lit(', "text": "'), F.col("text"),
        F.lit('", "lang": "'), F.col("lang"),
        F.lit('", "source": "'), F.col("source"),
        F.lit('", "n_chars": '), F.col("n_chars").cast("string"),
        F.lit("}"),
    )
    truncated = F.concat(head, F.lit(', "text": "'), F.col("text"), F.lit('"'))
    missing = F.concat(
        head,
        F.lit(', "lang": "'), F.col("lang"),
        F.lit('", "source": "'), F.col("source"),
        F.lit('", "n_chars": '), F.col("n_chars").cast("string"),
        F.lit("}"),
    )
    line = (
        F.when(i % 10 == UNPARSEABLE_RESIDUE, truncated)
        .when(i % 10 == MISSING_RESIDUE, missing)
        .otherwise(full)
    )
    return documents.select(line.alias("value"))


def write_fixture(spark: SparkSession, sf_dir: str, kind: str, out_dir: str) -> str:
    """Materialize the corrupted export (kind: 'csv' | 'jsonl') as a
    text directory under ``out_dir`` — a distributed write (one text
    part per input partition), deterministic content at any
    parallelism."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lines = _doc_lines_csv(docs) if kind == "csv" else _doc_lines_jsonl(docs)
    lines.write.mode("overwrite").text(out_dir)
    return out_dir


def quarantine_key(quarantined: DataFrame) -> DataFrame:
    """Canonical comparable form of the quarantine channel:
    (reason, rec_key) where rec_key identifies the row — the extracted
    doc_id for structurally-valid rows that failed the required-field
    check, the raw line for unparseable ones."""
    return quarantined.select(
        "reason",
        F.coalesce(
            F.get_json_object(F.col("raw_record"), "$.doc_id"),
            F.col("raw_record"),
        ).alias("rec_key"),
    )


_CSV_RAW_LINE_SQL = (
    "'corrupt' || CAST(doc_id AS VARCHAR) || ',' || text || ',' || lang"
    " || ',' || source || ',' || CAST(n_chars AS VARCHAR)"
)
_JSONL_RAW_LINE_SQL = (
    "'{\"doc_id\": ' || CAST(doc_id AS VARCHAR) || ', \"text\": \"' || text || '\"'"
)


def clean_sql() -> str:
    """Oracle for the clean channel (identical for CSV and JSONL: both
    fixtures corrupt the same residues)."""
    return f"""
SELECT doc_id, text, lang, source, n_chars
FROM documents
WHERE doc_id % 10 NOT IN ({UNPARSEABLE_RESIDUE}, {MISSING_RESIDUE})
"""


def quarantine_sql(kind: str) -> str:
    raw = _CSV_RAW_LINE_SQL if kind == "csv" else _JSONL_RAW_LINE_SQL
    return f"""
SELECT 'unparseable' AS reason, {raw} AS rec_key
FROM documents WHERE doc_id % 10 = {UNPARSEABLE_RESIDUE}
UNION ALL
SELECT 'missing_required:doc_id,text' AS reason, CAST(doc_id AS VARCHAR) AS rec_key
FROM documents WHERE doc_id % 10 = {MISSING_RESIDUE}
"""
