"""Text-analysis operators for training-data pipelines: language-ID
heuristic, quality scoring, token counting, document fingerprinting.
All pure built-in expressions (codegen'd; no UDF) with exact-arithmetic
outputs so the DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ontology_loader_spark.operators.dedup import DOC_TOKENS_CTE, doc_tokens

STOPWORDS = ("the", "a", "of", "and", "to", "is", "in")


def text_quality(documents: DataFrame) -> DataFrame:
    """Per-doc quality features: token count, mean token length,
    stopword ratio, and a composite score.

    All ratios are single divisions of exact integers (bit-identical
    across engines); the composite is a fixed linear form of those.
    """
    toks = doc_tokens(documents)
    agg = toks.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.length("tok")).alias("sum_len"),
        F.sum(F.when(F.col("tok").isin(*STOPWORDS), 1).otherwise(0)).alias("n_stop"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        (F.col("sum_len").cast("double") / F.col("n_tokens").cast("double")).alias(
            "mean_tok_len"
        ),
        (F.col("n_stop").cast("double") / F.col("n_tokens").cast("double")).alias(
            "stopword_ratio"
        ),
    )


def text_quality_sql() -> str:
    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    return (
        "WITH " + DOC_TOKENS_CTE.strip() + f"""
SELECT doc_id,
  COUNT(*) AS n_tokens,
  CAST(SUM(length(tok)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_tok_len,
  CAST(SUM(CASE WHEN tok IN ({stop}) THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS stopword_ratio
FROM doc_tokens GROUP BY doc_id"""
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """N-gram-free language-ID heuristic: stopword density.

    Real pipelines plug a character-n-gram model here (as a pandas
    UDF); the pinned semantics for the oracle is the deterministic
    density rule: ≥5% English stopwords → 'en', else 'xx'.
    """
    q = text_quality(documents)
    return q.select(
        "doc_id",
        F.when(F.col("stopword_ratio") * 20 >= 1, F.lit("en"))
        .otherwise(F.lit("xx"))
        .alias("pred_lang"),
    )


def lang_id_sql() -> str:
    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    return (
        "WITH " + DOC_TOKENS_CTE.strip() + f""",
q AS (
  SELECT doc_id,
    CAST(SUM(CASE WHEN tok IN ({stop}) THEN 1 ELSE 0 END) AS DOUBLE)
      / CAST(COUNT(*) AS DOUBLE) AS stopword_ratio
  FROM doc_tokens GROUP BY doc_id
)
SELECT doc_id,
  CASE WHEN stopword_ratio * 20 >= 1 THEN 'en' ELSE 'xx' END AS pred_lang
FROM q"""
    )


def doc_fingerprint(documents: DataFrame) -> DataFrame:
    """Two fingerprints per doc: content digest (md5 of raw text) and
    an order-insensitive bag fingerprint (md5 of the sorted distinct
    token list) — the cheap shift-robust near-dup key."""
    toks = doc_tokens(documents).distinct()
    bag = toks.groupBy("doc_id").agg(
        F.md5(F.array_join(F.sort_array(F.collect_list("tok")), " ")).alias("bag_fp")
    )
    return (
        documents.select("doc_id", F.md5("text").alias("content_fp"))
        .join(bag, "doc_id", "left")
    )


def doc_fingerprint_sql() -> str:
    return (
        "WITH " + DOC_TOKENS_CTE.strip() + """,
tokset AS (SELECT DISTINCT doc_id, tok FROM doc_tokens),
bag AS (
  SELECT doc_id, md5(string_agg(tok, ' ' ORDER BY tok)) AS bag_fp
  FROM tokset GROUP BY doc_id
)
SELECT d.doc_id AS doc_id, md5(d.text) AS content_fp, b.bag_fp AS bag_fp
FROM documents d LEFT JOIN bag b ON b.doc_id = d.doc_id"""
    )
