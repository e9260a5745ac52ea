"""Standalone seeded synthesis of the KG input tables at arbitrary
scale — no external data (FIXTURES.md). Content is a pure function of
row index (modular arithmetic over ``spark.range``), so the generated
rows are identical at ANY parallelism level and any partition count —
the property the two-cluster-size scaling gate depends on.

The generators emit part/lineitem-shaped frames and feed them through
the same mapping functions the driver-parquet path uses
(``derive.term_dict_from_part`` etc.), so synthetic and driver corpora
exercise identical operator code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ontology_loader_spark.inputs.derive import edges_from_part, term_dict_from_part

ADJECTIVES = ["cold", "small", "large", "new", "blue", "red", "fast",
              "slow", "old", "tiny"]
NOUNS = ["widget", "bolt", "gear", "rod", "gizmo", "bracket", "flange",
         "valve", "shaft", "coupler"]
FLAGS = ["N", "A", "R"]
STATUS = ["O", "F"]


def synth_part(spark: SparkSession, n_terms: int) -> DataFrame:
    """part-shaped frame: deterministic names/brands/types from the
    row index."""
    k = F.col("id")
    adj = F.element_at(F.lit(ADJECTIVES), (k % len(ADJECTIVES) + 1).cast("int"))
    noun = F.element_at(F.lit(NOUNS), (F.floor(k / 7) % len(NOUNS) + 1).cast("int"))
    return spark.range(n_terms).select(
        k.alias("p_partkey"),
        F.concat(adj, F.lit(" "), noun).alias("p_name"),
        F.concat(F.lit("Brand#"), (k % 25).cast("string")).alias("p_brand"),
        F.element_at(F.lit(["ECONOMY", "PROMO", "STANDARD"]),
                     (k % 3 + 1).cast("int")).alias("p_type"),
        (k % 50).cast("int").alias("p_size"),
        (F.lit(900.0) + (k % 1000) / 10.0).alias("p_retailprice"),
    )


def synth_term_dict(spark: SparkSession, n_terms: int) -> DataFrame:
    return term_dict_from_part(synth_part(spark, n_terms))


def synth_edges(spark: SparkSession, n_terms: int) -> DataFrame:
    return edges_from_part(synth_part(spark, n_terms))


def synth_transcripts(
    spark: SparkSession,
    n_convs: int,
    n_terms: int,
    max_turns: int = 8,
    n_partitions: int | None = None,
) -> DataFrame:
    """Transcript corpus: conv i has 1 + (i % max_turns) turns (zipf-ish
    spread); each turn's text embeds the surface form of a
    deterministic term. Identical rows at any parallelism."""
    part = synth_part(spark, n_terms).select(
        "p_partkey",
        F.concat("p_name", F.lit(" "), F.col("p_partkey").cast("string"))
        .alias("surface"),
    )
    rng = spark.range(n_convs, numPartitions=n_partitions)
    convs = rng.select(
        F.col("id").alias("c"),
        F.explode(F.sequence(F.lit(0), (F.col("id") % max_turns).cast("int")))
        .alias("turn_idx"),
    )
    term_key = (F.col("c") * 31 + F.col("turn_idx") * 7) % n_terms
    role_idx = F.col("turn_idx") % 3
    joined = convs.withColumn("p_partkey", term_key).join(
        F.broadcast(part), "p_partkey"
    )
    return joined.select(
        F.concat(F.lit("conv_"), F.col("c").cast("string")).alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.when(role_idx == 0, "user").when(role_idx == 1, "assistant")
        .otherwise("tool").alias("role"),
        F.concat(
            F.lit("turn "), F.col("turn_idx").cast("string"), F.lit(": "),
            F.col("surface"), F.lit(" "),
            F.element_at(F.lit(FLAGS), (F.col("c") % 3 + 1).cast("int")),
            F.element_at(F.lit(STATUS), (F.col("c") % 2 + 1).cast("int")),
        ).alias("text"),
        F.when(role_idx == 2, F.concat(F.lit("search_"),
                                       (F.col("c") % 5).cast("string")))
        .otherwise(F.lit(None).cast("string")).alias("tool"),
        F.timestamp_add(
            "SECOND",
            (F.col("c") * 97 + F.col("turn_idx")).cast("int"),
            F.to_timestamp_ntz(F.lit("2026-01-01 00:00:00")),
        ).alias("ts"),
    )
