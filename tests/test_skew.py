"""Hot-entity skew stress: one hub term mentioned in 60% of turns.
The salted two-phase aggregation must equal the plain groupBy, and the
full mention→link→count path must survive the skew (the north rule's
"salted-key broadcast linking ... to kill hot-entity skew")."""

import datetime

from pyspark.sql import functions as F

from ontology_loader_spark.schemas import TRANSCRIPT_SCHEMA
from ontology_loader_spark.transcripts.mentions import (
    detect_mentions,
    mention_counts_salted,
    top1_links,
)

BASE = datetime.datetime(2026, 3, 1)


def test_hub_term_skew(spark):
    n = 3000
    rows = [
        (f"c{i % 97}", i // 97,
         ["user", "assistant", "tool"][i % 3],
         # 60% of turns mention the hub; the rest spread over 50 cold terms
         f"x hubterm y t{i}" if i % 5 < 3 else f"x coldterm{i % 50} y t{i}",
         None, BASE + datetime.timedelta(seconds=i))
        for i in range(n)
    ]
    tr = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).repartition(16)
    md = spark.createDataFrame(
        [("T:hub", "hubterm")] + [(f"T:c{j}", f"coldterm{j}") for j in range(50)],
        "id string, name string",
    )
    mentions = detect_mentions(spark, tr, md).localCheckpoint(eager=True)

    plain = {r["term_id"]: r["n"] for r in
             mentions.groupBy("term_id").agg(F.count("*").alias("n")).collect()}
    salted = {r["term_id"]: r["n_mentions"] for r in
              mention_counts_salted(mentions, n_salt=8).collect()}
    assert salted == plain
    assert plain["T:hub"] == sum(1 for i in range(n) if i % 5 < 3)

    # the hot key must not break top-1 linking either
    links = top1_links(mentions)
    assert links.count() == n  # every turn has exactly one mention


def test_lsh_hot_bucket_cap(spark):
    """Skewed corpus: a boilerplate cluster of identical docs lands in
    one LSH bucket per band. Without the cap that bucket alone emits
    B(B-1)/2 pairs; with it, candidate output is bounded by
    bands × max_bucket² regardless of skew (the 100 TB guard)."""
    from ontology_loader_spark.operators.dedup import (
        BANDS,
        minhash_bands,
        minhash_candidate_pairs,
    )

    n_boiler, n_live = 200, 40
    rows = [(f"b{i:04d}", "the same boilerplate text repeated again and again "
             "for every scraped page footer in the corpus")
            for i in range(n_boiler)]
    rows += [(f"d{i:04d}",
              " ".join(f"tok{(i * 7 + j * 13) % 997}" for j in range(30)))
             for i in range(n_live)]
    docs = spark.createDataFrame(rows, "doc_id string, text string").repartition(8)

    cap = 16
    pairs = minhash_candidate_pairs(docs, max_bucket=cap)
    n_pairs = pairs.count()
    # bound holds even under total skew
    max_buckets = minhash_bands(docs).select("band", "band_key").distinct().count()
    assert n_pairs <= max_buckets * cap * (cap - 1) // 2
    # the boilerplate cluster (bucket size 200 > cap) is dropped entirely
    assert pairs.filter(F.col("a").startswith("b") | F.col("b").startswith("b")).count() == 0

    # uncapped, the same corpus explodes quadratically — the cap cuts
    # candidates by orders of magnitude
    uncapped = minhash_candidate_pairs(docs, max_bucket=10**9).count()
    assert uncapped >= n_boiler * (n_boiler - 1) // 2
    assert n_pairs < uncapped / 100
