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
