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


def _skewed_embeddings(spark, n):
    """All vectors in one orthant (first 4 dims positive) — the whole
    corpus lands in a single sign-LSH bucket."""
    rows = [
        (i, [1.0, 0.5, 0.25, 0.125,
             float((i * 7) % 13) / 13.0 - 0.5,
             float((i * 11) % 17) / 17.0 - 0.5])
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(8)


def test_embedding_near_dup_salt_split(spark):
    """Skewed orthant: one bucket holds the whole corpus. The salt
    split bounds within-bucket work at O(B·max_bucket) — pairs are
    emitted within deterministic sub-buckets only — while staying
    exactly the uncapped join for buckets under the cap."""
    from ontology_loader_spark.operators.similarity import embedding_near_dups

    n, cap = 300, 32
    embs = _skewed_embeddings(spark, n)

    capped = embedding_near_dups(embs, threshold=-1.0, max_bucket=cap)
    rows = capped.collect()
    splits = -(-n // cap)  # ceil(300/32) = 10 sub-buckets of 30
    # pairs only within a sub-bucket (vec_id % splits)
    assert all(r["a"] % splits == r["b"] % splits for r in rows)
    # exactly sum-over-subs C(s,2): 10 * C(30,2), not C(300,2)
    assert len(rows) == splits * (n // splits) * (n // splits - 1) // 2
    assert len(rows) < n * (n - 1) // 2 / 10

    # under the cap the split is a no-op: identical to the uncapped join
    uncapped = embedding_near_dups(embs, threshold=-1.0, max_bucket=n)
    assert uncapped.count() == n * (n - 1) // 2
    small = _skewed_embeddings(spark, 20)
    a = sorted(map(tuple, embedding_near_dups(small, 0.0, max_bucket=64).collect()))
    b = sorted(map(tuple, embedding_near_dups(small, 0.0, max_bucket=10**9).collect()))
    assert a == b


def test_lsh_topk_hot_bucket_cap(spark):
    """Hot bucket in the top-k path: the corpus side is capped to a
    deterministic md5-ordered sample per bucket, so per-query work is
    O(max_bucket); queries themselves are never dropped."""
    import hashlib

    from pyspark.sql import functions as F  # noqa: F811

    from ontology_loader_spark.operators.similarity import lsh_topk

    n, cap, k = 300, 16, 3
    embs = _skewed_embeddings(spark, n)
    out = lsh_topk(embs, k=k, max_bucket=cap)
    got = out.collect()

    # expected sample: first `cap` vec_ids by md5(str(vec_id))
    sample = set(sorted(range(n), key=lambda i: (hashlib.md5(
        str(i).encode()).hexdigest(), i))[:cap])
    assert {r["neighbor_id"] for r in got} <= sample
    # every query (vec_id % 100 == 0) still gets its full k
    per_q = {q: sum(1 for r in got if r["query_id"] == q)
             for q in (0, 100, 200)}
    assert per_q == {0: k, 100: k, 200: k}


def test_contamination_frequency_cap(spark):
    """Boilerplate footer shared by EVERY doc: its fingerprints land in
    all benchmark docs and would multiply the join by n_bench × n_train
    without the frequency cap. With the cap, boilerplate-only docs are
    not flagged while a genuine copy of a benchmark doc still is."""
    from ontology_loader_spark.operators.text import benchmark_contamination

    footer = ("copyright two thousand twenty six all rights reserved "
              "terms of service privacy policy contact us about careers")
    n = 100
    rows = []
    for i in range(n):
        body = " ".join(f"unique{i}w{j}" for j in range(40))
        rows.append((i, f"{body} {footer}"))
    # doc 51 is a verbatim copy of benchmark doc 50 (50 % 25 == 0)
    rows[51] = (51, rows[50][1])
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    flagged = benchmark_contamination(docs, max_bench_docs=2).collect()
    hits = {(r["doc_id"], r["bench_id"]) for r in flagged}
    assert (51, 50) in hits
    # boilerplate alone flags nobody else
    assert hits == {(51, 50)}

    # without the cap the ubiquitous footer fingerprints flag a swath
    # of unrelated (train, bench) pairs
    uncapped = benchmark_contamination(docs, max_bench_docs=10**9).count()
    assert uncapped > len(hits)


# --- key_skew_profile (operators/skew.py) ---------------------------------


def test_key_skew_profile_exact_stats(spark):
    from ontology_loader_spark.operators.skew import PPM, key_skew_profile

    rows = [("hot",)] * 60 + [("warm",)] * 30 + [("a",), ("b",)] + [(None,)] * 8
    df = spark.createDataFrame(rows, ["k"])
    prof = {r["key"]: r.asDict() for r in key_skew_profile(df, "k", top_k=3).collect()}
    # top-3 only, rank by count desc then key asc
    assert set(prof) == {"hot", "warm", "NULL"}
    assert prof["hot"]["rank"] == 1 and prof["warm"]["rank"] == 2
    assert prof["NULL"]["rank"] == 3 and prof["NULL"]["n_rows"] == 8
    total, n_keys = 100, 5
    assert prof["hot"]["share_ppm"] == 60 * PPM // total
    # hot is exactly 3x the mean key load (100 rows / 5 keys = 20)
    assert prof["hot"]["x_mean_ppm"] == 60 * n_keys * PPM // total == 3 * PPM


def test_key_skew_profile_tie_break_and_oracle_parity(spark):
    import duckdb

    from ontology_loader_spark.operators.skew import (
        key_skew_profile,
        key_skew_profile_sql,
    )

    rows = [(k,) for k in ["z", "y", "z", "y", "x", "w", "w", "w"]]
    df = spark.createDataFrame(rows, ["k"])
    got = [
        tuple(r)
        for r in key_skew_profile(df, "k", top_k=4)
        .orderBy("rank")
        .collect()
    ]
    # ties (y=2, z=2) break on key ascending
    assert [g[0] for g in got] == ["w", "y", "z", "x"]
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " +
                ", ".join(f"('{k[0]}')" for k in rows) + ") v(k)")
    want = con.execute(key_skew_profile_sql("t", "k", top_k=4) +
                       " ORDER BY rank").fetchall()
    assert got == [tuple(w) for w in want]
