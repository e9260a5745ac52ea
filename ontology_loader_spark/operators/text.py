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


WINNOW_K = 8   # char k-gram length
WINNOW_W = 4   # winnowing window (min over W consecutive k-gram hashes)


def winnowing_fingerprints(documents: DataFrame) -> DataFrame:
    """Rolling-hash document fingerprints via winnowing (Schleimer et
    al.): hash every char k-gram, keep the minimum hash of each
    w-window of consecutive positions, emit the distinct kept hashes.
    Robust to insertions/shifts — the near-dup key exact hashing
    misses.

    Spark-first: positions come from ``sequence``+``explode`` (no UDF),
    the k-gram hash is the shared instr-parsed md5 prefix, and the
    window minimum is a bounded ROWS window per doc ordered by
    position. At corpus scale the explode fans out |text| rows per doc
    — partition count scales with input splits; the per-doc window
    needs only a (doc_id, pos) sort within partitions.
    """
    from ontology_loader_spark.operators.dedup import _hex4_spark
    from pyspark.sql import Window

    grams = (
        documents.select(
            "doc_id",
            F.lower("text").alias("t"),
        )
        .filter(F.length("t") >= WINNOW_K)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.length("t") - (WINNOW_K - 1))
            ).alias("pos"),
            F.col("t"),
        )
        .select(
            "doc_id",
            "pos",
            _hex4_spark(F.md5(F.expr(f"substr(t, pos, {WINNOW_K})"))).alias("h"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, WINNOW_W - 1)
    return (
        grams.withColumn("wmin", F.min("h").over(w))
        .select("doc_id", F.col("wmin").alias("fingerprint"))
        .distinct()
    )


def winnowing_fingerprints_sql() -> str:
    from ontology_loader_spark.operators.dedup import _hex4_sql

    h = _hex4_sql(f"md5(substr(t, pos, {WINNOW_K}))")
    return f"""
WITH grams AS (
  SELECT doc_id, pos, {h} AS h
  FROM (
    SELECT doc_id, lower(text) AS t,
           unnest(range(1, length(text) - {WINNOW_K - 1} + 1)) AS pos
    FROM documents WHERE length(text) >= {WINNOW_K}
  )
)
SELECT DISTINCT doc_id,
  MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING)
  AS fingerprint
FROM grams"""


def token_stats(documents: DataFrame) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish regex
    (alnum runs + single punctuation marks) — the pre-tokenization
    count a training pipeline budgets by."""
    return documents.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda t: t != "")).cast("long")
        .alias("n_ws_tokens"),
        F.expr("regexp_count(text, '[a-z0-9]+')").cast("long")
        .alias("n_word_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


def token_stats_sql() -> str:
    return """
SELECT doc_id,
  CAST(length(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT)
    AS n_ws_tokens,
  CAST(length(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT)
    AS n_word_tokens,
  CAST(length(text) AS BIGINT) AS n_chars
FROM documents"""


QUANTILE_PCTS = (25, 50, 90)


def group_quantiles(
    documents: DataFrame,
    group_col: str = "source",
    pcts: tuple[int, ...] = QUANTILE_PCTS,
) -> DataFrame:
    """EXACT per-group discrete quantiles of document token counts —
    the length-distribution report a data pipeline cuts per source /
    domain (e.g. "p90 length per crawl source" for budget planning).
    Output (group, p25_tokens, p50_tokens, p90_tokens).

    Scale design — the histogram-CDF trick instead of per-group
    sorting: quantiles of an integer-valued measure never need the row
    set, only the value histogram. Stage 1 groupBy (group, value) is
    map-side combinable, collapsing N docs to at most |groups| ×
    |distinct lengths| rows (lengths are bounded — a 100 TB corpus
    still has ~10⁵ distinct token counts, so per-group histograms are
    tiny). The running-sum window then orders DISTINCT VALUES within a
    group — thousands of rows per partition key, never corpus rows —
    and the quantile is the least value whose cumulative count reaches
    ceil(p% · n), computed with integer cross-multiplication
    (cum·100 ≥ p·n) so Spark and the SQL oracle agree bit-for-bit.
    Contrast with percentile_approx (approximate) or sort-based exact
    percentile (per-group full sort): this is exact AND one narrow
    aggregation + one bounded window."""
    from pyspark.sql import Window

    ntok = documents.select(
        F.col(group_col).alias("grp"),
        F.size(F.filter(F.split(F.lower("text"), " "), lambda t: t != ""))
        .cast("long")
        .alias("v"),
    )
    hist = ntok.groupBy("grp", "v").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("grp").orderBy("v")
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    tot = hist.groupBy("grp").agg(F.sum("cnt").alias("n"))
    j = cum.join(F.broadcast(tot), "grp")
    aggs = [
        F.min(F.when(F.col("cum") * 100 >= p * F.col("n"), F.col("v")))
        .cast("long")
        .alias(f"p{p}_tokens")
        for p in pcts
    ]
    return j.groupBy("grp").agg(*aggs).withColumnRenamed("grp", group_col)


def group_quantiles_sql(
    group_col: str = "source", pcts: tuple[int, ...] = QUANTILE_PCTS
) -> str:
    picks = ",\n  ".join(
        f"CAST(MIN(CASE WHEN cum * 100 >= {p} * n THEN v END) AS BIGINT) "
        f"AS p{p}_tokens"
        for p in pcts
    )
    return f"""
WITH ntok AS (
  SELECT {group_col} AS grp,
    CAST(length(list_filter(string_split(lower(text), ' '), t -> t <> ''))
         AS BIGINT) AS v
  FROM documents
),
hist AS (SELECT grp, v, COUNT(*) AS cnt FROM ntok GROUP BY grp, v),
cum AS (
  SELECT grp, v, cnt,
    SUM(cnt) OVER (PARTITION BY grp ORDER BY v) AS cum
  FROM hist
),
tot AS (SELECT grp, SUM(cnt) AS n FROM hist GROUP BY grp)
SELECT c.grp AS {group_col},
  {picks}
FROM cum c JOIN tot t ON t.grp = c.grp
GROUP BY c.grp"""


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Gopher-style repetition quality signals, exactly computable:

    - ``shingle_rep_ratio``: fraction of 3-token shingles that are
      repeats of an earlier shingle (1 − distinct/total) — the
      "duplicate n-gram fraction" rule;
    - ``top_token_ratio``: the most frequent token's share of all
      tokens — the "top word dominates" rule.

    Both are exact-integer ratios divided once in doubles
    (engine-order-independent). Two map-side-combinable aggregations
    keyed on doc_id; the per-(doc, token) counts shuffle on a
    well-spread composite key. Docs shorter than one shingle report 0
    repetition. Output (doc_id, n_shingles, shingle_rep_ratio,
    top_token_ratio)."""
    from ontology_loader_spark.operators.dedup import doc_shingles, doc_tokens

    sh = doc_shingles(documents).groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"),
        F.countDistinct("shingle").alias("n_distinct"),
    )
    tok_counts = (
        doc_tokens(documents)
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("n_tok"))
    )
    return (
        documents.select("doc_id")
        .join(sh, "doc_id", "left")
        .join(tok_counts, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.when(
                F.col("n_shingles").isNull() | (F.col("n_shingles") == 0),
                F.lit(0.0),
            )
            .otherwise(
                (F.col("n_shingles") - F.col("n_distinct")).cast("double")
                / F.col("n_shingles").cast("double")
            )
            .alias("shingle_rep_ratio"),
            F.when(F.col("n_tok").isNull(), F.lit(0.0))
            .otherwise(F.col("top_c").cast("double") / F.col("n_tok").cast("double"))
            .alias("top_token_ratio"),
        )
    )


def repetition_stats_sql() -> str:
    from ontology_loader_spark.operators.dedup import (
        DOC_SHINGLES_CTE,
        DOC_TOKENS_CTE,
    )

    return (
        "WITH " + DOC_SHINGLES_CTE.strip() + "," + DOC_TOKENS_CTE.strip() + """,
sh AS (
  SELECT doc_id, COUNT(*) AS n_shingles, COUNT(DISTINCT shingle) AS n_distinct
  FROM doc_shingles GROUP BY doc_id
),
tc AS (
  SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n_tok FROM (
    SELECT doc_id, tok, COUNT(*) AS c FROM doc_tokens GROUP BY doc_id, tok
  ) GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(COALESCE(s.n_shingles, 0) AS BIGINT) AS n_shingles,
  CASE WHEN s.n_shingles IS NULL OR s.n_shingles = 0 THEN 0.0
       ELSE CAST(s.n_shingles - s.n_distinct AS DOUBLE)
            / CAST(s.n_shingles AS DOUBLE) END AS shingle_rep_ratio,
  CASE WHEN t.n_tok IS NULL THEN 0.0
       ELSE CAST(t.top_c AS DOUBLE) / CAST(t.n_tok AS DOUBLE) END
    AS top_token_ratio
FROM documents d
LEFT JOIN sh s ON s.doc_id = d.doc_id
LEFT JOIN tc t ON t.doc_id = d.doc_id"""
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


BENCH_MOD = 25          # doc_id % 25 == 0 -> the pseudo-benchmark set
CONTAM_MIN_SHARED = 20  # shared winnowing fingerprints to flag overlap
# fingerprints present in more than this many benchmark docs are
# boilerplate (shared footers, license headers) — they multiply join
# output without carrying contamination signal, so they are dropped
# before the join (the LSH hot-bucket cap's analog for this operator)
CONTAM_MAX_BENCH_DOCS = 10


def benchmark_contamination(
    documents: DataFrame,
    bench_mod: int = BENCH_MOD,
    min_shared: int = CONTAM_MIN_SHARED,
    max_bench_docs: int = CONTAM_MAX_BENCH_DOCS,
) -> DataFrame:
    """Decontamination: flag training docs sharing at least
    ``min_shared`` winnowing fingerprints with any benchmark doc —
    the n-gram-overlap check run before a corpus ships to training,
    robust to shifts/insertions because winnowing is.

    Scale shape: the fingerprint join keys on the (uniform) rolling
    hash; the benchmark side is tiny relative to the corpus and
    broadcasts; per-pair counting is one map-side-combinable groupBy.
    ``max_bench_docs`` is the frequency cap: a fingerprint shared by
    more than that many benchmark docs is ubiquitous boilerplate — each
    such fingerprint multiplies join output by its benchmark frequency
    × its corpus frequency, so dropping them bounds the join fan-out;
    a genuine copy of one benchmark doc still shares plenty of sub-cap
    fingerprints. The cap is computed on the (tiny) benchmark side
    only. Here the benchmark set is carved from the corpus by a
    deterministic modulus so both engines see the same split; in
    production it is its own table. Output
    (doc_id, bench_id, n_shared)."""
    fp = winnowing_fingerprints(documents)
    bench = fp.filter(F.col("doc_id") % bench_mod == 0).select(
        F.col("doc_id").alias("bench_id"), "fingerprint"
    )
    rare = (
        bench.groupBy("fingerprint")
        .agg(F.count("*").alias("n_bench"))
        .filter(F.col("n_bench") <= max_bench_docs)
        .select("fingerprint")
    )
    bench = bench.join(F.broadcast(rare), "fingerprint", "left_semi")
    train = fp.filter(F.col("doc_id") % bench_mod != 0)
    return (
        train.join(F.broadcast(bench), "fingerprint")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def benchmark_contamination_sql(
    bench_mod: int = BENCH_MOD,
    min_shared: int = CONTAM_MIN_SHARED,
    max_bench_docs: int = CONTAM_MAX_BENCH_DOCS,
) -> str:
    from ontology_loader_spark.operators.dedup import _hex4_sql

    h = _hex4_sql(f"md5(substr(t, pos, {WINNOW_K}))")
    return f"""
WITH grams AS (
  SELECT doc_id, pos, {h} AS h
  FROM (
    SELECT doc_id, lower(text) AS t,
           unnest(range(1, length(text) - {WINNOW_K - 1} + 1)) AS pos
    FROM documents WHERE length(text) >= {WINNOW_K}
  )
),
fp AS (
  SELECT DISTINCT doc_id,
    MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING)
    AS fingerprint
  FROM grams
),
bench_all AS (SELECT doc_id AS bench_id, fingerprint FROM fp
              WHERE doc_id % {bench_mod} = 0),
rare AS (SELECT fingerprint FROM bench_all
         GROUP BY fingerprint HAVING COUNT(*) <= {max_bench_docs}),
bench AS (SELECT b.* FROM bench_all b
          JOIN rare r ON r.fingerprint = b.fingerprint),
train AS (SELECT * FROM fp WHERE doc_id % {bench_mod} <> 0)
SELECT t.doc_id AS doc_id, b.bench_id AS bench_id,
       COUNT(*) AS n_shared
FROM train t JOIN bench b ON t.fingerprint = b.fingerprint
GROUP BY t.doc_id, b.bench_id
HAVING COUNT(*) >= {min_shared}"""


# ----------------------------------------------------------------- BM25

BM25_QUERY = ("spark", "join", "window")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10


def bm25_topk(
    documents: DataFrame,
    query: tuple[str, ...] = BM25_QUERY,
    k1: float = BM25_K1,
    b: float = BM25_B,
    topk: int = BM25_TOPK,
) -> DataFrame:
    """BM25 retrieval scoring of a literal query against the corpus —
    the ranking primitive behind retrieval-based curation (nearest
    benchmark questions, targeted dedup, quality probes). Output the
    ``topk`` docs: (doc_id, score, rank).

    Spark-first shape: per-doc term frequencies for the |query| terms
    are |query| conditional aggregates inside ONE groupBy over the
    token explode (no per-term joins); the corpus stats the formula
    needs (N, df_t, avgdl) are three scalars from one tiny aggregate,
    computed identically by the SQL oracle. The score is written as a
    FIXED-ORDER arithmetic expression over the per-term partials, so
    double addition order cannot differ between engines; idf uses the
    BM25+ form ln(1 + (N-df+0.5)/(df+0.5)) which stays positive for
    ubiquitous terms. The idf — the ONE cross-libm transcendental in
    the formula (Python math.log here vs DuckDB ln in the oracle) — is
    floor-quantized to integer micro-nats (the lm_score discipline), so
    a 1-ulp libm divergence cannot flip score>0 or a rank tie; every
    other double op is the same IEEE expression tree on both engines.
    One wide shuffle total (the token groupBy on doc_id), then a global
    top-k (TakeOrdered — no full sort)."""
    import math

    toks = doc_tokens(documents)
    aggs = [F.count("*").alias("dl")] + [
        F.sum((F.col("tok") == t).cast("long")).alias(f"tf{i}")
        for i, t in enumerate(query)
    ]
    per_doc = toks.groupBy("doc_id").agg(*aggs)

    # corpus scalars — tiny action; the oracle computes the same
    # integers/ratio in SQL
    stats = per_doc.agg(
        F.count("*").alias("n"),
        F.sum("dl").alias("total_dl"),
        *[F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
          for i in range(len(query))],
    ).collect()[0]
    n = stats["n"]
    avgdl = stats["total_dl"] / n

    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double")
                        / F.lit(avgdl))
    score = F.lit(0.0)
    for i in range(len(query)):
        idf = math.floor(
            math.log(1.0 + (n - stats[f"df{i}"] + 0.5)
                     / (stats[f"df{i}"] + 0.5)) * LM_MICRO
        ) / LM_MICRO
        tf = F.col(f"tf{i}").cast("double")
        score = score + F.lit(idf) * tf * F.lit(k1 + 1.0) / (tf + norm)

    scored = per_doc.select("doc_id", score.alias("score")).filter(
        F.col("score") > 0
    )
    # TakeOrdered first (no full sort, no corpus-wide single-partition
    # window); the rank window then runs over only `topk` rows
    from pyspark.sql import Window

    top = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(topk)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "doc_id", "score", "rank"
    )


def bm25_topk_sql(
    query: tuple[str, ...] = BM25_QUERY,
    k1: float = BM25_K1,
    b: float = BM25_B,
    topk: int = BM25_TOPK,
) -> str:
    tf_cols = ",\n    ".join(
        f"SUM(CASE WHEN tok = '{t}' THEN 1 ELSE 0 END) AS tf{i}"
        for i, t in enumerate(query)
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(query))
    )
    terms = " + ".join(
        f"((FLOOR(ln(1.0 + (s.n - s.df{i} + 0.5) / (s.df{i} + 0.5))"
        f" * 1000000.0) / 1000000.0)"
        f" * CAST(p.tf{i} AS DOUBLE) * {k1 + 1.0}"
        f" / (CAST(p.tf{i} AS DOUBLE) + {k1} * ({1.0 - b} + {b}"
        f" * CAST(p.dl AS DOUBLE) / s.avgdl)))"
        for i in range(len(query))
    )
    return (
        "WITH " + DOC_TOKENS_CTE.strip() + f""",
per_doc AS (
  SELECT doc_id, COUNT(*) AS dl,
    {tf_cols}
  FROM doc_tokens GROUP BY doc_id
),
stats AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl, {df_cols}
  FROM per_doc
)
SELECT doc_id, score, rank FROM (
  SELECT p.doc_id, ({terms}) AS score,
    CAST(ROW_NUMBER() OVER (ORDER BY ({terms}) DESC, p.doc_id)
         AS INTEGER) AS rank
  FROM per_doc p, stats s
  WHERE ({terms}) > 0
) WHERE rank <= {topk}"""
    )


# ------------------------------------------------- unigram LM score

LM_MICRO = 1_000_000


def lm_score(documents: DataFrame) -> DataFrame:
    """Corpus-unigram language-model score per doc — the cheap proxy
    for the LM-perplexity quality filter (CCNet-style): documents made
    of globally-rare tokens score low. Output (doc_id, n_tokens,
    sum_logprob_micro) where sum_logprob_micro = Σ over tokens of
    floor(ln(corpus_count(tok)/corpus_total) · 1e6) — consumers divide
    by n_tokens for the mean.

    Determinism design: a double SUM of per-token logprobs is
    accumulation-order-dependent, so the logprob is floor-quantized to
    integer micro-nats ONCE PER DISTINCT TOKEN (ln's 1-ulp engine
    variation flips a floor with probability ~ulp/1e-6 ≈ 4e-10 per
    vocabulary entry — negligible), and the per-doc sum is then exact
    integer arithmetic: associative, shuffle-order-free. The unigram
    table is vocabulary-bounded (map-side-combinable groupBy on the
    token); the per-doc pass joins on the uniform token key."""
    toks = doc_tokens(documents)
    total = toks.count()
    counts = toks.groupBy("tok").agg(F.count("*").alias("c"))
    lp = counts.select(
        "tok",
        F.floor(
            F.log(F.col("c").cast("double") / F.lit(float(total))) * LM_MICRO
        ).cast("long").alias("lp_micro"),
    )
    return (
        toks.join(lp, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("lp_micro").alias("sum_logprob_micro"),
        )
    )


def lm_score_sql() -> str:
    return (
        "WITH " + DOC_TOKENS_CTE.strip() + f""",
total AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM doc_tokens),
lp AS (
  SELECT tok,
    CAST(FLOOR(ln(CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM total))
               * {LM_MICRO}) AS BIGINT) AS lp_micro
  FROM doc_tokens GROUP BY tok
)
SELECT doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_tokens,
  CAST(SUM(lp_micro) AS BIGINT) AS sum_logprob_micro
FROM doc_tokens d
JOIN lp ON lp.tok = d.tok
GROUP BY doc_id"""
    )


# --------------------------------------------------- text normalization

def normalize_text(documents: DataFrame) -> DataFrame:
    """Canonical cleaning pass (the step before tokenization/dedup in
    a corpus pipeline): lowercase, strip control chars, collapse
    whitespace runs, trim. One chained codegen'd projection — patterns
    are Java-regex/RE2-identical (no lookaround). Output
    (doc_id, norm_text, changed)."""
    norm = F.lower(F.col("text"))
    norm = F.regexp_replace(norm, "[\\x00-\\x1f]", " ")
    norm = F.regexp_replace(norm, "  +", " ")
    norm = F.trim(norm)
    return documents.select(
        "doc_id",
        norm.alias("norm_text"),
        (norm != F.col("text")).alias("changed"),
    )


def normalize_text_sql() -> str:
    norm = "lower(text)"
    norm = f"regexp_replace({norm}, '[\\x00-\\x1f]', ' ', 'g')"
    norm = f"regexp_replace({norm}, '  +', ' ', 'g')"
    norm = f"trim({norm})"
    return f"""
SELECT doc_id, {norm} AS norm_text, {norm} <> text AS changed
FROM documents"""


# ------------------------------------------------------- char entropy


def char_entropy(documents: DataFrame) -> DataFrame:
    """Character-distribution Shannon entropy per doc in integer
    micro-nats — the classic low-quality-text signal (binary blobs and
    repeated-char runs score near 0; natural text clusters tightly).
    Output (doc_id, n_chars_counted, entropy_micro) with
    entropy_micro = floor(ln(n)·1e6) − (Σ cᵢ·floor(ln(cᵢ)·1e6)) div n,
    the floor-quantized form of H = ln n − (1/n)Σ cᵢ ln cᵢ.

    Same determinism discipline as ``lm_score``: ln is quantized to
    integer micro-nats per HISTOGRAM ROW (input is the exact integer
    count, so both engines floor the same double), and everything
    after is associative integer arithmetic — shuffle-order-free. The
    char histogram is a map-side-combinable (doc, char) groupBy whose
    output is bounded by |alphabet| per doc, not |text|."""
    chars = (
        documents.select(
            "doc_id", F.explode(F.split(F.lower("text"), "")).alias("ch")
        )
        .filter(F.col("ch") != "")
    )
    hist = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    return (
        hist.select(
            "doc_id",
            "c",
            (F.col("c") * F.floor(F.log(F.col("c").cast("double")) * LM_MICRO)
             .cast("long")).alias("clnc"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_chars_counted"),
            F.sum("clnc").alias("s"),
        )
        .select(
            "doc_id",
            "n_chars_counted",
            (
                F.floor(F.log(F.col("n_chars_counted").cast("double")) * LM_MICRO)
                .cast("long")
                - F.expr("s div n_chars_counted")
            ).cast("long").alias("entropy_micro"),
        )
    )


def char_entropy_sql() -> str:
    return f"""
WITH chars AS (
  SELECT doc_id, ch FROM (
    SELECT doc_id, unnest(string_split(lower(text), '')) AS ch FROM documents
  ) WHERE ch <> ''
),
hist AS (SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY doc_id, ch),
perdoc AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_chars_counted,
         CAST(SUM(c * CAST(FLOOR(ln(CAST(c AS DOUBLE)) * {LM_MICRO}) AS BIGINT))
              AS BIGINT) AS s
  FROM hist GROUP BY doc_id
)
SELECT doc_id, n_chars_counted,
       CAST(CAST(FLOOR(ln(CAST(n_chars_counted AS DOUBLE)) * {LM_MICRO})
                 AS BIGINT)
            - s // n_chars_counted AS BIGINT) AS entropy_micro
FROM perdoc"""


# ---------------------------------------------------- bigram LM score


def bigram_lm_score(documents: DataFrame) -> DataFrame:
    """Corpus-bigram conditional-logprob score per doc — one LM order
    above ``lm_score``: Σ over consecutive token pairs of
    ln P(w₂|w₁) with P = c(w₁w₂) / c(w₁·), where c(w₁·) counts w₁ as a
    bigram head (so the distribution is properly normalized). Fluent
    token order scores high even when every unigram is common — the
    signal the unigram proxy cannot see. Output (doc_id, n_bigrams,
    sum_logprob_micro).

    Same determinism contract as ``lm_score``: the logprob is
    floor-quantized to integer micro-nats once per DISTINCT BIGRAM
    (both counts are exact integers, so both engines floor the same
    double), then per-doc sums are associative integer arithmetic.
    The bigram and head tables are vocabulary²-bounded aggregations on
    uniform keys; the per-doc pass is one equi-join, no fan-out."""
    from ontology_loader_spark.operators.dedup import doc_shingles

    bg = doc_shingles(documents, n=2)
    pair_counts = bg.groupBy("shingle").agg(F.count("*").alias("cp"))
    head_counts = (
        pair_counts.withColumn("head", F.split(F.col("shingle"), " ")[0])
        .groupBy("head")
        .agg(F.sum("cp").alias("ch"))
    )
    lp = (
        pair_counts.withColumn("head", F.split(F.col("shingle"), " ")[0])
        .join(head_counts, "head")
        .select(
            "shingle",
            F.floor(
                F.log(F.col("cp").cast("double") / F.col("ch").cast("double"))
                * LM_MICRO
            ).cast("long").alias("lp_micro"),
        )
    )
    return (
        bg.join(lp.hint("shuffle_hash"), "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("lp_micro").alias("sum_logprob_micro"),
        )
    )


def bigram_lm_score_sql() -> str:
    return f"""
WITH bg AS (
  SELECT doc_id, array_to_string(ts[pos:pos + 1], ' ') AS shingle
  FROM (
    SELECT doc_id, ts, unnest(range(1, len(ts))) AS pos
    FROM (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), t -> t <> '') AS ts
      FROM documents
    ) WHERE len(ts) >= 2
  )
),
pair_counts AS (SELECT shingle, COUNT(*) AS cp FROM bg GROUP BY shingle),
head_counts AS (
  SELECT string_split(shingle, ' ')[1] AS head, SUM(cp) AS ch
  FROM pair_counts GROUP BY 1
),
lp AS (
  SELECT p.shingle,
    CAST(FLOOR(ln(CAST(p.cp AS DOUBLE) / CAST(h.ch AS DOUBLE)) * {1_000_000})
         AS BIGINT) AS lp_micro
  FROM pair_counts p
  JOIN head_counts h ON h.head = string_split(p.shingle, ' ')[1]
)
SELECT b.doc_id AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(l.lp_micro) AS BIGINT) AS sum_logprob_micro
FROM bg b JOIN lp l ON l.shingle = b.shingle
GROUP BY b.doc_id"""


# ---------------------------------------------- percentile normalize


def quality_percentile(documents: DataFrame) -> DataFrame:
    """Corpus-wide percentile normalization of a quality measure
    (token count here): each doc gets cdf_ppm = P(value ≤ v)·1e6 — the
    engine-exact form of ``percent_rank`` a pipeline uses to set
    corpus-relative quality cutoffs ("drop the bottom 5%").

    ``percent_rank() OVER (ORDER BY v)`` serializes the corpus through
    one task (global-order window). The histogram-CDF form never
    does: one map-side-combinable value histogram, a running sum over
    DISTINCT values (bounded by the value range, not the corpus), and
    a broadcast join back onto the docs. Integer cross-multiplication
    throughout — bit-identical across engines."""
    from pyspark.sql import Window

    ntok = documents.select(
        "doc_id",
        F.size(F.filter(F.split(F.lower("text"), " "), lambda t: t != ""))
        .cast("long")
        .alias("v"),
    )
    hist = ntok.groupBy("v").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy().orderBy("v")
    cum = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy())
    )
    return ntok.join(F.broadcast(cum.select("v", "cum", "n")), "v").select(
        "doc_id",
        F.col("v").alias("n_tokens"),
        F.expr(f"(cum * {LM_MICRO}) div n").cast("long").alias("cdf_ppm"),
    )


def quality_percentile_sql() -> str:
    return f"""
WITH ntok AS (
  SELECT doc_id,
    CAST(length(list_filter(string_split(lower(text), ' '), t -> t <> ''))
         AS BIGINT) AS v
  FROM documents
),
hist AS (SELECT v, COUNT(*) AS cnt FROM ntok GROUP BY v),
cum AS (
  SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum, SUM(cnt) OVER () AS n
  FROM hist
)
SELECT t.doc_id AS doc_id, t.v AS n_tokens,
       CAST((c.cum * {LM_MICRO}) // c.n AS BIGINT) AS cdf_ppm
FROM ntok t JOIN cum c ON c.v = t.v"""
