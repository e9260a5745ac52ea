"""KMV (k-minimum-values) distinct-count sketch — the mergeable
cardinality estimator pattern (Bar-Yossef et al.), chosen over HLL
here because md5-based KMV is fully DETERMINISTIC: the same input
yields the same estimate on any engine, partitioning, or merge order,
so the driver gate can value-hash it (Spark's approx_count_distinct
is HLL++ with engine-internal hashing — correct but not
cross-engine reproducible).

How it scales: per group keep only the k smallest 48-bit hash values
of the distinct items; the k-th smallest value h_k estimates the
distinct count as ``(k-1) * SPACE / h_k``. The per-group state is k
longs — mergeable by union+re-top-k, so partial aggregation works and
group state never grows with cardinality. Implemented as distinct →
per-group rank window → max over the kept prefix; at production
scale the window is a per-group top-k (map-side combinable via
``Window`` + AQE, or the two-phase salted shape for hot groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KMV_K = 64
#: 48-bit hash space: 12 hex digits — exact in BIGINT and DOUBLE
HASH_SPACE = 16 ** 12


def _h48(col):
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def _h48_sql(expr: str) -> str:
    # DuckDB: parse 12 hex chars positionally (no conv(); exact BIGINT)
    v = "0"
    for i in range(1, 13):
        digit = f"(instr('0123456789abcdef', substr(md5({expr}), {i}, 1)) - 1)"
        v = f"(({v}) * 16 + {digit})"
    return f"CAST({v} AS BIGINT)"


def kmv_distinct_tokens(transcripts: DataFrame, k: int = KMV_K) -> DataFrame:
    """Per-role distinct-token cardinality estimate. Output
    (role, n_kept, h_k, estimate_distinct) — all deterministic."""
    toks = (
        transcripts.select(
            "role", F.explode(F.split(F.lower("text"), " ")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .select("role", "tok")
        .distinct()
        .withColumn("h", _h48(F.col("tok")))
    )
    w = Window.partitionBy("role").orderBy("h", "tok")
    kept = toks.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )
    return kept.groupBy("role").agg(
        F.count("*").cast("int").alias("n_kept"),
        F.max("h").alias("h_k"),
        F.when(
            F.count("*") < k, F.count("*").cast("double")
        )
        .otherwise((F.lit(float(k - 1)) * HASH_SPACE) / F.max("h"))
        .alias("estimate_distinct"),
    )


def kmv_distinct_tokens_sql(k: int = KMV_K, extra_ctes: tuple[str, ...] = ()) -> str:
    h = _h48_sql("tok")
    head = ",".join(c.strip() for c in extra_ctes)
    head = head + "," if head else ""
    return f"""
WITH {head}toks AS (
  SELECT DISTINCT role, tok FROM (
    SELECT role, unnest(string_split(lower(text), ' ')) AS tok
    FROM transcripts
  ) WHERE tok <> ''
),
hashed AS (SELECT role, tok, {h} AS h FROM toks),
kept AS (
  SELECT role, h FROM (
    SELECT role, h, ROW_NUMBER() OVER (PARTITION BY role ORDER BY h, tok) AS rnk
    FROM hashed
  ) WHERE rnk <= {k}
)
SELECT role, CAST(COUNT(*) AS INTEGER) AS n_kept, MAX(h) AS h_k,
  CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
       ELSE (CAST({k - 1} AS DOUBLE) * {16 ** 12}) / MAX(h) END
  AS estimate_distinct
FROM kept GROUP BY role"""


# -------------------------------------------- KMV set-overlap algebra

def source_token_overlap(documents: DataFrame, k: int = KMV_K) -> DataFrame:
    """Pairwise vocabulary overlap between sources from KMV sketches —
    the mergeable-sketch set algebra (union = re-top-k of merged
    hashes; intersection via membership in the union's bottom-k) that
    lets a pipeline compare every domain pair WITHOUT a vocab×vocab
    join. Output (source_a, source_b, k_used, n_both, jaccard_ppm)
    with jaccard_ppm = n_both·1e6 div k_used — the standard KMV
    Jaccard estimator as an exact integer ratio (deterministic md5
    hashes → value-hashable, unlike HLL intersections).

    Scale split: sketch construction touches the corpus once (distinct
    (source, token) + per-source bottom-k — the same shape as
    ``kmv_distinct_tokens``); everything pairwise operates on
    |sources|·k rows, so the O(|sources|²) pair stage is sketch-sized,
    never corpus-sized."""
    toks = (
        documents.select(
            "source", F.explode(F.split(F.lower("text"), " ")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .select("source", "tok")
        .distinct()
        .withColumn("h", _h48(F.col("tok")))
        .select("source", "h")
        .distinct()
    )
    w = Window.partitionBy("source").orderBy("h")
    sk = (
        toks.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("source", "h")
        .localCheckpoint(eager=True)
    )
    srcs = sk.select("source").distinct()
    pairs = (
        srcs.select(F.col("source").alias("source_a"))
        .join(srcs.select(F.col("source").alias("source_b")))
        .filter(F.col("source_a") < F.col("source_b"))
    )
    rows_a = pairs.join(
        sk.withColumnRenamed("source", "source_a"), "source_a"
    ).select("source_a", "source_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    rows_b = pairs.join(
        sk.withColumnRenamed("source", "source_b"), "source_b"
    ).select("source_a", "source_b", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    merged = (
        rows_a.unionByName(rows_b)
        .groupBy("source_a", "source_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wu = Window.partitionBy("source_a", "source_b").orderBy("h")
    x = merged.withColumn("rnk", F.row_number().over(wu)).filter(F.col("rnk") <= k)
    return x.groupBy("source_a", "source_b").agg(
        F.count("*").cast("long").alias("k_used"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_both"),
        F.expr(f"(sum(in_a * in_b) * {10**6}) div count(*)")
        .cast("long")
        .alias("jaccard_ppm"),
    )


def source_token_overlap_sql(k: int = KMV_K) -> str:
    h = _h48_sql("tok")
    return f"""
WITH toks AS (
  SELECT DISTINCT source, tok FROM (
    SELECT source, unnest(string_split(lower(text), ' ')) AS tok
    FROM documents
  ) WHERE tok <> ''
),
hashed AS (SELECT DISTINCT source, {h} AS h FROM toks),
sk AS (
  SELECT source, h FROM (
    SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rnk
    FROM hashed
  ) WHERE rnk <= {k}
),
srcs AS (SELECT DISTINCT source FROM sk),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b
  FROM srcs a JOIN srcs b ON a.source < b.source
),
merged AS (
  SELECT source_a, source_b, h, MAX(in_a) AS in_a, MAX(in_b) AS in_b
  FROM (
    SELECT p.source_a, p.source_b, s.h, 1 AS in_a, 0 AS in_b
    FROM pairs p JOIN sk s ON s.source = p.source_a
    UNION ALL
    SELECT p.source_a, p.source_b, s.h, 0 AS in_a, 1 AS in_b
    FROM pairs p JOIN sk s ON s.source = p.source_b
  ) GROUP BY source_a, source_b, h
),
x AS (
  SELECT * FROM (
    SELECT source_a, source_b, in_a, in_b,
           ROW_NUMBER() OVER (PARTITION BY source_a, source_b ORDER BY h) AS rnk
    FROM merged
  ) WHERE rnk <= {k}
)
SELECT source_a, source_b,
       CAST(COUNT(*) AS BIGINT) AS k_used,
       CAST(SUM(in_a * in_b) AS BIGINT) AS n_both,
       CAST((SUM(in_a * in_b) * {10**6}) // COUNT(*) AS BIGINT) AS jaccard_ppm
FROM x GROUP BY source_a, source_b"""
