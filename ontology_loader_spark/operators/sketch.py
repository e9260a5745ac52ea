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
