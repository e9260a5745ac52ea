"""Key-skew profiling — the diagnostic that justifies every salting /
broadcast decision this engine makes.

The north rule calls for "partitioning / shuffle / skew handled
explicitly": the mention-linking stage salts hot entity keys
(``transcripts/linking.py``), ``embedding_near_dups`` salt-splits hot
LSH buckets, and ``relations_agg`` ships a salted two-phase variant.
Each of those needs a *measured* answer to "which keys are hot and by
how much" before the technique is worth its extra shuffle. This
operator computes that answer as a tiny, exact, deterministic profile:

    (key, n_rows, rank, share_ppm, x_mean_ppm)

- ``share_ppm``   — exact integer parts-per-million of total rows.
- ``x_mean_ppm``  — the key's load as a multiple of the *mean* key
  load, in ppm (1_000_000 = exactly average). A key at 50_000_000
  (50x mean) is the one that stalls the straggler task and wants a
  salt; keys near 1x mean are safe to hash-partition raw.

Scale: one map-side-combined ``groupBy(key).count()`` over the input
(the only full shuffle), then a ``TakeOrderedAndProject`` top-k — no
global sort, no corpus-wide window. The totals frame is a 1-row
aggregate cross-joined back (broadcast); the rank window runs over the
top-k rows only (bounded, <= ``top_k``). All arithmetic is integral
(``div``), so the profile is bit-identical across parallelism levels
and engines.

Reference analog: none — the reference loads one ontology single-node
and never needs skew handling; this is part of the engine's
100 TB scale surface (SURVEY.md section 2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PPM = 1_000_000


def key_skew_profile(df: DataFrame, key: str, top_k: int = 20) -> DataFrame:
    """Exact top-``top_k`` hottest values of ``df[key]`` with integer
    share and hot-multiple statistics.

    NULL keys are kept (profiled as the string 'NULL') — at corpus
    scale a null-heavy key column is itself a classic skew source
    (every NULL lands in one hash partition under some join plans).

    Ties break on the key string ascending, so the profile is
    deterministic for the gate harness.
    """
    keyed = df.select(
        F.coalesce(F.col(key).cast("string"), F.lit("NULL")).alias("key")
    )
    counts = keyed.groupBy("key").agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    top = counts.orderBy(F.col("n_rows").desc(), F.col("key").asc()).limit(top_k)
    # rank over the bounded top-k set only (never corpus rows)
    w = Window.orderBy(F.col("n_rows").desc(), F.col("key").asc())
    return (
        top.crossJoin(F.broadcast(totals))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .select(
            "key",
            "n_rows",
            "rank",
            F.expr(f"(n_rows * {PPM}) div total").cast("long").alias("share_ppm"),
            F.expr(f"(n_rows * n_keys * {PPM}) div total")
            .cast("long")
            .alias("x_mean_ppm"),
        )
    )


def key_skew_profile_sql(table: str, key: str, top_k: int = 20) -> str:
    """The DuckDB oracle twin of :func:`key_skew_profile` — independent
    SQL re-statement, same exact-integer arithmetic (``//``)."""
    return f"""
WITH counts AS (
  SELECT COALESCE(CAST({key} AS VARCHAR), 'NULL') AS key,
         COUNT(*) AS n_rows
  FROM {table} GROUP BY 1
),
tot AS (
  SELECT SUM(n_rows) AS total, COUNT(*) AS n_keys FROM counts
),
top AS (
  SELECT key, n_rows,
         CAST(ROW_NUMBER() OVER (ORDER BY n_rows DESC, key) AS INTEGER) AS rank
  FROM counts ORDER BY n_rows DESC, key LIMIT {top_k}
)
SELECT t.key AS key, t.n_rows AS n_rows, t.rank AS rank,
       CAST((t.n_rows * {PPM}) // x.total AS BIGINT) AS share_ppm,
       CAST((t.n_rows * x.n_keys * {PPM}) // x.total AS BIGINT) AS x_mean_ppm
FROM top t CROSS JOIN tot x
"""
