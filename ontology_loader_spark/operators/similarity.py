"""Similarity search over embedding columns (``array<float>``).

Scores are computed on integer-quantized vectors (floor(x·10⁴)) so the
dot products are exact integers and the final cosine (integer dot /
sqrt of integer norm product, all in IEEE double with correctly-rounded
sqrt) is bit-identical between Spark and the DuckDB oracle — no
float-accumulation-order hazards.

Scale design:

- brute-force top-k: broadcast the (small) query set against the
  vector corpus — a map-side scored scan + per-query top-k window.
  At 100 TB the corpus side stays partition-parallel; only the query
  set broadcasts.
- LSH-bucketed variant: deterministic sign buckets on leading
  dimensions prune the corpus per query to one bucket — the scale
  path (bucket count tunable; per-bucket skew handled by AQE or
  bucket-splitting salts).
- near-dup pairs: all-pairs only within buckets in the scale path;
  the exposed oracle query keeps the exact threshold semantics.

The expressions use only built-in higher-order functions
(``zip_with`` / ``aggregate``) — whole-stage-codegen'd, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

QUANT = 10000
LSH_DIMS = 4


def _qdot(a: Column, b: Column) -> Column:
    """Exact integer dot product of floor-quantized vectors."""
    prods = F.zip_with(
        a,
        b,
        lambda x, y: F.floor(x.cast("double") * QUANT).cast("long")
        * F.floor(y.cast("double") * QUANT).cast("long"),
    )
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, v: acc + v)


def _qdot_sql(a: str, b: str) -> str:
    return (
        f"CAST(list_sum(list_transform(list_zip({a}, {b}), "
        f"x -> CAST(FLOOR(CAST(x[1] AS DOUBLE) * {QUANT}) AS BIGINT) "
        f"* CAST(FLOOR(CAST(x[2] AS DOUBLE) * {QUANT}) AS BIGINT))) AS BIGINT)"
    )


def _cos(dot: Column, na2: Column, nb2: Column) -> Column:
    return dot.cast("double") / F.sqrt(na2.cast("double") * nb2.cast("double"))


def with_norm2(embeddings: DataFrame) -> DataFrame:
    return embeddings.withColumn("norm2", _qdot(F.col("embedding"), F.col("embedding")))


NORM2_CTE = f"""
vecs AS (
  SELECT vec_id, embedding, {_qdot_sql('embedding', 'embedding')} AS norm2
  FROM embeddings
)"""

# Query subset: every 100th vector (deterministic, scales with sf).
QUERY_PRED = "vec_id % 100 = 0"


def brute_force_topk(embeddings: DataFrame, k: int = 5) -> DataFrame:
    """Exact cosine top-k per query vector. Output: (query_id,
    neighbor_id, rank, cos_sim)."""
    vecs = with_norm2(embeddings).select("vec_id", "embedding", "norm2")
    queries = vecs.filter(F.expr(QUERY_PRED)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm2").alias("q_norm2"),
    )
    scored = (
        vecs.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .withColumn("dot", _qdot(F.col("q_emb"), F.col("embedding")))
        .withColumn("cos_sim", _cos(F.col("dot"), F.col("q_norm2"), F.col("norm2")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank", "cos_sim")
    )


def brute_force_topk_sql(k: int = 5) -> str:
    dot = _qdot_sql("q.embedding", "v.embedding")
    return f"""
WITH {NORM2_CTE.strip()},
queries AS (SELECT * FROM vecs WHERE {QUERY_PRED}),
scored AS (
  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
    CAST({dot} AS DOUBLE)
      / sqrt(CAST(q.norm2 AS DOUBLE) * CAST(v.norm2 AS DOUBLE)) AS cos_sim
  FROM queries q JOIN vecs v ON v.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, rank, cos_sim FROM (
  SELECT query_id, neighbor_id, cos_sim,
    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {k}"""


def lsh_bucket(col: Column) -> Column:
    """Deterministic sign-LSH bucket over the first LSH_DIMS dims."""
    b = F.lit(0)
    for d in range(LSH_DIMS):
        b = b + F.when(F.element_at(col, d + 1) >= 0, F.lit(2 ** d)).otherwise(F.lit(0))
    return b.cast("int")


def lsh_bucket_sql(col: str) -> str:
    parts = " + ".join(
        f"(CASE WHEN {col}[{d + 1}] >= 0 THEN {2 ** d} ELSE 0 END)"
        for d in range(LSH_DIMS)
    )
    return f"CAST({parts} AS INTEGER)"


def lsh_buckets(embeddings: DataFrame) -> DataFrame:
    return embeddings.select(
        "vec_id", lsh_bucket(F.col("embedding")).alias("bucket")
    )


def lsh_buckets_sql() -> str:
    return (
        f"SELECT vec_id, {lsh_bucket_sql('embedding')} AS bucket FROM embeddings"
    )


def lsh_topk(embeddings: DataFrame, k: int = 3) -> DataFrame:
    """ANN variant: cosine top-k per query restricted to the query's
    LSH bucket — the 100 TB path (bucket join instead of broadcast
    cross-score)."""
    vecs = with_norm2(embeddings).withColumn(
        "bucket", lsh_bucket(F.col("embedding"))
    )
    queries = vecs.filter(F.expr(QUERY_PRED)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm2").alias("q_norm2"),
        F.col("bucket"),
    )
    scored = (
        vecs.join(F.broadcast(queries), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("dot", _qdot(F.col("q_emb"), F.col("embedding")))
        .withColumn("cos_sim", _cos(F.col("dot"), F.col("q_norm2"), F.col("norm2")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank", "cos_sim")
    )


def lsh_topk_sql(k: int = 3) -> str:
    dot = _qdot_sql("q.embedding", "v.embedding")
    bucket = lsh_bucket_sql("embedding")
    return f"""
WITH {NORM2_CTE.strip()},
bucketed AS (SELECT vec_id, embedding, norm2, {bucket} AS bucket FROM vecs),
queries AS (SELECT * FROM bucketed WHERE {QUERY_PRED}),
scored AS (
  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
    CAST({dot} AS DOUBLE)
      / sqrt(CAST(q.norm2 AS DOUBLE) * CAST(v.norm2 AS DOUBLE)) AS cos_sim
  FROM queries q JOIN bucketed v
    ON v.bucket = q.bucket AND v.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, rank, cos_sim FROM (
  SELECT query_id, neighbor_id, cos_sim,
    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {k}"""


IVF_CELLS = 8
IVF_CENTROID_PRED = f"vec_id < {IVF_CELLS}"  # deterministic coarse centroids


def ivf_assign(embeddings: DataFrame) -> DataFrame:
    """IVF coarse quantization: assign every vector to the nearest of
    C deterministic centroids (the first C vectors by id — a stand-in
    for trained k-means centroids; the assignment/search plumbing is
    identical). Nearness = max quantized cosine, ties by centroid id.
    Pure joins + window, no UDF."""
    vecs = with_norm2(embeddings).select("vec_id", "embedding", "norm2")
    cents = vecs.filter(F.expr(IVF_CENTROID_PRED)).select(
        F.col("vec_id").alias("cell"),
        F.col("embedding").alias("c_emb"),
        F.col("norm2").alias("c_norm2"),
    )
    scored = vecs.join(F.broadcast(cents)).withColumn(
        "c_cos",
        _cos(_qdot(F.col("embedding"), F.col("c_emb")),
             F.col("norm2"), F.col("c_norm2")),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("c_cos").desc(),
                                             F.col("cell").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("vec_id", "cell")
    )


def ivf_assign_sql() -> str:
    dot = _qdot_sql("v.embedding", "c.embedding")
    return f"""
WITH {NORM2_CTE.strip()},
cents AS (SELECT vec_id AS cell, embedding, norm2 FROM vecs
          WHERE {IVF_CENTROID_PRED}),
scored AS (
  SELECT v.vec_id, c.cell,
    CAST({dot} AS DOUBLE)
      / sqrt(CAST(v.norm2 AS DOUBLE) * CAST(c.norm2 AS DOUBLE)) AS c_cos
  FROM vecs v CROSS JOIN cents c
)
SELECT vec_id, cell FROM (
  SELECT vec_id, cell,
    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, cell) AS rnk
  FROM scored
) WHERE rnk = 1"""


def ivf_topk(embeddings: DataFrame, k: int = 3) -> DataFrame:
    """IVF-flat ANN: per query, exact search restricted to the query's
    cell — at corpus scale the cell join replaces the broadcast
    cross-score; per-cell skew is AQE's skew-join case or a cell-split
    salt."""
    vecs = with_norm2(embeddings).select("vec_id", "embedding", "norm2")
    assign = ivf_assign(embeddings)
    vc = vecs.join(assign, "vec_id")
    queries = vc.filter(F.expr(QUERY_PRED)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm2").alias("q_norm2"),
        F.col("cell"),
    )
    scored = (
        vc.join(F.broadcast(queries), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("dot", _qdot(F.col("q_emb"), F.col("embedding")))
        .withColumn("cos_sim", _cos(F.col("dot"), F.col("q_norm2"), F.col("norm2")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(),
                                               F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank", "cos_sim")
    )


def ivf_topk_sql(k: int = 3) -> str:
    dot_c = _qdot_sql("v.embedding", "c.embedding")
    dot_q = _qdot_sql("q.embedding", "v.embedding")
    return f"""
WITH {NORM2_CTE.strip()},
cents AS (SELECT vec_id AS cell, embedding, norm2 FROM vecs
          WHERE {IVF_CENTROID_PRED}),
cscored AS (
  SELECT v.vec_id, c.cell,
    CAST({dot_c} AS DOUBLE)
      / sqrt(CAST(v.norm2 AS DOUBLE) * CAST(c.norm2 AS DOUBLE)) AS c_cos
  FROM vecs v CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, cell) AS rnk
    FROM cscored
  ) WHERE rnk = 1
),
vc AS (SELECT v.*, a.cell FROM vecs v JOIN assign a USING (vec_id)),
queries AS (SELECT * FROM vc WHERE {QUERY_PRED}),
scored AS (
  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
    CAST({dot_q} AS DOUBLE)
      / sqrt(CAST(q.norm2 AS DOUBLE) * CAST(v.norm2 AS DOUBLE)) AS cos_sim
  FROM queries q JOIN vc v ON v.cell = q.cell AND v.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, rank, cos_sim FROM (
  SELECT query_id, neighbor_id, cos_sim,
    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {k}"""


def embedding_near_dups(embeddings: DataFrame, threshold: float = 0.35) -> DataFrame:
    """Near-duplicate pairs (a < b) with cosine ≥ threshold, searched
    within LSH buckets (exact within-bucket; the bucket restriction is
    the recall/scale trade the LSH family makes)."""
    vecs = with_norm2(embeddings).withColumn("bucket", lsh_bucket(F.col("embedding")))
    left = vecs.select(
        "bucket",
        F.col("vec_id").alias("a"),
        F.col("embedding").alias("ea"),
        F.col("norm2").alias("na2"),
    )
    right = vecs.select(
        "bucket",
        F.col("vec_id").alias("b"),
        F.col("embedding").alias("eb"),
        F.col("norm2").alias("nb2"),
    )
    return (
        left.join(right, "bucket")
        .filter(F.col("a") < F.col("b"))
        .withColumn("dot", _qdot(F.col("ea"), F.col("eb")))
        .withColumn("cos_sim", _cos(F.col("dot"), F.col("na2"), F.col("nb2")))
        .filter(F.col("cos_sim") >= threshold)
        .select("a", "b", "cos_sim")
    )


def embedding_near_dups_sql(threshold: float = 0.35) -> str:
    dot = _qdot_sql("l.embedding", "r.embedding")
    bucket = lsh_bucket_sql("embedding")
    return f"""
WITH {NORM2_CTE.strip()},
bucketed AS (SELECT vec_id, embedding, norm2, {bucket} AS bucket FROM vecs)
SELECT a, b, cos_sim FROM (
  SELECT l.vec_id AS a, r.vec_id AS b,
    CAST({dot} AS DOUBLE)
      / sqrt(CAST(l.norm2 AS DOUBLE) * CAST(r.norm2 AS DOUBLE)) AS cos_sim
  FROM bucketed l JOIN bucketed r
    ON l.bucket = r.bucket AND l.vec_id < r.vec_id
) WHERE cos_sim >= {threshold}"""
