"""Graph-centrality materialization over the ontology hierarchy —
an exact-integer PageRank whose every iteration is reproducible
bit-for-bit by an unrolled SQL oracle.

A KG pipeline uses centrality to rank terms for linking priors and
dictionary pruning (hub terms like upper-ontology roots dominate both
closure and mention traffic — the same hubs the salted aggregations
exist for). The reference has no such operator; this is a §2.3-style
addition (SURVEY.md), built Spark-first.

Determinism design (the same discipline as the IVF trainer,
``similarity.py``): a float PageRank sums double contributions whose
accumulation order differs between engines and runs. Here every
quantity is a non-negative integer:

- ranks are scaled to ``SCALE`` (1e12) integer units;
- per-edge contribution = ``rank div outdegree`` (integral division —
  identical truncation in Spark ``div`` and DuckDB ``//`` for
  non-negative operands);
- damping = ``(sum * 85) div 100`` (no float multiply; products stay
  far under int64);
- the teleport base = ``(SCALE * 15) div (100 * n)``.

Integer sums are associative, so map-side combine / shuffle order
cannot change results, and a fixed iteration count unrolls into
chained SQL CTEs. Dangling mass (nodes without out-edges) is dropped
— the standard simplified variant; with damping the totals stay
bounded. Each iteration is one join + one map-side-combinable groupBy
keyed on the destination node; hub skew on destinations is additive
(a sum), the AQE-friendly case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ontology_loader_spark.schemas import DEFAULT_PREDICATES

SCALE = 10 ** 12
DAMP_NUM = 85   # d = 0.85 as an exact rational
DAMP_DEN = 100
PR_ITERS = 3


def pagerank(
    edges: DataFrame,
    iters: int = PR_ITERS,
    predicates: tuple[str, ...] = DEFAULT_PREDICATES,
) -> DataFrame:
    """Exact-integer PageRank over the predicate-filtered hierarchy
    edge graph. Node domain = every edge endpoint. Output
    (node, rank) with rank in SCALE-units; ranks at iteration
    ``iters`` equal the unrolled SQL oracle value-for-value."""
    e = (
        edges.filter(F.col("predicate").isin(*predicates))
        .select("subject", "object")
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("subject").alias("node"))
        .unionByName(e.select(F.col("object").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    base = (SCALE * (DAMP_DEN - DAMP_NUM)) // (DAMP_DEN * n)
    deg = e.groupBy("subject").agg(F.count("*").alias("deg"))

    ranks = nodes.select("node", F.lit(SCALE // n).cast("long").alias("rank"))
    for _ in range(iters):
        contribs = (
            e.join(ranks.withColumnRenamed("node", "subject"), "subject")
            .join(F.broadcast(deg), "subject")
            .select(
                F.col("object").alias("node"),
                F.expr("rank div deg").cast("long").alias("c"),
            )
        )
        summed = contribs.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(summed, "node", "left")
            .na.fill({"s": 0})
            .select(
                "node",
                (F.lit(base) + F.expr(f"(s * {DAMP_NUM}) div {DAMP_DEN}"))
                .cast("long")
                .alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def pagerank_sql(iters: int = PR_ITERS) -> str:
    """Unrolled-iteration oracle over the shared ``hedges`` CTE
    (fixed iteration count — no recursion needed; every arithmetic
    step is the integral-division twin of the Spark expression)."""
    from ontology_loader_spark.inputs.derive import TERM_DICT_CTE, EDGES_CTE
    from ontology_loader_spark.oracle import HEDGES_CTE

    ctes = [
        TERM_DICT_CTE.strip(),
        EDGES_CTE.strip(),
        HEDGES_CTE.strip(),
        """pr_nodes AS (
  SELECT subject AS node FROM hedges
  UNION
  SELECT object AS node FROM hedges
)""",
        "pr_params AS (SELECT COUNT(*) AS n FROM pr_nodes)",
        "pr_deg AS (SELECT subject, COUNT(*) AS deg FROM hedges GROUP BY subject)",
        f"""pr_r0 AS (
  SELECT node, CAST({SCALE} // n AS BIGINT) AS rank
  FROM pr_nodes, pr_params
)""",
    ]
    for i in range(iters):
        prev, cur = f"pr_r{i}", f"pr_r{i + 1}"
        ctes.append(f"""
pr_c{i} AS (
  SELECT e.object AS node, SUM(r.rank // d.deg) AS s
  FROM hedges e
  JOIN {prev} r ON r.node = e.subject
  JOIN pr_deg d ON d.subject = e.subject
  GROUP BY e.object
)""")
        ctes.append(f"""
{cur} AS (
  SELECT n.node,
    CAST(({SCALE} * {DAMP_DEN - DAMP_NUM}) // ({DAMP_DEN} * p.n)
         + (COALESCE(c.s, 0) * {DAMP_NUM}) // {DAMP_DEN} AS BIGINT) AS rank
  FROM pr_nodes n
  LEFT JOIN pr_c{i} c ON c.node = n.node
  CROSS JOIN pr_params p
)""")
    return (
        "WITH " + ",\n".join(c.strip() for c in ctes)
        + f"\nSELECT node, rank FROM pr_r{iters}"
    )
