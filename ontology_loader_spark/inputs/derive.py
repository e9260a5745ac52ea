"""Deterministic derivation of the KG input tables from the TPC-H-ish
parquet tables at a scale-factor directory.

Why derive instead of synthesize: the driver's correctness gate runs
each ``queries()`` entry side-by-side with an ANSI-SQL oracle in DuckDB
over the same parquet views. By deriving ``term_dict`` / ``edges`` /
``transcripts`` with transforms expressible identically in the Spark
DataFrame API and in DuckDB SQL (CTE strings below), every KG operator
— CURIE filter, class construction, recursive closure, reconciliation,
mention linking, union-find — gets a full value-level oracle, not just
a row-count check.

The derived shapes mirror FIXTURES.md:

- ``term_dict(id, name, definition, alternative_names, is_obsolete,
  replaced_by)`` from ``part`` — ids are CURIEs ``FIX:<k>`` with
  injected foreign-prefix (``OTHER:``), mixed-case (``Fix:``), and
  colon-less (``FIXNOCOLON``) rows pinning the reference's
  ``_matches_ontology`` cases (``tests/test_ontology_processor.py:8-28``).
- ``edges(subject, predicate, object)`` from ``part`` — a binary-tree
  DAG (child k → parent floor(k/2)) with extra multi-parent edges
  (k → floor(k/3)), ignored predicates (``rdfs:seeAlso``), foreign
  objects (quirk Q2), and obsolete subjects detached. Obsolete terms
  are outside the closure domain entirely (quirk Q6: oaklib
  ``entities()`` defaults ``filter_obsoletes=True``) but can still be
  edge OBJECTS (floor(k/2) may hit an obsolete key), which keeps the
  M1 obsolete-relation purge exercised.
- ``transcripts(conv_id, turn_idx, role, text, tool, ts)`` from
  ``lineitem ⋈ part`` — text embeds the term surface form of the
  line's part, so mention detection has known ground truth.

Every modulus below is a named constant so the Spark and SQL sides
cannot drift independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ONT = "fix"

# id-shape moduli (term_dict)
MOD_NOCOLON = (89, 3)   # k % 89 == 3 -> 'FIXNOCOLON<k>' (no colon: F1 reject)
MOD_FOREIGN = (97, 5)   # k % 97 == 5 -> 'OTHER:<k>'     (foreign prefix: F1 reject)
MOD_MIXED = (83, 7)     # k % 83 == 7 -> 'Fix:<k>'       (mixed case: F1 accept)
MOD_EMPTY_DEF = 7       # k % 7 == 0  -> definition ''
MOD_ALIAS = 3           # k % 3 == 0  -> one alias (p_brand)
MOD_OBSOLETE = (10, 9)  # k % 10 == 9 -> obsolete, replaced_by FIX:<k+1>

# edge-shape moduli
MOD_SEEALSO = 11        # k % 11 == 0 -> predicate rdfs:seeAlso (ignored)
MOD_PARTOF = 5          # else k % 5 == 0 -> BFO:0000050, else rdfs:subClassOf
MOD_FOREIGN_OBJ = (13, 11)  # k % 13 == 11 -> object OTHER:<floor(k/2)>
MOD_MULTIPARENT = (6, 2)    # k % 6 == 2 and k >= 3 -> extra edge to floor(k/3)

# transcripts / mention dictionary
MOD_HUB_TERM = (50, 1)  # k % 50 == 1 -> term is in the mention dictionary


def _ks(c):
    return c.cast("string")


def _term_id_col(k):
    return (
        F.when(k % MOD_NOCOLON[0] == MOD_NOCOLON[1],
               F.concat(F.lit("FIXNOCOLON"), _ks(k)))
        .when(k % MOD_FOREIGN[0] == MOD_FOREIGN[1],
              F.concat(F.lit("OTHER:"), _ks(k)))
        .when(k % MOD_MIXED[0] == MOD_MIXED[1],
              F.concat(F.lit("Fix:"), _ks(k)))
        .otherwise(F.concat(F.lit("FIX:"), _ks(k)))
    )


TERM_ID_SQL = (
    "CASE WHEN p_partkey % 89 = 3 THEN 'FIXNOCOLON' || CAST(p_partkey AS VARCHAR) "
    "WHEN p_partkey % 97 = 5 THEN 'OTHER:' || CAST(p_partkey AS VARCHAR) "
    "WHEN p_partkey % 83 = 7 THEN 'Fix:' || CAST(p_partkey AS VARCHAR) "
    "ELSE 'FIX:' || CAST(p_partkey AS VARCHAR) END"
)


def read_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/part.parquet")


def read_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def term_dict_from_part(part: DataFrame) -> DataFrame:
    """Mapping half of ``derive_term_dict`` — works on any part-shaped
    DataFrame (driver parquet or the synthesizer's output)."""
    k = F.col("p_partkey")
    obsolete = (k % MOD_OBSOLETE[0]) == MOD_OBSOLETE[1]
    return part.select(
        _term_id_col(k).alias("id"),
        F.concat(F.col("p_name"), F.lit(" "), _ks(k)).alias("name"),
        F.when(k % MOD_EMPTY_DEF == 0, F.lit("")).otherwise(
            F.concat(F.col("p_type"), F.lit(" "), F.col("p_brand"))
        ).alias("definition"),
        F.when(k % MOD_ALIAS == 0, F.array(F.col("p_brand"))).otherwise(
            F.array().cast("array<string>")
        ).alias("alternative_names"),
        obsolete.alias("is_obsolete"),
        F.when(obsolete, F.concat(F.lit("FIX:"), _ks(k + 1))).otherwise(
            F.lit(None).cast("string")
        ).alias("replaced_by"),
        k.alias("k"),
    )


def derive_term_dict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``term_dict`` + helper column ``k`` (the source part key)."""
    return term_dict_from_part(read_part(spark, sf_dir))


TERM_DICT_CTE = f"""
term_dict AS (
  SELECT
    {TERM_ID_SQL} AS id,
    p_name || ' ' || CAST(p_partkey AS VARCHAR) AS name,
    CASE WHEN p_partkey % 7 = 0 THEN ''
         ELSE p_type || ' ' || p_brand END AS definition,
    CASE WHEN p_partkey % 3 = 0 THEN p_brand ELSE '' END AS alt_names_str,
    (p_partkey % 10 = 9) AS is_obsolete,
    CASE WHEN p_partkey % 10 = 9
         THEN 'FIX:' || CAST(p_partkey + 1 AS VARCHAR)
         ELSE NULL END AS replaced_by,
    p_partkey AS k
  FROM part
)"""


def edges_from_part(part: DataFrame) -> DataFrame:
    """Mapping half of ``derive_edges``."""
    k = F.col("p_partkey")
    not_obsolete = (k % MOD_OBSOLETE[0]) != MOD_OBSOLETE[1]
    parent2 = F.floor(k / 2).cast("long")
    parent3 = F.floor(k / 3).cast("long")

    e1 = part.filter((k >= 2) & not_obsolete).select(
        _term_id_col(k).alias("subject"),
        F.when(k % MOD_SEEALSO == 0, F.lit("rdfs:seeAlso"))
        .when(k % MOD_PARTOF == 0, F.lit("BFO:0000050"))
        .otherwise(F.lit("rdfs:subClassOf"))
        .alias("predicate"),
        F.when(
            k % MOD_FOREIGN_OBJ[0] == MOD_FOREIGN_OBJ[1],
            F.concat(F.lit("OTHER:"), _ks(parent2)),
        )
        .otherwise(F.concat(F.lit("FIX:"), _ks(parent2)))
        .alias("object"),
    )
    e2 = part.filter(
        (k >= 3) & (k % MOD_MULTIPARENT[0] == MOD_MULTIPARENT[1]) & not_obsolete
    ).select(
        _term_id_col(k).alias("subject"),
        F.lit("rdfs:subClassOf").alias("predicate"),
        F.concat(F.lit("FIX:"), _ks(parent3)).alias("object"),
    )
    return e1.unionByName(e2)


def derive_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``edges(subject, predicate, object)`` — binary-tree DAG with
    multi-parent extras; obsolete subjects detached."""
    return edges_from_part(read_part(spark, sf_dir))


EDGES_CTE = f"""
edges AS (
  SELECT
    {TERM_ID_SQL} AS subject,
    CASE WHEN p_partkey % 11 = 0 THEN 'rdfs:seeAlso'
         WHEN p_partkey % 5 = 0 THEN 'BFO:0000050'
         ELSE 'rdfs:subClassOf' END AS predicate,
    CASE WHEN p_partkey % 13 = 11
         THEN 'OTHER:' || CAST(CAST(FLOOR(p_partkey / 2) AS BIGINT) AS VARCHAR)
         ELSE 'FIX:' || CAST(CAST(FLOOR(p_partkey / 2) AS BIGINT) AS VARCHAR)
         END AS object
  FROM part WHERE p_partkey >= 2 AND p_partkey % 10 <> 9
  UNION ALL
  SELECT
    {TERM_ID_SQL} AS subject,
    'rdfs:subClassOf' AS predicate,
    'FIX:' || CAST(CAST(FLOOR(p_partkey / 3) AS BIGINT) AS VARCHAR) AS object
  FROM part WHERE p_partkey >= 3 AND p_partkey % 6 = 2 AND p_partkey % 10 <> 9
)"""


def derive_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``transcripts`` from lineitem ⋈ part — one turn per lineitem,
    conversation = order, text embeds the part's term surface form.

    The part side is a broadcast join (small dim vs the lineitem fact
    table — at 100 TB the term dictionary broadcasts the same way).
    """
    li = read_lineitem(spark, sf_dir)
    part = read_part(spark, sf_dir).select(
        F.col("p_partkey"),
        F.concat(F.col("p_name"), F.lit(" "), _ks(F.col("p_partkey"))).alias("surface"),
    )
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"], "inner")
    turn0 = (F.col("l_linenumber") - 1).cast("int")
    role = (
        F.when(turn0 % 3 == 0, F.lit("user"))
        .when(turn0 % 3 == 1, F.lit("assistant"))
        .otherwise(F.lit("tool"))
    )
    return j.select(
        F.concat(F.lit("conv_"), _ks(F.col("l_orderkey"))).alias("conv_id"),
        turn0.alias("turn_idx"),
        role.alias("role"),
        F.concat(
            F.lit("turn "),
            _ks(F.col("l_linenumber")),
            F.lit(": "),
            F.col("surface"),
            F.lit(" "),
            F.col("l_returnflag"),
            F.col("l_linestatus"),
        ).alias("text"),
        F.when(role == "tool", F.concat(F.lit("search_"), _ks(F.col("l_suppkey") % 5)))
        .otherwise(F.lit(None).cast("string"))
        .alias("tool"),
        F.timestamp_add("SECOND", F.col("l_linenumber"), F.col("l_shipdate")).alias("ts"),
    )


TRANSCRIPTS_CTE = """
transcripts AS (
  SELECT
    'conv_' || CAST(l_orderkey AS VARCHAR) AS conv_id,
    CAST(l_linenumber - 1 AS INTEGER) AS turn_idx,
    CASE WHEN (l_linenumber - 1) % 3 = 0 THEN 'user'
         WHEN (l_linenumber - 1) % 3 = 1 THEN 'assistant'
         ELSE 'tool' END AS role,
    'turn ' || CAST(l_linenumber AS VARCHAR) || ': '
      || p_name || ' ' || CAST(l_partkey AS VARCHAR)
      || ' ' || l_returnflag || l_linestatus AS text,
    CASE WHEN (l_linenumber - 1) % 3 = 2
         THEN 'search_' || CAST(l_suppkey % 5 AS VARCHAR)
         ELSE NULL END AS tool,
    l_shipdate + CAST(l_linenumber AS BIGINT) * INTERVAL 1 SECOND AS ts
  FROM lineitem JOIN part ON l_partkey = p_partkey
)"""


def derive_mention_dict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sub-dictionary used for mention detection: hub terms
    (k % 50 == 1) with a proper ``FIX:`` id — small enough to broadcast
    into the detection UDF at any scale factor."""
    td = derive_term_dict(spark, sf_dir)
    return td.filter(
        (F.col("k") % MOD_HUB_TERM[0] == MOD_HUB_TERM[1])
        & F.col("id").startswith("FIX:")
    ).select("id", "name")


MENTION_DICT_CTE = f"""
mention_dict AS (
  SELECT id, name FROM term_dict
  WHERE k % 50 = 1 AND id LIKE 'FIX:%'
)"""


LCA_PAIR_MOD = 7  # k % 7 == 0 -> (FIX:k, FIX:k+1) is an LCA query pair


def derive_lca_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic term-pair sample for the LCA / semantic-similarity
    gate: ``(a, b) = (FIX:k, FIX:k+1)`` for ``k % LCA_PAIR_MOD == 0``
    where BOTH endpoints are plain-``FIX:`` non-obsolete terms (the
    mixed-case / foreign / colon-less id shapes and obsolete rows are
    excluded on either side, symmetrically with the SQL CTE)."""
    td = derive_term_dict(spark, sf_dir)
    ok = td.filter(
        F.col("id").startswith("FIX:") & ~F.col("is_obsolete")
    ).select("id", "k")
    a = ok.filter(F.col("k") % LCA_PAIR_MOD == 0).select(
        F.col("id").alias("a"), F.col("k").alias("ka")
    )
    b = ok.select(F.col("id").alias("b"), (F.col("k") - 1).alias("ka"))
    return a.join(b, "ka").select("a", "b")


LCA_PAIRS_CTE = f"""
lca_pairs AS (
  SELECT a.id AS a, b.id AS b
  FROM term_dict a JOIN term_dict b ON b.k = a.k + 1
  WHERE a.k % {LCA_PAIR_MOD} = 0
    AND a.id LIKE 'FIX:%' AND NOT a.is_obsolete
    AND b.id LIKE 'FIX:%' AND NOT b.is_obsolete
)"""


MOD_PRIOR_MISSING = (4, 1)   # k % 4 == 1 -> absent from prior state (insert)
MOD_PRIOR_STALE = (8, 2)     # k % 8 == 2 -> stale definition in prior (update)


def derive_prior_term_dict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perturbed term dictionary modelling the PRIOR store contents for
    reconciliation tests (FIXTURES.md §4): k%4==1 terms missing
    (→ incoming inserts), k%8==2 definitions stale (→ updates), nothing
    marked obsolete (→ incoming obsoletes exercise M1)."""
    td = derive_term_dict(spark, sf_dir)
    k = F.col("k")
    return (
        td.filter(k % MOD_PRIOR_MISSING[0] != MOD_PRIOR_MISSING[1])
        .withColumn(
            "definition",
            F.when(k % MOD_PRIOR_STALE[0] == MOD_PRIOR_STALE[1],
                   F.lit("stale definition")).otherwise(F.col("definition")),
        )
        .withColumn("is_obsolete", F.lit(False))
    )


def with_ctes(*ctes: str, body: str) -> str:
    """Assemble a WITH query from CTE snippets + a body."""
    joined = ",".join(c.strip().rstrip() for c in ctes)
    return f"WITH {joined}\n{body}"
