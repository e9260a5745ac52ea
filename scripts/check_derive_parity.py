"""Dev check: Spark-side derivations match the DuckDB CTE definitions
row-for-row at sf0.001 (the same comparison the driver's correctness
gate performs)."""

import sys

import duckdb

sys.path.insert(0, "/root/repo")

from ontology_loader_spark.inputs import derive
from ontology_loader_spark.session import get_spark

SF = "/root/testdata/sf0.001"


def rows_of(df, cols):
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def duck_rows(sql, cols):
    con = duckdb.connect()
    for t in ["part", "lineitem", "orders"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    out = con.sql(sql).fetchall()
    return sorted(tuple(str(v) for v in row) for row in out)


def check(name, spark_df, sql, cols):
    a = rows_of(spark_df.select(*cols), cols)
    b = duck_rows(sql, cols)
    ok = a == b
    print(f"{name}: spark={len(a)} duck={len(b)} match={ok}")
    if not ok:
        sa, sb = set(a), set(b)
        print("  only-spark:", list(sa - sb)[:5])
        print("  only-duck:", list(sb - sa)[:5])
    return ok


def main():
    spark = get_spark("derive-parity", master="local[8]")
    ok = True
    td = derive.derive_term_dict(spark, SF)
    from pyspark.sql import functions as F

    td_flat = td.select(
        "id", "name", "definition",
        F.array_join("alternative_names", ",").alias("alt_names_str"),
        F.col("is_obsolete").cast("string").alias("is_obsolete"),
        "replaced_by",
    )
    sql_td = derive.with_ctes(
        derive.TERM_DICT_CTE,
        body="SELECT id, name, definition, alt_names_str, "
        "CASE WHEN is_obsolete THEN 'true' ELSE 'false' END AS is_obsolete, "
        "replaced_by FROM term_dict",
    )
    ok &= check("term_dict", td_flat,
                sql_td, ["id", "name", "definition", "alt_names_str",
                         "is_obsolete", "replaced_by"])

    ed = derive.derive_edges(spark, SF)
    sql_ed = derive.with_ctes(derive.EDGES_CTE,
                              body="SELECT subject, predicate, object FROM edges")
    ok &= check("edges", ed, sql_ed, ["subject", "predicate", "object"])

    tr = derive.derive_transcripts(spark, SF)
    sql_tr = derive.with_ctes(
        derive.TRANSCRIPTS_CTE,
        body="SELECT conv_id, turn_idx, role, text, tool, CAST(ts AS VARCHAR) AS ts "
        "FROM transcripts",
    )
    tr_flat = tr.withColumn("ts", F.col("ts").cast("string"))
    ok &= check("transcripts", tr_flat, sql_tr,
                ["conv_id", "turn_idx", "role", "text", "tool", "ts"])

    md = derive.derive_mention_dict(spark, SF)
    sql_md = derive.with_ctes(derive.TERM_DICT_CTE, derive.MENTION_DICT_CTE,
                              body="SELECT id, name FROM mention_dict")
    ok &= check("mention_dict", md, sql_md, ["id", "name"])

    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
