"""Partitioned sink: pruned scans must carry the partition filter at
the FileScan (PartitionFilters), the cardinality guard must refuse
doc_id-style partition columns, and round-trips must be lossless."""

import pytest
from pyspark.sql import functions as F

from ontology_loader_spark.sinks.partitioned import (
    read_partition,
    write_partitioned,
)


def _docs(spark, n=60):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id")).alias("text"),
        F.concat(F.lit("src"), (F.col("id") % 4)).alias("source"),
    )


def test_partition_filter_reaches_scan(spark, tmp_path):
    path = str(tmp_path / "part_docs")
    n_parts = write_partitioned(_docs(spark), path, "source")
    assert n_parts == 4

    df = read_partition(spark, path, "source", "src2")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "src2" in plan
    # the data filter list must NOT carry the partition predicate —
    # pruning happened at planning, not per-row
    rows = df.collect()
    assert len(rows) == 15
    assert {r["source"] for r in rows} == {"src2"}


def test_partition_roundtrip_lossless(spark, tmp_path):
    path = str(tmp_path / "part_docs_rt")
    docs = _docs(spark, 40)
    write_partitioned(docs, path, "source")
    back = spark.read.parquet(path)
    assert sorted(
        map(tuple, back.select("doc_id", "text", "source").collect())
    ) == sorted(map(tuple, docs.collect()))


def test_partition_cardinality_guard(spark, tmp_path):
    docs = _docs(spark, 50)
    with pytest.raises(ValueError, match="distinct values"):
        write_partitioned(
            docs, str(tmp_path / "bad"), "doc_id", max_partitions=10
        )


def test_files_per_partition_bounds_file_count(spark, tmp_path):
    import glob

    path = str(tmp_path / "part_docs_files")
    write_partitioned(_docs(spark, 200).repartition(16), path, "source")
    for d in glob.glob(f"{path}/source=*"):
        files = [f for f in glob.glob(f"{d}/*.parquet")]
        assert len(files) <= 2  # 1 requested; hash collisions may give 2


def test_files_per_partition_salt_yields_multiple_files(spark, tmp_path):
    """files_per_partition > 1 must actually split each directory: the
    repartition keys carry a row-hash salt bounded to the requested
    count, so one partition value is NOT pinned to a single task."""
    import glob

    path = str(tmp_path / "part_docs_salted")
    write_partitioned(
        _docs(spark, 400), path, "source", files_per_partition=4
    )
    multi = 0
    for d in glob.glob(f"{path}/source=*"):
        files = glob.glob(f"{d}/*.parquet")
        assert 1 <= len(files) <= 4
        multi += len(files) > 1
    # with 100 rows per partition and 4 salt values, every directory
    # should split (salt is md5-free Spark hash — allow one straggler)
    assert multi >= 3
    # and the write stays lossless
    back = spark.read.parquet(path)
    assert back.count() == 400


# -------------------------------------------------------- compaction


def test_compact_parquet_dir_lossless_and_fewer_files(spark, tmp_path):
    from ontology_loader_spark.sinks.compact import compact_parquet_dir

    path = str(tmp_path / "many_small")
    df = _docs(spark, 500)
    df.repartition(40).write.mode("overwrite").parquet(path)

    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    summary = compact_parquet_dir(spark, path, target_bytes=10**9)
    after = sorted(map(tuple, spark.read.parquet(path).collect()))

    assert summary["files_before"] == 40
    assert summary["files_after"] == 1  # tiny table, huge target
    assert summary["rows"] == 500
    assert before == after


def test_compact_respects_target_size(spark, tmp_path):
    from ontology_loader_spark.sinks.compact import (
        compact_parquet_dir,
        directory_bytes,
    )

    path = str(tmp_path / "sized")
    _docs(spark, 2000).repartition(30).write.mode("overwrite").parquet(path)
    nbytes = directory_bytes(path)
    target = max(nbytes // 4, 1)
    summary = compact_parquet_dir(spark, path, target_bytes=target)
    # ceil(bytes / target) ≈ 4-5 output files
    assert 3 <= summary["files_after"] <= 6


def test_compact_publishes_via_symlink_and_recompaction_is_atomic(
    spark, tmp_path
):
    """First compaction migrates the plain directory to the
    versioned+symlink layout; subsequent compactions re-point the link
    (the table path resolves to a complete version at every step). GC
    is deferred one cycle: the version replaced by THIS compaction
    survives (a concurrent reader mid-scan on it keeps its files) and
    is collected only by the NEXT compaction. A recovery note never
    survives a successful publish."""
    import glob
    import os

    from ontology_loader_spark.sinks.compact import (
        compact_parquet_dir,
        live_version,
    )

    path = str(tmp_path / "versioned")
    _docs(spark, 300).repartition(20).write.mode("overwrite").parquet(path)
    assert live_version(path) is None  # legacy plain layout

    s1 = compact_parquet_dir(spark, path, target_bytes=10**9)
    v1 = live_version(path)
    assert os.path.islink(path) and v1 == os.path.abspath(s1["version_dir"])
    assert spark.read.parquet(path).count() == 300

    s2 = compact_parquet_dir(spark, path, target_bytes=10**9)
    v2 = live_version(path)
    assert v2 == os.path.abspath(s2["version_dir"]) and v2 != v1
    # deferred GC: the just-replaced version still readable (grace)
    assert os.path.isdir(v1) and s2["gced_versions"] == []
    assert spark.read.parquet(v1).count() == 300
    assert spark.read.parquet(path).count() == 300

    s3 = compact_parquet_dir(spark, path, target_bytes=10**9)
    v3 = live_version(path)
    # v1 was replaced two cycles ago -> collected now; v2 in grace
    assert s3["gced_versions"] == [v1]
    assert not os.path.exists(v1)
    assert os.path.isdir(v2) and v3 != v2
    assert spark.read.parquet(path).count() == 300
    assert not glob.glob(f"{path}.RECOVERY-*") # notes cleaned up
    assert not glob.glob(f"{path}.old-*")      # legacy dir cleaned up
