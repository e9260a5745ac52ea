"""JSONL/CSV corpus sources: clean rows parse to the exact schema,
malformed rows quarantine with the raw line (never dropped, never
fatal), and the two outputs partition the input."""

from pyspark.sql import functions as F

from ontology_loader_spark.inputs.textsource import (
    read_documents_csv,
    read_documents_jsonl,
)


def test_jsonl_clean_and_quarantine_partition_input(spark, tmp_path):
    lines = [
        '{"doc_id": 1, "text": "alpha beta", "lang": "en", '
        '"source": "web", "n_chars": 10}',
        '{"doc_id": 2, "text": "gamma", "lang": "en", "source": "web", '
        '"n_chars": 5}',
        '{"doc_id": 3, "text": "truncated...',           # unparseable
        '{"text": "no id here", "lang": "en"}',          # missing doc_id
        "not json at all",                               # unparseable
    ]
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(lines) + "\n")

    clean, quarantined = read_documents_jsonl(spark, str(p))
    got = sorted(map(tuple, clean.collect()))
    assert got == [
        (1, "alpha beta", "en", "web", 10),
        (2, "gamma", "en", "web", 5),
    ]
    q = quarantined.collect()
    assert len(q) == 3
    reasons = sorted(r["reason"] for r in q)
    assert reasons == ["missing_required:doc_id,text",
                       "unparseable", "unparseable"]
    # the raw line survives verbatim for unparseable rows
    raws = {r["raw_record"] for r in q if r["reason"] == "unparseable"}
    assert "not json at all" in raws
    assert '{"doc_id": 3, "text": "truncated...' in raws
    # partition property: clean + quarantined == input lines
    assert clean.count() + quarantined.count() == len(lines)


def test_jsonl_type_garbage_quarantines(spark, tmp_path):
    p = tmp_path / "typed.jsonl"
    p.write_text(
        '{"doc_id": "not-a-number", "text": "x", "lang": "en", '
        '"source": "s", "n_chars": 1}\n'
        '{"doc_id": 9, "text": "ok", "lang": "en", "source": "s", '
        '"n_chars": 2}\n'
    )
    clean, quarantined = read_documents_jsonl(spark, str(p))
    assert [r["doc_id"] for r in clean.collect()] == [9]
    assert quarantined.count() == 1


def test_csv_wrong_column_count_quarantines(spark, tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text(
        "doc_id,text,lang,source,n_chars\n"
        "1,alpha,en,web,5\n"
        "2,beta,en\n"              # short row -> missing required? cols
        "x,gamma,en,web,5\n"       # type garbage in doc_id
        "3,delta,en,web,5\n"
    )
    clean, quarantined = read_documents_csv(spark, str(p))
    got = sorted(map(tuple, clean.collect()))
    assert got == [
        (1, "alpha", "en", "web", 5),
        (3, "delta", "en", "web", 5),
    ]
    assert clean.count() + quarantined.count() == 4  # header excluded
    assert quarantined.count() == 2


def test_quarantine_never_silently_drops(spark, tmp_path):
    """An all-garbage file yields zero clean rows and N quarantined —
    the batch still succeeds (the PERMISSIVE contract)."""
    p = tmp_path / "garbage.jsonl"
    p.write_text("}}}}\n<<<>>\n")
    clean, quarantined = read_documents_jsonl(spark, str(p))
    assert clean.count() == 0
    assert quarantined.count() == 2


def test_gate_fixture_roundtrip_and_testdata_invariant(spark):
    """The textsource gates derive a corrupted CSV/JSONL export from
    the documents table and their DuckDB oracle recomputes the split
    from the TABLE (it never reads the file). That only works if the
    testdata text needs no quoting — pin the invariant here, plus the
    full round-trip: clean ∪ quarantine == every input line, with the
    residue rules landing each doc where the oracle expects it."""
    import ontology_loader_spark.inputs.textsource as ts

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # invariant the fixture writers rely on
    assert docs.filter(
        F.col("text").rlike("[^a-z0-9 ]")
        | F.col("doc_id").isNull() | F.col("text").isNull()
        | F.col("lang").isNull() | F.col("source").isNull()
        | F.col("n_chars").isNull()
    ).count() == 0

    n = docs.count()
    for kind, reader in (
        ("csv", lambda p: ts.read_documents_csv(spark, p, header=False)),
        ("jsonl", lambda p: ts.read_documents_jsonl(spark, p)),
    ):
        path = f"/tmp/ts_fixture_{kind}"
        ts.write_fixture(spark, sf_dir, kind, path)
        clean, quar = reader(path)
        keyed = ts.quarantine_key(quar)
        assert clean.count() + quar.count() == n
        got_clean = {r["doc_id"] for r in clean.select("doc_id").collect()}
        assert got_clean == {
            i for i in range(n)
            if i % 10 not in (ts.UNPARSEABLE_RESIDUE, ts.MISSING_RESIDUE)
        }
        reasons = {r["reason"] for r in keyed.collect()}
        assert reasons == {"unparseable", "missing_required:doc_id,text"}
        missing_keys = {
            r["rec_key"] for r in keyed.filter(
                F.col("reason").startswith("missing")).collect()
        }
        assert missing_keys == {
            str(i) for i in range(n) if i % 10 == ts.MISSING_RESIDUE
        }
