"""JSONL/CSV corpus sources: clean rows parse to the exact schema,
malformed rows quarantine with the raw line (never dropped, never
fatal), and the two outputs partition the input."""

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
