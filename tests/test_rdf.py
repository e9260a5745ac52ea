"""N-Triples materialization (sinks/rdf.py): IRI policy, literal
escaping (cross-checked against the DuckDB oracle twin on strings the
gate fixtures can't produce), and the text writer round-trip."""

from pathlib import Path

import duckdb

from ontology_loader_spark.sinks.rdf import (
    OBO_BASE,
    RDFS,
    URN_BASE,
    escaped_sql,
    ntriples_export,
    ntriples_label_lines,
    ntriples_relation_lines,
    write_ntriples,
)


def test_iri_policy(spark):
    triples = spark.createDataFrame(
        [
            ("FIX:7", "rdfs:subClassOf", "FIX:3"),
            ("Fix:9", "BFO:0000050", "OTHER:4"),
            ("FIX:7", "entailed_isa_partof_closure", "FIX:1"),
        ],
        ["subject", "predicate", "object"],
    )
    lines = {r["line"] for r in ntriples_relation_lines(triples).collect()}
    assert (
        f"<{OBO_BASE}FIX_7> <{RDFS}subClassOf> <{OBO_BASE}FIX_3> ." in lines
    )
    assert (
        f"<{OBO_BASE}Fix_9> <{OBO_BASE}BFO_0000050> <{OBO_BASE}OTHER_4> ."
        in lines
    )
    assert (
        f"<{OBO_BASE}FIX_7> <{URN_BASE}entailed_isa_partof_closure> "
        f"<{OBO_BASE}FIX_1> ." in lines
    )


NASTY = 'he said "hi"\\path\nline2\rline3\ttab'


def test_label_escaping_matches_duckdb_oracle(spark):
    classes = spark.createDataFrame(
        [("FIX:1", NASTY), ("FIX:2", "plain"), ("FIX:3", "")],
        ["id", "name"],
    )
    rows = {
        r["subject"]: r["line"]
        for r in ntriples_label_lines(classes).collect()
    }
    # empty label skipped
    assert set(rows) == {"FIX:1", "FIX:2"}
    assert rows["FIX:2"] == f'<{OBO_BASE}FIX_2> <{RDFS}label> "plain" .'
    # the escaped literal must equal the oracle twin's rendering
    con = duckdb.connect()
    (oracle_escaped,) = con.execute(
        f"SELECT {escaped_sql('name')} FROM (SELECT ? AS name)", [NASTY]
    ).fetchone()
    assert rows["FIX:1"] == (
        f'<{OBO_BASE}FIX_1> <{RDFS}label> "{oracle_escaped}" .'
    )
    # and must parse back: unescaping recovers the original
    unescaped = (
        oracle_escaped.replace("\\t", "\t")
        .replace("\\r", "\r")
        .replace("\\n", "\n")
        .replace('\\"', '"')
        .replace("\\\\", "\\")
    )
    assert unescaped == NASTY


def test_export_union_and_writer_roundtrip(spark, tmp_path: Path):
    triples = spark.createDataFrame(
        [("FIX:7", "rdfs:subClassOf", "FIX:3")],
        ["subject", "predicate", "object"],
    )
    classes = spark.createDataFrame(
        [("FIX:7", "seven"), ("FIX:3", "")], ["id", "name"]
    )
    exported = ntriples_export(triples, classes)
    expected = {
        f"<{OBO_BASE}FIX_7> <{RDFS}subClassOf> <{OBO_BASE}FIX_3> .",
        f'<{OBO_BASE}FIX_7> <{RDFS}label> "seven" .',
    }
    assert {r["line"] for r in exported.collect()} == expected
    out = tmp_path / "export.nt"
    write_ntriples(exported, str(out))
    assert {r["value"] for r in spark.read.text(str(out)).collect()} == expected
