"""Real-ontology ingestion round-trip: an OBO Graph JSON fixture and a
semantic-sql SQLite fixture describing the SAME graph must both load
into the canonical ``term_dict``/``edges`` tables and produce the
identical class / direct-relation / closure sets that the
pure-Python reference restatement computes — i.e. a user holding the
actual artifact the reference consumes (``ontology_processor.py:57,
63-92``) gets byte-equal extraction semantics from this engine."""

import json
import sqlite3

import pytest

from ontology_loader_spark.inputs.ingest import (
    read_obograph_json,
    read_semsql_sqlite,
)
from ontology_loader_spark.operators.classes import build_ontology_classes
from ontology_loader_spark.operators.closure import (
    ancestor_closure,
    direct_relations,
    relevant_entities,
)
from ontology_loader_spark.testing.pyreference import reference_extraction

ONT = "envo"
OBO = "http://purl.obolibrary.org/obo/"

# (id, name, definition, aliases, is_obsolete, replaced_by) — a graph
# exercising IRI->CURIE conversion, missing labels/definitions,
# synonyms, an obsolete term with replaced_by, and a foreign branch.
TERMS = [
    ("ENVO:1", "root one", "top", ["r1"], False, None),
    ("ENVO:2", "two", None, [], False, None),
    ("ENVO:3", "three", "", ["iii", "t3"], False, None),
    ("ENVO:4", None, "part thing", [], False, None),
    ("ENVO:5", "old five", "gone", [], True, "ENVO:2"),
    ("OTHER:7", "foreign", "x", [], False, None),
    ("ENVO:8", "eight", "via foreign", [], False, None),
]

EDGES = [
    ("ENVO:2", "rdfs:subClassOf", "ENVO:1"),
    ("ENVO:3", "rdfs:subClassOf", "ENVO:2"),
    ("ENVO:4", "BFO:0000050", "ENVO:3"),
    ("OTHER:7", "rdfs:subClassOf", "ENVO:2"),
    ("ENVO:8", "rdfs:subClassOf", "OTHER:7"),
    ("ENVO:3", "rdfs:seeAlso", "ENVO:1"),  # ignored predicate
]


def _iri(curie: str) -> str:
    # ENVO terms written as OBO IRIs (conversion under test);
    # everything else stays CURIE-shaped
    if curie.startswith("ENVO:"):
        return OBO + curie.replace(":", "_")
    return curie


def _write_obograph(path):
    nodes = []
    for tid, name, definition, aliases, obsolete, replaced_by in TERMS:
        node = {"id": _iri(tid), "type": "CLASS"}
        if name is not None:
            node["lbl"] = name
        meta = {}
        if definition is not None:
            meta["definition"] = {"val": definition}
        if aliases:
            meta["synonyms"] = [{"pred": "hasExactSynonym", "val": a} for a in aliases]
        if obsolete:
            meta["deprecated"] = True
        if replaced_by:
            meta["basicPropertyValues"] = [
                {"pred": OBO + "IAO_0100001", "val": _iri(replaced_by)}
            ]
        if meta:
            node["meta"] = meta
        nodes.append(node)
    pred_map = {
        "rdfs:subClassOf": "is_a",
        "BFO:0000050": OBO + "BFO_0000050",
        "rdfs:seeAlso": "http://www.w3.org/2000/01/rdf-schema#seeAlso",
    }
    edges = [
        {"sub": _iri(s), "pred": pred_map[p], "obj": _iri(o)}
        for s, p, o in EDGES
    ]
    path.write_text(json.dumps({"graphs": [{"nodes": nodes, "edges": edges}]}))


def _write_semsql(path):
    con = sqlite3.connect(str(path))
    con.execute(
        "CREATE TABLE statements (subject TEXT, predicate TEXT, object TEXT, "
        "value TEXT, datatype TEXT, language TEXT)"
    )
    con.execute("CREATE TABLE edge (subject TEXT, predicate TEXT, object TEXT)")

    def stmt(s, p, o=None, v=None):
        con.execute(
            "INSERT INTO statements VALUES (?, ?, ?, ?, NULL, NULL)", (s, p, o, v)
        )

    for tid, name, definition, aliases, obsolete, replaced_by in TERMS:
        stmt(tid, "rdf:type", o="owl:Class")
        if name is not None:
            stmt(tid, "rdfs:label", v=name)
        if definition is not None:
            stmt(tid, "IAO:0000115", v=definition)
        for a in aliases:
            stmt(tid, "oio:hasExactSynonym", v=a)
        if obsolete:
            stmt(tid, "owl:deprecated", v="true")
        if replaced_by:
            stmt(tid, "IAO:0100001", o=replaced_by)
    # a blank-node statement that must NOT become a term
    stmt("_:b0", "rdf:type", o="owl:Restriction")
    for s, p, o in EDGES:
        con.execute("INSERT INTO edge VALUES (?, ?, ?)", (s, p, o))
    con.commit()
    con.close()


def _extract(spark, td, ed):
    classes = {
        r["id"]: (
            r["type"],
            tuple(sorted(r["alternative_names"])),
            r["definition"],
            r["is_root"],
            r["is_obsolete"],
            r["name"],
        )
        for r in build_ontology_classes(td, ed, ONT).collect()
    }
    rel = relevant_entities(td, ONT)
    direct = sorted(
        (r["subject"], r["predicate"], r["object"])
        for r in direct_relations(ed, rel).collect()
    )
    closure = sorted(
        (r["subject"], r["predicate"], r["object"])
        for r in ancestor_closure(ed, rel, ONT).collect()
    )
    return classes, direct, closure


@pytest.fixture(scope="module")
def expected():
    want_classes, want_direct, want_closure = reference_extraction(
        TERMS, EDGES, ONT
    )
    classes = {
        cid: (
            c["type"],
            tuple(sorted(c["alternative_names"])),
            c["definition"],
            c["is_root"],
            c["is_obsolete"],
            c["name"],
        )
        for cid, c in want_classes.items()
    }
    return classes, sorted(want_direct), sorted(want_closure)


def test_obograph_json_roundtrip(spark, tmp_path, expected):
    p = tmp_path / "envo.json"
    _write_obograph(p)
    td, ed = read_obograph_json(spark, str(p))
    got = _extract(spark, td, ed)
    assert got[0] == expected[0]
    assert got[1] == expected[1]
    assert got[2] == expected[2]
    # IRI conversion happened (no IRIs leak into ids)
    assert all(not r["id"].startswith("http") for r in td.collect())
    # replaced_by followed the same conversion
    by_id = {r["id"]: r for r in td.collect()}
    assert by_id["ENVO:5"]["replaced_by"] == "ENVO:2"


def test_semsql_sqlite_roundtrip(spark, tmp_path, expected):
    p = tmp_path / "envo.db"
    _write_semsql(p)
    td, ed = read_semsql_sqlite(spark, str(p))
    got = _extract(spark, td, ed)
    assert got[0] == expected[0]
    assert got[1] == expected[1]
    assert got[2] == expected[2]
    # blank nodes excluded
    assert all(not r["id"].startswith("_:") for r in td.collect())


def test_both_paths_identical(spark, tmp_path):
    pj = tmp_path / "envo.json"
    pdb = tmp_path / "envo.db"
    _write_obograph(pj)
    _write_semsql(pdb)
    td_j, ed_j = read_obograph_json(spark, str(pj))
    td_s, ed_s = read_semsql_sqlite(spark, str(pdb))
    assert _extract(spark, td_j, ed_j) == _extract(spark, td_s, ed_s)


def test_cli_from_gzipped_semsql(tmp_path):
    """Full user journey of a reference user: a gzipped semantic-sql
    SQLite artifact straight into the CLI (the .db.gz the reference
    downloads), gunzipped transparently, loaded, reconciled, reported."""
    import gzip
    import shutil
    import subprocess
    import sys
    from pathlib import Path

    db = tmp_path / "envo.db"
    _write_semsql(db)
    gz = tmp_path / "envo.db.gz"
    with open(db, "rb") as fin, gzip.open(gz, "wb") as fout:
        shutil.copyfileobj(fin, fout)

    repo = Path(__file__).resolve().parent.parent
    out = subprocess.run(
        [sys.executable, "-m", "ontology_loader_spark.cli",
         "--source-ontology", "envo",
         "--semsql-db", str(gz),
         "--state-root", str(tmp_path / "state"),
         "--output-directory", str(tmp_path / "reports"),
         "--master", "local[2]"],
        capture_output=True, text=True, cwd=str(repo), timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    # 6 envo-prefixed terms (ENVO:1..5, ENVO:8); OTHER:7 filtered by F1
    assert "classes=6" in out.stdout
    assert (tmp_path / "reports" / "ontology_inserts.tsv").exists()
    assert (tmp_path / "state" / "ontology_class_set" / "CURRENT").exists()


def test_obograph_multiple_graphs(spark, tmp_path):
    """One obographs file can carry several graphs (e.g. an ontology
    plus its imports); nodes and edges union across all of them."""
    import json as _json

    doc = {
        "graphs": [
            {"nodes": [{"id": "ENVO:10", "lbl": "ten"}],
             "edges": [{"sub": "ENVO:10", "pred": "is_a", "obj": "ENVO:1"}]},
            {"nodes": [{"id": "ENVO:1", "lbl": "root"}], "edges": []},
        ]
    }
    p = tmp_path / "multi.json"
    p.write_text(_json.dumps(doc))
    td, ed = read_obograph_json(spark, str(p))
    assert {r["id"] for r in td.collect()} == {"ENVO:10", "ENVO:1"}
    assert [(r["subject"], r["predicate"], r["object"])
            for r in ed.collect()] == [("ENVO:10", "rdfs:subClassOf", "ENVO:1")]


def test_fetch_ontology_cache_and_injectable_transport(tmp_path):
    """fetch_ontology: downloads via the injectable opener, gunzips,
    caches both artifacts (second call = zero transport calls), force
    redownloads, and a crashed download never leaves a trusted file."""
    import gzip

    from ontology_loader_spark.inputs.fetch import fetch_ontology, ontology_url

    assert ontology_url("ENVO") == (
        "https://s3.amazonaws.com/bbop-sqlite/envo.db.gz"
    )

    payload = b"sqlite-bytes-stand-in"
    gz_src = tmp_path / "envo.db.gz"
    with gzip.open(gz_src, "wb") as fh:
        fh.write(payload)

    calls = []

    def opener(url):
        calls.append(url)
        return open(gz_src, "rb")

    cache = str(tmp_path / "cache")
    db = fetch_ontology("envo", url="http://example.invalid/envo.db.gz",
                        cache_dir=cache, opener=opener)
    assert open(db, "rb").read() == payload
    assert calls == ["http://example.invalid/envo.db.gz"]

    # cached: no transport on the second call, same path back
    assert fetch_ontology("envo", url="http://example.invalid/envo.db.gz",
                          cache_dir=cache, opener=opener) == db
    assert len(calls) == 1

    # force: transport again
    fetch_ontology("envo", url="http://example.invalid/envo.db.gz",
                   cache_dir=cache, opener=opener, force=True)
    assert len(calls) == 2

    # crash mid-download: only a .part temp exists afterwards, and the
    # next fetch retries the transport instead of trusting it
    class Boom(Exception):
        pass

    def crashing(url):
        calls.append(url)
        raise Boom()

    import pytest as _pytest

    cache2 = str(tmp_path / "cache2")
    with _pytest.raises(Boom):
        fetch_ontology("envo", url="http://example.invalid/envo.db.gz",
                       cache_dir=cache2, opener=crashing)
    import glob

    assert not glob.glob(f"{cache2}/envo/envo.db*") or all(
        p.endswith(".part") for p in glob.glob(f"{cache2}/envo/envo.db*")
    )
    db2 = fetch_ontology("envo", url="http://example.invalid/envo.db.gz",
                         cache_dir=cache2, opener=opener)
    assert open(db2, "rb").read() == payload


def test_fetch_ontology_default_opener_file_url(tmp_path):
    """The default urllib opener handles file:// URLs — the offline
    twin of the reference's HTTPS download."""
    import gzip

    from ontology_loader_spark.inputs.fetch import fetch_ontology

    gz_src = tmp_path / "envo.db.gz"
    with gzip.open(gz_src, "wb") as fh:
        fh.write(b"payload-via-file-url")
    db = fetch_ontology("envo", url=f"file://{gz_src}",
                        cache_dir=str(tmp_path / "cache"))
    assert open(db, "rb").read() == b"payload-via-file-url"


def test_cli_fetch_end_to_end_with_file_url(tmp_path):
    """--fetch resolves, downloads (file:// fixture URL), gunzips,
    caches, loads, reconciles, reports — the reference's
    name-to-triples journey with no pre-downloaded artifact."""
    import gzip
    import shutil
    import subprocess
    import sys
    from pathlib import Path

    db = tmp_path / "envo.db"
    _write_semsql(db)
    gz = tmp_path / "envo.db.gz"
    with open(db, "rb") as fin, gzip.open(gz, "wb") as fout:
        shutil.copyfileobj(fin, fout)

    repo = Path(__file__).resolve().parent.parent
    out = subprocess.run(
        [sys.executable, "-m", "ontology_loader_spark.cli",
         "--source-ontology", "envo",
         "--fetch",
         "--ontology-url", f"file://{gz}",
         "--cache-dir", str(tmp_path / "cache"),
         "--state-root", str(tmp_path / "state"),
         "--output-directory", str(tmp_path / "reports"),
         "--master", "local[2]"],
        capture_output=True, text=True, cwd=str(repo), timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "classes=6" in out.stdout
    assert (tmp_path / "cache" / "envo" / "envo.db").exists()
    assert (tmp_path / "reports" / "ontology_inserts.tsv").exists()


def test_obograph_fixture_roundtrips_derive_tables(spark, tmp_path):
    """The gate fixture writer re-encodes derive_term_dict/derive_edges
    as OBO Graph JSON; reading it back must reproduce both tables
    exactly (empty-vs-null definition, empty alias arrays, obsolete
    replaced_by chains, foreign-prefix ids all survive the re-encode)."""
    from ontology_loader_spark.inputs.derive import derive_edges, derive_term_dict
    from ontology_loader_spark.inputs.ingest import (
        read_obograph_json,
        write_obograph_fixture,
    )

    sf_dir = "/root/testdata/sf0.001"
    path = write_obograph_fixture(spark, sf_dir, str(tmp_path / "fix.json"))
    td, ed = read_obograph_json(spark, path)

    want_td = sorted(
        (r["id"], r["name"], r["definition"], tuple(r["alternative_names"]),
         r["is_obsolete"], r["replaced_by"])
        for r in derive_term_dict(spark, sf_dir).drop("k").collect()
    )
    got_td = sorted(
        (r["id"], r["name"], r["definition"], tuple(r["alternative_names"]),
         r["is_obsolete"], r["replaced_by"])
        for r in td.collect()
    )
    assert got_td == want_td

    want_ed = sorted(map(tuple, derive_edges(spark, sf_dir).collect()))
    got_ed = sorted(map(tuple, ed.collect()))
    assert got_ed == want_ed


def test_semsql_fixture_roundtrips_derive_tables(spark, tmp_path):
    """Same contract as the obograph fixture, through the reference's
    actual artifact format: statements+edge SQLite re-encode of the
    derive tables must read back to exactly those tables."""
    from ontology_loader_spark.inputs.derive import derive_edges, derive_term_dict
    from ontology_loader_spark.inputs.ingest import (
        read_semsql_sqlite,
        write_semsql_fixture,
    )

    sf_dir = "/root/testdata/sf0.001"
    path = write_semsql_fixture(spark, sf_dir, str(tmp_path / "fix.db"))
    td, ed = read_semsql_sqlite(spark, path)

    def norm(rows):
        return sorted(
            (r["id"], r["name"], r["definition"], tuple(r["alternative_names"]),
             r["is_obsolete"], r["replaced_by"])
            for r in rows
        )

    assert norm(td.collect()) == norm(
        derive_term_dict(spark, sf_dir).drop("k").collect()
    )
    assert sorted(map(tuple, ed.collect())) == sorted(
        map(tuple, derive_edges(spark, sf_dir).collect())
    )
