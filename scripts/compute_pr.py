"""Triple-set precision/recall vs the reference semantics — the
headline parity metric (BASELINE.json: P/R ≥ 0.95; exact 1.0 required
at fixture scale).

Runs the Spark engine and the independent pure-Python reference
implementation (testing/pyreference.py) on the same synthetic ontology
at the FIXTURES.md 's' scale, compares the emitted distinct (s,p,o)
sets, and writes BENCH/PR.md.

Usage: python scripts/compute_pr.py [n_terms]
"""

from __future__ import annotations

import sys
from datetime import datetime, timezone
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    n_terms = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

    from ontology_loader_spark.inputs.synth import synth_edges, synth_term_dict
    from ontology_loader_spark.pipeline import run_ontology_load
    from ontology_loader_spark.session import get_spark
    from ontology_loader_spark.testing.pyreference import reference_extraction

    spark = get_spark("compute-pr", extra_confs={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    td = synth_term_dict(spark, n_terms)
    ed = synth_edges(spark, n_terms)

    _, rec = run_ontology_load(td, ed, "fix")
    engine = {
        (r["subject"], r["predicate"], r["object"])
        for r in rec.relation_state.collect()
    }

    terms = [
        (r["id"], r["name"], r["definition"], r["alternative_names"],
         r["is_obsolete"], r["replaced_by"])
        for r in td.collect()
    ]
    edges = [(r["subject"], r["predicate"], r["object"]) for r in ed.collect()]
    _, direct, closure = reference_extraction(terms, edges, "fix")
    # reference store end-state: distinct union of direct + closure
    # (Q4 set semantics at the sink)
    want = set(direct) | closure

    tp = len(engine & want)
    precision = tp / len(engine) if engine else 1.0
    recall = tp / len(want) if want else 1.0

    lines = [
        "# BENCH/PR — triple-set parity vs reference semantics",
        "",
        f"Generated {datetime.now(timezone.utc).isoformat(timespec='seconds')} "
        f"by scripts/compute_pr.py (n_terms={n_terms}, seeded synth corpus, "
        "empty prior store).",
        "",
        "| metric | value |",
        "|---|---|",
        f"| engine triples | {len(engine)} |",
        f"| reference triples | {len(want)} |",
        f"| true positives | {tp} |",
        f"| **precision** | **{precision:.6f}** |",
        f"| **recall** | **{recall:.6f}** |",
        "",
        "Oracle: independent pure-Python restatement of the reference's",
        "extraction loop (ontology_loader_spark/testing/pyreference.py,",
        "citing ontology_processor.py) — shares no code with the Spark",
        "operators. Gate: P ≥ 0.95 and R ≥ 0.95 (BASELINE.md); exact 1.0",
        "expected and required here.",
        "",
    ]
    only_e = list(engine - want)[:5]
    only_w = list(want - engine)[:5]
    if only_e or only_w:
        lines += ["Differences (first 5 each):",
                  f"- engine-only: {only_e}", f"- reference-only: {only_w}", ""]
    out = REPO / "BENCH" / "PR.md"
    out.parent.mkdir(exist_ok=True)
    out.write_text("\n".join(lines))
    print(f"precision={precision:.6f} recall={recall:.6f} "
          f"engine={len(engine)} reference={len(want)}")
    spark.stop()
    sys.exit(0 if precision == 1.0 and recall == 1.0 else 1)


if __name__ == "__main__":
    main()
